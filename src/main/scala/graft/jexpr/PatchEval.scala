package graft.jexpr

import scala.collection.immutable.VectorMap
import Expr._

/** Structural patches: `patch $ { path: value when cond, … }` plus the
  * chain-write sugar (`.set/.modify/.delete/.unset`).
  *
  * Semantics from the reference (INDEPTH.md §10/§12,
  * /root/reference/jetro-core/src/parse/ast.rs:168-208): each field is a
  * path of steps (`.f`, `[n]`, `[*]`, `[* if pred]`, `..f`); at each
  * matched leaf the value expression runs with `@` bound to the old
  * leaf; `when` guards per leaf; value DELETE (None) removes the leaf.
  * Missing intermediate objects are created for plain field steps.
  */
object PatchEval {

  def apply(target: JValue, fields: Vector[PatchField], env: Env): JValue =
    fields.foldLeft(target) { (acc, f) => applyField(acc, f, env) }

  private def applyField(doc: JValue, f: PatchField, env: Env): JValue =
    patch(doc, f.path.toList, f, env) match {
      case Some(v) => v
      case None    => JNull // whole doc deleted
    }

  /** Returns Some(newValue) or None when this node is deleted. */
  private def patch(node: JValue, path: List[PatchStep], f: PatchField, env: Env): Option[JValue] =
    path match {
      case Nil =>
        val leafEnv = env.withCurrent(node)
        if (!f.when.forall(w => Interp.eval(w, leafEnv).truthy)) Some(node)
        else f.value match {
          case None => None
          // a lambda value applies to the old leaf (tier1_chain_modify_lambda)
          case Some(l @ Expr.Lambda(_, _)) => Some(Interp.body(l, leafEnv)(node))
          case Some(v) => Some(Interp.eval(v, leafEnv))
        }
      case PatchStep.Field(name) :: rest =>
        val fields = node match {
          case JObj(fs) => fs
          case _        => VectorMap.empty[String, JValue]
        }
        val child = fields.getOrElse(name, JNull)
        patch(child, rest, f, env) match {
          case Some(nv) =>
            // a skipped write (falsy `when`) returns the child unchanged —
            // don't synthesize a missing field for it (chain_write.rs:262+)
            if (!fields.contains(name) && (nv.asInstanceOf[AnyRef] eq child.asInstanceOf[AnyRef]))
              Some(node)
            else Some(JObj(fields + (name -> nv)))
          case None => Some(JObj(fields - name))
        }
      case PatchStep.Index(i) :: rest => node match {
        case JArr(xs) =>
          val idx = (if (i < 0) xs.length + i else i).toInt
          if (idx < 0 || idx >= xs.length) Some(node)
          else patch(xs(idx), rest, f, env) match {
            case Some(nv) => Some(JArr(xs.updated(idx, nv)))
            case None     => Some(JArr(xs.patch(idx, Nil, 1)))
          }
        case other => Some(other)
      }
      case PatchStep.Wild :: rest => node match {
        case JArr(xs) => Some(JArr(xs.flatMap(x => patch(x, rest, f, env))))
        case JObj(fs) =>
          Some(JObj(fs.flatMap { case (k, v) => patch(v, rest, f, env).map(k -> _) }))
        case other => Some(other)
      }
      case PatchStep.WildIf(pred) :: rest => node match {
        case JArr(xs) => Some(JArr(xs.flatMap { x =>
          if (Interp.eval(pred, env.withCurrent(x)).truthy) patch(x, rest, f, env)
          else Some(x)
        }))
        case other => Some(other)
      }
      case PatchStep.Descendant(name) :: rest =>
        // apply at EVERY descendant entry named `name` (nearest match wins;
        // no further descent inside a patched subtree)
        def go(x: JValue): Option[JValue] = x match {
          case JObj(fs) =>
            Some(JObj(fs.flatMap { case (k, v) =>
              if (k == name) patch(v, rest, f, env).map(k -> _)
              else go(v).map(k -> _)
            }))
          case JArr(xs) => Some(JArr(xs.flatMap(go)))
          case other    => Some(other)
        }
        go(node)
    }
}
