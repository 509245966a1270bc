package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.Tables

/** SURVEY §2.6 order-dependent sequence operators. The reference's array
  * order becomes an explicit (user_id, event_id) sequence; the
  * take_while/drop_while rewrite is the window-min-boundary translation
  * from SURVEY §2.6 (no native Spark op): one window pass, no driver
  * loop, scales as an ordinary shuffle-by-user.
  */
object SequenceQueries extends QueryGroup {

  /** `take_while(value < 490)` — M:150-151: per-user prefix strictly
    * before the first violating element. */
  private val takeWhile = q(
    "q_take_while",
    """SELECT event_id, user_id, value FROM (
      |  SELECT event_id, user_id, value,
      |    MIN(CASE WHEN value >= 490 THEN event_id END)
      |      OVER (PARTITION BY user_id) AS stop_id
      |  FROM events)
      |WHERE stop_id IS NULL OR event_id < stop_id
      |ORDER BY user_id, event_id""".stripMargin) { (s, d) =>
    val wu = Window.partitionBy("user_id")
    Tables.events(s, d)
      .withColumn("stop_id",
        min(when(col("value") >= 490, col("event_id"))).over(wu))
      .filter(col("stop_id").isNull || col("event_id") < col("stop_id"))
      .select("event_id", "user_id", "value")
      .orderBy("user_id", "event_id")
  }

  /** `drop_while(value < 490)` — M:152-153: the complementary suffix. */
  private val dropWhile = q(
    "q_drop_while",
    """SELECT event_id, user_id, value FROM (
      |  SELECT event_id, user_id, value,
      |    MIN(CASE WHEN value >= 490 THEN event_id END)
      |      OVER (PARTITION BY user_id) AS stop_id
      |  FROM events)
      |WHERE stop_id IS NOT NULL AND event_id >= stop_id
      |ORDER BY user_id, event_id""".stripMargin) { (s, d) =>
    val wu = Window.partitionBy("user_id")
    Tables.events(s, d)
      .withColumn("stop_id",
        min(when(col("value") >= 490, col("event_id"))).over(wu))
      .filter(col("stop_id").isNotNull && col("event_id") >= col("stop_id"))
      .select("event_id", "user_id", "value")
      .orderBy("user_id", "event_id")
  }

  /** `reverse()` — M:34-35: sequence reversal = descending order. */
  private val reverse0 = q(
    "q_reverse",
    """SELECT event_id, event_type FROM events
      |ORDER BY event_id DESC LIMIT 50""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .select("event_id", "event_type")
      .orderBy(col("event_id").desc)
      .limit(50)
  }

  /** `first()` / `last()` per group — M:120-125: min_by/max_by over the
    * sequence key (no sort needed — single agg pass). */
  private val firstLast = q(
    "q_first_last",
    """SELECT user_id,
      |  min_by(event_type, event_id) AS first_type,
      |  max_by(event_type, event_id) AS last_type,
      |  min_by(value, event_id) AS first_value,
      |  max_by(value, event_id) AS last_value
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin) {
    (s, d) =>
      Tables.events(s, d)
        .groupBy("user_id")
        .agg(
          expr("min_by(event_type, event_id)").as("first_type"),
          expr("max_by(event_type, event_id)").as("last_type"),
          expr("min_by(value, event_id)").as("first_value"),
          expr("max_by(value, event_id)").as("last_value"))
        .orderBy("user_id")
  }

  /** `nth(100)` — M:124-125 (D:1012): LIMIT 1 OFFSET n. */
  private val nth0 = q(
    "q_nth",
    """SELECT event_id, event_type, value FROM events
      |ORDER BY event_id LIMIT 1 OFFSET 100""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .select("event_id", "event_type", "value")
      .orderBy("event_id")
      .offset(100)
      .limit(1)
  }

  /** `find_index(pred)` — M:60-61: first sequence position where the
    * predicate holds (NULL when no match), per event_type. */
  private val findIndex = q(
    "q_find_index",
    """SELECT event_type,
      |  MIN(CASE WHEN value > 480 THEN event_id END) AS first_match
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) {
    (s, d) =>
      Tables.events(s, d)
        .groupBy("event_type")
        .agg(min(when(col("value") > 480, col("event_id"))).as("first_match"))
        .orderBy("event_type")
  }

  def defs = Seq(takeWhile, dropWhile, reverse0, firstLast, nth0, findIndex)
}
