package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables
import graft.operators.AsOfJoin

/** Event-stream operator pack (the reference's message/metadata surface,
  * SURVEY §2.2 / §2.6, expressed as batch-checkable queries; the streaming
  * runner in graft.streaming reuses the same transformations).
  */
object EventOps {
  type Q = (SparkSession, String) => DataFrame

  /** JSON metadata extraction (reference: `gen_dict_extract` /
    * `_extract_filenames` pulling keys out of message JSON,
    * dict_tools.py:65-77, launcher.py:303-328). */
  def q17EventJson(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy((col("k") % 10).as("k_mod"))
      .agg(count(lit(1)).as("n_events"),
           round(lit(1e-9) + sum(col("value")), 2).as("sum_value"))
      .orderBy(col("k_mod"))

  val q17Sql: String =
    """SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_mod,
      |  count(*) AS n_events,
      |  round(1e-9 + sum(value), 2) AS sum_value
      |FROM events
      |GROUP BY 1
      |ORDER BY k_mod""".stripMargin

  /** Tumbling-window aggregation by event time (hourly) — batch-equivalent
    * of the Structured Streaming windowed agg. */
  def q18HourlyVolume(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:00").as("hour"),
               col("event_type"))
      .agg(count(lit(1)).as("n"),
           round(lit(1e-9) + sum(col("value")), 2).as("sum_value"))
      .orderBy(col("hour"), col("event_type"))

  val q18Sql: String =
    """SELECT strftime(date_trunc('hour', CAST(ts AS TIMESTAMP)), '%Y-%m-%d %H:00') AS hour,
      |  event_type,
      |  count(*) AS n,
      |  round(1e-9 + sum(value), 2) AS sum_value
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY hour, event_type""".stripMargin

  /** Sessionization: a new session starts after a >30 min silence per user.
    * lag + cumulative-sum windows; one shuffle on user_id. Gap arithmetic
    * on the raw int64 nanos for exactness in both engines. */
  def q19Sessionize(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts_ns"), col("event_id"))
    Tables.events(spark, dir)
      .withColumn("prev_ns", lag(col("ts_ns"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ns").isNull ||
             col("ts_ns") - col("prev_ns") > 1800L * 1000 * 1000 * 1000, 1L).otherwise(0L))
      .groupBy(col("user_id"))
      .agg(sum(col("new_session")).as("n_sessions"),
           count(lit(1)).as("n_events"))
      .orderBy(col("user_id"))
  }

  val q19Sql: String =
    """SELECT user_id, sum(new_session) AS n_sessions, count(*) AS n_events
      |FROM (
      |  SELECT user_id,
      |    CASE WHEN prev_ns IS NULL
      |              OR epoch_ns(ts) - prev_ns > 1800000000000 THEN 1 ELSE 0 END AS new_session
      |  FROM (
      |    SELECT user_id, ts, event_id,
      |      lag(epoch_ns(ts)) OVER (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id) AS prev_ns
      |    FROM events))
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin

  /** As-of join: each purchase event picks up the user's most recent
    * signup at-or-before it (point-in-time join; see
    * [[graft.operators.AsOfJoin]] for the scale rationale). */
  def q20AsofSignup(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts_ns"))
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("event_id").as("s_event_id"), col("user_id"), col("ts_ns"))
    AsOfJoin.backward(
      purchases, signups,
      key = "user_id", ts = "ts_ns",
      rightCols = Map("s_event_id" -> "signup_event_id"),
      rightTieBreak = "s_event_id")
      .select(col("event_id").as("purchase_event_id"),
              col("user_id"),
              col("signup_event_id").cast("long").as("signup_event_id"))
      .orderBy(col("purchase_event_id"))
  }

  val q20Sql: String =
    """SELECT p.event_id AS purchase_event_id, p.user_id,
      |  s.event_id AS signup_event_id
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') s
      |  ON p.user_id = s.user_id AND p.ts >= s.ts
      |ORDER BY purchase_event_id""".stripMargin

  /** Admission filter (reference: `check_metadata` with `start_time: -120`
    * — drop data older than 2 h relative to the newest message,
    * plugins/__init__.py:705-711). The max-ts scalar comes from a
    * broadcast single-row aggregate. */
  def q21AdmissionWindow(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val maxTs = ev.agg(max(col("ts_ns")).as("max_ns"))
    ev.crossJoin(broadcast(maxTs))
      .filter(col("ts_ns") >= col("max_ns") - lit(7200L * 1000 * 1000 * 1000))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_admitted"),
           round(lit(1e-9) + sum(col("value")), 2).as("sum_value"))
      .orderBy(col("event_type"))
  }

  val q21Sql: String =
    """SELECT event_type, count(*) AS n_admitted,
      |  round(1e-9 + sum(value), 2) AS sum_value
      |FROM events
      |WHERE epoch_ns(ts) >= (SELECT max(epoch_ns(ts)) FROM events) - 7200000000000
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  /** Metadata aliasing (reference: `metadata_alias`,
    * plugins/__init__.py:717-736): rewrite values through a small alias
    * map, pass unknown values through. Broadcast map-side join — the alias
    * table never shuffles the fact side. */
  def q22MetadataAlias(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val aliases = Seq(
      ("signup", "registration"),
      ("purchase", "sale"),
      ("error", "fault")).toDF("from_type", "to_type")
    Tables.events(spark, dir)
      .join(broadcast(aliases), col("event_type") === col("from_type"), "left")
      .withColumn("aliased_type", coalesce(col("to_type"), col("event_type")))
      .groupBy(col("aliased_type"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("aliased_type"))
  }

  val q22Sql: String =
    """SELECT coalesce(a.to_type, e.event_type) AS aliased_type, count(*) AS n
      |FROM events e
      |LEFT JOIN (VALUES ('signup', 'registration'), ('purchase', 'sale'),
      |                  ('error', 'fault')) AS a(from_type, to_type)
      |  ON e.event_type = a.from_type
      |GROUP BY 1
      |ORDER BY aliased_type""".stripMargin

  val defs: Map[String, Q] = Map(
    "q17_event_json" -> (q17EventJson _),
    "q18_hourly_volume" -> (q18HourlyVolume _),
    "q19_sessionize" -> (q19Sessionize _),
    "q20_asof_signup" -> (q20AsofSignup _),
    "q21_admission_window" -> (q21AdmissionWindow _),
    "q22_metadata_alias" -> (q22MetadataAlias _)
  )

  val oracles: Map[String, String] = Map(
    "q17_event_json" -> q17Sql,
    "q18_hourly_volume" -> q18Sql,
    "q19_sessionize" -> q19Sql,
    "q20_asof_signup" -> q20Sql,
    "q21_admission_window" -> q21Sql,
    "q22_metadata_alias" -> q22Sql
  )
}
