package graft.queries

import graft.Tables
import graft.streaming.Sessionize
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Gate coverage for the streaming-shaped operators evaluated in batch
  * mode: gap-based sessionization (session_window) and the watermarked
  * fixed-window aggregation. The DuckDB oracles re-derive sessions
  * independently with lag + cumulative-sum — a drift in session_window
  * semantics (gap inclusivity, end = last+gap) breaks the hash match.
  */
object StreamQueries {

  type Q = (SparkSession, String) => DataFrame

  def queries: Map[String, Q] = Map(
    "st1_sessionize" -> ((s, d) => {
      Sessionize.sessionize(Tables.events(s, d), "ts", "user_id",
        "15 minutes")
        .orderBy(col("user_id"), col("session_start"))
    }),

    "st2_windowed_counts" -> ((s, d) => {
      graft.streaming.IncrementalLoad.windowedEventCounts(
        Tables.events(s, d), "ts", "event_type", "1 hour", "1 day")
        .orderBy(col("window_start"), col("event_type"))
    }),

    // semi-structured props: typed from_json parse (schema-on-read), then
    // aggregate on the extracted field — the event-pipeline idiom the
    // flat-relational reference lacks. Oracle re-extracts with DuckDB's
    // own JSON parser (json_extract_string + TRY_CAST) — independent of
    // Spark's parser AND of the generator's formatting (the earlier regex
    // oracle was coupled to the exact '"k": N' whitespace).
    "e1_json_props" -> ((s, d) => {
      val schema = "k INT"
      Tables.events(s, d)
        .select(col("event_type"),
          from_json(col("props"), org.apache.spark.sql.types.StructType
            .fromDDL(schema)).getField("k").as("k"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("k")).cast("long").as("sum_k"),
          max(col("k")).as("max_k"))
        .orderBy(col("event_type"))
    }),

    // ordered funnel: first view → first click after it → first purchase
    // after that, per user; one shuffle on user_id, reused by every
    // stage (co-partitioned joins on the same key don't re-exchange)
    "e2_funnel" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val v = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ts")).as("v_ts"))
      val c = ev.filter(col("event_type") === "click")
        .join(v, "user_id").filter(col("ts") > col("v_ts"))
        .groupBy(col("user_id"), col("v_ts"))
        .agg(min(col("ts")).as("c_ts"))
      val p = ev.filter(col("event_type") === "purchase")
        .join(c, "user_id").filter(col("ts") > col("c_ts"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("p_ts"))
      def stage(df: DataFrame, name: String) =
        df.agg(count(lit(1)).as("n_users")).select(
          lit(name).as("stage"), col("n_users"))
      stage(v, "1_view")
        .unionByName(stage(c, "2_click_after_view"))
        .unionByName(stage(p, "3_purchase_after_click"))
        .orderBy(col("stage"))
    }),

    // as-of join: each click enriched with the latest preceding view's
    // value for the same user (union+window form — one shuffle)
    "aj1_asof_join" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      graft.operators.AsOf.asofJoin(clicks, views, Seq("user_id"), "ts",
        pickCols = Seq("value"), ordCol = Some("event_id"))
        .orderBy(col("event_id"))
    }),
  )

  def oracles: Map[String, String] = Map(
    "st1_sessionize" ->
      """WITH e AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events),
        |lagged AS (
        |  SELECT *, CASE WHEN lag(ts) OVER w IS NULL
        |    OR ts - lag(ts) OVER w >= INTERVAL 15 MINUTE
        |    THEN 1 ELSE 0 END AS new_s
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |sess AS (
        |  SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |    ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM lagged)
        |SELECT user_id, MIN(ts) AS session_start,
        |  MAX(ts) + INTERVAL 15 MINUTE AS session_end,
        |  MIN(ts) AS first_event, MAX(ts) AS last_event,
        |  COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM sess GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin,

    "st2_windowed_counts" ->
      """SELECT time_bucket(INTERVAL 1 HOUR, CAST(ts AS TIMESTAMP))
        |    AS window_start,
        |  time_bucket(INTERVAL 1 HOUR, CAST(ts AS TIMESTAMP))
        |    + INTERVAL 1 HOUR AS window_end,
        |  event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM events
        |GROUP BY 1, 2, 3
        |ORDER BY window_start, event_type""".stripMargin,

    "e1_json_props" ->
      """SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(TRY_CAST(json_extract_string(props, '$.k')
        |    AS INT)) AS BIGINT) AS sum_k,
        |  CAST(MAX(TRY_CAST(json_extract_string(props, '$.k')
        |    AS INT)) AS INT) AS max_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "e2_funnel" ->
      """WITH v AS (
        |  SELECT user_id, MIN(ts) AS v_ts FROM events
        |  WHERE event_type = 'view' GROUP BY user_id),
        |c AS (
        |  SELECT e.user_id, MIN(e.ts) AS c_ts
        |  FROM events e JOIN v ON e.user_id = v.user_id
        |  WHERE e.event_type = 'click' AND e.ts > v.v_ts
        |  GROUP BY e.user_id),
        |p AS (
        |  SELECT e.user_id, MIN(e.ts) AS p_ts
        |  FROM events e JOIN c ON e.user_id = c.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts > c.c_ts
        |  GROUP BY e.user_id)
        |SELECT stage, n_users FROM (
        |  SELECT '1_view' AS stage, COUNT(*) AS n_users FROM v
        |  UNION ALL
        |  SELECT '2_click_after_view', COUNT(*) FROM c
        |  UNION ALL
        |  SELECT '3_purchase_after_click', COUNT(*) FROM p)
        |ORDER BY stage""".stripMargin,

    "aj1_asof_join" ->
      """WITH clicks AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, value
        |  FROM events WHERE event_type = 'click'),
        |views AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, value
        |  FROM events WHERE event_type = 'view')
        |SELECT c.user_id, c.ts, c.event_id, c.value,
        |  (SELECT v.value FROM views v
        |   WHERE v.user_id = c.user_id AND v.ts <= c.ts
        |   ORDER BY v.ts DESC, v.event_id DESC LIMIT 1) AS value_asof
        |FROM clicks c ORDER BY c.event_id""".stripMargin,
  )
}
