package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event sessionization and custom stateful processing over the events
  * stream — the Structured-Streaming surface of the engine.
  *
  * sessionize: gap-based sessions through the BUILT-IN session_window
  * (works identically batch and streaming — compose-first per SURVEY
  * §7.3, no custom state needed for standard gap semantics).
  *
  * runningUserStats: the KeyValueGroupedDataset.mapGroupsWithState path
  * for state session_window can't express — cumulative per-user
  * lifetime aggregates maintained across micro-batches.
  */
object Sessionize {

  /** Gap-based sessions: one row per (key, session) with start/end/n/sum.
    * session_end is the last event + gap (session_window semantics).
    * Works on a static frame or a stream (add a watermark upstream for
    * streaming state eviction). */
  def sessionize(events: DataFrame, tsCol: String, keyCol: String,
      gap: String): DataFrame =
    events.groupBy(session_window(col(tsCol), gap), col(keyCol))
      .agg(count(lit(1)).as("n_events"),
        min(col(tsCol)).as("first_event"),
        max(col(tsCol)).as("last_event"),
        sum(col("value").cast("decimal(18,4)")).cast("double")
          .as("sum_value"))
      .select(col(keyCol),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("first_event"), col("last_event"), col("n_events"),
        col("sum_value"))

  final case class UserEvent(user_id: Long, event_type: String,
      value: Double)
  final case class UserStats(user_id: Long, n_events: Long,
      sum_value: Double, n_purchases: Long)

  final case class TimedEvent(user_id: Long, ts: java.sql.Timestamp,
      value: Double)
  final case class ClosedSession(user_id: Long,
      session_start: java.sql.Timestamp, session_end: java.sql.Timestamp,
      n_events: Long, sum_value: Double)
  final case class SessState(startMs: Long, lastMs: Long,
      n: Long, total: Double)

  /** Custom-state sessionization with EVENT-TIME TIMEOUT — the
    * flatMapGroupsWithState shape for semantics session_window can't
    * express (emit-on-close, custom per-session payloads): events fold
    * into per-user open-session state; when the watermark passes
    * last_event + gap the timeout fires and the CLOSED session is
    * emitted exactly once. Batches may carry several sessions' worth of
    * events — intra-batch gaps close sessions inline. */
  def closedSessions(events: Dataset[TimedEvent], gapSeconds: Long,
      watermark: String): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.GroupStateTimeout
    val gapMs = gapSeconds * 1000
    def fold(userId: Long, rows: Iterator[TimedEvent],
        state: GroupState[SessState]): Iterator[ClosedSession] = {
      if (state.hasTimedOut) {
        val s = state.get
        state.remove()
        return Iterator.single(ClosedSession(userId,
          new java.sql.Timestamp(s.startMs),
          new java.sql.Timestamp(s.lastMs + gapMs), s.n, s.total))
      }
      val sorted = rows.toSeq.sortBy(_.ts.getTime)
      var open = state.getOption
      val closed = scala.collection.mutable.ArrayBuffer.empty[ClosedSession]
      sorted.foreach { e =>
        val t = e.ts.getTime
        open match {
          case Some(s) if t - s.lastMs < gapMs =>
            open = Some(SessState(s.startMs, math.max(s.lastMs, t),
              s.n + 1, s.total + e.value))
          case Some(s) =>
            closed += ClosedSession(userId, new java.sql.Timestamp(s.startMs),
              new java.sql.Timestamp(s.lastMs + gapMs), s.n, s.total)
            open = Some(SessState(t, t, 1L, e.value))
          case None =>
            open = Some(SessState(t, t, 1L, e.value))
        }
      }
      open.foreach { s =>
        state.update(s)
        state.setTimeoutTimestamp(s.lastMs + gapMs)
      }
      closed.iterator
    }
    events.withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(fold)
  }

  /** Cumulative per-user stats via mapGroupsWithState: each micro-batch
    * folds its events into the user's persistent state and emits the
    * updated totals. Batch mode: single fold (state starts empty). */
  def runningUserStats(events: Dataset[UserEvent]): Dataset[UserStats] = {
    import events.sparkSession.implicits._
    def update(userId: Long, rows: Iterator[UserEvent],
        state: GroupState[UserStats]): UserStats = {
      val prev = state.getOption
        .getOrElse(UserStats(userId, 0L, 0.0, 0L))
      val next = rows.foldLeft(prev) { (s, e) =>
        UserStats(userId, s.n_events + 1, s.sum_value + e.value,
          s.n_purchases + (if (e.event_type == "purchase") 1 else 0))
      }
      state.update(next)
      next
    }
    events.groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(update)
  }
}

/** Skew handling for large joins (the "salting" scale lever): replicate
  * the small side `salts` times and scatter the big side's hot keys
  * across the replicas, so one hot key fans out over `salts` reducers
  * instead of melting a single one. AQE's skew-join handles sort-merge
  * cases automatically; explicit salting remains the tool for
  * deterministic layouts, aggregations after the join, and pre-AQE
  * engines.
  */
object Salting {

  /** Equi-join big⋈small on `key` with `salts`-way salt. Result equals
    * the unsalted join (spec-pinned); the salt column never escapes. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      salts: Int): DataFrame = {
    val saltedBig = big.withColumn("__salt",
      pmod(xxhash64(struct(big.columns.map(col): _*)), lit(salts))
        .cast("int"))
    val saltedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedBig.join(saltedSmall, Seq(key, "__salt")).drop("__salt")
  }
}
