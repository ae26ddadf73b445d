package graft.validate

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops.QuantileSketch

/** Tabular stats-drift monitoring for continuous ingestion — the
  * table-shaped sibling of the vector store's recall monitor (ann6).
  * A pipeline loading batch after batch needs to notice when a feed
  * silently changes shape: a null-rate jump (an upstream column went
  * optional), a mean shift (a unit change), a tail move (an outlier
  * regime). The reference's check suite (§2.8) validates each batch in
  * isolation; drift is the cross-batch question.
  *
  * [[profile]] reduces a batch to one row per column — counts, mean,
  * and deterministic log-histogram p50/p99 — so the drift state is
  * O(columns) regardless of batch size, storable next to the batch
  * ledger, and comparable across engines (the sketch is the integer
  * bucket math of [[graft.ops.QuantileSketch]]; the mean is an exact
  * integer sum divided once, in doubles, at the end).
  *
  * [[compare]] joins two profiles and emits one row per (column,
  * metric) with the drift verdict: null-rate drift in exact integer
  * ppm, mean/p50/p99 drift by relative threshold. All arithmetic on
  * the compared values is either exact integer or single IEEE ops on
  * identical inputs, so verdicts are bit-stable across runs, engines,
  * and partitionings — a drift gate that flickers is worse than none.
  *
  * Scale shape: one scan for the moment stats (a single one-row
  * aggregate — the bounded-collect pattern of Checks.numericProfile),
  * one scan for the sketches (explode to (column, value) pairs, then
  * the sketch's narrow (column, bkt) shuffle with map-side combine).
  * Values must be non-negative integer-scaled longs (cents, not
  * dollars) — the sketch's contract.
  */
object Drift {

  val quantileNames: Seq[(String, Int, Int)] =
    Seq(("p50", 1, 2), ("p99", 99, 100))

  /** One row per column: (column_name, n, non_null, avg, p50, p99).
    * `n` is the batch row count (same for every column), `avg` the
    * mean over non-null values, p50/p99 the log-histogram estimates
    * (upper bucket edges — within 2^-m relative of exact). */
  def profile(df: DataFrame, cols: Seq[String], m: Int = 7): DataFrame = {
    val spark = df.sparkSession
    val aggs = count(lit(1)).as("n") +: cols.flatMap { c =>
      Seq(count(col(c)).as(s"${c}__nn"),
        (sum(col(c).cast(DecimalType(38, 0))).cast("double") /
          count(col(c))).as(s"${c}__avg"))
    }
    val r = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    val statRows = cols.zipWithIndex.map { case (c, i) =>
      Row(c, r.getLong(0), r.getLong(1 + i * 2),
        if (r.isNullAt(2 + i * 2)) null
        else java.lang.Double.valueOf(r.getDouble(2 + i * 2)))
    }
    val stats = spark.createDataFrame(
      spark.sparkContext.parallelize(statRows, 1),
      StructType(Seq(
        StructField("column_name", StringType, nullable = false),
        StructField("n", LongType, nullable = false),
        StructField("non_null", LongType, nullable = false),
        StructField("avg", DoubleType))))
    // one scan for all sketches: explode to (column_name, v) pairs —
    // the shuffle after map-side combine is (column, bucket) counts,
    // tiny regardless of input size
    val pairs = df.select(explode(array(cols.map(c =>
      struct(lit(c).as("column_name"), col(c).cast(LongType).as("v"))): _*))
      .as("e")).select(col("e.column_name").as("column_name"),
      col("e.v").as("v"))
    val est = QuantileSketch.quantiles(
      QuantileSketch.summarize(pairs, Seq("column_name"), "v", m),
      Seq("column_name"), quantileNames)
    stats.join(est, Seq("column_name"), "left")
  }

  /** Distributed, MERGEABLE profile state — the continuous-monitoring
    * form of [[profile]]. Rows are (column_name, bkt, cnt, non_null,
    * vsum, m): bkt = −1 carries the moment sums (cnt = row count,
    * vsum = exact decimal sum), bkt ≥ 0 the sketch buckets. Every
    * piece is a SUM, so disjoint batches fold by [[foldProfiles]]
    * into exactly the one-pass state — a streaming baseline never
    * re-touches history — and unlike [[profile]] nothing collects to
    * the driver, so it composes with foreachBatch maintenance
    * ([[graft.streaming.StreamingSummary.maintainProfileFromFiles]]). */
  def mergeableProfile(df: DataFrame, cols: Seq[String], m: Int = 7)
      : DataFrame = {
    val pairs = df.select(explode(array(cols.map(c =>
      struct(lit(c).as("column_name"), col(c).cast(LongType).as("v"))): _*))
      .as("e")).select(col("e.column_name").as("column_name"),
      col("e.v").as("v"))
    val moments = pairs.groupBy(col("column_name")).agg(
      count(lit(1)).as("cnt"), count(col("v")).as("non_null"),
      coalesce(sum(col("v").cast(DecimalType(38, 0))),
        lit(0).cast(DecimalType(38, 0))).as("vsum"))
      .select(col("column_name"), lit(-1L).as("bkt"), col("cnt"),
        col("non_null"), col("vsum"), lit(m.toLong).as("m"))
    val sketch = QuantileSketch.summarize(pairs, Seq("column_name"), "v", m)
      .select(col("column_name"), col("bkt"), col("cnt"),
        lit(0L).as("non_null"), lit(0).cast(DecimalType(38, 0)).as("vsum"),
        col("m"))
    moments.unionByName(sketch)
  }

  /** Merge two mergeable-profile states (disjoint inputs ⇒ exactly the
    * one-pass state). Mixed sketch resolutions fail loudly — here for
    * same-bucket collisions, and at [[profileOf]] decode for the rest. */
  def foldProfiles(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy(col("column_name"), col("bkt")).agg(
      sum(col("cnt")).as("cnt"), sum(col("non_null")).as("non_null"),
      sum(col("vsum")).cast(DecimalType(38, 0)).as("vsum"),
      when(min(col("m")) =!= max(col("m")), raise_error(lit(
        "Drift: folding profiles of different sketch resolution")))
        .otherwise(min(col("m"))).as("m"))

  /** Decode a mergeable state to the (column_name, n, non_null, avg,
    * p50, p99) shape [[compare]] consumes — identical, value for
    * value, to running [[profile]] over the concatenated data. */
  def profileOf(state: DataFrame): DataFrame = {
    val moments = state.filter(col("bkt") === -1L).select(
      col("column_name"), col("cnt").as("n"), col("non_null"),
      when(col("non_null") === 0L, lit(null).cast("double"))
        .otherwise(col("vsum").cast("double") / col("non_null"))
        .as("avg"))
    val est = QuantileSketch.quantiles(
      state.filter(col("bkt") >= 0L)
        .select("column_name", "bkt", "cnt", "m"),
      Seq("column_name"), quantileNames)
    moments.join(est, Seq("column_name"), "left")
  }

  /** Long-format drift report: one row per (column_name, metric) with
    * metric ∈ {null_ppm, avg, p50, p99}, the two values (as doubles —
    * exact for the integer metrics), and the `drifted` verdict.
    * Null-rate drifts when the exact integer ppm moves more than
    * `nullPpmTol`; the value metrics drift when the relative change
    * exceeds `relTol` (a metric present on one side only — e.g. an
    * all-null column's mean — always drifts). Columns are compared by
    * inner join: profile both sides over the same column list. */
  def compare(current: DataFrame, baseline: DataFrame,
      relTol: Double = 0.05, nullPpmTol: Long = 10000L): DataFrame = {
    val b = baseline.select(col("column_name"), col("n").as("b_n"),
      col("non_null").as("b_nn"), col("avg").as("b_avg"),
      col("p50").as("b_p50"), col("p99").as("b_p99"))
    val c = current.select(col("column_name"), col("n").as("c_n"),
      col("non_null").as("c_nn"), col("avg").as("c_avg"),
      col("p50").as("c_p50"), col("p99").as("c_p99"))
    val j = c.join(b, "column_name")
    def ppm(n: Column, nn: Column): Column =
      call_function("div", (n - nn) * lit(1000000L), n)
    def relDrift(bv: Column, cv: Column): Column =
      when(bv.isNull && cv.isNull, lit(false))
        .when(bv.isNull || cv.isNull, lit(true))
        .otherwise(abs(cv - bv) > lit(relTol) * abs(bv))
    val bPpm = ppm(col("b_n"), col("b_nn"))
    val cPpm = ppm(col("c_n"), col("c_nn"))
    val metrics: Seq[(String, Column, Column, Column)] = Seq(
      ("null_ppm", bPpm.cast("double"), cPpm.cast("double"),
        abs(cPpm - bPpm) > nullPpmTol),
      ("avg", col("b_avg"), col("c_avg"),
        relDrift(col("b_avg"), col("c_avg"))),
      ("p50", col("b_p50").cast("double"), col("c_p50").cast("double"),
        relDrift(col("b_p50").cast("double"), col("c_p50").cast("double"))),
      ("p99", col("b_p99").cast("double"), col("c_p99").cast("double"),
        relDrift(col("b_p99").cast("double"), col("c_p99").cast("double"))))
    metrics.map { case (name, bv, cv, flag) =>
      j.select(col("column_name"), lit(name).as("metric"),
        bv.as("base_value"), cv.as("cur_value"), flag.as("drifted"))
    }.reduce(_ unionByName _)
  }
}
