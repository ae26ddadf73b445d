package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.Cleansing

/** The generic DW-load operators (SURVEY.md §7.1 item 4). Each is a plain
  * DataFrame combinator — no Catalyst extension needed for parity — but
  * every one is written for the 1000-executor case: dim sides broadcast,
  * change predicates stay inside codegen, and the only global barrier
  * (gap-free key assignment) has a scale-path alternative.
  */

// ---------------------------------------------------------------------------
// Dim-key resolution (J2-J5): normalized-key broadcast left joins
// ---------------------------------------------------------------------------

/** One dimension lookup: resolve `factCols` (physical columns on the fact
  * side) against `dim`'s `dimCols` after key normalization on BOTH sides,
  * producing `outCol` = dim's `keyCol`. The reference's in-memory dict
  * probe (load_fact_sales_dw.py:129-154, 213-261) IS a broadcast hash
  * join build side — we say so explicitly.
  */
final case class DimLookup(
    dim: DataFrame,
    factCols: Seq[String],
    dimCols: Seq[String],
    keyCol: String,
    outCol: String,
    /** Optional name-only fallback (J3): fact col + dim col + "first wins"
      * ordering column on the dim side. */
    fallback: Option[(String, String, String)] = None)

object DimResolver {

  private def norm(c: Column): Column = Cleansing.normalizeKey(c)

  /** Left-join every lookup in sequence; unresolved keys stay null (the
    * caller drops/counts them — P5). Dims are broadcast: at 100 TB the
    * fact side never shuffles for dimension resolution. */
  def resolveDimKeys(facts: DataFrame, lookups: Seq[DimLookup]): DataFrame =
    lookups.foldLeft(facts) { (df, lk) =>
      val dimKeyed = lk.dim.select(
        (lk.dimCols.zipWithIndex.map { case (c, i) =>
          norm(col(c)).as(s"__dk$i") } :+ col(lk.keyCol).as(lk.outCol)): _*)
        // one dim row per normalized key (dict semantics: last put wins in
        // python; we keep MIN key for determinism — documented deviation)
        .groupBy((0 until lk.dimCols.size).map(i => col(s"__dk$i")): _*)
        .agg(min(col(lk.outCol)).as(lk.outCol))
      val joinCond = lk.factCols.zipWithIndex.map { case (c, i) =>
        norm(df(c)) === dimKeyed(s"__dk$i") }.reduce(_ && _)
      val joined = df.join(broadcast(dimKeyed), joinCond, "left")
        .drop((0 until lk.dimCols.size).map(i => s"__dk$i"): _*)
      lk.fallback match {
        case None => joined
        case Some((factNameCol, dimNameCol, ordCol)) =>
          // J3: name-only map populated with the FIRST-seen key by ordCol
          val byName = lk.dim
            .select(norm(col(dimNameCol)).as("__fk"),
              col(lk.keyCol).as("__fb"), col(ordCol).as("__ord"))
            .withColumn("__rn", row_number().over(
              Window.partitionBy(col("__fk")).orderBy(col("__ord"))))
            .filter(col("__rn") === 1).drop("__rn", "__ord")
          joined.join(broadcast(byName),
              norm(joined(factNameCol)) === byName("__fk"), "left")
            .withColumn(lk.outCol, coalesce(col(lk.outCol), col("__fb")))
            .drop("__fk", "__fb")
      }
    }

  /** Per-dimension miss counters (load_fact_sales_dw.py:263-277) in ONE
    * pass — a single aggregate, not one count() job per dim. */
  def missCounts(resolved: DataFrame, outCols: Seq[String]): Map[String, Long] = {
    val aggs = outCols.map(c =>
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(c))
    val row = resolved.agg(aggs.head, aggs.tail: _*).collect()(0)
    outCols.zipWithIndex.map { case (c, i) => c -> row.getLong(i) }.toMap
  }
}

// ---------------------------------------------------------------------------
// Change classification (J6/J7): INSERT vs UPDATE vs unchanged
// ---------------------------------------------------------------------------

final case class TrackedCol(name: String, tolerance: Option[Double] = None)

object ChangeClassifier {

  /** Null-safe per-column change predicate over aliased sides: numeric
    * with tolerance (|a-b| > tol, F23), strings ''-coalesced. */
  private def changePredicate(tracked: Seq[TrackedCol], inA: String,
      exA: String): Column =
    tracked.map { tc =>
      val a = col(s"$inA.${tc.name}")
      val b = col(s"$exA.${tc.name}")
      tc.tolerance match {
        case Some(tol) => Cleansing.numericChanged(a, b, tol)
        case None      => Cleansing.stringChanged(a, b)
      }
    }.reduce(_ || _)

  /** Classify `incoming` vs `existing` on business key `bk`:
    * INSERTs = left_anti on bk; UPDATEs = inner join where any tracked
    * attribute changed. Returns incoming's columns + an `operation` tag
    * (O4). Matches load_dim_product_dw.py:500-552 and clones. Sides are
    * aliased so incoming/existing may share lineage (self-join safe).
    *
    * Scale: one shuffle of each side on bk (sort-merge); when `existing`
    * is a dimension (small), Spark's AQE broadcasts it automatically.
    *
    * `nullSafeKeys` (default true) matches the reference's pandas-dict
    * probe, where None components of a composite key DO match (product bk
    * includes nullable `size`). Pass false when every bk column is
    * provably non-null (e.g. the fact's concat-built natural_key):
    * Catalyst rewrites `<=>` joins to hash on `coalesce(k,''),isnull(k)`,
    * which disqualifies a bucketed `existing` from co-located scans —
    * plain `===` keeps the bucket layout and the target side unshuffled.
    */
  def classifyChanges(incoming: DataFrame, existing: DataFrame,
      bk: Seq[String], tracked: Seq[TrackedCol],
      nullSafeKeys: Boolean = true): DataFrame = {
    val in2 = incoming.alias("__in")
    val ex2 = existing.alias("__ex")
    val joinCond = bk.map { k =>
      if (nullSafeKeys) col(s"__in.$k") <=> col(s"__ex.$k")
      else col(s"__in.$k") === col(s"__ex.$k")
    }.reduce(_ && _)
    val inCols = incoming.columns.map(c => col(s"__in.$c"))
    val inserts = in2.join(ex2, joinCond, "left_anti")
      .withColumn("operation", lit("INSERT"))
    val updates = in2.join(ex2, joinCond, "inner")
      .filter(changePredicate(tracked, "__in", "__ex"))
      .select(inCols.toIndexedSeq: _*)
      .withColumn("operation", lit("UPDATE"))
    inserts.unionByName(updates)
  }
}

// ---------------------------------------------------------------------------
// Surrogate keys (W1)
// ---------------------------------------------------------------------------

object SurrogateKeys {

  /** Gap-free sequential keys: maxKey + global rank over a stable total
    * order — SAME semantics as `row_number().over(Window.orderBy(ord))`,
    * executed scalably: range-repartition on the order columns, sort
    * within partitions, then zipWithIndex (per-partition counts + offset
    * prefix-sum). No single-reducer WindowExec anywhere: the old
    * unpartitioned-window form funneled every row through one task, the
    * silent scale cliff SURVEY §7.4 risk 1 warns about. Cost is one range
    * shuffle + one light count job — the shuffle also existed in the
    * window form; the single reducer is what's gone. Keys are contiguous
    * maxKey+1..maxKey+N in `ord` order (ties ranked arbitrarily but
    * counted once, exactly like row_number). */
  def assignSequential(newRows: DataFrame, keyCol: String, maxKey: Long,
      ord: Seq[Column]): DataFrame = {
    require(ord.nonEmpty, "assignSequential needs a total order; " +
      "use assignContiguous for order-free contiguous keys")
    val spark = newRows.sparkSession
    val sorted = newRows.repartitionByRange(ord: _*)
      .sortWithinPartitions(ord: _*)
    val withKeys = sorted.rdd.zipWithIndex().map { case (row, idx) =>
      org.apache.spark.sql.Row.fromSeq(row.toSeq :+ (maxKey + idx + 1L))
    }
    spark.createDataFrame(withKeys, sorted.schema.add(keyCol, "long"))
  }

  /** Scale path: contiguous (gap-free) but order-free keys via
    * per-partition counts + offsets — no global sort, no single reducer.
    * The reference only needs max+1 density, not a particular order
    * (SURVEY §7.4 risk 1). */
  def assignContiguous(newRows: DataFrame, keyCol: String,
      maxKey: Long): DataFrame = {
    val spark = newRows.sparkSession
    import spark.implicits._
    val counts = newRows.rdd.mapPartitionsWithIndex { case (i, it) =>
      Iterator.single(i -> it.size.toLong)
    }.collect().sortBy(_._1)
    val offsets = counts.map(_._2).scanLeft(maxKey)(_ + _)
    val offsetByPart = counts.map(_._1).zip(offsets).toMap
    val schema = newRows.schema
    val withKeys = newRows.rdd.mapPartitionsWithIndex { case (i, it) =>
      var k = offsetByPart(i)
      it.map { row => k += 1
        org.apache.spark.sql.Row.fromSeq(row.toSeq :+ k) }
    }
    spark.createDataFrame(withKeys, schema.add(keyCol, "long"))
  }

  /** Read the current max key (A1: NVL(MAX(id),0)). */
  def currentMax(df: DataFrame, keyCol: String): Long =
    df.agg(coalesce(max(col(keyCol)), lit(0L)).cast("long")).collect()(0)
      .getLong(0)
}

// ---------------------------------------------------------------------------
// Merge upsert (J8): the one genuinely custom operator
// ---------------------------------------------------------------------------

object MergeInto {

  /** MERGE re-expressed as a full-outer join + column-wise coalesce:
    * matched rows take the staged values, unmatched-target rows pass
    * through, unmatched-staged rows insert. `updateCols` limits which
    * columns a match overwrites (WHEN MATCHED UPDATE SET list); an
    * optional `opCol` guard replays the reference's operation-tag
    * discipline (update only rows tagged UPDATE, insert only INSERT —
    * load_fact_sales_dw.py:390-418).
    *
    * The result must be atomically swapped in by the caller (overwrite a
    * parquet/table location) — same re-runnability contract as the
    * reference's staging + MERGE + commit.
    *
    * Scale: one shuffle of both sides on the key (sort-merge). With a
    * bucketed/partitioned target AND `nullSafeKeys=false`, Spark
    * co-locates and the exchange on the target side disappears
    * (see [[ChangeClassifier.classifyChanges]] — `<=>` defeats bucket
    * co-location; Oracle's `MERGE ON (t.k = s.k)` is plain equality
    * anyway, so false is also the reference-faithful setting). AQE
    * handles staged-side skew.
    */
  def mergeInto(target: DataFrame, staged: DataFrame, onKeys: Seq[String],
      updateCols: Seq[String], opCol: Option[String] = None,
      nullSafeKeys: Boolean = true): DataFrame = {
    val t = target.alias("t")
    val s = staged.alias("s")
    val cond = onKeys.map { k =>
      if (nullSafeKeys) col(s"t.$k") <=> col(s"s.$k")
      else col(s"t.$k") === col(s"s.$k")
    }.reduce(_ && _)
    val joined0 = t.join(s, cond, "full_outer")
    // NOT MATCHED + op != 'INSERT' rows are dropped (the reference's
    // WHEN NOT MATCHED ... WHERE op='INSERT' guard).
    val joined = opCol match {
      case Some(op) => joined0.filter(
        col(s"t.${onKeys.head}").isNotNull ||
          col(s"s.$op") === "INSERT")
      case None => joined0
    }
    val sUpdates = opCol match {
      case Some(op) => col(s"s.${onKeys.head}").isNotNull &&
        (col(s"s.$op") === "UPDATE" || col(s"t.${onKeys.head}").isNull)
      case None => col(s"s.${onKeys.head}").isNotNull
    }
    val outCols = target.columns.map { c =>
      val fromS = col(s"s.$c")
      val fromT = col(s"t.$c")
      if (onKeys.contains(c)) coalesce(fromT, fromS).as(c)
      else if (updateCols.contains(c))
        when(sUpdates, fromS).otherwise(fromT).as(c)
      else coalesce(fromT, fromS).as(c)
    }
    joined.select(outCols.toIndexedSeq: _*)
  }
}

// ---------------------------------------------------------------------------
// Dedup on business key (A8) and lookup-dim upsert
// ---------------------------------------------------------------------------

object Dedupe {

  /** Deterministic drop_duplicates(subset=bk, keep=first-by-ord). The
    * pandas original relies on file order (§7.4 risk 3); we require an
    * explicit ordering. keep='last' = pass descending ord columns. */
  def dedupeByKey(df: DataFrame, bk: Seq[String], ord: Seq[Column]): DataFrame =
    df.withColumn("__rn", row_number().over(
        Window.partitionBy(bk.map(col): _*).orderBy(ord: _*)))
      .filter(col("__rn") === 1).drop("__rn")
}

object LookupDim {

  /** Snowflake lookup-dim maintenance (load_dim_product_dw.py:428-466,
    * load_dim_store_dw.py:227-258): collect distinct incoming values,
    * anti-join against the existing dim, assign keys from max+1, append.
    * Returns (updatedDim, newRows). */
  def upsert(existing: DataFrame, incoming: DataFrame, valueCol: String,
      keyCol: String): (DataFrame, DataFrame) = {
    val fresh = incoming.select(col(valueCol)).filter(col(valueCol).isNotNull)
      .distinct()
      .join(existing, Seq(valueCol), "left_anti")
    val maxKey = SurrogateKeys.currentMax(existing, keyCol)
    val newRows = SurrogateKeys.assignSequential(
      fresh, keyCol, maxKey, Seq(col(valueCol)))
      .select(col(keyCol), col(valueCol))
    (existing.select(col(keyCol), col(valueCol)).unionByName(newRows), newRows)
  }
}
