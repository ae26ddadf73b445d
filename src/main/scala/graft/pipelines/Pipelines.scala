package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.datagen.DataGen
import graft.datedim.DateDim
import graft.functions.Cleansing
import graft.ops._
import graft.schema.{LogicalCol, SchemaMapper}
import graft.sources.{CsvIO, Ledger}
import graft.validate._

/** The reference's four DAGs (SURVEY §3 E1-E3 + §2.8 V10) composed from
  * the engine's operators — a user of Dynamic-ETL maps each Airflow task
  * onto one of these entry points.
  *
  *   E1 sourceLoad   : generate dims + facts → parquet "source DB"
  *   E2 extract      : full fact dump (comma CSV, rotation) + 4-way
  *                     star-join snapshot (pipe CSV into incoming/)
  *   E3 dwLoad       : incoming snapshot CSV → schema-resolve → clean →
  *                     resolve dim keys → classify changes → assign
  *                     surrogate keys → merge into the DW fact
  *   V10 validation  : per-table declarative contracts
  */
object Pipelines {

  // ---- E1: daily source load -------------------------------------------
  final case class SourceDb(products: DataFrame, stores: DataFrame,
      distributors: DataFrame, dates: DataFrame, facts: DataFrame)

  def sourceLoad(spark: SparkSession, root: String, nFacts: Long = 1000,
      dateId: Int = 20240115, seed: Long = 42): SourceDb = {
    val products = DataGen.products(spark, 50, seed)
    val stores = DataGen.stores(spark, 30, seed + 1)
    val dists = DataGen.distributors(spark, 10, seed + 2)
    val dates = DateDim.generate(spark, "2024-01-01", "2024-01-31")
    // guard: fact day must exist in dim_date (J9, fact_sales_daily.py:22-33)
    require(dates.filter(col("date_id") === dateId).limit(1).count() > 0,
      s"date_id $dateId missing from dim_date")
    val facts = DataGen.factSales(spark, nFacts, dateId, products, stores,
      dists, seed + 3)
    Seq("products" -> products, "stores" -> stores,
      "distributors" -> dists, "dates" -> dates, "facts" -> facts)
      .foreach { case (n, df) =>
        df.write.mode("overwrite").parquet(s"$root/source/$n") }
    SourceDb(
      spark.read.parquet(s"$root/source/products"),
      spark.read.parquet(s"$root/source/stores"),
      spark.read.parquet(s"$root/source/distributors"),
      spark.read.parquet(s"$root/source/dates"),
      spark.read.parquet(s"$root/source/facts"))
  }

  // ---- E2: extract + denormalized snapshot ------------------------------
  /** Full-dump comma CSV with Current→Archive rotation, then the wide
    * star-join snapshot as pipe CSV into incoming/ (S2/S3/S6/J1/O1). */
  def extract(spark: SparkSession, db: SourceDb, root: String): DataFrame = {
    CsvIO.rotate(spark, s"$root/extract/Current", s"$root/extract/Archive")
    CsvIO.write(db.facts.orderBy(col("sales_id"))
      .select(db.facts.columns.map(c => col(c).cast("string")): _*),
      s"$root/extract/Current/fact_sales", sep = ",")
    val snapshot = db.facts
      .join(broadcast(db.stores), "store_id")
      .join(broadcast(db.products), "product_id")
      .join(broadcast(db.distributors), "dist_id")
      .join(broadcast(db.dates), "date_id")
      .select(
        col("sales_id"), col("date_id"), col("full_date"),
        col("store_id"), col("store_name"), col("class_of_trade"),
        col("is_chain"), col("city"), col("state"),
        col("product_id"), col("product_name"), col("brand"),
        col("category"), col("sub_category"), col("manufacturer"),
        db.products("unit_price").as("product_unit_price"),
        col("dist_id"), col("dist_name"), col("dist_type"),
        col("active_flag"),
        col("quantity_sold"), db.facts("unit_price").as("sales_unit_price"),
        col("gross_amount"), col("discount_amount"), col("net_amount"))
      .orderBy(col("sales_id"))
    CsvIO.write(snapshot
      .select(snapshot.columns.map(c => col(c).cast("string")): _*),
      s"$root/incoming/sales_snapshot", sep = "|")
    snapshot
  }

  // ---- E3: target DW load ----------------------------------------------

  /** File-level outcomes mirroring the reference's consumption rules
    * (FIXTURES §6): Poison files are marked processed and skipped
    * (empty file, missing required columns — load_fact_sales_dw.py:
    * 92-96, 204-210); Retry leaves the file unconsumed (empty target
    * dims, :156-175); Loaded carries the merge stats. */
  sealed trait LoadOutcome
  final case class Loaded(facts: DataFrame,
      stats: Map[String, Long]) extends LoadOutcome
  final case class Poison(reason: String) extends LoadOutcome
  final case class Retry(reason: String) extends LoadOutcome

  /** Outcome-classified load: empty file → Poison; unresolvable schema →
    * Poison; any empty dim → Retry; else run the 9-stage load. */
  def loadIncoming(spark: SparkSession, db: SourceDb, root: String,
      incomingPath: String): LoadOutcome = {
    val raw = CsvIO.readAllString(spark, incomingPath, sep = "|")
    if (raw.isEmpty) return Poison("empty file")
    val res = SchemaMapper.resolve(raw, factLogicalCols)
    if (!res.ok)
      return Poison(s"missing required columns: " +
        res.missingRequired.mkString(", "))
    val dimsEmpty = Seq("stores" -> db.stores, "products" -> db.products,
      "distributors" -> db.distributors, "dates" -> db.dates)
      .collect { case (n, d) if d.isEmpty => n }
    if (dimsEmpty.nonEmpty)
      return Retry(s"empty dims: ${dimsEmpty.mkString(", ")}")
    val (facts, stats) = dwLoad(spark, db, root, incomingPath)
    Loaded(facts, stats)
  }

  /** Alias-tolerant logical schema of the incoming snapshot (FIXTURES
    * §1): shared by resolution checks and the loader. */
  def factLogicalCols: Seq[LogicalCol] = Seq(
    LogicalCol("SALES_ID", aliases = Seq("ID"),
      targetType = Some(LongType)),
    LogicalCol("FULL_DATE", aliases = Seq("SALE_DATE",
      "TRANSACTION_DATE", "DATE"),
      clean = Some(c => Cleansing.parseDateMulti(c).cast("string")),
      targetType = Some(DateType)),
    LogicalCol("STORE_NAME", aliases = Seq("STORE", "STORENAME")),
    LogicalCol("CITY", required = false),
    LogicalCol("PRODUCT_NAME", aliases = Seq("PRODUCT")),
    LogicalCol("BRAND", aliases = Seq("BRAND_NAME"), required = false),
    LogicalCol("DIST_NAME", aliases = Seq("DISTRIBUTOR",
      "DISTRIBUTOR_NAME")),
    LogicalCol("QUANTITY_SOLD", aliases = Seq("QTY", "QUANTITY"),
      clean = Some(Cleansing.cleanNumeric),
      targetType = Some(LongType)),
    LogicalCol("SALES_UNIT_PRICE", aliases = Seq("UNIT_PRICE", "PRICE"),
      clean = Some(Cleansing.cleanNumeric),
      targetType = Some(DecimalType(12, 2))),
    LogicalCol("GROSS_AMOUNT", aliases = Seq("GROSS_SALES",
      "TOTAL_AMOUNT"), clean = Some(Cleansing.cleanNumeric),
      targetType = Some(DecimalType(12, 2))),
    LogicalCol("DISCOUNT_AMOUNT", aliases = Seq("DISCOUNT"),
      clean = Some(Cleansing.cleanNumeric),
      targetType = Some(DecimalType(12, 2))),
    LogicalCol("NET_AMOUNT", aliases = Seq("NET_SALES", "NET"),
      clean = Some(Cleansing.cleanNumeric),
      targetType = Some(DecimalType(12, 2))))

  /** Stages 4-6 of the fact loader, shared by the parquet-path and
    * bucketed-table variants: read incoming CSV → alias-resolve → clean →
    * resolve the 4 dim keys → drop misses → dedupe to the fact grain.
    * Returns (incoming delta at DW schema minus fact_key, miss counters).
    */
  def prepareIncoming(spark: SparkSession, db: SourceDb,
      incomingPath: String): (DataFrame, Map[String, Long]) = {
    val raw = CsvIO.readAllString(spark, incomingPath, sep = "|")
    // stage 4: alias-tolerant schema resolution, all-string → cleaned
    val resolved = SchemaMapper(raw, factLogicalCols)
    // stage 5: dim-key resolution through normalized business keys
    val keyed = DimResolver.resolveDimKeys(resolved, Seq(
      DimLookup(db.stores, Seq("STORE_NAME"), Seq("store_name"),
        "store_id", "STORE_KEY"),
      DimLookup(db.products, Seq("PRODUCT_NAME"), Seq("product_name"),
        "product_id", "PRODUCT_KEY",
        fallback = Some(("PRODUCT_NAME", "product_name", "product_id"))),
      DimLookup(db.distributors, Seq("DIST_NAME"), Seq("dist_name"),
        "dist_id", "DIST_KEY"),
      DimLookup(db.dates.withColumn("fd", col("full_date").cast("string")),
        Seq("FULL_DATE"), Seq("fd"), "date_id", "DATE_ID")))
    val misses = DimResolver.missCounts(keyed,
      Seq("STORE_KEY", "PRODUCT_KEY", "DIST_KEY", "DATE_ID"))
    // stage 6: drop unresolved / unparseable rows (P5/P6)
    val clean = keyed.na.drop(Seq("STORE_KEY", "PRODUCT_KEY", "DIST_KEY",
      "DATE_ID", "QUANTITY_SOLD", "NET_AMOUNT"))
      .withColumn("natural_key", Cleansing.naturalKey(col("DATE_ID"),
        col("STORE_KEY"), col("PRODUCT_KEY"), col("DIST_KEY")))
    val incoming = Dedupe.dedupeByKey(clean, Seq("natural_key"),
      Seq(col("SALES_ID")))
      .select(col("natural_key"), col("DATE_ID").as("date_id"),
        col("STORE_KEY").as("store_key"),
        col("PRODUCT_KEY").as("product_key"),
        col("DIST_KEY").as("dist_key"),
        col("QUANTITY_SOLD").as("quantity_sold"),
        col("SALES_UNIT_PRICE").cast("double").as("unit_price"),
        col("GROSS_AMOUNT").cast("double").as("gross_amount"),
        col("DISCOUNT_AMOUNT").cast("double").as("discount_amount"),
        col("NET_AMOUNT").cast("double").as("net_amount"))
    (incoming, misses)
  }

  /** The 9-stage fact loader (load_fact_sales_dw.py): read incoming →
    * alias-resolve → clean → resolve the 4 dim keys → drop misses →
    * classify INSERT/UPDATE vs the current DW state → assign surrogate
    * keys → merge → overwrite. Returns (newDwFacts, stats). */
  def dwLoad(spark: SparkSession, db: SourceDb, root: String,
      incomingPath: String): (DataFrame, Map[String, Long]) = {
    val (incoming0, misses) = prepareIncoming(spark, db, incomingPath)
    // four downstream actions (stats ×3 + the merge write) would each
    // re-run the CSV read + schema map + dim joins + dedup otherwise
    val incoming = incoming0.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // stage 7: classify vs current DW state
      val dwPath = s"$root/dw/fact_sales"
      val existing = loadOrEmpty(spark, dwPath, incoming.schema
        .add("fact_key", LongType))
      val (merged, inserts, updates) = stageAndMerge(incoming, existing)
      val stats = Map(
        "incoming" -> incoming.count(),
        "inserts" -> inserts.count(), "updates" -> updates.count()) ++
        misses.map { case (k, v) => s"miss_$k" -> v }
      overwriteParquet(spark, merged, dwPath)
      (spark.read.parquet(dwPath), stats)
    } finally incoming.unpersist()
  }

  /** Stages 7-9 minus the write: classify INSERT/UPDATE vs `existing`
    * (which must carry `fact_key`), assign surrogate keys to the INSERT
    * set only (W3's lesson), merge. Returns (merged, inserts, updates). */
  def stageAndMerge(incoming: DataFrame,
      existing: DataFrame): (DataFrame, DataFrame, DataFrame) = {
    val tracked = Seq(TrackedCol("quantity_sold", Some(0.5)),
      TrackedCol("unit_price", Some(0.01)),
      TrackedCol("gross_amount", Some(0.01)),
      TrackedCol("discount_amount", Some(0.01)),
      TrackedCol("net_amount", Some(0.01)))
    // natural_key is concat-built from non-null keys → plain equality,
    // which keeps a bucketed `existing` co-located (no target shuffle)
    val staged0 = ChangeClassifier.classifyChanges(incoming,
      existing.drop("fact_key"), Seq("natural_key"), tracked,
      nullSafeKeys = false)
    // stage 8: surrogate keys for the INSERT set only (W3's lesson)
    val maxKey = SurrogateKeys.currentMax(existing, "fact_key")
    val inserts = SurrogateKeys.assignSequential(
      staged0.filter(col("operation") === "INSERT"), "fact_key", maxKey,
      Seq(col("natural_key")))
    val updates = staged0.filter(col("operation") === "UPDATE")
      .join(existing.select("natural_key", "fact_key"), "natural_key")
    val staged = inserts.unionByName(updates.select(inserts.columns
      .map(col).toIndexedSeq: _*))
    // stage 9: merge (caller owns the atomic write/swap)
    val merged = MergeInto.mergeInto(existing, staged, Seq("natural_key"),
      incoming.columns.filterNot(c => c == "natural_key").toSeq,
      opCol = Some("operation"), nullSafeKeys = false)
    (merged, inserts, updates)
  }

  /** Snowflake lookup-dim maintenance (target_dw's dim_category /
    * dim_sub_category / dim_manufacturer): distinct incoming values
    * anti-joined against the stored dim, new keys from max+1, append,
    * atomic swap. Returns value→newRowCount per dim. */
  def maintainSnowflakeDims(spark: SparkSession, root: String,
      snapshot: DataFrame): Map[String, Long] = {
    val dimSchema = StructType(Seq(
      StructField("key", LongType), StructField("value", StringType)))
    Seq("category", "sub_category", "manufacturer").map { c =>
      val path = s"$root/dw/dim_$c"
      val existing = loadOrEmpty(spark, path, dimSchema)
      val (updated, newRows) = graft.ops.LookupDim.upsert(
        existing, snapshot.select(col(c).as("value")), "value", "key")
      val n = newRows.count()
      overwriteParquet(spark, updated, path)
      c -> n
    }.toMap
  }

  /** Atomic-swap overwrite: write to a staging location, then swap — the
    * re-runnability contract of the reference's staging+MERGE+commit. */
  private def overwriteParquet(spark: SparkSession, df: DataFrame,
      path: String): Unit = {
    val dst = new org.apache.hadoop.fs.Path(path)
    // the path's own filesystem, not fs.defaultFS
    val fs = dst.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(path + "__staging")
    df.write.mode("overwrite").parquet(tmp.toString)
    if (fs.exists(dst)) fs.delete(dst, true)
    fs.rename(tmp, dst)
  }

  private def loadOrEmpty(spark: SparkSession, path: String,
      schema: StructType): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p))
      spark.read.parquet(path)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
  }

  // ---- V10: validation suite -------------------------------------------
  def validationSuite(db: SourceDb, dwFacts: DataFrame,
      execDateId: Int): DataFrame =
    Validator.suite(Seq(
      ("products", db.products, Seq(MinRows(10),
        NoNulls(Seq("product_id", "product_name", "brand", "category")),
        PkUnique(Seq("product_id")))),
      ("stores", db.stores, Seq(MinRows(10),
        NoNulls(Seq("store_id", "store_name")),
        FlagDomain(Seq("is_chain")), PkUnique(Seq("store_id")))),
      ("distributors", db.distributors, Seq(MinRows(5),
        FlagDomain(Seq("active_flag")), PkUnique(Seq("dist_id")))),
      ("dates", db.dates, Seq(MinRows(28),
        FlagDomain(Seq("is_weekend", "is_business_day")),
        PkUnique(Seq("date_id")))),
      ("fact_sales_dw", dwFacts, Seq(MinRows(1),
        NoNulls(Seq("natural_key", "date_id", "store_key", "product_key",
          "dist_key", "net_amount")),
        PkUnique(Seq("natural_key"))))))
}
