package graft

import java.nio.file.Files

import graft.pipelines.SignatureStore
import org.apache.spark.sql.functions._

class SignatureStoreSpec extends SparkSpec {
  import spark.implicits._

  // disjoint-vocabulary docs: cross-doc jaccard is exactly 0
  private def doc(i: Int, n: Int = 30): String =
    (0 until n).map(j => s"w${i}_$j").mkString(" ")

  /** doc i with the second half of its tokens replaced — roughly half
    * the shingles survive. */
  private def mutated(i: Int): String =
    ((0 until 15).map(j => s"w${i}_$j") ++
      (15 until 30).map(j => s"x${i}_$j")).mkString(" ")

  test("planted copy found across batches, unrelated docs are not; " +
      "re-append with the same tag is idempotent") {
    val dir = Files.createTempDirectory("graft_sigstore").toString
    val seed = (1 to 20).map(i => (i.toLong, doc(i))).toDF("id", "text")
    SignatureStore.create(spark, dir, seed, "id", "text")

    val batch = Seq(
      (105L, doc(5)),      // exact copy of stored doc 5
      (107L, mutated(7)),  // half-overlap near-dup of stored doc 7
      (108L, doc(108))     // genuinely new
    ).toDF("id", "text")

    val strict = SignatureStore.nearDups(spark, dir, batch, "id", "text",
      minAgreement = 0.9).collect().map(r => (r.getLong(0), r.getLong(1),
      r.getDouble(2))).toSet
    assert(strict === Set((5L, 105L, 1.0)))

    val loose = SignatureStore.nearDups(spark, dir, batch, "id", "text",
        minAgreement = 0.2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(loose.contains((5L, 105L)) && loose.contains((7L, 107L)))
    assert(!loose.exists(_._2 == 108L), s"false positive in $loose")

    // append the batch twice under one tag: the overwrite keeps the
    // store single-counted, so a fresh probe sees ONE candidate row
    SignatureStore.append(spark, dir, batch, "id", "text", "b1")
    SignatureStore.append(spark, dir, batch, "id", "text", "b1")
    val probe = Seq((205L, doc(5))).toDF("id", "text")
    val got = SignatureStore.nearDups(spark, dir, probe, "id", "text",
        minAgreement = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((5L, 205L), (105L, 205L)))
  }

  test("candidates are pigeonhole-exact above 1 - bands/numHashes: " +
      "store output equals the all-pairs agreement filter") {
    val dir = Files.createTempDirectory("graft_sigstore2").toString
    val r = new scala.util.Random(11)
    // mix of unrelated, mutated, and copied docs for a rich agreement
    // spectrum
    val seed = (1 to 40).map(i => (i.toLong, doc(i))).toDF("id", "text")
    val batch = (1 to 40).map { i =>
      val t = r.nextInt(3) match {
        case 0 => doc(i)        // copy
        case 1 => mutated(i)    // partial overlap
        case _ => doc(100 + i)  // unrelated
      }
      (1000L + i, t)
    }.toDF("id", "text")
    SignatureStore.create(spark, dir, seed, "id", "text")
    val got = SignatureStore.nearDups(spark, dir, batch, "id", "text",
        minAgreement = 0.52)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    // reference: agreement over ALL cross pairs, no banding
    val sig = (df: org.apache.spark.sql.DataFrame) => df.select(col("id"),
      graft.expressions.MinHash.minhashSig(col("text"), 3, 64).as("sig"))
    val want = sig(seed).withColumnRenamed("id", "store_id")
      .withColumnRenamed("sig", "sig_s")
      .crossJoin(sig(batch).withColumnRenamed("id", "batch_id")
        .withColumnRenamed("sig", "sig_b"))
      .withColumn("agreement",
        size(filter(zip_with(col("sig_s"), col("sig_b"),
          (x, y) => x === y), p => p)).cast("double") / 64)
      .filter(col("agreement") >= 0.52)
      .select("store_id", "batch_id", "agreement")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    assert(got === want)
    assert(want.nonEmpty, "test corpus produced no pairs to compare")
  }

  test("a batch doc duplicating a mass-replicated store family raises " +
      "instead of silently missing; opt-in skip completes") {
    val dir = Files.createTempDirectory("graft_sigstore4").toString
    // 10 identical store docs: every band bucket of that family has 10
    // members, over a maxBucket of 5
    val seed = ((1 to 10).map(i => (i.toLong, doc(42))) ++
      (20 to 25).map(i => (i.toLong, doc(i)))).toDF("id", "text")
    SignatureStore.create(spark, dir, seed, "id", "text")
    val batch = Seq((105L, doc(42))).toDF("id", "text")
    val e = intercept[Exception] {
      SignatureStore.nearDups(spark, dir, batch, "id", "text",
        maxBucket = 5).collect()
    }
    assert(e.getMessage.contains("lost EVERY band"))
    assert(e.getMessage.contains("id=105"))
    // opt-in: completes with the documented silent miss
    val skipped = SignatureStore.nearDups(spark, dir, batch, "id", "text",
      maxBucket = 5, skipFullyCapped = true).collect()
    assert(skipped.isEmpty)
    // a batch doc matching an UN-replicated store doc is unaffected by
    // the cap (its buckets are small)
    val ok = SignatureStore.nearDups(spark, dir,
      Seq((205L, doc(22))).toDF("id", "text"), "id", "text",
      maxBucket = 5, minAgreement = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ok === Set((22L, 205L)))
  }

  test("compaction: nearDups is bit-identical before and after; " +
      "orphan compact dirs stay invisible; vacuum reclaims sources") {
    val dir = Files.createTempDirectory("graft_sigstore5").toString
    val seed = (1 to 20).map(i => (i.toLong, doc(i))).toDF("id", "text")
    SignatureStore.create(spark, dir, seed, "id", "text")
    SignatureStore.append(spark, dir,
      Seq((105L, doc(5)), (108L, doc(108))).toDF("id", "text"),
      "id", "text", "b1")
    SignatureStore.append(spark, dir,
      Seq((207L, mutated(7)), (209L, doc(209))).toDF("id", "text"),
      "id", "text", "b2")
    val probe = Seq((905L, doc(5)), (907L, mutated(7)))
      .toDF("id", "text")
    def run(): Seq[(Long, Long, Double)] =
      SignatureStore.nearDups(spark, dir, probe, "id", "text",
          minAgreement = 0.2)
        .collect().map(r => (r.getLong(0), r.getLong(1),
          r.getDouble(2))).toSeq.sorted
    val res0 = run()
    assert(res0.map(p => (p._1, p._2)).toSet
      .intersect(Set((5L, 905L), (105L, 905L), (7L, 907L)))
      .size === 3, s"precondition: cross-batch hits present in $res0")

    // an UNCOMMITTED compact dir (crash between data and manifest) is
    // invisible: plant a full copy of b1 under an orphan compact tag —
    // were it read, b1's ids would double in ssigs and duplicate rows
    new java.io.File(s"$dir/compactions").mkdirs()
    spark.read.parquet(s"$dir/sigs/b=b1")
      .write.parquet(s"$dir/sigs/b=compact-ffffffffffffffff")
    spark.read.option("basePath", s"$dir/bands/b=b1")
      .parquet(s"$dir/bands/b=b1")
      .write.partitionBy("bkt")
      .parquet(s"$dir/bands/b=compact-ffffffffffffffff")
    assert(run() === res0, "orphan compact dir must stay invisible")

    val tag = SignatureStore.compact(spark, dir)
    assert(tag.isDefined && tag.get.startsWith("compact-"))
    assert(run() === res0, "compaction must not change any read")

    def files(sub: String): Int = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(s"$dir/$sub"))
        .count(_.getName.endsWith(".parquet"))
    }
    val before = files("sigs") + files("bands")
    SignatureStore.vacuum(spark, dir, deleteOrphans = true)
    assert(run() === res0, "vacuum must not change any read")
    assert(files("sigs") + files("bands") < before,
      "vacuum must reclaim retired source and orphan files")
    assert(!new java.io.File(s"$dir/sigs/b=b1").exists())
    assert(!new java.io.File(s"$dir/bands/b=b2").exists())
    assert(new java.io.File(s"$dir/sigs/b=seed").exists(),
      "seed is never compacted")
    // everything non-seed is already one compact batch: nothing to do
    assert(SignatureStore.compact(spark, dir) === None)
    // appends keep working after compaction, and a SECOND compaction
    // folds the new batches (different candidate set => different tag)
    SignatureStore.append(spark, dir,
      Seq((305L, doc(5))).toDF("id", "text"), "id", "text", "b3")
    SignatureStore.append(spark, dir,
      Seq((309L, doc(309))).toDF("id", "text"), "id", "text", "b4")
    val got = SignatureStore.nearDups(spark, dir, probe, "id", "text",
        minAgreement = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.contains((305L, 905L)) && got.contains((105L, 905L)))
    val tag2 = SignatureStore.compact(spark, dir, vacuumAfter = true)
    assert(tag2.isDefined && tag2 != tag)
    val got2 = SignatureStore.nearDups(spark, dir, probe, "id", "text",
        minAgreement = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got2 === got)
    // repeated compactions FOLD: the prior committed compact batch is
    // a source of the new one and vacuum reclaims it, so exactly ONE
    // live compact dir remains — file count does not regrow with
    // compaction count
    val liveCompact = new java.io.File(s"$dir/sigs").listFiles()
      .map(_.getName).filter(_.startsWith("b=compact-")).toSeq
    assert(liveCompact === Seq(s"b=${tag2.get}"),
      s"prior compact batches must fold into the new one: $liveCompact")
    // a RETIRED tag can never be re-appended: rows written under it
    // would be permanently invisible (the readVisible filter) — the
    // backfill contract demands a loud failure, not silent data loss
    val e = intercept[IllegalArgumentException] {
      SignatureStore.append(spark, dir,
        Seq((405L, doc(5))).toDF("id", "text"), "id", "text", "b3")
    }
    assert(e.getMessage.contains("retired"))
    // and a fresh tag still works
    SignatureStore.append(spark, dir,
      Seq((405L, doc(5))).toDF("id", "text"), "id", "text", "b3r")
    val got3 = SignatureStore.nearDups(spark, dir, probe, "id", "text",
        minAgreement = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got3.contains((405L, 905L)))
  }

  test("streaming ingest drains files exactly-once; store answers " +
      "match an all-at-once append over everything ingested") {
    val root = Files.createTempDirectory("graft_sigstream").toString
    val dir = s"$root/store"
    val in = s"$root/in"
    val seed = (1 to 20).map(i => (i.toLong, doc(i))).toDF("id", "text")
    SignatureStore.create(spark, dir, seed, "id", "text")
    // two pending files, drained one per micro-batch: a planted copy
    // of doc 5 and an unrelated doc per file
    Seq((105L, doc(5)), (108L, doc(108))).toDF("id", "text")
      .coalesce(1).write.parquet(s"$in/f1")
    Seq((207L, mutated(7)), (209L, doc(209))).toDF("id", "text")
      .coalesce(1).write.parquet(s"$in/f2")
    val schema = seed.schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$in/*")
    SignatureStore.ingestStream(spark, dir, stream, "id", "text",
      s"$root/ckpt")
    // stream-tagged batch dirs landed, one per micro-batch
    val tags = new java.io.File(s"$dir/sigs").listFiles()
      .map(_.getName).filter(_.startsWith("b=stream-")).toSeq.sorted
    assert(tags.size === 2, s"expected 2 stream batches, got $tags")
    // and the store's answers equal a plain-append twin over the same
    // rows (the streamed path adds no rows and loses none)
    val twin = Files.createTempDirectory("graft_sigtwin").toString
    SignatureStore.create(spark, twin, seed, "id", "text")
    SignatureStore.append(spark, twin,
      Seq((105L, doc(5)), (108L, doc(108)), (207L, mutated(7)),
        (209L, doc(209))).toDF("id", "text"), "id", "text", "all")
    val probe = Seq((905L, doc(5)), (907L, mutated(7)))
      .toDF("id", "text")
    def run(d: String): Set[(Long, Long)] =
      SignatureStore.nearDups(spark, d, probe, "id", "text",
          minAgreement = 0.2)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(run(dir) === run(twin))
    // a RE-RUN of the drained stream (same checkpoint) is a no-op:
    // no new batch dirs, identical answers — exactly-once
    val stream2 = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$in/*")
    SignatureStore.ingestStream(spark, dir, stream2, "id", "text",
      s"$root/ckpt")
    val tags2 = new java.io.File(s"$dir/sigs").listFiles()
      .map(_.getName).filter(_.startsWith("b=stream-")).toSeq.sorted
    assert(tags2 === tags)
    assert(run(dir) === run(twin))
  }

  test("band scan is partition-pruned to the batch's buckets") {
    val dir = Files.createTempDirectory("graft_sigstore3").toString
    val seed = (1 to 20).map(i => (i.toLong, doc(i))).toDF("id", "text")
    SignatureStore.create(spark, dir, seed, "id", "text")
    val probe = Seq((105L, doc(5))).toDF("id", "text")
    val out = SignatureStore.nearDups(spark, dir, probe, "id", "text")
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    // the filter list now leads with the compaction-visibility
    // predicates on `b`; the bucket INSET must still be in it
    assert("PartitionFilters: \\[[^\\]]*bkt#\\d+ INSET".r
      .findFirstIn(plan).isDefined, plan)
  }
}
