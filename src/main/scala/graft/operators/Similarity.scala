package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Approximate-nearest-neighbor search over an embedding column
  * (Array[Float]). Three tiers:
  *  - bruteForceTopK: exact, query-set broadcast — the correctness
  *    baseline and the right choice when |queries| is small;
  *  - hyperplane-LSH bucketing: sub-linear candidate generation for
  *    near-dup thresholds;
  *  - IVF (k-means coarse quantizer, nprobe cells): the 100 TB shape —
  *    centroids broadcast, data shuffled ONCE at index build, each query
  *    touches nprobe/nCells of the data.
  * All vector math is zip_with/aggregate expressions in double — no UDFs.
  */
object Similarity {

  /** Infer the embedding dimension from the first non-null vector.
    * Fails fast with a clear message on empty or all-null input instead
    * of the NoSuchElementException/NPE a bare `.first()` produced, and
    * skips null rows so a leading null can't poison the probe. Costs one
    * tiny job — pass `dim` explicitly on hot paths to avoid it. */
  private[operators] def inferDim(df: DataFrame, vecCol: String): Int = {
    val head = df.filter(col(vecCol).isNotNull)
      .select(size(col(vecCol))).limit(1).collect()
    require(head.nonEmpty, s"cannot infer embedding dim: no non-null " +
      s"'$vecCol' values — pass dim explicitly")
    head(0).getInt(0)
  }

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Unrounded: sequential double accumulation is bit-identical across
    * engines (verified vs DuckDB), while rounding would reintroduce
    * HALF_UP-vs-binary divergence. Native single-pass expression — the
    * zip_with/aggregate formulation pays 3 interpreted lambda walks per
    * pair (kept as cosineComposed for the equivalence spec). */
  def cosine(a: Column, b: Column): Column =
    graft.expressions.Cosine.cosineSim(a, b)

  private[graft] def cosineComposed(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Deterministic hyperplanes: `planes` × `dim` weights in [-1,1] from a
    * seeded JVM RNG (stable across runs/executors; broadcast as a
    * literal). */
  def hyperplanes(dim: Int, planes: Int, seed: Long): Seq[Seq[Double]] = {
    val rnd = new java.util.Random(seed)
    Seq.fill(planes)(Seq.fill(dim)(rnd.nextDouble() * 2 - 1))
  }

  /** Sign-pattern bucket id (0 .. 2^planes-1) of a vector against the
    * seeded hyperplanes. Cosine-similar vectors collide with high
    * probability; each added plane halves the expected bucket size.
    * Native single-pass projection (HyperplaneBuckets, probes=0). */
  def hyperplaneBucket(vec: Column, dim: Int, planes: Int,
      seed: Long): Column =
    element_at(graft.expressions.HyperplaneBucketsExpr
      .multiProbeBuckets(vec, hyperplanes(dim, planes, seed), 0), 1)

  /** Multi-probe buckets: the exact bucket plus `probes` neighbors with
    * the LOWEST-MARGIN sign flipped first — a near-dup pair whose
    * projection sits close to one hyperplane lands one bit apart, and
    * single-bucket LSH misses it. Probing the most-uncertain bits
    * recovers those pairs at the cost of (probes+1)× bucket rows.
    * Returns an array of bucket ids; explode and join on the element.
    * Native: every plane's projection accumulates in ONE pass over the
    * vector (the composed per-plane zip_with/aggregate walks it `planes`
    * times, interpreted — kept below for the equivalence spec). */
  def multiProbeBuckets(vec: Column, dim: Int, planes: Int, seed: Long,
      probes: Int): Column =
    graft.expressions.HyperplaneBucketsExpr.multiProbeBuckets(
      vec, hyperplanes(dim, planes, seed), probes)

  private[graft] def multiProbeBucketsComposed(vec: Column, dim: Int,
      planes: Int, seed: Long, probes: Int): Column = {
    val ws = hyperplanes(dim, planes, seed)
    val dots = ws.map(w => dot(vec, typedLit(w)))
    val base = dots.zipWithIndex.map { case (dp, p) =>
      when(dp >= 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }.reduce(_ + _)
    // rank planes by |margin| ascending: flip the most uncertain ones
    val ranked = array_sort(array(dots.zipWithIndex.map { case (dp, p) =>
      struct(abs(dp).as("m"), lit(p).as("p"))
    }: _*))
    // shiftleft needs a literal count; resolve the dynamic plane index
    // through a when-ladder (planes is small)
    def maskFor(pcol: Column): Column =
      (0 until planes).foldLeft(lit(0L)) { (acc, p) =>
        when(pcol === p, lit(1L << p)).otherwise(acc)
      }
    val flips = (0 until math.min(probes, planes)).map { i =>
      base.bitwiseXOR(maskFor(element_at(ranked, i + 1).getField("p")))
    }
    array((base +: flips): _*)
  }

  /** Rank scored candidates to (qid, rank, id, cosine) via the bounded
    * topk_by aggregate: map-side partial top-k means at most k rows per
    * (partition, query) reach the shuffle — the row_number()-window
    * formulation this replaces gathered EVERY scored row per query.
    * (ord DESC, id ASC) is a total order, so output is identical to the
    * window version (rank 1..k by cosine desc, ties to the lower id). */
  private[graft] def rankTopK(scored: DataFrame, qidCol: String,
      idCol: String, k: Int): DataFrame =
    scored.groupBy(col(qidCol))
      .agg(graft.expressions.TopKByExpr.topkBy(
        col("cosine").cast("double"), col(idCol).cast("long"), k)
        .as("__tk"))
      .select(col(qidCol), posexplode(col("__tk")))
      .select(col(qidCol), (col("pos") + 1).cast("int").as("rank"),
        col("col.id").as(idCol), col("col.ord").as("cosine"))

  /** Scalar int8 quantization of an embedding (max-abs symmetric —
    * the standard storage/bandwidth lever: a 64-dim float64 vector is
    * 512 bytes; its int8 code + one double scale is 72 — ~7×, and at
    * 100 TB of embeddings the ANN scan becomes bandwidth-bound long
    * before it is compute-bound). Returns
    * struct<q: array<tinyint>, scale: double>; dequantize with
    * [[int8Dequantize]] and score with the ordinary exact [[cosine]]
    * (asymmetric search: queries stay full-precision). Pure, engine-
    * replayable arithmetic: scale = max|x|/127 (zero vectors → scale
    * 1, all-zero codes), q = round(x/scale) half-away — so a DuckDB
    * oracle recomputes codes AND the dequantized cosines bit-for-bit.
    * Quantization error ≤ scale/2 per element bounds the cosine
    * perturbation (spec-pinned recall on planted structure). */
  def int8Quantize(vec: Column): Column =
    graft.operators.TextAnalysis.bindOnce(vec) { v =>
      val maxabs = array_max(transform(v, x => abs(x)))
      val scale = when(maxabs === 0.0, lit(1.0))
        .otherwise(maxabs / lit(127.0))
      // scale binds once too: it reads the whole vector, and the code
      // transform references it per element
      graft.operators.TextAnalysis.bindOnce(scale) { sc =>
        struct(
          transform(v, x => round(x / sc).cast("tinyint")).as("q"),
          sc.as("scale"))
      }
    }

  /** Reconstruct the approximate vector from an [[int8Quantize]]
    * struct: x̂ = q·scale, as array<double>. */
  def int8Dequantize(qs: Column): Column =
    transform(qs.getField("q"),
      q => q.cast("double") * qs.getField("scale"))

  /** The deterministic ±1 sign for random-projection cell (j, i):
    * parity of the first hex nibble of md5("<seed>:j:i") — the same
    * engine-portable md5 recipe the cm1/ann6 oracles replay, so the
    * whole projected space is recomputable in SQL. */
  private[graft] def rpSign(seed: String, j: Int, i: Int): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"$seed:$j:$i".getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    if ("02468ace".indexOf(hex.charAt(0)) >= 0) 1.0 else -1.0
  }

  /** Deterministic sign random projection (Achlioptas 2001/2003,
    * public technique: JL-embedding with ±1 entries — no Gaussian
    * sampling needed): y_j = (1/√outDim) · Σ_i s(j,i)·x_i with the
    * signs from [[rpSign]]. The standard dimensionality lever in front
    * of ANN/dedup: 64→16 dims cuts every downstream scan, dot product,
    * and index cell 4× while preserving pairwise geometry within
    * O(1/√outDim) (JL lemma) — and preserving DIRECTION exactly for
    * scaled copies (a linear map commutes with scaling, so the
    * rescaled-dup shape embedding dedup hunts survives at cosine 1.0;
    * spec-pinned).
    *
    * Scale shape: a map-only per-row expression over sign LITERALS
    * folded into the plan (outDim·inDim doubles — bytes, not a model
    * table); no shuffle, no training state, appends/streams project
    * identically forever. Each y_j accumulates left-to-right
    * (aggregate fold), so the arithmetic is the exact IEEE sequence a
    * DuckDB oracle replays (rp1 gate hash-matches projection, norms,
    * and ranking end to end). */
  def randomProject(vec: Column, inDim: Int, outDim: Int,
      seed: String): Column = {
    require(inDim >= 1 && outDim >= 1,
      s"randomProject: bad dims ($inDim -> $outDim)")
    val inv = 1.0 / math.sqrt(outDim.toDouble)
    graft.operators.TextAnalysis.bindOnce(vec) { v =>
      // malformed-vector guard: a short/long vector or a NULL ELEMENT
      // inside a correct-length vector would otherwise LEAK as
      // per-component nulls deep into downstream cosines. A whole-row
      // null is the countable malformed-data signal instead (the
      // codecs' None posture).
      // NOTE (r15): static expansion of these folds (outDim × inDim
      // element_at terms) was tried and measured ~4-5× SLOWER — same
      // codegen-budget fallback as the pqCodes attempt; the HOF
      // aggregate's tight ArrayData loop wins at this term count.
      when(size(v) === inDim && !exists(v, x => x.isNull),
        array((0 until outDim).map { j =>
          val signs = array((0 until inDim)
            .map(i => lit(rpSign(seed, j, i))): _*)
          aggregate(zip_with(v, signs, (a, b) => a * b), lit(0.0),
            (acc, x) => acc + x) * lit(inv)
        }: _*))
        .otherwise(lit(null).cast("array<double>"))
    }
  }

  /** Exact top-k neighbors for each query (queries: (qid, qvec), small →
    * broadcast; only k rows per partition per query ever shuffle). */
  /** Deterministic text embeddings via signed feature hashing
    * (Weinberger et al. 2009, "Feature Hashing for Large Scale
    * Multitask Learning" — the hashing-trick construction every
    * large-scale linear text system uses): each lowercased whitespace
    * token lands in an md5-drawn bucket with an md5-drawn ±1 sign,
    * bucket sums form the raw vector, and the output is its L2
    * normalization (zero vectors — empty/null text — stay zero).
    * Closes the "where do vectors come from" gap engine-side: every
    * ANN / VectorStore / SemDeDup / semantic-decontamination operator
    * can now run from raw text alone, with no external embedding
    * model, and the result is rerun-, engine-, and
    * partitioning-stable (pure md5 arithmetic — DuckDB-replayable to
    * the bit, like every hash draw in this codebase).
    *
    * Cosine on hash embeddings approximates token-multiset cosine
    * similarity (collisions add O(1/√dim) noise — the JL-style
    * guarantee of the paper); it is a CHEAP similarity signal for
    * tests, bootstraps, and lexical-ish retrieval, not a replacement
    * for learned semantic embeddings.
    *
    * Scale shape: MAP-ONLY — the fused [[graft.expressions.
    * HashEmbedExpr]] builds each row's vector in one compiled pass
    * (tokenize, two md5 draws per token, long-cell sums, one
    * normalize), so embedding runs at scan speed with zero shuffle.
    * The composed Column formulation below ([[hashEmbedComposed]]:
    * explode → two narrow shuffles → map rebuild) is the executable
    * spec the fused path is pinned against bit-for-bit — measured at
    * 5M docs it spent 408 s / 32 GB spill shuffling what the fused
    * pass computes in place (the GopherStats lesson). */
  def hashEmbed(docs: DataFrame, idCol: String, textCol: String,
      dim: Int, seed: String = "he"): DataFrame = {
    require(dim >= 1, s"hashEmbed: dim must be >= 1, got $dim")
    docs.select(col(idCol),
      graft.expressions.HashEmbed.hashEmbedVec(
        coalesce(col(textCol), lit("")), dim, seed).as("embedding"))
  }

  /** The composed-Column reference formulation of [[hashEmbed]] — two
    * narrow integer shuffles; kept as the executable spec of the fused
    * expression (bit-identity pinned in HashEmbedSpec). */
  private[graft] def hashEmbedComposed(docs: DataFrame, idCol: String,
      textCol: String, dim: Int, seed: String = "he"): DataFrame = {
    require(dim >= 1, s"hashEmbed: dim must be >= 1, got $dim")
    def draw(prefix: String): Column = conv(substring(md5(
      concat(lit(s"$prefix|$seed|"), col("w"))), 1, 8), 16, 10)
      .cast("long")
    val toks = docs.select(col(idCol), explode(filter(
      TextAnalysis.tokens(coalesce(col(textCol), lit(""))),
      w => w =!= "")).as("w"))
    val feats = toks.select(col(idCol),
      pmod(draw("heb"), lit(dim.toLong)).cast("int").as("b"),
      when(draw("hes") % 2 === 0, 1L).otherwise(-1L).as("s"))
    val cells = feats.groupBy(col(idCol), col("b"))
      .agg(sum(col("s")).as("c"))
    val raws = cells.groupBy(col(idCol))
      .agg(map_from_entries(collect_list(struct(col("b"), col("c"))))
        .as("m"))
      .select(col(idCol), transform(sequence(lit(0), lit(dim - 1)),
        b => coalesce(element_at(col("m"), b), lit(0L)).cast("double"))
        .as("raw"))
    val nrm = sqrt(aggregate(col("raw"), lit(0.0),
      (acc, x) => acc + x * x))
    docs.select(col(idCol)).join(raws, Seq(idCol), "left")
      .select(col(idCol),
        when(col("raw").isNull,
          array_repeat(lit(0.0), lit(dim)))
          .otherwise(when(nrm > lit(0.0),
            transform(col("raw"), x => x / nrm))
            .otherwise(col("raw")))
          .as("embedding"))
  }

  def bruteForceTopK(data: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qidCol: String, qvecCol: String,
      k: Int): DataFrame = {
    val scored = data.crossJoin(broadcast(queries))
      .withColumn("cosine", cosine(col(vecCol), col(qvecCol)))
    rankTopK(scored, qidCol, idCol, k)
  }

  /** kNN majority-vote classification: label each query vector by the
    * most common label among its k nearest (cosine) neighbors, the
    * query row itself excluded. The standard label-propagation /
    * quality-tag-transfer move in embedding-space curation (tag a few
    * seed documents, classify the rest by neighborhood).
    *
    * Contract notes:
    *  - `labelCol` must be INTEGRAL (checked up front): the vote argmax
    *    rides topk_by over label-as-long, where a non-castable label
    *    would silently null out and drop the query from the output, and
    *    a fractional label would truncate — merging distinct labels'
    *    votes. `pred_label` is emitted as long so no integral label
    *    value truncates.
    *  - Self-exclusion assumes queries SHARE the data id space
    *    (`data.idCol =!= query.qid`), the label-propagation case where
    *    queries are drawn from the corpus itself. For external queries
    *    pass qids disjoint from data ids (e.g. negative), or any data row
    *    whose id collides with a qid is silently excluded as a neighbor.
    *
    * Scale shape rides the existing exact-top-k path: queries broadcast,
    * scoring is a map-side pass over the data, and the bounded topk_by
    * aggregate means only k rows per (partition, query) shuffle — never
    * a full gather. The elected neighbor set (|queries| * k rows) is
    * then broadcast back against the data to fetch labels (one scan, no
    * data-side shuffle), and the vote itself reuses topk_by with
    * ord = votes, id = label, k = 1 — argmax with the (votes DESC,
    * label ASC) tie-break, partitioning-independent.
    */
  def knnClassify(data: DataFrame, idCol: String, vecCol: String,
      labelCol: String, queries: DataFrame, qidCol: String,
      qvecCol: String, k: Int): DataFrame = {
    require(data.schema(labelCol).dataType match {
        case org.apache.spark.sql.types.ByteType |
             org.apache.spark.sql.types.ShortType |
             org.apache.spark.sql.types.IntegerType |
             org.apache.spark.sql.types.LongType => true
        // scale-0 decimals are integral-valued (a common bigint-backed
        // encoding from JDBC/parquet) — cast to long cannot truncate
        case d: org.apache.spark.sql.types.DecimalType if d.scale == 0 &&
          d.precision <= 18 => true
        case _ => false
      },
      s"knnClassify requires an INTEGRAL label column; '$labelCol' is " +
      s"${data.schema(labelCol).dataType.simpleString} — map labels to " +
      "integer codes first (non-numeric labels would vanish from the " +
      "vote silently; fractional ones would truncate and merge)")
    val scored = data.crossJoin(broadcast(queries))
      .where(col(idCol) =!= col(qidCol))
      .withColumn("cosine", cosine(col(vecCol), col(qvecCol)))
    val nn = rankTopK(scored, qidCol, idCol, k)
      .select(col(qidCol), col(idCol))
    val votes = data.select(col(idCol), col(labelCol))
      .join(broadcast(nn), idCol)
      .groupBy(col(qidCol), col(labelCol))
      .agg(count(lit(1)).as("votes"))
    votes.groupBy(col(qidCol))
      .agg(graft.expressions.TopKByExpr.topkBy(
        col("votes").cast("double"), col(labelCol).cast("long"), 1)
        .as("__win"))
      .select(col(qidCol),
        element_at(col("__win"), 1).getField("id")
          .as("pred_label"),
        element_at(col("__win"), 1).getField("ord").cast("long")
          .as("votes"))
  }

  /** LSH-bucketed top-k — the other sub-linear ANN path. The DATA side is
    * bucketed exactly once (one bucket per row, no multiplication); the
    * QUERY side is multi-probed (queries are few, so (probes+1)× query
    * rows is cheap) and broadcast. Each query then scores only the rows
    * whose bucket collides with one of its probes. A (row, query) pair
    * can collide in more than one probe bucket, so candidates are
    * deduped before ranking. Recall rises with `probes`, falls with
    * `planes`; the 100 TB tuning is planes ≈ log2(rows/targetBucket). */
  def lshTopK(data: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qidCol: String, qvecCol: String,
      k: Int, planes: Int = 8, probes: Int = 3, seed: Long = 42L,
      dim: Int = -1): DataFrame = {
    val d = if (dim > 0) dim else inferDim(data, vecCol)
    val bucketed = data.withColumn("bucket",
      hyperplaneBucket(col(vecCol), d, planes, seed))
    val qb = queries.select(col(qidCol), col(qvecCol),
      explode(multiProbeBuckets(col(qvecCol), d, planes, seed, probes))
        .as("bucket"))
    val scored = bucketed.join(broadcast(qb), Seq("bucket"))
      .dropDuplicates(qidCol, idCol)
      .withColumn("cosine", cosine(col(vecCol), col(qvecCol)))
    rankTopK(scored, qidCol, idCol, k)
  }

  // ---- IVF (inverted-file) index ----------------------------------------

  final case class IvfIndex(assigned: DataFrame, centroids: DataFrame)

  /** Build an IVF index: k-means trained on a BOUNDED deterministic
    * sample (the `sampleCap` lowest-id vectors, like [[pqTrain]])
    * entirely on the driver, then ONE full-data assignment pass.
    *
    * The r6 shape ran every k-means iteration as a full-data
    * assignCells scan plus a two-stage (cell, pos) mean shuffle —
    * iters full scans of a 100 TB corpus to position centroids whose
    * quality only ever needed a sample. Sample-training is the
    * FAISS-standard practice: the distributed work is exactly one
    * scan (the final assignment), and centroid quality differs only
    * within sampling error, never query semantics. The driver loop is
    * O(sampleCap · nCells · dim) flops per iteration — milliseconds
    * at the 10k default — and deterministic (lowest-id sample, ties
    * toward the lowest cell, mirroring [[assignCells]]).
    *
    * Returns the data with a `cell` column and the centroid table
    * (tiny, broadcastable). */
  def ivfBuild(data: DataFrame, idCol: String, vecCol: String,
      nCells: Int, iters: Int = 3, sampleCap: Int = 10000): IvfIndex = {
    val spark = data.sparkSession
    import spark.implicits._
    val raw: Array[Array[Double]] = data.orderBy(col(idCol))
      .filter(col(vecCol).isNotNull)
      .limit(math.max(nCells, sampleCap))
      .select(col(vecCol).cast("array<double>"))
      .collect().map(_.getSeq[Double](0).toArray)
    require(raw.nonEmpty,
      s"ivfBuild: no non-null '$vecCol' vectors to seed centroids")
    val dim = raw(0).length
    // a truncated/ragged vector would index past its end in the tight
    // training loops below — drop it from the TRAINING sample only
    // (assignment still sees every row; Cosine handles length skew)
    val sample = raw.filter(_.length == dim)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var t = 0
      while (t < dim) {
        d += a(t) * b(t); na += a(t) * a(t); nb += b(t) * b(t); t += 1
      }
      val denom = math.sqrt(na) * math.sqrt(nb)
      if (denom == 0.0) 0.0 else d / denom
    }
    var cents: Array[Array[Double]] =
      sample.take(nCells).map(_.clone())
    for (_ <- 0 until iters) {
      val sums = Array.fill(cents.length)(new Array[Double](dim))
      val counts = new Array[Long](cents.length)
      sample.foreach { p =>
        var best = 0; var bestS = Double.NegativeInfinity
        var c = 0
        while (c < cents.length) {
          val s = cos(p, cents(c))
          if (s > bestS) { bestS = s; best = c } // ties → lowest cell
          c += 1
        }
        var t = 0
        while (t < dim) { sums(best)(t) += p(t); t += 1 }
        counts(best) += 1
      }
      cents = Array.tabulate(cents.length) { c =>
        if (counts(c) == 0) cents(c) else sums(c).map(_ / counts(c))
      }
    }
    val centroids = cents.zipWithIndex
      .map { case (c, i) => (i.toLong, c.toSeq) }.toSeq
      .toDF("cell", "centroid")
    IvfIndex(assignCells(data, idCol, vecCol, centroids), centroids)
  }

  /** Assign each vector to its max-cosine centroid — MAP-SIDE argmax:
    * the (tiny) centroid table is collected into the fused
    * [[graft.expressions.ArgmaxCell]] expression's matrix and the
    * argmax runs as one per-row loop. Zero shuffle, zero
    * row-multiplication; the crossJoin+window alternative multiplied the
    * data ×nCells and shuffled it for the per-id window, and the earlier
    * greatest(struct(cosine…)) literal tree broke janino past ~100
    * cells, silently de-codegen-ing the whole stage. Ties break toward
    * the lowest cell id; degenerate vectors (null, zero-norm, dimension
    * matching no centroid) get a null cell. */
  def assignCells(data: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame): DataFrame = {
    val cents: Seq[(Long, Seq[Double])] = centroids
      .select(col("cell").cast("long"), col("centroid"))
      .collect().toSeq
      .map(r => (r.getLong(0), r.getSeq[Double](1)))
      .sortBy(_._1)
    data.withColumn("cell", graft.expressions.ArgmaxCell(
      col(vecCol), cents.map(_._1), cents.map(_._2)))
  }

  /** Multi-probe cell assignment: each vector's top-`nprobe` cells by
    * (cosine DESC, cell ASC), exploded to one MEMBERSHIP row per
    * (vector, cell) with `crank` 1..nprobe (1 = the [[assignCells]]
    * primary — bit-identical, spec-pinned). Same map-side shape as the
    * argmax (the fused [[graft.expressions.TopCells]] matrix loop
    * computes every cosine either way — no extra flops, no shuffle);
    * the ×nprobe row multiplication happens AFTER assignment, so only
    * (id, cell, crank) rows fan out, never re-scored vectors.
    * Degenerate vectors (null / zero-norm / wrong dimension) keep ONE
    * row with a null cell at crank 1 — the same row universe
    * [[assignCells]] produces, so a caller's keep-list join never
    * silently drops those docs when nprobe changes (they join no
    * real cell, so they can't pair with anything — present and
    * un-deduped, exactly the nprobe = 1 contract). */
  def assignCellsMulti(data: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, nprobe: Int): DataFrame = {
    require(nprobe >= 1,
      s"assignCellsMulti: nprobe must be >= 1, got $nprobe")
    val cents: Seq[(Long, Seq[Double])] = centroids
      .select(col("cell").cast("long"), col("centroid"))
      .collect().toSeq
      .map(r => (r.getLong(0), r.getSeq[Double](1)))
      .sortBy(_._1)
    // posexplode_OUTER: a null membership array (degenerate vector)
    // still emits its row, with null pos/cell; crank coalesces to 1 so
    // downstream crank===1 primary-row filters retain it
    data.withColumn("__cells", graft.expressions.TopCells(
        col(vecCol), cents.map(_._1), cents.map(_._2), nprobe))
      .select(col("*"),
        posexplode_outer(col("__cells")).as(Seq("__p", "cell")))
      .withColumn("crank",
        coalesce(col("__p") + 1, lit(1)).cast("int"))
      .drop("__cells", "__p")
  }

  /** IVF query: rank cells per query by centroid cosine, search the top
    * `nprobe` cells only. */
  def ivfTopK(index: IvfIndex, idCol: String, vecCol: String,
      queries: DataFrame, qidCol: String, qvecCol: String,
      k: Int, nprobe: Int): DataFrame = {
    val cellRank = queries.crossJoin(broadcast(index.centroids))
      .withColumn("crank", row_number().over(
        Window.partitionBy(col(qidCol))
          .orderBy(cosine(col(qvecCol), col("centroid")).desc, col("cell"))))
      .filter(col("crank") <= nprobe)
      .select(col(qidCol), col(qvecCol), col("cell"))
    val scored = cellRank.join(index.assigned, "cell")
      .withColumn("cosine", cosine(col(vecCol), col(qvecCol)))
    rankTopK(scored, qidCol, idCol, k)
  }

  // ---- PQ (product quantization) -----------------------------------------

  /** PQ codebooks: `m` subspaces × `ksub` centroids × dim/m floats.
    * Vectors compress to m small codes (m bytes at ksub ≤ 256) — the
    * memory/bandwidth answer for 100 TB ANN: a 64-dim double vector is
    * 512 bytes; its code is 8. Scans read 64× fewer bytes and the
    * whole index stays cache-resident per executor. */
  final case class PqModel(m: Int, ksub: Int, dsub: Int,
      codebooks: Array[Array[Array[Double]]]) {
    def flat: Seq[Double] =
      codebooks.flatMap(_.flatMap(_.toSeq)).toSeq
  }

  /** Train PQ codebooks: per-subspace Lloyd's k-means on a BOUNDED
    * sample (lowest-`idCol` rows — deterministic across runs and
    * partitionings; quantizers are always trained on samples, so the
    * driver-side collect is O(sampleCap·dim), never O(data)). Empty
    * clusters keep their previous centroid; init is the first ksub
    * sample subvectors. */
  def pqTrain(data: DataFrame, idCol: String, vecCol: String,
      m: Int, ksub: Int, iters: Int = 8,
      sampleCap: Int = 10000): PqModel = {
    val sample: Array[Array[Double]] = data.orderBy(col(idCol))
      .filter(col(vecCol).isNotNull)
      .limit(sampleCap)
      .select(col(vecCol).cast("array<double>"))
      .collect().map(_.getSeq[Double](0).toArray)
    require(sample.nonEmpty, s"pqTrain: no non-null '$vecCol' vectors")
    val dim = sample(0).length
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val dsub = dim / m
    val codebooks = Array.tabulate(m) { j =>
      val pts = sample.map(_.slice(j * dsub, (j + 1) * dsub))
      var cents = Array.tabulate(math.min(ksub, pts.length))(pts(_))
        .padTo(ksub, pts(0)).map(_.clone())
      for (_ <- 0 until iters) {
        val sums = Array.fill(ksub)(new Array[Double](dsub))
        val counts = new Array[Long](ksub)
        pts.foreach { p =>
          var best = 0; var bestD = Double.MaxValue
          var c = 0
          while (c < ksub) {
            var d = 0.0; var t = 0
            while (t < dsub) {
              val diff = p(t) - cents(c)(t); d += diff * diff; t += 1
            }
            if (d < bestD) { bestD = d; best = c }
            c += 1
          }
          var t = 0
          while (t < dsub) { sums(best)(t) += p(t); t += 1 }
          counts(best) += 1
        }
        cents = Array.tabulate(ksub) { c =>
          if (counts(c) == 0) cents(c)
          else sums(c).map(_ / counts(c))
        }
      }
      cents
    }
    PqModel(m, ksub, dsub, codebooks)
  }

  /** Per-row PQ codes as a pure array expression (argmin-L2 per
    * subspace against the broadcast codebook literal): one codegen'd
    * scan over the data, no shuffle, no UDF.
    *
    * Contract: `vec` must be non-null (a null vector yields code -1 in
    * every subspace — the argmin comparison is null so the init value
    * survives). [[pqTopK]] and [[pqTrain]] filter nulls before calling. */
  def pqCodes(vec: Column, mdl: PqModel): Column =
    // r16: the fused native expression r15's notes called for — one
    // tight JVM loop per row over the codebook matrix. The r15 record
    // stands: a STATIC expansion (m × ksub codegen'd distance sums +
    // array_min/array_position) measured 3-9× SLOWER (codegen
    // method-budget fallback on a duplicated tree), and the HOF tower
    // below ([[pqCodesComposed]], kept as the executable spec) walks
    // an interpreted expression tree per (subspace × centroid × dim)
    // term. Bit-identity native ≡ composed is pinned in PqCodesSpec.
    graft.expressions.PqCodesExpr(vec, mdl.m, mdl.ksub, mdl.dsub,
      mdl.flat)

  /** The composed-HOF reference formulation of [[pqCodes]] — kept as
    * the executable spec the fused expression is pinned against
    * bit-for-bit (PqCodesSpec), the HashEmbed/Cosine pattern. */
  private[graft] def pqCodesComposed(vec: Column, mdl: PqModel): Column = {
    val cb = typedLit(mdl.flat)
    transform(sequence(lit(0), lit(mdl.m - 1)), j =>
      aggregate(sequence(lit(0), lit(mdl.ksub - 1)),
        struct(lit(Double.MaxValue).as("d"), lit(-1).as("c")),
        (acc, c) => {
          val dist = aggregate(sequence(lit(0), lit(mdl.dsub - 1)),
            lit(0.0), (s, t) => {
              val diff =
                element_at(vec, (j * mdl.dsub + t + 1).cast("int")) -
                element_at(cb,
                  ((j * mdl.ksub + c) * mdl.dsub + t + 1).cast("int"))
              s + diff * diff
            })
          when(dist < acc.getField("d"),
            struct(dist.as("d"), c.as("c"))).otherwise(acc)
        },
        acc => acc.getField("c")))
  }

  /** PQ top-k with exact re-rank — the production two-stage shape:
    * stage 1 scores EVERY code against the query's lookup table
    * (lut[j·ksub + code_j] = ⟨q_subj, centroid⟩; an m-add scan over
    * m-byte codes instead of a dim-multiply scan over full vectors)
    * and keeps `candidates` per query via the bounded topk_by
    * aggregate; stage 2 joins the candidates back to their FULL
    * vectors and re-ranks the pool by exact cosine, so the output is
    * the exact top-k whenever the true top-k survives stage 1
    * (candidates ≈ 10k is the standard safety factor). Queries are
    * few: their LUTs are computed driver-side and broadcast. */
  def pqTopK(data: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qidCol: String, qvecCol: String,
      k: Int, mdl: PqModel, candidates: Int): DataFrame = {
    require(candidates >= k)
    val spark = data.sparkSession
    import spark.implicits._
    // Null vectors must not enter the coded scan: pqCodes would emit
    // code -1 for them (the `when(dist < acc.d)` condition is null, so
    // the -1 init survives) and stage 1 would then read lut[j·ksub − 1]
    // — an arbitrary score that can crowd real candidates out of the
    // pool. pqTrain already filters nulls; mirror that here.
    val coded = data.filter(col(vecCol).isNotNull)
      .select(col(idCol),
        pqCodes(col(vecCol).cast("array<double>"), mdl).as("pq_codes"))
    val qRows: Seq[(Long, Seq[Double])] = queries
      .select(col(qidCol).cast("long"),
        col(qvecCol).cast("array<double>"))
      .collect().toSeq.map(r => (r.getLong(0), r.getSeq[Double](1)))
    val luts = qRows.map { case (qid, qv) =>
      val lut = for {
        j <- 0 until mdl.m; c <- 0 until mdl.ksub
      } yield (0 until mdl.dsub)
        .map(t => qv(j * mdl.dsub + t) * mdl.codebooks(j)(c)(t)).sum
      (qid, lut)
    }.toDF(qidCol, "lut")
    val scored = coded.crossJoin(broadcast(luts))
      .withColumn("score",
        aggregate(sequence(lit(0), lit(mdl.m - 1)), lit(0.0),
          (s, j) => s + element_at(col("lut"),
            (j * mdl.ksub +
              element_at(col("pq_codes"), (j + 1).cast("int")) + 1)
              .cast("int"))))
    val cands = scored.groupBy(col(qidCol))
      .agg(graft.expressions.TopKByExpr.topkBy(
        col("score"), col(idCol).cast("long"), candidates).as("__tk"))
      .select(col(qidCol), explode(col("__tk").getField("id")).as(idCol))
    val reranked = cands
      .join(data.select(col(idCol), col(vecCol)), Seq(idCol))
      .join(broadcast(queries.select(col(qidCol), col(qvecCol))),
        Seq(qidCol))
      .withColumn("cosine", cosine(col(vecCol), col(qvecCol)))
    rankTopK(reranked, qidCol, idCol, k)
  }
}
