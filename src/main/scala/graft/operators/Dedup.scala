package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Deduplication family for training-data pipelines: exact, MinHash+LSH,
  * SimHash, n-gram Jaccard, embedding-cosine. Every variant follows the
  * same scale shape — per-row signature (codegen'd expressions, no
  * shuffle) → bucket-join on signature pieces (shuffle only candidate
  * keys, never all-pairs) → verify within buckets. All-pairs comparison
  * never happens: at 100 TB the candidate set is the only quadratic-risk
  * surface, and banding keeps it near-linear for realistic thresholds.
  */
object Dedup {

  // ---- exact ------------------------------------------------------------

  /** Content hash for exact dedup (whitespace/case-normalized md5 —
    * mirrors what e.g. CCNet/C4 call "exact dedup"). */
  def contentHash(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** Exact dedup: keep the lowest-`idCol` row per content hash. Returns
    * the input plus (content_hash, dup_rank, is_duplicate). One shuffle
    * on the hash. */
  def exactDedup(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(col("content_hash")).orderBy(col(idCol))
    df.withColumn("content_hash", contentHash(col(textCol)))
      .withColumn("dup_rank", row_number().over(w))
      .withColumn("is_duplicate", col("dup_rank") > 1)
  }

  /** Exact dedup that never shuffles the payload — the 100 TB variant of
    * [[exactDedup]] (which windows over content_hash, moving every text
    * byte through the exchange). Winners (min-id per hash) are computed
    * on a narrow (hash, id) projection — the only thing shuffled is ~40
    * bytes/row after map-side partial agg — and joined back on `idCol`,
    * where AQE broadcasts the winner set when it fits and the storage
    * layout (id-bucketed at scale) co-locates otherwise. Output: input
    * plus (content_hash, is_duplicate); no dup_rank (rank needs the
    * window — use [[exactDedup]] when you need it).
    *
    * Null-id rows are never marked duplicate (a null key can't join the
    * winner set, and dropping data on a missing id would be silent
    * loss); [[exactDedup]]'s window form instead ranks them within
    * their hash group. Ids are non-null by contract, so the forms agree
    * on every valid input. */
  def exactDedupNarrow(df: DataFrame, textCol: String,
      idCol: String): DataFrame = {
    val hashed = df.withColumn("content_hash", contentHash(col(textCol)))
    val winners = hashed.select(col("content_hash"), col(idCol))
      .groupBy(col("content_hash")).agg(min(col(idCol)).as(idCol))
      .select(col(idCol)).withColumn("__winner", lit(true))
    hashed.join(winners, Seq(idCol), "left")
      .withColumn("is_duplicate",
        col("__winner").isNull && col(idCol).isNotNull)
      .drop("__winner")
  }

  /** Just the duplicate ids (everything except the min-id winner of each
    * content hash) — the cheapest exact-dedup currency for a pipeline:
    * the caller anti-joins this (tiny, broadcastable) set against the
    * corpus and no payload byte is ever shuffled or re-materialized. */
  def exactDupIds(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val pairs = df.select(col(idCol),
      contentHash(col(textCol)).as("content_hash"))
    val winners = pairs.groupBy(col("content_hash"))
      .agg(min(col(idCol)).as("__win"))
    pairs.join(winners, Seq("content_hash"))
      .filter(col(idCol) =!= col("__win")).select(col(idCol))
  }

  // ---- MinHash + LSH ----------------------------------------------------

  /** Deterministic universal hash family over a 31-bit-reduced shingle
    * hash: h_i(x) = (a_i * x + b_i) mod M31 with M31 = 2^31-1 (prime).
    * The final mod is essential — without it a_i*x+b_i is MONOTONE in x,
    * every "independent" function picks the same argmin shingle, and all
    * signature agreement collapses (observed: 0/64 agreement on docs with
    * jaccard 0.86). Products stay under 62 bits so ANSI overflow checking
    * never trips. Constants are the SAME family the native MinHashSig
    * expression uses — one source of truth keeps column-level and native
    * signatures interchangeable. */
  private val M31 = graft.expressions.MinHash.M31
  private def hashFamily(n: Int): Seq[(Long, Long)] =
    graft.expressions.MinHash.hashFamily(n).toSeq

  /** MinHash signature (array of `numHashes` longs) over word
    * `k`-shingles. Pure expressions — no UDF, no shuffle. */
  def minhashSignature(text: Column, k: Int = 3,
      numHashes: Int = 64): Column = {
    val hashes = transform(TextAnalysis.shingles(text, k),
      s => pmod(xxhash64(s), lit(M31)))
    signatureOver(hashes, numHashes)
  }

  /** PERF: do NOT inline a shared hashes Column into the `numHashes`
    * array_min expressions via minhashSignature on a big frame —
    * higher-order functions are interpreted, and each of the 64
    * expressions re-runs tokenize→shingle→xxhash per row (measured 184 s
    * for 5k docs). `withSignature` stages the shingle-hash array as a
    * real column; CollapseProject keeps a non-cheap alias referenced 64×
    * un-inlined, so the shared work runs once per row. */
  private def signatureOver(hashes: Column, numHashes: Int): Column =
    array(hashFamily(numHashes).map { case (a, b) =>
      array_min(transform(hashes, h => pmod(h * lit(a) + lit(b), lit(M31))))
    }: _*)

  /** df + (sig, sh) columns with staged shingle hashing (see above). */
  def withSignature(df: DataFrame, textCol: String, k: Int,
      numHashes: Int): DataFrame =
    df.withColumn("sh",
        array_distinct(TextAnalysis.shingles(col(textCol), k)))
      .withColumn("__hs", transform(col("sh"),
        s => pmod(xxhash64(s), lit(M31))))
      .withColumn("sig", signatureOver(col("__hs"), numHashes))
      .drop("__hs")

  /** LSH banding: split the signature into `bands` bands of
    * numHashes/bands rows each; a pair agreeing on ANY full band becomes
    * a candidate. Emits (idCol, band, band_hash). */
  def lshBands(df: DataFrame, idCol: String, sigCol: String,
      bands: Int): DataFrame = {
    val n = bands
    // Band count is a plan-time constant, so the band array is built by
    // STATIC expansion — n codegen'd xxhash64(concat_ws(slice)) elements
    // — instead of a transform() lambda over sequence(): HOF lambdas
    // evaluate interpreted (never codegen, never subexpression-
    // eliminated; the spanCorrupt lesson), measured ~8-10 s of executor
    // time per sigstore batch at sf0.1 for this one projection. Same
    // hash-input strings element for element, so band values (and thus
    // candidate sets) are bit-identical.
    val bandArr = array((0 until n).map { b =>
      xxhash64(concat_ws("_", lit(b),
        concat_ws(",", slice(col(sigCol),
          lit(b) * (size(col(sigCol)) / n) + 1,
          size(col(sigCol)) / n))))
    }: _*)
    df.select(col(idCol), posexplode(bandArr))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "band_hash")
  }

  /** Candidate pairs from banding (a < b, distinct). Within-bucket
    * pairing is the only quadratic step, so bucket SIZE is the entire
    * scale risk — and on a boilerplate-heavy corpus it is real, not
    * hypothetical: when a template's shared shingles happen to hash
    * small under all r functions of a band, most of that template's
    * docs emit the SAME band value, and the join builds |bucket|²/2
    * pairs inside one task (measured on the 5M-doc stress corpus: one
    * unlucky (template, band) bucket single-handedly spilled >10 GB at
    * 1 core while 31 idled). `maxBucket` drops band values whose bucket
    * exceeds the cap. Recall cost is negligible for REAL near-dups: a
    * pair at jaccard j loses one of its `bands` chances, moving the
    * miss bound from (1-j^r)^b to (1-j^r)^(b-1) — mega-buckets are
    * boilerplate-driven, and pairs whose similarity lives in unique
    * content keep hashing into small buckets. Pairs that agree on
    * EVERYTHING (exact dups en masse) can exceed the cap on every
    * band — run exact dedup first, as CorpusPipeline does. */
  /** (pruned bands, dropped bucket keys) under the mega-bucket cap —
    * shared by [[lshCandidatePairs]] and the signature store's query
    * join so a tuning change to the cap semantics cannot drift between
    * the one-shot and incremental paths. The dropped-keys frame is
    * small (stop-phrase buckets) and broadcastable. */
  private[graft] def splitMegaBuckets(bandsDf: DataFrame,
      maxBucket: Int): (DataFrame, DataFrame) = {
    require(maxBucket > 1, s"maxBucket must be > 1, got $maxBucket")
    if (maxBucket == Int.MaxValue)
      (bandsDf, bandsDf.select(col("band"), col("band_hash")).limit(0))
    else {
      val dropped = bandsDf.groupBy(col("band"), col("band_hash"))
        .agg(count(lit(1)).as("__n"))
        .filter(col("__n") > maxBucket)
        .select(col("band"), col("band_hash"))
      (bandsDf.join(broadcast(dropped), Seq("band", "band_hash"),
        "left_anti"), dropped)
    }
  }

  def lshCandidatePairs(bandsDf: DataFrame, idCol: String,
      maxBucket: Int = 5000): DataFrame = {
    val (pruned, _) = splitMegaBuckets(bandsDf, maxBucket)
    val l = pruned.select(col("band"), col("band_hash"),
      col(idCol).as("id_a"))
    val r = pruned.select(col("band"), col("band_hash"),
      col(idCol).as("id_b"))
    l.join(r, Seq("band", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
  }

  /** Exact Jaccard over word k-shingle SETS for verification. */
  def jaccard(textA: Column, textB: Column, k: Int = 3): Column =
    jaccardSets(array_distinct(TextAnalysis.shingles(textA, k)),
      array_distinct(TextAnalysis.shingles(textB, k)))

  /** Jaccard of two precomputed distinct-shingle arrays. */
  def jaccardSets(sa: Column, sb: Column): Column =
    round(size(array_intersect(sa, sb)).cast("double") /
      size(array_union(sa, sb)), 6)

  /** Full MinHash-LSH near-dup pipeline: signature → bands → candidate
    * pairs → signature-agreement prefilter → exact-Jaccard verify ≥
    * threshold. Returns (id_a, id_b, jaccard).
    *
    * Perf shape (bench-driven — the naive version recomputed
    * tokenize+shingle per CANDIDATE PAIR and was 100× slower at sf0.1):
    *  - signatures and distinct shingle sets are computed ONCE per doc
    *    and persisted (lineage truncation also stops Catalyst from
    *    inlining the 64-hash expression into each of the 16 band exprs);
    *  - candidates are prefiltered by signature agreement (64 long
    *    comparisons) before the expensive exact set intersection —
    *    agreement is an unbiased Jaccard estimate, cut at threshold−0.25
    *    (≈4σ for 64 hashes) so true pairs survive;
    *  - per-pair work then touches only surviving candidates.
    */
  def minhashDupPairs(df: DataFrame, idCol: String, textCol: String,
      k: Int = 3, numHashes: Int = 64, bands: Int = 16,
      threshold: Double = 0.7, maxBucket: Int = 5000)(
      implicit scope: graft.CacheScope): DataFrame = {
    // signatures via the native expression: one tight loop per row.
    // fanout: the signature pass is the per-row hot kernel and a
    // few-files corpus otherwise plans it into one scan task;
    // cacheEager: prepared feeds the band explode AND both join sides
    // (a/b) — when a side is broadcast, its build thread would
    // recompute the whole signature pass against an unmaterialized
    // cache (the bm25 tf lesson, same disease).
    val prepared = scope.cacheEager(
      graft.Tables.fanout(df, col(idCol)).select(col(idCol),
        graft.expressions.MinHash.minhashSig(col(textCol), k, numHashes)
          .as("sig")))
    val cands = lshCandidatePairs(
      lshBands(prepared, idCol, "sig", bands), idCol, maxBucket)
    val a = prepared.select(col(idCol).as("id_a"), col("sig").as("sig_a"))
    val b = prepared.select(col(idCol).as("id_b"), col("sig").as("sig_b"))
    // static expansion over the plan-time hash count (codegen) instead
    // of an interpreted zip_with/filter HOF chain per CANDIDATE pair —
    // same integer match count, same double, bit for bit
    val est = (0 until numHashes).map { i =>
      when(element_at(col("sig_a"), i + 1) ===
        element_at(col("sig_b"), i + 1), 1).otherwise(0)
    }.reduce(_ + _).cast("double") / numHashes
    // exact shingle sets only for the (few) surviving candidates
    val ta = df.select(col(idCol).as("id_a"), col(textCol).as("text_a"))
    val tb = df.select(col(idCol).as("id_b"), col(textCol).as("text_b"))
    cands.join(a, "id_a").join(b, "id_b")
      .withColumn("sig_agree", est)
      .filter(col("sig_agree") >= threshold - 0.25)
      .select("id_a", "id_b")
      .join(ta, "id_a").join(tb, "id_b")
      .withColumn("jaccard", jaccard(col("text_a"), col("text_b"), k))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  // ---- asymmetric containment (quote / excerpt detection) ---------------

  /** Containment near-dup: directed pairs where A's shingle set is mostly
    * inside B's — `containment(A in B) = |S_A ∩ S_B| / |S_A| >= threshold`.
    * The quote/excerpt/expansion case symmetric Jaccard structurally
    * misses: a 50-shingle quote inside a 5000-shingle article has
    * jaccard <= 0.01 at containment 1.0, far below any LSH band's reach.
    *
    * Candidates come from an inverted shingle-hash index probed with each
    * doc's bottom-`probeK` shingle hashes. The bottom-k of a fixed hash
    * order is a uniform sample of S_A drawn independently of B, so a pair
    * at containment c >= threshold is missed only when ALL probeK sampled
    * shingles land in the uncovered (1-c) fraction: P(miss) <=
    * (1-threshold)^probeK — 1e-8 at 0.9/8 — and exactly 0 for full
    * containment. Hash collisions on the join key only ADD candidates;
    * verification computes exact containment on the shingle-string sets.
    *
    * Scale shape: the index is the (shingle-hash, doc) explode —
    * O(corpus shingles) rows, the same floor as any term statistic — and
    * probes are probeK rows/doc. The join's skew surface is hot shingles'
    * posting lists: on a web corpus the top boilerplate shingles have DF
    * in the millions, and an uncapped index emits probeK × DF candidate
    * rows per hot shingle — so the cap defaults ON (`maxPostings` =
    * 10000, sized from the stress run in StressSpec/README §scale where
    * planted DF≈corpus shingles produced exactly the hot×probe blow-up).
    * Shingles with DF > maxPostings are dropped from BOTH sides: from
    * the index (a stop-phrase posting list is uninformative) and from
    * probe SAMPLING — probes are the bottom-probeK of each doc's
    * NON-HOT shingle hashes, so the recall bound survives the cap
    * whenever the doc has ≥ 1 non-hot shingle (the sampled set stays a
    * uniform hash-order sample, now of the non-hot subset; for full
    * containment every non-hot probe of A is still in B's index).
    * A doc with ≥ 1 shingle but ZERO non-hot shingles (pure boilerplate
    * — every shingle is a stop phrase) would silently lose all recall
    * as an id_a, so it RAISES by name instead, naming the doc and the
    * lever; pass `skipAllHotDocs = true` to accept dropping such docs
    * from the probe side (they can still appear as id_b containers).
    * Verification computes exact containment on the full shingle-string
    * sets of candidates only — never all-pairs, and never capped (the
    * cap shapes candidate generation, not the reported score).
    *
    * `shingleHash` is the hash that orders probe sampling and keys the
    * index — xxhash64 by default; the recall-monitor gate swaps in an
    * md5-derived hash so DuckDB can replay the whole candidate path. */
  def containmentPairs(df: DataFrame, idCol: String, textCol: String,
      k: Int = 3, threshold: Double = 0.9, probeK: Int = 8,
      maxPostings: Int = 10000, skipAllHotDocs: Boolean = false,
      shingleHash: Column => Column = xxhash64(_))(
      implicit scope: graft.CacheScope): DataFrame = {
    require(threshold > 0 && threshold <= 1,
      s"containmentPairs: threshold must be in (0,1], got $threshold")
    require(probeK > 0, s"containmentPairs: probeK must be positive")
    require(maxPostings > 0,
      s"containmentPairs: maxPostings must be positive, got $maxPostings")
    // Only the HASH arrays are ever cached (~8 bytes/shingle): the
    // candidate machinery needs nothing else, and caching the shingle
    // STRING arrays alongside (the obvious one-frame layout) was
    // measured OOMing a 5M-doc corpus on an 8 GB / 32-core JVM — the
    // payload-shaped cache crowded execution memory out during the DF
    // aggregation. Exact shingle sets are recomputed from raw text for
    // the (few) verified candidates only, the minhashDupPairs pattern.
    val sh = scope.cacheEager(
      graft.Tables.fanout(df, col(idCol)).select(col(idCol),
        array_distinct(transform(
          array_distinct(TextAnalysis.shingles(col(textCol), k)),
          s => shingleHash(s))).as("shh")))
    val (index, probes, guarded) =
      if (maxPostings == Int.MaxValue) {
        // uncapped opt-out: no DF pass, array-level bottom-k probes
        val idx = sh.select(col(idCol).as("id_b"),
          explode(col("shh")).as("h"))
        val prb = sh.select(col(idCol).as("id_a"),
          explode(slice(array_sort(col("shh")), 1, probeK)).as("h"))
        (idx, prb, (d: DataFrame) => d)
      } else {
        val postings = sh.select(col(idCol), explode(col("shh")).as("h"))
        // DF via groupBy (map-side partial combine: the shuffle carries
        // distinct shingles per task, never a hot key's full posting
        // list), NOT a count-over-window (which would materialize every
        // hot posting in one task — the exact skew being removed)
        // The hot set (stop phrases over the cap) is tiny — cached and
        // broadcast into the anti-joins, so re-deriving the non-hot
        // postings per consumer is a NARROW pass over the hash cache,
        // never a repeat of the DF shuffle.
        val hot = scope.cache(postings.groupBy(col("h"))
          .agg(count(lit(1)).as("__df"))
          .filter(col("__df") > maxPostings).select(col("h")))
        val nonHot = postings.join(broadcast(hot), Seq("h"), "left_anti")
        val idx = nonHot.select(col(idCol).as("id_b"), col("h"))
        // probes: bottom-probeK of the NON-HOT hashes per doc via a
        // row_number window — a bounded topk aggregate would avoid the
        // id-keyed shuffle but orders by a double-cast hash; the recall
        // monitor's DuckDB oracle replays this ordering exactly, so the
        // window's exact 64-bit order wins. Cached (bounded at probeK
        // rows/doc): the candidate join AND the guard both consume it.
        val prb = scope.cache(nonHot
          .withColumn("__rk", row_number().over(Window
            .partitionBy(col(idCol)).orderBy(col("h"))))
          .filter(col("__rk") <= probeK)
          .select(col(idCol).as("id_a"), col("h")))
        // loud path: a non-empty doc with zero non-hot shingles gets no
        // probes and would silently never match as id_a (every doc with
        // >= 1 non-hot posting emits >= 1 probe row, so probe ids ARE
        // the non-hot doc set)
        val allHot = sh.filter(size(col("shh")) > 0)
          .join(prb.select(col("id_a").as(idCol)).distinct(),
            Seq(idCol), "left_anti")
        val guard = allHot
          .agg(count(lit(1)).as("__n"), min(col(idCol)).as("__id"))
          .select(when(col("__n") > 0 && lit(!skipAllHotDocs),
            raise_error(concat(lit("containmentPairs: "), col("__n"),
              lit(" doc(s) (e.g. id="), col("__id"),
              lit(s") have no shingle with DF <= maxPostings=" +
                s"$maxPostings — pure stop-phrase text would silently " +
                "lose all probe recall; raise maxPostings or set " +
                "skipAllHotDocs=true to drop such docs from the probe " +
                "side"))))
            .otherwise(lit(1L)).as("__ok"))
        // The guard is attached as a UNION of a guard-derived (normally
        // empty) frame, NOT the crossJoin(broadcast(guard)) pattern:
        // AQE's empty-relation propagation would skip a broadcast side
        // entirely when the pair output is empty — and an empty output
        // is EXACTLY the silent-recall-loss case this guard exists to
        // make loud. A union child filtered on a computed column cannot
        // be statically pruned, so the raise always evaluates.
        val idT = df.schema(idCol).dataType
        val g = (d: DataFrame) => d.unionByName(
          guard.where(col("__ok") =!= 1L)
            .select(lit(null).cast(idT).as("id_a"),
              lit(null).cast(idT).as("id_b"),
              lit(null).cast("double").as("containment")))
        (idx, prb, g)
      }
    val cands = probes.join(index, Seq("h"))
      .filter(col("id_a") =!= col("id_b"))
      .select("id_a", "id_b").distinct()
    // Exact shingle sets are computed from raw text ONCE PER
    // CANDIDATE-PARTICIPATING DOC (semi-join + cache, bounded by the
    // candidate set), never corpus-wide: shingling is an interpreted
    // higher-order expression, and attaching it per candidate PAIR was
    // measured at 100x the verify cost on a dense-candidate corpus
    // (sf0.1's 40-word vocabulary: ~600k candidates over 5k docs),
    // while caching it for the WHOLE corpus was the 5M-doc OOM. The
    // cached frame is scope-lifetime like every signature frame.
    val candPersist = scope.cache(cands)
    val candIds = candPersist.select(col("id_a").as(idCol))
      .unionByName(candPersist.select(col("id_b").as(idCol))).distinct()
    val exact = scope.cache(df.join(candIds, Seq(idCol), "left_semi")
      .select(col(idCol),
        array_distinct(TextAnalysis.shingles(col(textCol), k))
          .as("shx")))
    val a = exact.select(col(idCol).as("id_a"), col("shx").as("sh_a"))
    val b = exact.select(col(idCol).as("id_b"), col("shx").as("sh_b"))
    guarded(candPersist.join(a, "id_a").join(b, "id_b")
      .withColumn("containment",
        round(size(array_intersect(col("sh_a"), col("sh_b"))).cast("double")
          / size(col("sh_a")), 6))
      .filter(col("containment") >= threshold)
      .select("id_a", "id_b", "containment"))
  }

  // ---- SimHash ----------------------------------------------------------

  /** 64-bit SimHash per document — native expression, zero shuffle
    * (SimHash is per-row; the earlier explode+groupBy formulation paid a
    * full shuffle keyed by doc id for what is a row-local loop). */
  def simhash64(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol),
      graft.expressions.SimHash.simhashSig(col(textCol)).as("simhash"))

  /** Composed-expression SimHash kept for cross-checking the native
    * expression in specs (explode tokens → groupBy → 64 bit-vote sums). */
  private[graft] def simhash64Composed(df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val exploded = df.select(col(idCol),
        explode(TextAnalysis.tokens(col(textCol))).as("tok"))
      .withColumn("h", xxhash64(col("tok")))
    val bitSums = (0 until 64).map(j =>
      sum(when(shiftright(col("h"), j).bitwiseAND(1) === 1, 1)
        .otherwise(-1)).as(s"b$j"))
    val bits = exploded.groupBy(col(idCol))
      .agg(bitSums.head, bitSums.tail: _*)
    val sig = (0 until 64).map(j =>
      when(col(s"b$j") > 0, shiftleft(lit(1L), j)).otherwise(lit(0L)))
      .reduce(_ + _)
    bits.select(col(idCol), sig.as("simhash"))
  }

  /** SimHash near-dup pairs: candidates share at least one of `chunks`
    * equal-width signature chunks — pigeonhole guarantees full recall for
    * hamming < chunks — then verified with bit_count(xor) ≤ maxHamming.
    * More chunks = better recall for a given hamming budget but smaller
    * (hotter) buckets; 8×8-bit is a good default for ≤7-bit drift. */
  def simhashDupPairs(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3, chunks: Int = 8)(
      implicit scope: graft.CacheScope): DataFrame =
    simhashPairsFromSigs(simhash64(df, idCol, textCol), idCol,
      maxHamming, chunks)

  /** The pairing machinery over a precomputed (idCol, simhash) frame —
    * exposed so any 64-bit-signature family rides the same chunk-banded
    * candidate join + bit_count verify (the gate uses it with a
    * portable hash family DuckDB can recompute; production uses the
    * native xxhash64 signature via [[simhashDupPairs]]). With
    * maxHamming < chunks the pigeonhole makes recall EXACT, not
    * probabilistic: the emitted pairs are precisely all pairs at
    * hamming ≤ maxHamming.
    *
    * DENSITY SIZING: a chunk has 64/chunks bits, so there are only
    * 2^(64/chunks) distinct values per chunk position — at the 8-chunk
    * default that is 256 buckets, and an n-doc corpus puts ~n/256 docs
    * in EACH, making the candidate join inherently O(n²/2^width).
    * The default is sized for corpora up to ~10^5 docs per run (dedup
    * shards, gate corpora); beyond that use fewer chunks (16-bit
    * chunks ⟹ 65k buckets, maxHamming ≤ 3) or pre-shard the corpus —
    * SimHash chunk-banding cannot be bucket-capped the way MinHash
    * banding can, because a chunk value is not boilerplate-specific:
    * dropping it drops a uniform slice of ALL pairs. */
  def simhashPairsFromSigs(sigs: DataFrame, idCol: String,
      maxHamming: Int, chunks: Int)(
      implicit scope: graft.CacheScope): DataFrame = {
    require(64 % chunks == 0, "chunks must divide 64")
    val width = 64 / chunks
    val mask = (1L << width) - 1
    // both sides of the candidate self-join branch from this frame;
    // persisting it computes the signature ONCE per doc (16 bytes/row
    // cached) instead of re-running the signature scan per branch.
    // Lifetime is the caller's CacheScope: session-LRU by default,
    // deterministic release under CacheScope.withScope.
    val mat = scope.cache(sigs.select(col(idCol), col("simhash")))
    val chunked = mat.select(col(idCol), col("simhash"),
      posexplode(array((0 until chunks).map(c =>
        shiftrightunsigned(col("simhash"), c * width)
          .bitwiseAND(mask)): _*)))
      .withColumnRenamed("pos", "chunk").withColumnRenamed("col", "chunk_val")
    val l = chunked.select(col("chunk"), col("chunk_val"),
      col(idCol).as("id_a"), col("simhash").as("sh_a"))
    val r = chunked.select(col("chunk"), col("chunk_val"),
      col(idCol).as("id_b"), col("simhash").as("sh_b"))
    l.join(r, Seq("chunk", "chunk_val"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  // ---- embedding cosine near-dup ----------------------------------------

  /** Embedding near-dup: multi-probe LSH bucketing by hyperplane signs
    * (Similarity module), verify cosine ≥ threshold within buckets.
    * Multi-probe matters for TRUE near-dups (not just rescaled copies):
    * a pair whose projection sits near one hyperplane differs in one
    * sign bit and single-bucket LSH misses it; probing the
    * lowest-margin flips recovers those pairs.
    * `dim` must match the embedding dimension — a mismatched hyperplane
    * would null every projection and collapse all rows into one bucket
    * (all-pairs!), so it is probed from the data when not supplied.
    *
    * DENSITY SIZING: `planes` sign bits give 2^planes buckets; expected
    * bucket size is n/2^planes (times `probes` for multi-probe), and
    * the within-bucket join is quadratic in it — scale planes with
    * log2(n) (the 12-plane default targets ~10^5-10^6 rows; 5M rows
    * wants ≥ 16, with `probes` raised to hold recall). Embedding
    * buckets cannot be size-capped like MinHash bands: a dense bucket
    * is a REAL dense region and dropping it drops its genuine dups. */
  def embeddingDupPairs(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double = 0.95, planes: Int = 12,
      seed: Long = 42L, dim: Int = -1, probes: Int = 2)(
      implicit scope: graft.CacheScope): DataFrame = {
    val d = if (dim > 0) dim else Similarity.inferDim(df, vecCol)
    // persisted for the same reason as simhashPairsFromSigs: both join
    // sides branch from the bucketed frame, and without the cache each
    // branch re-projects every vector against all `planes` hyperplanes
    val bucketed = scope.cache(df.select(col(idCol), col(vecCol),
      explode(Similarity.multiProbeBuckets(col(vecCol), d, planes, seed,
        probes)).as("bucket")))
    val l = bucketed.select(col("bucket"), col(idCol).as("id_a"),
      col(vecCol).as("v_a"))
    val r = bucketed.select(col("bucket"), col(idCol).as("id_b"),
      col(vecCol).as("v_b"))
    l.join(r, Seq("bucket")).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        Similarity.cosine(col("v_a"), col("v_b")).as("cosine"))
      .filter(col("cosine") >= threshold)
      .distinct()
  }

  // ---- exact substring dedup (repeated-span removal) ---------------------

  /** Repeated verbatim spans (Lee et al. 2021, "Deduplicating Training
    * Data Makes Language Models Better", arXiv:2107.06499 — the
    * EXACTSUBSTR notion, public literature): a k-token window whose
    * text occurs `minOcc`+ times ANYWHERE in the corpus (other docs or
    * the same doc) is repeated; overlapping/abutting repeated windows
    * merge into maximal spans. Doc-level dedup ([[minhashDupPairs]],
    * [[exactDedup]]) misses this entirely: a unique article quoting a
    * boilerplate license paragraph is no doc-level duplicate of
    * anything, but the paragraph still trains the model on the same
    * bytes thousands of times.
    *
    * The paper builds a corpus-wide suffix array — inherently
    * single-machine. The distributed re-expression: explode k-token
    * windows to narrow (id, pos, hash64) rows (16 bytes/window through
    * the shuffle, never gram text — the [[graft.operators.Curation
    * .decontaminate]] hashing argument: 2^-64 collisions cannot move a
    * >= minOcc decision measurably), count occurrences per hash with
    * map-side combine, keep windows at >= minOcc, and merge each doc's
    * surviving positions into runs with the lag/cumsum session trick —
    * one narrow id-keyed window. A k-token repeat produces exactly one
    * length-k span; longer shared passages chain overlapping windows
    * into one long span.
    *
    * Returns (idCol, span_start, span_end, n_windows): INCLUSIVE
    * 0-based token indexes of each maximal repeated span and the
    * repeated-window count inside it. */
  def repeatedSpans(df: DataFrame, idCol: String, textCol: String,
      k: Int = 20, minOcc: Int = 2)(
      implicit scope: graft.CacheScope): DataFrame = {
    require(k >= 1, s"repeatedSpans: k must be >= 1, got $k")
    require(minOcc >= 2, s"repeatedSpans: minOcc must be >= 2, got $minOcc")
    // window hash = xxhash64 over the k token VALUES (length-framed per
    // column — no join-string ambiguity and, measured, ~3x cheaper than
    // hashing an array_join'd gram string: no per-window string
    // allocation inside the interpreted lambda). Cached narrow
    // (id, pos, h): the DF count and the join-back both consume it, and
    // re-deriving it would re-run the per-window lambda corpus-wide.
    val toks = TextAnalysis.tokens(col(textCol))
    val grams = scope.cache(df
      .select(col(idCol), toks.as("__t"))
      .select(col(idCol), posexplode(
        when(size(col("__t")) >= k,
          transform(sequence(lit(0), size(col("__t")) - k),
            i => xxhash64((0 until k).map(j =>
              element_at(col("__t"), i + j + 1)): _*)))
          .otherwise(array().cast("array<long>"))))
      .select(col(idCol), col("pos"), col("col").as("h")))
    val counts = grams.groupBy(col("h")).agg(count(lit(1)).as("occ"))
      .filter(col("occ") >= minOcc)
    // shuffle join, deliberately not broadcast: on a boilerplate-heavy
    // corpus the repeated-hash set is corpus-sized
    val rep = grams.join(counts, Seq("h")).select(col(idCol), col("pos"))
    val w = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    // windows at p and p' (p < p') overlap or abut iff p' <= p + k
    rep.withColumn("__new",
        when(col("pos") - lag(col("pos"), 1).over(w) <= k, lit(0))
          .otherwise(lit(1)))
      .withColumn("__run", sum(col("__new")).over(w))
      .groupBy(col(idCol), col("__run"))
      .agg(min(col("pos")).as("span_start"),
        (max(col("pos")) + lit(k - 1)).as("span_end"),
        count(lit(1)).as("n_windows"))
      .select(col(idCol), col("span_start"), col("span_end"),
        col("n_windows"))
  }

  /** Remove every repeated span's tokens from each document — the
    * EXACTSUBSTR cut. Returns the input ids with (clean_text,
    * n_removed_tokens); docs with no repeated span pass through
    * verbatim (original whitespace and case), spanned docs are rebuilt
    * from their ORIGINAL-CASE tokens (matching is case-folded via
    * [[repeatedSpans]]' grams, but whitespace splitting is
    * case-independent, so the span token indexes align). The per-doc
    * cut is one higher-order filter over the token array against the
    * doc's (collected, bounded by tokens/k) span list — row-local, no
    * extra shuffle beyond [[repeatedSpans]]' own. */
  def removeRepeatedSpans(df: DataFrame, idCol: String, textCol: String,
      k: Int = 20, minOcc: Int = 2)(
      implicit scope: graft.CacheScope): DataFrame = {
    val spans = repeatedSpans(df, idCol, textCol, k, minOcc)
      .groupBy(col(idCol))
      .agg(collect_list(struct(col("span_start"), col("span_end")))
        .as("__spans"))
    val toks = split(trim(col(textCol)), "\\s+")
    val keptToks = filter(toks, (t, i) =>
      !exists(col("__spans"), s =>
        i >= s.getField("span_start") && i <= s.getField("span_end")))
    df.join(spans, Seq(idCol), "left")
      .select(col(idCol),
        when(col("__spans").isNull, col(textCol))
          .otherwise(array_join(keptToks, " ")).as("clean_text"),
        when(col("__spans").isNull, lit(0L))
          .otherwise(size(toks) - size(keptToks)).cast("long")
          .as("n_removed_tokens"))
  }

  // ---- semantic dedup (cluster-then-dedup) -------------------------------

  /** SemDeDup-style semantic dedup (Abbas et al. 2023, "SemDeDup: Data-
    * efficient learning at web-scale through semantic deduplication",
    * arXiv:2303.09540 — public literature; the reference repo has no
    * embedding operators): partition the corpus into clusters by
    * max-cosine centroid, then within each cluster drop every vector
    * that has a LOWER-id cluster-mate with cosine >= `threshold`
    * (keep-first — the deterministic analogue of the paper's
    * keep-one-per-dup-group rule, and the same tie discipline as
    * [[exactDedup]]/`a8`).
    *
    * This is the published scale path for semantic dedup at web scale:
    * [[embeddingDupPairs]]' hyperplane LSH finds NEAR-DUPLICATE pairs
    * (cosine ~0.95+, where sign-bit agreement is likely), but semantic
    * dedup wants a lower threshold (the paper uses ~0.5-0.9 in CLIP
    * space) where LSH bucket recall collapses — clustering first makes
    * the quadratic verify tractable by bounding it per cluster.
    *
    * Scale shape: cluster assignment is [[Similarity.assignCells]]'
    * MAP-SIDE argmax against the broadcast centroid table (zero
    * shuffle, zero row multiplication); the pairwise verify shuffles
    * narrow (cell, id, vec) rows ONCE keyed by cell and is quadratic
    * only within a cell — size centroid count k so clusters average
    * n/k (the paper uses k ~ sqrt(n)). A cell above `maxClusterSize`
    * raises LOUDLY rather than silently absorbing a quadratic blowup
    * (the [[containmentPairs]]/rangeJoin guard discipline): an
    * oversized cell means the centroids under-fit the data and the
    * caller must retrain with larger k, not eat an O(cell^2) join.
    *
    * Returns (idCol, cell, keep): every input row annotated, keep =
    * false iff a lower-id same-cell row is cosine-`threshold`-close.
    * Centroids: (cell: long, centroid: array<double>), tiny. */
  def semanticDedup(df: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, threshold: Double = 0.9,
      maxClusterSize: Int = 100000, nprobe: Int = 1)(
      implicit scope: graft.CacheScope): DataFrame = {
    require(threshold > -1 && threshold <= 1,
      s"semanticDedup: threshold must be in (-1,1], got $threshold")
    require(maxClusterSize > 1,
      s"semanticDedup: maxClusterSize must be > 1, got $maxClusterSize")
    require(nprobe >= 1,
      s"semanticDedup: nprobe must be >= 1, got $nprobe")
    // MEMBERSHIPS: nprobe = 1 is the published SemDeDup recipe (cluster
    // once, verify within the cell — misses pairs straddling a cell
    // boundary BY DESIGN); nprobe > 1 probes each vector's runner-up
    // cells too, recovering boundary-straddling pairs whenever EITHER
    // side's probe set reaches the other's cell. Assignment cost is
    // identical (the fused matrix loop computes every cosine either
    // way); the verify candidate volume scales ~nprobe².
    // cached: feeds the guard aggregate, both pair sides, and the output
    val assigned = scope.cache(
      if (nprobe == 1)
        Similarity.assignCells(df.select(col(idCol), col(vecCol)),
          idCol, vecCol, centroids)
          .withColumn("crank", lit(1))
      else
        Similarity.assignCellsMulti(df.select(col(idCol), col(vecCol)),
          idCol, vecCol, centroids, nprobe))
    // loud path: a cell whose size makes the within-cell verify
    // quadratic-hostile. Attached as a union child (the containmentPairs
    // pattern) so it cannot be pruned even when the output is consumed
    // lazily or comes back empty. Membership rows count toward the cap
    // (they are exactly what the verify join fans out on).
    val guard = assigned.groupBy(col("cell"))
      .agg(count(lit(1)).as("__n"))
      .select(when(col("__n") > maxClusterSize,
        raise_error(concat(lit("semanticDedup: cluster "), col("cell"),
          lit(" has "), col("__n"),
          lit(s" vectors > maxClusterSize=$maxClusterSize — the " +
            "within-cluster verify is quadratic in cluster size; " +
            "retrain centroids with more cells or raise the cap " +
            "explicitly"))))
        .otherwise(lit(1L)).as("__ok"))
    val l = assigned.select(col("cell"), col(idCol).as("id_a"),
      col(vecCol).as("v_a"))
    val r = assigned.select(col("cell"), col(idCol).as("id_b"),
      col(vecCol).as("v_b"))
    // losers: ids with ANY lower-id close mate SHARING a probed cell.
    // Narrow projection (the duplicate-id column only) leaves the join;
    // the EXISTS shape (distinct, not the mate list) keeps it one row
    // per loser — multi-probe's duplicate (cell, pair) encounters
    // collapse in the same distinct.
    val losers = l.join(r, Seq("cell"))
      .filter(col("id_a") < col("id_b"))
      .filter(Similarity.cosine(col("v_a"), col("v_b")) >= threshold)
      .select(col("id_b").as(idCol)).distinct()
      .withColumn("__dup", lit(true))
    val idT = df.schema(idCol).dataType
    // output stays one row per vector: the PRIMARY cell (crank 1)
    assigned.filter(col("crank") === 1)
      .join(losers, Seq(idCol), "left")
      .select(col(idCol), col("cell"), col("__dup").isNull.as("keep"))
      .unionByName(guard.where(col("__ok") =!= 1L)
        .select(lit(null).cast(idT).as(idCol),
          lit(null).cast("long").as("cell"),
          lit(null).cast("boolean").as("keep")))
  }
}
