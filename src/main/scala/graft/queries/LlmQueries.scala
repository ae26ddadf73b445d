package graft.queries

import graft.Tables
import graft.operators.{Curation, Dedup, Similarity, TextAnalysis => TA}
import graft.pipelines.SignatureStore
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Gate coverage for the LLM-data-pipeline operators (BASELINE.json north
  * star: dedup, similarity search, text analysis at scale).
  *
  * Hash-oracled throughout: DuckDB recomputes the math independently
  * (token stats, language id, exact dedup, the Jaccard kernel, exact
  * brute-force ANN), and since r5 the signature-based ops too — d3
  * (MinHash pairs), d4 (SimHash pairs), and d5 (embedding near-dup)
  * replay the portable signatures in SQL, and since r11 ann6 as well
  * (createSeeded's md5-ordered centroids make the whole monitor a pure
  * function of the data). One rows-only exception remains: t5 (zlib
  * has no DuckDB mirror) — spec-pinned instead. LlmOpsSpec's
  * planted-duplicate recall tests pin the semantic layer on top.
  */
object LlmQueries {

  type Q = (SparkSession, String) => DataFrame

  def queries: Map[String, Q] = Map(
    // ---- text analysis: token stats, quality, language id ---------------
    // Runs the FUSED TextStats native expression (one tokenization pass);
    // the DuckDB oracle recomputes everything independently, so this gate
    // checks the native path, and LlmOpsSpec pins fused ≡ composed.
    "t1_text_analysis" -> ((s, d) => {
      val t = col("text")
      Tables.documents(s, d)
        .withColumn("__st", TA.textStats(t))
        .select(col("doc_id"),
          TA.tokenCountWsS(t, col("__st")).as("n_tok_ws"),
          TA.tokenCountBpe(t).as("n_tok_bpe"),
          TA.punctRatio(t).as("punct_ratio"),
          TA.digitRatio(t).as("digit_ratio"),
          TA.meanTokenLenS(t, col("__st")).as("mean_tok_len"),
          TA.stopwordRatioS(t, col("__st")).as("stopword_ratio"),
          TA.qualityScoreS(t, col("__st")).as("quality"),
          TA.langIdS(t, col("__st")).as("lang_id"))
        .orderBy(col("doc_id"))
    }),

    // ---- broadcast linear-model quality scoring ---------------------------
    // A fastText-style linear classifier over the t1 feature set, with
    // weights as plan literals: one codegen'd expression per row. The
    // oracle re-derives every feature AND replays the left-to-right
    // logit accumulation, so feature drift, weight-order slips, or an
    // accumulation-order change all break the hash.
    "cu12_model_score" -> ((s, d) => {
      val t = col("text")
      // token-derived features ride the fused TextStats pass (one
      // tokenization), like t1; the char-class ratios are regex scans.
      // EVERY feature is null-coalesced to 0.0 (mirrored in the
      // oracle): least() SKIPS nulls, so an unguarded length feature
      // scores a NULL document 1.0 and keeps it — the exact trap
      // qualityScoreT documents — and ratio features go null on empty
      // text via 0/0.
      val feats = array(Seq(
        TA.punctRatio(t), TA.digitRatio(t),
        TA.meanTokenLenS(t, col("__st")) / 10.0,
        TA.stopwordRatioS(t, col("__st")),
        when(t.isNull, lit(0.0))
          .otherwise(least(length(t).cast("double") / 1000.0, lit(1.0))))
        .map(f => coalesce(f, lit(0.0))): _*)
      Tables.documents(s, d)
        .withColumn("__st", TA.textStats(t))
        .select(col("doc_id"),
          Curation.linearScore(feats, ModelW, ModelB).as("logit"))
        .withColumn("is_kept", col("logit") > 0.0)
        .orderBy(col("doc_id"))
    }),

    // ---- portable rolling-hash document fingerprint ----------------------
    // The production fingerprint is TextAnalysis.fingerprint (xxhash64,
    // one codegen'd call). DuckDB has no xxhash64, so the GATE uses an
    // explicit polynomial rolling hash over the normalized text's code
    // points — same plumbing (normalize → per-char fold), independently
    // recomputable on the oracle side.
    // Codepoint portability is ENFORCED, not assumed: the corpus is pure
    // ASCII, so derived rows append BMP (₹, 中) and supplementary (😀)
    // characters. Spark 4's split(s,'') yields one element per CODE POINT
    // and ascii() returns that code point (verified: ascii('😀')=128512,
    // = DuckDB unicode()); if either ever regresses to byte/UTF-16-unit
    // semantics, these rows break the hash match.
    "t2_fingerprint" -> ((s, d) => {
      val base = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val nonAscii = base.filter(col("doc_id") % 50 === 0)
        .select((col("doc_id") + 20000L).as("doc_id"),
          concat(col("text"), lit(" héllo wörld ₹42 中文 😀")).as("text"))
      val docs = base.unionByName(nonAscii)
      val norm = regexp_replace(lower(trim(col("text"))), "\\s+", " ")
      val codes = transform(
        filter(split(norm, ""), ch => ch =!= ""),
        ch => ascii(ch).cast("long"))
      val fp = aggregate(codes, lit(7L),
        (acc, cd) => (acc * 131 + cd) % 1000000007L)
      docs.select(col("doc_id"), fp.as("fingerprint"))
        .orderBy(col("doc_id"))
    }),

    // ---- deflate compression-ratio quality signal ------------------------
    // ROWS-ONLY gate (no oracleSql entry): DuckDB has no zlib, so the
    // ratio values cannot be hash-oracled — LlmOpsSpec pins the
    // semantics (repetitive ≪ prose, empty = 1.0, null text → null,
    // partitioning-invariance). This entry puts the mapPartitions path
    // itself under the driver's eye: schema + one row per document,
    // plus derived highly-repetitive rows (offset 1e9 — far above any
    // real doc_id at any SF, unlike the +10000/+20000 offsets the
    // small fixed-corpus gates use). The two boolean columns make the
    // gate self-verifying (GateInvariantsSpec asserts they never go
    // false): a regression now flips a value captured in digests.json
    // instead of sliding through a rows-only check.
    "t5_compression_signal" -> ((s, d) => {
      val base = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val repetitive = base.filter(col("doc_id") % 100 === 0)
        .select((col("doc_id") + 1000000000L).as("doc_id"),
          lit(Seq.fill(50)("repeat").mkString(" ")).as("text"))
      // cached: both the ratio pass (mapPartitions over .rdd) and the
      // length frame branch from this union
      val input = graft.CacheScope.session.cache(
        base.unionByName(repetitive))
      // zlib's worst case is stored-block expansion, len + 5·ceil(len/
      // 16383) + 6: a fixed ~11-byte floor that dominates tiny inputs
      // PLUS a 5/16383 proportional term that dominates huge ones. The
      // bound 1.01 + 64/len covers both with margin — a flat "≤ 2"
      // would false-alarm on a few-byte doc, and 1 + 64/len on a
      // multi-hundred-KB incompressible one
      val lens = input.select(col("doc_id"),
        octet_length(col("text")).as("__blen"))
      TA.compressionRatio(input, "doc_id", "text")
        .join(lens, Seq("doc_id"), "left")
        .withColumn("ratio_in_bounds", col("compression_ratio").isNull ||
          (col("compression_ratio") > 0 && col("compression_ratio") <=
            lit(1.01) + lit(64.0) / greatest(col("__blen"), lit(1))))
        // the planted repetitive rows must compress dramatically
        .withColumn("repetition_detected",
          when(col("doc_id") >= 1000000000L, col("compression_ratio") < 0.2)
            .otherwise(lit(true)))
        .drop("__blen")
        .orderBy(col("doc_id"))
    }),

    // ---- PORTABLE compression-family signal: integer bigram entropy ------
    // The family's first hash-green member: t5's zlib ratio has no SQL
    // mirror (no_oracle, self-verified via bound columns); this one is
    // exact fixed-point arithmetic — one round(ln·1e6) per distinct
    // code-point bigram (the unigram cost_mu rounding discipline),
    // then integer-only multiply/sum/divide — replayed verbatim in
    // DuckDB. Same corpus as t5 including the planted repetitive docs,
    // whose near-zero entropy is the cross-signal evidence (spec pins
    // extreme-rank agreement between the two signals).
    "t5b_entropy_signal" -> ((s, d) => {
      val base = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val repetitive = base.filter(col("doc_id") % 100 === 0)
        .select((col("doc_id") + 1000000000L).as("doc_id"),
          lit(Seq.fill(50)("repeat").mkString(" ")).as("text"))
      TA.bigramEntropy(base.unionByName(repetitive), "doc_id", "text")
        .orderBy(col("doc_id"))
    }),

    // ---- exact dedup over mangled copies ---------------------------------
    "d1_exact_dedup" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val mangled = docs.filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 10000L).as("doc_id"),
          concat(lit("  "), upper(regexp_replace(col("text"), " ", "   ")))
            .as("text"))
      Dedup.exactDedup(docs.unionByName(mangled), "text", "doc_id")
        .select(col("doc_id"), col("content_hash"), col("dup_rank"),
          col("is_duplicate"))
        .orderBy(col("doc_id"))
    }),

    // ---- the Jaccard verification kernel on fixed pairs ------------------
    "d2_jaccard_kernel" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val a = docs.filter(col("doc_id") % 5 === 0)
        .select(col("doc_id").as("id_a"), col("text").as("text_a"))
      val b = docs.select(col("doc_id").as("id_b"), col("text").as("text_b"))
      a.join(b, col("id_b") === col("id_a") + 1)
        .select(col("id_a"), col("id_b"),
          Dedup.jaccard(col("text_a"), col("text_b"), 3).as("jaccard"))
        .orderBy(col("id_a"))
    }),

    // ---- MinHash-LSH near-dup pairs (oracle: DuckDB brute force) ---------
    // The oracle is brute-force all-pairs exact Jaccard ≥ threshold —
    // the TRUE pair set, computed with no knowledge of LSH. The gate
    // therefore checks RECALL, not just plumbing: bands=32 (r=2) puts
    // the per-pair miss probability at threshold 0.7 below 1e-9
    // (1-(1-0.49)^32), and the sig-agreement prefilter cut sits >4σ
    // from the threshold, so LSH output ≡ ground truth on any corpus;
    // precision is exact by the final Jaccard verify. Verified equal to
    // the brute-force set at sf0.001/sf0.01 (25 pairs, bitwise values).
    "d3_minhash_pairs" -> ((s, d) => {
      Dedup.minhashDupPairs(Tables.documents(s, d), "doc_id", "text",
        k = 3, numHashes = 64, bands = 32, threshold = 0.7)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // ---- asymmetric containment (quote detection) ------------------------
    // For every 50th doc a 40-token prefix "quote" is planted (+60000):
    // every quote shingle appears in its base, so containment = 1.0 and
    // the bottom-k probe CANNOT miss it (recall is exact, not
    // probabilistic, at full containment). The oracle brute-forces every
    // DIRECTED pair with the sound size prune, so the gate checks the
    // full probe → posting-join → exact-verify path against ground
    // truth — including the corpus's natural mutual-containment dups.
    // RE-TUNING NOTE: natural pairs at containment in [0.9, 1.0) are
    // found with P(miss) <= 0.1^probeK = 1e-8 per pair; the md5/xxhash64
    // sampling is deterministic, so if a REGENERATED corpus ever lands a
    // pair in the miss set the mismatch is permanent, not flaky — raise
    // probeK here and re-verify. The finite default maxPostings (10000)
    // never engages on this corpus (max shingle DF is 25 at sf0.1).
    "d10_containment_pairs" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val quotes = docs
        .filter(col("doc_id") % 50 === 0 && col("text").isNotNull)
        .select((col("doc_id") + 60000L).as("doc_id"),
          concat_ws(" ", slice(split(col("text"), "\\s+"), 1, 40))
            .as("text"))
      Dedup.containmentPairs(docs.unionByName(quotes), "doc_id", "text",
        k = 3, threshold = 0.9, probeK = 8)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // ---- containment recall monitor (production drift telemetry) ---------
    // d10 proves exact containment on candidates; this gate measures the
    // candidate path's RECALL against brute-force ground truth on a
    // bounded stratum — id_a % 7 within a FIXED id range (all planted
    // quotes plus the first 1000 base docs), so the brute-force side is
    // O(stratum x corpus) with a CONSTANT stratum as SF grows, the way
    // a production monitor samples a fixed-k stratum per batch. It is
    // the ann6 pattern but fully oracle-replayable: the index path runs
    // with the PORTABLE md5-derived shingle hash, so DuckDB recomputes
    // the probe ordering, posting lists, candidate join and verify
    // bit-identically and the recall numbers hash-compare — a recall
    // regression flips both the boolean AND the oracle hash. The truth
    // side is EXACT brute force expressed as an explode + broadcast
    // hash join + count (|A∩B| = matched distinct shingles), not a
    // nested-loop array_intersect: the r12 official bench caught the
    // NLJ form running 9.4× its committed cost under memory-bandwidth
    // contention a CPU calibration can't see — the equi-join form
    // streams each corpus shingle once through a hash probe instead of
    // rescanning stratum×corpus array pairs, and its one shuffle is
    // the matched-pair counts only. Output-identical (shingle sets are
    // array_distinct'ed, so the match count IS the intersection size;
    // zero-intersection pairs can't pass the 0.9 threshold).
    "d10b_containment_recall" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val quotes = docs
        .filter(col("doc_id") % 50 === 0 && col("text").isNotNull)
        .select((col("doc_id") + 60000L).as("doc_id"),
          concat_ws(" ", slice(split(col("text"), "\\s+"), 1, 40))
            .as("text"))
      val corpus = docs.unionByName(quotes)
      val md5Hash = (c: org.apache.spark.sql.Column) =>
        conv(substring(md5(c), 1, 15), 16, 10).cast("long")
      def inStratum(c: org.apache.spark.sql.Column) =
        c % 7 === 0 && (c < 1000 || c >= 60000)
      val idxP = Dedup.containmentPairs(corpus, "doc_id", "text",
        k = 3, threshold = 0.9, probeK = 8, shingleHash = md5Hash)
        .filter(inStratum(col("id_a")))
        .select(col("id_a"), col("id_b")).withColumn("__found", lit(1))
      // persisted: feeds the stratum (broadcast) leg and the corpus
      // (probe) leg — without the cache the corpus shingle pass runs
      // twice (released by the caller's CacheScope bracket)
      val sh = graft.CacheScope.session.cache(
        corpus.select(col("doc_id"),
          array_distinct(
            graft.operators.TextAnalysis.shingles(col("text"), 3))
            .as("shs")))
      val aExpl = sh.filter(inStratum(col("doc_id")))
        .select(col("doc_id").as("id_a"), size(col("shs")).as("n_a"),
          explode(col("shs")).as("sh"))
      val truth = sh
        .select(col("doc_id").as("id_b"), explode(col("shs")).as("sh"))
        .join(broadcast(aExpl), "sh")
        .filter(col("id_a") =!= col("id_b"))
        .groupBy(col("id_a"), col("id_b"), col("n_a"))
        .agg(count(lit(1)).as("n_int"))
        .filter(round(col("n_int").cast("double") / col("n_a"), 6)
          >= 0.9)
        .select(col("id_a"), col("id_b"))
      // outer coalesce: sum over ZERO truth rows is null, which would
      // make recall_exact_ok null instead of true and diverge from the
      // oracle's count(*)-based replay on an empty stratum
      truth.join(idxP, Seq("id_a", "id_b"), "left")
        .agg(count(lit(1)).as("n_true"),
          coalesce(sum(coalesce(col("__found"), lit(0))), lit(0L))
            .as("n_found"))
        .select(col("n_true"), col("n_found"),
          (col("n_true") - col("n_found")).as("n_missed"),
          (col("n_found") === col("n_true")).as("recall_exact_ok"))
    }),

    // ---- incremental near-dup via the persisted signature store ----------
    // The ingest-dedup flow: seed the store with two thirds of the
    // corpus, then query a batch of planted copies (+50000) and unseen
    // docs (+90000) against it WITHOUT reading seed text — candidates
    // come from the persisted bands (bucket-pruned), are prefiltered by
    // signature agreement (0.45 = threshold − 4σ, d3's bound), and the
    // gate verifies candidates with exact Jaccard from the corpus. The
    // oracle brute-forces every cross-set pair, so output ≡ ground
    // truth by the same recall argument d3 carries.
    "d9_incremental_neardup" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val dir = GateTmp.dir("graft_sigstore", d)
      val seed = docs.filter(col("doc_id") % 3 =!= 2)
        .select(col("doc_id"), col("text"))
      val batch = docs
        .filter(col("doc_id") % 3 =!= 2 && col("doc_id") % 5 === 0)
        .select((col("doc_id") + 50000L).as("doc_id"), col("text"))
        .unionByName(docs.filter(col("doc_id") % 3 === 2)
          .select((col("doc_id") + 90000L).as("doc_id"), col("text")))
      SignatureStore.create(s, dir, seed, "doc_id", "text")
      val cands = SignatureStore.nearDups(s, dir, batch, "doc_id", "text",
        minAgreement = 0.45)
      cands
        .join(seed.select(col("doc_id").as("store_id"),
          col("text").as("text_s")), Seq("store_id"))
        .join(batch.select(col("doc_id").as("batch_id"),
          col("text").as("text_b")), Seq("batch_id"))
        .withColumn("jaccard", Dedup.jaccard(col("text_s"),
          col("text_b"), 3))
        .filter(col("jaccard") >= 0.7)
        .select(col("store_id"), col("batch_id"), col("jaccard"))
        .orderBy(col("store_id"), col("batch_id"))
    }),

    // ---- near-dup through a COMPACTED signature store ---------------------
    // d9's incremental flow after store maintenance: seed + two appended
    // batches (one of them planted copies of seed docs), then compact +
    // vacuum — the two source batch dirs physically deleted, everything
    // non-seed folded into ONE manifest-committed compact batch — and
    // only then query. Rows copy verbatim under compaction, so the
    // brute-force oracle is the SAME ground-truth replay as an
    // uncompacted store's: a visibility bug (orphan read, retired dir
    // leak, manifest miss) changes candidate multiplicity or membership
    // and flips the hash.
    "d9b_sigstore_compact" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val dir = GateTmp.dir("graft_sigstore_c", d)
      val seed = docs.filter(col("doc_id") % 3 === 0)
        .select(col("doc_id"), col("text"))
      val b1 = docs.filter(col("doc_id") % 3 === 1)
        .select(col("doc_id"), col("text"))
      val b2 = docs.filter(col("doc_id") % 15 === 0)
        .select((col("doc_id") + 20000L).as("doc_id"), col("text"))
      SignatureStore.create(s, dir, seed, "doc_id", "text")
      SignatureStore.append(s, dir, b1, "doc_id", "text", "b1")
      SignatureStore.append(s, dir, b2, "doc_id", "text", "b2")
      SignatureStore.compact(s, dir, vacuumAfter = true)
      val batch = docs.filter(col("doc_id") % 3 === 2)
        .select((col("doc_id") + 90000L).as("doc_id"), col("text"))
        .unionByName(docs.filter(col("doc_id") % 15 === 0)
          .select((col("doc_id") + 50000L).as("doc_id"), col("text")))
      val cands = SignatureStore.nearDups(s, dir, batch, "doc_id",
        "text", minAgreement = 0.45)
      val store = seed.unionByName(b1).unionByName(b2)
      cands
        .join(store.select(col("doc_id").as("store_id"),
          col("text").as("text_s")), Seq("store_id"))
        .join(batch.select(col("doc_id").as("batch_id"),
          col("text").as("text_b")), Seq("batch_id"))
        .withColumn("jaccard", Dedup.jaccard(col("text_s"),
          col("text_b"), 3))
        .filter(col("jaccard") >= 0.7)
        .select(col("store_id"), col("batch_id"), col("jaccard"))
        .orderBy(col("store_id"), col("batch_id"))
    }),

    // ---- SimHash near-dup pairs (oracle: DuckDB brute force) -------------
    // Portable 63-bit signature (polynomial codepoint token hash +
    // affine-parity bits — DuckDB recomputes it independently) through
    // the production chunk-banded pairing machinery. maxHamming=7 <
    // chunks=8 makes recall pigeonhole-EXACT, so the emitted pairs are
    // provably all pairs at hamming ≤ 7 and the brute-force oracle is
    // exact ground truth. The native xxhash64 signature (not DuckDB-
    // recomputable) keeps its planted-recall + native≡composed specs.
    "d4_simhash_pairs" -> ((s, d) => {
      val sigs = Tables.documents(s, d)
        .select(col("doc_id"), graft.expressions.PortableSimHash
          .portableSimhashSig(col("text")).as("simhash"))
      Dedup.simhashPairsFromSigs(sigs, "doc_id", maxHamming = 7, chunks = 8)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // ---- embedding-cosine near-dup with planted copies -------------------
    // Oracle: brute-force all-pairs cosine ≥ threshold in DuckDB. The
    // planted rows are SCALED copies — identical hyperplane sign pattern
    // — so LSH recall for them is deterministic, and random 64-dim
    // vectors never reach 0.999 cosine; the LSH output equals the true
    // set with exact (sequentially-accumulated, engine-identical)
    // cosine values.
    "d5_embedding_dups" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
        .select(col("vec_id"), col("embedding").cast("array<double>")
          .as("embedding"))
      val planted = emb.filter(col("vec_id") % 10 === 0)
        .select((col("vec_id") + 10000L).as("vec_id"),
          transform(col("embedding"), x => x * 1.001).as("embedding"))
      Dedup.embeddingDupPairs(emb.unionByName(planted), "vec_id",
        "embedding", threshold = 0.999, planes = 8)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // ---- SemDeDup cluster-then-dedup (oracle: full replay) ---------------
    // Centroids are the 4 lowest-id embeddings (deterministic, no
    // k-means — DuckDB replays the argmax-cosine assignment exactly);
    // planted half-scale copies share their original's direction, hence
    // its cell, and sit at cosine 1.0 ≥ 0.99 — provably dropped by
    // keep-first while the originals survive. The oracle recomputes
    // assignment AND the within-cell pairwise decisions; the output is
    // all integer/boolean, so the hash pins cluster ids and every
    // keep/drop decision. Threshold compares and argmax ordering use
    // the sequentially-accumulated engine-identical cosine (ann1).
    "d11_semantic_dedup" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
        .select(col("vec_id"), col("embedding").cast("array<double>")
          .as("embedding"))
      val copies = emb.filter(col("vec_id") < 10)
        .select((col("vec_id") + 10000L).as("vec_id"),
          transform(col("embedding"), x => x * 0.5).as("embedding"))
      val cents = emb.filter(col("vec_id") < 4)
        .select(col("vec_id").cast("long").as("cell"),
          col("embedding").as("centroid"))
      Dedup.semanticDedup(emb.unionByName(copies), "vec_id", "embedding",
        cents, threshold = 0.99)
        .orderBy(col("vec_id"))
    }),

    // ---- SemDeDup with MULTI-PROBE membership (the boundary lever) -------
    // The published recipe clusters once and verifies within the cell,
    // missing near-dup pairs that straddle a cell boundary BY DESIGN
    // (the Stress 5M run measured that miss as collapse recall 0.713).
    // nprobe = 2 probes each vector's runner-up cell too; this gate
    // hash-pins the whole multi-probe chain — the top-2 (cosine DESC,
    // cell ASC) ranking, the membership join, the distinct-loser
    // collapse of duplicate pair encounters, and the primary-cell
    // output — against a rank-windowed DuckDB replay.
    "d11b_semantic_multiprobe" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
        .select(col("vec_id"), col("embedding").cast("array<double>")
          .as("embedding"))
      val copies = emb.filter(col("vec_id") < 10)
        .select((col("vec_id") + 10000L).as("vec_id"),
          transform(col("embedding"), x => x * 0.5).as("embedding"))
      val cents = emb.filter(col("vec_id") < 4)
        .select(col("vec_id").cast("long").as("cell"),
          col("embedding").as("centroid"))
      Dedup.semanticDedup(emb.unionByName(copies), "vec_id", "embedding",
        cents, threshold = 0.99, nprobe = 2)
        .orderBy(col("vec_id"))
    }),

    // ---- exact substring dedup: repeated-span discovery ------------------
    // Lee et al. EXACTSUBSTR re-expressed distributed: 8-token windows
    // occurring >= 2 times anywhere, merged to maximal spans. The
    // oracle regroups the gram STRINGS (no hash) — a Spark-side
    // xxhash64 collision, dropped probe, or run-merge off-by-one moves
    // a span boundary and breaks the all-integer hash.
    "d12_repeated_spans" -> ((s, d) => {
      Dedup.repeatedSpans(Tables.documents(s, d), "doc_id", "text",
        k = 8, minOcc = 2)
        .select(col("doc_id"),
          col("span_start").cast("long").as("span_start"),
          col("span_end").cast("long").as("span_end"), col("n_windows"))
        .orderBy(col("doc_id"), col("span_start"))
    }),

    // ---- composed corpus-clean pipeline (oracle: staged recompute) -------
    // DuckDB re-derives every stage count from first principles: the
    // t1 lang/quality features, md5 exact-dedup winners, then brute-
    // force Jaccard ≥ 0.8 for the near-dup losers. lshBands=32 makes
    // the LSH recall exact (see d3) so the brute-force count is the
    // true expectation.
    "c1_corpus_clean" -> ((s, d) => {
      import s.implicits._
      val (_, stats) = graft.pipelines.CorpusPipeline.clean(
        Tables.documents(s, d).select(col("doc_id"), col("text")),
        "doc_id", "text",
        graft.pipelines.CorpusPipeline.Config(
          langs = Seq("en", "und"), minQuality = 0.3,
          minhashThreshold = 0.8, lshBands = 32))
      Seq((stats("input"), stats("after_lang_quality"),
        stats("after_exact_dedup"), stats("after_near_dedup")))
        .toDF("input", "after_lang_quality", "after_exact_dedup",
          "after_near_dedup")
    }),

    // ---- composed quality stack: C4 → Gopher → bigram-LM threshold -------
    // Every doc is sentence-ized (' value ' → '.\n') and given a
    // stopword-rich closing line, so each stage passes SOME docs and
    // fails others; the LM trains on the raw planted src0 slice (the
    // CCNet "clean reference" role). The oracle chains the full cu14 /
    // t10 / t11 recomputes over the same planted corpus — three proven
    // oracles composed end to end.
    "c2_quality_gate" -> ((s, d) => {
      val planted = Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          concat(replace(col("text"), lit(" value "), lit(".\n")),
            lit(".\nof the data and that batch have with be to end."))
            .as("text"))
      val (out, _) = graft.pipelines.CorpusPipeline.qualityGate(
        planted, "doc_id", "text",
        planted.filter(col("source") === "src0"), "text",
        maxAvgNll = 12.0)
      out.select(col("doc_id"), col("text"), col("n_transitions"),
          col("avg_nll"))
        .orderBy(col("doc_id"))
    }),

    // ---- full raw-web pipeline: extract → blocklist → C4 → Gopher → LM ---
    // The c2 composition with the raw-web FRONT bolted on: each doc
    // arrives as HTML (built so extraction produces c2's planted
    // sentence structure) with a source-derived URL; webFront extracts
    // and blocklists (both map-only — no shuffle enters the pipeline
    // before C4), the LM trains on the SURVIVING src0 slice, and the
    // oracle replays strip chain, both blocklist legs, and the shared
    // c2 quality chain end to end.
    "c3_web_pipeline" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("source"), col("text"))
      val raw = docs.select(col("doc_id"), col("source"),
        concat(lit("https://www."), col("source"),
          (col("doc_id") % 7).cast("string"), lit(".com/p/"),
          col("doc_id").cast("string")).as("url"),
        concat(lit("<html><body><p>"),
          replace(coalesce(col("text"), lit("")), lit(" value "),
            lit(".</p><p>")),
          lit(".</p><p>of the data and that batch have with be to " +
            "end.</p></body></html>")).as("html"))
      val (front, _) = graft.pipelines.CorpusPipeline.webFront(raw,
        "doc_id", "html", "url", "text",
        blockedDomains = Seq("src03.com", "src12.com"),
        lexicon = Seq("slow", "big", "merge"), maxBadFrac = 0.08)
      val (out, _) = graft.pipelines.CorpusPipeline.qualityGate(
        front, "doc_id", "text",
        front.filter(col("source") === "src0"), "text",
        maxAvgNll = 12.0)
      out.select(col("doc_id"), col("text"), col("n_transitions"),
          col("avg_nll"))
        .orderBy(col("doc_id"))
    }),

    // ---- exact brute-force ANN top-k (oracle-checked) --------------------
    // ---- hashed text embeddings → cosine top-k, text-only end to end -----
    // Signed feature hashing turns raw text into unit vectors with no
    // external model; the gate runs the full text → embedding → exact
    // cosine top-k chain. The oracle re-derives EVERYTHING: both md5
    // draws per token, bucket sums over the 16-cell spine, the L2
    // normalization fold, and the cosine ranking — so a drift in
    // hashing, the sign convention, zero-vector handling, or the
    // normalize arithmetic flips the hash.
    "emb1_hash_embed" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      // materialized BEFORE the broadcast join: CollapseProject would
      // otherwise inline the embed expression into the join and
      // re-evaluate it per join PAIR (the anq1 lesson — measured 5.5 s
      // vs 0.6 s at sf0.1)
      val emb = graft.CacheScope.session.cache(
        Similarity.hashEmbed(docs, "doc_id", "text",
          dim = 16, seed = "he"))
      val queries = emb.filter(col("doc_id") % 97 === 0)
        .select(col("doc_id").as("qid"), col("embedding").as("qv"))
      Similarity.bruteForceTopK(emb, "doc_id", "embedding",
        queries, "qid", "qv", k = 4)
        .select(col("qid"), col("rank"), col("doc_id"), col("cosine"))
        .orderBy(col("qid"), col("rank"))
    }),

    // ---- PMI collocations: adjacent-pair phrase mining -------------------
    // Exact long counts in, one IEEE ln + one round out (integer
    // micros). The oracle recounts unigrams, within-doc adjacent
    // pairs, and the corpus total, then replays the PMI arithmetic in
    // the same operation order — support filtering, doc-boundary
    // handling, and the micro rounding are all hash-pinned.
    "t22_collocations" -> ((s, d) => {
      TA.collocations(Tables.documents(s, d), "text", minCount = 5L)
        .orderBy(col("pmi_micros").desc, col("w1"), col("w2"))
    }),

    // folded half-corpus counts must score identically to the one-shot
    // model (additive integer sums) — the incremental-maintenance
    // contract of the LM family, for PMI; the oracle is t22's
    // one-shot replay verbatim
    "t22b_incremental_pmi" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val a = TA.collocCounts(docs.filter(col("doc_id") % 2 === 0),
        "text")
      val b = TA.collocCounts(docs.filter(col("doc_id") % 2 =!= 0),
        "text")
      TA.collocationsFrom(TA.foldColloc(a, b), minCount = 5L)
        .orderBy(col("pmi_micros").desc, col("w1"), col("w2"))
    }),

    "ann1_bruteforce_topk" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val queries = emb.filter(col("vec_id") < 3)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      Similarity.bruteForceTopK(emb, "vec_id", "embedding",
        queries, "qid", "qv", k = 5)
        .select(col("qid"), col("rank"), col("vec_id"), col("cosine"))
        .orderBy(col("qid"), col("rank"))
    }),

    // ---- kNN majority-vote label classification (oracle-checked) ---------
    // Label propagation in embedding space: each of the 10 query vectors
    // is labeled by majority vote of its 7 nearest cosine neighbors
    // (self excluded). The oracle recomputes neighbors AND the vote with
    // its own window/argmax; ties break (votes DESC, label ASC) on both
    // sides, so the hash pins the full classify path (score → bounded
    // top-k → label fetch → argmax vote).
    "knn1_label_vote" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val queries = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      Similarity.knnClassify(emb, "vec_id", "embedding", "label",
        queries, "qid", "qv", k = 7)
        .orderBy(col("qid"))
    }),

    // ---- hybrid retrieval: BM25 + cosine, reciprocal-rank fusion ---------
    // The RAG-corpus ranker: docs 0-2 query as BOTH text (their first 5
    // tokens, t8's queries) and vector (their own embedding — doc_id ≡
    // vec_id in the testdata). Each leg is cut at depth 10, fused as
    // Σ round(1e6/(60+rank)) — exact integer arithmetic over two ranks
    // that are themselves hash-verified paths (t8's BM25 replay, ann1's
    // cosine replay), so the oracle re-derives both rankings AND the
    // fusion and the final (score DESC, id ASC) order hash-compares.
    "hy1_hybrid_rrf" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val emb = Tables.embeddings(s, d)
        .select(col("vec_id").as("doc_id"), col("embedding"))
      val queries = docs.filter(col("doc_id") < 3)
        .select(col("doc_id").as("qid"),
          concat_ws(" ", slice(split(lower(trim(col("text"))), "\\s+"),
            1, 5)).as("qtext"))
        .join(emb.select(col("doc_id").as("qid"),
          col("embedding").as("qv")), Seq("qid"))
      graft.operators.HybridRetrieval.hybridTopK(docs, emb, "doc_id",
        "text", "embedding", queries, "qid", "qtext", "qv", k = 5,
        depth = 10)
        .select(col("qid"), col("rank"), col("id").as("doc_id"),
          col("score"))
        .orderBy(col("qid"), col("rank"))
    }),

    // ---- hybrid retrieval, production-shaped: BM25 + persisted IVF -------
    // Same fusion as hy1, but the semantic leg is the full ann5 store
    // lifecycle — create from half the corpus, frozen-quantizer append
    // of the other half, cell-pruned query — cut at k=5, the depth at
    // which the planted-copy construction makes the IVF answer PROVABLY
    // the exact top-5 (each query's 5 scaled copies + the query itself
    // share its argmax-cosine cell under ANY centroids, and that cell
    // is always probed). The lexical leg stays depth 10. The oracle
    // replays the lex CTEs, a brute-force cosine top-5 over the
    // augmented corpus (≡ the store's provable answer), and the
    // integer-micros RRF — hash-pinning the production-shaped hybrid
    // path (store-backed ANN leg) end to end. Ids the corpus planted
    // beyond the doc space fuse with one leg's contribution only, as a
    // real mixed-id deployment would.
    "hy2_hybrid_ivf" -> ((s, d) => {
      val dir = GateTmp.dir("graft_vstore_hy2", d)
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(dir), true)
      val data = annCorpus(s, d)
      // PQ codebooks are trained but unused by topK (exact cosine) —
      // keep them minimal here, as ann6 does; ann5 pins the full-size
      // store lifecycle
      graft.pipelines.VectorStore.create(s, dir,
        data.filter(col("vec_id") % 2 === 0), "vec_id", "embedding",
        nCells = 8, m = 4, ksub = 8, ivfIters = 2, pqIters = 2)
      graft.pipelines.VectorStore.append(s, dir,
        data.filter(col("vec_id") % 2 === 1), "vec_id", "embedding",
        batchTag = "b1")
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val queries = docs.filter(col("doc_id") < 3)
        .select(col("doc_id").as("qid"),
          concat_ws(" ", slice(split(lower(trim(col("text"))), "\\s+"),
            1, 5)).as("qtext"))
      val qvec = data.filter(col("vec_id") < 3)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      val lex = TA.bm25TopK(docs, "doc_id", "text", queries,
        "qid", "qtext", k = 10)
      val sem = graft.pipelines.VectorStore.topK(s, dir, qvec,
        "qid", "qv", k = 5, nprobe = 3)
      graft.operators.HybridRetrieval.rrfFuse(Seq(
          lex.select(col("qid"), col("rank"), col("doc_id").as("id")),
          sem.select(col("qid"), col("rank"), col("vec_id").as("id"))),
        "qid", "id", k = 5)
        .select(col("qid"), col("rank"), col("id").as("doc_id"),
          col("score"))
        .orderBy(col("qid"), col("rank"))
    }),

    // ---- multinomial Naive Bayes source classifier (train + score) -------
    // The fastText-style quality/source classifier: train per-class
    // token counts on 2/3 of the corpus (source as the class), score
    // the held-out 1/3 — argmax label, winning log-score, and the
    // winner-minus-runner-up confidence margin, all in exact integer
    // micros. The oracle independently recounts the model, re-derives
    // priors/totals/vocabulary, replays the smoothed per-term log
    // probabilities at micro precision, and re-runs the argmax window,
    // so a regression anywhere in train, fold math, smoothing, or the
    // tie-break (score DESC, label ASC) breaks the hash.
    "nb1_source_classifier" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("source"), col("text"))
      val mdl = TA.nbTrain(docs.filter(col("doc_id") % 3 =!= 0),
        "source", "text")
      TA.nbScore(docs.filter(col("doc_id") % 3 === 0), "doc_id", "text",
        mdl, alpha = 1.0)
        .orderBy(col("doc_id"))
    }),

    // ---- incremental NB: folded batch models ≡ one-shot train ------------
    // The train slice arrives as two halves; their count tables fold by
    // SUM (through the single-frame encode/decode round trip the
    // streamed state store uses) and the held-out third is scored
    // against the maintained state. The oracle is the SAME
    // full-recompute SQL as nb1 — integer counts are associative, so
    // the incremental path must reproduce the one-shot scores bit for
    // bit (the t11b/dsir2 discipline).
    "nb2_incremental_nb" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("source"), col("text"))
      val train = docs.filter(col("doc_id") % 3 =!= 0)
      val folded = TA.nbModelFromCounts(TA.nbModelToCounts(TA.nbFold(
        TA.nbTrain(train.filter(col("doc_id") % 2 === 0),
          "source", "text"),
        TA.nbTrain(train.filter(col("doc_id") % 2 === 1),
          "source", "text"))))
      TA.nbScore(docs.filter(col("doc_id") % 3 === 0), "doc_id", "text",
        folded, alpha = 1.0)
        .orderBy(col("doc_id"))
    }),

    // ---- int8-quantized ANN (the embedding bandwidth lever) ---------------
    // Corpus vectors quantize to int8 codes + one scale (~7× smaller
    // scan at 100 TB), queries stay full precision, and brute-force
    // top-5 runs over the DEQUANTIZED corpus. The oracle recomputes
    // scales, every int8 code, the reconstruction, and the cosine
    // ranking — quantization arithmetic (half-away rounding, the
    // zero-vector guard, tinyint range) is hash-pinned end to end.
    "anq1_int8_topk" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
        .select(col("vec_id"),
          col("embedding").cast("array<double>").as("embedding"))
      // MATERIALIZE the codes (the whole point of quantization is a
      // stored, smaller scan): inlined, CollapseProject pushes the
      // interpreted quantize+dequant lambda chain INTO the query
      // cross-join and re-evaluates it per (vector, query) pair —
      // measured 4.3 s vs 0.35 s on this gate, and |data|×|queries|
      // quantizations at scale. Lifetime: `CacheScope.session`
      // delegates to the thread's ACTIVE scope — Bench and Verify
      // build AND run each gate inside a per-query withScope bracket,
      // so this frame is unpersisted when the gate's action finishes;
      // only a caller outside any bracket gets the documented
      // session-LRU default.
      val dq = graft.CacheScope.session.cache(
        emb.select(col("vec_id"),
          Similarity.int8Dequantize(
            Similarity.int8Quantize(col("embedding"))).as("dvec")))
      val queries = emb.filter(col("vec_id") < 3)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      Similarity.bruteForceTopK(dq, "vec_id", "dvec", queries,
          "qid", "qv", k = 5)
        .select(col("qid"), col("rank"), col("vec_id"), col("cosine"))
        .orderBy(col("qid"), col("rank"))
    }),

    // ---- int8 VectorStore lifecycle (storage-level quantization) ----------
    // anq1 proves the quantization ARITHMETIC; this proves the STORE:
    // createSeeded lays the vectors down as int8 codes + scale (the
    // ~7× scan-bytes format), append follows the recorded format with
    // no parameter at its call site, and the IVF probe scores
    // dequantized-on-read vectors (asymmetric search). The oracle
    // replays the whole lifecycle: md5-seeded centroid pick,
    // full-precision cell assignment (write-time, FAISS convention),
    // per-vector quantize→dequantize, the (cosine DESC, cell) probe
    // ranking at nprobe=4, and the pruned top-5 — a regression in
    // storage codec, format propagation, or the read-side dequant
    // breaks the hash.
    "anq2_int8_store" -> ((s, d) => {
      val dir = GateTmp.dir("graft_vstore_i8", d)
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(dir), true)
      val data = annCorpus(s, d)
      graft.pipelines.VectorStore.createSeeded(s, dir,
        data.filter(col("vec_id") % 2 === 0), "vec_id", "embedding",
        nCells = 8, m = 4, ksub = 8, pqIters = 2, int8 = true)
      graft.pipelines.VectorStore.append(s, dir,
        data.filter(col("vec_id") % 2 === 1), "vec_id", "embedding",
        batchTag = "b1")
      val queries = data.filter(col("vec_id") < 3)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      graft.pipelines.VectorStore.topK(s, dir, queries, "qid", "qv",
          k = 5, nprobe = 4)
        .select(col("qid"), col("rank"), col("vec_id"), col("cosine"))
        .orderBy(col("qid"), col("rank"))
    }),

    // ---- IVF-PQ query over the int8 store ---------------------------------
    // The remaining store path × format combination: stage 1 scores
    // the PQ codes against per-query LUTs (codes were assigned from
    // FULL-precision vectors at write time, so ann4's pool argument
    // carries over unchanged), stage 2 re-ranks the 50-candidate pool
    // by exact cosine over the DEQUANTIZED vectors — so the output
    // equals anq2's pruned brute-force top-5 and the SAME full-replay
    // oracle pins it: a PQ-path regression against int8 storage
    // (format propagation into stage 1, dequantized rerank, probe-set
    // pruning) breaks the hash. Stage 1 never touches a float64
    // vector column (PlanSpec pins the scan schema).
    "anq3_int8_pq" -> ((s, d) => {
      val dir = GateTmp.dir("graft_vstore_i8pq", d)
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(dir), true)
      val data = annCorpus(s, d)
      graft.pipelines.VectorStore.createSeeded(s, dir,
        data.filter(col("vec_id") % 2 === 0), "vec_id", "embedding",
        nCells = 8, m = 4, ksub = 8, pqIters = 2, int8 = true)
      graft.pipelines.VectorStore.append(s, dir,
        data.filter(col("vec_id") % 2 === 1), "vec_id", "embedding",
        batchTag = "b1")
      val queries = data.filter(col("vec_id") < 3)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      graft.pipelines.VectorStore.topKPq(s, dir, queries, "qid", "qv",
          k = 5, nprobe = 4, candidates = 50)
        .select(col("qid"), col("rank"), col("vec_id"), col("cosine"))
        .orderBy(col("qid"), col("rank"))
    }),

    // ---- compaction is lossless (the small-files maintenance op) ----------
    // anq2's exact lifecycle plus TWO appends, then compact(vacuum):
    // the appends' batch dirs fold into one committed b=compact-*
    // dir, the sources are physically deleted, and the SAME full
    // replay oracle must still hash-match — compaction that drops a
    // row, re-quantizes a code, or mis-cells anything breaks it.
    "anq4_compacted_store" -> ((s, d) => {
      val dir = GateTmp.dir("graft_vstore_i8c", d)
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(dir), true)
      val data = annCorpus(s, d)
      graft.pipelines.VectorStore.createSeeded(s, dir,
        data.filter(col("vec_id") % 2 === 0), "vec_id", "embedding",
        nCells = 8, m = 4, ksub = 8, pqIters = 2, int8 = true)
      graft.pipelines.VectorStore.append(s, dir,
        data.filter(col("vec_id") % 2 === 1 && col("vec_id") % 4 === 1),
        "vec_id", "embedding", batchTag = "b1")
      graft.pipelines.VectorStore.append(s, dir,
        data.filter(col("vec_id") % 4 === 3),
        "vec_id", "embedding", batchTag = "b2")
      require(graft.pipelines.VectorStore
        .compact(s, dir, vacuumAfter = true).nonEmpty,
        "anq4: compaction did not run")
      val queries = data.filter(col("vec_id") < 3)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      graft.pipelines.VectorStore.topK(s, dir, queries, "qid", "qv",
          k = 5, nprobe = 4)
        .select(col("qid"), col("rank"), col("vec_id"), col("cosine"))
        .orderBy(col("qid"), col("rank"))
    }),

    // ---- sign random projection (JL dimensionality lever) -----------------
    // 64-dim embeddings project to 16 dims through the deterministic
    // md5-sign matrix, then brute-force top-5 runs IN THE PROJECTED
    // space. The oracle rebuilds the sign matrix from the same md5
    // parity, replays every projection sum left-to-right, and re-ranks
    // — a seed/sign/accumulation-order/scaling regression anywhere
    // breaks the hash. Projected-space geometry (scaled copies stay
    // cosine 1.0, JL distortion bounds) is LlmOpsSpec's.
    "rp1_random_projection" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
        .select(col("vec_id"),
          col("embedding").cast("array<double>").as("embedding"))
      // materialize before the cross join (the anq1 CollapseProject
      // lesson: an interpreted HOF projection above a join re-evaluates
      // per scored pair)
      val proj = graft.CacheScope.session.cache(
        emb.select(col("vec_id"),
          Similarity.randomProject(col("embedding"), 64, 16, "rp1")
            .as("pvec")))
      val queries = proj.filter(col("vec_id") < 3)
        .select(col("vec_id").as("qid"), col("pvec").as("qv"))
      Similarity.bruteForceTopK(proj, "vec_id", "pvec", queries,
          "qid", "qv", k = 5)
        .select(col("qid"), col("rank"), col("vec_id"), col("cosine"))
        .orderBy(col("qid"), col("rank"))
    }),

    // ---- two-stage RP search: projected prefilter + exact rerank ----------
    // The production use of rp1's lever: stage 1 ranks candidates by
    // cosine in the 16-dim PROJECTED space (4× cheaper scan+dot), keeps
    // 20 per query; stage 2 re-ranks the pool by exact cosine in the
    // original 64-dim space and keeps 5. The oracle replays both stages
    // — the sign matrix, the projected top-20 (with its DESC/id
    // tie-break), the exact-cosine rerank — so a candidate-pool or
    // rerank regression breaks the hash even when the final ids happen
    // to match brute force.
    "rp2_project_rerank" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
        .select(col("vec_id"),
          col("embedding").cast("array<double>").as("embedding"))
      val proj = graft.CacheScope.session.cache(
        emb.select(col("vec_id"), col("embedding"),
          Similarity.randomProject(col("embedding"), 64, 16, "rp1")
            .as("pvec")))
      val queries = proj.filter(col("vec_id") < 3)
        .select(col("vec_id").as("qid"), col("pvec").as("qp"),
          col("embedding").as("qv"))
      val cands = Similarity.bruteForceTopK(
          proj.select(col("vec_id"), col("pvec")), "vec_id", "pvec",
          queries.select(col("qid"), col("qp")), "qid", "qp", k = 20)
        .select(col("qid"), col("vec_id"))
      val reranked = cands
        .join(emb, Seq("vec_id"))
        .join(broadcast(queries.select(col("qid"), col("qv"))),
          Seq("qid"))
        .withColumn("cosine",
          Similarity.cosine(col("embedding"), col("qv")))
      graft.operators.Similarity.rankTopK(reranked, "qid", "vec_id",
          k = 5)
        .select(col("qid"), col("rank"), col("vec_id"), col("cosine"))
        .orderBy(col("qid"), col("rank"))
    }),

    // ---- topic-balanced subsample (cluster × exact-k) ---------------------
    // The embedding-space diversity sampler: assign every vector to a
    // deterministic cell (md5-seeded centroids — the createSeeded/ann6
    // trick, so assignment is a pure function of the data) and keep an
    // exact-k uniform sample per cell (cu11's bounded topk machinery).
    // This is how a 100 TB corpus gets balanced across latent topics
    // without a trained clusterer in the loop: no k-means state, no
    // global pass, both stages fully oracle-replayable. A regression
    // anywhere — centroid order, cosine assignment, the md5 draw, the
    // per-cell ranking — breaks the hash.
    "cb1_topic_balanced" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
        .select(col("vec_id").cast("long").as("id"),
          col("embedding").cast("array<double>").as("vec"))
      val picked = emb
        .orderBy(md5(col("id").cast("string")), col("id"))
        .limit(8).collect()
      val centroidSchema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("cell",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("centroid",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.DoubleType), nullable = false)))
      import scala.jdk.CollectionConverters._
      val centroids = s.createDataFrame(
        picked.zipWithIndex.map { case (r, i) =>
          org.apache.spark.sql.Row(i.toLong, r.getSeq[Double](1))
        }.toSeq.asJava, centroidSchema)
      val assigned = Similarity.assignCells(emb, "id", "vec", centroids)
      graft.operators.Curation.uniformGroupSample(
          assigned.select(col("cell"), col("id")), "cell", "id", k = 10)
        .select(col("cell"), col("rank"), col("id").as("vec_id"))
        .orderBy(col("cell"), col("rank"))
    }),

    // ---- learned language ID: NB over char 2-4-grams (fastText-style) ----
    // The heuristic langId (t1) counts marker words; this is the
    // learned upgrade: multinomial NB over character n-gram features
    // (the fastText recipe — char statistics fire on inflected forms
    // and scripts, not just exact stopwords). The testdata's text is
    // language-independent, so each doc gets a deterministic per-lang
    // marker suffix planted (replayed by the oracle) — giving the
    // classifier real signal; train on 2/3, score the held-out 1/3.
    // The oracle re-plants, re-extracts every n-gram, rebuilds the
    // model, and replays the micro-exact scoring + argmax, so feature
    // extraction (normalization, gram windows), training, smoothing,
    // and the tie-break are all hash-pinned. Breadth: the corpus
    // carries only 5 real langs, so the gate assigns each doc one of
    // the 20 langMarkers languages (six scripts) via doc_id % 20 —
    // deterministic, oracle-replayed — and the classifier runs
    // 20-way. LlmOpsSpec holds the confusion matrix against the
    // marker-word heuristic on the same planted docs.
    "lang1_learned_langid" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("text"))
        .withColumn("lang", element_at(
          array(langMarkers.map(p => lit(p._1)): _*),
          (col("doc_id") % langMarkers.size + 1).cast("int")))
      val marker = langMarkers.tail.foldLeft(
        when(col("lang") === langMarkers.head._1,
          langMarkers.head._2)) { case (acc, (l, m)) =>
        acc.when(col("lang") === l, m)
      }.otherwise(langMarkers.head._2)
      val planted = docs.select(col("doc_id"), col("lang"),
        concat_ws(" ", coalesce(col("text"), lit("")), marker)
          .as("ptext"))
      val feats = TA.charNgrams(col("ptext"), 2, 4)
      val mdl = TA.nbTrainFeats(
        planted.filter(col("doc_id") % 3 =!= 0), "lang", feats)
      TA.nbScoreFeats(planted.filter(col("doc_id") % 3 === 0),
          "doc_id", feats, mdl, alpha = 1.0)
        .join(planted.select(col("doc_id"), col("lang")), Seq("doc_id"))
        .select(col("doc_id"), col("lang"), col("pred"),
          (col("pred") === col("lang")).as("correct"),
          col("score_micros"), col("margin_micros"))
        .orderBy(col("doc_id"))
    }),

    // ---- LSH-bucketed ANN top-k (oracle: DuckDB brute-force top-k) -------
    // The corpus is augmented with 5 scaled copies of each query vector:
    // identical direction ⟹ identical hyperplane signs ⟹ every copy
    // shares the query's base bucket, so the index PROVABLY returns
    // them; with cosines ~1.0 they (plus the query itself, also in the
    // data) ARE the global top-5, so approximate top-k ≡ exact top-k
    // and the independent brute-force oracle is the true expectation.
    // A bucketing/probing/dedup/ranking regression loses a planted
    // neighbor and breaks the hash match. Recall at thinner settings
    // stays spec-pinned (LlmOpsSpec).
    "ann3_lsh_topk" -> ((s, d) => {
      val data = annCorpus(s, d)
      val queries = data.filter(col("vec_id") < 3)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      Similarity.lshTopK(data, "vec_id", "embedding", queries, "qid", "qv",
        k = 5, planes = 4, probes = 4)
        .select(col("qid"), col("rank"), col("vec_id"), col("cosine"))
        .orderBy(col("qid"), col("rank"))
    }),

    // ---- IVF ANN top-k (oracle: DuckDB brute-force top-k) ----------------
    // Same planted-copy construction: copies assign to the query's own
    // argmax-cosine cell (cosine is scale-invariant), which is always
    // among the nprobe probed cells, so the IVF result is provably the
    // exact top-5 regardless of where k-means put the centroids.
    "ann2_ivf_topk" -> ((s, d) => {
      val data = annCorpus(s, d)
      val queries = data.filter(col("vec_id") < 3)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      val index = Similarity.ivfBuild(data, "vec_id", "embedding",
        nCells = 8, iters = 2)
      Similarity.ivfTopK(index, "vec_id", "embedding", queries,
        "qid", "qv", k = 5, nprobe = 3)
        .select(col("qid"), col("rank"), col("vec_id"), col("cosine"))
        .orderBy(col("qid"), col("rank"))
    }),

    // ---- persisted IVF store, incremental append (oracle: brute force) --
    // The store is created from HALF the corpus and the other half is
    // appended with the frozen quantizers — the O(batch) maintenance
    // path — then queried. Same planted-copy construction as ann2: the
    // copies share each query's argmax-cosine cell under ANY centroids
    // (cosine is scale-invariant), that cell is always probed, so the
    // store's answer is provably the exact top-5; an assignment or
    // append regression that mis-cells or drops a row loses a planted
    // neighbor and breaks the hash.
    "ann5_store_topk" -> ((s, d) => {
      val dir = GateTmp.dir("graft_vstore", d)
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(dir), true)
      val data = annCorpus(s, d)
      // light training for the gate (correctness is centroid-agnostic
      // by the planted-copy construction; production default is 3/8)
      graft.pipelines.VectorStore.create(s, dir,
        data.filter(col("vec_id") % 2 === 0), "vec_id", "embedding",
        nCells = 8, m = 8, ksub = 16, ivfIters = 2, pqIters = 3)
      graft.pipelines.VectorStore.append(s, dir,
        data.filter(col("vec_id") % 2 === 1), "vec_id", "embedding",
        batchTag = "b1")
      val queries = data.filter(col("vec_id") < 3)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      graft.pipelines.VectorStore.topK(s, dir, queries, "qid", "qv",
        k = 5, nprobe = 3)
        .select(col("qid"), col("rank"), col("vec_id"), col("cosine"))
        .orderBy(col("qid"), col("rank"))
    }),

    // ---- vector-store drift monitor (FULL-oracle gate since r11) ---------
    // recallAtK compares the frozen quantizer's cell-pruned top-k with
    // within-batch exact brute force, per batch — the re-train trigger.
    // The store is laid down with createSeeded: centroids are the 8
    // seed vectors with the smallest (md5(id), id) draw — a valid
    // coarse quantizer (k-means' own init) that is a pure function of
    // the data, so DuckDB independently replays centroid selection,
    // every cell assignment, the per-query probe ranking, BOTH top-k
    // sides, and the micro-averaged recall. The r10 self-verifying
    // booleans stay in the output (GateInvariantsSpec) and are now
    // hash-pinned too.
    "ann6_recall_monitor" -> ((s, d) => {
      val dir = GateTmp.dir("graft_vstore_mon", d)
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(dir), true)
      val data = annCorpus(s, d)
      // PQ codebooks are trained but unused by the monitor — keep them
      // minimal; the monitor's own cost model is one store scan per run
      graft.pipelines.VectorStore.createSeeded(s, dir,
        data.filter(col("vec_id") % 2 === 0), "vec_id", "embedding",
        nCells = 8, m = 4, ksub = 8, pqIters = 2)
      graft.pipelines.VectorStore.append(s, dir,
        data.filter(col("vec_id") % 2 === 1), "vec_id", "embedding",
        batchTag = "b1")
      // hash-sampled query set — the cu1 machinery on the vector ids
      val queries = graft.operators.Curation.hashSample(data, "vec_id",
          graft.operators.Curation.rateBound(0.1))
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      graft.pipelines.VectorStore.recallAtK(s, dir, queries, "qid", "qv",
        k = 5, nprobe = 4)
        .select(col("batch"), col("n_queries"), col("n_true"),
          col("n_hit"), col("recall_at_k"))
        // self-verifying bounds (GateInvariantsSpec asserts all-true):
        // a monitor regression flips a boolean in the digested output
        // instead of passing the rows-only check silently
        .withColumn("counts_consistent",
          col("n_queries") > 0 && col("n_true") > 0 &&
          col("n_true") <= col("n_queries") * 5 &&
          col("n_hit").between(lit(0), col("n_true")))
        .withColumn("recall_in_bounds",
          col("recall_at_k").between(0.0, 1.0) &&
          (col("recall_at_k") === col("n_hit").cast("double") /
            col("n_true")))
        .orderBy(col("batch"))
    }),

    // ---- PQ ANN top-k (oracle: the same brute-force top-k) ----------------
    // Two-stage production shape: LUT scan over 8-byte codes keeps a
    // 50-candidate pool per query, exact cosine re-ranks the pool. The
    // planted copies score within quantization error of the query's own
    // max — far above the random background (cos ≲ 0.35) — so the pool
    // provably contains the true top-5 and the re-ranked output equals
    // exact brute force, cosines bit-identical. Pool-recall at thin
    // settings stays spec-pinned (LlmOpsSpec).
    "ann4_pq_topk" -> ((s, d) => {
      val data = annCorpus(s, d)
      val queries = data.filter(col("vec_id") < 3)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      val mdl = Similarity.pqTrain(data, "vec_id", "embedding",
        m = 8, ksub = 16, iters = 4)
      Similarity.pqTopK(data, "vec_id", "embedding", queries,
        "qid", "qv", k = 5, mdl, candidates = 50)
        .select(col("qid"), col("rank"), col("vec_id"), col("cosine"))
        .orderBy(col("qid"), col("rank"))
    }),
  )

  /** Shared ANN gate corpus: embeddings (as double) plus 5 scaled
    * near-copies of each query vector (ids 10000+, scales 1.001..1.005
    * — distinct so ranks are decided by cosine values both engines
    * compute identically). */
  private def annCorpus(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>")
        .as("embedding"))
    val q = emb.filter(col("vec_id") < 3)
    val copies = (0 until 5).map { c =>
      q.select((lit(10000L) + col("vec_id") * 5 + lit(c.toLong))
          .as("vec_id"),
        transform(col("embedding"), x => x * lit(1.0 + 0.001 * (c + 1)))
          .as("embedding"))
    }.reduce(_ unionByName _)
    emb.unionByName(copies)
  }

  /** cu12 linear quality model: weights/bias shared by the Spark query
    * and the generated oracle so they cannot drift. */
  private val ModelW = Seq(-2.0, -1.5, 0.8, 1.2, 0.6)
  private val ModelB = 0.1
  private def modelLogitSql: String = {
    // The length feature must mirror the Spark side's explicit null-text
    // guard: DuckDB least() SKIPS nulls (least(NULL, 1.0) = 1.0), so an
    // unguarded coalesce(least(...), 0.0) would score a null-text doc 1.0
    // where the Spark query scores it 0.0.
    val feats = Seq("punct_ratio", "digit_ratio", "(mean_tok_len / 10.0)",
      "stopword_ratio",
      "CASE WHEN text IS NULL THEN 0.0" +
        " ELSE least(length(text) / 1000.0, 1.0) END")
    feats.zip(ModelW).foldLeft(ModelB.toString) {
      case (acc, (f, w)) => s"($acc + coalesce($f, 0.0) * $w)"
    }
  }

  private val SimP = graft.expressions.PortableSimHash.P
  private def bitConsts(j: Int): (Long, Long) =
    graft.expressions.PortableSimHash.bitConsts(j)

  private val stopList = TA.englishStopwords
    .map(w => s"'$w'").mkString("[", ", ", "]")
  private def profileSql(markers: Seq[String]): String =
    markers.map(w => s"'$w'").mkString("[", ", ", "]")

  /** Shared WITH-prefix (base → scored → feat) re-deriving the t1
    * text features in DuckDB; t1's oracle selects from it directly and
    * c1's builds the pipeline-stage recompute on top. */
  private def featCtes: String = {
    val profiles = TA.defaultLangProfiles
    val scoreExprs = profiles.map { case (lang, m) =>
      s"len(list_filter(toks, t -> list_contains(${profileSql(m)}, t)))" +
        s" AS s_$lang"
    }.mkString(",\n    ")
    s"""WITH base AS (
       |  SELECT doc_id, text,
       |    string_split_regex(lower(trim(text)), '\\s+') AS toks
       |  FROM documents),
       |scored AS (
       |  SELECT doc_id, text, toks,
       |    $scoreExprs
       |  FROM base),
       |feat AS (
       |  SELECT doc_id, text, toks,
       |    s_en, s_es, s_fr, s_de,
       |    greatest(s_en, s_es, s_fr, s_de) AS best,
       |    CAST(len(toks) AS INTEGER) AS n_tok_ws,
       |    CAST(len(regexp_extract_all(text,
       |      '[A-Za-z0-9]+|[^A-Za-z0-9\\s]')) AS INTEGER) AS n_tok_bpe,
       |    round(CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]'))
       |      AS DOUBLE) / length(text), 6) AS punct_ratio,
       |    round(CAST(len(regexp_extract_all(text, '[0-9]'))
       |      AS DOUBLE) / length(text), 6) AS digit_ratio,
       |    round(CAST(list_sum(list_transform(toks, t -> length(t)))
       |      AS DOUBLE) / len(toks), 6) AS mean_tok_len,
       |    round(CAST(len(list_filter(toks,
       |      t -> list_contains($stopList, t))) AS DOUBLE) / len(toks), 6)
       |      AS stopword_ratio
       |  FROM scored)""".stripMargin
  }

  /** The t1/c1 quality formula and language ladder as SQL snippets. */
  private def qualitySql: String =
    """round(least(length(text) / 200.0, 1.0) * 0.4
      |    + (1.0 - least(punct_ratio * 5.0, 1.0)) * 0.25
      |    + (1.0 - least(digit_ratio * 5.0, 1.0)) * 0.25
      |    + (CASE WHEN mean_tok_len BETWEEN 3.0 AND 10.0
      |       THEN 1.0 ELSE 0.5 END) * 0.1, 6)""".stripMargin
  private def langLadderSql: String = {
    val ladder = TA.defaultLangProfiles.map { case (lang, _) =>
      s"WHEN s_$lang = best THEN '$lang'"
    }.mkString(" ")
    s"CASE WHEN best <= 0 THEN 'und' $ladder ELSE 'und' END"
  }

  /** Spark-matching word-3-shingle set in DuckDB (same as d2's oracle). */
  private[queries] def shinglesCte(src: String): String =
    s"""sh AS (
       |  SELECT doc_id,
       |    list_distinct(list_transform(
       |      range(1, len(string_split_regex(lower(trim(text)), '\\s+')) - 1),
       |      i -> string_split_regex(lower(trim(text)), '\\s+')[i] || ' ' ||
       |           string_split_regex(lower(trim(text)), '\\s+')[i+1] || ' ' ||
       |           string_split_regex(lower(trim(text)), '\\s+')[i+2]))
       |      AS shingles
       |  FROM $src)""".stripMargin

  /** Brute-force Jaccard pair CTE over `sh` with the sound size-ratio
    * prune (j ≥ t ⟹ min|set|/max|set| ≥ t, truncation keeps it loose). */
  private[queries] def jaccardPairsSql(threshold: Double): String =
    s"""SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |    round(CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
       |      / len(list_distinct(list_concat(a.shingles, b.shingles))), 6)
       |      AS jaccard
       |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
       |  WHERE len(a.shingles) >= CAST($threshold * len(b.shingles) AS BIGINT)
       |    AND len(b.shingles) >= CAST($threshold * len(a.shingles) AS BIGINT)
       |""".stripMargin

  /** Generated DuckDB recompute of the d4 portable simhash — same
    * constants as [[portableSimhashFromHashes]], then brute-force
    * all-pairs hamming (xor + bit_count). */
  private def d4OracleSql: String = {
    val bitTerms = (0 until 63).map { j =>
      val (a, b) = bitConsts(j)
      s"(CASE WHEN 2*len(list_filter(hs, h -> ((h*$a+$b) % $SimP) % 2 = 1))" +
        s" > len(hs) THEN ${1L << j} ELSE 0 END)"
    }.mkString("\n      + ")
    s"""WITH toks AS (
       |  SELECT doc_id,
       |    string_split_regex(lower(trim(text)), '\\s+') AS ts
       |  FROM documents),
       |th AS (
       |  SELECT doc_id, list_transform(ts, t -> list_reduce(
       |    list_prepend(CAST(7 AS BIGINT),
       |      list_transform(range(1, length(t) + 1),
       |        i -> CAST(unicode(t[i]) AS BIGINT))),
       |    (acc, c) -> (acc * 131 + c) % $SimP)) AS hs
       |  FROM toks),
       |sig AS (
       |  SELECT doc_id, CAST($bitTerms AS BIGINT) AS simhash FROM th)
       |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |  CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
       |FROM sig a JOIN sig b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.simhash, b.simhash)) <= 7
       |ORDER BY id_a, id_b""".stripMargin
  }

  /** ann2/ann3 oracle: independent brute-force top-5 over the planted
    * corpus (mirrors annCorpus; knows nothing about LSH/IVF). */

  /** c2/c3 oracle: the C4 → Gopher → bigram-LM quality chain over a
    * caller-supplied CTE `rdocs(doc_id, source, text)` — shared so the
    * two composed gates replay IDENTICAL rules (one fixed threshold
    * drifting between copies was the OracleFragments lesson). LM trains
    * on rdocs' src0 slice; survivors filter at avg_nll ≤ 12.0. */
  private def qualityGateChainSql: String = {
    val thr = 12.0
    s"""c4l AS (
       |  SELECT doc_id, source, coalesce(text, '') AS t,
       |    list_filter(list_transform(
       |      string_split(coalesce(text, ''), chr(10)), x -> trim(x)),
       |      x -> x <> '') AS ls
       |  FROM rdocs),
       |c4k AS (
       |  SELECT doc_id, source, t, ls,
       |    list_filter(ls, x ->
       |      (x LIKE '%.' OR x LIKE '%!' OR x LIKE '%?'
       |        OR x LIKE '%"')
       |      AND len(list_filter(string_split_regex(x, '\\s+'),
       |        w -> w <> '')) >= 3
       |      AND NOT contains(lower(x), 'javascript')) AS ks
       |  FROM c4l),
       |kept1 AS (
       |  SELECT doc_id, source,
       |    coalesce(array_to_string(ks, chr(10)), '') AS ct
       |  FROM c4k
       |  WHERE len(ks) >= 5 AND NOT contains(lower(t), 'lorem ipsum')
       |    AND NOT contains(t, '{')),
       |${OracleFragments.gopherCtes("kept1", "ct")},
       |kept2 AS (SELECT doc_id FROM gfp WHERE gopher_pass),
       |${OracleFragments.lmTrainCtes("rdocs", "text",
            "source = 'src0'")},
       |lmdocs AS (
       |  SELECT k.doc_id, kept1.ct FROM kept2 k
       |  JOIN kept1 USING (doc_id)),
       |${OracleFragments.lmScoreCtes("lmdocs", "ct", 0.5)}
       |SELECT k.doc_id, kept1.ct AS text, s.n_transitions,
       |  s.nll_micros / CAST(1000000.0 AS DOUBLE) / s.n_transitions
       |    AS avg_nll
       |FROM kept2 k JOIN kept1 USING (doc_id) JOIN lmsc s USING (doc_id)
       |WHERE s.n_transitions > 0
       |  AND s.nll_micros / CAST(1000000.0 AS DOUBLE)
       |    / s.n_transitions <= CAST($thr AS DOUBLE)
       |ORDER BY k.doc_id""".stripMargin
  }

  /** nb1/nb2 oracle: one-shot Naive Bayes recompute (see the
    * oracles-map comment). */
  /** lang1's planted per-language marker suffixes — ONE definition
    * spliced into both the Spark query and the oracle so they cannot
    * drift. 20 languages spanning six scripts (Latin, Han, Cyrillic,
    * Arabic, Devanagari, Kana/Hangul/Greek/Hebrew/Thai): each marker
    * is that language's top function words (public frequency lists) —
    * the synthetic corpus carries only 5 real langs, so the gate
    * derives a deterministic 20-way language assignment from doc_id
    * and plants accordingly (both engines replay the same mapping).
    * "en" first: it doubles as the fallback for unlisted langs. */
  private[graft] val langMarkers: Seq[(String, String)] = Seq(
    "en" -> "the and of to is in that it with",
    "de" -> "der die und das ist von den mit ein",
    "es" -> "el la de que y en los del una",
    "fr" -> "le la et les des est une dans au",
    "zh" -> "的 是 在 了 我 有 和 就",
    "pt" -> "o a de que e do da em um não",
    "it" -> "il la di che e un per con non si",
    "nl" -> "de het een van en dat is op te niet",
    "sv" -> "och att det som en på är av för inte",
    "pl" -> "i w nie na się że jest do z tak",
    "tr" -> "bir ve bu için ne gibi daha çok ama ben",
    "ru" -> "и в не на я что он с как это",
    "ar" -> "في من على أن إلى عن هذا مع كان لا",
    "hi" -> "के है में की और से का यह पर हो",
    "ja" -> "の に は を た が で て と し",
    "ko" -> "이 그 저 것 수 들 는 에 의 를",
    "el" -> "και το της να που με από για είναι δεν",
    "he" -> "של את על לא זה עם הוא כל אם גם",
    "th" -> "ที่ และ ใน ของ ให้ ได้ เป็น มี จะ ไม่",
    "vi" -> "của và là có trong được cho người không một")

  private def lang1OracleSql: String = {
    val caseSql = langMarkers.tail
      .map { case (l, m) => s"WHEN lang = '$l' THEN '$m'" }
      .mkString("CASE ", " ", s" ELSE '${langMarkers.head._2}' END")
    val langList = langMarkers.map(p => s"'${p._1}'").mkString(", ")
    s"""WITH assigned AS (
       |  SELECT doc_id, text,
       |    ([$langList])[CAST(doc_id % ${langMarkers.size} AS INTEGER)
       |      + 1] AS lang
       |  FROM documents),
       |planted AS (
       |  SELECT doc_id, lang,
       |    concat_ws(' ', coalesce(text, ''), $caseSql) AS ptext
       |  FROM assigned),
       |norm AS (
       |  SELECT doc_id, lang,
       |    regexp_replace(lower(trim(ptext)), '\\s+', ' ', 'g') AS s
       |  FROM planted),
       |grams AS (
       |  SELECT doc_id, lang, substr(s, i, n) AS term
       |  FROM norm CROSS JOIN (SELECT unnest([2, 3, 4]) AS n) ns,
       |    unnest(generate_series(1, len(s) - n + 1)) AS t(i)
       |  WHERE len(s) >= n),
       |tc AS (
       |  SELECT lang AS label, term, count(*) AS c FROM grams
       |  WHERE doc_id % 3 <> 0 GROUP BY 1, 2),
       |ltot AS (
       |  SELECT label, CAST(SUM(c) AS BIGINT) AS tot FROM tc
       |  GROUP BY 1),
       |voc AS (SELECT count(DISTINCT term) AS v FROM tc),
       |dc AS (SELECT lang AS label, count(*) AS n_docs FROM planted
       |  WHERE doc_id % 3 <> 0 GROUP BY 1),
       |ndt AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS n_total FROM dc),
       |pri AS (
       |  SELECT label,
       |    CAST(round(ln(CAST(n_docs AS DOUBLE) / n_total)
       |      * CAST(1000000.0 AS DOUBLE)) AS BIGINT) AS prior_micros
       |  FROM dc, ndt),
       |dt AS (
       |  SELECT doc_id, term, count(*) AS nk FROM grams
       |  WHERE doc_id % 3 = 0 GROUP BY 1, 2),
       |ll AS (
       |  SELECT dt.doc_id, l.label,
       |    CAST(SUM(CAST(round(ln(
       |        (coalesce(tc.c, 0) + CAST(1.0 AS DOUBLE))
       |        / (ltot.tot + CAST(1.0 AS DOUBLE) * voc.v))
       |      * CAST(1000000.0 AS DOUBLE)) AS BIGINT) * dt.nk) AS BIGINT)
       |      AS ll_micros
       |  FROM dt CROSS JOIN (SELECT label FROM dc) l
       |    LEFT JOIN tc ON tc.term = dt.term AND tc.label = l.label
       |    JOIN ltot ON ltot.label = l.label CROSS JOIN voc
       |  GROUP BY 1, 2),
       |test AS (
       |  SELECT doc_id, lang FROM planted WHERE doc_id % 3 = 0),
       |sc AS (
       |  SELECT t.doc_id, t.lang, p.label,
       |    coalesce(ll.ll_micros, 0) + p.prior_micros AS score_micros
       |  FROM test t CROSS JOIN pri p
       |    LEFT JOIN ll ON ll.doc_id = t.doc_id AND ll.label = p.label),
       |rk AS (
       |  SELECT doc_id, lang, label, score_micros,
       |    ROW_NUMBER() OVER (PARTITION BY doc_id
       |      ORDER BY score_micros DESC, label) AS rn,
       |    lead(score_micros, 1) OVER (PARTITION BY doc_id
       |      ORDER BY score_micros DESC, label) AS runner
       |  FROM sc)
       |SELECT doc_id, lang, label AS pred, (label = lang) AS correct,
       |  CAST(score_micros AS BIGINT) AS score_micros,
       |  CAST(score_micros - coalesce(runner, score_micros) AS BIGINT)
       |    AS margin_micros
       |FROM rk WHERE rn = 1 ORDER BY doc_id""".stripMargin
  }

  /** anq2/anq3 shared full-replay oracle (see the map entry
    * comment for the pool-containment argument). */
  private def anq2OracleSql: String =
    """WITH base AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE))
        |    AS v
        |  FROM embeddings
        |  UNION ALL
        |  SELECT 10000 + vec_id * 5 + c,
        |    list_transform(embedding,
        |      x -> CAST(x AS DOUBLE) * (1.0 + 0.001 * (c + 1)))
        |  FROM embeddings, range(0, 5) t(c) WHERE vec_id < 3),
        |wb AS (
        |  SELECT vec_id, v,
        |    sqrt(list_sum(list_transform(range(1, 65), i -> v[i] * v[i])))
        |      AS nv
        |  FROM base),
        |cent AS (
        |  SELECT rn - 1 AS cell, v AS cv, nv AS ncv FROM (
        |    SELECT vec_id, v, nv, row_number() OVER (
        |      ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn
        |    FROM wb WHERE vec_id % 2 = 0)
        |  WHERE rn <= 8),
        |asg AS (
        |  SELECT vec_id, cell FROM (
        |    SELECT w.vec_id, c.cell, row_number() OVER (
        |      PARTITION BY w.vec_id ORDER BY
        |        (list_sum(list_transform(range(1, 65),
        |           i -> w.v[i] * c.cv[i])) / (w.nv * c.ncv)) DESC,
        |        c.cell) AS rn
        |    FROM wb w CROSS JOIN cent c)
        |  WHERE rn = 1),
        |qz AS (
        |  SELECT vec_id, v,
        |    CASE WHEN list_max(list_transform(v, x -> abs(x))) = 0.0
        |      THEN CAST(1.0 AS DOUBLE)
        |      ELSE list_max(list_transform(v, x -> abs(x)))
        |        / CAST(127.0 AS DOUBLE) END AS scale
        |  FROM base),
        |dq AS (
        |  SELECT vec_id,
        |    list_transform(v, x ->
        |      CAST(CAST(round(x / scale) AS TINYINT) AS DOUBLE) * scale)
        |      AS dv
        |  FROM qz),
        |nrm AS (
        |  SELECT vec_id, dv,
        |    sqrt(list_sum(list_transform(range(1, 65),
        |      i -> dv[i] * dv[i]))) AS ndv
        |  FROM dq),
        |q AS (
        |  SELECT vec_id AS qid, v AS qv, nv AS nq FROM wb
        |  WHERE vec_id < 3),
        |pr AS (
        |  SELECT qid, cell FROM (
        |    SELECT q.qid, c.cell, row_number() OVER (
        |      PARTITION BY q.qid ORDER BY
        |        (list_sum(list_transform(range(1, 65),
        |           i -> q.qv[i] * c.cv[i])) / (q.nq * c.ncv)) DESC,
        |        c.cell) AS crank
        |    FROM q CROSS JOIN cent c)
        |  WHERE crank <= 4),
        |sc AS (
        |  SELECT q.qid, e.vec_id,
        |    list_sum(list_transform(range(1, 65), i -> e.dv[i] * q.qv[i]))
        |      / (e.ndv * q.nq) AS cosine
        |  FROM nrm e JOIN asg a USING (vec_id)
        |    CROSS JOIN q
        |    JOIN pr ON pr.qid = q.qid AND pr.cell = a.cell)
        |SELECT qid, CAST(rank AS INTEGER) AS rank, vec_id, cosine FROM (
        |  SELECT qid, vec_id, cosine,
        |    ROW_NUMBER() OVER (PARTITION BY qid
        |      ORDER BY cosine DESC, vec_id) AS rank
        |  FROM sc)
        |WHERE rank <= 5 ORDER BY qid, rank""".stripMargin

  private def nbOracleSql: String =
    """WITH train AS (
        |  SELECT doc_id, source, text FROM documents
        |  WHERE doc_id % 3 <> 0),
        |test AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id % 3 = 0),
        |tc AS (
        |  SELECT label, term, count(*) AS c FROM (
        |    SELECT source AS label,
        |      unnest(string_split_regex(lower(trim(text)), '\s+')) AS term
        |    FROM train) t
        |  WHERE term <> '' GROUP BY 1, 2),
        |ltot AS (
        |  SELECT label, CAST(SUM(c) AS BIGINT) AS tot FROM tc
        |  GROUP BY 1),
        |voc AS (SELECT count(DISTINCT term) AS v FROM tc),
        |dc AS (SELECT source AS label, count(*) AS n_docs FROM train
        |  GROUP BY 1),
        |ndt AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS n_total FROM dc),
        |pri AS (
        |  SELECT label,
        |    CAST(round(ln(CAST(n_docs AS DOUBLE) / n_total)
        |      * CAST(1000000.0 AS DOUBLE)) AS BIGINT) AS prior_micros
        |  FROM dc, ndt),
        |dt AS (
        |  SELECT doc_id, term, count(*) AS nk FROM (
        |    SELECT doc_id,
        |      unnest(string_split_regex(lower(trim(text)), '\s+')) AS term
        |    FROM test) t
        |  WHERE term <> '' GROUP BY 1, 2),
        |ll AS (
        |  SELECT dt.doc_id, l.label,
        |    CAST(SUM(CAST(round(ln(
        |        (coalesce(tc.c, 0) + CAST(1.0 AS DOUBLE))
        |        / (ltot.tot + CAST(1.0 AS DOUBLE) * voc.v))
        |      * CAST(1000000.0 AS DOUBLE)) AS BIGINT) * dt.nk) AS BIGINT)
        |      AS ll_micros
        |  FROM dt CROSS JOIN (SELECT label FROM dc) l
        |    LEFT JOIN tc ON tc.term = dt.term AND tc.label = l.label
        |    JOIN ltot ON ltot.label = l.label CROSS JOIN voc
        |  GROUP BY 1, 2),
        |sc AS (
        |  SELECT t.doc_id, p.label,
        |    coalesce(ll.ll_micros, 0) + p.prior_micros AS score_micros
        |  FROM test t CROSS JOIN pri p
        |    LEFT JOIN ll ON ll.doc_id = t.doc_id AND ll.label = p.label),
        |rk AS (
        |  SELECT doc_id, label, score_micros,
        |    ROW_NUMBER() OVER (PARTITION BY doc_id
        |      ORDER BY score_micros DESC, label) AS rn,
        |    lead(score_micros, 1) OVER (PARTITION BY doc_id
        |      ORDER BY score_micros DESC, label) AS runner
        |  FROM sc)
        |SELECT doc_id, label AS pred,
        |  CAST(score_micros AS BIGINT) AS score_micros,
        |  CAST(score_micros - coalesce(runner, score_micros) AS BIGINT)
        |    AS margin_micros
        |FROM rk WHERE rn = 1 ORDER BY doc_id""".stripMargin

  /** t22/t22b: unigrams, within-doc adjacent pairs, the corpus total,
    * and the PMI arithmetic replayed in the engine's operation order.
    * t22b scores FOLDED half-corpus counts against this same one-shot
    * expectation — additive integer sums make them identical. */
  private def t22OracleSql: String =
    """WITH dx AS (
      |  SELECT doc_id, list_filter(string_split_regex(lower(trim(
      |    coalesce(text, ''))), '\s+'), x -> x <> '') AS ws
      |  FROM documents),
      |tk AS (
      |  SELECT doc_id, i, ws[i] AS w
      |  FROM dx, unnest(generate_series(1, len(ws))) t(i)),
      |uni AS (SELECT w, CAST(count(*) AS BIGINT) AS c FROM tk
      |  GROUP BY 1),
      |tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM tk),
      |pr AS (
      |  SELECT a.w AS w1, b.w AS w2, CAST(count(*) AS BIGINT) AS c12
      |  FROM tk a JOIN tk b ON b.doc_id = a.doc_id AND b.i = a.i + 1
      |  GROUP BY 1, 2
      |  HAVING count(*) >= 5)
      |SELECT p.w1, p.w2, p.c12,
      |  CAST(round(ln((CAST(p.c12 AS DOUBLE) * CAST(t.n AS DOUBLE))
      |    / (CAST(u1.c AS DOUBLE) * CAST(u2.c AS DOUBLE))) * 1e6)
      |    AS BIGINT) AS pmi_micros
      |FROM pr p
      |  JOIN uni u1 ON u1.w = p.w1
      |  JOIN uni u2 ON u2.w = p.w2
      |  CROSS JOIN tot t
      |ORDER BY pmi_micros DESC, w1, w2""".stripMargin

  private def annOracleSql: String =
    """WITH base AS (
      |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE))
      |    AS v
      |  FROM embeddings
      |  UNION ALL
      |  SELECT 10000 + vec_id * 5 + c,
      |    list_transform(embedding,
      |      x -> CAST(x AS DOUBLE) * (1.0 + 0.001 * (c + 1)))
      |  FROM embeddings, range(0, 5) t(c) WHERE vec_id < 3),
      |nrm AS (
      |  SELECT vec_id, v,
      |    sqrt(list_sum(list_transform(range(1, 65), i -> v[i] * v[i])))
      |      AS nv
      |  FROM base),
      |q AS (SELECT vec_id AS qid, v AS qv, nv AS nq FROM nrm
      |  WHERE vec_id < 3),
      |scored AS (
      |  SELECT q.qid, e.vec_id,
      |    list_sum(list_transform(range(1, 65), i -> e.v[i] * q.qv[i]))
      |      / (e.nv * q.nq) AS cosine
      |  FROM nrm e, q)
      |SELECT qid, CAST(rank AS INTEGER) AS rank, vec_id, cosine FROM (
      |  SELECT qid, vec_id, cosine,
      |    ROW_NUMBER() OVER (PARTITION BY qid
      |      ORDER BY cosine DESC, vec_id) AS rank
      |  FROM scored)
      |WHERE rank <= 5 ORDER BY qid, rank""".stripMargin

  def oracles: Map[String, String] = Map(
    "t1_text_analysis" ->
      s"""$featCtes
         |SELECT doc_id, n_tok_ws, n_tok_bpe, punct_ratio, digit_ratio,
         |  mean_tok_len, stopword_ratio,
         |  $qualitySql AS quality,
         |  $langLadderSql AS lang_id
         |FROM feat ORDER BY doc_id""".stripMargin,

    "d3_minhash_pairs" ->
      s"""WITH ${shinglesCte("documents")},
         |pairs AS (
         |  ${jaccardPairsSql(0.7)})
         |SELECT id_a, id_b, jaccard FROM pairs WHERE jaccard >= 0.7
         |ORDER BY id_a, id_b""".stripMargin,

    "d10_containment_pairs" ->
      s"""WITH corpus AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 60000,
         |    array_to_string(string_split_regex(text, '\\s+')[1:40], ' ')
         |  FROM documents WHERE doc_id % 50 = 0 AND text IS NOT NULL),
         |${shinglesCte("corpus")},
         |pairs AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |    round(CAST(len(list_intersect(a.shingles, b.shingles))
         |        AS DOUBLE) / len(a.shingles), 6) AS containment
         |  FROM sh a JOIN sh b ON a.doc_id <> b.doc_id
         |  WHERE len(b.shingles) >= CAST(0.9 * len(a.shingles) AS BIGINT))
         |SELECT id_a, id_b, containment FROM pairs
         |WHERE containment >= 0.9
         |ORDER BY id_a, id_b""".stripMargin,

    // full replay of the index path: md5-60bit shingle hashes, posting
    // lists with the DF cap, bottom-8 probe sampling via ROW_NUMBER
    // over hash order, candidate join, exact verify — then recall vs
    // the brute-force truth on the id_a % 7 stratum
    "d10b_containment_recall" ->
      s"""WITH corpus AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 60000,
         |    array_to_string(string_split_regex(text, '\\s+')[1:40], ' ')
         |  FROM documents WHERE doc_id % 50 = 0 AND text IS NOT NULL),
         |${shinglesCte("corpus")},
         |shh AS (
         |  SELECT doc_id, list_distinct(list_transform(shingles,
         |    s -> CAST('0x' || substr(md5(s), 1, 15) AS BIGINT))) AS hs
         |  FROM sh),
         |post AS (SELECT doc_id, unnest(hs) AS h FROM shh),
         |dfh AS (SELECT h, count(*) AS df FROM post GROUP BY h),
         |nonhot AS (
         |  SELECT p.doc_id, p.h FROM post p JOIN dfh USING (h)
         |  WHERE dfh.df <= 10000),
         |probes AS (
         |  SELECT doc_id AS id_a, h FROM (
         |    SELECT doc_id, h,
         |      ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY h) AS rk
         |    FROM nonhot)
         |  WHERE rk <= 8),
         |cands AS (
         |  SELECT DISTINCT p.id_a, n.doc_id AS id_b
         |  FROM probes p JOIN nonhot n USING (h)
         |  WHERE p.id_a <> n.doc_id),
         |verified AS (
         |  SELECT c.id_a, c.id_b,
         |    round(CAST(len(list_intersect(a.shingles, b.shingles))
         |      AS DOUBLE) / len(a.shingles), 6) AS containment
         |  FROM cands c JOIN sh a ON a.doc_id = c.id_a
         |    JOIN sh b ON b.doc_id = c.id_b),
         |idxp AS (
         |  SELECT id_a, id_b FROM verified
         |  WHERE containment >= 0.9 AND id_a % 7 = 0
         |    AND (id_a < 1000 OR id_a >= 60000)),
         |tpairs AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |    round(CAST(len(list_intersect(a.shingles, b.shingles))
         |      AS DOUBLE) / len(a.shingles), 6) AS containment
         |  FROM sh a JOIN sh b ON a.doc_id <> b.doc_id
         |  WHERE a.doc_id % 7 = 0
         |    AND (a.doc_id < 1000 OR a.doc_id >= 60000)),
         |truth AS (
         |  SELECT id_a, id_b FROM tpairs WHERE containment >= 0.9)
         |SELECT count(*) AS n_true, count(f.id_a) AS n_found,
         |  count(*) - count(f.id_a) AS n_missed,
         |  count(*) = count(f.id_a) AS recall_exact_ok
         |FROM truth t LEFT JOIN idxp f
         |  ON t.id_a = f.id_a AND t.id_b = f.id_b""".stripMargin,

    // seed ids are < 50000 and batch ids >= 50000, so the cross-set
    // near-dups are exactly the combined-corpus pairs straddling 50000
    "d9_incremental_neardup" ->
      s"""WITH combined AS (
         |  SELECT doc_id, text FROM documents WHERE doc_id % 3 <> 2
         |  UNION ALL
         |  SELECT doc_id + 50000, text FROM documents
         |  WHERE doc_id % 3 <> 2 AND doc_id % 5 = 0
         |  UNION ALL
         |  SELECT doc_id + 90000, text FROM documents
         |  WHERE doc_id % 3 = 2),
         |${shinglesCte("combined")},
         |pairs AS (
         |  ${jaccardPairsSql(0.7)})
         |SELECT id_a AS store_id, id_b AS batch_id, jaccard
         |FROM pairs WHERE jaccard >= 0.7
         |  AND id_a < 50000 AND id_b >= 50000
         |ORDER BY store_id, batch_id""".stripMargin,

    // compaction copies rows verbatim, so the post-compaction store
    // answers with the SAME ground truth: brute-force every cross-set
    // pair (store ids < 50000, batch ids >= 50000)
    "d9b_sigstore_compact" ->
      s"""WITH combined AS (
         |  SELECT doc_id, text FROM documents WHERE doc_id % 3 = 0
         |  UNION ALL
         |  SELECT doc_id, text FROM documents WHERE doc_id % 3 = 1
         |  UNION ALL
         |  SELECT doc_id + 20000, text FROM documents
         |  WHERE doc_id % 15 = 0
         |  UNION ALL
         |  SELECT doc_id + 90000, text FROM documents
         |  WHERE doc_id % 3 = 2
         |  UNION ALL
         |  SELECT doc_id + 50000, text FROM documents
         |  WHERE doc_id % 15 = 0),
         |${shinglesCte("combined")},
         |pairs AS (
         |  ${jaccardPairsSql(0.7)})
         |SELECT id_a AS store_id, id_b AS batch_id, jaccard
         |FROM pairs WHERE jaccard >= 0.7
         |  AND id_a < 50000 AND id_b >= 50000
         |ORDER BY store_id, batch_id""".stripMargin,

    "d4_simhash_pairs" -> d4OracleSql,

    "d5_embedding_dups" ->
      """WITH base AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE))
        |    AS v
        |  FROM embeddings
        |  UNION ALL
        |  SELECT vec_id + 10000,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE) * 1.001)
        |  FROM embeddings WHERE vec_id % 10 = 0),
        |nrm AS (
        |  SELECT vec_id, v,
        |    sqrt(list_sum(list_transform(range(1, 65), i -> v[i] * v[i])))
        |      AS nv
        |  FROM base),
        |pairs AS (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |    list_sum(list_transform(range(1, 65), i -> a.v[i] * b.v[i]))
        |      / (a.nv * b.nv) AS cosine
        |  FROM nrm a JOIN nrm b ON a.vec_id < b.vec_id)
        |SELECT id_a, id_b, cosine FROM pairs WHERE cosine >= 0.999
        |ORDER BY id_a, id_b""".stripMargin,

    "d11_semantic_dedup" ->
      """WITH base AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE))
        |    AS v
        |  FROM embeddings
        |  UNION ALL
        |  SELECT vec_id + 10000,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE) * 0.5)
        |  FROM embeddings WHERE vec_id < 10),
        |nrm AS (
        |  SELECT vec_id, v,
        |    sqrt(list_sum(list_transform(range(1, 65), i -> v[i] * v[i])))
        |      AS nv
        |  FROM base),
        |cents AS (
        |  SELECT vec_id AS cell,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
        |  FROM embeddings WHERE vec_id < 4),
        |cnrm AS (
        |  SELECT cell, cv,
        |    sqrt(list_sum(list_transform(range(1, 65), i -> cv[i] * cv[i])))
        |      AS nc
        |  FROM cents),
        |asg AS (
        |  SELECT vec_id, v, nv, cell FROM (
        |    SELECT b.vec_id, b.v, b.nv, c.cell,
        |      ROW_NUMBER() OVER (PARTITION BY b.vec_id ORDER BY
        |        list_sum(list_transform(range(1, 65), i -> b.v[i] * c.cv[i]))
        |          / (b.nv * c.nc) DESC, c.cell) AS rn
        |    FROM nrm b CROSS JOIN cnrm c) t WHERE rn = 1),
        |losers AS (
        |  SELECT DISTINCT y.vec_id FROM asg x JOIN asg y
        |    ON x.cell = y.cell AND x.vec_id < y.vec_id
        |  WHERE list_sum(list_transform(range(1, 65), i -> x.v[i] * y.v[i]))
        |    / (x.nv * y.nv) >= 0.99)
        |SELECT a.vec_id, a.cell, (l.vec_id IS NULL) AS keep
        |FROM asg a LEFT JOIN losers l ON a.vec_id = l.vec_id
        |ORDER BY a.vec_id""".stripMargin,

    // the d11 replay with rank <= 2 MEMBERSHIPS feeding the loser join
    // and the rank-1 row as the output cell
    "d11b_semantic_multiprobe" ->
      """WITH base AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE))
        |    AS v
        |  FROM embeddings
        |  UNION ALL
        |  SELECT vec_id + 10000,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE) * 0.5)
        |  FROM embeddings WHERE vec_id < 10),
        |nrm AS (
        |  SELECT vec_id, v,
        |    sqrt(list_sum(list_transform(range(1, 65), i -> v[i] * v[i])))
        |      AS nv
        |  FROM base),
        |cents AS (
        |  SELECT vec_id AS cell,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
        |  FROM embeddings WHERE vec_id < 4),
        |cnrm AS (
        |  SELECT cell, cv,
        |    sqrt(list_sum(list_transform(range(1, 65), i -> cv[i] * cv[i])))
        |      AS nc
        |  FROM cents),
        |mem AS (
        |  SELECT vec_id, v, nv, cell, rn FROM (
        |    SELECT b.vec_id, b.v, b.nv, c.cell,
        |      ROW_NUMBER() OVER (PARTITION BY b.vec_id ORDER BY
        |        list_sum(list_transform(range(1, 65), i -> b.v[i] * c.cv[i]))
        |          / (b.nv * c.nc) DESC, c.cell) AS rn
        |    FROM nrm b CROSS JOIN cnrm c) t WHERE rn <= 2),
        |losers AS (
        |  SELECT DISTINCT y.vec_id FROM mem x JOIN mem y
        |    ON x.cell = y.cell AND x.vec_id < y.vec_id
        |  WHERE list_sum(list_transform(range(1, 65), i -> x.v[i] * y.v[i]))
        |    / (x.nv * y.nv) >= 0.99)
        |SELECT a.vec_id, a.cell, (l.vec_id IS NULL) AS keep
        |FROM (SELECT vec_id, cell FROM mem WHERE rn = 1) a
        |LEFT JOIN losers l ON a.vec_id = l.vec_id
        |ORDER BY a.vec_id""".stripMargin,

    "d12_repeated_spans" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS ws
        |  FROM documents WHERE text IS NOT NULL),
        |grams AS (
        |  SELECT doc_id, i - 1 AS pos,
        |    array_to_string(ws[i : i + 7], ' ') AS gram
        |  FROM toks, unnest(generate_series(1, len(ws) - 7)) AS t(i)),
        |rep AS (
        |  SELECT doc_id, pos FROM grams
        |  WHERE gram IN (
        |    SELECT gram FROM grams GROUP BY gram HAVING count(*) >= 2)),
        |flags AS (
        |  SELECT doc_id, pos,
        |    CASE WHEN pos - LAG(pos) OVER (
        |        PARTITION BY doc_id ORDER BY pos) <= 8
        |      THEN 0 ELSE 1 END AS is_new
        |  FROM rep),
        |runs AS (
        |  SELECT doc_id, pos,
        |    SUM(is_new) OVER (PARTITION BY doc_id ORDER BY pos
        |      ROWS UNBOUNDED PRECEDING) AS run
        |  FROM flags)
        |SELECT doc_id, MIN(pos) AS span_start, MAX(pos) + 7 AS span_end,
        |  count(*) AS n_windows
        |FROM runs GROUP BY doc_id, run
        |ORDER BY doc_id, span_start""".stripMargin,

    "cu12_model_score" ->
      s"""$featCtes
         |SELECT doc_id, $modelLogitSql AS logit,
         |  $modelLogitSql > 0.0 AS is_kept
         |FROM feat ORDER BY doc_id""".stripMargin,

    "ann2_ivf_topk" -> annOracleSql,
    "ann3_lsh_topk" -> annOracleSql,
    "ann4_pq_topk" -> annOracleSql,
    "ann5_store_topk" -> annOracleSql,

    // ann6: full replay of the seeded-store drift monitor — centroid
    // selection by (md5(id), id), argmax-cosine cell assignment, the
    // (cosine DESC, cell) probe ranking at nprobe=4, exact and
    // cell-pruned within-batch top-5, and the micro-averaged per-batch
    // recall with the r10 invariant booleans. Cosines use the
    // bit-exact recipe every ann oracle shares.
    "ann6_recall_monitor" ->
      """WITH base AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE))
        |    AS v
        |  FROM embeddings
        |  UNION ALL
        |  SELECT 10000 + vec_id * 5 + c,
        |    list_transform(embedding,
        |      x -> CAST(x AS DOUBLE) * (1.0 + 0.001 * (c + 1)))
        |  FROM embeddings, range(0, 5) t(c) WHERE vec_id < 3),
        |wb AS (
        |  SELECT vec_id, v,
        |    sqrt(list_sum(list_transform(range(1, 65), i -> v[i] * v[i])))
        |      AS nv,
        |    CASE WHEN vec_id % 2 = 0 THEN 'seed' ELSE 'b1' END AS b
        |  FROM base),
        |cent AS (
        |  SELECT rn - 1 AS cell, v AS cv, nv AS ncv FROM (
        |    SELECT vec_id, v, nv, row_number() OVER (
        |      ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn
        |    FROM wb WHERE b = 'seed')
        |  WHERE rn <= 8),
        |asg AS (
        |  SELECT vec_id, cell FROM (
        |    SELECT w.vec_id, c.cell, row_number() OVER (
        |      PARTITION BY w.vec_id ORDER BY
        |        (list_sum(list_transform(range(1, 65),
        |           i -> w.v[i] * c.cv[i])) / (w.nv * c.ncv)) DESC,
        |        c.cell) AS rn
        |    FROM wb w CROSS JOIN cent c)
        |  WHERE rn = 1),
        |q AS (
        |  SELECT vec_id AS qid, v AS qv, nv AS nq FROM wb
        |  WHERE md5(CAST(vec_id AS VARCHAR)) < '19a'),
        |pr AS (
        |  SELECT qid, cell FROM (
        |    SELECT q.qid, c.cell, row_number() OVER (
        |      PARTITION BY q.qid ORDER BY
        |        (list_sum(list_transform(range(1, 65),
        |           i -> q.qv[i] * c.cv[i])) / (q.nq * c.ncv)) DESC,
        |        c.cell) AS crank
        |    FROM q CROSS JOIN cent c)
        |  WHERE crank <= 4),
        |sc AS (
        |  SELECT w.b, q.qid, w.vec_id, a.cell,
        |    list_sum(list_transform(range(1, 65), i -> w.v[i] * q.qv[i]))
        |      / (w.nv * q.nq) AS cosine
        |  FROM wb w JOIN asg a USING (vec_id) CROSS JOIN q),
        |ex AS (
        |  SELECT b, qid, vec_id FROM (
        |    SELECT b, qid, vec_id, row_number() OVER (
        |      PARTITION BY b, qid ORDER BY cosine DESC, vec_id) AS rn
        |    FROM sc)
        |  WHERE rn <= 5),
        |ap AS (
        |  SELECT b, qid, vec_id FROM (
        |    SELECT s.b, s.qid, s.vec_id, row_number() OVER (
        |      PARTITION BY s.b, s.qid ORDER BY s.cosine DESC, s.vec_id)
        |      AS rn
        |    FROM sc s JOIN pr ON pr.qid = s.qid AND pr.cell = s.cell)
        |  WHERE rn <= 5),
        |pq AS (
        |  SELECT ex.b, ex.qid, count(*) AS n_true,
        |    CAST(coalesce(sum(CASE WHEN ap.vec_id IS NOT NULL
        |      THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_hit
        |  FROM ex LEFT JOIN ap USING (b, qid, vec_id)
        |  GROUP BY 1, 2),
        |agg AS (
        |  SELECT b AS batch, CAST(count(*) AS BIGINT) AS n_queries,
        |    CAST(sum(n_true) AS BIGINT) AS n_true,
        |    CAST(sum(n_hit) AS BIGINT) AS n_hit
        |  FROM pq GROUP BY 1)
        |SELECT batch, n_queries, n_true, n_hit,
        |  CAST(n_hit AS DOUBLE) / n_true AS recall_at_k,
        |  (n_queries > 0 AND n_true > 0 AND n_true <= n_queries * 5
        |    AND n_hit BETWEEN 0 AND n_true) AS counts_consistent,
        |  ((CAST(n_hit AS DOUBLE) / n_true) BETWEEN 0.0 AND 1.0
        |    AND (CAST(n_hit AS DOUBLE) / n_true)
        |      = CAST(n_hit AS DOUBLE) / n_true) AS recall_in_bounds
        |FROM agg ORDER BY batch""".stripMargin,

    "c1_corpus_clean" ->
      s"""$featCtes,
         |ann AS (
         |  SELECT doc_id, text,
         |    $qualitySql AS quality,
         |    $langLadderSql AS lang_id
         |  FROM feat),
         |kept AS (
         |  SELECT doc_id, text FROM ann
         |  WHERE lang_id IN ('en', 'und') AND quality >= 0.3),
         |hashed AS (
         |  SELECT doc_id, text,
         |    md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS h
         |  FROM kept),
         |survivors AS (
         |  SELECT doc_id, text FROM hashed
         |  QUALIFY ROW_NUMBER() OVER (PARTITION BY h ORDER BY doc_id) = 1),
         |${shinglesCte("survivors")},
         |losers AS (
         |  SELECT DISTINCT id_b FROM (
         |  ${jaccardPairsSql(0.8)})
         |  WHERE jaccard >= 0.8)
         |SELECT (SELECT COUNT(*) FROM documents) AS input,
         |  (SELECT COUNT(*) FROM kept) AS after_lang_quality,
         |  (SELECT COUNT(*) FROM survivors) AS after_exact_dedup,
         |  (SELECT COUNT(*) FROM survivors) - (SELECT COUNT(*) FROM losers)
         |    AS after_near_dedup""".stripMargin,

    // c2: the cu14 (C4), t10 (Gopher), and t11 (bigram LM) recomputes
    // chained over the planted corpus — C4's clean text feeds Gopher's
    // metrics, Gopher's pass set feeds the LM doc side, the LM trains
    // on the raw planted src0 slice. The gopher/LM chains are the
    // shared OracleFragments copies; the interpolated constants are
    // the gate's Scala doubles.
    "c2_quality_gate" ->
      s"""WITH rdocs AS (
         |  SELECT doc_id, source,
         |    replace(text, ' value ', '.' || chr(10)) || '.' || chr(10)
         |      || 'of the data and that batch have with be to end.' AS text
         |  FROM documents),
         |$qualityGateChainSql""".stripMargin,

    // c3: the c2 quality chain fed by the raw-web FRONT — the HTML wrap
    // is built so extraction PRODUCES c2's planted sentence structure
    // (" value " → ".</p><p>" → ".\n" lines), then the blocklist legs
    // (domain derived independently from the construction; lexicon
    // fraction over the EXTRACTED tokens) gate what reaches C4. The
    // shared chain fragment means c2 and c3 cannot drift.
    "c3_web_pipeline" -> {
      s"""WITH h AS (
         |  SELECT doc_id, source,
         |    source || CAST(doc_id % 7 AS VARCHAR) || '.com' AS domain,
         |    '<html><body><p>'
         |    || replace(coalesce(text, ''), ' value ', '.</p><p>')
         |    || '.</p><p>of the data and that batch have with be to '
         |    || 'end.</p></body></html>' AS html
         |  FROM documents),
         |${OracleFragments.htmlStripCtes("h", "html",
              Seq("source", "domain"))},
         |blkm AS (
         |  SELECT doc_id, source, domain, clean,
         |    list_filter(string_split_regex(lower(trim(clean)), '\\s+'),
         |      x -> x <> '') AS ws
         |  FROM hclean),
         |rdocs AS (
         |  SELECT doc_id, source, clean AS text FROM (
         |    SELECT doc_id, source, clean,
         |      domain IN ('src03.com', 'src12.com') AS db,
         |      len(list_filter(ws,
         |        w -> list_contains(['slow', 'big', 'merge'], w))) AS bh,
         |      len(ws) AS wc
         |    FROM blkm) t
         |  WHERE NOT (db OR (CASE WHEN wc = 0 THEN 0.0
         |    ELSE round(CAST(bh AS DOUBLE) / wc, 6) END) > 0.08)),
         |$qualityGateChainSql""".stripMargin
    },

    "t2_fingerprint" ->
      """WITH alldocs AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 20000, text || ' héllo wörld ₹42 中文 😀'
        |  FROM documents WHERE doc_id % 50 = 0),
        |n AS (
        |  SELECT doc_id,
        |    regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS t
        |  FROM alldocs)
        |SELECT doc_id,
        |  list_reduce(
        |    list_prepend(CAST(7 AS BIGINT),
        |      list_transform(range(1, length(t) + 1),
        |        i -> CAST(unicode(t[i]) AS BIGINT))),
        |    (acc, c) -> (acc * 131 + c) % 1000000007) AS fingerprint
        |FROM n ORDER BY doc_id""".stripMargin,

    // integer bigram entropy replayed exactly: the same per-distinct-
    // bigram round(ln·1e6), integer multiply/sum, and floor divides
    "t5b_entropy_signal" ->
      """WITH input AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000000,
        |    repeat('repeat ', 49) || 'repeat' AS text
        |  FROM documents WHERE doc_id % 100 = 0),
        |grams AS (
        |  SELECT doc_id, coalesce(text, '')[i:i+1] AS g
        |  FROM input,
        |    unnest(generate_series(1,
        |      length(coalesce(text, '')) - 1)) t(i)
        |  WHERE length(coalesce(text, '')) >= 2),
        |counts AS (
        |  SELECT doc_id, g, CAST(count(*) AS BIGINT) AS c
        |  FROM grams GROUP BY 1, 2),
        |tot AS (
        |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS tt,
        |    CAST(count(*) AS BIGINT) AS dg
        |  FROM counts GROUP BY 1),
        |ent AS (
        |  SELECT c.doc_id,
        |    max(t.tt) AS n_bigrams,
        |    max(t.dg) AS distinct_bigrams,
        |    CAST(sum(c.c * CAST(round(ln(CAST(t.tt AS DOUBLE) / c.c)
        |        * 1e6) AS BIGINT)) // max(t.tt) AS BIGINT) AS entropy_mu,
        |    max(t.dg) * 1000000 // max(t.tt) AS distinct_ratio_ppm
        |  FROM counts c JOIN tot t USING (doc_id) GROUP BY 1)
        |SELECT i.doc_id,
        |  coalesce(e.n_bigrams, 0) AS n_bigrams,
        |  coalesce(e.distinct_bigrams, 0) AS distinct_bigrams,
        |  coalesce(e.entropy_mu, 0) AS entropy_mu,
        |  coalesce(e.distinct_ratio_ppm, 0) AS distinct_ratio_ppm
        |FROM input i LEFT JOIN ent e USING (doc_id)
        |ORDER BY i.doc_id""".stripMargin,

    "d1_exact_dedup" ->
      """WITH alldocs AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 10000,
        |    '  ' || upper(replace(text, ' ', '   '))
        |  FROM documents WHERE doc_id % 7 = 0),
        |hashed AS (
        |  SELECT doc_id,
        |    md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))
        |      AS content_hash
        |  FROM alldocs)
        |SELECT doc_id, content_hash,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY content_hash ORDER BY doc_id)
        |    AS INTEGER) AS dup_rank,
        |  ROW_NUMBER() OVER (PARTITION BY content_hash ORDER BY doc_id) > 1
        |    AS is_duplicate
        |FROM hashed ORDER BY doc_id""".stripMargin,

    "d2_jaccard_kernel" ->
      """WITH sh AS (
        |  SELECT doc_id,
        |    list_distinct(list_transform(
        |      range(1, len(string_split_regex(lower(trim(text)), '\s+')) - 1),
        |      i -> string_split_regex(lower(trim(text)), '\s+')[i] || ' ' ||
        |           string_split_regex(lower(trim(text)), '\s+')[i+1] || ' ' ||
        |           string_split_regex(lower(trim(text)), '\s+')[i+2]))
        |      AS shingles
        |  FROM documents)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  round(CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
        |    / len(list_distinct(list_concat(a.shingles, b.shingles))), 6)
        |    AS jaccard
        |FROM sh a JOIN sh b ON b.doc_id = a.doc_id + 1
        |WHERE a.doc_id % 5 = 0
        |ORDER BY id_a""".stripMargin,

    // unigrams, within-doc adjacent pairs, corpus total, and the PMI
    // arithmetic in the engine's operation order
    "t22_collocations" -> t22OracleSql,

    // folded counts ≡ one-shot counts (additive integers): the same
    // full-recompute expectation pins the incremental path
    "t22b_incremental_pmi" -> t22OracleSql,

    // hashed embeddings from first principles: both md5 draws, the
    // 16-cell spine, the L2 fold, then the ann1 cosine-ranking replay
    "emb1_hash_embed" ->
      """WITH dx AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(trim(
        |    coalesce(text, ''))), '\s+'), x -> x <> '') AS ws
        |  FROM documents),
        |tk AS (
        |  SELECT doc_id, ws[i] AS w
        |  FROM dx, unnest(generate_series(1, len(ws))) t(i)),
        |ft AS (
        |  SELECT doc_id,
        |    CAST('0x' || substr(md5('heb|he|' || w), 1, 8) AS BIGINT)
        |      % 16 AS b,
        |    CASE WHEN CAST('0x' || substr(md5('hes|he|' || w), 1, 8)
        |        AS BIGINT) % 2 = 0 THEN 1 ELSE -1 END AS s
        |  FROM tk),
        |cl AS (SELECT doc_id, b, SUM(s) AS c FROM ft GROUP BY 1, 2),
        |spine AS (
        |  SELECT doc_id, i AS b
        |  FROM (SELECT DISTINCT doc_id FROM documents),
        |    unnest(generate_series(0, 15)) t(i)),
        |rawv AS (
        |  SELECT s.doc_id,
        |    list(CAST(coalesce(c.c, 0) AS DOUBLE) ORDER BY s.b) AS raw
        |  FROM spine s LEFT JOIN cl c
        |    ON c.doc_id = s.doc_id AND c.b = s.b
        |  GROUP BY s.doc_id),
        |emb AS (
        |  SELECT doc_id,
        |    CASE WHEN sqrt(list_sum(list_transform(raw, x -> x * x)))
        |        > CAST(0 AS DOUBLE)
        |      THEN list_transform(raw, x -> x / sqrt(list_sum(
        |        list_transform(raw, y -> y * y))))
        |      ELSE raw END AS e
        |  FROM rawv),
        |q AS (
        |  SELECT doc_id AS qid, e AS qv FROM emb WHERE doc_id % 97 = 0),
        |scored AS (
        |  SELECT q.qid, emb.doc_id,
        |    list_sum(list_transform(range(1, 17),
        |      i -> CAST(emb.e[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE)))
        |    / (sqrt(list_sum(list_transform(range(1, 17),
        |        i -> CAST(emb.e[i] AS DOUBLE)
        |           * CAST(emb.e[i] AS DOUBLE))))
        |     * sqrt(list_sum(list_transform(range(1, 17),
        |        i -> CAST(q.qv[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE)))))
        |      AS cosine
        |  FROM emb, q)
        |SELECT qid, CAST(rank AS INTEGER) AS rank, doc_id, cosine FROM (
        |  SELECT qid, doc_id, cosine,
        |    ROW_NUMBER() OVER (PARTITION BY qid
        |      ORDER BY cosine DESC, doc_id) AS rank
        |  FROM scored)
        |WHERE rank <= 4 ORDER BY qid, rank""".stripMargin,

    "ann1_bruteforce_topk" ->
      """WITH q AS (
        |  SELECT vec_id AS qid, embedding AS qv FROM embeddings
        |  WHERE vec_id < 3),
        |scored AS (
        |  SELECT q.qid, e.vec_id,
        |    list_sum(list_transform(range(1, 65),
        |      i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE)))
        |    / (sqrt(list_sum(list_transform(range(1, 65),
        |        i -> CAST(e.embedding[i] AS DOUBLE)
        |           * CAST(e.embedding[i] AS DOUBLE))))
        |     * sqrt(list_sum(list_transform(range(1, 65),
        |        i -> CAST(q.qv[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE)))))
        |      AS cosine
        |  FROM embeddings e, q)
        |SELECT qid, CAST(rank AS INTEGER) AS rank, vec_id, cosine FROM (
        |  SELECT qid, vec_id, cosine,
        |    ROW_NUMBER() OVER (PARTITION BY qid
        |      ORDER BY cosine DESC, vec_id) AS rank
        |  FROM scored)
        |WHERE rank <= 5 ORDER BY qid, rank""".stripMargin,

    // full independent replay of BOTH legs and the fusion: BM25 CTEs as
    // in t8 (depth 10), cosine CTEs as in ann1 (depth 10), RRF as exact
    // integer micros, final (score DESC, id ASC) window
    "hy1_hybrid_rrf" -> {
      val k1 = 1.2; val b = 0.75
      val c1 = (k1 + 1.0).toString; val c2 = k1.toString
      val c3 = (1.0 - b).toString; val c4 = b.toString
      s"""WITH tf AS (
         |  SELECT doc_id, term, count(*) AS tf FROM (
         |    SELECT doc_id,
         |      unnest(string_split_regex(lower(trim(text)), '\\s+')) AS term
         |    FROM documents) t
         |  WHERE term <> '' GROUP BY doc_id, term),
         |dl AS (SELECT doc_id, SUM(tf) AS dl FROM tf GROUP BY doc_id),
         |dfx AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
         |g AS (SELECT
         |  (SELECT CAST(SUM(dl) AS DOUBLE) FROM dl)
         |    / (SELECT count(*) FROM documents) AS avgdl,
         |  (SELECT count(*) FROM documents) AS n_docs),
         |q AS (
         |  SELECT doc_id AS qid,
         |    array_to_string(
         |      string_split_regex(lower(trim(text)), '\\s+')[1:5], ' ')
         |      AS qtext
         |  FROM documents WHERE doc_id < 3),
         |qt AS (
         |  SELECT DISTINCT qid, term FROM (
         |    SELECT qid,
         |      unnest(string_split_regex(lower(trim(qtext)), '\\s+')) AS term
         |    FROM q) t
         |  WHERE term <> ''),
         |sc_lex AS (
         |  SELECT qt.qid, tf.doc_id,
         |    SUM(CAST(round(
         |      ln((g.n_docs - dfx.df + CAST(0.5 AS DOUBLE))
         |         / (dfx.df + CAST(0.5 AS DOUBLE)) + CAST(1.0 AS DOUBLE))
         |      * (tf.tf * CAST($c1 AS DOUBLE))
         |      / (tf.tf + CAST($c2 AS DOUBLE) * (CAST($c3 AS DOUBLE)
         |         + CAST($c4 AS DOUBLE) * dl.dl / g.avgdl))
         |      * CAST(1000000.0 AS DOUBLE)) AS BIGINT)) AS sm
         |  FROM qt JOIN tf USING (term) JOIN dfx USING (term)
         |    JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN g
         |  GROUP BY 1, 2),
         |lex AS (
         |  SELECT qid, doc_id, rank FROM (
         |    SELECT qid, doc_id, ROW_NUMBER() OVER (PARTITION BY qid
         |      ORDER BY sm DESC, doc_id) AS rank FROM sc_lex)
         |  WHERE rank <= 10),
         |qv AS (
         |  SELECT vec_id AS qid, embedding AS qv FROM embeddings
         |  WHERE vec_id < 3),
         |sc_sem AS (
         |  SELECT qv.qid, e.vec_id,
         |    list_sum(list_transform(range(1, 65),
         |      i -> CAST(e.embedding[i] AS DOUBLE) * CAST(qv.qv[i] AS DOUBLE)))
         |    / (sqrt(list_sum(list_transform(range(1, 65),
         |        i -> CAST(e.embedding[i] AS DOUBLE)
         |           * CAST(e.embedding[i] AS DOUBLE))))
         |     * sqrt(list_sum(list_transform(range(1, 65),
         |        i -> CAST(qv.qv[i] AS DOUBLE) * CAST(qv.qv[i] AS DOUBLE)))))
         |      AS cosine
         |  FROM embeddings e, qv),
         |sem AS (
         |  SELECT qid, vec_id AS doc_id, rank FROM (
         |    SELECT qid, vec_id, ROW_NUMBER() OVER (PARTITION BY qid
         |      ORDER BY cosine DESC, vec_id) AS rank FROM sc_sem)
         |  WHERE rank <= 10),
         |fused AS (
         |  SELECT qid, doc_id,
         |    SUM(CAST(round(CAST(1000000.0 AS DOUBLE) / (60 + rank))
         |      AS BIGINT)) AS score_micros
         |  FROM (SELECT * FROM lex UNION ALL SELECT * FROM sem)
         |  GROUP BY 1, 2)
         |SELECT qid, CAST(rank AS INTEGER) AS rank, doc_id,
         |  score_micros / CAST(1000000.0 AS DOUBLE) AS score
         |FROM (SELECT qid, doc_id, score_micros,
         |  ROW_NUMBER() OVER (PARTITION BY qid
         |    ORDER BY score_micros DESC, doc_id) AS rank FROM fused)
         |WHERE rank <= 5 ORDER BY qid, rank""".stripMargin
    },

    // nb1/nb2: full independent replay — recount the model, re-derive
    // priors/totals/vocabulary, replay the add-alpha smoothed log
    // probabilities at integer-micro precision, re-run the argmax
    // window with the (score DESC, label ASC) tie-break. nb2 scores
    // against FOLDED incremental counts; additive integers make that
    // bit-identical to this one-shot expectation.
    "nb1_source_classifier" -> nbOracleSql,
    "nb2_incremental_nb" -> nbOracleSql,
    "lang1_learned_langid" -> lang1OracleSql,

    // anq1: scales, int8 codes, reconstruction, and the ranking all
    // recomputed; round() is half-away on both engines and the code
    // transform is the identical IEEE expression shape
    "anq1_int8_topk" ->
      """WITH base AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE))
        |    AS v
        |  FROM embeddings),
        |qz AS (
        |  SELECT vec_id, v,
        |    CASE WHEN list_max(list_transform(v, x -> abs(x))) = 0.0
        |      THEN CAST(1.0 AS DOUBLE)
        |      ELSE list_max(list_transform(v, x -> abs(x)))
        |        / CAST(127.0 AS DOUBLE) END AS scale
        |  FROM base),
        |dq AS (
        |  SELECT vec_id,
        |    list_transform(v, x ->
        |      CAST(CAST(round(x / scale) AS TINYINT) AS DOUBLE) * scale)
        |      AS dv
        |  FROM qz),
        |nrm AS (
        |  SELECT vec_id, dv,
        |    sqrt(list_sum(list_transform(range(1, 65),
        |      i -> dv[i] * dv[i]))) AS ndv
        |  FROM dq),
        |q AS (
        |  SELECT vec_id AS qid, v AS qv,
        |    sqrt(list_sum(list_transform(range(1, 65),
        |      i -> v[i] * v[i]))) AS nq
        |  FROM base WHERE vec_id < 3),
        |scored AS (
        |  SELECT q.qid, e.vec_id,
        |    list_sum(list_transform(range(1, 65),
        |      i -> e.dv[i] * q.qv[i])) / (e.ndv * q.nq) AS cosine
        |  FROM nrm e, q)
        |SELECT qid, CAST(rank AS INTEGER) AS rank, vec_id, cosine FROM (
        |  SELECT qid, vec_id, cosine,
        |    ROW_NUMBER() OVER (PARTITION BY qid
        |      ORDER BY cosine DESC, vec_id) AS rank
        |  FROM scored)
        |WHERE rank <= 5 ORDER BY qid, rank""".stripMargin,

    // anq2: the int8 STORE lifecycle — ann6's seeded-centroid pick +
    // full-precision assignment + probe ranking, composed with anq1's
    // quantize→dequantize replay on the stored side; queries stay full
    // precision (asymmetric search).
    // anq3 shares it VERBATIM: topKPq's exact rerank over the
    // 50-candidate PQ pool provably returns the pruned brute-force
    // top-5 (the planted copies' stage-1 LUT scores sit within PQ
    // quantization error of the query's own — far above the cos ≲ 0.35
    // background — so the pool contains the true top-5; ann4's
    // argument, unchanged by int8 storage because codes are assigned
    // from full-precision vectors at write time).
    "anq2_int8_store" -> anq2OracleSql,
    "anq3_int8_pq" -> anq2OracleSql,
    // anq4: identical expectation again — compaction copies stored
    // rows verbatim, so the compacted store must answer exactly what
    // the batch-dir store answered (b1 ∪ b2 ≡ anq2's single b1: both
    // are "every odd vector appended under the frozen quantizers")
    "anq4_compacted_store" -> anq2OracleSql,

    // rp1: the sign matrix rebuilt from md5 parity, each projection a
    // left-to-right list_sum over the signed products scaled by the
    // SAME Scala double the engine folds (1/sqrt(16) = 0.25 exactly),
    // then the shared bit-exact cosine + ranking
    "rp1_random_projection" ->
      s"""WITH base AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE))
        |    AS v
        |  FROM embeddings),
        |sgn AS (
        |  SELECT j, i,
        |    CASE WHEN substr(md5('rp1:' || j || ':' || i), 1, 1)
        |        IN ('0','2','4','6','8','a','c','e')
        |      THEN CAST(1.0 AS DOUBLE) ELSE CAST(-1.0 AS DOUBLE)
        |    END AS s
        |  FROM range(0, 16) t1(j), range(0, 64) t2(i)),
        |sgl AS (
        |  SELECT j, list(s ORDER BY i) AS sl FROM sgn GROUP BY j),
        |pj AS (
        |  SELECT b.vec_id, g.j,
        |    list_sum(list_transform(range(1, 65), i -> b.v[i] * g.sl[i]))
        |      * CAST(${1.0 / math.sqrt(16.0)} AS DOUBLE) AS y
        |  FROM base b CROSS JOIN sgl g),
        |pv AS (
        |  SELECT vec_id, list(y ORDER BY j) AS p FROM pj GROUP BY 1),
        |nrm AS (
        |  SELECT vec_id, p,
        |    sqrt(list_sum(list_transform(range(1, 17), i -> p[i] * p[i])))
        |      AS np
        |  FROM pv),
        |q AS (
        |  SELECT vec_id AS qid, p AS qp, np AS nq FROM nrm
        |  WHERE vec_id < 3),
        |scored AS (
        |  SELECT q.qid, e.vec_id,
        |    list_sum(list_transform(range(1, 17), i -> e.p[i] * q.qp[i]))
        |      / (e.np * q.nq) AS cosine
        |  FROM nrm e, q)
        |SELECT qid, CAST(rank AS INTEGER) AS rank, vec_id, cosine FROM (
        |  SELECT qid, vec_id, cosine,
        |    ROW_NUMBER() OVER (PARTITION BY qid
        |      ORDER BY cosine DESC, vec_id) AS rank
        |  FROM scored)
        |WHERE rank <= 5 ORDER BY qid, rank""".stripMargin,

    // rp2: rp1's projection CTEs, the projected top-20 pool, then the
    // exact-cosine rerank in the original space — both stages replayed
    "rp2_project_rerank" ->
      s"""WITH base AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE))
        |    AS v
        |  FROM embeddings),
        |sgn AS (
        |  SELECT j, i,
        |    CASE WHEN substr(md5('rp1:' || j || ':' || i), 1, 1)
        |        IN ('0','2','4','6','8','a','c','e')
        |      THEN CAST(1.0 AS DOUBLE) ELSE CAST(-1.0 AS DOUBLE)
        |    END AS s
        |  FROM range(0, 16) t1(j), range(0, 64) t2(i)),
        |sgl AS (
        |  SELECT j, list(s ORDER BY i) AS sl FROM sgn GROUP BY j),
        |pj AS (
        |  SELECT b.vec_id, g.j,
        |    list_sum(list_transform(range(1, 65), i -> b.v[i] * g.sl[i]))
        |      * CAST(${1.0 / math.sqrt(16.0)} AS DOUBLE) AS y
        |  FROM base b CROSS JOIN sgl g),
        |pv AS (
        |  SELECT vec_id, list(y ORDER BY j) AS p FROM pj GROUP BY 1),
        |nrm AS (
        |  SELECT vec_id, p,
        |    sqrt(list_sum(list_transform(range(1, 17), i -> p[i] * p[i])))
        |      AS np
        |  FROM pv),
        |bn AS (
        |  SELECT vec_id, v,
        |    sqrt(list_sum(list_transform(range(1, 65), i -> v[i] * v[i])))
        |      AS nv
        |  FROM base),
        |qp AS (
        |  SELECT vec_id AS qid, p AS qp, np AS nqp FROM nrm
        |  WHERE vec_id < 3),
        |qb AS (
        |  SELECT vec_id AS qid, v AS qv, nv AS nq FROM bn
        |  WHERE vec_id < 3),
        |c20 AS (
        |  SELECT qid, vec_id FROM (
        |    SELECT q.qid, e.vec_id, row_number() OVER (
        |      PARTITION BY q.qid ORDER BY
        |        (list_sum(list_transform(range(1, 17),
        |           i -> e.p[i] * q.qp[i])) / (e.np * q.nqp)) DESC,
        |        e.vec_id) AS rn
        |    FROM nrm e, qp q)
        |  WHERE rn <= 20),
        |rr AS (
        |  SELECT c.qid, c.vec_id,
        |    list_sum(list_transform(range(1, 65), i -> b.v[i] * q.qv[i]))
        |      / (b.nv * q.nq) AS cosine
        |  FROM c20 c JOIN bn b USING (vec_id)
        |    JOIN qb q ON q.qid = c.qid)
        |SELECT qid, CAST(rank AS INTEGER) AS rank, vec_id, cosine FROM (
        |  SELECT qid, vec_id, cosine,
        |    ROW_NUMBER() OVER (PARTITION BY qid
        |      ORDER BY cosine DESC, vec_id) AS rank
        |  FROM rr)
        |WHERE rank <= 5 ORDER BY qid, rank""".stripMargin,

    // cb1: md5-seeded centroid pick, argmax-cosine assignment, and the
    // cu11 exact-k draw — all replayed with the shared bit-exact cosine
    "cb1_topic_balanced" ->
      """WITH base AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE))
        |    AS v
        |  FROM embeddings),
        |nrm AS (
        |  SELECT vec_id, v,
        |    sqrt(list_sum(list_transform(range(1, 65), i -> v[i] * v[i])))
        |      AS nv
        |  FROM base),
        |cent AS (
        |  SELECT rn - 1 AS cell, v AS cv, nv AS ncv FROM (
        |    SELECT vec_id, v, nv, row_number() OVER (
        |      ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn
        |    FROM nrm)
        |  WHERE rn <= 8),
        |asg AS (
        |  SELECT vec_id, cell FROM (
        |    SELECT w.vec_id, c.cell, row_number() OVER (
        |      PARTITION BY w.vec_id ORDER BY
        |        (list_sum(list_transform(range(1, 65),
        |           i -> w.v[i] * c.cv[i])) / (w.nv * c.ncv)) DESC,
        |        c.cell) AS rn
        |    FROM nrm w CROSS JOIN cent c)
        |  WHERE rn = 1)
        |SELECT cell, rank, vec_id FROM (
        |  SELECT cell, vec_id, CAST(row_number() OVER (
        |    PARTITION BY cell ORDER BY
        |      CAST(('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 8))
        |        AS UBIGINT), vec_id) AS INT) AS rank
        |  FROM asg)
        |WHERE rank <= 10
        |ORDER BY cell, rank""".stripMargin,

    // hy2: lexical CTEs identical to hy1 (depth 10); semantic leg is
    // brute-force cosine top-5 over the AUGMENTED corpus (embeddings +
    // 5 scaled copies of each query vector) — provably what the IVF
    // store returns, per the ann2/ann5 planted-copy argument; fusion is
    // the same exact-integer RRF
    "hy2_hybrid_ivf" -> {
      val k1 = 1.2; val b = 0.75
      val c1 = (k1 + 1.0).toString; val c2 = k1.toString
      val c3 = (1.0 - b).toString; val c4 = b.toString
      s"""WITH tf AS (
         |  SELECT doc_id, term, count(*) AS tf FROM (
         |    SELECT doc_id,
         |      unnest(string_split_regex(lower(trim(text)), '\\s+')) AS term
         |    FROM documents) t
         |  WHERE term <> '' GROUP BY doc_id, term),
         |dl AS (SELECT doc_id, SUM(tf) AS dl FROM tf GROUP BY doc_id),
         |dfx AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
         |g AS (SELECT
         |  (SELECT CAST(SUM(dl) AS DOUBLE) FROM dl)
         |    / (SELECT count(*) FROM documents) AS avgdl,
         |  (SELECT count(*) FROM documents) AS n_docs),
         |q AS (
         |  SELECT doc_id AS qid,
         |    array_to_string(
         |      string_split_regex(lower(trim(text)), '\\s+')[1:5], ' ')
         |      AS qtext
         |  FROM documents WHERE doc_id < 3),
         |qt AS (
         |  SELECT DISTINCT qid, term FROM (
         |    SELECT qid,
         |      unnest(string_split_regex(lower(trim(qtext)), '\\s+')) AS term
         |    FROM q) t
         |  WHERE term <> ''),
         |sc_lex AS (
         |  SELECT qt.qid, tf.doc_id,
         |    SUM(CAST(round(
         |      ln((g.n_docs - dfx.df + CAST(0.5 AS DOUBLE))
         |         / (dfx.df + CAST(0.5 AS DOUBLE)) + CAST(1.0 AS DOUBLE))
         |      * (tf.tf * CAST($c1 AS DOUBLE))
         |      / (tf.tf + CAST($c2 AS DOUBLE) * (CAST($c3 AS DOUBLE)
         |         + CAST($c4 AS DOUBLE) * dl.dl / g.avgdl))
         |      * CAST(1000000.0 AS DOUBLE)) AS BIGINT)) AS sm
         |  FROM qt JOIN tf USING (term) JOIN dfx USING (term)
         |    JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN g
         |  GROUP BY 1, 2),
         |lex AS (
         |  SELECT qid, doc_id, rank FROM (
         |    SELECT qid, doc_id, ROW_NUMBER() OVER (PARTITION BY qid
         |      ORDER BY sm DESC, doc_id) AS rank FROM sc_lex)
         |  WHERE rank <= 10),
         |base AS (
         |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE))
         |    AS v
         |  FROM embeddings
         |  UNION ALL
         |  SELECT 10000 + vec_id * 5 + c,
         |    list_transform(embedding,
         |      x -> CAST(x AS DOUBLE) * (1.0 + 0.001 * (c + 1)))
         |  FROM embeddings, range(0, 5) t(c) WHERE vec_id < 3),
         |nrm AS (
         |  SELECT vec_id, v,
         |    sqrt(list_sum(list_transform(range(1, 65), i -> v[i] * v[i])))
         |      AS nv
         |  FROM base),
         |qv AS (SELECT vec_id AS qid, v AS qvec, nv AS nq FROM nrm
         |  WHERE vec_id < 3),
         |sc_sem AS (
         |  SELECT qv.qid, e.vec_id,
         |    list_sum(list_transform(range(1, 65), i -> e.v[i] * qv.qvec[i]))
         |      / (e.nv * qv.nq) AS cosine
         |  FROM nrm e, qv),
         |sem AS (
         |  SELECT qid, vec_id AS doc_id, rank FROM (
         |    SELECT qid, vec_id, ROW_NUMBER() OVER (PARTITION BY qid
         |      ORDER BY cosine DESC, vec_id) AS rank FROM sc_sem)
         |  WHERE rank <= 5),
         |fused AS (
         |  SELECT qid, doc_id,
         |    SUM(CAST(round(CAST(1000000.0 AS DOUBLE) / (60 + rank))
         |      AS BIGINT)) AS score_micros
         |  FROM (SELECT * FROM lex UNION ALL SELECT * FROM sem)
         |  GROUP BY 1, 2)
         |SELECT qid, CAST(rank AS INTEGER) AS rank, doc_id,
         |  score_micros / CAST(1000000.0 AS DOUBLE) AS score
         |FROM (SELECT qid, doc_id, score_micros,
         |  ROW_NUMBER() OVER (PARTITION BY qid
         |    ORDER BY score_micros DESC, doc_id) AS rank FROM fused)
         |WHERE rank <= 5 ORDER BY qid, rank""".stripMargin
    },

    "knn1_label_vote" ->
      """WITH q AS (
        |  SELECT vec_id AS qid, embedding AS qv FROM embeddings
        |  WHERE vec_id < 10),
        |scored AS (
        |  SELECT q.qid, e.vec_id, e.label,
        |    list_sum(list_transform(range(1, 65),
        |      i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE)))
        |    / (sqrt(list_sum(list_transform(range(1, 65),
        |        i -> CAST(e.embedding[i] AS DOUBLE)
        |           * CAST(e.embedding[i] AS DOUBLE))))
        |     * sqrt(list_sum(list_transform(range(1, 65),
        |        i -> CAST(q.qv[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE)))))
        |      AS cosine
        |  FROM embeddings e, q WHERE e.vec_id <> q.qid),
        |nn AS (
        |  SELECT qid, label FROM (
        |    SELECT qid, label,
        |      ROW_NUMBER() OVER (PARTITION BY qid
        |        ORDER BY cosine DESC, vec_id) AS rk
        |    FROM scored)
        |  WHERE rk <= 7),
        |v AS (SELECT qid, label, count(*) AS votes FROM nn
        |      GROUP BY qid, label)
        |SELECT qid, CAST(label AS BIGINT) AS pred_label, votes FROM (
        |  SELECT qid, label, votes,
        |    ROW_NUMBER() OVER (PARTITION BY qid
        |      ORDER BY votes DESC, label) AS rk
        |  FROM v)
        |WHERE rk = 1 ORDER BY qid""".stripMargin,
  )
}
