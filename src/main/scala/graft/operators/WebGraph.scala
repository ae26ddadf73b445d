package graft.operators

import graft.CacheScope
import graft.functions.UrlOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Web link graph + PageRank — the curation prior web-corpus pipelines
  * rank domains with (Page et al. 1999; Common Crawl publishes exactly
  * this artifact as its "host/domain ranks" dataset, and quality
  * filters like OpenWebText's "outbound-link karma" are the same idea:
  * a link is a quality vote).
  *
  * Everything here is Spark-first:
  *  - href extraction is a codegen'd regexp over the raw HTML — no DOM
  *    parse, no UDF (same posture as [[Curation.htmlToText]]);
  *  - the edge list is a plain groupBy;
  *  - PageRank is the classic damped power iteration expressed as one
  *    join + one aggregation per step, with the EDGE side joined to its
  *    out-weights once, repartitioned by `src` once, and cached — every
  *    iteration reuses that partitioning, so the per-step cost is the
  *    rank-table shuffle (|nodes| rows) + the map-side-combined
  *    contribution aggregation, never a re-shuffle of the edges.
  *
  * Determinism contract: ranks are carried as FIXED-POINT longs
  * (`SCALE` = 1e12 units of probability mass) and every step is integer
  * arithmetic — `div`, `%`, exact long sums. Long addition is
  * associative+commutative, so the result is bit-identical across
  * partition counts, task orders, and re-runs — and replayable by any
  * engine that can do 64-bit integer math (the DuckDB oracle unrolls
  * the same iterations as chained CTEs). A float PageRank would differ
  * in the low bits per run (doubles don't commute under shuffle order);
  * this one can be hash-gated.
  */
object WebGraph {

  /** Fixed-point scale: 1e12 units = rank 1.0. Headroom bound: the
    * per-edge contribution multiplies a rank (≤ SCALE) by an edge
    * weight BEFORE the divide, so weights must stay below
    * Long.MaxValue / SCALE ≈ 9.2e6 — comfortably above any real
    * domain→domain link count; [[domainEdges]] output at 100 TB can be
    * capped with `least(weight, lit(9000000L))` if a pathological pair
    * ever approaches it. */
  val Scale: Long = 1000000000000L

  /** href targets of anchor tags in raw HTML: every `<a ... href="…">`
    * or `<a ... href='…'>`, tag and attribute case-insensitive, in
    * document order within each quote style. Pure `regexp_extract_all`
    * — RE2-safe (no lookaround/backreference), so the DuckDB oracle
    * runs the identical patterns. Relative hrefs come back verbatim;
    * domain-level consumers drop them ([[domainEdges]]) because a
    * relative link is by construction same-domain and self-loops are
    * not edges. */
  def extractHrefs(html: Column): Column = concat(
    regexp_extract_all(html, lit("(?i)<a\\s[^>]*href\\s*=\\s*\"([^\"]*)\""), lit(1)),
    regexp_extract_all(html, lit("(?i)<a\\s[^>]*href\\s*=\\s*'([^']*)'"), lit(1)))

  /** (target registered domain, normalized anchor text, n) triples from
    * raw pages — the anchor-text signal (what the web says a domain IS;
    * search and quality systems aggregate it per target since
    * Brin & Page 1998 §2.2). The paired extraction runs the SAME
    * anchor-tag regexp twice (group 1 = href, group 2 = inner text —
    * both quote styles) and zips positionally; anchors are lowercased/
    * trimmed, empty ones and unresolvable targets dropped. Map-side
    * explode + one partial-agg shuffle of (dst, anchor) pairs. */
  def anchorTexts(docs: DataFrame, urlCol: String, htmlCol: String)
      : DataFrame = {
    val patD = "(?i)<a\\s[^>]*href\\s*=\\s*\"([^\"]*)\"[^>]*>([^<]*)</a>"
    val patS = "(?i)<a\\s[^>]*href\\s*=\\s*'([^']*)'[^>]*>([^<]*)</a>"
    def zipped(pat: String) = docs
      .select(regexp_extract_all(col(htmlCol), lit(pat), lit(1)).as("h"),
        regexp_extract_all(col(htmlCol), lit(pat), lit(2)).as("t"))
      .select(explode(arrays_zip(col("h"), col("t"))).as("z"))
      .select(col("z.h").as("href"), col("z.t").as("anchor"))
    zipped(patD).unionByName(zipped(patS))
      .select(UrlOps.registeredDomain(UrlOps.hostOf(col("href")))
        .as("dst"), lower(trim(col("anchor"))).as("anchor"))
      .filter(col("dst").isNotNull && col("anchor") =!= "")
      .groupBy(col("dst"), col("anchor"))
      .agg(count(lit(1)).as("n"))
  }

  /** Per-target-domain anchor profile over [[anchorTexts]] output:
    * total in-link mentions, distinct anchor vocabulary, and the top-k
    * anchors by (n DESC, anchor ASC). The window partitions by `dst` —
    * parallel across domains, never a global sort. */
  def topAnchors(anchors: DataFrame, k: Int = 3): DataFrame = {
    require(k >= 1, s"topAnchors: k must be >= 1, got $k")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("dst"))
      .orderBy(col("n").desc, col("anchor"))
    anchors
      .withColumn("rk", row_number().over(w))
      .groupBy(col("dst"))
      .agg(sum(col("n")).as("n_mentions"),
        count(lit(1)).as("n_anchors"),
        concat_ws(" | ", transform(
          array_sort(collect_list(
            when(col("rk") <= k, struct(col("rk"), col("anchor"))))),
          s => s.getField("anchor"))).as("top_anchors"))
  }

  /** Domain-level link edges from raw pages: registered domain of the
    * page URL → registered domain of each absolute href target.
    * Self-links (intra-domain navigation — the overwhelming majority of
    * real links) and unresolvable domains are dropped; parallel links
    * collapse into a `weight` count. One explode + one groupBy: the
    * explode is map-side, the groupBy partial-aggregates before the
    * shuffle, so the shuffled volume is distinct (src,dst) pairs — the
    * graph, not the link instances. */
  def domainEdges(docs: DataFrame, urlCol: String, htmlCol: String): DataFrame = {
    val src = UrlOps.registeredDomain(UrlOps.hostOf(col(urlCol)))
    docs
      .select(src.as("src"), explode(extractHrefs(col(htmlCol))).as("href"))
      .select(col("src"),
        UrlOps.registeredDomain(UrlOps.hostOf(col("href"))).as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull
        && col("src") =!= col("dst"))
      .groupBy(col("src"), col("dst"))
      .agg(count(lit(1)).as("weight"))
  }

  /** Damped PageRank over a weighted edge list `(src, dst, weight)`,
    * `iters` full power-iteration steps from the uniform vector.
    *
    * Update rule (all integer math at [[Scale]] fixed point; `div` is
    * truncating long division, every operand non-negative):
    * {{{
    *   teleport   = (Scale - (Scale * dmill) div 1000) div n
    *   share_i    = (Σ rank of out-degree-0 nodes) div n
    *   contrib(e) = (rank(src) * weight) div ow(src)
    *   rank'(v)   = teleport + ((Σ contrib(in-edges of v) + share_i)
    *                 * dmill) div 1000
    * }}}
    * where `dmill` = round(damping·1000) and `ow` is the node's total
    * out-weight. Truncation leaks ≤ 1 unit of mass per node per term —
    * at Scale = 1e12 the total stays 1.0 to ~9 decimal digits, and the
    * leak is deterministic (same floors every run).
    *
    * Scale shape: the edge frame (joined to its out-weights) is
    * repartitioned by `src` and cached ONCE; each iteration shuffles
    * only the rank table into that partitioning, aggregates
    * contributions by `dst` (map-side combine caps the shuffle at one
    * row per (partition, dst)), and materializes the next rank table —
    * `count()` per step keeps the lineage one step deep instead of
    * compounding `iters` joins into one Catalyst plan. The dangling
    * mass is a one-long `collect` per step (bounded control plane).
    *
    * Returns `(node, rank_fp, rank)` — `rank_fp` the exact fixed-point
    * long (hash-gateable), `rank` its double view.
    */
  def pageRank(edges: DataFrame, iters: Int = 10, damping: Double = 0.85)
      (implicit scope: CacheScope = CacheScope.session): DataFrame =
    pageRankFrom(edges, None, iters, damping)

  /** Warm-start PageRank: resume the power iteration from a prior
    * `(node, rank_fp)` table instead of the uniform vector — the
    * O(delta-convergence) maintenance path when the graph changes
    * incrementally (a new crawl snapshot perturbs a converged rank
    * vector far less than it perturbs uniform, so far fewer iterations
    * reach the same fixed point). Nodes absent from the prior (newly
    * discovered domains) start at the uniform share; prior rows for
    * nodes no longer in the graph are ignored. The arithmetic per step
    * is IDENTICAL to [[pageRank]] — resuming a k-iteration result for
    * m more steps is bit-equal to running k+m cold (the wg2b gate pins
    * exactly that against the cold oracle). */
  def pageRankResume(edges: DataFrame, prior: DataFrame, iters: Int,
      damping: Double = 0.85)
      (implicit scope: CacheScope = CacheScope.session): DataFrame =
    pageRankFrom(edges, Some(prior), iters, damping)

  private def pageRankFrom(edges: DataFrame, prior: Option[DataFrame],
      iters: Int, damping: Double)
      (implicit scope: CacheScope): DataFrame = {
    require(iters >= 1, s"pageRank: iters must be >= 1, got $iters")
    val dmill = math.round(damping * 1000)
    require(dmill >= 0 && dmill <= 1000,
      s"pageRank: damping must be in [0, 1], got $damping")

    val e = edges.select(col("src").cast("string").as("src"),
      col("dst").cast("string").as("dst"),
      col("weight").cast("long").as("weight"))
    val outW = e.groupBy(col("src")).agg(sum(col("weight")).as("ow"))
    // The big side, shaped once: edges + their source's out-weight,
    // hash-partitioned by src. Every iteration's join reuses this
    // cached partitioning — only the rank side exchanges.
    val eN = scope.cache(e.join(outW, Seq("src"))
      .repartition(col("src"))
      .select(col("src"), col("dst"), col("weight"), col("ow")))
    val nodes = scope.cache(
      e.select(col("src").as("node"))
        .union(e.select(col("dst").as("node")))
        .distinct())
    val n = nodes.count()
    if (n == 0)
      return nodes.select(col("node"), lit(0L).as("rank_fp"),
        lit(0.0).as("rank"))

    val dangling = scope.cache(
      nodes.join(outW.select(col("src").as("node")), Seq("node"),
        "left_anti"))
    dangling.count()
    val teleport = (Scale - Scale * dmill / 1000L) / n

    val spark = edges.sparkSession
    // Per-iteration lineage truncation: materialize each rank table
    // into the cache, then rebase the next step on the materialized
    // RDD (a LogicalRDD leaf). Without this the logical plan grows one
    // full join-agg layer per iteration and analysis cost compounds —
    // at a few tens of iterations the tree alone overflows the stack.
    // Recompute stays possible (the RDD lineage still reaches the
    // cached parent, and through it the original edges) — this is
    // cache + plan truncation, not a lineage-destroying checkpoint.
    def materialize(df: DataFrame): (DataFrame, DataFrame) = {
      val cached = scope.cache(df)
      cached.count()
      (cached, spark.createDataFrame(cached.rdd, cached.schema))
    }
    val init = prior match {
      case None => nodes.select(col("node"), lit(Scale / n).as("r"))
      case Some(p) =>
        nodes.join(
          p.select(col("node"), col("rank_fp").cast("long").as("pr")),
          Seq("node"), "left")
          .select(col("node"),
            coalesce(col("pr"), lit(Scale / n)).as("r"))
    }
    var (ranksCache, ranks) = materialize(init)
    for (_ <- 1 to iters) {
      val dang = dangling.join(ranks, Seq("node"))
        .agg(coalesce(sum(col("r")), lit(0L))).first().getLong(0)
      val share = dang / n
      val inm = ranks.join(eN, ranks("node") === eN("src"))
        .select(col("dst"), expr("(r * weight) div ow").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("inm"))
      val (nextCache, next) = materialize(
        nodes.join(inm, nodes("node") === inm("dst"), "left")
          .select(col("node"),
            (lit(teleport) + expr(
              s"((coalesce(inm, 0L) + ${share}L) * ${dmill}L) div 1000"))
              .as("r")))
      ranksCache.unpersist(blocking = false)
      ranksCache = nextCache
      ranks = next
    }
    ranks.select(col("node"), col("r").as("rank_fp"),
      (col("r").cast("double") / lit(Scale.toDouble)).as("rank"))
  }
}
