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
    * runs the identical patterns. The attribute name is boundary-
    * anchored (`<a␣` directly, or any run of attributes ENDING in
    * whitespace, before `href=`), so `data-href`/`xlink:href` can
    * neither fire alone nor add a second target to an anchor that
    * already matched on its real href. Relative hrefs come back verbatim;
    * domain-level consumers drop them ([[domainEdges]]) because a
    * relative link is by construction same-domain and self-loops are
    * not edges. */
  def extractHrefs(html: Column): Column = concat(
    regexp_extract_all(html,
      lit("(?i)<a\\s(?:[^>]*\\s)?href\\s*=\\s*\"([^\"]*)\""), lit(1)),
    regexp_extract_all(html,
      lit("(?i)<a\\s(?:[^>]*\\s)?href\\s*=\\s*'([^']*)'"), lit(1)))

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
    val patD =
      "(?i)<a\\s(?:[^>]*\\s)?href\\s*=\\s*\"([^\"]*)\"[^>]*>([^<]*)</a>"
    val patS =
      "(?i)<a\\s(?:[^>]*\\s)?href\\s*=\\s*'([^']*)'[^>]*>([^<]*)</a>"
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
    // fanout: href extraction is per-row regex work and the page frame
    // of a few-files corpus otherwise plans into ONE scan task — every
    // graph gate pays it once per phase (cold + delta), measured as
    // the ~0.5 s single-task probe jobs in the wg family at sf0.1
    graft.Tables.fanout(docs, col(urlCol))
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
    * Scale shape, distributed path: the edge frame (joined to its
    * out-weights) is repartitioned by `src` and cached ONCE; each
    * iteration shuffles only the rank table into that partitioning and
    * aggregates contributions by `dst` (map-side combine caps the
    * shuffle at one row per (partition, dst)); the rank table
    * materializes each step so the analyzed plan never compounds.
    *
    * Small graphs take a DRIVER-LOCAL path instead (edge count ≤
    * `localMaxEdges`, checked with one bounded probe): the same
    * integer loop over collected arrays — the `bpeTrainLocal` contract.
    * Iterating a 27-node gate graph through ten Spark jobs pays ~2 s
    * of pure stage scheduling per step for microseconds of arithmetic
    * (the wg2 bench lesson); long sums are order-independent, so the
    * two paths are bit-identical — spec-pinned by running both on the
    * same graph. Pass `localMaxEdges = 0` to force the distributed
    * path. Null src/dst/weight rows are dropped on both paths.
    *
    * Returns `(node, rank_fp, rank)` — `rank_fp` the exact fixed-point
    * long (hash-gateable), `rank` its double view.
    */
  def pageRank(edges: DataFrame, iters: Int = 10, damping: Double = 0.85,
      localMaxEdges: Long = 262144L)
      (implicit scope: CacheScope = CacheScope.session): DataFrame =
    pageRankFrom(edges, None, iters, damping, localMaxEdges)

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
    pageRankFrom(edges, Some(prior), iters, damping, 262144L)

  /** Resume variant with an explicit local-path threshold (see
    * [[pageRank]]). */
  def pageRankResume(edges: DataFrame, prior: DataFrame, iters: Int,
      damping: Double, localMaxEdges: Long)
      (implicit scope: CacheScope): DataFrame =
    pageRankFrom(edges, Some(prior), iters, damping, localMaxEdges)

  private def pageRankFrom(edges: DataFrame, prior: Option[DataFrame],
      iters: Int, damping: Double, localMaxEdges: Long,
      seeds: Option[Seq[String]] = None)
      (implicit scope: CacheScope): DataFrame = {
    require(iters >= 1, s"pageRank: iters must be >= 1, got $iters")
    val dmill = math.round(damping * 1000)
    require(dmill >= 0 && dmill <= 1000,
      s"pageRank: damping must be in [0, 1], got $damping")

    // weight > 0 also guards the contribution divide: a src whose
    // rows all carried weight <= 0 would have ow = 0 and the per-edge
    // `(r * weight) div ow` would die mid-iteration (ANSI
    // DIVIDE_BY_ZERO distributed, ArithmeticException local); dropping
    // non-positive rows turns such a node into a plain dangling node
    val e = edges.select(col("src").cast("string").as("src"),
      col("dst").cast("string").as("dst"),
      col("weight").cast("long").as("weight"))
      .filter(col("src").isNotNull && col("dst").isNotNull
        && col("weight").isNotNull && col("weight") > 0)

    require(localMaxEdges >= 0 && localMaxEdges < Int.MaxValue,
      s"pageRank: localMaxEdges out of range: $localMaxEdges")
    if (localMaxEdges > 0) {
      // bounded probe: fetch at most localMaxEdges+1 rows — never a
      // full count of an unbounded edge list
      val probe = e.limit((localMaxEdges + 1).toInt)
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      if (probe.length <= localMaxEdges)
        return pageRankLocal(edges.sparkSession, probe, prior, iters,
          dmill, seeds)
    }
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
    // Seed gating (TrustRank): teleport and the dangling share flow
    // only to the seed set. Plain PageRank is the degenerate case
    // "every node is a seed" — with S = all nodes the gated arithmetic
    // reduces term for term to the classic rule, so ONE loop serves
    // both (spec-pinned: seeding all nodes ≡ pageRank bit for bit).
    val isSeed = seeds match {
      case None => lit(true)
      case Some(ss) => col("node").isInCollection(ss.distinct)
    }
    val s = seeds match {
      case None => n
      case Some(_) => nodes.filter(isSeed).count()
    }
    if (s == 0)
      return nodes.select(col("node"), lit(0L).as("rank_fp"),
        lit(0.0).as("rank"))

    val dangling = scope.cache(
      nodes.join(outW.select(col("src").as("node")), Seq("node"),
        "left_anti"))
    dangling.count()
    val teleport = (Scale - Scale * dmill / 1000L) / s

    val spark = edges.sparkSession
    // Per-step lineage truncation: materialize each rank table into
    // the cache, then rebase the next step on the materialized RDD (a
    // LogicalRDD leaf). Without this the logical plan compounds one
    // join-agg layer per iteration AND the two rank references per
    // step (dangling sum + contribution join) double the subtree each
    // level — exponential analysis and recompute. On the graphs this
    // path serves (above localMaxEdges) one job per step is noise
    // against the per-step shuffle. Recompute stays possible — this is
    // cache + plan truncation, not a lineage-destroying checkpoint.
    def materialize(df: DataFrame): (DataFrame, DataFrame) = {
      val cached = scope.cache(df)
      cached.count()
      (cached, spark.createDataFrame(cached.rdd, cached.schema))
    }
    val init = prior match {
      case None => nodes.select(col("node"),
        when(isSeed, lit(Scale / s)).otherwise(lit(0L)).as("r"))
      case Some(p) =>
        // max() collapses accidental duplicate prior rows (e.g. a
        // caller unioning two snapshots) — a duplicated node would
        // otherwise fan out through every subsequent iteration
        val pr = p.select(col("node"),
            col("rank_fp").cast("long").as("pr"))
          .groupBy(col("node")).agg(max(col("pr")).as("pr"))
        // newcomers default to their init share — Scale/n under the
        // all-nodes seed set (classic resume, the previous literal),
        // seed-gated Scale/s-or-0 under a trust seed set
        nodes.join(pr, Seq("node"), "left")
          .select(col("node"),
            coalesce(col("pr"),
              when(isSeed, lit(Scale / s)).otherwise(lit(0L))).as("r"))
    }
    var (ranksCache, ranks) = materialize(init)
    for (_ <- 1 to iters) {
      // the dangling mass rides IN the plan as a broadcast one-row
      // aggregate (share = dang div s, integer micros) — a driver
      // collect per iteration would add a second job per step
      val dangRow = dangling.join(ranks, Seq("node"))
        .agg(coalesce(sum(col("r")), lit(0L)).as("dang"))
      val inm = ranks.join(eN, ranks("node") === eN("src"))
        .select(col("dst"), expr("(r * weight) div ow").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("inm"))
      val (nextCache, next) = materialize(
        nodes.join(inm, nodes("node") === inm("dst"), "left")
          .crossJoin(broadcast(dangRow))
          .withColumn("__sh",
            when(isSeed, expr(s"dang div ${s}L")).otherwise(lit(0L)))
          .withColumn("__tele",
            when(isSeed, lit(teleport)).otherwise(lit(0L)))
          .select(col("node"),
            (col("__tele") + expr(
              s"((coalesce(inm, 0L) + __sh) * ${dmill}L) div 1000"))
              .as("r")))
      ranksCache.unpersist(blocking = false)
      ranksCache = nextCache
      ranks = next
    }
    // the iteration scaffolding is dead weight once the final rank
    // table is materialized — release it so a bracket-less caller (the
    // graph_pagerank TVF under the session scope) leaks at most the
    // rank table itself, not the edge frame too. Recompute after an
    // eviction still works: the lineage re-reads the (now uncached)
    // parents.
    eN.unpersist(blocking = false)
    nodes.unpersist(blocking = false)
    dangling.unpersist(blocking = false)
    ranks.select(col("node"), col("r").as("rank_fp"),
      (col("r").cast("double") / lit(Scale.toDouble)).as("rank"))
  }

  /** Personalized PageRank with a trusted seed set — TrustRank
    * (Gyöngyi, Garcia-Molina & Pedersen 2004, "Combating web spam with
    * TrustRank", VLDB; public literature). Identical damped power
    * iteration to [[pageRank]], except teleportation (and the dangling
    * mass) flows ONLY to the seed nodes: rank becomes proximity to the
    * trusted set through the link structure — the spam-demotion /
    * trusted-source prior a curation pipeline applies when a plain
    * PageRank would still reward well-linked link farms.
    *
    * Update rule (integer fixed point at [[Scale]], `div` truncating):
    * {{{
    *   r0(v)      = [v ∈ S] * Scale div |S|
    *   teleport(v)= [v ∈ S] * (Scale - (Scale*dmill) div 1000) div |S|
    *   rank'(v)   = teleport(v) + ((Σ contrib(in-edges) +
    *                 [v ∈ S] * (dang div |S|)) * dmill) div 1000
    * }}}
    *
    * `seeds` is the trusted list — control-plane-sized by nature (a
    * curated allowlist), passed as values and broadcast into the plan
    * via `isInCollection` (InSet). Seeds not present in the graph are
    * dropped from S (they can neither receive nor forward trust);
    * if NO seed survives the intersection the result is all-zero ranks
    * rather than an error — the caller's allowlist simply does not
    * touch this crawl. Same local/distributed split and bit-identity
    * contract as [[pageRank]]; same headroom bound on weights.
    */
  def trustRank(edges: DataFrame, seeds: Seq[String], iters: Int = 10,
      damping: Double = 0.85, localMaxEdges: Long = 262144L)
      (implicit scope: CacheScope = CacheScope.session): DataFrame = {
    require(seeds.nonEmpty, "trustRank: seeds must be non-empty")
    // one power iteration serves both ranks: TrustRank is pageRankFrom
    // with the teleport/dangling terms gated to the seed set (and plain
    // PageRank is the degenerate all-nodes seed set) — a single
    // spec-pinned loop instead of two hand-synchronized copies
    pageRankFrom(edges, None, iters, damping, localMaxEdges,
      Some(seeds.filter(_ != null).distinct))
  }

  /** Warm-start TrustRank — [[pageRankResume]]'s O(delta-convergence)
    * maintenance contract with the seed-gated arithmetic: resuming a
    * k-iteration trust vector for m more steps is bit-equal to running
    * k+m cold (the wg7b gate pins exactly that against the cold
    * oracle). Nodes absent from the prior start at their init share —
    * Scale/|S| for seeds, zero otherwise. */
  def trustRankResume(edges: DataFrame, prior: DataFrame,
      seeds: Seq[String], iters: Int, damping: Double = 0.85,
      localMaxEdges: Long = 262144L)
      (implicit scope: CacheScope = CacheScope.session): DataFrame = {
    require(seeds.nonEmpty, "trustRankResume: seeds must be non-empty")
    pageRankFrom(edges, Some(prior), iters, damping, localMaxEdges,
      Some(seeds.filter(_ != null).distinct))
  }

  /** HITS hubs & authorities over a weighted edge list `(src, dst,
    * weight)` — Kleinberg 1999 (JACM 46(5), "Authoritative sources in a
    * hyperlinked environment"; public literature). PageRank scores a
    * domain by the rank of who links TO it; HITS separates the two
    * roles a curation prior actually wants distinguished: an AUTHORITY
    * (many good hubs point at it — the quality signal for corpus
    * inclusion) vs a HUB (points at many good authorities — link farms
    * and directories score high hub / low authority, which is itself a
    * spam feature).
    *
    * Update rule, `iters` full mutual-reinforcement steps from the
    * uniform vector (all integer math at [[Scale]] fixed point; `div`
    * truncating, every operand non-negative; L1 normalization — each
    * vector re-sums to [[Scale]] per step, the convergence guarantee of
    * the power iteration without the sqrt an L2 norm would force out of
    * integer arithmetic):
    * {{{
    *   araw(v) = Σ over in-edges (u,v):  h(u) * w(u,v)
    *   a(v)    = (araw(v) * Scale) div (Σ araw)     [0 when the sum is 0]
    *   hraw(u) = Σ over out-edges (u,v): a(v) * w(u,v)
    *   h(u)    = (hraw(u) * Scale) div (Σ hraw)
    * }}}
    * Truncation leaks ≤ 1 unit per node per normalization —
    * deterministic, same floors every run, so the result is
    * bit-identical across partition counts and replayable by the DuckDB
    * oracle (HUGEINT arithmetic, iterations unrolled as CTEs).
    *
    * Overflow posture: per-edge products stay in longs under the same
    * headroom bound [[Scale]] documents for PageRank (per-node total
    * out-weight below Long.MaxValue / Scale ≈ 9.2e6); the DISTRIBUTED
    * raw-contribution sums accumulate as DECIMAL(38,0) — exact integers,
    * so the paths agree bit for bit — and the normalization multiplies
    * into 128-bit decimal before the integral divide, so the re-scale
    * can never wrap even at the bound.
    *
    * Scale shape mirrors [[pageRank]]: the edge frame is cached twice,
    * hash-partitioned by `src` (the a-step joins hubs on src) and by
    * `dst` (the h-step joins authorities on dst); each step shuffles
    * only the score table into those fixed partitionings, aggregates
    * with map-side combine, rides the normalizing total in-plan as a
    * broadcast one-row aggregate, and materializes per step so the plan
    * never compounds. Graphs at or under `localMaxEdges` rows take the
    * driver-local integer loop instead (the wg2 lesson: ten Spark jobs
    * for microseconds of arithmetic is pure scheduling tax) — the two
    * paths are spec-pinned bit-identical. Null/non-positive-weight rows
    * drop on both paths, like [[pageRank]].
    *
    * Returns `(node, auth_fp, hub_fp, auth, hub)` — the exact
    * fixed-point longs plus their double views.
    */
  def hits(edges: DataFrame, iters: Int = 5,
      localMaxEdges: Long = 262144L)
      (implicit scope: CacheScope = CacheScope.session): DataFrame =
    hitsFrom(edges, None, iters, localMaxEdges)

  /** Warm-start HITS: resume the mutual-reinforcement power iteration
    * from a prior `(node, hub_fp)` table instead of the uniform hub
    * vector — the same fixed-point maintenance contract as
    * [[pageRankResume]]: HITS is power iteration on AᵀA (hubs) / AAᵀ
    * (authorities), which converges to the principal eigenvector from
    * ANY non-degenerate non-negative start, so a converged prior
    * re-converges in far fewer iterations after a crawl delta than
    * uniform does. Nodes absent from the prior (newly discovered
    * domains) start at the union graph's uniform share; prior rows
    * for vanished nodes are ignored. Each half-step is IDENTICAL
    * arithmetic to [[hits]] — resuming a k-iteration hub table for m
    * more steps is bit-equal to k+m cold on the same graph (the wg4b
    * gate pins exactly that against the cold oracle). */
  def hitsResume(edges: DataFrame, prior: DataFrame, iters: Int,
      localMaxEdges: Long = 262144L)
      (implicit scope: CacheScope = CacheScope.session): DataFrame =
    hitsFrom(edges, Some(prior), iters, localMaxEdges)

  private def hitsFrom(edges: DataFrame, prior: Option[DataFrame],
      iters: Int, localMaxEdges: Long)
      (implicit scope: CacheScope): DataFrame = {
    require(iters >= 1, s"hits: iters must be >= 1, got $iters")
    val e = edges.select(col("src").cast("string").as("src"),
      col("dst").cast("string").as("dst"),
      col("weight").cast("long").as("weight"))
      .filter(col("src").isNotNull && col("dst").isNotNull
        && col("weight").isNotNull && col("weight") > 0)

    require(localMaxEdges >= 0 && localMaxEdges < Int.MaxValue,
      s"hits: localMaxEdges out of range: $localMaxEdges")
    if (localMaxEdges > 0) {
      val probe = e.limit((localMaxEdges + 1).toInt)
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      if (probe.length <= localMaxEdges)
        return hitsLocal(edges.sparkSession, probe, prior, iters)
    }

    val eSrc = scope.cache(e.repartition(col("src")))
    val eDst = scope.cache(e.repartition(col("dst")))
    val nodes = scope.cache(
      e.select(col("src").as("node"))
        .union(e.select(col("dst").as("node")))
        .distinct())
    val n = nodes.count()
    if (n == 0)
      return nodes.select(col("node"), lit(0L).as("auth_fp"),
        lit(0L).as("hub_fp"), lit(0.0).as("auth"), lit(0.0).as("hub"))

    val spark = edges.sparkSession
    // Raw contribution sums accumulate as exact DECIMAL(38,0);
    // normalization is (raw * Scale) div tot in 128-bit decimal,
    // landing back in a long ≤ Scale. Two profile-driven shapes here
    // (both caught by this operator's first 5M-edge stress run):
    //  - each half-step's raw frame is CACHED and its one-row total
    //    COLLECTED — the agg doubles as the cache-populating action
    //    (uncached, the contribution join+agg computed twice per
    //    half-step: the anq1/t12e double-consumption lesson; marginal
    //    iteration 8.9 s → 1.8 s at 1M edges);
    //  - the normalized score table is NEVER materialized mid-loop:
    //    zero-score nodes contribute nothing to the next half-step, so
    //    the divide rides the next contribution join as a projection
    //    over the cached raw frame, and the full-node view (left join
    //    + coalesce 0) is built exactly once, at output. That removes
    //    two node-table materializations per iteration — the join
    //    evaluates the divide per edge instead of per node, but it is
    //    the same exact integer expression, so the result is unchanged
    //    (spec-pinned against the local loop).
    // Per-step lineage is truncated by rebasing each cached raw frame
    // on its materialized RDD (the pageRank posture), so unpersisting
    // a previous step's cache can never inflate a dependent plan.
    def divExpr(tot: java.math.BigDecimal): org.apache.spark.sql.Column =
      expr(s"(raw * ${Scale}L) div cast('${tot.toPlainString}' as " +
        "decimal(38,0))")
    def rawStep(scored: DataFrame, eSide: DataFrame, joinKey: String,
        outKey: String): (DataFrame, DataFrame, java.math.BigDecimal) = {
      val c = scope.cache(scored.join(eSide,
          scored("node") === eSide(joinKey))
        .select(col(outKey), expr("cast(s as decimal(38,0)) * weight")
          .as("c"))
        .groupBy(col(outKey)).agg(sum(col("c")).as("raw"))
        .select(col(outKey).as("node"), col("raw")))
      val tot = c.agg(coalesce(sum(col("raw")),
          lit(java.math.BigDecimal.ZERO).cast("decimal(38,0)")).as("t"))
        .collect().head.getDecimal(0)
      (c, spark.createDataFrame(c.rdd, c.schema), tot)
    }
    def scored(rawRef: DataFrame, tot: java.math.BigDecimal): DataFrame =
      if (tot.signum == 0) rawRef.select(col("node"), lit(0L).as("s"))
      else rawRef.select(col("node"), divExpr(tot).as("s"))
    var h = prior match {
      case None => nodes.select(col("node"), lit(Scale / n).as("s"))
      case Some(p) =>
        // newcomer rule mirrors pageRankResume: absent nodes enter at
        // the UNION graph's uniform share; vanished prior rows drop
        // via the inner node set
        nodes.join(p.select(col("node").cast("string").as("node"),
            col("hub_fp").cast("long").as("__ph")), Seq("node"), "left")
          .select(col("node"),
            coalesce(col("__ph"), lit(Scale / n)).as("s"))
    }
    var aCache: DataFrame = null
    var hCache: DataFrame = null
    var aRef: DataFrame = null
    var hRef: DataFrame = null
    var aTot = java.math.BigDecimal.ZERO
    var hTot = java.math.BigDecimal.ZERO
    for (_ <- 1 to iters) {
      val (ac, ar, at) = rawStep(h, eSrc, "src", "dst")
      if (aCache != null) aCache.unpersist(blocking = false)
      aCache = ac; aRef = ar; aTot = at
      val (hc, hr, ht) = rawStep(scored(aRef, aTot), eDst, "dst", "src")
      if (hCache != null) hCache.unpersist(blocking = false)
      hCache = hc; hRef = hr; hTot = ht
      h = scored(hRef, hTot)
    }
    eSrc.unpersist(blocking = false)
    eDst.unpersist(blocking = false)
    def full(rawRef: DataFrame, tot: java.math.BigDecimal,
        asCol: String): DataFrame =
      nodes.join(rawRef, Seq("node"), "left")
        .select(col("node"),
          (if (tot.signum == 0) lit(0L)
           else coalesce(divExpr(tot), lit(0L))).as(asCol))
    // materialize the final table, then release the iteration
    // scaffolding (node table + last raw frames) — a bracket-less
    // caller (the graph_hits TVF under the session scope) leaks at
    // most the result itself, the pageRank posture; recompute after an
    // eviction re-reads the now-uncached parents through the lineage
    val outCache = scope.cache(
      full(aRef, aTot, "auth_fp")
        .join(full(hRef, hTot, "hub_fp"), Seq("node"))
        .select(col("node"), col("auth_fp"), col("hub_fp"),
          (col("auth_fp").cast("double") / lit(Scale.toDouble))
            .as("auth"),
          (col("hub_fp").cast("double") / lit(Scale.toDouble))
            .as("hub")))
    outCache.count()
    val out = spark.createDataFrame(outCache.rdd, outCache.schema)
    nodes.unpersist(blocking = false)
    if (aCache != null) aCache.unpersist(blocking = false)
    if (hCache != null) hCache.unpersist(blocking = false)
    out
  }

  /** Connected components of the UNDIRECTED view of a link graph —
    * domain communities. The curation use is coverage analysis: a
    * corpus whose domains form one giant component is a different
    * acquisition posture than one fragmented into thousands of isolated
    * clusters, and per-component caps ("at most N docs per community")
    * generalize the per-domain caps the source-cap operator applies.
    *
    * Nodes map to 60-bit md5 ids (the portable house hash — the DuckDB
    * oracle replays it), labels propagate with [[graft.operators.
    * Curation.dupClustersStar]] — alternating large-star/small-star
    * contraction (Kiveris et al. 2014), O(log n)-ish narrow (long,
    * long) shuffle rounds regardless of component DIAMETER, which an
    * arbitrary web graph does not bound the way a near-dup graph does.
    * The component label is the min member id; it is mapped back to its
    * node string so the output is human-readable.
    *
    * Id-collision bound: two of n domains sharing a 60-bit hash merges
    * their components spuriously with probability ≈ n²/2^61 — at 10^7
    * nodes ~5e-5, negligible; past ~10^8 nodes widen the id (two hash
    * columns) before trusting component counts.
    *
    * Returns `(node, component_rep, n_members)` — every node of the
    * filtered edge list (null endpoints and self-loops drop; isolated
    * nodes cannot occur since every node arrives via an edge).
    *
    * Graphs at or under `localMaxEdges` rows take a driver-local
    * union-find instead (the wg2 scheduling-floor lesson — star rounds
    * over a 27-node gate graph cost seconds of pure stage scheduling;
    * measured 3.9 s distributed vs sub-second local on the wg5 gate).
    * The local path computes the SAME min-md5-id representative, so
    * the paths agree exactly (and the local one is additionally immune
    * to the 60-bit collision caveat, having real node identity).
    */
  def components(edges: DataFrame, localMaxEdges: Long = 262144L)
      (implicit scope: CacheScope = CacheScope.session): DataFrame = {
    def h(c: Column): Column =
      conv(substring(md5(c.cast("binary")), 1, 15), 16, 10).cast("long")
    val e = edges.select(col("src").cast("string").as("src"),
      col("dst").cast("string").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull
        && col("src") =!= col("dst"))
    require(localMaxEdges >= 0 && localMaxEdges < Int.MaxValue,
      s"components: localMaxEdges out of range: $localMaxEdges")
    if (localMaxEdges > 0) {
      val probe = e.limit((localMaxEdges + 1).toInt)
        .collect().map(r => (r.getString(0), r.getString(1)))
      if (probe.length <= localMaxEdges)
        return componentsLocal(edges.sparkSession, probe)
    }
    val nodes = scope.cache(
      e.select(col("src").as("node"))
        .union(e.select(col("dst").as("node")))
        .distinct())
    val withId = nodes.select(col("node"), h(col("node")).as("nid"))
    val pairs = e.select(h(col("src")).as("id_a"), h(col("dst")).as("id_b"))
    val labels = Curation.dupClustersStar(pairs, "id_a", "id_b")
    val lbl = withId.join(labels, withId("nid") === labels("id"), "left")
      .select(col("node"), coalesce(col("cluster_id"), col("nid"))
        .as("cid"))
    val reps = withId.select(col("nid").as("cid"),
      col("node").as("component_rep"))
    val sizes = lbl.groupBy(col("cid")).agg(count(lit(1)).as("n_members"))
    lbl.join(reps, Seq("cid")).join(sizes, Seq("cid"))
      .select(col("node"), col("component_rep"), col("n_members"))
  }

  /** Incremental connected components over a GROWING edge set — the
    * [[pageRankResume]] maintenance contract for connectivity: a new
    * crawl batch adds `deltaEdges` (new edges, possibly new nodes) to
    * a graph whose components were already computed, and re-contracting
    * 100 TB of old edges per batch is a non-starter. The prior
    * labeling IS a lossless connectivity summary of the old graph:
    * its (node → component_rep) STAR edges connect exactly the node
    * sets the old edges connected (every member reaches its rep in
    * one hop), so components of (stars ∪ delta) equal components of
    * (old ∪ delta) — same partition, same min-md5-id reps, same
    * member counts (every old node rides its star edge into the node
    * universe). Work is O(|prior nodes| + |delta|), independent of
    * the old EDGE count: the summary the incremental path consumes is
    * node-sized, not edge-sized. The wg5b gate pins resumed ≡ cold on
    * the union against wg5's own closure oracle, bit for bit. */
  def componentsResume(deltaEdges: DataFrame, prior: DataFrame,
      localMaxEdges: Long = 262144L)
      (implicit scope: CacheScope = CacheScope.session): DataFrame = {
    val stars = prior.select(col("node").cast("string").as("src"),
        col("component_rep").cast("string").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
    // rep self-rows drop inside components() (self-loops); a rep still
    // enters the node universe as the dst of its members' stars, and a
    // 2-member component contributes exactly one star edge — every
    // prior node survives (components' own output never contains
    // singletons: nodes only arise from non-self edges)
    components(stars.unionByName(
        deltaEdges.select(col("src").cast("string").as("src"),
          col("dst").cast("string").as("dst"))),
      localMaxEdges)
  }

  /** Synchronous label-propagation communities (Raghavan, Albert &
    * Kumara 2007, "Near linear time algorithm to detect community
    * structures in large-scale networks") — the community detector for
    * graphs where [[components]] degenerates (a real web graph is ONE
    * giant component; connectivity is not community structure). Each
    * node starts as its own label; each round every node adopts the
    * label with the largest incident edge-weight sum among its
    * neighbors, ties to the SMALLEST label — the deterministic
    * synchronous variant (the published algorithm is asynchronous with
    * random tie-breaks; synchronous + total tie order is what makes
    * the result rerun-, engine-, and partitioning-stable, at the known
    * cost that bipartite-ish structures can oscillate with period 2 —
    * `iters` is a fixed budget, not a convergence claim;
    * [[labelPropWithStats]] adds the per-round changed-label monitor
    * that detects convergence and that oscillation instead of
    * documenting them).
    *
    * The graph is treated as UNDIRECTED: edges symmetrize (weights of
    * both directions sum) so label flow follows link adjacency, not
    * link direction. Exact long arithmetic end to end — the argmax is
    * max(struct(sum, -label)), no float anywhere — so the distributed
    * and driver-local paths are bit-identical (spec-pinned, the
    * pageRank contract). Graphs at or under `localMaxEdges` (checked
    * with one bounded probe) take the driver-local loop; 0 forces
    * distributed.
    *
    * Scale shape, distributed path: the symmetrized id-keyed adjacency
    * caches ONCE; each round shuffles only the (nid, lbl) label table
    * into the adjacency join and aggregates (node, lbl) weight sums
    * with map-side combine; per-round materialization truncates the
    * plan (the pageRank lesson). Rows in flight are three longs.
    *
    * Returns (node, community_rep, n_members) — the rep is the node
    * string whose md5-60 id equals the surviving label. */
  def labelProp(edges: DataFrame, iters: Int = 5,
      localMaxEdges: Long = 262144L)
      (implicit scope: CacheScope = CacheScope.session): DataFrame =
    labelPropLoop(edges, iters, localMaxEdges, track = false,
      earlyExit = false)._1

  /** Per-run LPA metadata: rounds actually executed, whether the
    * labeling CONVERGED (a round changed zero labels), whether it hit
    * the synchronous variant's period-2 OSCILLATION (labels(t) ==
    * labels(t-2) with changes still flowing — the bipartite failure
    * mode the fixed budget otherwise only documents), and the changed-
    * label count per executed round (the convergence curve a 100 TB
    * operator watches instead of guessing an iteration budget). */
  final case class LpaStats(rounds: Int, converged: Boolean,
    oscillating: Boolean, changedPerRound: Seq[Long])

  /** [[labelProp]] with a convergence monitor: each round pays ONE
    * extra narrow agg (join of two (nid, lbl) long-pair tables +
    * count) to track changed labels. With `earlyExit` (default), the
    * loop stops when a round changes nothing — the labeling is a
    * fixed point, every further round is a no-op — and stops + FLAGS
    * when labels(t) == labels(t-2), the period-2 oscillation
    * synchronous LPA is known for (Raghavan et al. 2007 §3), where
    * further rounds alternate forever and burning the rest of the
    * budget buys nothing. `earlyExit = false` keeps the fixed-budget
    * semantics of [[labelProp]] (convergence still short-circuits —
    * output-identical by the fixed-point argument — but oscillation
    * only flags, never stops). */
  def labelPropWithStats(edges: DataFrame, iters: Int = 5,
      localMaxEdges: Long = 262144L, earlyExit: Boolean = true)
      (implicit scope: CacheScope = CacheScope.session)
      : (DataFrame, LpaStats) =
    labelPropLoop(edges, iters, localMaxEdges, track = true, earlyExit)

  /** Warm-start LPA: seed each node's label from a prior
    * `(node, community_rep)` table (nodes absent from the prior start
    * at their own label, the cold rule) and run `iters` synchronous
    * rounds on the — typically grown — graph. The honest contract
    * differs from [[pageRankResume]]/[[hitsResume]]: LPA has NO unique
    * fixed point, so resumed and cold runs may legitimately land on
    * different (both valid) labelings; what IS pinned is DETERMINISM —
    * same edges + same prior → the same labels, via the synchronous
    * total (sum DESC, label ASC) tie order (the wg8b gate replays the
    * seeded rounds in SQL) — and the operational payoff measured in
    * Stress: a converged prior re-converges in fewer rounds than cold
    * after a crawl delta. A prior community_rep no longer present in
    * the graph still resolves in the output (the rep-name table is
    * extended with the prior's names). */
  def labelPropResume(edges: DataFrame, prior: DataFrame, iters: Int,
      localMaxEdges: Long = 262144L)
      (implicit scope: CacheScope = CacheScope.session): DataFrame =
    labelPropLoop(edges, iters, localMaxEdges, track = false,
      earlyExit = false, prior = Some(prior))._1

  /** [[labelPropResume]] with the [[LpaStats]] monitor — the
    * rounds-to-convergence comparison (resumed vs cold) rides on
    * this. */
  def labelPropResumeWithStats(edges: DataFrame, prior: DataFrame,
      iters: Int, localMaxEdges: Long = 262144L,
      earlyExit: Boolean = true)
      (implicit scope: CacheScope = CacheScope.session)
      : (DataFrame, LpaStats) =
    labelPropLoop(edges, iters, localMaxEdges, track = true, earlyExit,
      prior = Some(prior))

  private def labelPropLoop(edges: DataFrame, iters: Int,
      localMaxEdges: Long, track: Boolean, earlyExit: Boolean,
      prior: Option[DataFrame] = None)
      (implicit scope: CacheScope): (DataFrame, LpaStats) = {
    require(iters >= 1, s"labelProp: iters must be >= 1, got $iters")
    require(localMaxEdges >= 0 && localMaxEdges < Int.MaxValue,
      s"labelProp: localMaxEdges out of range: $localMaxEdges")
    def h(c: Column): Column =
      conv(substring(md5(c.cast("binary")), 1, 15), 16, 10).cast("long")
    val e = edges.select(col("src").cast("string").as("src"),
      col("dst").cast("string").as("dst"),
      coalesce(col("weight").cast("long"), lit(1L)).as("w"))
      .filter(col("src").isNotNull && col("dst").isNotNull
        && col("src") =!= col("dst") && col("w") > 0)
    if (localMaxEdges > 0) {
      val probe = e.limit((localMaxEdges + 1).toInt)
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      if (probe.length <= localMaxEdges)
        return labelPropLocal(edges.sparkSession, probe, iters, track,
          earlyExit, prior.map(collectPrior))
    }
    val spark = edges.sparkSession
    val und = scope.cache(
      e.select(col("src").as("na"), col("dst").as("nb"), col("w"))
        .unionByName(
          e.select(col("dst").as("na"), col("src").as("nb"), col("w")))
        .groupBy(col("na"), col("nb")).agg(sum(col("w")).as("w"))
        .select(h(col("na")).as("aid"), h(col("nb")).as("bid"),
          col("w")))
    val lid = scope.cache(
      e.select(col("src").as("node")).union(e.select(col("dst")))
        .distinct().select(col("node"), h(col("node")).as("nid")))
    def materialize(df: DataFrame): DataFrame = {
      val cached = scope.cache(df)
      cached.count()
      spark.createDataFrame(cached.rdd, cached.schema)
    }
    // labels differing between two materialized (nid, lbl) tables —
    // the narrow per-round monitor agg (long pairs in, one count out)
    def nDiff(a: DataFrame, b: DataFrame): Long =
      a.select(col("nid"), col("lbl").as("la"))
        .join(b.select(col("nid"), col("lbl").as("lb")), Seq("nid"))
        .filter(col("la") =!= col("lb")).count()
    var lbl = materialize(prior match {
      case None => lid.select(col("nid"), col("nid").as("lbl"))
      case Some(p) =>
        // known nodes take the prior's label (the rep's md5-60 id —
        // the same value space cold labels live in); newcomers start
        // at their own label, the cold rule
        lid.join(p.select(col("node").cast("string").as("node"),
            h(col("community_rep").cast("string")).as("__pl")),
            Seq("node"), "left")
          .select(col("nid"), coalesce(col("__pl"), col("nid"))
            .as("lbl"))
    })
    var prevPrev: DataFrame = null
    var rounds = 0
    var converged = false
    var oscillating = false
    val changed = scala.collection.mutable.ArrayBuffer[Long]()
    var k = 0
    while (k < iters && !converged && !(oscillating && earlyExit)) {
      val next = materialize(und
        .join(lbl, und("bid") === lbl("nid"))
        .groupBy(col("aid"), col("lbl"))
        .agg(sum(col("w")).as("s"))
        .groupBy(col("aid"))
        .agg(max(struct(col("s").as("s"),
          (-col("lbl")).as("nl"))).as("m"))
        .select(col("aid").as("nid"), (-col("m.nl")).as("lbl")))
      rounds += 1
      if (track) {
        val n = nDiff(next, lbl)
        changed += n
        if (n == 0) converged = true
        else if (prevPrev != null && nDiff(next, prevPrev) == 0)
          oscillating = true
      }
      prevPrev = lbl
      lbl = next
      k += 1
    }
    val sizes = lbl.groupBy(col("lbl")).agg(count(lit(1)).as("n_members"))
    // label -> rep-name table: current nodes, extended by the prior's
    // rep names so a winning label whose rep VANISHED from the graph
    // still resolves instead of silently dropping its community
    val repMap = prior match {
      case None => lid.select(col("nid").as("lbl"),
        col("node").as("community_rep"))
      case Some(p) => lid.select(col("nid").as("lbl"),
          col("node").as("community_rep"))
        .unionByName(p.select(
          h(col("community_rep").cast("string")).as("lbl"),
          col("community_rep").cast("string").as("community_rep")))
        .distinct()
    }
    val out = lid.join(lbl, Seq("nid"))
      .join(repMap, Seq("lbl"))
      .join(sizes, Seq("lbl"))
      .select(col("node"), col("community_rep"), col("n_members"))
    (out, LpaStats(rounds, converged, oscillating, changed.toSeq))
  }

  /** Driver-local synchronous LPA — same symmetrization, md5-60 label
    * space, (sum DESC, label ASC) argmax, and convergence/oscillation
    * accounting as the distributed path; long sums are
    * order-independent, so the two are bit-identical (stats
    * included). */
  /** Bounded prior collect for the local path: node -> prior label id
    * plus label id -> rep name (both node-sized, control-plane). */
  private def collectPrior(p: DataFrame)
      : (Map[String, Long], Map[Long, String]) = {
    val rows = p.select(col("node").cast("string"),
        col("community_rep").cast("string"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    (rows.map { case (n, rep) => n -> md5Id60(rep) }.toMap,
      rows.map { case (_, rep) => md5Id60(rep) -> rep }.toMap)
  }

  private def labelPropLocal(spark: org.apache.spark.sql.SparkSession,
      rows: Array[(String, String, Long)], iters: Int, track: Boolean,
      earlyExit: Boolean,
      prior: Option[(Map[String, Long], Map[Long, String])] = None)
      : (DataFrame, LpaStats) = {
    import spark.implicits._
    val nodeIdx = scala.collection.mutable.LinkedHashMap[String, Int]()
    rows.foreach { case (s, d, _) =>
      nodeIdx.getOrElseUpdate(s, nodeIdx.size)
      nodeIdx.getOrElseUpdate(d, nodeIdx.size)
    }
    val nodes = nodeIdx.keys.toArray
    val ids = nodes.map(md5Id60)
    // symmetrized adjacency as index->HashMap(neighborIdx -> weight)
    val adj = Array.fill(nodes.length)(
      new scala.collection.mutable.HashMap[Int, Long]())
    rows.foreach { case (s, d, w) =>
      val si = nodeIdx(s); val di = nodeIdx(d)
      adj(si).update(di, adj(si).getOrElse(di, 0L) + w)
      adj(di).update(si, adj(di).getOrElse(si, 0L) + w)
    }
    var lbl = ids.clone()
    prior.foreach { case (nodeToLbl, _) =>
      nodes.indices.foreach { i =>
        nodeToLbl.get(nodes(i)).foreach(l => lbl(i) = l)
      }
    }
    var prevPrev: Array[Long] = null
    var rounds = 0
    var converged = false
    var oscillating = false
    val changed = scala.collection.mutable.ArrayBuffer[Long]()
    var k = 0
    while (k < iters && !converged && !(oscillating && earlyExit)) {
      val next = new Array[Long](lbl.length)
      var v = 0
      while (v < lbl.length) {
        val scores = new scala.collection.mutable.HashMap[Long, Long]()
        adj(v).foreach { case (u, w) =>
          val l = lbl(u)
          scores.update(l, scores.getOrElse(l, 0L) + w)
        }
        var bestL = Long.MaxValue; var bestS = Long.MinValue
        scores.foreach { case (l, s) =>
          if (s > bestS || (s == bestS && l < bestL)) {
            bestS = s; bestL = l
          }
        }
        next(v) = bestL
        v += 1
      }
      rounds += 1
      if (track) {
        val n = next.indices.count(i => next(i) != lbl(i)).toLong
        changed += n
        if (n == 0) converged = true
        else if (prevPrev != null &&
            next.indices.forall(i => next(i) == prevPrev(i)))
          oscillating = true
      }
      prevPrev = lbl
      lbl = next
      k += 1
    }
    val idToNode = prior.map(_._2).getOrElse(Map.empty) ++
      ids.zip(nodes).toMap
    val sizes = lbl.groupBy(identity).map { case (l, a) => (l, a.length) }
    val out = nodes.indices.map { v =>
      (nodes(v), idToNode(lbl(v)), sizes(lbl(v)).toLong)
    }.toDF("node", "community_rep", "n_members")
    (out, LpaStats(rounds, converged, oscillating, changed.toSeq))
  }

  /** 60-bit md5 id of a node string on the driver — the exact value of
    * the distributed `conv(substring(md5(node), 1, 15), 16, 10)`. */
  private def md5Id60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val hex = d.take(8).map(b => f"$b%02x").mkString.substring(0, 15)
    java.lang.Long.parseLong(hex, 16)
  }

  /** Driver-local union-find over a collected (src, dst) edge array —
    * same output contract as the distributed path: min-md5-id
    * representative per component, mapped back to its node string. */
  private def componentsLocal(spark: org.apache.spark.sql.SparkSession,
      rows: Array[(String, String)]): DataFrame = {
    import spark.implicits._
    val nodeIdx = scala.collection.mutable.LinkedHashMap[String, Int]()
    rows.foreach { case (s, d) =>
      nodeIdx.getOrElseUpdate(s, nodeIdx.size)
      nodeIdx.getOrElseUpdate(d, nodeIdx.size)
    }
    val nn = nodeIdx.size
    if (nn == 0)
      return Seq.empty[(String, String, Long)]
        .toDF("node", "component_rep", "n_members")
    val parent = Array.tabulate(nn)(identity)
    def find(x: Int): Int = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val nx = parent(c); parent(c) = r; c = nx }
      r
    }
    rows.foreach { case (s, d) =>
      val (a, b) = (find(nodeIdx(s)), find(nodeIdx(d)))
      if (a != b) parent(math.max(a, b)) = math.min(a, b)
    }
    val names = new Array[String](nn)
    nodeIdx.foreach { case (n, i) => names(i) = n }
    val ids = names.map(md5Id60)
    val argMin = scala.collection.mutable.HashMap[Int, Int]()
    val size = scala.collection.mutable.HashMap[Int, Long]()
    var i = 0
    while (i < nn) {
      val r = find(i)
      if (!argMin.contains(r) || ids(i) < ids(argMin(r))) argMin(r) = i
      size(r) = size.getOrElse(r, 0L) + 1L
      i += 1
    }
    (0 until nn).map { j =>
      val r = find(j)
      (names(j), names(argMin(r)), size(r))
    }.toDF("node", "component_rep", "n_members")
  }

  /** Driver-local integer HITS over a collected edge array — the same
    * update rule as the distributed loop, operation for operation
    * (exact integer sums commute; BigInt only at the normalization
    * multiply, exactly where the distributed path goes 128-bit).
    * Bounded by `localMaxEdges` rows — control-plane scale, the
    * [[pageRankLocal]] posture. */
  private def hitsLocal(spark: org.apache.spark.sql.SparkSession,
      rows: Array[(String, String, Long)], prior: Option[DataFrame],
      iters: Int): DataFrame = {
    import spark.implicits._
    val nodeIdx = scala.collection.mutable.LinkedHashMap[String, Int]()
    rows.foreach { case (s, d, _) =>
      nodeIdx.getOrElseUpdate(s, nodeIdx.size)
      nodeIdx.getOrElseUpdate(d, nodeIdx.size)
    }
    val n = nodeIdx.size.toLong
    if (n == 0L)
      return Seq.empty[(String, Long, Long, Double, Double)]
        .toDF("node", "auth_fp", "hub_fp", "auth", "hub")
    val nn = nodeIdx.size
    val srcI = rows.map(r => nodeIdx(r._1))
    val dstI = rows.map(r => nodeIdx(r._2))
    val w = rows.map(_._3)
    val a = new Array[Long](nn)
    val h = new Array[Long](nn)
    java.util.Arrays.fill(h, Scale / n)
    // warm start: prior hubs overwrite the uniform fill for known
    // nodes (bounded collect — the prior is node-sized and this path
    // is already under the localMaxEdges control-plane bound)
    prior.foreach { p =>
      val pm = p.select(org.apache.spark.sql.functions.col("node")
            .cast("string"),
          org.apache.spark.sql.functions.col("hub_fp").cast("long"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      nodeIdx.foreach { case (name, idx) =>
        pm.get(name).foreach(v => h(idx) = v)
      }
    }
    val scaleB = BigInt(Scale)
    def normalize(raw: Array[Long], into: Array[Long]): Unit = {
      var tot = BigInt(0)
      var i = 0
      while (i < nn) { tot += raw(i); i += 1 }
      i = 0
      if (tot == 0) java.util.Arrays.fill(into, 0L)
      else while (i < nn) {
        into(i) = (BigInt(raw(i)) * scaleB / tot).toLong
        i += 1
      }
    }
    var it = 0
    while (it < iters) {
      val araw = new Array[Long](nn)
      var k = 0
      while (k < rows.length) {
        araw(dstI(k)) += h(srcI(k)) * w(k)
        k += 1
      }
      normalize(araw, a)
      val hraw = new Array[Long](nn)
      k = 0
      while (k < rows.length) {
        hraw(srcI(k)) += a(dstI(k)) * w(k)
        k += 1
      }
      normalize(hraw, h)
      it += 1
    }
    nodeIdx.iterator
      .map { case (name, idx) =>
        (name, a(idx), h(idx), a(idx).toDouble / Scale.toDouble,
          h(idx).toDouble / Scale.toDouble) }
      .toSeq.toDF("node", "auth_fp", "hub_fp", "auth", "hub")
  }

  /** Driver-local integer PageRank over a collected edge array — the
    * same update rule as the distributed loop, operation for operation
    * (long sums commute, so the paths are bit-identical; spec-pinned
    * by running both). Bounded by `localMaxEdges` rows at ~40 bytes
    * each — control-plane scale, same posture as
    * [[TextAnalysis.bpeTrainLocal]]. */
  private def pageRankLocal(spark: org.apache.spark.sql.SparkSession,
      rows: Array[(String, String, Long)], prior: Option[DataFrame],
      iters: Int, dmill: Long,
      seeds: Option[Seq[String]] = None): DataFrame = {
    import spark.implicits._
    val nodeIdx = scala.collection.mutable.LinkedHashMap[String, Int]()
    rows.foreach { case (s, d, _) =>
      nodeIdx.getOrElseUpdate(s, nodeIdx.size)
      nodeIdx.getOrElseUpdate(d, nodeIdx.size)
    }
    val n = nodeIdx.size.toLong
    if (n == 0L)
      return Seq.empty[(String, Long, Double)]
        .toDF("node", "rank_fp", "rank")
    val nn = nodeIdx.size
    // seed gating — None means "every node is a seed" (plain PageRank;
    // the gated arithmetic reduces exactly, see pageRankFrom)
    val isSeed = Array.fill(nn)(seeds.isEmpty)
    seeds.foreach(_.foreach(sd =>
      nodeIdx.get(sd).foreach(isSeed(_) = true)))
    val s = isSeed.count(identity).toLong
    if (s == 0L)
      return nodeIdx.keysIterator.map(nm => (nm, 0L, 0.0)).toSeq
        .toDF("node", "rank_fp", "rank")
    val srcI = rows.map(r => nodeIdx(r._1))
    val dstI = rows.map(r => nodeIdx(r._2))
    val w = rows.map(_._3)
    val ow = new Array[Long](nn)
    var i = 0
    while (i < rows.length) { ow(srcI(i)) += w(i); i += 1 }
    val teleport = (Scale - Scale * dmill / 1000L) / s
    val r = new Array[Long](nn)
    prior match {
      case None =>
        var j = 0
        while (j < nn) { if (isSeed(j)) r(j) = Scale / s; j += 1 }
      case Some(p) =>
        // null node OR null rank rows drop — exactly what the
        // distributed init's left join + coalesce does with them
        val pm = p.select(col("node").cast("string"),
            col("rank_fp").cast("long")).collect()
          .filter(x => !x.isNullAt(0) && !x.isNullAt(1))
          .map(x => x.getString(0) -> x.getLong(1))
          .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).max }
        nodeIdx.foreach { case (name, idx) =>
          r(idx) = pm.getOrElse(name,
            if (isSeed(idx)) Scale / s else 0L)
        }
    }
    var it = 0
    while (it < iters) {
      var dang = 0L
      var j = 0
      while (j < nn) { if (ow(j) == 0L) dang += r(j); j += 1 }
      val share = dang / s
      val inm = new Array[Long](nn)
      var k = 0
      while (k < rows.length) {
        inm(dstI(k)) += r(srcI(k)) * w(k) / ow(srcI(k))
        k += 1
      }
      j = 0
      while (j < nn) {
        val tele = if (isSeed(j)) teleport else 0L
        val sh = if (isSeed(j)) share else 0L
        r(j) = tele + (inm(j) + sh) * dmill / 1000L
        j += 1
      }
      it += 1
    }
    nodeIdx.iterator
      .map { case (name, idx) =>
        (name, r(idx), r(idx).toDouble / Scale.toDouble) }
      .toSeq.toDF("node", "rank_fp", "rank")
  }
}
