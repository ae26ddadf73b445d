package graft.queries

import graft.Tables
import graft.operators.WebGraph
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Gate coverage for the web link-graph family ([[graft.operators.
  * WebGraph]]): href extraction → domain edge list → fixed-point
  * PageRank. Both gates are fully oracle-checked, and the oracle
  * derives the edge set INDEPENDENTLY from the page construction (the
  * url2 pattern) — the engine must reproduce it through the real
  * regexp-extract + hostOf + registeredDomain chain, so a regression
  * anywhere in that chain (or in the rank arithmetic) flips the hash.
  *
  * Page synthesis: every document becomes a page on one of 20
  * `siteN.com` domains (md5-derived) whose HTML carries 2–3 absolute
  * links — a double-quoted `siteN.com` link, a single-quoted mixed-case
  * `newsN.co.uk` link (exercises the quote style, tag case, and the
  * co.uk public-suffix rule), a third link on every third page (degree
  * skew), plus a relative href and an href-less anchor that must NOT
  * become edges.
  */
object GraphQueries {

  type Q = (SparkSession, String) => DataFrame

  /** 60-bit md5 hash of doc_id salted by `salt` — the house
    * Spark-side spelling whose DuckDB mirror is
    * `CAST('0x'||substr(md5(...),1,15) AS BIGINT)`. */
  private def h(salt: String): Column =
    expr("cast(conv(substring(md5(concat(cast(doc_id as string), " +
      s"'$salt')), 1, 15), 16, 10) as bigint)")

  private def synthPages(s: SparkSession, d: String): DataFrame =
    synthPagesFrom(Tables.documents(s, d))

  /** [[synthPages]] over an arbitrary (doc_id) frame — the crawl-delta
    * gate builds pages for SHIFTED survivor ids, so the page universe
    * must be a function of the id frame, not of the documents table. */
  private def synthPagesFrom(ids: DataFrame): DataFrame =
    ids.select(col("doc_id"))
      .select(col("doc_id"),
        concat(lit("https://www.site"), (h("u") % 20).cast("string"),
          lit(".com/p/"), col("doc_id").cast("string")).as("url"),
        concat(
          lit("<html><body><p>graft page</p><a href=\"https://site"),
          (h("a") % 20).cast("string"),
          lit(".com/x\">Read More</a><A HREF='http://news"),
          (h("b") % 7).cast("string"),
          lit(".co.uk/y?id=1'>daily news</A>"),
          when(col("doc_id") % 3 === 0,
            concat(lit("<a rel=\"nofollow\" href=\"https://site"),
              (h("c") % 20).cast("string"), lit(".com/z\">ref "),
              (col("doc_id") % 5).cast("string"), lit("</a>")))
            .otherwise(lit("")),
          lit("<a href=\"/rel/path\">rel</a>" +
            "<a name=\"x\">nohref</a></body></html>")).as("html"))

  /** wg6's page universe: 20 `siteN.com` domains partitioned into five
    * ISLANDS of four (every link stays inside the source's block of 4),
    * so the component structure is 5 genuine communities — the
    * single-giant-component shape of [[synthPages]] would make a
    * per-community cap indistinguishable from a global one. */
  private def wg6Pages(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(col("doc_id"))
      .select(col("doc_id"),
        (h("u") % 20).as("base"), (h("a") % 4).as("off"))
      .select(col("doc_id"),
        concat(lit("https://www.site"), col("base").cast("string"),
          lit(".com/p/"), col("doc_id").cast("string")).as("url"),
        concat(lit("<html><body><a href=\"https://site"),
          (col("base") - col("base") % 4 + col("off")).cast("string"),
          lit(".com/x\">in-block</a></body></html>")).as("html"))

  def queries: Map[String, Q] = Map(
    // ---- domain edge list off raw HTML ---------------------------------
    "wg1_link_edges" -> ((s, d) => {
      WebGraph.domainEdges(synthPages(s, d), "url", "html")
        .orderBy(col("src"), col("dst"))
    }),

    // ---- fixed-point PageRank over those edges --------------------------
    // 10 damped power-iteration steps at 1e12 fixed point; the gate
    // hashes the exact longs, so any arithmetic drift (a float sum, a
    // changed rounding point, a missed dangling share) is a hash miss.
    "wg2_pagerank" -> ((s, d) => {
      val edges = WebGraph.domainEdges(synthPages(s, d), "url", "html")
      WebGraph.pageRank(edges, iters = 10, damping = 0.85)
        .select(col("node"), col("rank_fp"))
        .orderBy(col("node"))
    }),

    // ---- warm-start resume: 5 cold + 5 resumed ≡ 10 cold ----------------
    // The O(delta) maintenance contract, hash-pinned: pageRankResume
    // continues the power iteration from a prior rank table with
    // step-identical arithmetic, so this gate shares wg2's 10-iteration
    // cold oracle bit for bit.
    "wg2b_pagerank_resume" -> ((s, d) => {
      // cached: the cold phase and the resume each collect the edge
      // frame (driver-local iteration), and uncached each collect
      // replays the full href-extraction pass (r16)
      val edges = graft.CacheScope.session.cache(
        WebGraph.domainEdges(synthPages(s, d), "url", "html"))
      val first = WebGraph.pageRank(edges, iters = 5, damping = 0.85)
        .select(col("node"), col("rank_fp"))
      WebGraph.pageRankResume(edges, first, iters = 5, damping = 0.85)
        .select(col("node"), col("rank_fp"))
        .orderBy(col("node"))
    }),

    // ---- incremental PageRank over a GROWING edge set --------------------
    // The real crawl-maintenance shape: batch 1 (even docs' pages)
    // ranks cold for 10 iterations, then the full crawl lands — new
    // pages add edges AND new weight on existing edges — and the rank
    // RESUMES on the union for 5 more steps, newcomers entering at the
    // union graph's uniform share. The oracle replays both phases:
    // the batch-1 chain, the coalesce-to-uniform handoff, and the 5
    // union steps, all in exact integers — so the resume entry point,
    // the newcomer rule, and the changed out-weight handling are
    // hash-pinned. (Convergence of this resume to the SAME fixed point
    // as a cold union run is power-iteration math, spec-pinned in
    // WebGraphSpec with both runs iterated to exact stationarity.)
    "wg2c_pagerank_delta" -> ((s, d) => {
      val pagesAll = synthPages(s, d)
      // e1 cached (prior's collect + the union re-aggregation below);
      // the union edge set is the SUM of the halves' per-(src, dst)
      // link counts — even/odd doc sets are disjoint, so this is
      // value-identical to re-extracting hrefs from every page (r16)
      val e1 = graft.CacheScope.session.cache(WebGraph.domainEdges(
        pagesAll.filter(col("doc_id") % 2 === 0), "url", "html"))
      val e2 = WebGraph.domainEdges(
        pagesAll.filter(col("doc_id") % 2 === 1), "url", "html")
      val eAll = e1.unionByName(e2).groupBy(col("src"), col("dst"))
        .agg(sum(col("weight")).as("weight"))
      val prior = WebGraph.pageRank(e1, iters = 10, damping = 0.85)
        .select(col("node"), col("rank_fp"))
      WebGraph.pageRankResume(eAll, prior, iters = 5, damping = 0.85)
        .select(col("node"), col("rank_fp"))
        .orderBy(col("node"))
    }),

    // ---- per-domain anchor-text profile ---------------------------------
    // The paired (href, anchor) extraction, the normalization, the
    // per-(dst, anchor) counts, and the windowed top-3 string are all
    // replayed independently from the construction in DuckDB.
    "wg3_anchor_profile" -> ((s, d) => {
      WebGraph.topAnchors(
          WebGraph.anchorTexts(synthPages(s, d), "url", "html"), k = 3)
        .orderBy(col("dst"))
    }),

    // ---- HITS hubs & authorities over the same edges --------------------
    // 5 mutual-reinforcement steps at 1e12 fixed point, L1-normalized
    // per step; the gate hashes the exact (auth_fp, hub_fp) longs, so a
    // drift anywhere — a missed normalization, a float sneaking in, a
    // changed truncation point — is a hash miss. The oracle unrolls the
    // identical integer arithmetic in HUGEINT CTEs.
    "wg4_hits" -> ((s, d) => {
      val edges = WebGraph.domainEdges(synthPages(s, d), "url", "html")
      WebGraph.hits(edges, iters = 5)
        .select(col("node"), col("auth_fp"), col("hub_fp"))
        .orderBy(col("node"))
    }),

    // ---- warm-start HITS resume: 2 cold + 3 resumed == 5 cold -----------
    // The wg2b contract at the mutual-reinforcement arithmetic: the
    // resumed loop seeds its hub vector from the prior's hub_fp table
    // and every half-step is identical integer arithmetic, so this
    // gate shares wg4's 5-iteration cold oracle bit for bit.
    "wg4b_hits_resume" -> ((s, d) => {
      // cached — cold + resume each collect it (the wg2b note)
      val edges = graft.CacheScope.session.cache(
        WebGraph.domainEdges(synthPages(s, d), "url", "html"))
      val first = WebGraph.hits(edges, iters = 2)
        .select(col("node"), col("hub_fp"))
      WebGraph.hitsResume(edges, first, iters = 3)
        .select(col("node"), col("auth_fp"), col("hub_fp"))
        .orderBy(col("node"))
    }),

    // ---- connected components (domain communities) ----------------------
    // Undirected closure over the same edges via star contraction; the
    // oracle closes the graph with a recursive CTE over the SAME 60-bit
    // md5 node ids and re-derives every component's min-id
    // representative and size, so a wrong merge, a missed edge
    // direction, or a hash-spelling drift flips the hash.
    "wg5_components" -> ((s, d) => {
      val edges = WebGraph.domainEdges(synthPages(s, d), "url", "html")
      WebGraph.components(edges).orderBy(col("node"))
    }),

    // ---- incremental components over a GROWING edge set ------------------
    // The wg2c maintenance shape for connectivity: components of
    // batch 1 (even docs' pages) become the prior, whose node→rep
    // star edges losslessly summarize old connectivity; the odd docs'
    // edges arrive as the delta and the resume contracts ONLY
    // (stars ∪ delta) — O(nodes + delta), never the old edge count.
    // Shares wg5's closure oracle verbatim: resumed ≡ cold on the
    // union, reps and member counts bit for bit.
    "wg5b_components_delta" -> ((s, d) => {
      val pagesAll = synthPages(s, d)
      val e1 = WebGraph.domainEdges(
        pagesAll.filter(col("doc_id") % 2 === 0), "url", "html")
      val e2 = WebGraph.domainEdges(
        pagesAll.filter(col("doc_id") % 2 === 1), "url", "html")
      val prior = WebGraph.components(e1)
      WebGraph.componentsResume(e2, prior).orderBy(col("node"))
    }),

    // ---- label-propagation communities: structure INSIDE the giant
    // component (the signal components cannot see). Five deterministic
    // synchronous rounds over the symmetrized weighted domain graph;
    // the oracle unrolls every round — neighbor-label weight sums and
    // the (sum DESC, label ASC) argmax — so the sync semantics, the
    // tie order, and the undirected symmetrization are hash-pinned.
    "wg8_label_prop" -> ((s, d) => {
      val edges = WebGraph.domainEdges(synthPages(s, d), "url", "html")
      WebGraph.labelProp(edges, iters = 5).orderBy(col("node"))
    }),

    // ---- LPA resumed at crawl cadence: warm-start from prior labels ------
    // Communities were the one graph signal without incremental
    // maintenance. LPA has no unique fixed point, so unlike
    // wg2b/wg4b this gate does NOT claim resumed == cold — it pins
    // DETERMINISM: batch 1 (even docs) labels 5 synchronous rounds
    // cold, the full crawl lands, and 3 more rounds run seeded from
    // those labels (newcomers at their own label). The oracle replays
    // BOTH phases — the batch-1 chain and the seeded union rounds —
    // with the same exact-long (sum DESC, label ASC) argmax, so the
    // seeding rule, the newcomer rule, and the sync tie order are all
    // hash-pinned.
    "wg8b_labelprop_resume" -> ((s, d) => {
      val pagesAll = synthPages(s, d)
      // e1 cached + union re-aggregated from the halves (the wg2c
      // note: disjoint doc sets ⇒ per-(src, dst) counts add exactly)
      val e1 = graft.CacheScope.session.cache(WebGraph.domainEdges(
        pagesAll.filter(col("doc_id") % 2 === 0), "url", "html"))
      val e2 = WebGraph.domainEdges(
        pagesAll.filter(col("doc_id") % 2 === 1), "url", "html")
      val eAll = e1.unionByName(e2).groupBy(col("src"), col("dst"))
        .agg(sum(col("weight")).as("weight"))
      val prior = WebGraph.labelProp(e1, iters = 5)
        .select(col("node"), col("community_rep"))
      WebGraph.labelPropResume(eAll, prior, iters = 3)
        .orderBy(col("node"))
    }),

    // ---- TrustRank: personalized PageRank from a trusted seed set -------
    // Teleport and dangling mass flow only to the seeds (one of which
    // is absent from the graph and must silently drop); 10 fixed-point
    // iterations, every one unrolled in the oracle with the seed-gated
    // teleport arithmetic.
    "wg7_trustrank" -> ((s, d) => {
      val edges = WebGraph.domainEdges(synthPages(s, d), "url", "html")
      WebGraph.trustRank(edges,
          seeds = Seq("site3.com", "news2.co.uk", "absent.example"),
          iters = 10, damping = 0.85)
        .select(col("node"), col("rank_fp"))
        .orderBy(col("node"))
    }),

    // ---- warm-start TrustRank resume: 5 cold + 5 resumed ≡ 10 cold ------
    // The wg2b contract at the seed-gated arithmetic: shares wg7's
    // 10-iteration cold oracle bit for bit.
    "wg7b_trustrank_resume" -> ((s, d) => {
      // cached — cold + resume each collect it (the wg2b note)
      val edges = graft.CacheScope.session.cache(
        WebGraph.domainEdges(synthPages(s, d), "url", "html"))
      val seeds = Seq("site3.com", "news2.co.uk", "absent.example")
      val first = WebGraph.trustRank(edges, seeds, iters = 5,
          damping = 0.85)
        .select(col("node"), col("rank_fp"))
      WebGraph.trustRankResume(edges, first, seeds, iters = 5,
          damping = 0.85)
        .select(col("node"), col("rank_fp"))
        .orderBy(col("node"))
    }),

    // ---- per-COMMUNITY doc cap (components composed into curation) ------
    // The components doc's claim made real: docs assign to their
    // domain's community (via the real URL-parse chain), then an exact
    // min(k, |community|) deterministic cap per community — the
    // per-domain source cap generalized to the link structure. The
    // oracle re-derives the islands, the closure, the doc→community
    // assignment, AND the md5 ranking.
    "wg6_component_cap" -> ((s, d) => {
      val pages = wg6Pages(s, d)
      val comps = WebGraph.components(
        WebGraph.domainEdges(pages, "url", "html"))
      val docDom = pages.select(col("doc_id"),
        graft.functions.UrlOps.registeredDomain(
          graft.functions.UrlOps.hostOf(col("url"))).as("node"))
      val assigned = docDom
        .join(comps.select(col("node"), col("component_rep")), Seq("node"))
      graft.operators.Curation.uniformGroupSample(assigned,
          "component_rep", "doc_id", k = 9)
        .orderBy(col("component_rep"), col("rank"))
    }),

    // ---- trust-curated corpus: the web-graph signals composed into
    // curation, which is what a web graph in an LLM pipeline is FOR.
    // Over the island universe: extract edges, run seed-gated
    // TrustRank (seeds in islands 0/2/3; one absent seed must drop),
    // resolve every doc's registeredDomain through the real URL-parse
    // chain, keep only docs whose domain carries trust mass
    // (rank_fp > 0 — unseeded islands are unreachable by construction
    // and drop ENTIRELY), then cap each link-community's contribution
    // at 7 docs with the deterministic md5 sample. The oracle replays
    // the weighted edge list, all 5 unrolled TrustRank iterations, the
    // recursive component closure, the domain join, the trust gate,
    // AND the md5 ranking — end to end.
    "c4_trust_curated" -> ((s, d) => {
      val pages = wg6Pages(s, d)
      // cached — trustRank AND components each collect it (r16)
      val edges = graft.CacheScope.session.cache(
        WebGraph.domainEdges(pages, "url", "html"))
      val seeds = Seq("site0.com", "site9.com", "site14.com",
        "absent.example")
      val trust = WebGraph.trustRank(edges, seeds, iters = 5,
          damping = 0.85)
        .select(col("node"), col("rank_fp"))
      val comps = WebGraph.components(edges)
        .select(col("node"), col("component_rep"))
      val docDom = pages.select(col("doc_id"),
        graft.functions.UrlOps.registeredDomain(
          graft.functions.UrlOps.hostOf(col("url"))).as("node"))
      val trusted = docDom
        .join(trust.filter(col("rank_fp") > 0), Seq("node"))
        .join(comps, Seq("node"))
      graft.operators.Curation.uniformGroupSample(trusted,
          "component_rep", "doc_id", k = 7)
        .join(docDom, Seq("doc_id"))
        .join(trust, Seq("node"))
        .select(col("component_rep"), col("rank"), col("doc_id"),
          col("node"), col("rank_fp"))
        .orderBy(col("component_rep"), col("rank"))
    }),

    // ---- ONE CRAWL DAY, end to end: the incremental operators
    // composed as the system they exist for. Day 0 is the standing
    // state (corpus + signature store + converged PageRank); day 1
    // lands a batch carrying genuinely-new docs, exact re-crawls, and
    // near-duplicate re-crawls. The day's pipeline: (1) ledger-style
    // exact dedup — content-hash anti-join against day 0 plus
    // keep-lowest-id within the batch; (2) near-dup dedup through the
    // PERSISTED SignatureStore (bucket-pruned candidates, exact
    // Jaccard >= 0.7 verify — the d9 flow); (3) survivors' pages join
    // the web graph and PageRank RESUMES from the day-0 vector on the
    // union (the wg2c flow); (4) the curated output is each survivor
    // with its domain's refreshed rank. The oracle replays the WHOLE
    // day from first principles: both dedup phases (md5 equality +
    // brute-force Jaccard), the shifted-id page synthesis, the 10
    // prior + 5 resumed unrolled PageRank iterations, and the domain
    // join — so a drift in ANY stage's contract (dedup order, store
    // visibility, resume handoff, newcomer rule) flips the hash.
    "c5_crawl_delta" -> ((s, d) => {
      import graft.pipelines.SignatureStore
      import graft.operators.Dedup
      val docs = Tables.documents(s, d)
      // day0 and the deduped batch are each consumed by SEVERAL phases
      // below (store create + nearDups text joins + page synthesis +
      // the delta graph); uncached, every phase replayed the whole
      // md5-dedup chain — gate-scoped caches run each once (the
      // production posture too: a crawl day fits the cluster cache)
      val day0 = graft.CacheScope.session.cache(
        docs.filter(col("doc_id") % 3 =!= 2)
          .select(col("doc_id"), col("text")))
      val batch = docs.filter(col("doc_id") % 3 === 2)
          .select((col("doc_id") + 90000L).as("doc_id"), col("text"))
        .unionByName(docs.filter(col("doc_id") % 12 === 0)
          .select((col("doc_id") + 50000L).as("doc_id"), col("text")))
        .unionByName(docs.filter(col("doc_id") % 15 === 0)
          .select((col("doc_id") + 70000L).as("doc_id"),
            concat(col("text"), lit(" crawl day tail")).as("text")))
      // (1) exact dedup: the CorpusStore ingest rule at gate scale
      val h0 = day0.select(md5(coalesce(col("text"), lit("")))
        .as("__h")).distinct()
      val bh = Tables.fanout(batch, col("doc_id")).withColumn("__h",
        md5(coalesce(col("text"), lit(""))))
      val bNew = bh.join(h0, Seq("__h"), "left_anti")
      val b2 = graft.CacheScope.session.cacheEager(bNew.join(
          bNew.groupBy(col("__h")).agg(min(col("doc_id")).as("doc_id")),
          Seq("__h", "doc_id"))
        .drop("__h"))
      // (2) near-dup against the persisted store, exact-verified
      val dir = GateTmp.dir("graft_c5_store", d)
      SignatureStore.create(s, dir, day0, "doc_id", "text")
      val nd = SignatureStore.nearDups(s, dir, b2, "doc_id", "text",
          minAgreement = 0.45)
        .join(day0.select(col("doc_id").as("store_id"),
          col("text").as("text_s")), Seq("store_id"))
        .join(b2.select(col("doc_id").as("batch_id"),
          col("text").as("text_b")), Seq("batch_id"))
        .filter(Dedup.jaccard(col("text_s"), col("text_b"), 3) >= 0.7)
        .select(col("batch_id").as("doc_id")).distinct()
      // surv feeds the union graph, the survivor-domain projection AND
      // the final join — cacheEager or the near-dup verify above would
      // replay once per consumer
      val surv = graft.CacheScope.session.cacheEager(
        b2.join(nd, Seq("doc_id"), "left_anti"))
      // (3) graph delta + resumed PageRank on the union. day-0 edges
      // are cached and REUSED for the union graph: day-0 and survivor
      // doc ids are disjoint (shifted +50k/+70k/+90k), so per (src,
      // dst) the union corpus's link count is exactly the sum of the
      // two halves' counts — re-aggregating the halves is value-
      // identical to re-extracting hrefs from every day-0 page a
      // second time (r16: the href regex pass over day 0 was the
      // gate's single biggest kernel, paid twice)
      val e1 = graft.CacheScope.session.cache(WebGraph.domainEdges(
        synthPagesFrom(day0.select(col("doc_id"))), "url", "html"))
      val prior = WebGraph.pageRank(e1, iters = 10, damping = 0.85)
        .select(col("node"), col("rank_fp"))
      val eB = WebGraph.domainEdges(
        synthPagesFrom(surv.select(col("doc_id"))), "url", "html")
      val eU = e1.unionByName(eB).groupBy(col("src"), col("dst"))
        .agg(sum(col("weight")).as("weight"))
      val resumed = WebGraph.pageRankResume(eU, prior, iters = 5,
        damping = 0.85)
      // (4) curated day output: survivor -> its domain's fresh rank
      val survDom = synthPagesFrom(surv.select(col("doc_id")))
        .select(col("doc_id"),
          graft.functions.UrlOps.registeredDomain(
            graft.functions.UrlOps.hostOf(col("url"))).as("node"))
      survDom.join(resumed.select(col("node"), col("rank_fp")),
          Seq("node"))
        .select(col("doc_id"), col("node"), col("rank_fp"))
        .orderBy(col("doc_id"))
    }),

    // ---- components driven through SQL TEXT (the TVF) -------------------
    // Shares wg5's oracle: graph_components over the same edge list
    // must land on the same reps and sizes.
    "sql11_sql_components" -> ((s, d) => {
      val path = GateTmp.dir("graft_wg_edges_cc", d)
      WebGraph.domainEdges(synthPages(s, d), "url", "html")
        .write.mode("overwrite").parquet(path)
      s.sql("SELECT node, component_rep, n_members FROM " +
        s"graph_components('$path') ORDER BY node")
    }),

    // ---- LPA communities driven through SQL (the TVF) -------------------
    // Shares wg8's oracle: the graph_labelprop table function over the
    // same edge list must land on the same communities.
    "sql13_sql_labelprop" -> ((s, d) => {
      val path = GateTmp.dir("graft_wg_edges_lpa", d)
      WebGraph.domainEdges(synthPages(s, d), "url", "html")
        .write.mode("overwrite").parquet(path)
      s.sql("SELECT node, community_rep, n_members FROM " +
        s"graph_labelprop('$path', 5) ORDER BY node")
    }),

    // ---- HITS driven through SQL TEXT (the TVF) -------------------------
    // Shares wg4's oracle: the graph_hits table function over the same
    // edge list must land on the same fixed-point longs.
    "sql9_sql_hits" -> ((s, d) => {
      val path = GateTmp.dir("graft_wg_edges_hits", d)
      WebGraph.domainEdges(synthPages(s, d), "url", "html")
        .write.mode("overwrite").parquet(path)
      s.sql(s"SELECT node, auth_fp, hub_fp FROM graph_hits('$path', " +
        "5) ORDER BY node")
    }),

    // ---- the same computation driven through SQL TEXT (the TVF) ---------
    // Shares wg2's oracle: a SQL user pointing graph_pagerank at the
    // same edge list must get the same fixed-point longs.
    "sql7_sql_pagerank" -> ((s, d) => {
      val path = GateTmp.dir("graft_wg_edges", d)
      WebGraph.domainEdges(synthPages(s, d), "url", "html")
        .write.mode("overwrite").parquet(path)
      s.sql(s"SELECT node, rank_fp FROM graph_pagerank('$path', 10, " +
        "0.85D) ORDER BY node")
    }),
  )

  /** Shared DuckDB CTEs: the independently-derived edge list over the
    * docs selected by `pred`, every CTE name suffixed by `suffix` (so
    * two edge sets — e.g. wg2c's batch-1 vs union — coexist in one
    * query). `edges<suffix>` is MATERIALIZED — the PageRank oracle
    * references it in every unrolled iteration, and DuckDB 1.0 inlines
    * plain CTEs per reference (exponential expansion across the
    * r0→r10 chain otherwise). */
  private def edgeCtesWhere(pred: String, suffix: String): String = {
    def hh(salt: String): String =
      s"CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '$salt'), " +
        "1, 15) AS BIGINT)"
    s"""hashed$suffix AS (
       |  SELECT doc_id, ${hh("u")} AS hu, ${hh("a")} AS ha,
       |    ${hh("b")} AS hb, ${hh("c")} AS hc
       |  FROM documents WHERE ($pred)),
       |pagesrc$suffix AS (
       |  SELECT doc_id,
       |    'site' || CAST(hu % 20 AS VARCHAR) || '.com' AS src,
       |    'site' || CAST(ha % 20 AS VARCHAR) || '.com' AS d1,
       |    'news' || CAST(hb % 7 AS VARCHAR) || '.co.uk' AS d2,
       |    CASE WHEN doc_id % 3 = 0
       |      THEN 'site' || CAST(hc % 20 AS VARCHAR) || '.com' END AS d3
       |  FROM hashed$suffix),
       |linked$suffix AS (
       |  SELECT src, unnest([d1, d2, d3]) AS dst FROM pagesrc$suffix),
       |edges$suffix AS MATERIALIZED (
       |  SELECT src, dst, count(*) AS weight FROM linked$suffix
       |  WHERE dst IS NOT NULL AND dst <> src
       |  GROUP BY 1, 2)""".stripMargin
  }

  private val edgeCtes: String = edgeCtesWhere("TRUE", "")

  /** [[edgeCtesWhere]] over an arbitrary id RELATION (a CTE providing
    * `doc_id`) instead of a documents-table predicate — the crawl-delta
    * oracle derives pages for shifted survivor ids. */
  private def edgeCtesFrom(table: String, suffix: String): String = {
    def hh(salt: String): String =
      s"CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '$salt'), " +
        "1, 15) AS BIGINT)"
    s"""hashed$suffix AS (
       |  SELECT doc_id, ${hh("u")} AS hu, ${hh("a")} AS ha,
       |    ${hh("b")} AS hb, ${hh("c")} AS hc
       |  FROM $table),
       |pagesrc$suffix AS (
       |  SELECT doc_id,
       |    'site' || CAST(hu % 20 AS VARCHAR) || '.com' AS src,
       |    'site' || CAST(ha % 20 AS VARCHAR) || '.com' AS d1,
       |    'news' || CAST(hb % 7 AS VARCHAR) || '.co.uk' AS d2,
       |    CASE WHEN doc_id % 3 = 0
       |      THEN 'site' || CAST(hc % 20 AS VARCHAR) || '.com' END AS d3
       |  FROM hashed$suffix),
       |linked$suffix AS (
       |  SELECT src, unnest([d1, d2, d3]) AS dst FROM pagesrc$suffix),
       |edges$suffix AS MATERIALIZED (
       |  SELECT src, dst, count(*) AS weight FROM linked$suffix
       |  WHERE dst IS NOT NULL AND dst <> src
       |  GROUP BY 1, 2)""".stripMargin
  }

  /** wg8/sql13: the full LPA replay. */
  private lazy val lpaOracle: String =
    s"""WITH $edgeCtes,
       |${lpaCtes(iters = 5)}
       |SELECT l.node, r.node AS community_rep,
       |  CAST(sz.n AS BIGINT) AS n_members
       |FROM lp5 l
       |  JOIN lnid r ON r.nid = l.lbl
       |  JOIN (SELECT lbl, count(*) AS n FROM lp5 GROUP BY 1) sz
       |    ON sz.lbl = l.lbl
       |ORDER BY l.node""".stripMargin

  /** Unrolled synchronous LPA rounds — the same symmetrization, md5-60
    * label space, and exact-long (sum DESC, label ASC) argmax as
    * [[WebGraph.labelProp]]. Every CTE MATERIALIZED (the wg2 inlining
    * lesson). */
  private def lpaCtes(iters: Int, prefix: String = "",
      edges: String = "edges", l0Body: Option[String] = None): String = {
    val x = prefix
    val steps = (1 to iters).map { i =>
      val p = i - 1
      s"""${x}lsc$i AS MATERIALIZED (
         |  SELECT u.anode AS node, l.lbl, CAST(sum(u.w) AS BIGINT) AS s
         |  FROM ${x}und u JOIN ${x}lp$p l ON l.node = u.bnode
         |  GROUP BY 1, 2),
         |${x}lp$i AS MATERIALIZED (
         |  SELECT node, lbl FROM (
         |    SELECT node, lbl, ROW_NUMBER() OVER (PARTITION BY node
         |      ORDER BY s DESC, lbl) AS rn
         |    FROM ${x}lsc$i) t
         |  WHERE rn = 1)""".stripMargin
    }.mkString(",\n")
    val l0 = l0Body.getOrElse(
      s"SELECT node, nid AS lbl FROM ${x}lnid")
    s"""${x}und AS MATERIALIZED (
       |  SELECT anode, bnode, CAST(sum(w) AS BIGINT) AS w FROM (
       |    SELECT src AS anode, dst AS bnode, weight AS w FROM $edges
       |    UNION ALL
       |    SELECT dst, src, weight FROM $edges) t
       |  GROUP BY 1, 2),
       |${x}lnid AS MATERIALIZED (
       |  SELECT node, CAST('0x' || substr(md5(node), 1, 15) AS BIGINT)
       |    AS nid
       |  FROM (SELECT DISTINCT anode AS node FROM ${x}und)),
       |${x}lp0 AS MATERIALIZED ($l0),
       |$steps""".stripMargin
  }

  /** Unrolled fixed-point PageRank iterations — the same integer
    * arithmetic as [[WebGraph.pageRank]], step for step. Every rank
    * CTE is MATERIALIZED: each r(i) is referenced twice (dangling sum
    * + contribution join), so plain-CTE inlining would expand the
    * chain 2^iters-fold. `prefix` renames every emitted CTE and
    * `edges` points the chain at a differently-named edge list, so two
    * chains coexist in one query (wg2c runs the batch-1 chain and the
    * union chain together); `r0Body`, when given, replaces the uniform
    * start — the resume replay seeds `<prefix>r0` from another chain's
    * terminal rank table. */
  private def pageRankCtes(iters: Int, scaleL: Long, dmill: Long,
      prefix: String = "", edges: String = "edges",
      r0Body: Option[String] = None): String = {
    val x = prefix
    val steps = (1 to iters).map { i =>
      val p = i - 1
      s"""${x}dg$i AS MATERIALIZED (
         |  SELECT CAST(coalesce(sum(r.r), 0) AS BIGINT) AS dang
         |  FROM ${x}r$p r LEFT JOIN ${x}outw o ON r.node = o.src
         |  WHERE o.src IS NULL),
         |${x}cm$i AS MATERIALIZED (
         |  SELECT e.dst AS node,
         |    CAST(sum((r.r * e.weight) // o.ow) AS BIGINT) AS inm
         |  FROM ${x}r$p r
         |  JOIN ${x}outw o ON r.node = o.src
         |  JOIN $edges e ON e.src = r.node
         |  GROUP BY 1),
         |${x}r$i AS MATERIALIZED (
         |  SELECT n.node,
         |    ($scaleL - ($scaleL * $dmill) // 1000)
         |      // (SELECT n FROM ${x}nn)
         |    + ((coalesce(c.inm, 0)
         |        + (SELECT dang FROM ${x}dg$i) // (SELECT n FROM ${x}nn))
         |       * $dmill) // 1000 AS r
         |  FROM ${x}nodes n LEFT JOIN ${x}cm$i c ON n.node = c.node)"""
        .stripMargin
    }.mkString(",\n")
    val r0 = r0Body.getOrElse(
      s"SELECT node,\n  $scaleL // (SELECT n FROM ${x}nn) AS r " +
        s"FROM ${x}nodes")
    s"""${x}outw AS MATERIALIZED (
       |  SELECT src, sum(weight) AS ow FROM $edges GROUP BY 1),
       |${x}nodes AS MATERIALIZED (
       |  SELECT DISTINCT node FROM (SELECT src AS node FROM $edges
       |    UNION ALL SELECT dst FROM $edges)),
       |${x}nn AS MATERIALIZED (SELECT count(*) AS n FROM ${x}nodes),
       |${x}r0 AS MATERIALIZED ($r0),
       |$steps""".stripMargin
  }

  /** Unrolled fixed-point HITS iterations — the same integer arithmetic
    * as [[WebGraph.hits]], step for step, in HUGEINT (the engine's
    * DECIMAL(38,0) sums / BigInt normalization). `aa{k}`/`hh{k}` are the
    * L1-normalized authority/hub vectors after k full steps; every CTE
    * is MATERIALIZED (each is referenced twice — the wg2 inlining
    * lesson). */
  private def hitsCtes(iters: Int, scaleL: Long): String = {
    val steps = (1 to iters).map { i =>
      val p = i - 1
      s"""ar$i AS MATERIALIZED (
         |  SELECT e.dst AS node,
         |    CAST(sum(CAST(h.s AS HUGEINT) * e.weight) AS HUGEINT) AS raw
         |  FROM hh$p h JOIN edges e ON e.src = h.node GROUP BY 1),
         |at$i AS MATERIALIZED (
         |  SELECT CAST(coalesce(sum(raw), 0) AS HUGEINT) AS t FROM ar$i),
         |aa$i AS MATERIALIZED (
         |  SELECT n.node, CAST(CASE WHEN (SELECT t FROM at$i) = 0 THEN 0
         |    ELSE (CAST(coalesce(r.raw, 0) AS HUGEINT) * $scaleL)
         |      // (SELECT t FROM at$i) END AS BIGINT) AS s
         |  FROM nodes n LEFT JOIN ar$i r ON n.node = r.node),
         |hr$i AS MATERIALIZED (
         |  SELECT e.src AS node,
         |    CAST(sum(CAST(a.s AS HUGEINT) * e.weight) AS HUGEINT) AS raw
         |  FROM aa$i a JOIN edges e ON e.dst = a.node GROUP BY 1),
         |ht$i AS MATERIALIZED (
         |  SELECT CAST(coalesce(sum(raw), 0) AS HUGEINT) AS t FROM hr$i),
         |hh$i AS MATERIALIZED (
         |  SELECT n.node, CAST(CASE WHEN (SELECT t FROM ht$i) = 0 THEN 0
         |    ELSE (CAST(coalesce(r.raw, 0) AS HUGEINT) * $scaleL)
         |      // (SELECT t FROM ht$i) END AS BIGINT) AS s
         |  FROM nodes n LEFT JOIN hr$i r ON n.node = r.node)""".stripMargin
    }.mkString(",\n")
    s"""nodes AS MATERIALIZED (
       |  SELECT DISTINCT node FROM (SELECT src AS node FROM edges
       |    UNION ALL SELECT dst FROM edges)),
       |nn AS MATERIALIZED (SELECT count(*) AS n FROM nodes),
       |hh0 AS MATERIALIZED (SELECT node,
       |  CAST($scaleL // (SELECT n FROM nn) AS BIGINT) AS s FROM nodes),
       |$steps""".stripMargin
  }

  /** Unrolled TrustRank iterations — [[pageRankCtes]] with the
    * seed-gated teleport/dangling arithmetic of
    * [[WebGraph.trustRank]]. `seedsSql` is a DuckDB list literal. */
  private def trustRankCtes(iters: Int, scaleL: Long, dmill: Long,
      seedsSql: String): String = {
    val steps = (1 to iters).map { i =>
      val p = i - 1
      s"""dg$i AS MATERIALIZED (
         |  SELECT CAST(coalesce(sum(r.r), 0) AS BIGINT) AS dang
         |  FROM r$p r LEFT JOIN outw o ON r.node = o.src
         |  WHERE o.src IS NULL),
         |cm$i AS MATERIALIZED (
         |  SELECT e.dst AS node,
         |    CAST(sum((r.r * e.weight) // o.ow) AS BIGINT) AS inm
         |  FROM r$p r
         |  JOIN outw o ON r.node = o.src
         |  JOIN edges e ON e.src = r.node
         |  GROUP BY 1),
         |r$i AS MATERIALIZED (
         |  SELECT n.node,
         |    CASE WHEN sn.node IS NOT NULL
         |      THEN ($scaleL - ($scaleL * $dmill) // 1000)
         |        // (SELECT s FROM ns)
         |      ELSE 0 END
         |    + ((coalesce(c.inm, 0)
         |        + CASE WHEN sn.node IS NOT NULL
         |            THEN (SELECT dang FROM dg$i) // (SELECT s FROM ns)
         |            ELSE 0 END)
         |       * $dmill) // 1000 AS r
         |  FROM nodes n LEFT JOIN cm$i c ON n.node = c.node
         |  LEFT JOIN sn ON sn.node = n.node)""".stripMargin
    }.mkString(",\n")
    s"""outw AS MATERIALIZED (
       |  SELECT src, sum(weight) AS ow FROM edges GROUP BY 1),
       |nodes AS MATERIALIZED (
       |  SELECT DISTINCT node FROM (SELECT src AS node FROM edges
       |    UNION ALL SELECT dst FROM edges)),
       |seedlist AS (SELECT unnest($seedsSql) AS node),
       |sn AS MATERIALIZED (
       |  SELECT n.node FROM nodes n JOIN seedlist s ON s.node = n.node),
       |ns AS MATERIALIZED (SELECT count(*) AS s FROM sn),
       |r0 AS MATERIALIZED (
       |  SELECT n.node, CASE WHEN sn.node IS NOT NULL
       |    THEN $scaleL // (SELECT s FROM ns) ELSE 0 END AS r
       |  FROM nodes n LEFT JOIN sn ON sn.node = n.node),
       |$steps""".stripMargin
  }

  /** Shared wg5/sql11 closure replay (the TVF must land on the
    * same reps and sizes as the Scala API). */
  private val componentsOracle: String =
    s"""WITH RECURSIVE $edgeCtes,
           |und AS (
           |  SELECT src AS a, dst AS b FROM edges
           |  UNION SELECT dst, src FROM edges),
           |wnodes AS (SELECT DISTINCT a AS node FROM und),
           |hh AS MATERIALIZED (
           |  SELECT node, CAST('0x' || substr(md5(node), 1, 15) AS BIGINT)
           |    AS nid
           |  FROM wnodes),
           |hedges AS MATERIALIZED (
           |  SELECT ha.nid AS a, hb.nid AS b
           |  FROM und JOIN hh ha ON ha.node = und.a
           |  JOIN hh hb ON hb.node = und.b),
           |reach(id, r) AS (
           |  SELECT nid, nid FROM hh
           |  UNION
           |  SELECT reach.id, e.b FROM reach JOIN hedges e ON reach.r = e.a),
           |labels AS (SELECT id, min(r) AS cid FROM reach GROUP BY id),
           |lbl AS (
           |  SELECT h.node, l.cid FROM hh h JOIN labels l ON l.id = h.nid),
           |reps AS (SELECT nid AS cid, node AS component_rep FROM hh),
           |sz AS (
           |  SELECT cid, CAST(count(*) AS BIGINT) AS n_members
           |  FROM lbl GROUP BY 1)
           |SELECT lbl.node, r.component_rep, s.n_members
           |FROM lbl JOIN reps r ON r.cid = lbl.cid
           |JOIN sz s ON s.cid = lbl.cid
           |ORDER BY lbl.node""".stripMargin

  def oracles: Map[String, String] = Map(
    "wg1_link_edges" ->
      s"""WITH $edgeCtes
         |SELECT src, dst, weight FROM edges ORDER BY src, dst""".stripMargin,

    "wg2_pagerank" ->
      s"""WITH $edgeCtes,
         |${pageRankCtes(iters = 10, scaleL = WebGraph.Scale, dmill = 850L)}
         |SELECT node, CAST(r AS BIGINT) AS rank_fp
         |FROM r10 ORDER BY node""".stripMargin,

    "wg2b_pagerank_resume" ->
      s"""WITH $edgeCtes,
         |${pageRankCtes(iters = 10, scaleL = WebGraph.Scale, dmill = 850L)}
         |SELECT node, CAST(r AS BIGINT) AS rank_fp
         |FROM r10 ORDER BY node""".stripMargin,

    // both phases unrolled: the batch-1 chain (p-prefixed, over
    // edges1), then the union chain seeded by coalesce(prior, uniform)
    "wg2c_pagerank_delta" ->
      s"""WITH ${edgeCtesWhere("doc_id % 2 = 0", "1")},
         |$edgeCtes,
         |${pageRankCtes(iters = 10, scaleL = WebGraph.Scale,
            dmill = 850L, prefix = "p", edges = "edges1")},
         |${pageRankCtes(iters = 5, scaleL = WebGraph.Scale,
            dmill = 850L, r0Body = Some(
              s"""SELECT n.node,
                 |    coalesce(p.r, ${WebGraph.Scale} // (SELECT n FROM nn))
                 |      AS r
                 |  FROM nodes n LEFT JOIN pr10 p ON p.node = n.node"""
                .stripMargin))}
         |SELECT node, CAST(r AS BIGINT) AS rank_fp
         |FROM r5 ORDER BY node""".stripMargin,

    "wg4_hits" ->
      s"""WITH $edgeCtes,
         |${hitsCtes(iters = 5, scaleL = WebGraph.Scale)}
         |SELECT a.node, CAST(a.s AS BIGINT) AS auth_fp,
         |  CAST(h.s AS BIGINT) AS hub_fp
         |FROM aa5 a JOIN hh5 h ON a.node = h.node
         |ORDER BY a.node""".stripMargin,

    "wg4b_hits_resume" ->
      s"""WITH $edgeCtes,
         |${hitsCtes(iters = 5, scaleL = WebGraph.Scale)}
         |SELECT a.node, CAST(a.s AS BIGINT) AS auth_fp,
         |  CAST(h.s AS BIGINT) AS hub_fp
         |FROM aa5 a JOIN hh5 h ON a.node = h.node
         |ORDER BY a.node""".stripMargin,

    // both LPA phases replayed: the batch-1 5-round chain, then the
    // union rounds seeded from its terminal labels with newcomers at
    // their own nid — determinism of the seeded sync argmax is the
    // contract (resumed == cold is NOT claimed; LPA has no unique
    // fixed point)
    "wg8b_labelprop_resume" ->
      s"""WITH ${edgeCtesWhere("doc_id % 2 = 0", "1")},
         |$edgeCtes,
         |${lpaCtes(iters = 5, prefix = "b", edges = "edges1")},
         |${lpaCtes(iters = 3, l0Body = Some(
              """SELECT n.node, coalesce(p.lbl, n.nid) AS lbl
                |  FROM lnid n LEFT JOIN blp5 p ON p.node = n.node"""
                .stripMargin))}
         |SELECT l.node, r.node AS community_rep,
         |  CAST(sz.n AS BIGINT) AS n_members
         |FROM lp3 l
         |  JOIN lnid r ON r.nid = l.lbl
         |  JOIN (SELECT lbl, count(*) AS n FROM lp3 GROUP BY 1) sz
         |    ON sz.lbl = l.lbl
         |ORDER BY l.node""".stripMargin,

    // one crawl day replayed from first principles: both dedup phases
    // (md5-equality ledger + brute-force Jaccard near-dup), shifted-id
    // page synthesis for the survivors, 10 prior + 5 resumed unrolled
    // PageRank iterations with the coalesce-to-uniform handoff, and
    // the survivor-to-domain-rank join
    "c5_crawl_delta" ->
      s"""WITH day0 AS MATERIALIZED (
         |  SELECT doc_id, text FROM documents WHERE doc_id % 3 <> 2),
         |batch AS MATERIALIZED (
         |  SELECT doc_id + 90000 AS doc_id, text FROM documents
         |  WHERE doc_id % 3 = 2
         |  UNION ALL
         |  SELECT doc_id + 50000, text FROM documents
         |  WHERE doc_id % 12 = 0
         |  UNION ALL
         |  SELECT doc_id + 70000, text || ' crawl day tail'
         |  FROM documents WHERE doc_id % 15 = 0),
         |b2 AS MATERIALIZED (
         |  SELECT b.doc_id, b.text FROM batch b
         |  WHERE NOT EXISTS (SELECT 1 FROM day0 d
         |      WHERE md5(coalesce(d.text, '')) =
         |        md5(coalesce(b.text, '')))
         |    AND NOT EXISTS (SELECT 1 FROM batch bb
         |      WHERE md5(coalesce(bb.text, '')) =
         |          md5(coalesce(b.text, ''))
         |        AND bb.doc_id < b.doc_id)),
         |combined AS (
         |  SELECT doc_id, text FROM day0
         |  UNION ALL SELECT doc_id, text FROM b2),
         |${LlmQueries.shinglesCte("combined")},
         |pairs AS (
         |  ${LlmQueries.jaccardPairsSql(0.7)}),
         |surv AS MATERIALIZED (
         |  SELECT doc_id FROM b2 WHERE doc_id NOT IN (
         |    SELECT id_b FROM pairs
         |    WHERE jaccard >= 0.7 AND id_a < 50000 AND id_b >= 50000)),
         |${edgeCtesWhere("doc_id % 3 <> 2", "1")},
         |allids AS (
         |  SELECT doc_id FROM day0 UNION ALL SELECT doc_id FROM surv),
         |${edgeCtesFrom("allids", "u")},
         |${pageRankCtes(iters = 10, scaleL = WebGraph.Scale,
            dmill = 850L, prefix = "p", edges = "edges1")},
         |${pageRankCtes(iters = 5, scaleL = WebGraph.Scale,
            dmill = 850L, edges = "edgesu", r0Body = Some(
              s"""SELECT n.node,
                 |    coalesce(p.r, ${WebGraph.Scale} // (SELECT n FROM nn))
                 |      AS r
                 |  FROM nodes n LEFT JOIN pr10 p ON p.node = n.node"""
                .stripMargin))},
         |survdom AS (
         |  SELECT s.doc_id,
         |    'site' || CAST(h.hu % 20 AS VARCHAR) || '.com' AS node
         |  FROM surv s JOIN hashedu h ON h.doc_id = s.doc_id)
         |SELECT s.doc_id, s.node, CAST(r.r AS BIGINT) AS rank_fp
         |FROM survdom s JOIN r5 r ON r.node = s.node
         |ORDER BY s.doc_id""".stripMargin,

    "sql7_sql_pagerank" ->
      s"""WITH $edgeCtes,
         |${pageRankCtes(iters = 10, scaleL = WebGraph.Scale, dmill = 850L)}
         |SELECT node, CAST(r AS BIGINT) AS rank_fp
         |FROM r10 ORDER BY node""".stripMargin,

    "wg5_components" -> componentsOracle,

    // the incremental path shares wg5's closure replay verbatim:
    // star edges are a lossless connectivity summary, so resumed ≡
    // cold on the union
    "wg5b_components_delta" -> componentsOracle,

    // five synchronous LPA rounds unrolled: symmetrized weighted
    // adjacency, md5-60 initial labels, per-round neighbor-label
    // weight sums + the (sum DESC, label ASC) argmax as a window
    "wg8_label_prop" -> lpaOracle,

    // the TVF path shares wg8's round replay verbatim
    "sql13_sql_labelprop" -> lpaOracle,

    // the TVF path shares wg5's closure replay verbatim
    "sql11_sql_components" -> componentsOracle,



    "wg7_trustrank" ->
      s"""WITH $edgeCtes,
         |${trustRankCtes(iters = 10, scaleL = WebGraph.Scale,
            dmill = 850L,
            seedsSql = "['site3.com', 'news2.co.uk', 'absent.example']")}
         |SELECT node, CAST(r AS BIGINT) AS rank_fp
         |FROM r10 ORDER BY node""".stripMargin,

    "wg7b_trustrank_resume" ->
      s"""WITH $edgeCtes,
         |${trustRankCtes(iters = 10, scaleL = WebGraph.Scale,
            dmill = 850L,
            seedsSql = "['site3.com', 'news2.co.uk', 'absent.example']")}
         |SELECT node, CAST(r AS BIGINT) AS rank_fp
         |FROM r10 ORDER BY node""".stripMargin,

    "wg6_component_cap" ->
      s"""WITH RECURSIVE w6h AS (
         |  SELECT doc_id,
         |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 'u'),
         |      1, 15) AS BIGINT) AS hu,
         |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 'a'),
         |      1, 15) AS BIGINT) AS ha
         |  FROM documents),
         |w6p AS (
         |  SELECT doc_id, hu % 20 AS base,
         |    (hu % 20) - (hu % 20) % 4 + ha % 4 AS dstb
         |  FROM w6h),
         |w6edges AS (
         |  SELECT DISTINCT 'site' || CAST(base AS VARCHAR) || '.com'
         |      AS src,
         |    'site' || CAST(dstb AS VARCHAR) || '.com' AS dst
         |  FROM w6p WHERE base <> dstb),
         |und AS (
         |  SELECT src AS a, dst AS b FROM w6edges
         |  UNION SELECT dst, src FROM w6edges),
         |wnodes AS (SELECT DISTINCT a AS node FROM und),
         |hh AS MATERIALIZED (
         |  SELECT node, CAST('0x' || substr(md5(node), 1, 15) AS BIGINT)
         |    AS nid
         |  FROM wnodes),
         |hedges AS MATERIALIZED (
         |  SELECT ha.nid AS a, hb.nid AS b
         |  FROM und JOIN hh ha ON ha.node = und.a
         |  JOIN hh hb ON hb.node = und.b),
         |reach(id, r) AS (
         |  SELECT nid, nid FROM hh
         |  UNION
         |  SELECT reach.id, e.b FROM reach JOIN hedges e ON reach.r = e.a),
         |labels AS (SELECT id, min(r) AS cid FROM reach GROUP BY id),
         |lbl AS (
         |  SELECT h.node, l.cid FROM hh h JOIN labels l ON l.id = h.nid),
         |reps AS (SELECT nid AS cid, node AS component_rep FROM hh),
         |docdom AS (
         |  SELECT doc_id, 'site' || CAST(base AS VARCHAR) || '.com'
         |    AS node
         |  FROM w6p),
         |asg AS (
         |  SELECT d.doc_id, r.component_rep
         |  FROM docdom d JOIN lbl l ON l.node = d.node
         |  JOIN reps r ON r.cid = l.cid),
         |ranked AS (
         |  SELECT component_rep, doc_id, CAST(row_number() OVER (
         |    PARTITION BY component_rep ORDER BY
         |      CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
         |        AS UBIGINT), doc_id) AS INT) AS rank
         |  FROM asg)
         |SELECT component_rep, rank, doc_id FROM ranked
         |WHERE rank <= 9
         |ORDER BY component_rep, rank""".stripMargin,

    "sql9_sql_hits" ->
      s"""WITH $edgeCtes,
         |${hitsCtes(iters = 5, scaleL = WebGraph.Scale)}
         |SELECT a.node, CAST(a.s AS BIGINT) AS auth_fp,
         |  CAST(h.s AS BIGINT) AS hub_fp
         |FROM aa5 a JOIN hh5 h ON a.node = h.node
         |ORDER BY a.node""".stripMargin,

    // the full composition replayed: weighted island edges, 5 unrolled
    // seed-gated TrustRank steps, the recursive component closure over
    // the same 60-bit ids, the doc->domain join, the rank_fp > 0 trust
    // gate, and the per-community md5 cap
    "c4_trust_curated" ->
      s"""WITH RECURSIVE w6h AS (
         |  SELECT doc_id,
         |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 'u'),
         |      1, 15) AS BIGINT) AS hu,
         |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 'a'),
         |      1, 15) AS BIGINT) AS ha
         |  FROM documents),
         |w6p AS (
         |  SELECT doc_id, hu % 20 AS base,
         |    (hu % 20) - (hu % 20) % 4 + ha % 4 AS dstb
         |  FROM w6h),
         |edges AS MATERIALIZED (
         |  SELECT 'site' || CAST(base AS VARCHAR) || '.com' AS src,
         |    'site' || CAST(dstb AS VARCHAR) || '.com' AS dst,
         |    count(*) AS weight
         |  FROM w6p WHERE base <> dstb GROUP BY 1, 2),
         |${trustRankCtes(iters = 5, scaleL = WebGraph.Scale,
            dmill = 850L,
            seedsSql = "['site0.com', 'site9.com', 'site14.com', " +
              "'absent.example']")},
         |und AS (
         |  SELECT src AS a, dst AS b FROM edges
         |  UNION SELECT dst, src FROM edges),
         |wnodes AS (SELECT DISTINCT a AS node FROM und),
         |hh AS MATERIALIZED (
         |  SELECT node, CAST('0x' || substr(md5(node), 1, 15) AS BIGINT)
         |    AS nid
         |  FROM wnodes),
         |hedges AS MATERIALIZED (
         |  SELECT ha.nid AS a, hb.nid AS b
         |  FROM und JOIN hh ha ON ha.node = und.a
         |  JOIN hh hb ON hb.node = und.b),
         |reach(id, r) AS (
         |  SELECT nid, nid FROM hh
         |  UNION
         |  SELECT reach.id, e.b FROM reach JOIN hedges e ON reach.r = e.a),
         |clabels AS (SELECT id, min(r) AS cid FROM reach GROUP BY id),
         |clbl AS (
         |  SELECT h.node, l.cid FROM hh h JOIN clabels l ON l.id = h.nid),
         |creps AS (SELECT nid AS cid, node AS component_rep FROM hh),
         |docdom AS (
         |  SELECT doc_id, 'site' || CAST(base AS VARCHAR) || '.com'
         |    AS node
         |  FROM w6p),
         |trgate AS (SELECT node, r FROM r5 WHERE r > 0),
         |asg AS (
         |  SELECT d.doc_id, d.node, t.r, rp.component_rep
         |  FROM docdom d JOIN trgate t ON t.node = d.node
         |  JOIN clbl l ON l.node = d.node
         |  JOIN creps rp ON rp.cid = l.cid),
         |ranked AS (
         |  SELECT component_rep, doc_id, node, r,
         |    CAST(row_number() OVER (
         |      PARTITION BY component_rep ORDER BY
         |        CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
         |          AS UBIGINT), doc_id) AS INT) AS rank
         |  FROM asg)
         |SELECT component_rep, rank, doc_id, node,
         |  CAST(r AS BIGINT) AS rank_fp
         |FROM ranked WHERE rank <= 7
         |ORDER BY component_rep, rank""".stripMargin,

    // anchors derived independently from the construction (the engine
    // must reproduce them through the paired two-group regexp + the
    // hostOf/registeredDomain chain + the windowed top-3)
    "wg3_anchor_profile" ->
      s"""WITH $edgeCtes,
         |wg3p AS (
         |  SELECT doc_id,
         |    'site' || CAST(ha % 20 AS VARCHAR) || '.com' AS d1,
         |    'news' || CAST(hb % 7 AS VARCHAR) || '.co.uk' AS d2,
         |    CASE WHEN doc_id % 3 = 0 THEN
         |      'site' || CAST(hc % 20 AS VARCHAR) || '.com' END AS d3,
         |    'ref ' || CAST(doc_id % 5 AS VARCHAR) AS a3
         |  FROM hashed),
         |wg3l AS (
         |  SELECT d1 AS dst, 'read more' AS anchor FROM wg3p
         |  UNION ALL SELECT d2, 'daily news' FROM wg3p
         |  UNION ALL SELECT d3, a3 FROM wg3p WHERE d3 IS NOT NULL),
         |wg3c AS (
         |  SELECT dst, anchor, CAST(count(*) AS BIGINT) AS n
         |  FROM wg3l GROUP BY 1, 2),
         |wg3r AS (
         |  SELECT dst, anchor, n, row_number() OVER (
         |    PARTITION BY dst ORDER BY n DESC, anchor) AS rk
         |  FROM wg3c)
         |SELECT dst, CAST(sum(n) AS BIGINT) AS n_mentions,
         |  CAST(count(*) AS BIGINT) AS n_anchors,
         |  string_agg(CASE WHEN rk <= 3 THEN anchor END, ' | '
         |    ORDER BY rk) AS top_anchors
         |FROM wg3r GROUP BY dst ORDER BY dst""".stripMargin,
  )
}
