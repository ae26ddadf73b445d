package graft.queries

import graft.Tables
import graft.functions.{Cleansing => C, RefData, UrlOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Oracle-checked coverage for the cleansing library (SURVEY §2.7).
  *
  * The TPC-H-ish test tables are clean, so each query first INJECTS
  * deterministic mess (currency tokens, stray whitespace, mixed formats,
  * nulls) keyed off row ids — identically in the Spark query and the
  * DuckDB oracle — then applies the cleaning function under test. The
  * oracle re-derives the expected output with plain SQL, so a semantic
  * drift in any cleaner breaks the hash match.
  */
object CleansingQueries {

  type Q = (SparkSession, String) => DataFrame

  // DuckDB has no initcap; per-word emulation used by the oracles.
  private def initcapSql(e: String): String =
    s"array_to_string(list_transform(string_split(lower($e), ' '), " +
      s"w -> upper(w[1]) || w[2:]), ' ')"

  def queries: Map[String, Q] = Map(
    // ---- F1/F2/F3/F11: text cleaning + key normalization ----------------
    "f2_text_cleaning" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val messy = c.select(col("c_custkey"),
        when(col("c_custkey") % 5 === 0, lit(null).cast("string"))
          .when(col("c_custkey") % 5 === 1, lit("   "))
          .otherwise(concat(lit("  "), col("c_name"), lit("   x  y  ")))
          .as("raw"))
      messy.select(col("c_custkey"),
        C.cleanText(col("raw")).as("t_clean"),
        C.cleanStoreName(col("raw")).as("t_store"),
        C.cleanAddress(col("raw")).as("t_addr"),
        C.normalizeKey(col("raw")).as("t_key"))
        .orderBy(col("c_custkey"))
    }),

    // ---- F4: city/state Title Case with UNKNOWN default -----------------
    "f4_city_state" -> ((s, d) => {
      val n = Tables.nation(s, d)
      val messy = n.select(col("n_nationkey"),
        when(col("n_nationkey") % 4 === 0, lit(null).cast("string"))
          .otherwise(concat(lit(" "), lower(col("n_name")), lit(" city ")))
          .as("raw"))
      messy.select(col("n_nationkey"), C.cleanCity(col("raw")).as("city"))
        .orderBy(col("n_nationkey"))
    }),

    // ---- F5: zip extraction ---------------------------------------------
    "f5_zip" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val messy = c.select(col("c_custkey"),
        when(col("c_custkey") % 3 === 0,
          concat(lit("PIN-"), lpad((col("c_custkey") * 37).cast("string"),
            7, "0")))
          .when(col("c_custkey") % 3 === 1,
            (col("c_custkey") % 1000).cast("string"))
          .otherwise(lit(null).cast("string")).as("raw"))
      messy.select(col("c_custkey"), C.cleanZip(col("raw")).as("zip"))
        .orderBy(col("c_custkey"))
    }),

    // ---- F6/F9: contains-keyword rule ladders ---------------------------
    "f6_keyword_ladders" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val cot = when(col("c_custkey") % 7 === 0, lit("mega HYPERMARKET zone"))
        .when(col("c_custkey") % 7 === 1, lit("corner kirana"))
        .when(col("c_custkey") % 7 === 2, lit(""))
        .when(col("c_custkey") % 7 === 3, lit("WHOLESALE hub"))
        .when(col("c_custkey") % 7 === 4, lit(" The Retailer "))
        .when(col("c_custkey") % 7 === 5, lit("general trade shop"))
        .otherwise(lit("boutique"))
      val dt = when(col("c_custkey") % 5 === 0, lit("pan india"))
        .when(col("c_custkey") % 5 === 1, lit("multi state"))
        .when(col("c_custkey") % 5 === 2, lit(null).cast("string"))
        .when(col("c_custkey") % 5 === 3, lit("city level"))
        .otherwise(lit("weird type"))
      c.select(col("c_custkey"),
        C.cleanClassOfTrade(cot).as("cot"),
        C.cleanDistributorType(dt).as("dtype"))
        .orderBy(col("c_custkey"))
    }),

    // ---- F7/F8: flag normalization + chain-name demotion ----------------
    "f7_flags" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val tok = when(col("c_custkey") % 8 === 0, lit("yes"))
        .when(col("c_custkey") % 8 === 1, lit("TRUE"))
        .when(col("c_custkey") % 8 === 2, lit("1"))
        .when(col("c_custkey") % 8 === 3, lit("ACTIVE"))
        .when(col("c_custkey") % 8 === 4, lit("a"))
        .when(col("c_custkey") % 8 === 5, lit("no"))
        .when(col("c_custkey") % 8 === 6, lit(""))
        .otherwise(lit(null).cast("string"))
      val chainName = when(col("c_custkey") % 3 === 0,
        lit(null).cast("string")).otherwise(concat(lit("big  bazaar "),
        (col("c_custkey") % 10).cast("string")))
      val isChain = C.cleanIsChain(tok)
      val cleanedName = C.cleanChainName(chainName, isChain)
      c.select(col("c_custkey"),
        isChain.as("is_chain_raw"),
        C.cleanActiveFlag(tok).as("active_flag"),
        cleanedName.as("chain_name"),
        C.demoteChainFlag(isChain, cleanedName).as("is_chain"))
        .orderBy(col("c_custkey"))
    }),

    // ---- F10: numeric/price cleaning over currency-formatted strings ----
    "f10_numeric_clean" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val dec = col("c_acctbal").cast("decimal(12,2)")
      val raw = when(col("c_custkey") % 6 === 0,
        concat(lit("₹"), dec.cast("string")))
        .when(col("c_custkey") % 6 === 1,
          concat(lit("$ "), dec.cast("string")))
        .when(col("c_custkey") % 6 === 2, lit("garbage"))
        .when(col("c_custkey") % 6 === 3, lit(null).cast("string"))
        .when(col("c_custkey") % 6 === 4, lit("-42.50"))
        .otherwise(dec.cast("string"))
      c.select(col("c_custkey"),
        C.cleanNumeric(raw).cast("double").as("n_clean"),
        C.cleanPrice(raw).cast("double").as("p_clean"))
        .orderBy(col("c_custkey"))
    }),

    // ---- F12/F13: multi-format date parse + date_id codec ---------------
    "f12_date_parse" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val dt = col("o_orderdate").cast("date")
      val raw = when(col("o_orderkey") % 5 === 0,
        date_format(dt, "yyyy-MM-dd"))
        .when(col("o_orderkey") % 5 === 1, date_format(dt, "dd/MM/yyyy"))
        .when(col("o_orderkey") % 5 === 2, date_format(dt, "yyyyMMdd"))
        .when(col("o_orderkey") % 5 === 3, lit("not a date"))
        .otherwise(lit(null).cast("string"))
      o.select(col("o_orderkey"),
        C.parseDateMulti(raw).as("parsed"),
        C.dateId(C.parseDateMulti(raw)).as("date_id"))
        .orderBy(col("o_orderkey"))
    }),

    // ---- F18/F19/F20: standardization maps ------------------------------
    "f18_standardize" -> ((s, d) => {
      val p = Tables.part(s, d)
      val rawCat = when(col("p_partkey") % 6 === 0, lit("personal care"))
        .when(col("p_partkey") % 6 === 1, lit("FOOD"))
        .when(col("p_partkey") % 6 === 2, lit("drinks"))
        .when(col("p_partkey") % 6 === 3, lit("Electronics"))
        .when(col("p_partkey") % 6 === 4, lit(null).cast("string"))
        .otherwise(lit("home care"))
      val rawSub = when(col("p_partkey") % 5 === 0, lit("atta"))
        .when(col("p_partkey") % 5 === 1, lit("DAL"))
        .when(col("p_partkey") % 5 === 2, lit("oils"))
        .when(col("p_partkey") % 5 === 3, lit("Quinoa"))
        .otherwise(lit(null).cast("string"))
      val rawBrand = when(col("p_partkey") % 4 === 0, lit("Saffola"))
        .when(col("p_partkey") % 4 === 1, lit("saffola"))
        .when(col("p_partkey") % 4 === 2, lit("NoSuchBrand"))
        .otherwise(lit(null).cast("string"))
      p.select(col("p_partkey"),
        RefData.standardizeCategory(rawCat).as("category"),
        RefData.standardizeSubcategory(rawSub).as("sub_category"),
        RefData.manufacturerFor(rawBrand).as("manufacturer"))
        .orderBy(col("p_partkey"))
    }),

    // ---- F21/F22: tiered discount + decimal money math ------------------
    "f21_discount_money" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val storeClass = when(col("l_orderkey") % 3 === 0,
        lit("Cash & Carry - Wholesale")).otherwise(lit("Retail"))
      val isChain = when(col("l_orderkey") % 2 === 0, lit("Y"))
        .otherwise(lit("N"))
      val gross = C.grossAmount(col("l_quantity"), col("l_extendedprice"))
      val pct = C.tieredDiscount(gross, storeClass, isChain)
      val disc = C.discountAmount(gross, pct)
      // money math stays DECIMAL end-to-end (F22); the FINAL projection is
      // cast to DOUBLE purely for driver-hash canonicalization (DuckDB's
      // DECIMAL→pandas repr differs from Spark's parquet DECIMAL).
      li.select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        col("l_suppkey"), col("l_extendedprice"),
        gross.cast("double").as("gross_amount"),
        pct.cast("decimal(6,4)").cast("double").as("discount_pct"),
        disc.cast("double").as("discount_amount"),
        C.netAmount(gross, disc).cast("double").as("net_amount"))
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          col("l_suppkey"), col("l_extendedprice"))
    }),

    // ---- F23/F24/F25/F26: tolerance compare, truncate, keys, sku --------
    "f23_misc_funcs" -> ((s, d) => {
      val p = Tables.part(s, d)
      val perturbed = when(col("p_partkey") % 7 === 0,
        col("p_retailprice") + 0.005)
        .when(col("p_partkey") % 7 === 1, col("p_retailprice") + 1.0)
        .when(col("p_partkey") % 7 === 2, lit(null).cast("double"))
        .otherwise(col("p_retailprice"))
      p.select(col("p_partkey"),
        C.numericChanged(col("p_retailprice"), perturbed).as("changed"),
        C.stringChanged(col("p_name"),
          when(col("p_partkey") % 3 === 0, lit(null).cast("string"))
            .otherwise(col("p_name"))).as("name_changed"),
        C.truncateTo(col("p_name"), 10).as("name10"),
        C.naturalKey(col("p_partkey"), col("p_size")).as("nk"),
        C.skuCode(lit("SKU"), col("p_brand"), col("p_type"),
          col("p_partkey")).as("sku"))
        .orderBy(col("p_partkey"))
    }),

    // ---- Unicode NFC normalization (f29) ---------------------------------
    // Every doc gets a decomposed-sequence suffix planted (e +
    // combining acute U+0301, u + combining diaeresis U+0308, plus an
    // already-composed é control); the native codegen'd expression
    // must compose them exactly as DuckDB's nfc_normalize (both are
    // UAX #15 implementations), shrinking the code-point length by
    // exactly the two combining marks. A pass-through (changed =
    // false where it should compose), an over-normalization (NFKC
    // would also fold compatibility chars), or a length drift breaks
    // the hash.
    "f29_nfc_normalize" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val planted = concat(col("text"),
        lit(" café über éclair"))
      docs.select(col("doc_id"),
          planted.as("raw"),
          C.normalizeUnicode(planted).as("norm"))
        .select(col("doc_id"),
          length(col("raw")).as("len_raw"),
          length(col("norm")).as("len_norm"),
          (col("norm") =!= col("raw")).as("changed"),
          substring(col("norm"), -17, 17).as("norm_tail"))
        .orderBy(col("doc_id"))
    }),

    // ---- URL canonicalization / host / registered domain ----------------
    // Deterministic messy URLs from o_orderkey: mixed-case scheme and
    // host, default AND mismatched ports, tracking params in every
    // query position, fragments, trailing slashes, three suffix
    // classes (com / co.uk / github.io). The oracle rebuilds the same
    // strings and replays the identical normalization chain in RE2.
    "url1_canonicalize" -> ((s, d) => {
      val k = col("o_orderkey")
      val url = concat(
        when(k % 4 === 0, lit("HTTP://"))
          .when(k % 4 === 1, lit("https://"))
          .when(k % 4 === 2, lit("https://WWW."))
          .otherwise(lit("http://www.")),
        lit("Shop-"), (k % 50).cast("string"), lit(".Example."),
        when(k % 3 === 0, lit("com")).when(k % 3 === 1, lit("co.uk"))
          .otherwise(lit("github.io")),
        when(k % 5 === 0, lit(":443")).when(k % 5 === 1, lit(":80"))
          .otherwise(lit("")),
        lit("/p/"), (k % 97).cast("string"),
        when(k % 7 === 0, lit("/")).otherwise(lit("")),
        when(k % 6 === 0,
          concat(lit("?utm_source=news&id="), k.cast("string")))
          .when(k % 6 === 1, concat(lit("?id="), k.cast("string"),
            lit("&utm_campaign=x&utm_medium=em")))
          .when(k % 6 === 2, lit("?utm_a=1&utm_b=2"))
          .otherwise(lit("")),
        when(k % 2 === 0, lit("#Section-2")).otherwise(lit("")))
      Tables.orders(s, d).select(k.as("o_orderkey"), url.as("url"))
        .select(col("o_orderkey"),
          UrlOps.canonicalizeUrl(col("url")).as("canon_url"),
          UrlOps.hostOf(col("url")).as("host"),
          UrlOps.registeredDomain(UrlOps.hostOf(col("url")))
            .as("reg_domain"))
        .orderBy(col("o_orderkey"))
    }),

    // ---- URL-domain + lexicon blocklist (C4/RefinedWeb front gate) -------
    // Each doc gets a deterministic source-derived URL; the report runs
    // the REAL host/registered-domain chain on the engine side while
    // the oracle derives the domain independently from the construction
    // — so a regression anywhere in hostOf/registeredDomain flips the
    // domain (and the hash), and the lexicon fraction, both verdict
    // legs, and the OR are replayed token for token.
    "url2_blocklist" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("source"), col("text"))
        .withColumn("url", concat(lit("https://www."), col("source"),
          (col("doc_id") % 7).cast("string"), lit(".com/p/"),
          col("doc_id").cast("string")))
      graft.operators.Curation.blocklistReport(docs, "url", "text",
        blockedDomains = Seq("src03.com", "src12.com", "src155.com"),
        lexicon = Seq("slow", "big", "merge"), maxBadFrac = 0.08)
        .select(col("doc_id"), col("domain"), col("domain_blocked"),
          col("bad_hits"), col("word_count"), col("bad_frac"),
          col("blocked"))
        .orderBy(col("doc_id"))
    }),
  )

  /** DuckDB replay of [[graft.functions.UrlOps.registeredDomain]]'s
    * longest-suffix-wins fold, generated from the SAME suffix list so
    * the two cannot drift. */
  private val regDomSql: String = {
    val ordered = UrlOps.publicSuffixes.sortBy(s => (-s.count(_ == '.'), s))
    val chain = ordered.foldRight("NULL") { case (sfx, rest) =>
      val esc = sfx.replace(".", "\\.")
      s"CASE WHEN host LIKE '%.$sfx' THEN " +
        s"nullif(regexp_extract(host, '([^.]+\\.$esc)$$', 1), '') " +
        s"ELSE $rest END"
    }
    // mirror the Spark side's bare-public-suffix guard exactly
    val bare = UrlOps.publicSuffixes.map(s => s"'$s'").mkString(", ")
    s"CASE WHEN host IN ($bare) THEN NULL ELSE $chain END"
  }

  def oracles: Map[String, String] = Map(
    "url1_canonicalize" ->
      s"""WITH u AS (
        |  SELECT o_orderkey,
        |    (CASE WHEN o_orderkey % 4 = 0 THEN 'HTTP://'
        |          WHEN o_orderkey % 4 = 1 THEN 'https://'
        |          WHEN o_orderkey % 4 = 2 THEN 'https://WWW.'
        |          ELSE 'http://www.' END
        |     || 'Shop-' || CAST(o_orderkey % 50 AS VARCHAR) || '.Example.'
        |     || CASE WHEN o_orderkey % 3 = 0 THEN 'com'
        |             WHEN o_orderkey % 3 = 1 THEN 'co.uk'
        |             ELSE 'github.io' END
        |     || CASE WHEN o_orderkey % 5 = 0 THEN ':443'
        |             WHEN o_orderkey % 5 = 1 THEN ':80' ELSE '' END
        |     || '/p/' || CAST(o_orderkey % 97 AS VARCHAR)
        |     || CASE WHEN o_orderkey % 7 = 0 THEN '/' ELSE '' END
        |     || CASE WHEN o_orderkey % 6 = 0
        |          THEN '?utm_source=news&id=' || CAST(o_orderkey AS VARCHAR)
        |          WHEN o_orderkey % 6 = 1
        |          THEN '?id=' || CAST(o_orderkey AS VARCHAR)
        |            || '&utm_campaign=x&utm_medium=em'
        |          WHEN o_orderkey % 6 = 2 THEN '?utm_a=1&utm_b=2'
        |          ELSE '' END
        |     || CASE WHEN o_orderkey % 2 = 0 THEN '#Section-2'
        |          ELSE '' END) AS url
        |  FROM orders),
        |s1 AS (SELECT o_orderkey, url,
        |  regexp_replace(url, '#.*', '', 'g') AS nofrag FROM u),
        |s2 AS (SELECT *, regexp_extract(nofrag,
        |  '^([^/?#]*://[^/?#]*)', 1) AS pre FROM s1),
        |s3 AS (SELECT o_orderkey, url, CASE WHEN pre = '' THEN nofrag
        |  ELSE lower(pre) ||
        |    regexp_replace(nofrag, '^[^/?#]*://[^/?#]*', '') END AS c
        |  FROM s2),
        |s4 AS (SELECT o_orderkey, url, regexp_replace(regexp_replace(c,
        |  '^(https://[^/?#:]*):443($$|[/?#].*)', '\\1\\2'),
        |  '^(http://[^/?#:]*):80($$|[/?#].*)', '\\1\\2') AS c FROM s3),
        |s5 AS (SELECT o_orderkey, url, regexp_replace(regexp_replace(c,
        |  '([?&])(utm_[^=&#]*|fbclid|gclid)=[^&#]*&', '\\1', 'g'),
        |  '[?&](utm_[^=&#]*|fbclid|gclid)=[^&#]*$$', '') AS c FROM s4),
        |s6 AS (SELECT o_orderkey, url,
        |  regexp_replace(c, '/$$', '') AS canon_url FROM s5),
        |h AS (SELECT o_orderkey, canon_url, lower(regexp_extract(url,
        |  '^[^/?#]*://([^/?#@]*@)?([^/?#:]*)', 2)) AS host FROM s6)
        |SELECT o_orderkey, canon_url, host, $regDomSql AS reg_domain
        |FROM h ORDER BY o_orderkey""".stripMargin,

    // domain derived independently from the URL construction (the
    // engine side must reproduce it through the real
    // hostOf/registeredDomain chain); lexicon fraction and both
    // verdict legs replayed
    "url2_blocklist" ->
      """WITH base AS (
        |  SELECT doc_id,
        |    source || CAST(doc_id % 7 AS VARCHAR) || '.com' AS domain,
        |    list_filter(string_split_regex(
        |      lower(trim(coalesce(text, ''))), '\s+'),
        |      x -> x <> '') AS ws
        |  FROM documents),
        |m AS (
        |  SELECT doc_id, domain,
        |    domain IN ('src03.com', 'src12.com', 'src155.com')
        |      AS domain_blocked,
        |    len(list_filter(ws,
        |      w -> list_contains(['slow', 'big', 'merge'], w))) AS bh,
        |    len(ws) AS wc
        |  FROM base),
        |f AS (
        |  SELECT doc_id, domain, domain_blocked,
        |    CAST(bh AS INTEGER) AS bad_hits,
        |    CAST(wc AS INTEGER) AS word_count,
        |    CASE WHEN wc = 0 THEN 0.0
        |      ELSE round(CAST(bh AS DOUBLE) / wc, 6) END AS bad_frac
        |  FROM m)
        |SELECT doc_id, domain, domain_blocked, bad_hits, word_count,
        |  bad_frac, domain_blocked OR bad_frac > 0.08 AS blocked
        |FROM f ORDER BY doc_id""".stripMargin,
    "f2_text_cleaning" ->
      """WITH messy AS (
        |  SELECT c_custkey,
        |    CASE WHEN c_custkey % 5 = 0 THEN NULL
        |         WHEN c_custkey % 5 = 1 THEN '   '
        |         ELSE '  ' || c_name || '   x  y  ' END AS raw
        |  FROM customer)
        |SELECT c_custkey,
        |  CASE WHEN raw IS NULL OR trim(raw)='' THEN NULL
        |       ELSE trim(raw) END AS t_clean,
        |  CASE WHEN raw IS NULL OR trim(raw)='' THEN 'UNKNOWN STORE'
        |       ELSE upper(regexp_replace(trim(raw),'\s+',' ','g')) END
        |    AS t_store,
        |  CASE WHEN raw IS NULL OR trim(raw)='' THEN NULL
        |       ELSE upper(regexp_replace(trim(raw),'\s+',' ','g')) END
        |    AS t_addr,
        |  CASE WHEN raw IS NULL OR trim(raw)='' THEN ''
        |       ELSE upper(trim(raw)) END AS t_key
        |FROM messy ORDER BY c_custkey""".stripMargin,

    "f4_city_state" ->
      s"""WITH messy AS (
         |  SELECT n_nationkey,
         |    CASE WHEN n_nationkey % 4 = 0 THEN NULL
         |         ELSE ' ' || lower(n_name) || ' city ' END AS raw
         |  FROM nation)
         |SELECT n_nationkey,
         |  CASE WHEN raw IS NULL OR trim(raw)='' THEN 'UNKNOWN'
         |       ELSE ${initcapSql("trim(raw)")} END AS city
         |FROM messy ORDER BY n_nationkey""".stripMargin,

    "f5_zip" ->
      """WITH messy AS (
        |  SELECT c_custkey,
        |    CASE WHEN c_custkey % 3 = 0
        |           THEN 'PIN-' || lpad(CAST(c_custkey*37 AS VARCHAR),7,'0')
        |         WHEN c_custkey % 3 = 1 THEN CAST(c_custkey % 1000 AS VARCHAR)
        |         ELSE NULL END AS raw
        |  FROM customer)
        |SELECT c_custkey,
        |  CASE WHEN raw IS NULL THEN NULL
        |       WHEN length(regexp_replace(trim(raw),'[^0-9]','','g')) >= 6
        |         THEN substr(regexp_replace(trim(raw),'[^0-9]','','g'),1,6)
        |       ELSE NULL END AS zip
        |FROM messy ORDER BY c_custkey""".stripMargin,

    "f6_keyword_ladders" ->
      s"""WITH messy AS (
         |  SELECT c_custkey,
         |    CASE c_custkey % 7
         |      WHEN 0 THEN 'mega HYPERMARKET zone' WHEN 1 THEN 'corner kirana'
         |      WHEN 2 THEN '' WHEN 3 THEN 'WHOLESALE hub'
         |      WHEN 4 THEN ' The Retailer ' WHEN 5 THEN 'general trade shop'
         |      ELSE 'boutique' END AS cot_raw,
         |    CASE c_custkey % 5
         |      WHEN 0 THEN 'pan india' WHEN 1 THEN 'multi state'
         |      WHEN 2 THEN NULL WHEN 3 THEN 'city level'
         |      ELSE 'weird type' END AS dt_raw
         |  FROM customer)
         |SELECT c_custkey,
         |  CASE WHEN cot_raw IS NULL OR trim(cot_raw)='' THEN 'General Trade'
         |    WHEN upper(trim(cot_raw)) LIKE '%HYPERMARKET%'
         |      THEN 'Modern Trade - Hypermarket'
         |    WHEN upper(trim(cot_raw)) LIKE '%SUPERMARKET%'
         |      THEN 'Modern Trade - Supermarket'
         |    WHEN upper(trim(cot_raw)) LIKE '%KIRANA%'
         |      THEN 'General Trade - Kirana'
         |    WHEN upper(trim(cot_raw)) LIKE '%GENERAL TRADE%'
         |      THEN 'General Trade - Kirana'
         |    WHEN upper(trim(cot_raw)) LIKE '%CONVENIENCE%'
         |      THEN 'Convenience Store'
         |    WHEN upper(trim(cot_raw)) LIKE '%WHOLESALE%'
         |      THEN 'Cash & Carry - Wholesale'
         |    WHEN upper(trim(cot_raw)) LIKE '%RETAIL%' THEN 'Retail'
         |    ELSE trim(cot_raw) END AS cot,
         |  CASE WHEN dt_raw IS NULL OR trim(dt_raw)='' THEN 'Local'
         |    WHEN upper(trim(dt_raw)) LIKE '%NATIONAL%' THEN 'National'
         |    WHEN upper(trim(dt_raw)) LIKE '%NAT%' THEN 'National'
         |    WHEN upper(trim(dt_raw)) LIKE '%PAN INDIA%' THEN 'National'
         |    WHEN upper(trim(dt_raw)) LIKE '%REGIONAL%' THEN 'Regional'
         |    WHEN upper(trim(dt_raw)) LIKE '%REG%' THEN 'Regional'
         |    WHEN upper(trim(dt_raw)) LIKE '%MULTI STATE%' THEN 'Regional'
         |    WHEN upper(trim(dt_raw)) LIKE '%LOCAL%' THEN 'Local'
         |    WHEN upper(trim(dt_raw)) LIKE '%CITY%' THEN 'Local'
         |    WHEN upper(trim(dt_raw)) LIKE '%DISTRICT%' THEN 'Local'
         |    ELSE ${initcapSql("trim(dt_raw)")} END AS dtype
         |FROM messy ORDER BY c_custkey""".stripMargin,

    "f7_flags" ->
      s"""WITH messy AS (
         |  SELECT c_custkey,
         |    CASE c_custkey % 8
         |      WHEN 0 THEN 'yes' WHEN 1 THEN 'TRUE' WHEN 2 THEN '1'
         |      WHEN 3 THEN 'ACTIVE' WHEN 4 THEN 'a' WHEN 5 THEN 'no'
         |      WHEN 6 THEN '' ELSE NULL END AS tok,
         |    CASE WHEN c_custkey % 3 = 0 THEN NULL
         |         ELSE 'big  bazaar ' || CAST(c_custkey % 10 AS VARCHAR)
         |    END AS cn_raw
         |  FROM customer),
         |step1 AS (
         |  SELECT c_custkey, cn_raw,
         |    CASE WHEN tok IS NULL OR trim(tok)='' THEN 'N'
         |         WHEN upper(trim(tok)) IN ('Y','YES','1','TRUE') THEN 'Y'
         |         ELSE 'N' END AS is_chain_raw,
         |    CASE WHEN tok IS NULL OR trim(tok)='' THEN 'Y'
         |         WHEN upper(trim(tok)) IN
         |           ('Y','YES','1','TRUE','ACTIVE','A') THEN 'Y'
         |         ELSE 'N' END AS active_flag
         |  FROM messy),
         |step2 AS (
         |  SELECT *,
         |    CASE WHEN is_chain_raw='N' OR cn_raw IS NULL OR trim(cn_raw)=''
         |         THEN NULL
         |         ELSE ${initcapSql("regexp_replace(trim(cn_raw),'\\s+',' ','g')")}
         |    END AS chain_name
         |  FROM step1)
         |SELECT c_custkey, is_chain_raw, active_flag, chain_name,
         |  CASE WHEN is_chain_raw='Y' AND chain_name IS NULL THEN 'N'
         |       ELSE is_chain_raw END AS is_chain
         |FROM step2 ORDER BY c_custkey""".stripMargin,

    "f10_numeric_clean" ->
      """WITH messy AS (
        |  SELECT c_custkey,
        |    CASE c_custkey % 6
        |      WHEN 0 THEN '₹' || CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS VARCHAR)
        |      WHEN 1 THEN '$ ' || CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS VARCHAR)
        |      WHEN 2 THEN 'garbage' WHEN 3 THEN NULL WHEN 4 THEN '-42.50'
        |      ELSE CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS VARCHAR)
        |    END AS raw
        |  FROM customer)
        |SELECT c_custkey,
        |  CASE WHEN raw IS NULL OR trim(raw)='' THEN NULL
        |    ELSE (CASE WHEN TRY_CAST(trim(regexp_replace(raw,'[₹$,]','','g'))
        |                 AS DECIMAL(18,4)) >= 0
        |          THEN CAST(TRY_CAST(trim(regexp_replace(raw,'[₹$,]','','g'))
        |                 AS DECIMAL(18,4)) AS DOUBLE) END)
        |  END AS n_clean,
        |  CASE WHEN raw IS NULL THEN NULL
        |    ELSE (CASE WHEN TRY_CAST(regexp_replace(raw,'[₹$,\s]','','g')
        |                 AS DECIMAL(18,4)) > 0
        |            AND TRY_CAST(regexp_replace(raw,'[₹$,\s]','','g')
        |                 AS DECIMAL(18,4)) <= 100000
        |          THEN CAST(TRY_CAST(regexp_replace(raw,'[₹$,\s]','','g')
        |                 AS DECIMAL(18,4)) AS DOUBLE) END)
        |  END AS p_clean
        |FROM messy ORDER BY c_custkey""".stripMargin,

    "f12_date_parse" ->
      """WITH messy AS (
        |  SELECT o_orderkey,
        |    CASE o_orderkey % 5
        |      WHEN 0 THEN strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d')
        |      WHEN 1 THEN strftime(CAST(o_orderdate AS DATE), '%d/%m/%Y')
        |      WHEN 2 THEN strftime(CAST(o_orderdate AS DATE), '%Y%m%d')
        |      WHEN 3 THEN 'not a date' ELSE NULL END AS raw,
        |    CAST(o_orderdate AS DATE) AS truth
        |  FROM orders)
        |SELECT o_orderkey,
        |  CASE WHEN o_orderkey % 5 IN (0,1,2) THEN truth END AS parsed,
        |  CASE WHEN o_orderkey % 5 IN (0,1,2)
        |       THEN CAST(strftime(truth,'%Y%m%d') AS INTEGER) END AS date_id
        |FROM messy ORDER BY o_orderkey""".stripMargin,

    "f18_standardize" ->
      """SELECT p_partkey,
        |  CASE p_partkey % 6
        |    WHEN 0 THEN 'PersonalCare' WHEN 1 THEN 'Grocery'
        |    WHEN 2 THEN 'Beverage' WHEN 3 THEN 'Electronics'
        |    WHEN 4 THEN 'General' ELSE 'HomeCare' END AS category,
        |  CASE p_partkey % 5
        |    WHEN 0 THEN 'Wheat Flour' WHEN 1 THEN 'Pulses'
        |    WHEN 2 THEN 'Edible Oil' WHEN 3 THEN 'Quinoa'
        |    ELSE 'General' END AS sub_category,
        |  CASE p_partkey % 4
        |    WHEN 0 THEN 'Marico' WHEN 1 THEN 'Marico'
        |    ELSE 'Generic' END AS manufacturer
        |FROM part ORDER BY p_partkey""".stripMargin,

    "f21_discount_money" ->
      """WITH base AS (
        |  SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
        |    l_extendedprice,
        |    CAST(ROUND(CAST(l_quantity AS DECIMAL(12,2))
        |      * CAST(l_extendedprice AS DECIMAL(12,2)), 2)
        |      AS DECIMAL(12,2)) AS gross_amount,
        |    CASE WHEN l_orderkey % 3 = 0 THEN 0.08 ELSE 0.0 END AS base_pct,
        |    CASE WHEN l_orderkey % 2 = 0 THEN 0.03 ELSE 0.0 END AS chain_pct
        |  FROM lineitem),
        |pct AS (
        |  SELECT *,
        |    CAST(least(base_pct + chain_pct +
        |      CASE WHEN gross_amount >= 20000 THEN 0.15
        |           WHEN gross_amount >= 10000 THEN 0.10
        |           WHEN gross_amount >= 5000  THEN 0.07
        |           WHEN gross_amount >= 2000  THEN 0.05
        |           ELSE 0.02 END, 0.20) AS DECIMAL(6,4)) AS discount_pct
        |  FROM base),
        |calc AS (
        |  SELECT *,
        |    CAST(ROUND(gross_amount * discount_pct, 2) AS DECIMAL(12,2))
        |      AS discount_amount
        |  FROM pct)
        |SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
        |  l_extendedprice,
        |  CAST(gross_amount AS DOUBLE) AS gross_amount,
        |  CAST(discount_pct AS DOUBLE) AS discount_pct,
        |  CAST(discount_amount AS DOUBLE) AS discount_amount,
        |  CAST(CAST(gross_amount - discount_amount AS DECIMAL(12,2))
        |    AS DOUBLE) AS net_amount
        |FROM calc
        |ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey,
        |  l_extendedprice""".stripMargin,

    "f23_misc_funcs" ->
      """WITH base AS (
        |  SELECT p_partkey, p_name, p_brand, p_type, p_size, p_retailprice,
        |    CASE WHEN p_partkey % 7 = 0 THEN p_retailprice + 0.005
        |         WHEN p_partkey % 7 = 1 THEN p_retailprice + 1.0
        |         WHEN p_partkey % 7 = 2 THEN NULL
        |         ELSE p_retailprice END AS perturbed,
        |    CASE WHEN p_partkey % 3 = 0 THEN NULL ELSE p_name END AS name2
        |  FROM part)
        |SELECT p_partkey,
        |  ((p_retailprice IS NULL) != (perturbed IS NULL))
        |    OR (p_retailprice IS NOT NULL AND perturbed IS NOT NULL
        |        AND abs(p_retailprice - perturbed) > 0.01) AS changed,
        |  NOT (COALESCE(p_name,'') IS NOT DISTINCT FROM COALESCE(name2,''))
        |    AS name_changed,
        |  substr(p_name, 1, 10) AS name10,
        |  CAST(p_partkey AS VARCHAR) || '_' || CAST(p_size AS VARCHAR) AS nk,
        |  'SKU' || '-' ||
        |    substr(regexp_replace(upper(p_brand),'[^A-Z]','','g'),1,3) || '-' ||
        |    substr(regexp_replace(upper(p_type),'[^A-Z]','','g'),1,3) || '-' ||
        |    lpad(CAST(p_partkey AS VARCHAR),5,'0') AS sku
        |FROM base ORDER BY p_partkey""".stripMargin,

    // f29: DuckDB's nfc_normalize is the same UAX #15 algorithm the
    // JDK implements; the planted suffix is rebuilt from chr() code
    // points so the decomposed bytes are explicit in the SQL
    "f29_nfc_normalize" ->
      """WITH p AS (
        |  SELECT doc_id,
        |    text || ' cafe' || chr(769) || ' u' || chr(776) || 'ber '
        |      || chr(233) || 'clair' AS raw
        |  FROM documents),
        |n AS (SELECT doc_id, raw, nfc_normalize(raw) AS norm FROM p)
        |SELECT doc_id,
        |  CAST(length(raw) AS INT) AS len_raw,
        |  CAST(length(norm) AS INT) AS len_norm,
        |  norm <> raw AS changed,
        |  right(norm, 17) AS norm_tail
        |FROM n ORDER BY doc_id""".stripMargin,
  )
}
