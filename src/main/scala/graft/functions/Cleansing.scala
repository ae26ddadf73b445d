package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** The reference's cleansing-expression library (SURVEY.md §2.7 F1-F26),
  * re-expressed as pure `Column => Column` builders — no UDFs, so every
  * function stays inside whole-stage codegen and is usable at 100 TB with
  * zero serialization overhead.
  *
  * Semantics are pinned to the reference implementations (cited per
  * function); the table-driven spec in CleansingSpec asserts the edge
  * cases (null defaults, keyword precedence, tolerance).
  */
object Cleansing {

  /** Collapse internal whitespace runs to a single space (shared helper). */
  private def ws(c: Column): Column = regexp_replace(trim(c), "\\s+", " ")

  /** Null-or-blank guard: true when the value is null or trims to "". */
  private def blank(c: Column): Column = c.isNull || trim(c) === ""

  // ---- F1: clean_text (load_dim_product_dw.py:282-285) -----------------
  /** null/blank → null, else trim. */
  def cleanText(c: Column): Column =
    when(blank(c), lit(null)).otherwise(trim(c))

  // ---- F2: clean_store_name (load_dim_store_dw.py:39-42) ---------------
  /** null/blank → "UNKNOWN STORE"; collapse whitespace; UPPER. */
  def cleanStoreName(c: Column): Column =
    when(blank(c), lit("UNKNOWN STORE")).otherwise(upper(ws(c)))

  // ---- F3: clean_address (load_dim_store_dw.py:44-47) ------------------
  /** null/blank → null; collapse whitespace; UPPER. */
  def cleanAddress(c: Column): Column =
    when(blank(c), lit(null)).otherwise(upper(ws(c)))

  // ---- F4: clean_city / clean_state (load_dim_store_dw.py:49-57) -------
  /** null/blank → "UNKNOWN"; Title Case.
    * NOTE Python str.title() capitalizes after ANY non-letter
    * ("o'brien"→"O'Brien"); Spark initcap capitalizes after whitespace
    * only. Identical on plain word-per-space names, which is the entire
    * domain here (city/state names).
    */
  def cleanCity(c: Column): Column =
    when(blank(c), lit("UNKNOWN")).otherwise(initcap(trim(c)))
  def cleanState(c: Column): Column = cleanCity(c)

  // ---- F5: clean_zip (load_dim_store_dw.py:59-65) ----------------------
  /** strip non-digits; >=6 digits → first 6, else null. */
  def cleanZip(c: Column): Column = {
    val digits = regexp_replace(trim(c), "[^0-9]", "")
    when(c.isNull, lit(null))
      .when(length(digits) >= 6, substring(digits, 1, 6))
      .otherwise(lit(null))
  }

  // ---- F6: clean_class_of_trade (load_dim_store_dw.py:67-83) -----------
  /** contains-keyword mapping, checked in declaration order (first hit
    * wins); null/blank → "General Trade"; no match → trimmed passthrough.
    */
  val classOfTradeRules: Seq[(String, String)] = Seq(
    "HYPERMARKET"   -> "Modern Trade - Hypermarket",
    "SUPERMARKET"   -> "Modern Trade - Supermarket",
    "KIRANA"        -> "General Trade - Kirana",
    "GENERAL TRADE" -> "General Trade - Kirana",
    "CONVENIENCE"   -> "Convenience Store",
    "WHOLESALE"     -> "Cash & Carry - Wholesale",
    "RETAIL"        -> "Retail")
  def cleanClassOfTrade(c: Column): Column =
    containsKeywordMap(c, classOfTradeRules,
      onNull = "General Trade", noMatch = trim(c))

  // ---- F7: clean_is_chain / clean_active_flag ---------------------------
  /** Truthy-token normalization to 'Y'/'N'. The two flags have DIFFERENT
    * null defaults (is_chain→'N', active_flag→'Y') and different truthy
    * sets — an easy silent bug, pinned by spec.
    * (load_dim_store_dw.py:85-88; load_dim_distributor_dw.py:67-70)
    */
  def cleanIsChain(c: Column): Column =
    when(blank(c), lit("N"))
      .when(upper(trim(c)).isin("Y", "YES", "1", "TRUE"), lit("Y"))
      .otherwise(lit("N"))
  def cleanActiveFlag(c: Column): Column =
    when(blank(c), lit("Y"))
      .when(upper(trim(c)).isin("Y", "YES", "1", "TRUE", "ACTIVE", "A"),
        lit("Y"))
      .otherwise(lit("N"))

  // ---- F8: clean_chain_name (load_dim_store_dw.py:90-93) ---------------
  /** null when not a chain or blank; else whitespace-collapsed Title Case. */
  def cleanChainName(name: Column, isChain: Column): Column =
    when(isChain === "N" || blank(name), lit(null))
      .otherwise(initcap(ws(name)))

  /** Chain-with-no-name demotion (load_dim_store_dw.py:169-172): a 'Y'
    * chain flag with a null cleaned chain name is demoted to 'N'. */
  def demoteChainFlag(isChain: Column, chainName: Column): Column =
    when(isChain === "Y" && chainName.isNull, lit("N")).otherwise(isChain)

  // ---- F9: clean_distributor_type (load_dim_distributor_dw.py:53-65) ---
  /** contains-keyword map in declaration order; null/blank → "Local";
    * no match → trimmed Title Case passthrough. */
  val distributorTypeRules: Seq[(String, String)] = Seq(
    "NATIONAL" -> "National", "NAT" -> "National", "PAN INDIA" -> "National",
    "REGIONAL" -> "Regional", "REG" -> "Regional", "MULTI STATE" -> "Regional",
    "LOCAL" -> "Local", "CITY" -> "Local", "DISTRICT" -> "Local")
  def cleanDistributorType(c: Column): Column =
    containsKeywordMap(c, distributorTypeRules,
      onNull = "Local", noMatch = initcap(trim(c)))

  /** Shared contains-keyword rule ladder: first rule whose key is a
    * substring of UPPER(trim(c)) wins. Constant-folded when-chain —
    * codegen-friendly, no join, no UDF. */
  def containsKeywordMap(c: Column, rules: Seq[(String, String)],
      onNull: String, noMatch: Column): Column = {
    val u = upper(trim(c))
    val ladder = rules.foldLeft(when(blank(c), lit(onNull))) {
      case (acc, (k, v)) => acc.when(u.contains(k), lit(v))
    }
    ladder.otherwise(noMatch)
  }

  // ---- F10: clean_numeric / clean_price --------------------------------
  /** Strip currency tokens and separators, parse, null on failure.
    * `cast` to decimal yields null on garbage = pandas errors='coerce'.
    * Fact variant (load_fact_sales_dw.py:45-54): strips ₹ $ , ; rejects
    * negatives (keeps 0). Product price variant
    * (load_dim_product_dw.py:313-323): also strips whitespace; keeps only
    * 0 < p <= 100000. Validator variant (validate_table.py:174-197):
    * additionally strips Rs / Rs. prefixes.
    */
  def cleanNumeric(c: Column): Column = {
    val stripped = trim(regexp_replace(c.cast("string"), "[₹$,]", ""))
    val n = stripped.try_cast(DecimalType(18, 4))
    when(blank(c), lit(null)).otherwise(when(n >= 0, n))
  }
  def cleanPrice(c: Column): Column = {
    val stripped = regexp_replace(c.cast("string"), "[₹$,\\s]", "")
    val n = stripped.try_cast(DecimalType(18, 4))
    when(c.isNull, lit(null))
      .otherwise(when(n > 0 && n <= 100000, n))
  }
  def cleanNumericValidator(c: Column): Column = {
    val stripped =
      trim(regexp_replace(c.cast("string"), "(?i)Rs\\.?|[₹$,\\s]", ""))
    stripped.try_cast(DecimalType(18, 4))
  }

  // ---- F11: normalize_key (load_fact_sales_dw.py:40-43) ----------------
  /** Join-key canonicalization: null/blank → "", else TRIM+UPPER. Must be
    * applied to BOTH sides of every dim-key lookup join. */
  def normalizeKey(c: Column): Column =
    when(blank(c), lit("")).otherwise(upper(trim(c)))

  /** Unicode NFC normalization — run this BEFORE any byte-keyed
    * operator (exact dedup, MinHash shingles, dictionary joins): the
    * same visible text has multiple encodings ("é" composed vs
    * e + combining accent) and hash keys split on the difference.
    * Native codegen'd expression; see
    * [[graft.expressions.NfcNormalize]]. */
  def normalizeUnicode(c: Column): Column =
    graft.expressions.NfcNormalize.nfcNormalize(c)

  // ---- F12: multi-format date parse with coerce ------------------------
  /** pd.to_datetime(errors='coerce') analog: try each format, null when
    * none parses. Formats cover the reference's observed interchange
    * formats (ISO, slashed, compact). */
  val defaultDateFormats: Seq[String] = Seq(
    "yyyy-MM-dd", "yyyy/MM/dd", "dd-MM-yyyy", "dd/MM/yyyy",
    "MM/dd/yyyy", "yyyyMMdd", "yyyy-MM-dd HH:mm:ss")
  def parseDateMulti(c: Column,
      formats: Seq[String] = defaultDateFormats): Column =
    coalesce(formats.map(f => try_to_timestamp(trim(c), lit(f)).cast("date")): _*)

  /** Date-range sanity (F-variant of P9, load_dim_distributor_dw.py:72-83):
    * parse then null outside [1990-01-01, today]. */
  def cleanBoundedDate(c: Column, lo: String, hi: Column): Column = {
    val d = parseDateMulti(c)
    when(d.between(lit(lo).cast("date"), hi), d)
  }

  // ---- F13: date_id codec (dim_date_daily.py:168,142) ------------------
  def dateId(c: Column): Column =
    date_format(c, "yyyyMMdd").cast("int")
  def dateFromId(c: Column): Column =
    to_date(c.cast("string"), "yyyyMMdd")

  // ---- F21: tiered discount (fact_sales_daily.py:115-129) --------------
  /** wholesale base 8% + volume tier (2-15%) + chain 3%, capped at 20%. */
  def tieredDiscount(gross: Column, storeClass: Column,
      isChain: Column): Column = {
    val base = when(storeClass.contains("Wholesale")
      || storeClass.contains("Cash & Carry"), lit(0.08)).otherwise(lit(0.0))
    val vol = when(gross >= 20000, 0.15).when(gross >= 10000, 0.10)
      .when(gross >= 5000, 0.07).when(gross >= 2000, 0.05).otherwise(0.02)
    val chain = when(isChain === "Y", lit(0.03)).otherwise(lit(0.0))
    least(base + vol + chain, lit(0.20))
  }

  // ---- F22: money arithmetic (fact_sales_daily.py:183-190) -------------
  /** Decimal money math: gross=round(qty*price,2), discount, net. Kept in
    * DecimalType end-to-end (the reference deliberately uses Decimal). */
  def grossAmount(qty: Column, price: Column): Column =
    round(qty.cast(DecimalType(12, 2)) * price.cast(DecimalType(12, 2)), 2)
      .cast(DecimalType(12, 2))
  def discountAmount(gross: Column, pct: Column): Column =
    round(gross.cast(DecimalType(12, 2)) * pct.cast(DecimalType(6, 4)), 2)
      .cast(DecimalType(12, 2))
  def netAmount(gross: Column, discount: Column): Column =
    (gross.cast(DecimalType(12, 2)) - discount.cast(DecimalType(12, 2)))
      .cast(DecimalType(12, 2))

  // ---- F23: change-tolerance compare (load_fact_sales_dw.py:340-348) ---
  /** Numeric change iff |a-b| > tol (default 0.01); null-safe: a null on
    * exactly one side counts as changed. */
  def numericChanged(a: Column, b: Column, tol: Double = 0.01): Column =
    (a.isNull =!= b.isNull) ||
      (a.isNotNull && b.isNotNull && abs(a - b) > tol)

  /** String change, null-safe through ''-coalescing:
    * (x or '') != (y or '') per load_dim_product_dw.py:523-541. */
  def stringChanged(a: Column, b: Column): Column =
    !(coalesce(a, lit("")) <=> coalesce(b, lit("")))

  // ---- F24: truncate-to-width (load_dim_store_dw.py:319-330) -----------
  def truncateTo(c: Column, n: Int): Column = substring(c, 1, n)

  // ---- F25: natural-key concat (load_fact_sales_dw.py:301-312) ---------
  def naturalKey(cols: Column*): Column = concat_ws("_", cols: _*)

  // ---- F26: SKU generator (dim_product_daily.py:938-946) ---------------
  /** PREFIX-BRD-SUB-00123: alpha-only uppercase 3-char codes + zero-padded
    * counter. */
  def skuCode(prefix: Column, brand: Column, subcat: Column,
      counter: Column): Column = {
    def code3(c: Column) =
      substring(regexp_replace(upper(c), "[^A-Z]", ""), 1, 3)
    concat_ws("-", prefix, code3(brand), code3(subcat),
      lpad(counter.cast("string"), 5, "0"))
  }

  // ---- F2-variant used by SKU counter continuation (W2) ----------------
  /** Parse the trailing counter from an existing SKU. */
  def skuCounter(sku: Column): Column =
    regexp_extract(sku, "-(\\d+)$", 1).cast("int")
}
