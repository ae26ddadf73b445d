package graft

import graft.functions.{Cleansing => C, RefData}
import org.apache.spark.sql.functions._

/** Table-driven edge-case pins for the cleansing library (SURVEY §2.7).
  * Each case mirrors the reference's Python semantics, including the
  * null-default asymmetries (§7.4 risk 4). */
class CleansingSpec extends SparkSpec {

  test("F1 cleanText: null/blank→null, else trim") {
    assert(evalStr(C.cleanText, Seq(null, "", "  ", " a b ", "x")) ===
      Seq(None, None, None, Some("a b"), Some("x")))
  }

  test("F2 cleanStoreName: blank→UNKNOWN STORE, collapse ws, upper") {
    assert(evalStr(C.cleanStoreName,
      Seq(null, " ", " big  bazaar  store ", "x")) ===
      Seq(Some("UNKNOWN STORE"), Some("UNKNOWN STORE"),
        Some("BIG BAZAAR STORE"), Some("X")))
  }

  test("F3 cleanAddress: blank→null, collapse ws, upper") {
    assert(evalStr(C.cleanAddress, Seq(null, "", " 12  mg   road ")) ===
      Seq(None, None, Some("12 MG ROAD")))
  }

  test("F4 cleanCity: blank→UNKNOWN, Title Case") {
    assert(evalStr(C.cleanCity, Seq(null, " ", "new  delhi", "MUMBAI")) ===
      Seq(Some("UNKNOWN"), Some("UNKNOWN"), Some("New  Delhi"), Some("Mumbai")))
  }

  test("F5 cleanZip: strip non-digits, >=6 → first 6, else null") {
    assert(evalStr(C.cleanZip,
      Seq(null, "560001", "560-001-99", "12345", "abc", " 5600011 ")) ===
      Seq(None, Some("560001"), Some("560001"), None, None, Some("560001")))
  }

  test("F6 cleanClassOfTrade: keyword order, defaults, passthrough") {
    assert(evalStr(C.cleanClassOfTrade, Seq(
      null, "", "Big HYPERMARKET chain", "local kirana shop",
      "general trade", "WHOLESALE hub", "something else", "Retailer")) ===
      Seq(Some("General Trade"), Some("General Trade"),
        Some("Modern Trade - Hypermarket"), Some("General Trade - Kirana"),
        Some("General Trade - Kirana"), Some("Cash & Carry - Wholesale"),
        Some("something else"), Some("Retail")))
  }

  test("F7 flag cleaning: asymmetric null defaults and truthy sets") {
    // is_chain: null→N; active_flag: null→Y; ACTIVE truthy only for active
    assert(evalStr(C.cleanIsChain,
      Seq(null, "", "yes", "TRUE", "1", "n", "ACTIVE", "garbage")) ===
      Seq(Some("N"), Some("N"), Some("Y"), Some("Y"), Some("Y"), Some("N"),
        Some("N"), Some("N")))
    assert(evalStr(C.cleanActiveFlag,
      Seq(null, "", "yes", "ACTIVE", "a", "0", "no")) ===
      Seq(Some("Y"), Some("Y"), Some("Y"), Some("Y"), Some("Y"), Some("N"),
        Some("N")))
  }

  test("F8 cleanChainName + demotion") {
    val df = strDf(Seq("reliance  fresh", null, "spencer's"), "name")
      .withColumn("is_chain",
        when(col("name").isNull, "Y").otherwise(lit("Y")))
    val out = df.select(
      C.cleanChainName(col("name"), col("is_chain")).as("cn")).collect()
    assert(Option(out(0).getString(0)) === Some("Reliance Fresh"))
    assert(Option(out(1).getString(0)) === None)
    val demoted = df.select(C.demoteChainFlag(col("is_chain"),
      C.cleanChainName(col("name"), col("is_chain"))).as("f")).collect()
    assert(demoted.map(_.getString(0)).toSeq === Seq("Y", "N", "Y"))
  }

  test("F9 cleanDistributorType: keyword precedence + title passthrough") {
    assert(evalStr(C.cleanDistributorType, Seq(
      null, "pan india", "INTERNATIONAL", "multi state", "city dist",
      "weird type")) ===
      Seq(Some("Local"), Some("National"), Some("National"), Some("Regional"),
        Some("Local"), Some("Weird Type")))
  }

  test("F10 cleanNumeric: currency strip, coerce, negative reject") {
    assert(evalStr(C.cleanNumeric,
      Seq(null, "", "₹1,234.50", "$99", "-5", "0", "abc", " 12.3 ")) ===
      Seq(None, None, Some("1234.5000"), Some("99.0000"), None,
        Some("0.0000"), None, Some("12.3000")))
  }

  test("F10 cleanPrice: 0 < p <= 100000 else null") {
    assert(evalStr(C.cleanPrice,
      Seq("0", "100000", "100000.01", "₹ 2 500", "-1", "junk")) ===
      Seq(None, Some("100000.0000"), None, Some("2500.0000"), None, None))
  }

  test("F11 normalizeKey: null/blank→'', trim+upper") {
    assert(evalStr(C.normalizeKey, Seq(null, "", "  ", " ab c ")) ===
      Seq(Some(""), Some(""), Some(""), Some("AB C")))
  }

  test("F12 parseDateMulti: multi-format coerce") {
    assert(evalStr(c => C.parseDateMulti(c), Seq(
      "2024-03-31", "2024/03/31", "31-03-2024", "20240331",
      "2024-03-31 10:30:00", "not a date", null)) ===
      Seq(Some("2024-03-31"), Some("2024-03-31"), Some("2024-03-31"),
        Some("2024-03-31"), Some("2024-03-31"), None, None))
  }

  test("F13 dateId codec roundtrip") {
    val out = strDf(Seq("2024-03-31")).select(
      C.dateId(col("v").cast("date")).as("id"),
      C.dateFromId(C.dateId(col("v").cast("date"))).cast("string").as("back"))
      .collect().head
    assert(out.getInt(0) === 20240331)
    assert(out.getString(1) === "2024-03-31")
  }

  test("F21 tieredDiscount tiers, bonuses, cap") {
    val rows = Seq(
      (1000.0, "Retail", "N", 0.02),
      (2500.0, "Retail", "N", 0.05),
      (6000.0, "Retail", "N", 0.07),
      (15000.0, "Retail", "N", 0.10),
      (25000.0, "Retail", "N", 0.15),
      (25000.0, "Cash & Carry - Wholesale", "N", 0.20), // 0.08+0.15 capped
      (1000.0, "Cash & Carry - Wholesale", "Y", 0.13),  // 0.08+0.02+0.03
      (2500.0, "Retail", "Y", 0.08))
    import spark.implicits._
    val df = rows.map(r => (r._1, r._2, r._3)).toDF("g", "sc", "ic")
    val out = df.select(round(C.tieredDiscount(col("g"), col("sc"),
      col("ic")), 4).as("d")).collect().map(_.getDouble(0))
    assert(out.toSeq === rows.map(_._4))
  }

  test("F22 money arithmetic in decimal") {
    import spark.implicits._
    val df = Seq((7.0, 33.33)).toDF("qty", "price")
    val out = df.select(
      C.grossAmount(col("qty"), col("price")).as("gross"))
      .select(col("gross"),
        C.discountAmount(col("gross"), lit(0.05)).as("disc"))
      .select(col("gross"), col("disc"),
        C.netAmount(col("gross"), col("disc")).as("net"))
      .collect().head
    assert(out.getDecimal(0).toString === "233.31")
    assert(out.getDecimal(1).toString === "11.67")
    assert(out.getDecimal(2).toString === "221.64")
  }

  test("F23 change tolerance: 0.01 numeric, null-safe strings") {
    import spark.implicits._
    val df = Seq(
      (Some(1.00), Some(1.005), false),
      (Some(1.00), Some(1.02), true),
      (None: Option[Double], Some(1.0), true),
      (None: Option[Double], None: Option[Double], false))
      .toDF("a", "b", "expect")
    val got = df.select(C.numericChanged(col("a"), col("b")).as("c"),
      col("expect")).collect()
    got.foreach(r => assert(r.getBoolean(0) === r.getBoolean(1)))

    val sdf = Seq((null.asInstanceOf[String], "", false),
      ("x", "x", false), ("x", "y", true), (null.asInstanceOf[String], "y", true))
      .toDF("a", "b", "expect")
    sdf.select(C.stringChanged(col("a"), col("b")).as("c"), col("expect"))
      .collect().foreach(r => assert(r.getBoolean(0) === r.getBoolean(1)))
  }

  test("NFC normalization: composes decomposed marks, passes composed " +
      "and ASCII through untouched, null-safe, codegen'd") {
    import graft.functions.Cleansing
    // "e" + U+0301 composes to é; composed é and plain ASCII unchanged
    val decomposed = "café"
    val composed = "café"
    val got = evalStr(Cleansing.normalizeUnicode,
      Seq(decomposed, composed, "plain ascii", null, ""))
    assert(got(0) === Some(composed))
    assert(got(1) === Some(composed))
    assert(got(2) === Some("plain ascii"))
    assert(got(3) === None)
    assert(got(4) === Some(""))
    // the dedup motivation: the two spellings hash apart raw, together
    // after normalization
    import org.apache.spark.sql.functions.{md5 => smd5}
    val df = strDf(Seq(decomposed, composed))
    assert(df.select(smd5(col("v"))).distinct().count() === 2)
    assert(df.select(smd5(Cleansing.normalizeUnicode(col("v"))))
      .distinct().count() === 1)
  }

  test("F24/F25/F26 truncate, natural key, sku") {
    import spark.implicits._
    val df = Seq(("abcdefgh", "Parle-G", "Biscuits", 123))
      .toDF("t", "brand", "sub", "ctr")
    val out = df.select(
      C.truncateTo(col("t"), 3).as("t3"),
      C.naturalKey(lit(20240331), lit(5), lit(7), lit(9)).as("nk"),
      C.skuCode(lit("SKU"), col("brand"), col("sub"), col("ctr")).as("sku"),
      C.skuCounter(
        C.skuCode(lit("SKU"), col("brand"), col("sub"), col("ctr"))).as("n"))
      .collect().head
    assert(out.getString(0) === "abc")
    assert(out.getString(1) === "20240331_5_7_9")
    assert(out.getString(2) === "SKU-PAR-BIS-00123")
    assert(out.getInt(3) === 123)
  }

  test("F18/F19 standardize: known, unknown passthrough, null default") {
    assert(evalStr(RefData.standardizeCategory,
      Seq("personal care", "FOOD", "Electronics", null, " ")) ===
      Seq(Some("PersonalCare"), Some("Grocery"), Some("Electronics"),
        Some("General"), Some("General")))
    assert(evalStr(RefData.standardizeSubcategory,
      Seq("atta", "DAL", "oils", "Quinoa", null)) ===
      Seq(Some("Wheat Flour"), Some("Pulses"), Some("Edible Oil"),
        Some("Quinoa"), Some("General")))
  }

  test("F20 manufacturerFor: exact, case-insensitive fallback, Generic") {
    assert(evalStr(c => RefData.manufacturerFor(c),
      Seq("Saffola", "saffola", "SAFFOLA", "NoSuchBrand", null, "")) ===
      Seq(Some("Marico"), Some("Marico"), Some("Marico"), Some("Generic"),
        Some("Generic"), Some("Generic")))
  }
}
