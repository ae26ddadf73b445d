package graft.queries

import graft.datagen.DataGen
import graft.functions.RefData
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Gate coverage for the seeded generators (SURVEY §2.7 F27/F28 and the
  * P7 category-affinity pick): the oracle recomputes the ENTIRE draw
  * ladder — md5-derived uniforms, cumulative-weight thresholds, modular
  * pool indexing — from first principles in DuckDB. This is only
  * possible because the generators draw from hash bits rather than
  * rand(): every draw is a pure function of (tag, seed, row key), so
  * any engine with md5 reproduces the corpus bit for bit.
  *
  * The oracle SQL is GENERATED from the same Scala weight tables the
  * generators use (categoryWeights, subcategoryByCategory,
  * brandManufacturerMap), so the two sides cannot silently drift.
  */
object DataGenQueries {

  type Q = (SparkSession, String) => DataFrame

  // ---- SQL fragments mirroring DataGen.hashBits / hashUniform ----------

  private def sqlStr(s: String): String = "'" + s.replace("'", "''") + "'"

  private def bitsSql(tag: String, seed: Long, key: String): String =
    s"CAST(('0x' || substr(md5('$tag|$seed|' || $key), 1, 8)) AS UBIGINT)"

  private def uSql(tag: String, seed: Long, key: String): String =
    s"(${bitsSql(tag, seed, key)} / 4294967296.0)"

  /** CASE ladder equivalent of [[DataGen.weightedChoice]]; Double
    * .toString round-trips through DuckDB's literal parser to the same
    * IEEE value the Spark ladder compares with. */
  private def choiceSql(u: String, choices: Seq[(String, Double)]): String = {
    val cum = DataGen.cumThresholds(choices)
    val whens = choices.zip(cum).init.map { case ((v, _), c) =>
      s"WHEN $u < $c THEN ${sqlStr(v)}"
    }
    s"CASE ${whens.mkString(" ")} ELSE ${sqlStr(choices.last._1)} END"
  }

  private def pickSql(values: Seq[String], idx: String): String = {
    val list = values.map(sqlStr).mkString("[", ", ", "]")
    s"list_extract($list, CAST($idx AS BIGINT) % ${values.size} + 1)"
  }

  private def code3(c: String): String =
    s"substr(regexp_replace(upper($c), '[^A-Z]', '', 'g'), 1, 3)"

  /** SQL mirror of [[DataGen.uniform]]: embeds the SAME (hi-lo) double
    * the Scala side computes (1.4-1.2 is 0.19999999999999996 in IEEE —
    * writing '0.2' in the oracle would diverge). */
  private def uniformSql(u: String, lo: Double, hi: Double): String =
    s"($u * ${hi - lo} + $lo)"

  /** Products CTE shared by gen1 and gen3: the full dim_product ladder
    * (category/subcategory/brand/name/sku/price) for ids 1..n, seed s. */
  private def productsCte(n: Long, seed: Long): String = {
    val subCase = DataGen.subcategoryByCategory.map { case (c, subs) =>
      s"WHEN category = ${sqlStr(c)} THEN " +
        pickSql(subs, "floor(u2 * 1000)")
    }.mkString(" ")
    val brands = RefData.brandManufacturerMap.keys.toSeq.sorted
    val manuCase = brands.map { b =>
      s"WHEN ${sqlStr(b)} THEN ${sqlStr(RefData.brandManufacturerMap(b))}"
    }.mkString(" ")
    s"""prod_u AS (
       |  SELECT CAST(i AS BIGINT) AS product_id,
       |    ${uSql("prod", seed, "i")} AS u1,
       |    ${uSql("prod", seed + 1, "i")} AS u2,
       |    ${uSql("prod", seed + 2, "i")} AS u3,
       |    ${bitsSql("prod", seed + 3, "i")} AS pbits
       |  FROM generate_series(1, $n) t(i)),
       |prod_c AS (
       |  SELECT *, ${choiceSql("u1", DataGen.categoryWeights)} AS category
       |  FROM prod_u),
       |prod AS (
       |  SELECT product_id, category,
       |    CASE $subCase ELSE 'General' END AS sub_category,
       |    ${pickSql(brands, "floor(u3 * 10000)")} AS brand,
       |    CAST((pbits % 49001 + 1000) / 100.0 AS DECIMAL(10,2))
       |      AS unit_price
       |  FROM prod_c),
       |prod_full AS (
       |  SELECT product_id, category, sub_category, brand, unit_price,
       |    concat_ws(' ', brand, sub_category,
       |      CAST(product_id AS VARCHAR)) AS product_name,
       |    CASE brand $manuCase ELSE 'Generic' END AS manufacturer,
       |    concat_ws('-', 'SKU', ${code3("brand")},
       |      ${code3("sub_category")},
       |      lpad(CAST(product_id AS VARCHAR), 5, '0')) AS sku
       |  FROM prod)""".stripMargin
  }

  /** Stores CTE: class-of-trade ladder, chain flag, city/state by
    * modular index, volume weight. */
  private def storesCte(n: Long, seed: Long): String = {
    val cityCase = DataGen.cities.zipWithIndex.map { case (c, i) =>
      s"WHEN $i THEN ${sqlStr(c)}" }.mkString(" ")
    val stateCase = DataGen.states.zipWithIndex.map { case (st, i) =>
      s"WHEN $i THEN ${sqlStr(st)}" }.mkString(" ")
    s"""store AS (
       |  SELECT CAST(i AS BIGINT) AS store_id,
       |    'Store ' || CAST(i AS VARCHAR) AS store_name,
       |    ${choiceSql(uSql("store", seed, "i"),
                        DataGen.classOfTradeWeights)} AS class_of_trade,
       |    CASE WHEN ${uSql("store", seed + 1, "i")} < 0.3
       |      THEN 'Y' ELSE 'N' END AS is_chain,
       |    CASE CAST(i AS BIGINT) % ${DataGen.cities.size} $cityCase
       |      END AS city,
       |    CASE CAST(i AS BIGINT) % ${DataGen.states.size} $stateCase
       |      END AS state
       |  FROM generate_series(1, $n) t(i)),
       |store_full AS (
       |  SELECT *, CASE
       |    WHEN class_of_trade LIKE '%Hypermarket%' THEN 5.0
       |    WHEN class_of_trade LIKE '%Wholesale%' THEN 4.0
       |    WHEN class_of_trade LIKE '%Supermarket%' THEN 3.0
       |    ELSE 1.0 END AS volume_weight
       |  FROM store)""".stripMargin
  }

  private def distsCte(n: Long, seed: Long): String =
    s"""dist AS (
       |  SELECT CAST(i AS BIGINT) AS dist_id,
       |    'Distributor ' || CAST(i AS VARCHAR) AS dist_name,
       |    ${choiceSql(uSql("dist", seed, "i"),
                        DataGen.distributorTypeWeights)} AS dist_type,
       |    CASE WHEN ${uSql("dist", seed + 1, "i")} < 0.9
       |      THEN 'Y' ELSE 'N' END AS active_flag
       |  FROM generate_series(1, $n) t(i))""".stripMargin

  // ---- gate queries -----------------------------------------------------

  def queries: Map[String, Q] = Map(
    // F27/F28: the product generator, every derived column
    "gen1_seeded_products" -> ((s, _) => {
      DataGen.products(s, 2000, seed = 42)
        .select(col("product_id"), col("product_name"), col("brand"),
          col("category"), col("sub_category"), col("manufacturer"),
          col("sku"), col("unit_price").cast("double").as("unit_price"))
        .orderBy(col("product_id"))
    }),

    // store + distributor generators, tagged union
    "gen2_seeded_stores" -> ((s, _) => {
      val st = DataGen.stores(s, 500, seed = 43)
        .select(lit("store").as("kind"), col("store_id").as("id"),
          col("store_name").as("name"),
          col("class_of_trade").as("attr1"), col("is_chain").as("attr2"),
          concat_ws("/", col("city"), col("state")).as("attr3"),
          col("volume_weight"))
      val di = DataGen.distributors(s, 200, seed = 44)
        .select(lit("dist").as("kind"), col("dist_id").as("id"),
          col("dist_name").as("name"), col("dist_type").as("attr1"),
          col("active_flag").as("attr2"),
          lit(null).cast("string").as("attr3"),
          lit(null).cast("double").as("volume_weight"))
      st.unionByName(di).orderBy(col("kind"), col("id"))
    }),

    // P7: the fact generator's weighted store pick + category-affinity
    // product pick + active-distributor pick, key columns + quantity.
    // 2024-12-14 is a December Saturday, so BOTH F28 boosts (weekend
    // 1.2-1.4, seasonal 1.3-1.6) are live and oracle-checked.
    "gen3_fact_affinity" -> ((s, _) => {
      val prod = DataGen.products(s, 300, seed = 42)
      val st = DataGen.stores(s, 40, seed = 43)
      val di = DataGen.distributors(s, 15, seed = 44)
      DataGen.factSales(s, 3000, 20241214, prod, st, di, seed = 45)
        .select(col("sales_id"), col("date_id"), col("store_id"),
          col("product_id"), col("dist_id"), col("quantity_sold"),
          col("unit_price").cast("double").as("unit_price"))
        .orderBy(col("sales_id"))
    }),
  )

  def oracles: Map[String, String] = Map(
    "gen1_seeded_products" ->
      s"""WITH ${productsCte(2000, 42)}
         |SELECT product_id, product_name, brand, category, sub_category,
         |  manufacturer, sku, CAST(unit_price AS DOUBLE) AS unit_price
         |FROM prod_full ORDER BY product_id""".stripMargin,

    "gen2_seeded_stores" ->
      s"""WITH ${storesCte(500, 43)},
         |${distsCte(200, 44)}
         |SELECT * FROM (
         |  SELECT 'store' AS kind, store_id AS id, store_name AS name,
         |    class_of_trade AS attr1, is_chain AS attr2,
         |    city || '/' || state AS attr3,
         |    CAST(volume_weight AS DOUBLE) AS volume_weight
         |  FROM store_full
         |  UNION ALL
         |  SELECT 'dist', dist_id, dist_name, dist_type, active_flag,
         |    NULL, NULL
         |  FROM dist)
         |ORDER BY kind, id""".stripMargin,

    "gen3_fact_affinity" ->
      s"""WITH ${productsCte(300, 42)},
         |${storesCte(40, 43)},
         |${distsCte(15, 44)},
         |sidx AS (
         |  SELECT store_id, class_of_trade,
         |    row_number() OVER (ORDER BY volume_weight DESC, store_id)
         |      - 1 AS sidx
         |  FROM store_full),
         |didx AS (
         |  SELECT dist_id,
         |    row_number() OVER (ORDER BY dist_id) - 1 AS didx
         |  FROM dist WHERE active_flag = 'Y'),
         |pool AS (
         |  SELECT product_id, unit_price, pgroup,
         |    row_number() OVER (PARTITION BY pgroup ORDER BY product_id)
         |      - 1 AS pidx
         |  FROM (
         |    SELECT product_id, unit_price, 'kirana' AS pgroup
         |    FROM prod_full
         |    WHERE category IN ('Grocery', 'Beverage', 'Dairy')
         |    UNION ALL
         |    SELECT product_id, unit_price, 'convenience' FROM prod_full
         |    WHERE category IN ('Beverage', 'Dairy', 'Grocery')
         |    UNION ALL
         |    SELECT product_id, unit_price, 'all' FROM prod_full)),
         |poolsize AS (SELECT pgroup, COUNT(*) AS psize FROM pool
         |  GROUP BY pgroup),
         |f AS (
         |  SELECT CAST(i AS BIGINT) AS sales_id,
         |    ${uSql("fact", 45, "i")} AS u_store,
         |    ${uSql("fact", 46, "i")} AS u_prod,
         |    ${uSql("fact", 47, "i")} AS u_dist,
         |    ${uSql("fact", 48, "i")} AS u_qty,
         |    ${uSql("fact", 49, "i")} AS u_boost,
         |    ${uSql("fact", 50, "i")} AS u_season
         |  FROM generate_series(1, 3000) t(i)),
         |fs AS (
         |  SELECT f.*, s.store_id, s.class_of_trade
         |  FROM f JOIN sidx s
         |    ON s.sidx = CAST(floor(f.u_store * f.u_store * 40) AS INT)),
         |fg AS (
         |  SELECT fs.*,
         |    CASE WHEN class_of_trade LIKE '%Kirana%' THEN 'kirana'
         |         WHEN class_of_trade LIKE '%Convenience%'
         |           THEN 'convenience'
         |         ELSE 'all' END AS pgroup
         |  FROM fs),
         |fp AS (
         |  SELECT fg.*, p.product_id, p.unit_price
         |  FROM fg
         |  JOIN poolsize z ON z.pgroup = fg.pgroup
         |  JOIN pool p ON p.pgroup = fg.pgroup
         |    AND p.pidx = CAST(floor(fg.u_prod * z.psize) AS INT)),
         |fd AS (
         |  SELECT fp.*, d.dist_id
         |  FROM fp JOIN didx d ON d.didx = CAST(floor(
         |    fp.u_dist * (SELECT COUNT(*) FROM didx)) AS INT))
         |SELECT sales_id, 20241214 AS date_id, store_id, product_id,
         |  dist_id,
         |  greatest(CAST(floor(
         |    (CASE WHEN class_of_trade LIKE '%Wholesale%'
         |      THEN ${uniformSql("u_qty", 5.0, 20.0)} * 10
         |      ELSE ${uniformSql("u_qty", 1.0, 10.0)} END)
         |    * (${uniformSql("u_boost", 1.2, 1.4)}
         |       * ${uniformSql("u_season", 1.3, 1.6)})) AS BIGINT),
         |    1) AS quantity_sold,
         |  CAST(unit_price AS DOUBLE) AS unit_price
         |FROM fd ORDER BY sales_id""".stripMargin,
  )
}
