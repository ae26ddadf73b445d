package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Standardization reference data (SURVEY.md §2.7 F18-F20) and the lookup
  * operators over it.
  *
  * The maps are DATA, not code: each lookup accepts a caller-supplied map
  * so deployments can load the full dictionaries from config tables. The
  * defaults below carry the reference's category map (11 entries,
  * load_dim_product_dw.py:216-228), subcategory map (40 entries, :230-276)
  * and a representative slice of the brand→manufacturer table (:41-198;
  * full table is ~150 rows and plugs in unchanged through the same API).
  *
  * Implementation: `element_at` on a map literal — constant-folded and
  * codegen'd, no join, no shuffle; the right choice while the dictionary
  * fits in the plan (≤ a few thousand entries). Bigger dictionaries should
  * switch to `lookupJoin` (broadcast join) below — same semantics.
  */
object RefData {

  // ---- F18: category standardization (exact-match on UPPER) ------------
  val categoryMap: Map[String, String] = Map(
    "PERSONALCARE" -> "PersonalCare", "PERSONAL CARE" -> "PersonalCare",
    "BABYCARE" -> "BabyCare", "BABY CARE" -> "BabyCare",
    "GROCERY" -> "Grocery", "FOOD" -> "Grocery",
    "BEVERAGE" -> "Beverage", "DRINKS" -> "Beverage",
    "DAIRY" -> "Dairy",
    "HOMECARE" -> "HomeCare", "HOME CARE" -> "HomeCare")

  // ---- F19: subcategory standardization --------------------------------
  val subcategoryMap: Map[String, String] = Map(
    "SHAMPOO" -> "Shampoo", "SOAP" -> "Soap", "TOOTHPASTE" -> "Toothpaste",
    "FACE WASH" -> "Face Wash", "HAIR OIL" -> "Hair Oil",
    "BABY POWDER" -> "Baby Powder", "BABY WIPES" -> "Baby Wipes",
    "DIAPERS" -> "Diapers", "BABY SOAP" -> "Baby Soap",
    "RICE" -> "Rice", "WHEAT FLOUR" -> "Wheat Flour", "ATTA" -> "Wheat Flour",
    "OIL" -> "Edible Oil", "COOKING OIL" -> "Edible Oil",
    "EDIBLE OIL" -> "Edible Oil", "OILS" -> "Edible Oil",
    "PULSES" -> "Pulses", "DAL" -> "Pulses",
    "SPICES" -> "Spices", "MASALA" -> "Spices",
    "BISCUITS" -> "Biscuits", "COOKIES" -> "Biscuits",
    "NOODLES" -> "Noodles", "SNACKS" -> "Snacks",
    "SOFT DRINK" -> "Soft Drink", "JUICE" -> "Juice", "TEA" -> "Tea",
    "COFFEE" -> "Coffee", "ENERGY DRINK" -> "Energy Drink",
    "FLAVOURED MILK" -> "Flavoured Milk",
    "MILK" -> "Milk", "CURD" -> "Curd", "CHEESE" -> "Cheese",
    "BUTTER" -> "Butter", "PANEER" -> "Paneer",
    "DETERGENT" -> "Detergent", "DISHWASH" -> "Dishwash",
    "FLOOR CLEANER" -> "Floor Cleaner", "TOILET CLEANER" -> "Toilet Cleaner")

  // ---- F20: brand → manufacturer (subset; full table is config data) ---
  val brandManufacturerMap: Map[String, String] = Map(
    "India Gate" -> "KRBL Limited", "Daawat" -> "LT Foods",
    "Fortune" -> "Adani Wilmar", "Aashirvaad" -> "ITC Limited",
    "Saffola" -> "Marico", "Pillsbury" -> "General Mills",
    "Annapurna" -> "Hindustan Unilever", "Dhara" -> "Adani Wilmar",
    "Tata Sampann" -> "Tata Consumer Products", "MDH" -> "MDH Spices",
    "Everest" -> "Everest Food Products", "Catch" -> "DS Group",
    "Parle-G" -> "Parle Products", "Britannia" -> "Britannia Industries",
    "Sunfeast" -> "ITC Limited", "Oreo" -> "Mondelez",
    "Maggi" -> "Nestle", "Yippee" -> "ITC Limited",
    "Lays" -> "PepsiCo", "Kurkure" -> "PepsiCo", "Bingo" -> "ITC Limited",
    "Coca-Cola" -> "Coca-Cola Company", "Thums Up" -> "Coca-Cola Company",
    "Pepsi" -> "PepsiCo", "Sprite" -> "Coca-Cola Company",
    "Frooti" -> "Parle Agro", "Real" -> "Dabur", "Tropicana" -> "PepsiCo",
    "Red Bull" -> "Red Bull GmbH", "Tata Tea" -> "Tata Consumer Products",
    "Brooke Bond" -> "Hindustan Unilever", "Bru" -> "Hindustan Unilever",
    "Nescafe" -> "Nestle", "Amul" -> "Amul", "Mother Dairy" -> "Mother Dairy",
    "Nandini" -> "KMF", "Britannia Dairy" -> "Britannia Industries",
    "Dove" -> "Hindustan Unilever", "Lux" -> "Hindustan Unilever",
    "Lifebuoy" -> "Hindustan Unilever", "Dettol" -> "Reckitt",
    "Colgate" -> "Colgate-Palmolive", "Pepsodent" -> "Hindustan Unilever",
    "Clinic Plus" -> "Hindustan Unilever", "Head & Shoulders" ->
      "Procter & Gamble", "Pantene" -> "Procter & Gamble",
    "Johnson & Johnson" -> "Johnson & Johnson",
    "Pampers" -> "Procter & Gamble", "Huggies" -> "Kimberly-Clark",
    "MamyPoko" -> "Kao Corporation", "Himalaya" -> "Himalaya Wellness",
    "Surf Excel" -> "Hindustan Unilever", "Ariel" -> "Procter & Gamble",
    "Tide" -> "Procter & Gamble", "Rin" -> "Hindustan Unilever",
    "Vim" -> "Hindustan Unilever", "Harpic" -> "Reckitt",
    "Lizol" -> "Reckitt", "Domex" -> "Hindustan Unilever")

  private def mapLit(m: Map[String, String]): Column =
    typedLit(m)

  /** F18/F19 operator: UPPER-keyed exact-match standardization with the
    * reference's asymmetric defaults — null/blank input → `onNull`; known
    * key → standard value; unknown key → trimmed passthrough.
    * (load_dim_product_dw.py:288-297)
    */
  def standardize(c: Column, m: Map[String, String],
      onNull: String = "General"): Column =
    when(c.isNull || trim(c) === "", lit(onNull))
      .otherwise(coalesce(
        element_at(mapLit(m), upper(trim(c))), trim(c)))

  def standardizeCategory(c: Column): Column = standardize(c, categoryMap)
  def standardizeSubcategory(c: Column): Column =
    standardize(c, subcategoryMap)

  /** F20 operator: exact match, then case-insensitive fallback, else
    * "Generic" (load_dim_product_dw.py:300-310). The case-insensitive map
    * keeps the first entry per upper-key, mirroring the reference's
    * insertion-order scan.
    */
  def manufacturerFor(brand: Column,
      m: Map[String, String] = brandManufacturerMap): Column = {
    val upperMap = m.foldLeft(Map.empty[String, String]) {
      case (acc, (k, v)) =>
        val uk = k.toUpperCase
        if (acc.contains(uk)) acc else acc + (uk -> v)
    }
    when(brand.isNull || trim(brand) === "", lit("Generic"))
      .otherwise(coalesce(
        element_at(mapLit(m), trim(brand)),
        element_at(mapLit(upperMap), upper(trim(brand))),
        lit("Generic")))
  }

  /** Scale path for big dictionaries: the same standardization as a
    * broadcast lookup join. `dict` has columns (key, value); keys are
    * matched on UPPER(trim(input)). Returns the input DataFrame plus
    * `outCol`. */
  def lookupJoin(df: org.apache.spark.sql.DataFrame, inCol: String,
      dict: org.apache.spark.sql.DataFrame, outCol: String,
      onNull: String): org.apache.spark.sql.DataFrame = {
    val keyed = dict.select(upper(trim(col("key"))).as("__k"),
      col("value").as("__v"))
    df.join(broadcast(keyed), upper(trim(col(inCol))) === col("__k"), "left")
      .withColumn(outCol,
        when(col(inCol).isNull || trim(col(inCol)) === "", lit(onNull))
          .otherwise(coalesce(col("__v"), trim(col(inCol)))))
      .drop("__k", "__v")
  }
}
