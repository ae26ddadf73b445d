package graft.schema

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

/** The "Dynamic" in Dynamic-ETL: schema-tolerant file ingestion
  * (SURVEY.md §1.3). Incoming files are read all-string; logical columns
  * are resolved against physical headers case-insensitively through an
  * alias list; missing optional columns are injected as nulls; then
  * everything is cast to the target type with coerce (null-on-failure)
  * semantics. Mirrors load_fact_sales_dw.py:85-210 and
  * load_dim_store_dw.py:124-152 as pure DataFrame ops — resolution happens
  * on the driver against the schema only, so it costs nothing at scale.
  */
final case class LogicalCol(
    name: String,
    aliases: Seq[String] = Nil,
    required: Boolean = true,
    targetType: Option[DataType] = None,
    width: Option[Int] = None,
    /** Optional cleaning expression applied after resolution (e.g.
      * Cleansing.cleanNumeric); receives the resolved string column. */
    clean: Option[Column => Column] = None) {
  /** All acceptable physical names, canonical first, upper-cased. */
  def candidates: Seq[String] = (name +: aliases).map(_.trim.toUpperCase)
}

final case class ResolvedSchema(
    /** logical name -> physical column it resolved from (None = injected) */
    mapping: Map[String, Option[String]],
    missingRequired: Seq[String]) {
  def ok: Boolean = missingRequired.isEmpty
}

object SchemaMapper {

  /** Resolve logical columns against a DataFrame's physical header.
    * Physical names are matched after trim+upper (the reference's
    * `df.columns.str.strip().str.upper()`, load_fact_sales_dw.py:98).
    */
  def resolve(df: DataFrame, cols: Seq[LogicalCol]): ResolvedSchema = {
    val physical = df.columns.map(c => c.trim.toUpperCase -> c).toMap
    val mapping = cols.map { lc =>
      lc.name -> lc.candidates.collectFirst {
        case cand if physical.contains(cand) => physical(cand)
      }
    }.toMap
    val missing = cols.filter(lc => lc.required && mapping(lc.name).isEmpty)
      .map(_.name)
    ResolvedSchema(mapping, missing)
  }

  /** Apply a resolution: select logical columns (renamed from their
    * physical source or injected as null), run per-column cleaners, cast
    * to target types (try_cast = errors='coerce'), truncate to width.
    * Fails fast with the missing-required list — the caller decides
    * between poison-skip and retry (SURVEY §2.9).
    */
  def apply(df: DataFrame, cols: Seq[LogicalCol]): DataFrame = {
    val res = resolve(df, cols)
    require(res.ok, s"missing required columns: ${res.missingRequired.mkString(", ")}")
    val projected = cols.map { lc =>
      val base = res.mapping(lc.name) match {
        case Some(phys) => col(s"`$phys`")
        case None       => lit(null).cast("string")
      }
      val cleaned = lc.clean.map(f => f(base)).getOrElse(base)
      val cast = lc.targetType.map(t => cleaned.try_cast(t)).getOrElse(cleaned)
      val cut = lc.width.map(w => substring(cast, 1, w)).getOrElse(cast)
      cut.as(lc.name)
    }
    df.select(projected: _*)
  }
}
