package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.hadoop.fs.{FileSystem, Path}
import java.time.LocalDate
import java.time.format.DateTimeFormatter

/** S8 (validate_table.py:71-125): glob resolution with date walk-back —
  * if the pattern (containing a YYYYMMDD token) matches nothing for the
  * given date, substitute each of the previous `daysBack` dates until a
  * match appears. Control-plane only (driver-side listing), no dataflow.
  */
object FileResolver {

  private val fmt = DateTimeFormatter.ofPattern("yyyyMMdd")

  /** Resolve `pattern` (with a literal "YYYYMMDD" placeholder) for
    * `date`, walking back up to `daysBack` days. Returns the matched
    * paths and the date they matched on. */
  def globWithWalkback(spark: SparkSession, pattern: String,
      date: LocalDate, daysBack: Int): Option[(LocalDate, Seq[String])] = {
    val fs = new Path(pattern).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    (0 to daysBack).iterator.map { back =>
      val d = date.minusDays(back)
      val glob = pattern.replace("YYYYMMDD", fmt.format(d))
      val matched = Option(fs.globStatus(new Path(glob)))
        .getOrElse(Array.empty).map(_.getPath.toString).toSeq
      d -> matched
    }.collectFirst { case (d, m) if m.nonEmpty => (d, m) }
  }
}
