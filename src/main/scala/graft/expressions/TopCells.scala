package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Fused top-p max-cosine cell assignment — [[ArgmaxCell]] generalized
  * to return the `p` best cells, ordered best-first: the multi-probe
  * lever for cluster-then-verify operators (SemDeDup misses exactly
  * the near-dup pairs that straddle a cell boundary; probing each
  * vector's runner-up cells recovers them at p× the verify
  * candidates, with the assignment pass costing the SAME k·dim flops
  * as the argmax — every cosine is already computed).
  *
  * Ranking is (cosine DESC, cell ASC) — the same total order
  * [[ArgmaxCell]]'s strict-`>`-keeps-first rule implements for p = 1
  * (element [0] of this expression is bit-identical to ArgmaxCell,
  * spec-pinned), and the one the DuckDB oracle replays as a
  * row_number window. Degenerate rows (null/zero-norm vector, null
  * element, no matching-dimension centroid) yield null, like
  * ArgmaxCell; fewer than p eligible centroids yield a shorter
  * array. CodegenFallback by design (the ArgmaxCell argument: per-row
  * boxing is noise against k·dim fused flops).
  */
case class TopCells(child: Expression, cells: Array[Long],
    cents: Array[Array[Double]], p: Int)
    extends UnaryExpression with CodegenFallback {

  require(cells.length == cents.length,
    "TopCells: cells and centroid matrix must align")
  require(p >= 1, s"TopCells: p must be >= 1, got $p")

  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "top_cells"

  private lazy val elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  private lazy val centNorms: Array[Double] = cents.map { c =>
    var nb = 0.0; var t = 0
    while (t < c.length) { nb += c(t) * c(t); t += 1 }
    math.sqrt(nb)
  }

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    val x = new Array[Double](n)
    var i = 0
    var na = 0.0
    while (i < n) {
      if (a.isNullAt(i)) return null
      val xi = if (elemIsFloat) a.getFloat(i).toDouble else a.getDouble(i)
      x(i) = xi; na += xi * xi
      i += 1
    }
    if (na == 0.0) return null
    val sqrtNa = math.sqrt(na)
    // bounded insertion ranking: bestSim/bestIdx arrays of length p,
    // kept sorted by (sim DESC, idx ASC); ascending centroid order +
    // strict > on insertion reproduces ArgmaxCell's tie rule at every
    // rank (an equal-sim later cell never displaces an earlier one)
    val topSim = new Array[Double](p)
    val topIdx = new Array[Int](p)
    var filled = 0
    var c = 0
    while (c < cents.length) {
      val cv = cents(c)
      if (cv.length == n && centNorms(c) != 0.0) {
        var dot = 0.0; var t = 0
        while (t < n) { dot += x(t) * cv(t); t += 1 }
        val sim = dot / (sqrtNa * centNorms(c))
        // find insertion point: first slot with sim strictly below
        var pos = filled
        while (pos > 0 && sim > topSim(pos - 1)) pos -= 1
        if (pos < p) {
          val last = math.min(filled, p - 1)
          var m = last
          while (m > pos) {
            topSim(m) = topSim(m - 1); topIdx(m) = topIdx(m - 1)
            m -= 1
          }
          topSim(pos) = sim; topIdx(pos) = c
          if (filled < p) filled += 1
        }
      }
      c += 1
    }
    if (filled == 0) null
    else new GenericArrayData(
      (0 until filled).map(j => cells(topIdx(j))).toArray)
  }

  override protected def withNewChildInternal(
      newChild: Expression): TopCells = copy(child = newChild)
}

object TopCells {
  def apply(vec: Column, cells: Seq[Long], cents: Seq[Seq[Double]],
      p: Int): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(TopCells(ColumnBridge.expression(vec),
      cells.toArray, cents.map(_.toArray).toArray, p))
  }
}
