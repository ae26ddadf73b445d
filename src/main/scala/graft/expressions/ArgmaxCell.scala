package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Fused max-cosine cluster assignment: one expression evaluating the
  * argmax over ALL centroids in a single tight loop.
  *
  * The composed formulation — `greatest(struct(cosine(v, c_i), -i))`
  * over k centroid literals — generates a k-deep comparison tree with k
  * inlined 64-element cosine loops; at k ≥ ~100 the generated method
  * blows past janino's limits, whole-stage codegen fails, and every
  * cosine falls back to interpreted expression evaluation (measured 46 s
  * for 100k vectors × 1024 cells in the scale harness). This expression
  * is CodegenFallback by design: the per-row boxing (~100 ns) is noise
  * against the k·dim fused flops, and the centroid matrix lives in one
  * JVM array instead of k literal subtrees.
  *
  * Semantics mirror the composed form bit-for-bit for real vectors:
  * per-centroid cosine accumulates dot and both norms sequentially
  * left-to-right in double ([[CosineSim]]'s order — element order is
  * identical whether the three sums interleave in one loop or run in
  * separate loops, so the bits match), and ties break toward the LOWEST
  * cell id (strict `>` keeps the first maximum; `cells` is sorted
  * ascending by the builder). Degenerate rows (null/zero-norm vector,
  * null element, or no centroid with matching dimension) yield a null
  * cell — the composed greatest() path's behavior on these was
  * undefined-by-struct-null-ordering; null is the honest answer.
  */
case class ArgmaxCell(child: Expression, cells: Array[Long],
    cents: Array[Array[Double]])
    extends UnaryExpression with CodegenFallback {

  require(cells.length == cents.length,
    "ArgmaxCell: cells and centroid matrix must align")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "argmax_cell"

  private lazy val elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  // sqrt(Σ c_t²), ascending t — the same accumulation order CosineSim
  // uses for its nb sum, so dot/(sqrt(na)*sqrt(nb)) is bit-identical
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
    var best = -1; var bestSim = Double.NegativeInfinity
    var c = 0
    while (c < cents.length) {
      val cv = cents(c)
      if (cv.length == n && centNorms(c) != 0.0) {
        var dot = 0.0; var t = 0
        while (t < n) { dot += x(t) * cv(t); t += 1 }
        val sim = dot / (sqrtNa * centNorms(c))
        if (sim > bestSim) { bestSim = sim; best = c }
      }
      c += 1
    }
    if (best < 0) null else java.lang.Long.valueOf(cells(best))
  }

  override protected def withNewChildInternal(
      newChild: Expression): ArgmaxCell = copy(child = newChild)
}

object ArgmaxCell {
  def apply(vec: Column, cells: Seq[Long],
      cents: Seq[Seq[Double]]): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(ArgmaxCell(ColumnBridge.expression(vec),
      cells.toArray, cents.map(_.toArray).toArray))
  }
}
