package graft

import graft.operators.Curation
import org.apache.spark.sql.functions._

/** Span corruption (cu21): window/span geometry, sentinel numbering,
  * the ragged-tail rule, determinism, and the load-bearing invariant —
  * interleaving inputs and targets reconstructs the original sequence
  * exactly. */
class SpanCorruptSpec extends SparkSpec {
  import spark.implicits._

  private val BASE = 1000L

  private def run(rows: Seq[(Long, Seq[Long])], window: Int = 8,
      span: Int = 2): Map[Long, (Int, Int, Int, Seq[Long], Seq[Long])] =
    Curation.spanCorrupt(rows.toDF("doc_id", "toks"), "doc_id", "toks",
        window, span, sentinelBase = BASE, seed = "s")
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getInt(3),
          r.getSeq[Long](4), r.getSeq[Long](5)))).toMap

  /** Replace each sentinel in inputs with its target span — must give
    * back the original sequence. */
  private def reconstruct(inputs: Seq[Long],
      targets: Seq[Long]): Seq[Long] = {
    val spans = scala.collection.mutable.Map.empty[Long, Vector[Long]]
    var cur = -1L
    targets.foreach { t =>
      if (t >= BASE) { cur = t; spans(cur) = Vector.empty }
      else spans(cur) = spans(cur) :+ t
    }
    inputs.flatMap(v => if (v >= BASE) spans(v) else Seq(v))
  }

  test("geometry: full windows mask one span each; the ragged tail " +
      "stays unmasked; short docs mask nothing") {
    val doc20 = (0L until 20L).toSeq // 2 full windows of 8, tail of 4
    val doc7 = (100L until 107L).toSeq // shorter than one window
    val got = run(Seq((1L, doc20), (2L, doc7)))
    val (n1, s1, m1, in1, tg1) = got(1L)
    assert((n1, s1, m1) === ((20, 2, 4)))
    assert(in1.length === 20 - 2 * (2 - 1) - 0 + 0) // n - nWin*(span-1)
    assert(in1.length === 18)
    assert(tg1.length === 2 * (2 + 1))
    val (n2, s2, m2, in2, tg2) = got(2L)
    assert((n2, s2, m2) === ((7, 0, 0)))
    assert(in2 === doc7)
    assert(tg2.isEmpty)
  }

  test("sentinels appear in order base, base+1, … in both sequences, " +
      "and each span's tokens are contiguous inside its own window") {
    val doc = (0L until 40L).toSeq // token value == position
    val (_, nSpans, _, inputs, targets) = run(Seq((9L, doc)))(9L)
    val sentIn = inputs.filter(_ >= BASE)
    assert(sentIn === (0 until nSpans).map(BASE + _))
    assert(targets.filter(_ >= BASE) === sentIn)
    // token value == position, so each span reveals what it masked
    var k = 0L - 1
    val spanToks = scala.collection.mutable
      .Map.empty[Long, Vector[Long]]
    targets.foreach { t =>
      if (t >= BASE) { k = t - BASE; spanToks(k) = Vector.empty }
      else spanToks(k) = spanToks(k) :+ t
    }
    spanToks.foreach { case (j, toks) =>
      assert(toks.length === 2)
      assert(toks(1) === toks(0) + 1, "span tokens must be contiguous")
      assert(toks(0) / 8 === j, "span must sit inside window j")
      assert(toks(0) % 8 <= 8 - 2, "offset must leave room for the span")
    }
  }

  test("interleaving inputs and targets reconstructs the original " +
      "sequence exactly") {
    val docs = Seq(
      (1L, (0L until 55L).toSeq),
      (2L, (0L until 8L).toSeq),
      (3L, Seq(5L, 5L, 5L, 5L, 5L, 5L, 5L, 5L, 5L)),
      (4L, (0L until 16L).toSeq))
    val got = run(docs)
    docs.foreach { case (id, toks) =>
      val (_, _, _, inputs, targets) = got(id)
      assert(reconstruct(inputs, targets) === toks,
        s"reconstruction failed for doc $id")
    }
  }

  test("empty and null token arrays produce empty outputs, not " +
      "missing rows or errors") {
    val df = Seq((1L, Seq.empty[Long]),
      (2L, null.asInstanceOf[Seq[Long]])).toDF("doc_id", "toks")
    val got = Curation.spanCorrupt(df, "doc_id", "toks", 8, 2,
        sentinelBase = BASE, seed = "s")
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getSeq[Long](4).length,
          r.getSeq[Long](5).length))).toMap
    assert(got(1L) === ((0, 0, 0, 0)))
    assert(got(2L) === ((0, 0, 0, 0)))
  }

  test("deterministic: identical output across runs and partitionings") {
    val docs = (0L until 30L).map(i =>
      (i, (0L until (i % 25 + 1)).toSeq)).toSeq
    def once(parts: Int): Seq[String] =
      Curation.spanCorrupt(docs.toDF("doc_id", "toks")
          .repartition(parts), "doc_id", "toks", 8, 2,
          sentinelBase = BASE, seed = "s")
        .orderBy(col("doc_id"))
        .select(concat_ws(",", col("doc_id"),
          concat_ws(" ", transform(col("inputs"),
            x => x.cast("string"))),
          concat_ws(" ", transform(col("targets"),
            x => x.cast("string")))))
        .collect().map(_.getString(0)).toSeq
    assert(once(1) === once(7))
  }

  test("window/span validation fails loudly") {
    val df = Seq((1L, Seq(1L, 2L))).toDF("doc_id", "toks")
    intercept[IllegalArgumentException] {
      Curation.spanCorrupt(df, "doc_id", "toks", window = 2, span = 3)
    }
    intercept[IllegalArgumentException] {
      Curation.spanCorrupt(df, "doc_id", "toks", window = 2, span = 0)
    }
    intercept[IllegalArgumentException] {
      Curation.spanCorrupt(df, "doc_id", "toks", sentinelBase = -1L)
    }
  }

  test("validateIds: a token id at/above sentinelBase fails loudly " +
      "instead of silently colliding with sentinels") {
    // id 7 >= sentinelBase 7: sentinel ids start at 7, so real token
    // 7 would be indistinguishable in the emitted pair
    val bad = Seq((1L, Seq(1L, 7L, 2L, 3L))).toDF("doc_id", "toks")
    val e = intercept[Exception] {
      Curation.spanCorrupt(bad, "doc_id", "toks", window = 4, span = 1,
        sentinelBase = 7L, validateIds = true).collect()
    }
    assert(e.getMessage.contains("sentinelBase"))
    // the same corpus passes un-validated (documented legacy
    // behavior) and passes validated once the base clears the vocab
    Curation.spanCorrupt(bad, "doc_id", "toks", window = 4, span = 1,
      sentinelBase = 7L).collect()
    val ok = Curation.spanCorrupt(bad, "doc_id", "toks", window = 4,
      span = 1, sentinelBase = 8L, validateIds = true)
    assert(ok.collect().head.getAs[Int]("n_tok") === 4)
  }
}
