package graft

import org.apache.spark.sql.functions._
import graft.operators.Curation

/** Randomized invariant checks for the curation operators, against
  * driver-side brute-force references on seeded random corpora — the
  * properties hold for EVERY input, not just the fixtures the unit
  * specs plant. Seeded RNG keeps runs reproducible. */
class CurationRandomSpec extends SparkSpec {

  import spark.implicits._

  private def rng(seed: Int) = new scala.util.Random(seed)

  test("removeBoilerplate: line conservation and exact hot-set removal") {
    for (seed <- 1 to 3) {
      val r = rng(seed)
      val vocabLines = Vector(
        "the quick brown fox jumps over dogs",
        "subscribe to our newsletter today!",
        "copyright 2026 example corporation",
        "a genuinely unique sentence number",
        "ok", "yes", "short")
      val docs = (1L to 40L).map { id =>
        val n = 1 + r.nextInt(6)
        val lines = Seq.fill(n) {
          val l = vocabLines(r.nextInt(vocabLines.size))
          if (r.nextBoolean()) l else s"$l ${r.nextInt(3)}"
        }
        (id, lines.mkString("\n"))
      }
      val df = docs.toDF("doc_id", "text")
      val maxDocs = 5L
      val got = Curation.removeBoilerplate(df, "doc_id", "text",
          maxDocs, minChars = 10)
        .collect()
        .map(r0 => r0.getLong(0) -> (r0.getString(1), r0.getLong(2)))
        .toMap

      // brute-force reference on the driver
      val all = docs.map { case (id, t) => id -> t.split("\n", -1).toSeq }
      val hot = all.flatMap { case (id, ls) =>
        ls.map(l => l.trim.toLowerCase).filter(_.length >= 10)
          .distinct.map(n => n -> id)
      }.groupBy(_._1).filter(_._2.map(_._2).distinct.size > maxDocs).keySet
      all.foreach { case (id, ls) =>
        val keep = ls.filterNot(l => hot(l.trim.toLowerCase))
        val (gt, gn) = got(id)
        assert(gt === keep.mkString("\n"), s"seed=$seed doc=$id")
        assert(gn === (ls.size - keep.size).toLong, s"seed=$seed doc=$id")
      }
    }
  }

  test("packSequences: adjacent-offset identity on random token counts") {
    for (seed <- 1 to 3) {
      val r = rng(seed)
      val rows = (1L to 400L).map(i => (i, r.nextInt(5000).toLong))
      val df = rows.toDF("id", "n_tok").repartition(1 + seed * 3)
      val got = Curation.packSequences(df, "id", "n_tok", budget = 4096L)
        .select("id", "n_tok", "start_off", "first_seq", "last_seq")
        .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
      // exclusive prefix sum: off(i+1) == off(i) + tok(i); off(1) == 0
      assert(got.head._3 === 0L, s"seed=$seed")
      got.sliding(2).foreach {
        case Array((_, t1, o1, _, _), (_, _, o2, _, _)) =>
          assert(o2 === o1 + t1, s"seed=$seed")
        case _ =>
      }
      got.foreach { case (_, t, off, fs, ls) =>
        assert(fs === off / 4096L)
        assert(ls === math.max(fs, (off + math.max(t, 1L) - 1L) / 4096L))
      }
    }
  }

  test("uniformGroupSample: exact counts on random group layouts") {
    for (seed <- 1 to 3) {
      val r = rng(seed)
      val rows = (1L to 500L).map(i => (i, s"g${r.nextInt(7)}"))
      val df = rows.toDF("id", "grp")
      val k = 1 + r.nextInt(20)
      val sizes = rows.groupBy(_._2).map { case (g, xs) => g -> xs.size }
      val got = Curation.uniformGroupSample(df, "grp", "id", k)
        .groupBy("grp").count().as[(String, Long)].collect().toMap
      sizes.foreach { case (g, n) =>
        assert(got.getOrElse(g, 0L) === math.min(k, n).toLong,
          s"seed=$seed grp=$g k=$k")
      }
    }
  }
}
