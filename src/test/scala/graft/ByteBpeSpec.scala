package graft

import graft.expressions.ByteMap
import graft.operators.{ByteBpe, TextAnalysis}
import org.apache.spark.sql.functions._

/** Byte-level BPE (t21 family): the GPT-2 byte↔unicode bijection,
  * round-trip exactness on arbitrary unicode, case preservation, the
  * no-[UNK] guarantee, and agreement with the char family on pure
  * printable-ASCII corpora (where byte = char and both alphabets
  * coincide). */
class ByteBpeSpec extends SparkSpec {
  import spark.implicits._

  private def enc(s: String): String =
    evalStr(ByteMap.byteMapEncode, Seq(s)).head.get
  private def dec(s: String): String =
    evalStr(ByteMap.byteMapDecode, Seq(s)).head.get

  test("byte map matches the public GPT-2 bytes_to_unicode table on " +
      "known anchors") {
    // printable ASCII maps to itself
    assert(enc("plain") === "plain")
    // 0xC3 0xA9 (é) -> 'Ã' (195, printable-high identity) + '©' (169?
    // no: 0xA9=169 is in the excluded [127,160]? no — 169 ∈ [161,172]
    // printable range, identity) — the well-known "Ã©" mojibake shape
    assert(enc("é") === "Ã©")
    // CJK 世 = E4 B8 96: E4->'ä', B8->'¸', 96=150 ∈ [127,160] gap ->
    // 256+33+23 = 312 = 'ĸ' — GPT-2's famous "ä¸ĸ"
    assert(enc("世") === "ä¸ĸ")
    // space byte 32 -> 256+32 = 288 = 'Ġ', GPT-2's space marker
    assert(enc(" ") === "Ġ")
    // emoji 😀 = F0 9F 98 80 (4-byte sequence)
    assert(enc("😀").length === 4)
    assert(enc("😀").charAt(0) === 'ð')
  }

  test("the map is a bijection over all 256 byte values") {
    val image = (0 until 256).map(ByteMap.byteToChar)
    assert(image.distinct.length === 256)
    image.zipWithIndex.foreach { case (cp, b) =>
      assert(ByteMap.charToByte(cp) === b)
    }
    // and nothing outside the image decodes
    assert(ByteMap.charToByte.count(_ >= 0) === 256)
  }

  test("decode(encode(x)) == x on multilingual + adversarial strings") {
    val cases = Seq("plain ascii", "café crème", "世界模型", "données",
      "😀🚀🌍", "mixed 世界 café 😀 text", "a\tb", "ȩ́combining",
      "­ soft-hyphen ", "ÃĢ looks-premapped")
    cases.foreach { c =>
      assert(dec(enc(c)) === c, s"round-trip failed for '$c'")
    }
  }

  test("decode fails loudly on input that was never byte-mapped") {
    // U+4E16 (世) is outside the map image [0, 324)
    val e = intercept[Throwable] {
      strDf(Seq("世")).select(ByteMap.byteMapDecode(col("v"))).collect()
    }
    val messages = Iterator.iterate[Throwable](e)(_.getCause)
      .takeWhile(_ ne null).take(8)
      .flatMap(t => Option(t.getMessage)).mkString(" | ")
    assert(messages.contains("byte_map_decode"), messages)
  }

  test("null flows through both directions; empty string is fixed") {
    assert(evalStr(ByteMap.byteMapEncode, Seq(null)).head.isEmpty)
    assert(evalStr(ByteMap.byteMapDecode, Seq(null)).head.isEmpty)
    assert(enc("") === "")
    assert(dec("") === "")
  }

  test("byteWords is case-preserving and whitespace-separating") {
    val got = strDf(Seq("The THE the", "  a  b ", null, ""))
      .select(ByteBpe.byteWords(col("v")).as("w"))
      .collect().map(_.getSeq[String](0))
    assert(got(0) === Seq("The", "THE", "the"))
    assert(got(1) === Seq("a", "b"))
    assert(got(2) === Seq.empty)
    assert(got(3) === Seq.empty)
  }

  test("on a pure printable-ASCII lowercase corpus, byte-level training" +
      " equals char-level training merge for merge") {
    val docs = Seq.fill(5)("low lower lowest new newer").toDF("text")
    val byteMerges = ByteBpe.train(
      ByteBpe.byteWordFreq(docs, "text"), nMerges = 8)
      .orderBy("iter").collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(3)))
    val charMerges = TextAnalysis.bpeTrainLocal(
      TextAnalysis.bpeWordFreq(docs, "text"), nMerges = 8)
      .orderBy("iter").collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(3)))
    assert(byteMerges.toSeq === charMerges.toSeq)
  }

  test("no [UNK] ever: any unicode word segments and decodes back — " +
      "whole-word whitespace-normalized round-trip through the model") {
    val docs = Seq("aaa aaab 世界 世界 données 😀😀 mixed",
      "aaa 世界 café\tnaïve", "  leading and trailing  ")
      .toDF("text").withColumn("doc_id",
        monotonically_increasing_id())
    val wf = ByteBpe.byteWordFreq(docs, "text")
    val merges = ByteBpe.train(wf, nMerges = 6)
      .orderBy("iter").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val seg = TextAnalysis.bpeSegmentWords(
      wf.select(col("word")), "word", merges)
    // every word (incl. multibyte ones the merges never saw as whole
    // symbols) segments to a non-empty symbol list that decodes back
    val rows = seg.select(col("word"),
        ByteBpe.decodeSyms(col("syms")).as("decoded"),
        ByteMap.byteMapDecode(col("word")).as("orig"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getString(1) === r.getString(2),
        s"decode mismatch for mapped word '${r.getString(0)}'")
    }
  }

  test("encodeCorpus: ids are byte-order ranks, per-doc order is " +
      "positional, and the id stream decodes to the normalized doc") {
    val docs = Seq((0L, "ba ab 世界"), (1L, "ab ab"), (2L, ""),
      (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val wf = ByteBpe.byteWordFreq(docs, "text")
    val merges = ByteBpe.train(wf, nMerges = 2)
      .orderBy("iter").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val (vocab, perDoc) = graft.CacheScope.withScope { implicit sc =>
      val r = ByteBpe.encodeCorpus(docs, "doc_id", "text", merges)
      (r._1.collect().map(x => (x.getInt(0), x.getString(1))),
        r._2.collect().map(x => (x.getLong(0),
          x.getSeq[Int](1), x.getInt(2))))
    }
    val idToSym = vocab.toMap
    // ids are the byte-order ranks of the symbol strings
    assert(vocab.sortBy(_._1).map(_._2).toSeq ===
      vocab.map(_._2).sorted(Ordering.comparatorToOrdering(
        new java.util.Comparator[String] {
          def compare(a: String, b: String): Int = {
            val x = a.getBytes("UTF-8"); val y = b.getBytes("UTF-8")
            var i = 0
            while (i < x.length && i < y.length) {
              val c = java.lang.Integer.compare(x(i) & 0xff, y(i) & 0xff)
              if (c != 0) return c
              i += 1
            }
            java.lang.Integer.compare(x.length, y.length)
          }
        })).toSeq)
    val byDoc = perDoc.map(r => r._1 -> r).toMap
    // empty + null docs produce empty sequences, not missing rows
    assert(byDoc(2L)._2.isEmpty && byDoc(2L)._3 === 0)
    assert(byDoc(3L)._2.isEmpty && byDoc(3L)._3 === 0)
    // decoding doc 0's id stream reproduces its whitespace-normalized
    // text with separators dropped (the byteWords contract)
    val dec0 = byDoc(0L)._2.map(idToSym).mkString("")
    val got = evalStr(ByteMap.byteMapDecode, Seq(dec0)).head.get
    assert(got === "baab世界")
  }
}
