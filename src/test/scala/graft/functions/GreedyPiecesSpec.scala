package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

class GreedyPiecesSpec extends SparkSpec {
  import spark.implicits._

  private def tok(vocab: Seq[String], text: String): Seq[String] = {
    val arr = GreedyPieces.compile(vocab)
      .tokenize(UTF8String.fromString(text))
    (0 until arr.numElements()).map(i => arr.getUTF8String(i).toString)
  }

  test("greedy longest-match prefers the longest piece at each position") {
    val v = Seq("t", "ta", "tab", "table", "le", "b")
    assert(tok(v, "table") == Seq("table"))
    assert(tok(v, "tables") == Seq("table", "<unk>")) // 's' not in vocab
    assert(tok(v, "tab") == Seq("tab"))
    assert(tok(v, "tale") == Seq("ta", "le"))
  }

  test("words tokenize independently; whitespace runs collapse") {
    val v = Seq("ab", "a", "b")
    assert(tok(v, "  ab \t a\n\nb ") == Seq("ab", "a", "b"))
    assert(tok(v, "") == Seq())
    assert(tok(v, "   ") == Seq())
  }

  test("unk advances one code point, not one byte") {
    val v = Seq("n", "a", "ve", "v", "e")
    // ï is 2 UTF-8 bytes; a byte-stepping fallback would emit 2 unks
    assert(tok(v, "naïve") == Seq("n", "a", "<unk>", "ve"))
    // 4-byte astral code point (𝄞) → exactly one unk
    assert(tok(v, "a𝄞a") == Seq("a", "<unk>", "a"))
  }

  test("greedy is not optimal — documents the MaxMatch contract") {
    // optimal segmentation of "abc" is ab|c (2 pieces); greedy takes
    // "abc"? no — "abc" not in vocab; takes "ab" then c. But for
    // "acb": a|cb exists, greedy at 'a' takes "ac" first → ac|b.
    val v = Seq("ab", "ac", "cb", "a", "b", "c")
    assert(tok(v, "abc") == Seq("ab", "c"))
    assert(tok(v, "acb") == Seq("ac", "b"))
  }

  test("expression evaluates inside a codegen'd projection") {
    graft.sql.GraftExtensions.ensureRegistered(spark)
    val out = Seq((1L, "table stream"), (2L, "xy"), (3L, null.asInstanceOf[String]))
      .toDF("id", "t")
      .select(col("id"),
        call_function("greedy_pieces", col("t"),
          typedlit(Seq("tab", "le", "str", "eam", "x"))).as("p"))
      .collect().map(r => r.getLong(0) ->
        Option(r.getSeq[String](1)).map(_.toList)).toMap
    assert(out(1L).contains(List("tab", "le", "str", "eam")))
    assert(out(2L).contains(List("x", "<unk>")))
    assert(out(3L).isEmpty) // null in → null out
  }

  test("non-foldable vocab is rejected at analysis time") {
    graft.sql.GraftExtensions.ensureRegistered(spark)
    val df = Seq((1L, "t", Seq("t"))).toDF("id", "t", "v")
    val e = intercept[Exception] {
      df.select(call_function("greedy_pieces", col("t"), col("v"))).collect()
    }
    assert(e.getMessage.toLowerCase.contains("foldable") ||
      e.getMessage.toLowerCase.contains("literal"))
  }
}
