package graft.functions

import graft.SparkSpec

class NfcNormalizeSpec extends SparkSpec {
  import spark.implicits._

  test("nfc_normalize composes, preserves compatibility chars, keeps nulls") {
    graft.sql.GraftExtensions.ensureRegistered(spark)
    val rows = Seq(
      (1L, "cafe\u0301"),    // decomposed -> composed
      (2L, "caf\u00e9"),     // already NFC: unchanged
      (3L, "ﬁle"),          // ligature survives NFC (NFKC would fold)
      (4L, "Ｆull"),         // full-width survives NFC
      (5L, "plain ascii"),
      (6L, null.asInstanceOf[String])
    ).toDF("id", "t")
    val r = rows.selectExpr("id", "nfc_normalize(t) AS n")
      .collect().map(x => x.getLong(0) -> x.getString(1)).toMap
    assert(r(1L) == "caf\u00e9")
    assert(r(2L) == "caf\u00e9")
    assert(r(1L) == r(2L)) // the whole point: byte-equal after NFC
    assert(r(3L) == "ﬁle")
    assert(r(4L) == "Ｆull")
    assert(r(5L) == "plain ascii")
    assert(r(6L) == null)
  }

  test("normalizeText: NFC + control strip + whitespace collapse, change accounting") {
    val docs = Seq(
      (1L, "cafe\u0301  au \t lait"),
      (2L, "already clean"),
      (3L, "ctrl\u0001here")
    ).toDF("doc_id", "text")
    val r = graft.operators.TextAnalysis.normalizeText(docs, "doc_id", "text")
      .collect()
      .map(x => x.getLong(0) ->
        ((x.getString(1), x.getAs[Boolean]("changed"),
          x.getAs[Long]("n_chars_raw"), x.getAs[Long]("n_chars_norm"))))
      .toMap
    assert(r(1L) == (("caf\u00e9 au lait", true, 16L, 12L)))
    assert(r(2L) == (("already clean", false, 13L, 13L)))
    assert(r(3L) == (("ctrlhere", true, 9L, 8L)))
  }
}
