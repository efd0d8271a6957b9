package graft.operators

import graft.SparkSpec

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("stats on a known sentence") {
    val df = Seq((1L, "the cat sat", "en")).toDF("doc_id", "text", "lang")
    val r = TextAnalysis.stats(df, "doc_id", "text").collect().head
    assert(r.getAs[Int]("n_tokens") == 3)
    assert(r.getAs[Int]("n_chars_measured") == 11)
    assert(r.getAs[Int]("n_subword_tokens") == 3)
    assert(r.getAs[Double]("avg_token_len") == 3.0)
    assert(r.getAs[Double]("stopword_ratio") == 0.333333) // "the"
    // quality = min(3/64, 1) * (1 - 1/3)
    assert(math.abs(r.getAs[Double]("quality_score") - 0.03125) < 1e-6)
  }

  test("quality rules: exact micro-integer signals on crafted docs") {
    val df = Seq(
      (1L, "aa bb cc aa"),          // dup word 1/4; no dup bigram; mean len 2
      (2L, "ab cd ab cd ab"),       // dup word 3/5; dup bigram 2/4; mean len 2
      (3L, "solo")                  // single word: no bigrams at all
    ).toDF("doc_id", "text")
    val r = TextAnalysis.qualityRules(df, "doc_id", "text").collect()
      .map(x => x.getLong(0) -> x).toMap
    assert(r(1L).getAs[Int]("n_words") == 4)
    assert(r(1L).getAs[Long]("dup_word_frac_e6") == 250000L)
    assert(r(1L).getAs[Long]("dup_bigram_frac_e6") == 0L)
    assert(r(1L).getAs[Long]("mean_word_len_e6") == 2000000L)
    assert(r(2L).getAs[Long]("dup_word_frac_e6") == 600000L)
    assert(r(2L).getAs[Long]("dup_bigram_frac_e6") == 500000L)
    assert(r(3L).getAs[Long]("dup_bigram_frac_e6") == 0L)
    assert(r.values.forall(!_.getAs[Boolean]("keep"))) // all far too short
  }

  test("quality rules: keep verdict honors every bound inclusively") {
    val good = (1 to 30).map(i => f"wd$i%02d").mkString(" ") // 30 distinct 4-char words
    val df = Seq((1L, good), (2L, (1 to 29).map(i => f"wd$i%02d").mkString(" ")))
      .toDF("doc_id", "text")
    val r = TextAnalysis.qualityRules(df, "doc_id", "text").collect()
      .map(x => x.getLong(0) -> x.getAs[Boolean]("keep")).toMap
    assert(r(1L))   // exactly minWords, mean len 4 within [3, 10]
    assert(!r(2L))  // one word short
  }

  test("top terms: integer (tf desc, df asc, token) ranking, cut at k") {
    val df = Seq(
      (1L, "apple apple banana common"),
      (2L, "banana common common"),
      (3L, "common")
    ).toDF("doc_id", "text")
    val r = TextAnalysis.topTerms(df, "doc_id", "text", k = 2).collect()
      .map(x => (x.getLong(0), x.getAs[Int]("rnk")) ->
        (x.getString(1), x.getAs[Long]("tf"), x.getAs[Long]("df"))).toMap
    assert(r((1L, 1)) == ("apple", 2L, 1L))  // highest tf, rarest corpus-wide
    assert(r((1L, 2)) == ("banana", 1L, 2L)) // tf tie vs common → rarer df wins
    assert(r((2L, 1)) == ("common", 2L, 3L))
    assert(r((3L, 1)) == ("common", 1L, 3L))
    assert(r.size == 5) // k=2 cap: 2 + 2 + 1
  }

  test("sequence packing: running-total layout, straddling doc, empty doc dropped") {
    val df = Seq(
      (1L, "a b c d"),          // 4 tokens → seq 0, offset 0
      (2L, "a b c d e"),        // 5 tokens → seq 0, offset 4
      (3L, "a b c d e f g h"),  // 8 tokens → starts seq 0 offset 9, straddles
      (4L, "a b"),              // 2 tokens → seq 1, offset 7
      (5L, "   ")               // empty after tokenization → dropped
    ).toDF("doc_id", "text")
    val r = TextAnalysis.packSequences(df, "doc_id", "text", seqTokens = 10, buckets = 1)
      .collect().map(x => x.getLong(0) -> (x.getLong(3), x.getLong(4))).toMap
    assert(r == Map(1L -> (0L, 0L), 2L -> (0L, 4L), 3L -> (0L, 9L), 4L -> (1L, 7L)))
  }

  test("sequence packing: buckets are independent packing domains") {
    val df = (1L to 10L).map(i => (i, ("w " * i.toInt).trim)).toDF("doc_id", "text")
    val r = TextAnalysis.packSequences(df, "doc_id", "text", seqTokens = 7, buckets = 2)
      .collect().map(x => (x.getLong(0), x.getLong(2), x.getLong(3), x.getLong(4)))
    // odd ids → bucket 1 with cums 1,4,9,16,25; even → bucket 0 with 2,6,12,20,30
    val byBucket = r.groupBy(_._2)
    assert(byBucket(1L).map(t => (t._1, t._3, t._4)).toSet ==
      Set((1L, 0L, 0L), (3L, 0L, 1L), (5L, 0L, 4L), (7L, 1L, 2L), (9L, 2L, 2L)))
    assert(byBucket(0L).map(t => (t._1, t._3, t._4)).toSet ==
      Set((2L, 0L, 0L), (4L, 0L, 2L), (6L, 0L, 6L), (8L, 1L, 5L), (10L, 2L, 6L)))
  }

  test("freqScore: integer corpus-frequency signals, rounded mean") {
    // corpus counts: the=3, cat=2, sat=2, rare=1
    val df = Seq(
      (1L, "the cat sat"),
      (2L, "the cat sat"),
      (3L, "the rare")
    ).toDF("doc_id", "text")
    val r = TextAnalysis.freqScore(df, "doc_id", "text").collect()
      .map(x => x.getAs[Long]("doc_id") -> x).toMap
    assert(r(1L).getAs[Long]("n_tokens") == 3L)
    assert(r(1L).getAs[Long]("sum_freq") == 7L)  // 3 + 2 + 2
    assert(r(1L).getAs[Long]("min_freq") == 2L)
    assert(r(1L).getAs[Double]("mean_freq") == 2.333333d)
    assert(r(3L).getAs[Long]("sum_freq") == 4L)  // 3 + 1
    assert(r(3L).getAs[Long]("min_freq") == 1L)  // "rare" drags the min
    assert(r(3L).getAs[Double]("mean_freq") == 2.0d)
  }

  test("ngramNovelty: shared trigrams counted corpus-wide, short docs absent") {
    val df = Seq(
      (1L, "alpha beta gamma delta"),  // trigrams: "a b g", "b g d"
      (2L, "alpha beta gamma"),        // trigram "a b g" shared with doc 1
      (3L, "one two three"),           // unique trigram
      (4L, "too short")                // < 3 words → absent
    ).toDF("doc_id", "text")
    val r = TextAnalysis.ngramNovelty(df, "doc_id", "text").collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getLong(3)))).toMap
    assert(r(1L) == ((2L, 1L, 500000L))) // one of two trigrams shared
    assert(r(2L) == ((1L, 1L, 0L)))      // its only trigram is shared
    assert(r(3L) == ((1L, 0L, 1000000L)))
    assert(!r.contains(4L))
  }

  test("collocations: lift ratio ranks the glued pair first") {
    // "new york" always adjacent; "big data" co-occur but also apart
    val df = (1L to 6L).map(i => (i, "new york big city big data and data big"))
      .toDF("doc_id", "text")
    val r = TextAnalysis.collocations(df, "doc_id", "text", k = 5, minCount = 5)
      .collect().map(x => (x.getString(0), x.getString(1), x.getAs[Double]("lift")))
    assert(r.head._1 == "new" && r.head._2 == "york")
    // N=54 (9 tokens × 6 docs); c(new york)=6, c(new)=6, c(york)=6 → 6*54/36
    assert(r.head._3 == 9.0)
    assert(r.map(_._3).sliding(2).forall(p => p.head >= p.last)) // sorted desc
  }

  test("collocations: minCount prunes, ties cut by (w1, w2)") {
    val df = Seq((1L, "a b a b a b a b a b c d")).toDF("doc_id", "text")
    val r = TextAnalysis.collocations(df, "doc_id", "text", k = 10, minCount = 5)
      .collect().map(x => (x.getString(0), x.getString(1)))
    // "a b"×5 survives; "b a"×4, "b c"×1, "c d"×1 fall below minCount
    assert(r.toSet == Set(("a", "b")))
  }

  test("redactPii masks every pattern type and counts on original text") {
    val df = Seq(
      (1L, "contact john.doe@example.com or jane@sub.example.org today"),
      (2L, "server at 192.168.0.1 and 10.0.0.255 responded fine"),
      (3L, "call 555-123-4567 or 555.987.6543 ref 1234567890"),
      (4L, "no pii in this perfectly ordinary sentence")
    ).toDF("doc_id", "text")
    val r = TextAnalysis.redactPii(df, "doc_id", "text").collect()
      .map(x => x.getLong(0) -> x).toMap
    assert(r(1L).getAs[String]("text_redacted") == "contact <EMAIL> or <EMAIL> today")
    assert(r(1L).getAs[Long]("n_email") == 2L)
    assert(r(2L).getAs[String]("text_redacted") == "server at <IP> and <IP> responded fine")
    assert(r(2L).getAs[Long]("n_ip") == 2L)
    assert(r(3L).getAs[String]("text_redacted") == "call <PHONE> or <PHONE> ref <NUM>")
    assert(r(3L).getAs[Long]("n_phone") == 2L && r(3L).getAs[Long]("n_longnum") == 1L)
    assert(r(4L).getAs[String]("text_redacted") == "no pii in this perfectly ordinary sentence")
    assert(Seq("n_email", "n_ip", "n_phone", "n_longnum")
      .forall(c => r(4L).getAs[Long](c) == 0L))
  }

  test("redactPii: a phone-shaped dotted triple is not an IP, and vice versa") {
    val df = Seq((1L, "x 555.987.6543 y 10.0.0.255 z")).toDF("doc_id", "text")
    val r = TextAnalysis.redactPii(df, "doc_id", "text").collect().head
    assert(r.getAs[String]("text_redacted") == "x <PHONE> y <IP> z")
    assert(r.getAs[Long]("n_ip") == 1L && r.getAs[Long]("n_phone") == 1L)
  }

  test("lang id picks the dominant marker set, und when none") {
    val df = Seq(
      (1L, "the cat and the dog is here", "en"),
      (2L, "der hund und die katze ist da", "de"),
      (3L, "zzz qqq www", "en")
    ).toDF("doc_id", "text", "lang")
    val r = TextAnalysis.langId(df, "doc_id", "text").collect()
      .map(x => x.getLong(0) -> (x.getString(2), x.getBoolean(3))).toMap
    assert(r(1L) == ("en", true))
    assert(r(2L) == ("de", true))
    assert(r(3L) == ("und", false))
  }

  test("lang id tie breaks alphabetically (deterministic)") {
    // "la" is both Spanish ("las"? no — 'la' is fr marker; es has 'las') —
    // craft an exact tie: one es marker and one fr marker
    val df = Seq((1L, "el et", "es")).toDF("doc_id", "text", "lang")
    val r = TextAnalysis.langId(df, "doc_id", "text").collect().head
    assert(r.getString(2) == "es") // es < fr alphabetically on a 1-1 tie
  }

  test("chunkTokens: strided windows, trailing partial kept, empty doc dropped") {
    val df = Seq(
      (1L, "a b c d e"), // 5 tokens, chunk=3 stride=2 → [a b c][c d e][e]
      (2L, "x"),
      (3L, "   ")).toDF("doc_id", "text")
    val chunks = TextAnalysis.chunkTokens(df, "doc_id", "text", 3, 2).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3))).toSet
    assert(chunks == Set(
      (1L, 0, 3, "a b c"), (1L, 1, 3, "c d e"), (1L, 2, 1, "e"),
      (2L, 0, 1, "x")))
  }

  test("vocabTopK counts occurrences and document frequency; ties cut by token") {
    val df = Seq(
      (1L, "b b a c"),
      (2L, "a b"),
      (3L, "c")).toDF("doc_id", "text")
    val top = TextAnalysis.vocabTopK(df, "doc_id", "text", 2).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // b: 3 occ / 2 docs; a and c tie at 2 occ — 'a' wins the cut
    assert(top.toSeq == Seq(("b", 3L, 2L), ("a", 2L, 2L)))
  }

  test("vocabCoverage: OOV rate against the corpus' own top-k vocab") {
    val df = Seq(
      (1L, "b b a c"),
      (2L, "a b"),
      (3L, "c c c")
    ).toDF("doc_id", "text")
    // occurrences: c=4, b=3, a=2 → top-2 vocab = {c, b}; doc1: 'a' OOV
    // (1/4), doc2: 'a' OOV (1/2), doc3: fully covered (0/3)
    val r = TextAnalysis.vocabCoverage(df, "doc_id", "text", 2).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getLong(3)))).toMap
    assert(r(1L) == ((4L, 1L, 250000L)))
    assert(r(2L) == ((2L, 1L, 500000L)))
    assert(r(3L) == ((3L, 0L, 0L)))
  }

  test("bigramLmScore: hand-computed conditional probabilities") {
    val docs = Seq(
      (1L, "a b a b"),   // bigrams: (a b), (b a), (a b)
      (2L, "a c"),       // bigram: (a c)
      (3L, "solo")       // no bigram -> absent
    ).toDF("doc_id", "text")
    // corpus: c2("a b")=2, c2("b a")=1, c2("a c")=1; c1(a)=3, c1(b)=1
    val r = TextAnalysis.bigramLmScore(docs, "doc_id", "text").collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getLong(3)))).toMap
    // doc 1: p(a b)=2/3 -> 666667 (x2), p(b a)=1/1 -> 1000000
    assert(r(1L) == ((3L, 2333334L, 777778L)))
    // doc 2: p(a c)=1/3 -> 333333
    assert(r(2L) == ((1L, 333333L, 333333L)))
    assert(!r.contains(3L))
  }

  test("hashEmbed: md5-bucket histogram matches an independent computation") {
    val docs = Seq((1L, "alpha alpha beta"), (2L, "  "), (3L, "gamma")).toDF("doc_id", "text")
    val r = TextAnalysis.hashEmbed(docs, "doc_id", "text", dims = 8).collect()
      .map(x => x.getLong(0) -> ((x.getInt(1), x.getLong(2), x.getString(3)))).toMap
    def bucket(tok: String): Int = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(tok.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
      (java.lang.Long.parseLong(hex, 16) % 8).toInt
    }
    val expected1 = Array.fill(8)(0L)
    expected1(bucket("alpha")) += 2
    expected1(bucket("beta")) += 1
    assert(r(1L)._2 == 3L && r(1L)._3 == expected1.mkString(","))
    assert(r(1L)._1 == expected1.count(_ > 0))
    assert(!r.contains(2L)) // whitespace-only doc has no tokens
    assert(r(3L)._2 == 1L && r(3L)._3.split(",").map(_.toLong).sum == 1L)
  }

  test("sourceOverlap: shared fingerprints per pair, no row for disjoint pairs") {
    val docs = Seq(
      (1L, "x", "srcA"), (2L, "y", "srcA"),
      (3L, "x", "srcB"), (4L, "z", "srcB"),
      (5L, "w", "srcC")
    ).toDF("doc_id", "text", "source")
    val r = TextAnalysis.sourceOverlap(docs, "doc_id", "text", "source").collect()
      .map(x => (x.getString(0), x.getString(1)) ->
        ((x.getLong(2), x.getLong(3), x.getLong(4), x.getLong(5)))).toMap
    // A and B share {x}: 1 of (2 + 2 - 1) -> jaccard 1/3 in micros
    assert(r == Map(("srcA", "srcB") -> ((1L, 2L, 2L, 333333L))))
  }

  test("blocklistFilter: distinct whole-token hits, case-folded, no substring match") {
    val docs = Seq(
      (1L, "clean text here"),
      (2L, "BAD bad worse"),          // 'bad' twice -> 1 distinct hit + 'worse'
      (3L, "badge is not bad-ness")   // substrings must NOT match
    ).toDF("doc_id", "text")
    val r = TextAnalysis.blocklistFilter(docs, "doc_id", "text", Seq("bad", "worse"))
      .collect().map(x => x.getLong(0) -> ((x.getLong(1), x.getBoolean(2)))).toMap
    assert(r(1L) == ((0L, true)))
    assert(r(2L) == ((2L, false)))
    assert(r(3L) == ((0L, true)))
  }

  test("bpePairs: adjacent char pairs counted, tie cut by pair, short tokens dropped") {
    val docs = Seq((1L, "abab cd a"), (2L, "cd")).toDF("doc_id", "text")
    // pairs: abab -> ab, ba, ab; cd once per doc; "a" has none
    val r = TextAnalysis.bpePairs(docs, "doc_id", "text", k = 3).collect()
      .map(x => (x.getString(0), x.getLong(1)))
    // ab and cd tie at 2 -> pair order breaks it; ba (1) takes the last slot
    assert(r.toSeq == Seq(("ab", 2L), ("cd", 2L), ("ba", 1L)))
  }

  test("bpeTrain: merges apply non-overlapping, learned symbols compose, run exhausts") {
    // dictionary: aaab ×3, abab ×2, xy ×1 (lowercased; 'Z!' filtered out)
    val docs = Seq(
      (1L, "aaab aaab abab Z!"), (2L, "aaab abab xy")).toDF("doc_id", "text")
    val r = TextAnalysis.bpeTrain(docs, "doc_id", "text", iters = 4).collect()
      .map(x => (x.getInt(0), x.getString(1), x.getString(2), x.getString(3), x.getLong(4)))
    // iter 1 counts (adjacent, overlaps counted, freq-weighted):
    //   aaab: (a,a)=2, (a,b)=1; ×3 -> (a,a)=6, (a,b)=3
    //   abab: (a,b)=2, (b,a)=1; ×2 -> (a,b)=4, (b,a)=2;  xy: (x,y)=1
    // totals: (a,b)=7 > (a,a)=6 -> merge 1 = (a,b)->ab, n=7
    assert(r(0) == ((1, "a", "b", "ab", 7L)))
    // after merge 1: aaab -> [a,a,ab] ×3; abab -> [ab,ab] ×2; xy -> [x,y]
    // counts: (a,a)=3, (a,ab)=3, (ab,ab)=2, (x,y)=1 -> tie (a,a)/(a,ab): lex rhs 'a' < 'ab'
    assert(r(1) == ((2, "a", "a", "aa", 3L)))
    // after merge 2: aaab -> [aa,ab] ×3 (non-overlapping left-to-right)
    // counts: (aa,ab)=3, (ab,ab)=2, (x,y)=1
    assert(r(2) == ((3, "aa", "ab", "aaab", 3L)))
    // after merge 3: [aaab] ×3 done; remaining pairs (ab,ab)=2, (x,y)=1
    assert(r(3) == ((4, "ab", "ab", "abab", 2L)))
    // exhaustion: with every word a single symbol, training stops early
    val small = Seq((1L, "ab ab")).toDF("doc_id", "text")
    val rs = TextAnalysis.bpeTrain(small, "doc_id", "text", iters = 5).collect()
    assert(rs.length == 1) // one merge possible, then no pairs remain
  }

  test("bpeSegment: learned merges segment the corpus, fragmentation per doc") {
    val docs = Seq(
      (1L, "aaab aaab abab Z!"), (2L, "aaab abab xy")).toDF("doc_id", "text")
    // merges learned above: ab, aa, aaab, abab -> aaab/abab are 1 subword,
    // xy stays 2 (never merged); Z! is filtered from the word universe
    val r = TextAnalysis.bpeSegment(docs, "doc_id", "text", iters = 4).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getLong(3)))).toMap
    assert(r(1L) == ((3L, 3L, 1000L)))
    assert(r(2L) == ((3L, 4L, 1333L))) // floor(4/3*1000 + 0.5)
  }

  test("corpusReport: per-source counts, quality keeps, cross-source dup rate") {
    val good = (1 to 30).map(i => f"wd$i%02d").mkString(" ") // passes qualityRules
    val docs = Seq(
      (1L, good, "srcA"),
      (2L, "dup dup", "srcA"),
      (3L, "dup dup", "srcB"),   // exact cross-source copy of doc 2
      (4L, "short", "srcB")
    ).toDF("doc_id", "text", "source")
    val r = TextAnalysis.corpusReport(docs, "doc_id", "text", "source")
      .collect()
      .map(x => x.getString(0) -> ((x.getLong(1), x.getLong(2), x.getLong(3),
        x.getLong(4), x.getLong(5), x.getLong(6)))).toMap
    // srcA: 2 docs, 30+2 tokens, 1 keep, 1 dup (cross-source!), mean 16e6
    assert(r("srcA") == ((2L, 32L, 1L, 1L, 16000000L, 500000L)))
    // srcB: 2 docs, 2+1 tokens, 0 keeps, 1 dup, mean 1.5e6
    assert(r("srcB") == ((2L, 3L, 0L, 1L, 1500000L, 500000L)))
  }

  test("tfidfTopK: hand-computed integer scores, rank cut, doc_id tie-break") {
    val corpus = Seq(
      (10L, "apple banana apple"),         // apple tf 2
      (11L, "banana cherry"),
      (12L, "cherry cherry cherry date"),  // cherry tf 3
      (20L, "kiwi"),
      (21L, "kiwi")                        // tie partner for q98
    ).toDF("doc_id", "text")
    val queries = Seq(
      (99L, "apple cherry"),
      (98L, "kiwi zebra")                  // zebra absent from the corpus
    ).toDF("doc_id", "text")
    val r = TextAnalysis.tfidfTopK(corpus, queries, "doc_id", "text", k = 2)
      .collect()
      .map(x => (x.getLong(0), x.getAs[Int]("rnk")) ->
        ((x.getLong(1), x.getAs[Long]("score_e6"), x.getAs[Long]("n_terms"))))
      .toMap
    // N=5; idf_e6: apple 5e6/1, cherry 5e6/2, kiwi 5e6/2
    assert(r((99L, 1)) == ((10L, 10000000L, 1L))) // 1*2*5e6
    assert(r((99L, 2)) == ((12L, 7500000L, 1L)))  // 1*3*2.5e6; doc 11 (2.5e6) cut
    // kiwi tie 2.5e6 each -> lower doc_id ranks first; zebra contributes 0
    assert(r((98L, 1)) == ((20L, 2500000L, 1L)))
    assert(r((98L, 2)) == ((21L, 2500000L, 1L)))
    assert(r.size == 4)
  }

  test("bm25TopK: tf saturation and length normalization") {
    val corpus = Seq(
      (1L, "apple f1 f2 f3 f4 f5 f6 f7 f8 f9"), // tf 1, dl 10
      (2L, ("apple " * 10).trim),               // tf 10, dl 10
      (3L, "cherry c1"),                        // tf 1, dl 2
      (4L, "cherry " + (1 to 19).map(i => s"d$i").mkString(" ")) // tf 1, dl 20
    ).toDF("doc_id", "text")
    val queries = Seq((99L, "apple"), (98L, "cherry")).toDF("doc_id", "text")
    val r = TextAnalysis.bm25TopK(corpus, queries, "doc_id", "text", k = 4)
      .collect()
      .map(x => (x.getLong(0), x.getLong(1)) ->
        ((x.getAs[Long]("score_e4"), x.getAs[Int]("rnk")))).toMap
    // saturation: ten occurrences in the SAME-LENGTH doc score under
    // 2.1x one occurrence (a tf-linear scorer would say 10x):
    // 2.2·10/(10+1.2) vs 2.2·1/(1+1.2) → ratio ≈ 1.96
    val s1 = r((99L, 1L))._1
    val s2 = r((99L, 2L))._1
    assert(s2 > s1 && s2 < s1 * 21 / 10)
    // length normalization: same tf=1, the 2-token doc outranks the
    // 20-token doc (a normalization-free scorer ties them)
    assert(r((98L, 3L))._1 > r((98L, 4L))._1)
    assert(r((98L, 3L))._2 == 1)
  }

  test("lengthQuantiles: hand-computed interpolated quantiles and exact mean") {
    val docs = Seq(
      (1L, "a", "s"), (2L, "a b", "s"), (3L, "a b c", "s"), (4L, "a b c d", "s"),
      (5L, "x", "t")
    ).toDF("doc_id", "text", "source")
    val r = TextAnalysis.lengthQuantiles(docs, "doc_id", "text", "source")
      .collect().map(x => x.getString(0) -> x).toMap
    val s = r("s")
    assert(s.getAs[Long]("n_docs") == 4 && s.getAs[Long]("n_tokens") == 10)
    assert(s.getAs[Long]("mean_e6") == 2500000L)
    // lengths 1,2,3,4: p50 = 2.5 (linear interpolation), p25 = 1.75
    assert(s.getAs[Long]("p50_e6") == 2500000L)
    assert(s.getAs[Long]("p25_e6") == 1750000L)
    assert(s.getAs[Long]("p90_e6") == 3700000L) // 3 + 0.7*(4-3)
    val t = r("t")
    assert(t.getAs[Long]("n_docs") == 1 && t.getAs[Long]("p99_e6") == 1000000L)
  }

  test("importanceWeight: independent replay; target-like docs outrank off-domain") {
    val docs = Seq(
      (1L, "alpha beta alpha", "target"),
      (2L, "alpha alpha beta beta", "target"),
      (10L, "alpha beta alpha beta", "raw"),   // target-like
      (11L, "zeta eta theta iota", "raw"),     // off-domain
      (12L, "alpha zeta", "raw")               // mixed
    ).toDF("doc_id", "text", "source")
    val dims = 8
    val r = TextAnalysis.importanceWeight(docs, "doc_id", "text",
        isTarget = org.apache.spark.sql.functions.col("source") === "target", dims = dims)
      .collect()
      .map(x => x.getLong(0) -> ((x.getAs[Long]("n_tokens"), x.getAs[Long]("imp_e6"))))
      .toMap
    // independent replay with the same md5 bucket + posterior arithmetic
    def md5int(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex, 16)
    }
    def bucket(t: String): Int = (md5int(t) % dims).toInt
    val toks = Map(
      1L -> Seq("alpha", "beta", "alpha"), 2L -> Seq("alpha", "alpha", "beta", "beta"),
      10L -> Seq("alpha", "beta", "alpha", "beta"), 11L -> Seq("zeta", "eta", "theta", "iota"),
      12L -> Seq("alpha", "zeta"))
    val targetIds = Set(1L, 2L)
    val tc = toks.filter(t => targetIds(t._1)).values.flatten.groupBy(bucket).view.mapValues(_.size.toLong).toMap
    val rc = toks.filterNot(t => targetIds(t._1)).values.flatten.groupBy(bucket).view.mapValues(_.size.toLong).toMap
    val tN = tc.values.sum; val rN = rc.values.sum
    def w(b: Int): Long = {
      val num = (tc.getOrElse(b, 0L) + 1) * (rN + dims)
      val den = num + (rc.getOrElse(b, 0L) + 1) * (tN + dims)
      math.floor(num.toDouble * 1000000d / den.toDouble + 0.5).toLong - 500000L
    }
    Seq(10L, 11L, 12L).foreach { id =>
      val exp = toks(id).map(t => w(bucket(t))).sum
      assert(r(id) == ((toks(id).size.toLong, exp)), s"doc $id: got ${r(id)}, want $exp")
    }
    assert(!r.contains(1L) && !r.contains(2L)) // only raw docs are scored
    assert(r(10L)._2 > r(11L)._2) // target-like beats off-domain
  }

  test("classifierScore: logit matches an independent md5 replay, empty doc keeps bias") {
    val docs = Seq(
      (1L, "alpha alpha beta"),
      (2L, "  "),               // no tokens: verdict still issued, logit = bias
      (3L, "gamma")
    ).toDF("doc_id", "text")
    val bias = 250000L
    val r = TextAnalysis.classifierScore(docs, "doc_id", "text", dims = 8, biasE6 = bias)
      .collect()
      .map(x => x.getLong(0) ->
        ((x.getAs[Long]("n_tokens"), x.getAs[Long]("logit_e6"), x.getAs[Boolean]("keep"))))
      .toMap
    def md5int(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex, 16)
    }
    def weight(tok: String): Long = md5int(s"w:${md5int(tok) % 8}") % 2001L - 1000L
    val logit1 = 2 * weight("alpha") + weight("beta") + bias
    val logit3 = weight("gamma") + bias
    assert(r(1L) == ((3L, logit1, logit1 >= 0)))
    assert(r(2L) == ((0L, bias, true)))
    assert(r(3L) == ((1L, logit3, logit3 >= 0)))
    assert(r.size == 3)
  }

  // --- content-defined chunking ---

  private def mdHex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def gearHit(gram: String, divisor: Int): Boolean =
    java.lang.Long.parseLong(mdHex(gram).take(8), 16) % divisor == 0

  test("cdcChunks reproduces an independent java-side replay of the cut rule") {
    val tokens = (1 to 120).map(i => s"w${i % 37}")
    val df = Seq((1L, tokens.mkString(" "))).toDF("doc_id", "text")
    val w = 4; val d = 4
    val expectedCuts = (w to tokens.size - 1).filter { p =>
      gearHit(tokens.slice(p - w, p).mkString(" "), d)
    }
    val rows = TextAnalysis.cdcChunks(df, "doc_id", "text", w, d)
      .orderBy("chunk_idx").collect()
    val gotCuts = rows.drop(1).map(_.getAs[Int]("start_pos") - 1).toSeq
    assert(gotCuts == expectedCuts)
    // reassembly: chunks partition the token stream exactly, in order
    assert(rows.map(_.getAs[String]("chunk_text")).mkString(" ") == tokens.mkString(" "))
    assert(rows.map(_.getAs[Int]("n_chunk_tokens")).sum == tokens.size)
    rows.foreach { r =>
      assert(r.getAs[String]("chunk_hash") == mdHex(r.getAs[String]("chunk_text")))
    }
  }

  test("cdcChunks boundaries are local: a one-token edit moves only window-near cuts") {
    val base = (1 to 300).map(i => s"t${i % 53}")
    val edited = base.updated(149, "EDITED") // position 150 (1-based)
    val df = Seq((1L, base.mkString(" ")), (2L, edited.mkString(" ")))
      .toDF("doc_id", "text")
    val out = TextAnalysis.cdcChunks(df, "doc_id", "text", 4, 4)
      .select("doc_id", "chunk_idx", "start_pos").collect()
      .groupBy(_.getLong(0))
      .map { case (k, rs) =>
        k -> rs.filter(_.getAs[Int]("chunk_idx") > 1).map(_.getAs[Int]("start_pos") - 1).toSet
      }
    // a cut at p depends on tokens [p-3, p] only, so cuts outside the
    // edit's window footprint [150, 153] must be identical — the CDC
    // property that bounds re-chunking under edits (fixed-stride
    // chunking shifts EVERY downstream boundary instead)
    val affected = (150 to 153).toSet
    assert(out(1L).diff(affected) == out(2L).diff(affected))
  }

  test("cdcChunks edge cases: short doc = one chunk, empty doc = no rows") {
    val df = Seq((1L, "a b c"), (2L, "   "), (3L, "")).toDF("doc_id", "text")
    val rows = TextAnalysis.cdcChunks(df, "doc_id", "text", 4, 8).collect()
    assert(rows.length == 1) // doc 1 only: fewer tokens than the window
    assert(rows.head.getAs[Long]("doc_id") == 1L)
    assert(rows.head.getAs[String]("chunk_text") == "a b c")
    assert(rows.head.getAs[Int]("start_pos") == 1)
  }

  // --- median/MAD outliers ---

  test("lengthOutliers hand-computed: spike flags, half-unit medians exact") {
    val docs = Seq(
      // group A: [10,10,10,10,100] -> med2=20, d2=[0,0,0,0,180], mad4=0
      // MAD=0 degenerate: any deviation flags -> only the 100 is out
      (1L, ("x " * 10).trim, "A"), (2L, ("x " * 10).trim, "A"),
      (3L, ("x " * 10).trim, "A"), (4L, ("x " * 10).trim, "A"),
      (5L, ("x " * 100).trim, "A"),
      // group B: [1,2,3,4] -> med 2.5 -> med2=5, d2=[3,1,1,3],
      // median(d2)=2 -> mad4=4; outlier iff 2*d2 > 3*4=12 -> none
      (6L, "x", "B"), (7L, "x x", "B"), (8L, "x x x", "B"), (9L, "x x x x", "B")
    ).toDF("doc_id", "text", "source")
    val r = TextAnalysis.lengthOutliers(docs, "doc_id", "text", "source", c = 3)
      .collect().map(x => x.getAs[Long]("doc_id") ->
        ((x.getAs[Long]("med2"), x.getAs[Long]("mad4"), x.getAs[Boolean]("is_outlier")))).toMap
    assert(r(1L) == ((20L, 0L, false)))
    assert(r(5L) == ((20L, 0L, true)))
    assert(r(6L) == ((5L, 4L, false)))
    assert(r(9L) == ((5L, 4L, false)))
    assert(r.size == 9)
  }

  test("repetition signals: hand-computed shares and tie order") {
    val df = Seq(
      (1L, "ab cd ab cd ab"),  // 5 tokens, 14 chars
      (2L, "x y z"),           // no repetition at all
      (3L, "a b")              // < 3 tokens: filtered out
    ).toDF("doc_id", "text")
    val r = TextAnalysis.repetitionSignals(df, "doc_id", "text")
      .collect().map(x => x.getAs[Long]("doc_id") -> x).toMap
    assert(r.size == 2, "docs under 3 tokens are dropped")
    val d1 = r(1L)
    assert(d1.getAs[Long]("n_tokens") == 5)
    assert(d1.getAs[String]("top_token") == "ab")                 // count 3
    assert(d1.getAs[Long]("top1_e6") == 600000L)                  // 3/5
    // bigrams "ab cd"(2) vs "cd ab"(2): tie -> lexicographically GREATER
    assert(d1.getAs[String]("top_bigram") == "cd ab")
    assert(d1.getAs[Long]("top2_char_e6") ==                      // 2*5/14
      math.floor(2 * 5 * 1000000.0 / 14 + 0.5).toLong)
    // trigrams [ab cd ab, cd ab cd, ab cd ab]: 2 of 3 occurrences dup'd
    assert(d1.getAs[Long]("dup3_e6") == 666667L)
    val d2 = r(2L)
    assert(d2.getAs[Long]("top1_e6") == 333333L)
    assert(d2.getAs[String]("top_token") == "z")                  // all-tie
    assert(d2.getAs[Long]("dup3_e6") == 0L)
  }

  test("urlCanon: every canonical rule on crafted URLs") {
    val df = Seq(
      (1L, "x HTTPS://Ex.COM:443/A/B/?utm_source=s&q=1&utm_medium=m#f y"),
      (2L, "http://h.io/ http://h.io http://H.IO:80/?gclid=g."),
      (3L, "pre http://h.io:8080/p?a=1&ref=r&b=2 post"),
      (4L, "no urls"),
      (5L, "(see http://a.b/x).")
    ).toDF("doc_id", "text")
    val r = TextAnalysis.urlCanon(df, "doc_id", "text").collect()
      .map(x => (x.getAs[Long]("doc_id"), x.getAs[Long]("url_pos")) -> x).toMap
    // case-folded scheme+host, default port dropped, tracking params
    // dropped (order of survivors preserved), fragment cut, trailing /
    assert(r((1L, 0L)).getAs[String]("canonical_url") == "https://ex.com/A/B?q=1")
    assert(r((1L, 0L)).getAs[Long]("n_dropped_params") == 2L)
    assert(r((1L, 0L)).getAs[String]("host") == "ex.com")
    // three surface forms of the same page collapse to one canonical
    val h = Seq(r((2L, 0L)), r((2L, 1L)), r((2L, 2L)))
      .map(_.getAs[String]("canonical_url")).distinct
    assert(h == Seq("http://h.io"))
    // non-default port survives; non-tracking params keep their order
    assert(r((3L, 0L)).getAs[String]("canonical_url") == "http://h.io:8080/p?a=1&b=2")
    assert(r((3L, 0L)).getAs[Long]("n_dropped_params") == 1L)
    // no matches → no rows
    assert(!r.keySet.exists(_._1 == 4L))
    // prose punctuation stripped from the raw match
    assert(r((5L, 0L)).getAs[String]("url_raw") == "http://a.b/x")
    assert(r((5L, 0L)).getAs[String]("canonical_url") == "http://a.b/x")
  }

  test("wordpiece: per-doc totals and the full-segmentation signature") {
    val vocab = Seq("tab", "le", "str", "eam") ++ ('a' to 'z').map(_.toString)
    val df = Seq((1L, "table stream"), (2L, "tab 42")).toDF("doc_id", "text")
    val r = TextAnalysis.wordpiece(df, "doc_id", "text", vocab).collect()
      .map(x => x.getAs[Long]("doc_id") -> x).toMap
    assert(r(1L).getAs[Long]("n_pieces") == 4L) // tab|le str|eam
    assert(r(1L).getAs[Long]("n_unk") == 0L)
    assert(r(2L).getAs[Long]("n_pieces") == 3L) // tab <unk> <unk>
    assert(r(2L).getAs[Long]("n_unk") == 2L)
    // the signature pins the exact piece sequence
    val sig = java.security.MessageDigest.getInstance("MD5")
      .digest("tab le str eam".getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    assert(r(1L).getAs[String]("pieces_sig") == sig)
  }

  test("frequentPairs: equals the brute-force pair truth when the cap is inert") {
    // 10 docs over a 6-token vocab; brute-force doc-level pair counts
    val texts = Seq(
      "a b c", "a b", "a c d", "b c d e", "a b c d", "e f", "a e",
      "b c", "a b e", "d e f")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val out = TextAnalysis.frequentPairs(df, "doc_id", "text",
      supportDenom = 5, maxPerDoc = 64).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    // brute force in Scala
    val sets = texts.map(_.split(" ").toSet)
    val n = sets.length
    val dfm = sets.flatten.groupBy(identity).view.mapValues(_.size).toMap
    val pairTruth = (for {
      s <- sets; a <- s; b <- s if a < b
    } yield (a, b)).groupBy(identity).view.mapValues(_.size)
      .filter { case ((a, b), c) =>
        c * 5 >= n && dfm(a) * 5 >= n && dfm(b) * 5 >= n }.toMap
    assert(out.keySet == pairTruth.keySet)
    pairTruth.foreach { case ((a, b), c) =>
      val r = out((a, b))
      assert(r.getAs[Long]("pair_df") == c.toLong)
      assert(r.getAs[Long]("df_a") == dfm(a).toLong)
      assert(r.getAs[Long]("df_b") == dfm(b).toLong)
      assert(r.getAs[Long]("milli_lift") ==
        1000L * c * n / (dfm(a).toLong * dfm(b)))
    }
  }

  test("frequentPairs: the per-doc cap keeps only top-df tokens, replayably") {
    // 'x' and 'y' in every doc (df 4); 'p'/'q' in 3 of 4. With
    // maxPerDoc = 2 every doc keeps exactly {x, y} (highest df, then
    // token order breaks the p/q vs x/y tie deterministically: df is
    // 4 > 3 so x,y win) — the only pair that can survive is (x, y).
    val df = Seq((1L, "x y p q"), (2L, "x y p q"), (3L, "x y p q"),
      (4L, "x y")).toDF("doc_id", "text")
    val out = TextAnalysis.frequentPairs(df, "doc_id", "text",
      supportDenom = 2, maxPerDoc = 2).collect()
    assert(out.map(r => (r.getString(0), r.getString(1))).toSet ==
      Set(("x", "y")))
    assert(out.head.getAs[Long]("pair_df") == 4L)
  }

  test("frequentPairs: a-priori prunes pairs whose member is infrequent") {
    // 'rare' co-occurs with 'a' in its only doc; df(rare)=1 < 3/2 of 6
    val df = Seq((1L, "a b"), (2L, "a b"), (3L, "a b"), (4L, "a b"),
      (5L, "a b"), (6L, "a rare")).toDF("doc_id", "text")
    val out = TextAnalysis.frequentPairs(df, "doc_id", "text",
      supportDenom = 2, maxPerDoc = 64).collect()
    assert(out.map(r => (r.getString(0), r.getString(1))).toSet ==
      Set(("a", "b")))
  }

  test("unigramDivergence: hand-computed TV on a two-slice corpus") {
    // slice A: tokens {x:2, y:1, z:1} tot 4; slice B: {x:1, y:1, w:2} tot 4
    // p_micro A: x=500000 y=250000 z=250000 (sum 1000000)
    // p_micro B: x=250000 y=250000 w=500000 (sum 1000000)
    // common {x, y}: min-sum = 250000 + 250000 = 500000
    // tv2 = 1000000 + 1000000 - 2*500000 = 1000000  (TV = 0.5)
    val df = Seq(("A", "x x y z"), ("B", "x y w w")).toDF("slice", "text")
    val out = TextAnalysis.unigramDivergence(df, "slice", "text").collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[String]("slice_a") == "A" && r.getAs[String]("slice_b") == "B")
    assert(r.getAs[Long]("n_common_tokens") == 2L)
    assert(r.getAs[Long]("s_a_micro") == 1000000L)
    assert(r.getAs[Long]("s_b_micro") == 1000000L)
    assert(r.getAs[Long]("min_overlap_micro") == 500000L)
    assert(r.getAs[Long]("tv2_micro") == 1000000L)
  }

  test("unigramDivergence: identical slices diverge zero; disjoint emit no row") {
    val same = Seq(("A", "a b c"), ("B", "a b c")).toDF("slice", "text")
    val r = TextAnalysis.unigramDivergence(same, "slice", "text").collect().head
    assert(r.getAs[Long]("tv2_micro") == 0L)
    // fully disjoint vocabularies: the inner vocab join finds nothing
    val disjoint = Seq(("A", "a b"), ("B", "c d")).toDF("slice", "text")
    assert(TextAnalysis.unigramDivergence(disjoint, "slice", "text").collect().isEmpty)
  }

  test("unigramDivergence: every unordered pair reported once, floor loss carried") {
    // three slices; tot=3 makes 1e6 DIV 3 lossy: s_micro = 999999
    val df = Seq(("A", "a b c"), ("B", "a b c"), ("C", "a q r")).toDF("slice", "text")
    val out = TextAnalysis.unigramDivergence(df, "slice", "text").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("tv2_micro")).toMap
    assert(out.keySet == Set(("A", "B"), ("A", "C"), ("B", "C")))
    assert(out(("A", "B")) == 0L)
    // A vs C share only 'a': min-overlap 333333, tv2 = 2*999999 - 2*333333
    assert(out(("A", "C")) == 2L * 999999L - 2L * 333333L)
  }

  test("textRank: the co-occurrence hub word ranks first, deterministically") {
    import spark.implicits._
    // 'hub' is adjacent to every satellite (each bigram 5x, passing
    // minCount); satellites only ever touch 'hub'. The hub accumulates
    // rank from all satellites and must rank first; satellites tie on
    // rank and cut alphabetically.
    val docs = (1 to 5).flatMap { _ =>
      Seq("hub alpha hub beta hub gamma hub delta")
    }.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val out = TextAnalysis.textRank(docs, "doc_id", "text",
      k = 10, minCount = 5, iters = 10).orderBy("rnk").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.length == 5)
    assert(out.head._2 == "hub")
    assert(out.head._3 > out(1)._3)  // hub strictly dominates
    // satellites: alpha/beta/gamma tie (same in/out structure) and cut
    // by word; delta ends rows (no trailing bigram back to hub's count
    // differs) — just pin full determinism across plans instead
    val again = TextAnalysis.textRank(docs, "doc_id", "text",
      k = 10, minCount = 5, iters = 10).orderBy("rnk").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(again.toSeq == out.toSeq)
  }

  test("textRank: bigrams below minCount leave no nodes") {
    import spark.implicits._
    val docs = Seq((1L, "a b c d"), (2L, "e f g h")).toDF("doc_id", "text")
    assert(TextAnalysis.textRank(docs, "doc_id", "text",
      k = 10, minCount = 5, iters = 3).isEmpty)
  }

  test("domainAffinity: hand-computed histogram intersection in milli") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // the arithmetic below assumes the four tokens land in distinct
    // hash buckets — assert it, so a (deterministic) collision can
    // never silently change the expected values
    val toks = Seq("alpha", "beta", "gamma", "delta")
    val b = toks.map(t => spark.range(1)
      .select(Sampling.hashBucket(lit(t), "da")).head.getLong(0))
    assert(b.distinct.size == 4, s"bucket collision among $toks: $b")
    val target = Seq((100L, "alpha beta")).toDF("doc_id", "text") // N_t = 2
    val corpus = Seq(
      (1L, "alpha beta"),   // identical distribution -> 1000
      (2L, "gamma delta"),  // disjoint -> 0
      (3L, "alpha gamma"),  // half the mass in-domain -> 500
      (4L, "alpha alpha")   // INTERSECTION, not overlap count: the doc
                            // over-concentrates alpha; min(2*2, 1*2)=2 -> 500
    ).toDF("doc_id", "text")
    val got = TextAnalysis.domainAffinity(corpus, target, "doc_id", "text")
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("overlap_num"), r.getAs[Long]("affinity_milli"))).toSet
    assert(got == Set((1L, 2L, 4L, 1000L), (2L, 2L, 0L, 0L),
      (3L, 2L, 2L, 500L), (4L, 2L, 2L, 500L)))
  }

  test("domainAffinity: tokenless docs absent; zero-overlap docs kept") {
    import spark.implicits._
    val target = Seq((9L, "x y z")).toDF("doc_id", "text")
    val corpus = Seq((1L, "   "), (2L, "q")).toDF("doc_id", "text")
    val got = TextAnalysis.domainAffinity(corpus, target, "doc_id", "text")
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("affinity_milli")))
    assert(got.toSeq == Seq((2L, 0L)))
  }

  test("wordpieceTrain: likelihood rule diverges from BPE count rule") {
    // dictionary: aab x5, xy x4. BPE would merge (a,a) first (count tie
    // 5=5, lex). WordPiece unigrams a=10,b=5,x=4,y=4 score
    // (x,y)=4e9/16=2.5e8 > (a,b)=5e9/50=1e8 > (a,a)=5e9/100=5e7 -> xy first.
    val docs = Seq(
      (1L, "aab aab aab xy xy"), (2L, "aab aab xy xy Z!")).toDF("doc_id", "text")
    val r = TextAnalysis.wordpieceTrain(docs, "doc_id", "text", iters = 4).collect()
      .map(x => (x.getInt(0), x.getString(1), x.getString(2), x.getString(3),
        x.getLong(4), x.getLong(5)))
    assert(r.toSeq == Seq(
      (1, "x", "y", "xy", 4L, 250000000L),
      // after xy: unigrams a=10,b=5,xy=4; (a,b)=5e9/50=1e8 > (a,a)=5e7
      (2, "a", "b", "ab", 5L, 100000000L),
      // aab -> [a, ab] x5: (a,ab)=5e9/(5*5)=2e8
      (3, "a", "ab", "aab", 5L, 200000000L)))
    // exhausted after 3 merges (every word a single symbol) -> 3 rows
    assert(r.length == 3)
  }

  test("wordpieceSegment: learned merges collapse the corpus to whole words") {
    val docs = Seq(
      (1L, "aab aab aab xy xy"), (2L, "aab aab xy xy Z!")).toDF("doc_id", "text")
    val r = TextAnalysis.wordpieceSegment(docs, "doc_id", "text", iters = 4).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getLong(3)))).toMap
    // all three merges land: every word is one subword
    assert(r(1L) == ((5L, 5L, 1000L)))
    assert(r(2L) == ((4L, 4L, 1000L)))
  }

  test("unigramTrain/unigramSegment: seed, hard-EM usage recount, char floor, UNK — hand-computed") {
    val docs = Seq((1L, "ab ab b")).toDF("doc_id", "text")
    def lnM(num: Double, den: Double): Long =
      math.floor(1000.0 * math.log(num / den) + 0.5).toLong
    // seed: a:2, b:3, ab:2 (freq-weighted overlapping substrings)
    // E-step under seed scores: "ab" segments as [ab], "b" as [b]
    // M-step usage: ab:2, b:1; char floor resurrects a at 1 -> total 4
    val vocab = TextAnalysis.unigramTrain(docs, "doc_id", "text",
      vocabSize = 8, iters = 1).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(vocab == Map(
      "a" -> ((1L, lnM(1, 4))),
      "ab" -> ((2L, lnM(2, 4))),
      "b" -> ((1L, lnM(1, 4)))))
    val seg = TextAnalysis.unigramSegment(docs, "doc_id", "text",
      vocabSize = 8, iters = 1).collect().head
    assert(seg.getAs[Long]("n_words") == 3L)
    assert(seg.getAs[Long]("n_subwords") == 3L)
    assert(seg.getAs[Long]("ll_milli") == 2 * lnM(2, 4) + lnM(1, 4))
    assert(seg.getAs[Long]("subwords_per_word_milli") == 1000L)
    // UNK: a word with an out-of-alphabet char still scores (char-wise)
    val seg2 = TextAnalysis.unigramSegment(
      Seq((2L, "ab zq")).toDF("doc_id", "text"), "doc_id", "text",
      vocabSize = 8, iters = 1).collect().head
    // trained on "ab zq": vocab includes z, q... use a corpus where zq
    // is OOV relative to training: train sees only doc text itself, so
    // instead pin determinism: two runs agree
    val seg3 = TextAnalysis.unigramSegment(
      Seq((2L, "ab zq")).toDF("doc_id", "text"), "doc_id", "text",
      vocabSize = 8, iters = 1).collect().head
    assert(seg2 == seg3)
  }

  test("unigramTrain: vocab-size pruning pressure and iteration-2 laws") {
    // a real corpus seeds hundreds of multi-char candidates, so a tiny
    // vocabSize makes the per-iteration prune actually bite
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    def run(v: Int, it: Int) =
      TextAnalysis.unigramTrain(docs, "doc_id", "text", vocabSize = v, iters = it)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // the cap prunes the SEED inventory and every recount, so usage
    // under a tighter seed legitimately concentrates further — the laws
    // are the CEILING (never more than v multi-char survive) and the
    // BITE (a tight cap yields strictly fewer survivors than a generous
    // one), not an exact count
    val generous = run(10000, 1).count(_._1.length > 1)
    val tight = run(4, 1).count(_._1.length > 1)
    assert(tight <= 4 && tight < generous,
      s"pruning must bite: tight=$tight vs generous=$generous")
    for (v <- Seq(4, 16); it <- Seq(1, 2)) {
      val out = run(v, it)
      val multi = out.filter(_._1.length > 1)
      val chars = out.filter(_._1.length == 1)
      // the cap is a hard ceiling at every depth
      assert(multi.length <= v && multi.nonEmpty,
        s"v=$v it=$it: ${multi.length} multi-char survivors exceed the cap")
      // the single-char tier always survives with the count floor —
      // segmentability can never be pruned away
      assert(chars.nonEmpty && chars.forall(_._2 >= 1L))
      // scores renormalize over the PRUNED inventory
      val total = out.map(_._2).sum
      out.foreach { case (p, c, m) =>
        assert(m == math.floor(1000.0 * math.log(c.toDouble / total) + 0.5).toLong,
          s"v=$v it=$it piece=$p: log_milli must renormalize over the pruned set")
      }
      // every iteration-2 multi-char survivor came from iteration 1's
      // inventory (the prune is monotone across iterations)
      if (it == 2) {
        val v1 = run(v, 1).map(_._1).toSet
        assert(multi.map(_._1).forall(v1.contains),
          s"v=$v: iteration 2 resurrected a pruned piece")
      }
    }
  }

  test("nbClassify: smoothing, unseen-token default, tie-break, margin — hand-computed") {
    // train: class 'x' = {foo foo bar}, class 'y' = {baz baz qux}
    // vocab V = 4; N(x) = N(y) = 3; priors = ln(1/2) each
    val train = Seq(
      (1L, "foo foo bar", "x"), (2L, "baz baz qux", "y"))
      .toDF("doc_id", "text", "source")
    def lnMilli(x: Double): Long = math.floor(1000.0 * math.log(x) + 0.5).toLong
    val prior = lnMilli(0.5)
    // log-probs with add-one smoothing over (N + V) = 7
    val pFooX = lnMilli(3.0 / 7); val pFooY = lnMilli(1.0 / 7)
    val pBarX = lnMilli(2.0 / 7); val pBarY = lnMilli(1.0 / 7)
    val unseen = lnMilli(1.0 / 7) // 'zzz' is out-of-vocab for BOTH classes
    val score = Seq(
      (10L, "foo bar", "x"),      // clearly x
      (11L, "baz", "y"),          // clearly y
      (12L, "zzz zzz", "x"))      // all-unseen: scores tie -> 'x' (alpha-first)
      .toDF("doc_id", "text", "source")
    val r = TextAnalysis.nbClassify(train, score, "doc_id", "text", "source")
      .collect().map(x => x.getLong(0) ->
        ((x.getString(2), x.getBoolean(3), x.getLong(4)))).toMap
    assert(r(10L)._1 == "x" && r(10L)._2)
    assert(r(10L)._3 ==
      (prior + pFooX + pBarX) - (prior + pFooY + pBarY))
    assert(r(11L)._1 == "y" && r(11L)._2)
    // the tie: both classes score prior + 2·unseen -> alphabetically
    // first class wins with margin 0
    assert(r(12L) == (("x", true, 0L)), s"got ${r(12L)}, unseen=$unseen")
  }
}
