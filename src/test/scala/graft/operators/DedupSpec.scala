package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  // 3 exact copies of A, near-dup pair (B, B'), and unrelated docs.
  private val base = "the quick brown fox jumps over the lazy dog again and again today"
  private def corpus = Seq(
    (1L, base), (2L, base), (3L, base),
    (4L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"),
    (5L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda nu"), // 1-word edit
    (6L, "one two three four five six seven eight nine ten eleven twelve"),
    (7L, "  The   Quick  brown FOX jumps over the lazy dog again and again today ") // reformat of A
  ).toDF("doc_id", "text")

  test("exact dedup groups identical texts, keeps min id") {
    val r = Dedup.exact(corpus, "doc_id", "text").collect()
      .map(x => x.getLong(1) -> x.getLong(2)).toMap
    assert(r(1L) == 3L)          // 1,2,3 identical → keeper 1, 3 copies
    assert(r.values.sum == 7L)   // every doc accounted for
    assert(r.keys.toSet.contains(7L)) // reformatted copy is NOT exact-equal
  }

  test("fingerprint dedup catches case/whitespace reformatting") {
    val r = Dedup.fingerprint(corpus, "doc_id", "text").collect()
      .map(x => x.getLong(1) -> x.getLong(2)).toMap
    assert(r(1L) == 4L)          // 1,2,3 AND normalized 7 share a fingerprint
    assert(!r.contains(7L))
  }

  test("minhash-lsh finds near-dup pair and exact copies, skips unrelated") {
    val pairs = Dedup.minhashLsh(corpus, "doc_id", "text",
        n = 3, k = 128, bands = 32, threshold = 0.5)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)) && pairs.contains((2L, 3L)) && pairs.contains((1L, 3L)))
    assert(pairs.contains((4L, 5L))) // the 1-word-edit near dup
    assert(!pairs.exists { case (a, b) => Set(a, b).contains(6L) }) // unrelated
  }

  test("jaccard of exact copies is 1.0, of near-dups in (0,1)") {
    val j = Dedup.minhashLsh(corpus, "doc_id", "text", threshold = 0.0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(j((1L, 2L)) == 1.0)
    assert(j((4L, 5L)) > 0.5 && j((4L, 5L)) < 1.0)
  }

  test("prefix-filter jaccard join equals brute-force all-pairs at several thresholds") {
    val sets = Dedup.shingleSets(corpus, "doc_id", "text", 3)
    val ids = corpus.select(col("doc_id"))
    val allPairs = ids.as("a").join(ids.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
    for (t <- Seq(0.3, 0.5, 0.8, 1.0)) {
      val brute = Dedup.jaccardVerify(allPairs, sets)
        .filter(col("jaccard") >= t)
        .select("doc_a", "doc_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val pf = Dedup.jaccardPairs(corpus, "doc_id", "text", n = 3, threshold = t)
        .select("doc_a", "doc_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pf == brute, s"threshold $t: prefix-filter $pf != brute $brute")
    }
  }

  test("prefix-filter jaccard join equals brute force on seeded random corpora") {
    // Random corpora exercise prefix/ceil boundaries the fixed fixture
    // can't: mutated copies at every similarity level, skewed shingle
    // frequencies, set sizes that make t·|X| land near integers.
    val rnd = new scala.util.Random(20260812L)
    val vocab = ('a' to 'p').map(_.toString)
    for (trial <- 1 to 5) {
      val docs = (1L to 20L).map { id =>
        val base = Vector.fill(8 + rnd.nextInt(10))(vocab(rnd.nextInt(vocab.size)))
        val text = if (id % 3 == 0) { // mutated copy of the previous doc
          val prev = Vector.fill(8 + rnd.nextInt(10))(vocab(rnd.nextInt(vocab.size)))
          prev.updated(rnd.nextInt(prev.size), vocab(rnd.nextInt(vocab.size)))
        } else base
        (id, text.mkString(" "))
      }
      val df = docs.toDF("doc_id", "text")
      val t = 0.1 + rnd.nextDouble() * 0.9
      val sets = Dedup.shingleSets(df, "doc_id", "text", 3)
      val ids = df.select(col("doc_id"))
      val allPairs = ids.as("a").join(ids.as("b"), col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      val brute = Dedup.jaccardVerify(allPairs, sets).filter(col("jaccard") >= t)
        .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val pf = Dedup.jaccardPairs(df, "doc_id", "text", n = 3, threshold = t)
        .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pf == brute, s"trial $trial threshold $t: $pf != $brute")
    }
  }

  test("prefix-filter jaccard join scores exact copies 1.0, near-dups below") {
    val j = Dedup.jaccardPairs(corpus, "doc_id", "text", n = 3, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(j((1L, 2L)) == 1.0)
    assert(j((4L, 5L)) > 0.5 && j((4L, 5L)) < 1.0)
    assert(!j.keySet.exists { case (a, b) => Set(a, b).contains(6L) })
  }

  test("simhash: identical docs at distance 0; near-dups close; unrelated far") {
    val sigs = Dedup.simhashSignatures(
        Dedup.shingleSets(corpus, "doc_id", "text", 3))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs(1L) == sigs(2L))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sigs(4L), sigs(5L)) <= 16)
    assert(ham(sigs(4L), sigs(6L)) > 16)
  }

  test("simhash pairs via chunk banding = brute-force pairs at same cutoff") {
    val pairs = Dedup.simhashPairs(corpus, "doc_id", "text", n = 3, maxHamming = 8)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sigs = Dedup.simhashSignatures(
        Dedup.shingleSets(corpus, "doc_id", "text", 3))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val brute = (for {
      a <- sigs.keys; b <- sigs.keys if a < b
      if java.lang.Long.bitCount(sigs(a) ^ sigs(b)) <= 8
    } yield (a, b)).toSet
    assert(pairs == brute) // pigeonhole banding loses nothing
  }

  test("simhashPairs maxHamming=0 means exact signature equality, not a cross join") {
    val pairs = Dedup.simhashPairs(corpus, "doc_id", "text", n = 3, maxHamming = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L), (1L, 3L), (2L, 3L))) // the identical docs only
    intercept[IllegalArgumentException](
      Dedup.simhashPairs(corpus, "doc_id", "text", maxHamming = 16))
  }

  test("exact-fingerprint contamination: reformatted copies flagged, others not") {
    import spark.implicits._
    val train = Seq(
      (1L, "The quick   Brown fox!"),   // reformatting of bench 10
      (2L, "entirely different content"),
      (3L, "shared exact text")).toDF("doc_id", "text")
    val bench = Seq(
      (10L, "the quick brown fox"),
      (11L, "shared exact text"),
      (12L, "benchmark only prose")).toDF("doc_id", "text")
    val hits = Dedup.contaminated(train, bench, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(hits == Set(1L, 3L))
  }

  test("near-dup contamination finds only cross-side pairs") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val train = docs.filter(col("doc_id") % 2 =!= 0)
    val bench = docs.filter(col("doc_id") % 2 === 0)
    val hits = Dedup.contaminatedNear(train, bench, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // every flagged doc is from train, every match from bench
    assert(hits.forall { case (t, b) => t % 2 != 0 && b % 2 == 0 })
    // cross-check against the full pair list: exactly the straddling pairs
    val allPairs = Dedup.minhashLsh(docs, "doc_id", "text", threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val straddling = allPairs.filter { case (a, b) => (a % 2 == 0) != (b % 2 == 0) }
      .map { case (a, b) => if (a % 2 != 0) (a, b) else (b, a) }
    assert(hits == straddling && hits.nonEmpty)
  }

  test("fixture: lsh pairs equal all-pairs ground truth at sf0.001") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val lsh = Dedup.minhashLsh(docs, "doc_id", "text", threshold = 0.8)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // ground truth: exact jaccard on ALL pairs (test-scale only)
    val sets = Dedup.shingleSets(docs, "doc_id", "text", 3)
    val ids = docs.select("doc_id").as[Long].collect()
    val allPairs = ids.flatMap(a => ids.filter(_ > a).map(b => (a, b)))
      .toSeq.toDF("doc_a", "doc_b")
    val truth = Dedup.jaccardVerify(allPairs, sets)
      .filter(col("jaccard") >= 0.8)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh == truth)
    assert(truth.nonEmpty) // fixture has planted near-dups
  }

  test("line dedup keeps the corpus-wide first occurrence, reassembles in order") {
    val docs = Seq(
      (1L, "unique one\nCOMMON HEADER\nunique two"),
      (2L, "COMMON HEADER\nunique three"),      // header lost to doc 1 pos 1
      (3L, "COMMON HEADER"),                    // only line loses → doc vanishes
      (4L, "unique four\n \nunique four")       // blank dropped; self-dup within doc
    ).toDF("doc_id", "text")
    val r = Dedup.dedupLines(docs, "doc_id", "text", delim = "\n")
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getString(2))).toMap
    assert(r(1L) == (3L, "unique one\nCOMMON HEADER\nunique two"))
    assert(r(2L) == (1L, "unique three"))
    assert(!r.contains(3L))
    assert(r(4L) == (1L, "unique four")) // second copy in the SAME doc also loses
  }

  test("line dedup first-occurrence tie is by (doc_id, pos), not arbitrary") {
    val docs = Seq(
      (2L, "dup\nx"), (1L, "y\ndup") // line "dup": (1,1) beats (2,0)
    ).toDF("doc_id", "text")
    val r = Dedup.dedupLines(docs, "doc_id", "text", delim = "\n")
      .collect().map(x => x.getLong(0) -> x.getString(2)).toMap
    assert(r == Map(1L -> "y\ndup", 2L -> "x"))
  }

  test("clusters: transitive closure, min-id keeper, singletons kept") {
    val docsIds = (1L to 7L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    // A∼B, B∼C (A∼C never emitted) + an independent pair; 6, 7 untouched
    val pairs = Seq((2L, 1L), (2L, 3L), (4L, 5L)).toDF("doc_a", "doc_b")
    val r = Dedup.clusters(docsIds, "doc_id", pairs).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getBoolean(3)))).toMap
    assert(r(1L) == ((1L, 3L, true)))   // component {1,2,3}, keeper 1
    assert(r(2L) == ((1L, 3L, false)))
    assert(r(3L) == ((1L, 3L, false)))
    assert(r(4L) == ((4L, 2L, true)))
    assert(r(5L) == ((4L, 2L, false)))
    assert(r(6L) == ((6L, 1L, true)))   // singleton clusters with itself
    assert(r(7L) == ((7L, 1L, true)))
  }

  test("clusters: a long chain converges to one component") {
    val n = 12L
    val docsIds = (1L to n).map(i => (i, s"d$i")).toDF("doc_id", "text")
    val chain = (1L until n).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val r = Dedup.clusters(docsIds, "doc_id", chain).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getBoolean(3)))
    assert(r.forall { case (_, cid, sz, _) => cid == 1L && sz == n })
    assert(r.count(_._4) == 1 && r.find(_._4).get._1 == 1L)
  }

  test("keepBest: highest score wins the cluster, ties go to lowest id") {
    val clusters = Seq(
      (1L, 1L), (2L, 1L), (3L, 1L), // scores 5, 9, 9 → keeper 2 (tie 2<3)
      (4L, 4L), (5L, 4L),           // scores 7, 3 → keeper 4
      (6L, 6L)                      // singleton
    ).toDF("doc_id", "cluster_id")
    val scores = Seq((1L, 5L), (2L, 9L), (3L, 9L), (4L, 7L), (5L, 3L), (6L, 2L))
      .toDF("doc_id", "n_words")
    val r = Dedup.keepBest(clusters, scores, "n_words").collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getLong(3)))).toMap
    assert(r(1L) == ((2L, 9L, 3L)))
    assert(r(4L) == ((4L, 7L, 2L)))
    assert(r(6L) == ((6L, 2L, 1L)))
  }

  test("dupSpans: shared region merges to one span; within-doc repeats count") {
    val docs = Seq(
      (1L, "a b c d e f g h"),          // shares "a b c d e" with doc 2
      (2L, "x y a b c d e z"),
      (3L, "p q r s p q r t"),          // "p q r" repeats WITHIN the doc
      (4L, "u1 u2 u3 u4 u5 u6 u7 u8")   // fully novel → absent
    ).toDF("doc_id", "text")
    val r = Dedup.dupSpans(docs, "doc_id", "text", n = 3).collect()
      .map(x => (x.getLong(0), x.getInt(1)) -> ((x.getLong(2), x.getLong(3)))).toMap
    // doc 1: 3-gram starts 1..3 duplicated → one span of 3 windows / 5 tokens
    assert(r((1L, 1)) == ((3L, 5L)))
    assert(r((2L, 3)) == ((3L, 5L)))
    // doc 3: "p q r" at starts 1 and 5 → two separate 1-window spans
    assert(r((3L, 1)) == ((1L, 3L)) && r((3L, 5)) == ((1L, 3L)))
    assert(!r.keySet.exists(_._1 == 4L))
    assert(r.size == 4)
  }

  test("dupSpans equals the string-n-gram replay on the fixture corpus") {
    // Truth computed with STRING n-grams and DataFrame ops only — pins the
    // native positional-hash path (tokenizer, positions, count semantics).
    import org.apache.spark.sql.expressions.Window
    val n = 3
    val toks = filter(split(trim(col("text")), "\\s+"), t => t =!= "")
    val grams = corpus.select(col("doc_id"), posexplode(
        when(size(toks) >= n, transform(sequence(lit(1), size(toks) - (n - 1)),
          i => concat_ws(" ", slice(toks, i, lit(n)))))
          .otherwise(array().cast("array<string>"))).as(Seq("p0", "g")))
      .select(col("doc_id"), (col("p0") + 1).as("pos"), col("g"))
    val cnt = grams.groupBy("g").agg(count(lit(1)).as("c"))
    val truth = grams.join(cnt.filter(col("c") > 1), "g")
      .withColumn("grp", col("pos") -
        row_number().over(Window.partitionBy(col("doc_id")).orderBy(col("pos"))))
      .groupBy(col("doc_id"), col("grp"))
      .agg(min(col("pos")).as("span_start"), count(lit(1)).as("n_windows"))
      .select(col("doc_id"), col("span_start"), col("n_windows"))
      .collect().map(x => (x.getLong(0), x.getInt(1), x.getLong(2))).toSet
    val got = Dedup.dupSpans(corpus, "doc_id", "text", n = n).collect()
      .map(x => (x.getLong(0), x.getInt(1), x.getLong(2))).toSet
    assert(got == truth && got.nonEmpty)
  }

  test("containment: near-subset found at ~1.0 even when jaccard is tiny") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "intro words alpha beta gamma delta epsilon plus much more trailing prose here"),
      (3L, "one two three four five six seven")
    ).toDF("doc_id", "text")
    val r = Dedup.containmentPairs(docs, "doc_id", "text", n = 3, threshold = 0.9)
      .collect().map(x => (x.getLong(0), x.getLong(1)) -> x.getDouble(2)).toMap
    assert(r((1L, 2L)) == 1.0)          // doc 1 fully contained in doc 2
    assert(!r.contains((2L, 1L)))       // the container is NOT contained
    assert(!r.keySet.exists { case (a, b) => Set(a, b).contains(3L) })
    // symmetric jaccard at the same bar misses the subset relation
    val jac = Dedup.jaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.9)
      .collect()
    assert(jac.isEmpty)
  }

  test("prefix-filter containment equals brute force on seeded random corpora") {
    val rnd = new scala.util.Random(20260813L)
    val vocab = ('a' to 'p').map(_.toString)
    for (trial <- 1 to 5) {
      val docs = (1L to 20L).map { id =>
        val toks = Vector.fill(5 + rnd.nextInt(14))(vocab(rnd.nextInt(vocab.size)))
        // every 4th doc embeds the previous doc's prefix → planted containment
        val text = if (id % 4 == 0)
          (toks.take(6) ++ Vector.fill(3)(vocab(rnd.nextInt(vocab.size)))).mkString(" ")
        else toks.mkString(" ")
        (id, text)
      }
      val df = docs.toDF("doc_id", "text")
      val t = 0.3 + rnd.nextDouble() * 0.7
      val sets = Dedup.shingleSets(df, "doc_id", "text", 3)
      val ids = df.select(col("doc_id"))
      val allPairs = ids.as("a").join(ids.as("b"), col("a.doc_id") =!= col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      val brute = allPairs
        .join(sets.select(col("doc_id").as("doc_a"), col("hs").as("ha")), "doc_a")
        .join(sets.select(col("doc_id").as("doc_b"), col("hs").as("hb")), "doc_b")
        .withColumn("c", size(array_intersect(col("ha"), col("hb"))).cast("double") / size(col("ha")))
        .filter(col("c") >= t)
        .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val pf = Dedup.containmentPairs(df, "doc_id", "text", n = 3, threshold = t)
        .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pf == brute, s"trial $trial threshold $t: $pf != $brute")
    }
  }

  test("clusters over minhash pairs: exact copies and near-dups merge") {
    val pairs = Dedup.minhashLsh(corpus, "doc_id", "text",
      n = 3, k = 128, bands = 32, threshold = 0.5)
    val r = Dedup.clusters(corpus, "doc_id", pairs).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getBoolean(3)))).toMap
    assert(r(1L)._1 == 1L && r(2L)._1 == 1L && r(3L)._1 == 1L)
    assert(r(1L)._2 && !r(2L)._2 && !r(3L)._2)
    assert(r(4L)._1 == 4L && r(5L)._1 == 4L) // the 1-word-edit pair
    assert(r(6L) == ((6L, true)))            // unrelated doc stays its own keeper
  }

  test("corpusDiff: added/removed/changed by normalized fingerprint") {
    import spark.implicits._
    val v1 = Seq((1L, "gone"), (2L, "same"), (3L, "before"),
                 (5L, "a b")).toDF("doc_id", "text")
    val v2 = Seq((2L, "same"), (3L, "after"), (4L, "brand new"),
                 (5L, "a    b")).toDF("doc_id", "text")
    val r = Dedup.corpusDiff(v1, v2, "doc_id", "text").collect()
      .map(x => x.getLong(0) -> x.getString(1)).toMap
    assert(r == Map(1L -> "removed", 3L -> "changed", 4L -> "added"))
    // doc 2 identical, doc 5 whitespace-only edit: both normalize away
  }

  test("scrubDupSpans removes exactly the covered tokens, reports all docs") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e f g h x1 y1"), // shares the 8-gram prefix with doc 2
      (2L, "a b c d e f g h x2 y2"),
      (3L, "a b c d e f g h"),       // fully covered -> empty scrub
      (4L, "short doc"),             // no 8-grams -> untouched
      (5L, "   ")                    // no tokens at all
    ).toDF("doc_id", "text")
    val r = Dedup.scrubDupSpans(docs, "doc_id", "text", n = 8).collect()
      .map(x => x.getLong(0) -> ((x.getString(1), x.getLong(2), x.getLong(3)))).toMap
    assert(r(1L) == (("x1 y1", 2L, 8L)))
    assert(r(2L) == (("x2 y2", 2L, 8L)))
    assert(r(3L) == (("", 0L, 8L)))
    assert(r(4L) == (("short doc", 2L, 0L)))
    assert(r(5L) == (("", 0L, 0L)))
  }

  test("scrubContaminated removes exactly the leaked spans, keeps the document") {
    import spark.implicits._
    val train = Seq(
      (1L, "intro words q1 q2 q3 q4 q5 q6 q7 q8 outro words"), // leaked 8-gram inside
      (2L, "totally clean document with no benchmark overlap at all here"),
      (3L, "q1 q2 q3 q4 q5 q6 q7 q8"), // fully leaked -> empty scrub
      (4L, "tiny doc")                 // no 8-grams -> untouched
    ).toDF("doc_id", "text")
    val bench = Seq((100L, "q1 q2 q3 q4 q5 q6 q7 q8")).toDF("doc_id", "text")
    val r = Dedup.scrubContaminated(train, bench, "doc_id", "text", n = 8).collect()
      .map(x => x.getLong(0) -> ((x.getString(1), x.getLong(2), x.getLong(3)))).toMap
    assert(r(1L) == (("intro words outro words", 4L, 8L)))
    assert(r(2L)._3 == 0L) // untouched
    assert(r(3L) == (("", 0L, 8L)))
    assert(r(4L) == (("tiny doc", 2L, 0L)))
    assert(r.size == 4) // bench docs are not in the output
  }

  test("capped lsh: identical below the cap; viral family routed to the report") {
    import spark.implicits._
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text")
    // no planted family, cap far above any natural bucket: pairs must be
    // IDENTICAL to the uncapped operator, and the report must be empty
    val (pairsSame, famEmpty) = Dedup.minhashLshCapped(
      corpus, "doc_id", "text", maxBucket = 64)
    val uncapped = Dedup.minhashLsh(corpus, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairsSame.collect().map(r => (r.getLong(0), r.getLong(1))).toSet == uncapped)
    assert(famEmpty.isEmpty)
    // a 20-copy identical family with cap 8: zero pairs from the family,
    // every member reported with all 32 bands capped, family size 20
    val boiler = "one two three four five six seven eight nine ten eleven twelve"
    val planted = (1 to 20).map(i => (-i.toLong, boiler)).toDF("doc_id", "text")
    val (pairs2, fam2) = Dedup.minhashLshCapped(
      corpus.unionByName(planted), "doc_id", "text", maxBucket = 8)
    assert(pairs2.filter($"doc_a" < 0 || $"doc_b" < 0).isEmpty)
    val fams = fam2.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(fams.length == 20)
    assert(fams.forall { case (id, nb, sz, rep) =>
      id < 0 && nb == 32L && sz == 20L && rep == -20L })
  }

  test("capped composed pipelines: identical to uncapped below the cap") {
    import spark.implicits._
    val dd = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text")
    val train = dd.filter($"doc_id" % 10 =!= 0)
    val bench = dd.filter($"doc_id" % 10 === 0)
    // contamination: pair output identical, report empty
    val uncN = Dedup.contaminatedNear(train, bench, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val (capN, repN) = Dedup.contaminatedNearCapped(train, bench, "doc_id", "text")
    assert(capN.collect().map(r => (r.getLong(0), r.getLong(1))).toSet == uncN)
    assert(repN.isEmpty)
    // edit-distance: identical
    val uncE = Dedup.editDistancePairs(dd, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    val (capE, famE) = Dedup.editDistancePairsCapped(dd, "doc_id", "text")
    assert(capE.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet == uncE)
    assert(famE.isEmpty)
    // hubs: identical
    val uncH = Dedup.dupHubs(dd, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val (capH, famH) = Dedup.dupHubsCapped(dd, "doc_id", "text")
    assert(capH.collect().map(r => (r.getLong(0), r.getLong(1))).toSet == uncH)
    assert(famH.isEmpty)
  }

  test("dupHubsCapped: family report carries the residual sub-cap degree") {
    import spark.implicits._
    val boiler = "accept all cookies to continue reading this syndicated article"
    val other = "completely unrelated short pair text about gardening tools today"
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text")
      .unionByName((1 to 20).map(i => (-i.toLong, boiler)).toDF("doc_id", "text"))
      .unionByName(Seq((-101L, other), (-102L, other)).toDF("doc_id", "text"))
    val (hubs, fams) = Dedup.dupHubsCapped(corpus, "doc_id", "text",
      minDegree = 1, maxBucket = 8)
    // the identical-content family: every band bucket IS the whole
    // 20-doc family (> cap), so members have no sub-cap verified
    // partners — the residual column exists and is null for all 20
    val famRows = fams.filter($"doc_id" < 0).collect()
    assert(famRows.length == 20)
    assert(famRows.forall(_.isNullAt(famRows.head.fieldIndex("sub_cap_degree"))))
    // the planted sub-cap pair is NOT a family: each end is a degree-1
    // hub through the verified-pair frame
    val pairHubs = hubs.filter($"doc_id".isin(-101L, -102L)).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairHubs == Set((-101L, 1L), (-102L, 1L)))
    assert(fams.filter($"doc_id".isin(-101L, -102L)).isEmpty)
  }

  test("capped cross-side family: zero family pairs, train members flagged") {
    import spark.implicits._
    val dd = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text")
    val boiler = "accept all cookies to continue reading this syndicated article"
    val train = dd.filter($"doc_id" % 10 =!= 0)
      .unionByName((1 to 12).map(i => (-i.toLong, boiler)).toDF("doc_id", "text"))
    val bench = dd.filter($"doc_id" % 10 === 0)
      .unionByName(Seq((-501L, boiler), (-502L, boiler)).toDF("doc_id", "text"))
    val (pairs, report) = Dedup.contaminatedNearCapped(
      train, bench, "doc_id", "text", maxBucket = 8)
    // the 14-member family exceeds the cap in every band: no pair row
    // may touch a planted doc, and every planted TRAIN doc is flagged
    // against the smallest bench family member
    assert(pairs.filter($"doc_id" < 0 || $"matched_bench_id" < 0).isEmpty)
    val flagged = report.filter($"side" === "t").collect()
      .map(r => (r.getLong(0), r.getLong(5))).toSet
    assert(flagged == (1 to 12).map(i => (-i.toLong, -502L)).toSet)
    // bench-side members are reported too, with the family rep
    val benchRows = report.filter($"side" === "b").collect()
      .map(r => (r.getLong(0), r.getLong(4))).toSet
    assert(benchRows == Set((-501L, -502L), (-502L, -502L)))
  }

  test("capped simhash: identical below the cap; viral family routed to the report") {
    import spark.implicits._
    val dd = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text")
    // no planted family, cap above any natural chunk bucket: pairs
    // identical to the uncapped operator, report empty
    val unc = Dedup.simhashPairs(dd, "doc_id", "text", n = 3, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val (cap, famEmpty) = Dedup.simhashPairsCapped(dd, "doc_id", "text",
      n = 3, maxHamming = 3, maxBucket = 64)
    assert(cap.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet == unc)
    assert(famEmpty.isEmpty)
    // a 20-copy identical family with cap 8: zero family pairs, every
    // member reported capped in all 4 chunks with family_rep = the min
    val boiler = "one two three four five six seven eight nine ten eleven twelve"
    val planted = (1 to 20).map(i => (-i.toLong, boiler)).toDF("doc_id", "text")
    val (pairs2, fam2) = Dedup.simhashPairsCapped(
      dd.unionByName(planted), "doc_id", "text", n = 3, maxHamming = 3, maxBucket = 8)
    assert(pairs2.filter($"doc_a" < 0 || $"doc_b" < 0).isEmpty)
    val fams = fam2.filter($"doc_id" < 0).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(fams.length == 20)
    assert(fams.forall { case (id, nc, sz, rep) =>
      id < 0 && nc == 4L && sz >= 20L && rep == -20L })
  }

  test("capped prefix-filter join: identical below cap; coverage contract under a family") {
    import spark.implicits._
    val dd = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text")
    // no planted family: pairs identical to the uncapped exact join
    val unc = Dedup.jaccardPairs(dd, "doc_id", "text", n = 3, threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val (cap, famEmpty) = Dedup.jaccardPairsCapped(dd, "doc_id", "text",
      n = 3, threshold = 0.8, maxBucket = 64)
    assert(cap.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet == unc)
    assert(famEmpty.isEmpty)
    // planted 12-copy family, cap 8: no family pairs; coverage contract —
    // every uncapped-found pair is either still emitted or BOTH of its
    // endpoints appear in the family report
    val boiler = "crimson foxes wander narrow bridges under silver morning fog today"
    val planted = (1 to 12).map(i => (-i.toLong, boiler)).toDF("doc_id", "text")
    val corpus = dd.unionByName(planted)
    val truth = Dedup.jaccardPairs(corpus, "doc_id", "text", n = 3, threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val (pairs2, fam2) = Dedup.jaccardPairsCapped(corpus, "doc_id", "text",
      n = 3, threshold = 0.8, maxBucket = 8)
    val emitted = pairs2.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val reported = fam2.collect().map(_.getLong(0)).toSet
    assert(emitted.subsetOf(truth))
    for ((a, b) <- truth -- emitted)
      assert(reported.contains(a) && reported.contains(b),
        s"pair ($a,$b) dropped by the cap but not family-accounted at both ends")
    assert((1 to 12).forall(i => reported.contains(-i.toLong)))
    assert(pairs2.filter($"doc_a" < 0 || $"doc_b" < 0).isEmpty)
  }

  test("capped containment join: identical below cap; one-ended coverage under a family") {
    import spark.implicits._
    val dd = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text")
    val unc = Dedup.containmentPairs(dd, "doc_id", "text", n = 3, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val (cap, famEmpty) = Dedup.containmentPairsCapped(dd, "doc_id", "text",
      n = 3, threshold = 0.9, maxBucket = 64)
    assert(cap.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet == unc)
    assert(famEmpty.isEmpty)
    // planted 12-copy family, cap 8: no family pairs; one-ended contract —
    // any uncapped-found pair now missing has its CONTAINED side reported
    val boiler = "granite owls perch along mossy aqueducts beneath pale autumn stars tonight"
    val planted = (1 to 12).map(i => (-i.toLong, boiler)).toDF("doc_id", "text")
    val corpus = dd.unionByName(planted)
    val truth = Dedup.containmentPairs(corpus, "doc_id", "text", n = 3, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val (pairs2, fam2) = Dedup.containmentPairsCapped(corpus, "doc_id", "text",
      n = 3, threshold = 0.9, maxBucket = 8)
    val emitted = pairs2.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val reported = fam2.collect().map(_.getLong(0)).toSet
    assert(emitted.subsetOf(truth))
    for ((a, _) <- truth -- emitted)
      assert(reported.contains(a),
        s"contained-side $a dropped by the cap but not family-accounted")
    assert((1 to 12).forall(i => reported.contains(-i.toLong)))
    assert(pairs2.filter($"doc_a" < 0 || $"doc_b" < 0).isEmpty)
  }

  test("cappedEdges clusters an identical-content family exactly like uncapped") {
    import spark.implicits._
    val dd = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text")
    val boiler = "subscribe now for unlimited access to premium local news today"
    val corpus = dd.unionByName(
      (1 to 20).map(i => (-i.toLong, boiler)).toDF("doc_id", "text"))
    val truth = Dedup.clusters(corpus, "doc_id",
        Dedup.minhashLsh(corpus, "doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).toSet
    val (pairs, families) = Dedup.minhashLshCapped(corpus, "doc_id", "text",
      maxBucket = 8)
    val viaStars = Dedup.clusters(corpus, "doc_id",
        Dedup.cappedEdges(pairs, families))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).toSet
    // identical-content families share every band, so family_rep is the
    // family minimum and the star edges rebuild the exact components —
    // cluster_id, cluster_size, AND keeper election all match
    assert(viaStars == truth)
    assert(families.count() == 20)
  }

  test("stripBoilerplate: every input doc reports, including blank-only ones") {
    import spark.implicits._
    // doc 1+2+3 share a boilerplate line (3/4 docs > 500 permille),
    // doc 4 is all-blank lines, doc 5 has an empty line array
    val df = Seq(
      (1L, "s", Seq("banner", "alpha")),
      (2L, "s", Seq("banner", "beta")),
      (3L, "s", Seq("banner")),
      (4L, "s", Seq("", "  ")),
      (5L, "s", Seq.empty[String])
    ).toDF("doc_id", "source", "lines")
    val r = Dedup.stripBoilerplate(df, "doc_id", "source", col("lines"),
        maxDocPermille = 500, joinWith = " ")
      .collect().map(x => x.getLong(0) ->
        ((x.getLong(2), x.getLong(3), x.getString(4)))).toMap
    assert(r(1L) == ((1L, 1L, "alpha")))
    assert(r(2L) == ((1L, 1L, "beta")))
    assert(r(3L) == ((0L, 1L, ""))) // all-boilerplate: reports with empty text
    assert(r(4L) == ((0L, 0L, ""))) // blank-only: still reports
    assert(r(5L) == ((0L, 0L, ""))) // empty segmentation: still reports
    assert(r.size == 5)
  }

  test("bloom decontamination equals the plain join; no false negatives at tight fpp") {
    import spark.implicits._
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text")
    val bench = corpus.filter($"doc_id" % 7 === 0)
    val plain = corpus.as("c").join(bench.as("b"), $"c.text" === $"b.text")
      .select($"c.doc_id", $"b.doc_id".as("bench_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // even at a loose fpp the exact verify join removes every false
    // positive, and bloom's no-false-negative guarantee keeps every
    // true match: output == plain join at ANY fpp
    for (fpp <- Seq(0.5, 0.01)) {
      val viaBloom = Dedup.contaminatedBloom(corpus, bench, "doc_id", "text", fpp)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(viaBloom == plain && viaBloom.nonEmpty, s"fpp=$fpp")
    }
  }

  test("corpusDiff identity: a corpus diffed against itself is empty") {
    import spark.implicits._
    val v = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text")
    assert(Dedup.corpusDiff(v, v, "doc_id", "text").isEmpty)
  }

  test("corpusOverlap: exact when k covers the union; correct invariants when it doesn't") {
    import spark.implicits._
    val a = (1 to 100).map(i => s"doc $i").toDF("t")
    val b = (51 to 150).map(i => s"doc $i").toDF("t")
    // k >= |union| = 150 -> the sketch IS the set: estimate exact
    val wide = Dedup.corpusOverlap(a, $"t", b, $"t", k = 256).collect().head
    assert(wide.getAs[Long]("n_a") == 100L && wide.getAs[Long]("n_b") == 100L)
    assert(wide.getAs[Long]("exact_inter") == 50L)
    assert(wide.getAs[Long]("exact_union") == 150L)
    assert(wide.getAs[Long]("est_jaccard_milli") ==
      wide.getAs[Long]("exact_jaccard_milli"))
    assert(wide.getAs[Long]("exact_jaccard_milli") == 1000L * 50 / 150)
    // k = 32 < union: sketch invariants hold, estimate in [0, 1000]
    val nar = Dedup.corpusOverlap(a, $"t", b, $"t", k = 32).collect().head
    assert(nar.getAs[Long]("n_shared") <= 32L)
    val est = nar.getAs[Long]("est_jaccard_milli")
    assert(est >= 0L && est <= 1000L)
    assert(nar.getAs[Long]("exact_inter") == 50L) // certification unchanged
  }

  test("corpusOverlap: identical corpora read 1000 milli, disjoint read 0") {
    import spark.implicits._
    val a = (1 to 80).map(i => s"x $i").toDF("t")
    val same = Dedup.corpusOverlap(a, $"t", a, $"t", k = 16).collect().head
    assert(same.getAs[Long]("est_jaccard_milli") == 1000L)
    assert(same.getAs[Long]("exact_jaccard_milli") == 1000L)
    val b = (1 to 80).map(i => s"y $i").toDF("t")
    val disj = Dedup.corpusOverlap(a, $"t", b, $"t", k = 16).collect().head
    assert(disj.getAs[Long]("n_shared") == 0L)
    assert(disj.getAs[Long]("exact_inter") == 0L)
    assert(disj.getAs[Long]("est_jaccard_milli") == 0L)
  }

  test("sortedNeighborhood: adjacent-prefix near-dups found, threshold filters") {
    import spark.implicits._
    // docs 1/2: 8 shared of 9 union → 888 milli ≥ 800 (kept, suffix
    // perturbation with a shared prefix); doc 3 shares the 'alpha'
    // prefix region but only 1/9 tokens (dropped by the verify, not by
    // blocking); docs 10/11 are byte-identical (1000); 99 is disjoint.
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta kappa"),
      (3L, "alpha omega psi chi phi upsilon tau"),
      (10L, "mmm nnn ooo ppp"),
      (11L, "mmm nnn ooo ppp"),
      (99L, "qqq rrr sss")).toDF("doc_id", "text")
    val got = Dedup.sortedNeighborhood(df, "doc_id", "text",
        window = 8, thresholdMilli = 800)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got.keySet == Set((1L, 2L), (10L, 11L)))
    assert(got((1L, 2L)) == 1000L * 8 / 10) // |∩|=8, |∪|=10 → 800
    assert(got((10L, 11L)) == 1000L)
  }

  test("clusters: a 300-link chain converges exactly (pointer jumping)") {
    import spark.implicits._
    // chain 0-1-2-...-300: diameter 300 >> the old 50-round budget —
    // neighbor-min alone silently returned partial labels here (the
    // round-9 ext113 sf0.1 regression); pointer jumping must reach the
    // fixpoint and label every node with the component min, 0.
    val pairs = (0L until 300L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val docs = (0L to 300L).toDF("doc_id")
    val got = Dedup.clusters(docs, "doc_id", pairs).collect()
    assert(got.length == 301)
    assert(got.forall(_.getAs[Long]("cluster_id") == 0L))
    assert(got.forall(_.getAs[Long]("cluster_size") == 301L))
    assert(got.count(_.getAs[Boolean]("is_keeper")) == 1)
  }

  test("clusters: scattered-id chain converges exactly (star contraction)") {
    import spark.implicits._
    // chain whose ids are a deterministic permutation — the component min
    // sits mid-chain and ids are non-monotone along it, the shape where
    // label waves crossed one edge per hop (the r14 8-hop schedule needed
    // rounds ∝ diameter/8 on ext113's SNM graph). Star contraction must
    // still label every node with the global min and count all of them.
    val n = 257
    val perm = (0 until n).map(i => ((i.toLong * 97L + 31L) % 1000003L))
    val pairs = (0 until n - 1).map(i => (perm(i), perm(i + 1)))
      .toDF("doc_a", "doc_b")
    val docs = perm.toDF("doc_id")
    val expectedMin = perm.min
    val got = Dedup.clusters(docs, "doc_id", pairs).collect()
    assert(got.length == n)
    assert(got.forall(_.getAs[Long]("cluster_id") == expectedMin))
    assert(got.forall(_.getAs[Long]("cluster_size") == n.toLong))
    assert(got.count(_.getAs[Boolean]("is_keeper")) == 1)
  }

  test("clusters: duplicate and reversed pairs don't distort sizes") {
    import spark.implicits._
    // the same undirected edge arriving multiple times and in both
    // orientations (multipass SNM does this) must not double-count
    // members — the contraction round dedups edges, and labels cover
    // each node exactly once
    val pairs = Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L), (3L, 2L))
      .toDF("doc_a", "doc_b")
    val docs = Seq(1L, 2L, 3L, 9L).toDF("doc_id")
    val r = Dedup.clusters(docs, "doc_id", pairs).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        ((x.getAs[Long]("cluster_id"), x.getAs[Long]("cluster_size"),
          x.getAs[Boolean]("is_keeper")))).toMap
    assert(r(1L) == ((1L, 3L, true)))
    assert(r(2L) == ((1L, 3L, false)))
    assert(r(3L) == ((1L, 3L, false)))
    assert(r(9L) == ((9L, 1L, true)))
  }

  test("sortedNeighborhoodMultiPass: suffix pass restores prefix-divergent pairs") {
    import spark.implicits._
    // docs 100 and 200 share their whole tail but diverge at the first
    // character — under the prefix sort they are separated by 10 filler
    // docs, beyond window 8, so single-pass SNM can NEVER pair them;
    // under the suffix (reversed) sort they are adjacent. Jaccard is
    // exactly 8/10 = the 800-milli threshold (boundary inclusion).
    val tail = "shared tail tokens one two three four five"
    val fillers = ('b' to 'k').zipWithIndex.map { case (c, i) =>
      (300L + i, s"${c}unique${i} totally distinct filler payload number ${i} nothing in common ${c}${i}")
    }
    val docsDf = (Seq((100L, s"aardvark $tail"), (200L, s"zebra $tail")) ++ fillers)
      .toDF("doc_id", "text")
    val single = Dedup.sortedNeighborhood(docsDf, "doc_id", "text",
      window = 8, thresholdMilli = 800)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(!single.contains((100L, 200L)) && !single.contains((200L, 100L)))
    val multi = Dedup.sortedNeighborhoodMultiPass(docsDf, "doc_id", "text",
      window = 8, thresholdMilli = 800)
    val rows = multi.collect()
    val pair = rows.filter(r => r.getAs[Long]("doc_a") == 100L && r.getAs[Long]("doc_b") == 200L)
    assert(pair.length == 1, s"expected (100,200) found once, got ${rows.mkString(";")}")
    assert(pair.head.getAs[Long]("jaccard_milli") == 800L)
    // canonical order + no duplicate pairs across passes
    assert(rows.forall(r => r.getAs[Long]("doc_a") < r.getAs[Long]("doc_b")))
    assert(rows.map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).distinct.length == rows.length)
  }

  test("clustersIncremental == full recompute (star edges encode old components)") {
    import spark.implicits._
    // old world: {1,2,3} one chain component, {4} singleton.
    // arrivals: 5 bridges to 3 (merging into the old component) and
    // {6,7} form a brand-new component.
    val docsDf = (1L to 7L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val oldPairs = Seq((1L, 2L), (2L, 3L)).toDF("doc_a", "doc_b")
    val newPairs = Seq((3L, 5L), (6L, 7L)).toDF("doc_a", "doc_b")
    val oldDocs = docsDf.filter(col("doc_id") <= 4)
    val oldLabels = Dedup.clusters(oldDocs, "doc_id", oldPairs)
    val inc = Dedup.clustersIncremental(docsDf, "doc_id", oldLabels, newPairs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).toSet
    val full = Dedup.clusters(docsDf, "doc_id", oldPairs.unionByName(newPairs))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).toSet
    assert(inc == full)
    // the merged component kept the global min id as its label
    assert(inc.exists { case (doc, cl, sz, _) => doc == 5L && cl == 1L && sz == 4L })
  }

  test("familyTemplates: consensus tokens only, singletons excluded, dups-within-doc don't double-count") {
    import spark.implicits._
    val docsDf = Seq(
      (1L, "legal header alpha alpha unique1"),   // repeated token in ONE doc
      (2L, "legal header beta unique2"),
      (3L, "legal header gamma"),
      (4L, "lone doc text")
    ).toDF("doc_id", "text")
    val clusterized = Seq(
      (1L, 1L, 3L, true), (2L, 1L, 3L, false), (3L, 1L, 3L, false),
      (4L, 4L, 1L, true)
    ).toDF("doc_id", "cluster_id", "cluster_size", "is_keeper")
    val got = Dedup.familyTemplates(docsDf, "doc_id", "text", clusterized)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    // 'alpha' appears twice in doc 1 but in no other member — the
    // per-doc distinct stops it from faking a 3-member consensus
    assert(got == Set((1L, "legal", 3L), (1L, "header", 3L)))
  }

  test("SNM forms: whitespace-only docs never pair (empty-set Jaccard is undefined)") {
    import spark.implicits._
    // two all-whitespace docs tokenize to the EMPTY set and sort adjacent
    // under the empty key in every pass; the bare 1000·i >= t·u filter
    // passed vacuously at i = u = 0 before the u > 0 guard, emitting a
    // NULL-jaccard "duplicate" of two unrelated docs (review finding)
    val docsDf = Seq((1L, "   "), (2L, "\t \t"), (3L, "real content words"))
      .toDF("doc_id", "text")
    assert(Dedup.sortedNeighborhood(docsDf, "doc_id", "text",
      window = 8, thresholdMilli = 800).isEmpty)
    assert(Dedup.sortedNeighborhoodMultiPass(docsDf, "doc_id", "text",
      window = 8, thresholdMilli = 800).isEmpty)
  }

  test("sortedNeighborhood: window 1 only pairs immediate sort neighbors") {
    import spark.implicits._
    // three identical docs: with window 1 only consecutive rn pairs emit
    val df = Seq((1L, "a b c"), (2L, "a b c"), (3L, "a b c"))
      .toDF("doc_id", "text")
    val got = Dedup.sortedNeighborhood(df, "doc_id", "text",
        window = 1, thresholdMilli = 800)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L), (2L, 3L)))
  }

  test("dedup hierarchy: tighter thresholds refine looser families") {
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    def famAt(t: Double) = Dedup.clusters(docs, "doc_id",
        Dedup.minhashLsh(docs, "doc_id", "text", n = 3, k = 128, bands = 32, threshold = t))
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("cluster_id"))
    val f80 = famAt(0.8).withColumnRenamed("cluster_id", "f80")
    val f90 = famAt(0.9).withColumnRenamed("cluster_id", "f90")
    // refinement: every 0.9-family maps into exactly ONE 0.8-family
    val violations = f90.join(f80, "doc_id")
      .groupBy("f90")
      .agg(org.apache.spark.sql.functions.countDistinct("f80").as("n"))
      .filter(org.apache.spark.sql.functions.col("n") > 1)
      .count()
    assert(violations == 0L)
  }
}
