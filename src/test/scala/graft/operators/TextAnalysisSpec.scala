package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Unit oracle for the text-analysis Column kernels. */
class TextAnalysisSpec extends SparkSpec {

  private def one(text: String): org.apache.spark.sql.DataFrame = {
    val s = spark
    import s.implicits._
    Seq((1L, text)).toDF("doc_id", "text")
  }

  test("langId picks the marker-majority language; und when no markers") {
    val cases = Seq(
      "the cat and the dog is in that house" -> "en",
      "el perro de la casa y en los campos del sur" -> "es",
      "xyzzy plugh qwerty" -> "und",
      "" -> "und")
    cases.foreach { case (txt, want) =>
      val got = one(txt).select(TextAnalysis.langId(col("text"))).head().getString(0)
      assert(got == want, s"'$txt' -> $got, want $want")
    }
  }

  test("tie between languages resolves to lexicographically first") {
    // 'la de' scores 2 for both es and fr -> fr loses to es? No: es < fr,
    // and both match exactly the same two tokens -> es wins.
    val got = one("la de").select(TextAnalysis.langId(col("text"))).head().getString(0)
    assert(got == "es")
  }

  test("withLangId agrees with langId on the documents corpus") {
    val docs = graft.queries.Q.t(spark, sf, "documents")
    val a = docs.select(col("doc_id"), TextAnalysis.langId(col("text")).as("p"))
      .orderBy("doc_id").collect().map(_.getString(1))
    val b = TextAnalysis.withLangId(docs, "text", "p")
      .select("doc_id", "p").orderBy("doc_id").collect().map(_.getString(1))
    assert(a.toSeq == b.toSeq)
  }

  test("temperatureSample: smallest domain keeps EVERYTHING, larger " +
    "domains down-sample at sqrt(min/tok), re-salt re-samples") {
    val s = spark
    import s.implicits._
    // domain a: 4 one-word docs (4 tokens, the min); domain b: 4 docs
    // x 4 words (16 tokens) -> rate_b = sqrt(4/16) = 0.5 exactly
    val docs = ((1L to 4L).map(i => (i, "a", "w")) ++
      (5L to 8L).map(i => (i, "b", "w w w w")))
      .toDF("doc_id", "source", "text")
    val got = TextAnalysis.temperatureSample(docs)
      .select("doc_id", "source", "accept_rate", "kept")
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getDouble(2), r.getInt(3)))
    // every min-domain doc kept (rate 1.0 -> threshold 2^32 > any draw)
    assert(got.filter(_._2 == "a").forall(t => t._3 == 1.0 && t._4 == 1))
    assert(got.filter(_._2 == "b").forall(_._3 == 0.5))
    // determinism + re-salt independence
    val k1 = TextAnalysis.temperatureSample(docs).filter(col("kept") === 1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val k2 = TextAnalysis.temperatureSample(docs).filter(col("kept") === 1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val k3 = TextAnalysis.temperatureSample(docs, salt = "other")
      .filter(col("kept") === 1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(k1 == k2)
    assert((1L to 4L).toSet.subsetOf(k1))
    assert((1L to 4L).toSet.subsetOf(k3)) // min domain survives any salt
  }

  test("epochUpsample: largest domain gets exactly 1 copy, integer " +
    "parity multiplies, cap binds, fractional epoch md5-gated") {
    val s = spark
    import s.implicits._
    // a: 16 tokens (max); b: 8 tokens -> exactly 2 epochs, rem 0;
    // c: 3 tokens -> parity 16/3 = 5.33 capped at 4, rem 0 (cap binds);
    // d: 5 tokens -> full 3, rem 1 -> frac 1/5 extra copy per doc
    val docs = (
      (1L to 4L).map(i => (i, "a", "w w w w")) ++
      (5L to 8L).map(i => (i, "b", "w w")) ++
      Seq((9L, "c", "w w w")) ++
      Seq((10L, "d", "w w w w w"))).toDF("doc_id", "source", "text")
    val got = TextAnalysis.epochUpsample(docs)
      .groupBy("source")
      .agg(countDistinct(col("doc_id")).as("n"),
        count(lit(1)).as("copies"),
        max(col("epoch_idx")).as("maxe"),
        first(col("full_epochs")).as("fe"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got("a") == ((4L, 4L, 1L, 1L)))  // max domain: 1 epoch
    assert(got("b") == ((4L, 8L, 2L, 2L)))  // exact 2x parity
    assert(got("c") == ((1L, 4L, 4L, 4L)))  // cap binds at 4, no frac
    // d: full 3 copies always; the 4th is a 1/5-probability md5 draw
    val (dn, dcopies, dmax, dfe) = got("d")
    assert(dn == 1L && dfe == 3L)
    assert(dcopies == 3L || dcopies == 4L)
    assert(dmax == dcopies)
    // determinism: same result twice
    val c2 = TextAnalysis.epochUpsample(docs).count()
    assert(c2 == got.values.map(_._2).sum)
  }

  test("zero-token domains pass through: rate 1.0 / 1 epoch, never " +
    "silently dropped") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "a", "w w"), (2L, "a", "w"),
      // all-NULL text: tok_d aggregates to NULL (split("") counts 1,
      // so empty STRINGS are not the zero case — NULL text is)
      (3L, "z", null.asInstanceOf[String]),
      (4L, "z", null.asInstanceOf[String]))
      .toDF("doc_id", "source", "text")
    val samp = TextAnalysis.temperatureSample(docs)
      .select("doc_id", "accept_rate", "kept").collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getInt(2))).toMap
    assert(samp(3L) == ((1.0, 1)) && samp(4L) == ((1.0, 1)))
    assert(samp(1L)._1 == 1.0) // min over POSITIVE domains only
    val up = TextAnalysis.epochUpsample(docs)
      .groupBy("doc_id").agg(count(lit(1)).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(up(3L) == 1L && up(4L) == 1L) // 1 epoch, not maxEpochs
    assert(up.keySet == Set(1L, 2L, 3L, 4L))
  }

  test("epochUpsample seeded properties: copies per doc in " +
    "{full, full+1}, partition-invariant, cap respected") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    val docs = (1L to 80L).map { i =>
      val dom = s"d${rnd.nextInt(5)}"
      val words = Seq.fill(1 + rnd.nextInt(9))("w").mkString(" ")
      (i, dom, words)
    }.toDF("doc_id", "source", "text")
    val up = TextAnalysis.epochUpsample(docs)
    val perDoc = up.groupBy("doc_id")
      .agg(count(lit(1)).as("c"), first(col("full_epochs")).as("fe"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(perDoc.forall { case (c, fe) => c == fe || c == fe + 1 })
    assert(perDoc.forall { case (c, _) => c >= 1 && c <= 5 })
    // repartition invariance (verdicts are md5-of-id, not layout)
    val a = up.groupBy("source").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val b = TextAnalysis.epochUpsample(docs.repartition(13))
      .groupBy("source").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a == b)
  }

  test("token counts, punct ratio, fingerprint basics") {
    val df = one("Hello,  world! This is   a test.")
    val r = df.select(
      TextAnalysis.tokenCount(col("text")),
      TextAnalysis.punctRatio(col("text")),
      TextAnalysis.fingerprint(col("text")),
      TextAnalysis.fingerprint(lit("hello,  world! this is a test.  "))).head()
    assert(r.getInt(0) == 6)
    assert(math.abs(r.getDouble(1) - 3.0 / 32.0) < 1e-9) // , ! . of 32 chars
    assert(r.getString(2) == r.getString(3)) // normalization-invariant
  }

  test("vocabCoverage: corpus threshold, per-doc rare counts") {
    val s = spark
    import s.implicits._
    // corpus counts: aa=3 (in vocab at minCount=3), bb=2, cc=1 (rare)
    val docs = Seq(
      (1L, "aa aa bb"),
      (2L, "aa bb cc"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.vocabCoverage(docs, minCount = 3)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq(
      (1L, 3L, 2L, 1L, 0.3333),  // bb below threshold
      (2L, 3L, 3L, 2L, 0.6667))) // bb + cc below threshold
  }

  test("lineDedup strikes frequent lines, drops all-boilerplate docs") {
    val s = spark
    import s.implicits._
    // "Footer" in 3 docs (>= 2 -> boilerplate, case-insensitive);
    // content lines unique; doc 3 is footer-only and must vanish
    val docs = Seq(
      (1L, "alpha\nFooter"),
      (2L, "beta\nfooter"),
      (3L, "FOOTER")).toDF("doc_id", "text")
    val got = TextAnalysis.lineDedup(docs, minDocFreq = 2)
      .orderBy("doc_id")
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(got == Seq((1L, "alpha", 1L, 1L), (2L, "beta", 1L, 1L)))
  }

  test("lineDedup preserves original line order in rebuilt text") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "z last\ncommon\na first"),
      (2L, "common")).toDF("doc_id", "text")
    val got = TextAnalysis.lineDedup(docs, minDocFreq = 2)
      .filter(col("doc_id") === 1).select("text_clean").head().getString(0)
    assert(got == "z last\na first")
  }

  test("packSequences: fills respect budget, oversize doc isolated") {
    val s = spark
    import s.implicits._
    // one shard (shards=1): docs in id order, budget 10 tokens
    val docs = Seq(
      (0L, "a b c d"),          // 4 -> bin 0 (fill 4)
      (1L, "e f g h i"),        // 5 -> bin 0 (fill 9)
      (2L, "j k"),              // 2 -> overflow -> bin 1 (fill 2)
      (3L, (1 to 12).map(i => s"w$i").mkString(" ")), // 12 > budget
      (4L, "x")).toDF("doc_id", "text")
    val got = TextAnalysis.packSequences(docs, budget = 10, shards = 1)
      .orderBy("doc_id")
      .as[(Long, Int, Long, Long)].collect().toSeq
    assert(got == Seq(
      (0L, 0, 0L, 4L), (1L, 0, 0L, 5L), (2L, 0, 1L, 2L),
      (3L, 0, 2L, 12L),  // oversize opens its own bin
      (4L, 0, 3L, 1L)))  // and closes it for the next doc
    // invariant: every bin except single-oversize fits the budget
    val fills = got.groupBy(r => (r._2, r._3)).values
      .map(rs => (rs.map(_._4).sum, rs.size))
    assert(fills.forall { case (tot, n) => tot <= 10 || n == 1 })
  }

  test("packSequences is deterministic across shard counts") {
    val s = spark
    import s.implicits._
    val docs = (0L until 200L).map(i =>
      (i, (0 to (i % 17).toInt).map(j => s"t$j").mkString(" ")))
      .toDF("doc_id", "text")
    val a = TextAnalysis.packSequences(docs, budget = 40, shards = 8)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val b = TextAnalysis.packSequences(docs, budget = 40, shards = 8)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(a == b)
    // per-(shard,bin) fill invariant holds at every shard count
    Seq(1, 3, 8).foreach { sh =>
      val rows = TextAnalysis.packSequences(docs, budget = 40, shards = sh)
        .groupBy(col("shard"), col("bin_id"))
        .agg(sum(col("n_tokens")).as("fill"), count(lit(1)).as("n"))
        .collect()
      assert(rows.forall(r =>
        r.getAs[Long]("fill") <= 40 || r.getAs[Long]("n") == 1L))
    }
  }

  test("redactPii counts before scrubbing; classes don't eat each other") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "mail a@b.com and a@b.org call 206-555-0123 ssn 123-45-6789"),
      (2L, "ip 10.0.0.1 clean otherwise")).toDF("doc_id", "text")
    val got = TextAnalysis.redactPii(docs).orderBy("doc_id").collect()
    val r1 = got(0)
    assert(r1.getAs[Long]("n_email") == 2 && r1.getAs[Long]("n_phone") == 1
      && r1.getAs[Long]("n_ssn") == 1 && r1.getAs[Long]("n_ip") == 0)
    assert(r1.getAs[String]("text") ==
      "mail <EMAIL> and <EMAIL> call <PHONE> ssn <SSN>")
    assert(r1.getAs[Long]("pii_total") == 4)
    val r2 = got(1)
    assert(r2.getAs[Long]("n_ip") == 1 &&
      r2.getAs[String]("text") == "ip <IP> clean otherwise")
  }

  test("hashSplit: stable, salt-sensitive, fractions validated") {
    val s = spark
    import s.implicits._
    val docs = (0L until 2000L).map(i => Tuple1(i)).toDF("doc_id")
    val a = TextAnalysis.hashSplit(docs, "doc_id").orderBy("doc_id")
      .select("split").as[String].collect().toSeq
    val b = TextAnalysis.hashSplit(docs, "doc_id").orderBy("doc_id")
      .select("split").as[String].collect().toSeq
    assert(a == b) // pure function of (id, salt)
    val c = TextAnalysis.hashSplit(docs, "doc_id", salt = "other")
      .orderBy("doc_id").select("split").as[String].collect().toSeq
    assert(a != c) // a re-salt is an independent re-split
    val frac = a.count(_ == "train").toDouble / a.size
    assert(frac > 0.85 && frac < 0.95)
    intercept[IllegalArgumentException] {
      TextAnalysis.hashSplit(docs, "doc_id",
        splits = Seq("a" -> 0.5, "b" -> 0.4))
    }
  }

  test("packSequences degrades on null text / uncastable id") {
    val s = spark
    import s.implicits._
    val docs = Seq((Some("1"), Option("a b c")), (Some("2"), None),
      (None, Option("d e")), (Some("x"), Option("f")))
      .toDF("doc_id", "text")
    val out = TextAnalysis.packSequences(docs, budget = 10, shards = 1)
      .orderBy("doc_id").collect()
    // null id and non-numeric id dropped; null text packs as 0 tokens
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(out.map(_.getLong(3)).toSeq == Seq(3L, 0L))
  }

  test("bm25TopK: hand-computed scores, ranking, and tie-break") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "apple banana apple"), (2L, "apple cherry"),
      (3L, "banana banana banana durian"), (4L, "cherry cherry"))
      .toDF("doc_id", "text")
    val queries = Seq(("Q", "apple banana")).toDF("query_id", "query_text")
    val got = TextAnalysis.bm25TopK(docs, queries, k = 10)
      .orderBy("rank").collect()
      .map(r => (r.getLong(1), r.getDouble(2), r.getInt(3)))
    // manual BM25: N=4, avgdl=(3+2+4+2)/4=2.75, df(apple)=2, df(banana)=2
    def idf = math.log(1 + (4 - 2 + 0.5) / (2 + 0.5))
    def tfn(tf: Long, dl: Long) =
      tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / 2.75))
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    val want = Map(
      1L -> r6(idf * tfn(2, 3) + idf * tfn(1, 3)),
      2L -> r6(idf * tfn(1, 2)),
      3L -> r6(idf * tfn(3, 4)),
      4L -> 0.0)
    // doc 4 has no query term: absent entirely
    assert(got.map(_._1).toSet == Set(1L, 2L, 3L))
    got.foreach { case (id, score, _) =>
      assert(math.abs(score - want(id)) < 1e-9, s"doc $id: $score") }
    // ranks follow rounded score desc
    assert(got.sortBy(_._3).map(_._1).toSeq ==
      want.filter(_._2 > 0).toSeq.sortBy { case (id, sc) => (-sc, id) }
        .map(_._1))
  }

  test("bigramPerplexity: add-k math, unseen-bigram path, short docs") {
    val s = spark
    import s.implicits._
    val train = Seq((1L, "a b a b"), (2L, "a b c")).toDF("doc_id", "text")
    // train counts: (a,b)=3 (b,a)=1 (b,c)=1; c(a)=3 c(b)=2; V=3
    val score = Seq((10L, "a b c"), (11L, "c a"), (12L, "a"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.bigramPerplexity(train, score)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    def p(c12: Double, c1: Double) = (c12 + 0.1) / (c1 + 0.1 * 3)
    val nll10 = -(math.log(p(3, 3)) + math.log(p(1, 2))) / 2
    val nll11 = -math.log(p(0, 0)) // unseen context (c,a)
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    // doc 12 has < 2 tokens: omitted
    assert(got.map(_._1).toSeq == Seq(10L, 11L))
    assert(got(0)._2 == 2 && got(1)._2 == 1)
    assert(math.abs(got(0)._3 - r6(math.exp(nll10))) < 1e-9)
    assert(math.abs(got(1)._3 - r6(math.exp(nll11))) < 1e-9)
  }

  test("rrfFuse: hand-computed fusion, one-list-only candidates, " +
      "doc_id tie-break") {
    import spark.implicits._
    // list0: doc 1 @ rank1, doc 2 @ rank2; list1: doc 2 @ rank1,
    // doc 3 @ rank2. Expected (k=60):
    //   doc2 = 1/62 + 1/61  (both lists)     ~ 0.032524
    //   doc1 = 1/61          (list0 only)    ~ 0.016393
    //   doc3 = 1/62          (list1 only)    ~ 0.016129
    val l0 = Seq(("Q", 1L, 1), ("Q", 2L, 2)).toDF("query_id", "doc_id", "rank")
    val l1 = Seq(("Q", 2L, 1), ("Q", 3L, 2)).toDF("query_id", "doc_id", "rank")
    val got = TextAnalysis.rrfFuse(Seq(l0, l1), topK = 10)
      .orderBy(col("rank"))
      .select("doc_id", "rrf_score", "rank_0", "rank_1")
      .as[(Long, Double, Option[Int], Option[Int])].collect()
    assert(got.map(_._1).toSeq === Seq(2L, 1L, 3L))
    assert(math.abs(got(0)._2 - (1.0 / 62 + 1.0 / 61)) < 1e-12)
    assert(got(0)._3.contains(2) && got(0)._4.contains(1))
    assert(got(1)._3.contains(1) && got(1)._4.isEmpty)
    // equal-score tie (two single-list docs at the same rank in
    // different lists of the same kRrf offset) breaks on doc_id
    val t0 = Seq(("Q", 9L, 1)).toDF("query_id", "doc_id", "rank")
    val t1 = Seq(("Q", 4L, 1)).toDF("query_id", "doc_id", "rank")
    val tie = TextAnalysis.rrfFuse(Seq(t0, t1), topK = 10)
      .orderBy(col("rank")).select("doc_id").as[Long].collect()
    assert(tie.toSeq === Seq(4L, 9L))
  }

  test("ngramNovelty: hand-computed overlap fractions, short-doc zero-fill") {
    import spark.implicits._
    val ref = Seq((100L, "a b c d")).toDF("doc_id", "text")
    // ref trigram vocab: {a b c, b c d}
    val docs = Seq(
      (1L, "a b c d e"),   // grams: a b c*, b c d*, c d e -> 1/3 novel
      (2L, "x y z w"),     // grams: x y z, y z w -> 2/2 novel
      (3L, "a b c"),       // gram: a b c* -> 0/1 novel
      (4L, "one two"))     // < 3 tokens -> 0 grams, NULL novelty
      .toDF("doc_id", "text")
    val out = TextAnalysis.ngramNovelty(docs, ref, n = 3)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_grams"), r.getAs[Long]("n_novel"),
          Option(r.getAs[java.lang.Double]("novelty")))))
      .toMap
    assert(out(1L) == ((3L, 1L, Some(java.lang.Double.valueOf(0.333333)))))
    assert(out(2L) == ((2L, 2L, Some(java.lang.Double.valueOf(1.0)))))
    assert(out(3L) == ((1L, 0L, Some(java.lang.Double.valueOf(0.0)))))
    assert(out(4L) == ((0L, 0L, None)))
  }

  test("ngramNovelty counts DISTINCT grams once per document") {
    import spark.implicits._
    val ref = Seq((100L, "a b c")).toDF("doc_id", "text")
    // 'a b c' occurs twice in the doc but is ONE distinct gram
    val docs = Seq((1L, "a b c a b c")).toDF("doc_id", "text")
    val out = TextAnalysis.ngramNovelty(docs, ref, n = 3)
      .collect().head
    // distinct grams: {a b c, b c a, c a b} -> 3, of which 2 novel
    assert(out.getAs[Long]("n_grams") == 3L)
    assert(out.getAs[Long]("n_novel") == 2L)
  }

  test("jsdMatrix: identical domains -> 0, disjoint domains -> 1, " +
    "half-overlap matches the closed form") {
    import spark.implicits._
    val docs = Seq(
      ("A", "alpha beta alpha beta"),
      ("B", "alpha beta beta alpha"),   // same distribution as A
      ("C", "gamma delta gamma delta"), // disjoint from A
      ("D", "alpha alpha beta gamma"))  // overlaps A
      .toDF("dom", "text")
    val out = TextAnalysis.jsdMatrix(docs, col("dom"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2))
      .toMap
    assert(out(("A", "B")) === 0.0)
    assert(out(("A", "C")) === 1.0)
    // closed form for P = (.5, .5, 0), Q = (.5, .25, .25) on
    // (alpha, beta, gamma): jsd = 0.5*[.5 lg(10/7.5)... compute:
    val terms = Seq((0.5, 0.5), (0.5, 0.25), (0.0, 0.25))
    def lg(x: Double) = math.log(x) / math.log(2.0)
    val want = terms.map { case (p, q) =>
      (if (p > 0) p * lg(p * 2 / (p + q)) else 0.0) * 0.5 +
      (if (q > 0) q * lg(q * 2 / (p + q)) else 0.0) * 0.5 }.sum
    assert(math.abs(out(("A", "D")) - want) < 1e-6)
    assert(out(("A", "D")) > 0.0 && out(("A", "D")) < 1.0)
  }
}
