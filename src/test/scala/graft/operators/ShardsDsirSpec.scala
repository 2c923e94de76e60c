package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** balancedShards (q266), dsirScores (q265), and the leakage-free
  * cluster-grain split composition (q264). */
class ShardsDsirSpec extends SparkSpec {

  private def docs(rows: Seq[(Long, String)]) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
  }

  test("balancedShards: contiguous cumsum, start-offset shard rule, " +
      "partition invariance") {
    val d = docs((0L until 40L).map(i => i -> ("w " * (i.toInt % 7 + 1)).trim))
    val out = TextAnalysis.balancedShards(d, shardTokens = 10L)
      .orderBy(col("ord"), col("doc_id")).collect()
    assert(out.length == 40)
    // cumulative sums are the running total in (ord, id) order
    var run = 0L
    out.foreach { r =>
      run += r.getAs[Long]("n_tokens")
      assert(r.getAs[Long]("cum_tokens") == run,
        s"cum broke at doc ${r.getAs[Long]("doc_id")}")
      assert(r.getAs[Long]("shard") ==
        (r.getAs[Long]("cum_tokens") - r.getAs[Long]("n_tokens")) / 10L)
    }
    // shard ids are nondecreasing in stream order and start at 0
    val shards = out.map(_.getAs[Long]("shard"))
    assert(shards.head == 0L && shards.sliding(2).forall(p =>
      p.length < 2 || p(0) <= p(1)))
    // a shard's token total (less its possibly-straddling last doc)
    // never exceeds the budget
    out.groupBy(_.getAs[Long]("shard")).foreach { case (_, rs) =>
      val tot = rs.map(_.getAs[Long]("n_tokens")).sum
      val last = rs.maxBy(_.getAs[Long]("cum_tokens")).getAs[Long]("n_tokens")
      assert(tot - last < 10L, s"shard over budget even without tail")
    }
    // the assignment is a pure function of the data, not the layout
    val re = TextAnalysis.balancedShards(d.repartition(7), shardTokens = 10L)
      .orderBy(col("ord"), col("doc_id")).collect()
    assert(out.map(r => (r.getLong(0), r.getAs[Long]("shard"))).toSeq ==
      re.map(r => (r.getLong(0), r.getAs[Long]("shard"))).toSeq)
  }

  test("DSIR selection (q265 composition): target-like raw docs are " +
      "the ones selected; raw-only output, zero-filled") {
    // ids 100/101 are target (vocabulary A); raw pool mixes A-like and
    // B-like docs — dsirWeights fits on the POOL, TopN selects raw
    val pool = docs(Seq(
      100L -> "alpha beta alpha beta gamma",
      101L -> "alpha gamma beta alpha",
      1L -> "alpha beta gamma alpha beta", // target-like
      2L -> "zig zag zog zig zag zog zag", // off-target
      4L -> "alpha beta alpha",            // target-like
      5L -> "zig zog mop hax"))            // off-target
    val isTarget = col("doc_id") >= 100L
    val scored = pool.filter(!isTarget).select(col("doc_id"))
      .join(TextAnalysis.dsirWeights(pool, isTarget),
        Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("log_importance"), lit(0.0)).as("log_importance"))
    val sel = graft.core.TopN
      .topNByRank(scored, "log_importance", "doc_id", 2)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(sel == Set(1L, 4L), s"selection must pick target-like: $sel")
    val all = scored.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(all.keySet == Set(1L, 2L, 4L, 5L), "raw docs only")
    assert(all(1L) > 0.0 && all(4L) > 0.0 && all(2L) < 0.0 && all(5L) < 0.0)
  }

  test("CDC chunking: bounds respected, chunks tile the doc, and an " +
      "edit at the front resynchronizes — later fingerprints survive") {
    val words = (1 to 80).map(i => s"tok${i * 37 % 97}")
    val a = words.mkString(" ")
    val b = "ins1 ins2 ins3 " + a // 3-token prepend
    val out = TextAnalysis.cdcChunks(docs(Seq(1L -> a, 2L -> b)))
      .orderBy(col("doc_id"), col("chunk_idx")).collect()
    val (ca, cb) = out.partition(_.getLong(0) == 1L)
    // chunks tile [1, n] contiguously and respect [min=4, max=16]
    // (the final chunk may run short)
    Seq(ca -> 80, cb -> 83).foreach { case (cs, n) =>
      assert(cs.head.getAs[Int]("start_tok") == 1)
      assert(cs.last.getAs[Int]("end_tok") == n)
      cs.sliding(2).foreach { p =>
        if (p.length == 2)
          assert(p(1).getAs[Int]("start_tok") ==
            p(0).getAs[Int]("end_tok") + 1)
      }
      cs.init.foreach(c => assert(c.getAs[Int]("n_toks") >= 4 &&
        c.getAs[Int]("n_toks") <= 16))
      assert(cs.last.getAs[Int]("n_toks") <= 16)
    }
    // resync: the edited doc's trailing chunk fingerprints equal the
    // original's (content-defined boundaries re-align after the edit)
    val fa = ca.map(_.getAs[Long]("chunk_fp")).toSeq
    val fb = cb.map(_.getAs[Long]("chunk_fp")).toSeq
    val common = (1 to math.min(fa.length, fb.length))
      .takeWhile(k => fa.takeRight(k) == fb.takeRight(k)).lastOption
    assert(common.exists(_ >= 2),
      s"chunk streams must resynchronize: $fa vs $fb")
    // and the first chunk differs (the edit is real)
    assert(fa.head != fb.head)
  }

  test("cluster-grain split keeps every near-dup pair in one split") {
    // three exact-duplicate families (certain near-dup pairs) + noise
    val fams = (0 until 12).flatMap { f =>
      val txt = s"family $f shares this exact sentence body " +
        s"token$f token$f token$f end"
      Seq((f * 10L) -> txt, (f * 10L + 1) -> txt, (f * 10L + 2) -> txt)
    }
    val d = docs(fams)
    val pairs = Dedup.minhashNearDups(d, "doc_id", "text",
      shingleN = 3, bands = 8, rows = 2, threshold = 0.5)
      .select(col("id_a"), col("id_b"))
    val comp = Components.connectedComponents(
      pairs.select(col("id_a").as("src"), col("id_b").as("dst")),
      "src", "dst")
    val clustered = d.select(col("doc_id"))
      .join(comp, d("doc_id") === comp("id"), "left")
      .select(col("doc_id"),
        coalesce(col("component"), col("doc_id")).as("cluster"))
    val split = TextAnalysis.hashSplit(clustered, "cluster")
    val leaks = pairs
      .join(split.select(col("doc_id").as("id_a"),
        col("split").as("split_a")), Seq("id_a"))
      .join(split.select(col("doc_id").as("id_b"),
        col("split").as("split_b")), Seq("id_b"))
      .filter(col("split_a") =!= col("split_b")).count()
    assert(pairs.count() >= 12 * 3, "fixture must produce real pairs")
    assert(leaks == 0L, "cluster-grain split must never straddle a pair")
    // and the doc-grain split DOES leak on the same fixture (the
    // q215 problem this operator fixes) — unless md5 happens to agree
    // for every family, which 12 families make vanishingly unlikely
    val docSplit = TextAnalysis.hashSplit(d.select(col("doc_id")), "doc_id")
    val docLeaks = pairs
      .join(docSplit.select(col("doc_id").as("id_a"),
        col("split").as("split_a")), Seq("id_a"))
      .join(docSplit.select(col("doc_id").as("id_b"),
        col("split").as("split_b")), Seq("id_b"))
      .filter(col("split_a") =!= col("split_b")).count()
    assert(docLeaks > 0L, "fixture should exhibit doc-grain leakage")
  }
}
