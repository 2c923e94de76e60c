package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.SimHash64
import graft.functions.VectorFns

/** Document deduplication at training-data scale: exact, MinHash+LSH,
  * SimHash, n-gram Jaccard, and embedding-cosine near-dup.
  *
  * Design for 100 TB: candidate generation is always a *bucket equi-join*
  * (shuffle on band/bucket key, never a cross join); exact verification only
  * runs on in-bucket pairs. Hot buckets (boilerplate shingles) are capped so
  * one degenerate key can't quadratically blow up a task.
  */
object Dedup {

  /** Normalize + whitespace-tokenize. */
  def tokens(text: Column): Column =
    split(regexp_replace(lower(trim(text)), "\\s+", " "), " ")

  /** Distinct n-token shingles; short docs fall back to the whole text. */
  def shingles(text: Column, n: Int): Column = {
    val toks = tokens(text)
    val idx = sequence(lit(0), greatest(size(toks) - n, lit(0)))
    array_distinct(transform(idx, i => concat_ws(" ", slice(toks, i + lit(1), lit(n)))))
  }

  /** Exact dedup: md5 of normalized text; keeps the lowest id per group.
    * One partial-aggregatable shuffle on the 128-bit hash. */
  def exact(docs: DataFrame, id: String, text: String): DataFrame = {
    val fp = TextAnalysis.fingerprint(col(text))
    docs.select(col(id), fp.as("fp"))
      .groupBy(col("fp"))
      .agg(min(col(id)).as("keep_id"), count(lit(1)).as("n_copies"))
  }

  /** MinHash signature: k independent 64-bit hash mins over shingles. */
  def minhashSignature(sh: Column, k: Int): Column =
    array((0 until k).map(j => array_min(transform(sh, s => xxhash64(s, lit(j))))): _*)

  /** MinHash+LSH candidate pairs: signature -> b bands of r hashes; docs
    * sharing any band bucket are candidates. Returns (id_a, id_b, jaccard)
    * for pairs whose exact shingle-Jaccard >= threshold.
    *
    * @param maxBucket drop degenerate buckets larger than this (skew guard)
    */
  def minhashNearDups(docs: DataFrame, id: String, text: String,
      shingleN: Int = 3, bands: Int = 8, rows: Int = 2,
      threshold: Double = 0.7, maxBucket: Int = 1000): DataFrame = {
    val k = bands * rows
    val base = docs
      .select(col(id).as("_id"), shingles(col(text), shingleN).as("_sh"))
      .withColumn("_sig", minhashSignature(col("_sh"), k))
    // explode to (band_idx, band_hash) bucket keys
    val bandCols = (0 until bands).map { b =>
      struct(lit(b).as("band"), xxhash64(slice(col("_sig"), b * rows + 1, rows)).as("bh"))
    }
    val buckets = base
      .select(col("_id"), col("_sh"), explode(array(bandCols: _*)).as("bk"))
      .select(col("_id"), col("_sh"), col("bk.band"), col("bk.bh"))
    val capped = buckets.withColumn("_bn",
        count(lit(1)).over(Window.partitionBy(col("band"), col("bh"))))
      .filter(col("_bn") <= maxBucket).drop("_bn")
    val a = capped.select(col("band"), col("bh"),
      col("_id").as("id_a"), col("_sh").as("sh_a"))
    val b = capped.select(col("band"), col("bh"),
      col("_id").as("id_b"), col("_sh").as("sh_b"))
    a.join(b, Seq("band", "bh"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
      .groupBy(col("id_a"), col("id_b"))          // same pair from many bands
      .agg(max(col("jaccard")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Exact Jaccard over two distinct-element arrays. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      greatest(size(array_union(a, b)), lit(1)).cast("double")

  /** SimHash near-dups: 64-bit fingerprints bucketed by 16-bit chunks
    * (pigeonhole: hamming<=3 pairs must agree on >=1 of 4 chunks), verified
    * with bit_count(a^b) <= maxHamming. */
  def simhashNearDups(docs: DataFrame, id: String, text: String,
      maxHamming: Int = 3): DataFrame = {
    val sigs = docs.select(col(id).as("_id"),
      SimHash64.simhash64(tokens(col(text))).as("_sig"))
    val chunks = (0 until 4).map(c =>
      struct(lit(c).as("chunk"),
        shiftright(col("_sig"), c * 16).bitwiseAND(lit(0xffffL)).as("ck")))
    val bucketed = sigs.select(col("_id"), col("_sig"),
      explode(array(chunks: _*)).as("bk"))
      .select(col("_id"), col("_sig"), col("bk.chunk"), col("bk.ck"))
    val a = bucketed.select(col("chunk"), col("ck"),
      col("_id").as("id_a"), col("_sig").as("sig_a"))
    val b = bucketed.select(col("chunk"), col("ck"),
      col("_id").as("id_b"), col("_sig").as("sig_b"))
    a.join(b, Seq("chunk", "ck"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Brute n-gram Jaccard within a cheap blocking key (here: same source +
    * similar length band) — the quadratic-safe "small block" variant. */
  def ngramJaccardDups(docs: DataFrame, id: String, text: String,
      blockCols: Seq[String], shingleN: Int = 3, threshold: Double = 0.8): DataFrame = {
    val base = docs.select((blockCols.map(col) :+ col(id).as("_id") :+
      shingles(col(text), shingleN).as("_sh")): _*)
    val a = base.toDF(base.columns.map(c => if (c.startsWith("_")) c + "_a" else c): _*)
    val b = base.toDF(base.columns.map(c => if (c.startsWith("_")) c + "_b" else c): _*)
    a.join(b, blockCols)
      .filter(col("_id_a") < col("_id_b"))
      .select(col("_id_a").as("id_a"), col("_id_b").as("id_b"),
        jaccard(col("_sh_a"), col("_sh_b")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Embedding near-dups: random-hyperplane LSH bucket join + exact cosine
    * verify. Hyperplanes are seeded-deterministic (same plan every run). */
  def embeddingNearDups(vecs: DataFrame, id: String, emb: String,
      dim: Int, nPlanes: Int = 16, threshold: Double = 0.95,
      seed: Long = 42L): DataFrame = {
    val rng = new scala.util.Random(seed)
    val planes = Array.fill(nPlanes, dim)(rng.nextGaussian().toFloat)
    val planeCols = planes.map(p => typedlit(p.toSeq))
    // bucket = sign bits of dot(v, plane_m); built against the renamed _v
    val sig = planeCols.zipWithIndex.map { case (p, m) =>
      when(VectorFns.dotProduct(col("_v"), p) >= 0, lit(1L << m)).otherwise(lit(0L))
    }.reduce(_ + _)
    val bucketed = vecs.select(col(id).as("_id"), col(emb).as("_v"))
      .withColumn("_bucket", sig)
    val a = bucketed.select(col("_bucket"), col("_id").as("id_a"), col("_v").as("v_a"))
    val b = bucketed.select(col("_bucket"), col("_id").as("id_b"), col("_v").as("v_b"))
    a.join(b, Seq("_bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        VectorFns.cosineSim(col("v_a"), col("v_b")).as("cosine"))
      .filter(col("cosine") >= threshold)
  }
}
