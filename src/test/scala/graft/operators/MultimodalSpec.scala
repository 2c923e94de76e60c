package graft.operators

import graft.SparkSpec
import graft.queries.Q

/** Multimodal plumbing spec: the decode step is a documented deterministic
  * stub, but the Spark-side contract — schema, batch shape, determinism,
  * row preservation — is real and pinned here. */
class MultimodalSpec extends SparkSpec {

  test("extractFeatures preserves rows, schema, and is deterministic") {
    val docs = Q.t(spark, sf, "documents")
    val media = Multimodal.withMediaColumn(docs)
    assert(media.columns.toSeq == Seq("doc_id", "media", "media_meta"))
    val out = Multimodal.extractFeatures(media)
    assert(out.columns.toSeq ==
      Seq("doc_id", "n_bytes", "width", "height", "feature"))
    assert(out.count() == docs.count())
    val a = out.orderBy("doc_id").collect().map(_.toString)
    val b = Multimodal.extractFeatures(media).orderBy("doc_id").collect().map(_.toString)
    assert(a.toSeq == b.toSeq)
  }

  test("binaryFile source feeds the same decode pipeline") {
    val media = Multimodal.readMediaDir(spark, sf, "*.parquet")
    val n = media.count()
    assert(n >= 5, s"expected the sf parquet blobs, got $n")
    val out = Multimodal.extractFeatures(
      media.select("doc_id", "media"))
    assert(out.count() == n)
    val r = out.orderBy("doc_id").head()
    assert(r.getInt(1) > 0) // n_bytes from actual blob content
  }

  test("resizeStub preserves aspect ratio and never upscales") {
    import org.apache.spark.sql.functions.col
    val feats = Multimodal.extractFeatures(
      Multimodal.withMediaColumn(Q.t(spark, sf, "documents")))
    val out = Multimodal.resizeStub(feats, maxSide = 128)
      .select(col("width"), col("height"), col("rs_width"), col("rs_height"))
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (w, h, rw, rh) = (r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3))
      assert(rw <= 128 && rh <= 128, s"target box exceeded: $rw x $rh")
      assert(rw <= w && rh <= h, "resize must never upscale")
      // aspect preserved within ceil rounding
      assert(math.abs(rw.toDouble / w - rh.toDouble / h) < 0.05,
        s"aspect drifted: $w x $h -> $rw x $rh")
    }
  }

  test("sampleFrames keeps every stride-th fixed-size frame, incl. the tail") {
    val s2 = spark
    import s2.implicits._
    val bytes = ("x" * 200).getBytes("UTF-8") // 200 bytes -> 4 frames of 64
    val media = Seq((7L, bytes)).toDF("doc_id", "media")
    val frames = Multimodal.sampleFrames(media, frameBytes = 64, stride = 2)
      .orderBy("frame_idx").collect()
    assert(frames.map(_.getInt(2)).toSeq == Seq(0, 2)) // kept 0 and 2 of 0..3
    assert(frames.forall(_.getInt(1) == 4)) // n_frames
    assert(frames(0).getAs[Array[Byte]]("frame").length == 64)
    // frame 2 covers bytes 128..192 (full); the unsampled tail frame 3
    // would be the 8-byte remainder
    assert(frames(1).getAs[Array[Byte]]("frame").length == 64)
  }

  test("decodeStub derives stable features from bytes") {
    val r = Multimodal.MediaRow(1L, "hello world media bytes".getBytes("UTF-8"))
    val f1 = Multimodal.decodeStub(r)
    val f2 = Multimodal.decodeStub(r)
    assert(f1 == f2.copy(feature = f1.feature) && f1.feature.sameElements(f2.feature))
    assert(f1.n_bytes == 23)
    assert(f1.width >= 64 && f1.width < 64 + 1024)
    assert(f1.height >= 64 && f1.height < 64 + 1024)
    assert(f1.feature.length == 8)
    assert(f1.feature.forall(x => x >= 0f && x < 1f))
  }
}
