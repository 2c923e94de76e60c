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
