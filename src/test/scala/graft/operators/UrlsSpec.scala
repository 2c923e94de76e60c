package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** URL canonicalization: every rule on hand-picked variants, plus the
  * dedup verdict. */
class UrlsSpec extends SparkSpec {

  private def canon(urls: String*): Seq[String] = {
    val s = spark
    import s.implicits._
    urls.toDF("u").select(Urls.canonicalize(col("u")).as("c"))
      .as[String].collect().toSeq
  }

  test("scheme/host case, default ports, www, trailing slash, fragment") {
    assert(canon(
      "HTTP://WWW.Example.COM:80/A/b/",
      "http://example.com/A/b",
      "https://example.com:443/x#frag",
      "https://example.com:8443/x",   // NON-default port kept
      "http://example.com:443/x",     // 443 is not http's default: kept
      "http://example.com") == Seq(
      "http://example.com/A/b",
      "http://example.com/A/b",
      "https://example.com/x",
      "https://example.com:8443/x",
      "http://example.com:443/x",
      "http://example.com/"))
  }

  test("tracking params drop, the rest sort; empty query disappears") {
    assert(canon(
      "http://e.com/p?utm_source=tw&b=2&a=1&gclid=zz",
      "http://e.com/p?a=1&b=2",
      "http://e.com/p?utm_campaign=x",
      "http://e.com/p?ref=rss&z=9&ref") == Seq(
      "http://e.com/p?a=1&b=2",
      "http://e.com/p?a=1&b=2",
      "http://e.com/p",
      "http://e.com/p?z=9"))
  }

  test("'?' inside the fragment is NOT a query (hash-routing URLs)") {
    assert(canon(
      "http://a.com/p#/route?x=1",       // query lives in the fragment
      "http://a.com/p?x=1#/route?y=2",   // real query, then fragment
      "http://a.com/p?b=2&a=1#?frag") == Seq(
      "http://a.com/p",
      "http://a.com/p?x=1",
      "http://a.com/p?a=1&b=2"))
  }

  test("no-scheme strings fall back to lower(trim)") {
    assert(canon("  Not A Url 7 ", "relative/path") ==
      Seq("not a url 7", "relative/path"))
  }

  test("canonicalization is idempotent: canon(canon(u)) == canon(u)") {
    val urls = Seq(
      "HTTP://WWW.Example.COM:80/A/b/?utm_source=x&b=2&a=1#f",
      "https://e.com:443/x",
      "http://e.com",
      "  Not A Url 7 ",
      "http://e.com/p?ref=rss&z=9")
    val once = canon(urls: _*)
    val twice = canon(once: _*)
    assert(twice == once)
  }

  test("dedupByCanonical keeps the lowest id per canonical URL") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (10L, "http://E.com/a"),
      (3L, "HTTP://www.e.com:80/a/"),
      (7L, "https://e.com/a"))
      .toDF("doc_id", "url")
    val got = Urls.dedupByCanonical(docs, "doc_id", "url")
      .select("doc_id", "kept").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(got == Set((3L, 1), (10L, 0), (7L, 1)))
  }
}
