package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** URL canonicalization + canonical-URL dedup — the Common-Crawl-style
  * pipeline step that runs BEFORE content dedup: a crawl sees the same
  * page under scheme/case/port/www/param-order/tracking-param/fragment
  * variants, and collapsing them by canonical URL removes exact
  * re-fetches at zero content-hash cost (CCNet and RefinedWeb both
  * de-duplicate by normalized URL before MinHash).
  *
  * Canonicalization (RFC-3986-lite, pure Column expressions in the
  * Java-regex ∩ RE2 subset so the oracle replays it):
  *  - scheme + host lower-cased; default port stripped (`:80` for http,
  *    `:443` for https); leading `www.` stripped;
  *  - path: trailing slashes stripped, empty path -> `/`;
  *  - query: tracking params dropped (`utm_*`, `fbclid`, `gclid`,
  *    `msclkid`, `ref`), the rest SORTED and re-joined — param order
  *    does not change the resource;
  *  - fragment dropped entirely;
  *  - a string with no `scheme://` prefix falls back to
  *    lower(trim(url)) — garbage in, deterministic garbage out.
  *
  * Scale: canonicalization is shuffle-free row-local work (the param
  * filter/sort higher-order functions run on per-row arrays of a
  * handful of elements — nothing like a corpus-width loop); the dedup
  * is ONE hash shuffle on the canonical URL with a window min — no
  * join-back re-shuffle of the fact rows.
  */
object Urls {

  private val TrackingParam = "^(utm_[^=]*|fbclid|gclid|msclkid|ref)(=.*)?$"

  /** Canonical form of a URL column (see object doc). */
  def canonicalize(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val hostPort =
      lower(regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    val dePort = when(scheme === "http",
      regexp_replace(hostPort, ":80$", ""))
      .when(scheme === "https", regexp_replace(hostPort, ":443$", ""))
      .otherwise(hostPort)
    val host = regexp_replace(dePort, "^www\\.", "")
    val rawPath =
      regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    val trimmed = regexp_replace(rawPath, "/+$", "")
    val path = when(trimmed === "", "/").otherwise(trimmed)
    // [^#]*? before the '?' keeps the match inside the pre-fragment
    // prefix: a '?' that first appears AFTER '#' (hash-routing URLs
    // like /p#/route?x=1) is part of the fragment, not a query.
    val query = regexp_extract(url, "^[^#]*?\\?([^#]*)", 1)
    val params = filter(split(query, "&"),
      p => !(p.rlike(TrackingParam)) && p =!= "")
    val sortedQ = array_join(array_sort(params), "&")
    when(scheme === "", lower(trim(url)))
      .otherwise(concat(scheme, lit("://"), host, path,
        when(sortedQ === "", "").otherwise(concat(lit("?"), sortedQ))))
  }

  /** Per-row dedup verdict: every row gains `canonical_url` and
    * `kept` (1 on the LOWEST idCol per canonical URL, 0 otherwise).
    * One shuffle on the canonical URL. */
  def dedupByCanonical(df: DataFrame, idCol: String,
      urlCol: String): DataFrame = {
    val w = Window.partitionBy(col("canonical_url"))
    df.withColumn("canonical_url", canonicalize(col(urlCol)))
      .withColumn("kept",
        (col(idCol) === min(col(idCol)).over(w)).cast("int"))
  }
}
