package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** FDA NDC package-code normalization — the 10-digit hyphenated code
  * to the 11-digit billing NDC (ref/tables/load_ref.ndc_codes.R:47-57):
  * the FDA directory writes package codes in three segment shapes, and
  * the missing digit pads a different segment in each:
  *
  *   - 4-4-2  → '0' + seg1 + seg2 + seg3
  *   - 5-3-2  → seg1 + '0' + seg2 + seg3
  *   - 5-4-1  → seg1 + seg2 + '0' + seg3
  *
  * Anything else (compounder free-text, malformed codes) → NULL, as
  * the R fcase default. The reference greps with [[:alnum:]] classes —
  * real segments are digits but the class is kept faithfully. One
  * deliberate deviation: the reference's grepl is UNANCHORED, so a
  * 6-4-2-shaped string contains a 4-4-2 match and gets "normalized"
  * into a 13-character non-NDC (a latent bug); the shapes here anchor,
  * so such codes fall to NULL instead.
  *
  * Pure row-local Column expressions (split + concat under three rlike
  * guards) — codegen'd, no UDF.
  */
object NdcCodes {

  def ndc11(pkg: Column): Column = {
    val seg = split(pkg, "-")
    val s1 = element_at(seg, 1)
    val s2 = element_at(seg, 2)
    val s3 = element_at(seg, 3)
    when(pkg.rlike("^[0-9A-Za-z]{4}-[0-9A-Za-z]{4}-[0-9A-Za-z]{2}$"),
      concat(lit("0"), s1, s2, s3))
      .when(pkg.rlike("^[0-9A-Za-z]{5}-[0-9A-Za-z]{3}-[0-9A-Za-z]{2}$"),
        concat(s1, lit("0"), s2, s3))
      .when(pkg.rlike("^[0-9A-Za-z]{5}-[0-9A-Za-z]{4}-[0-9A-Za-z]{1}$"),
        concat(s1, s2, lit("0"), s3))
      .otherwise(lit(null).cast("string"))
  }
}
