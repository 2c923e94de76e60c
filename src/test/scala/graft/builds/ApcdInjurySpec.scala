package graft.builds

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Pins the CDC injury surveillance inclusion predicate (ApcdInjury),
  * including the reference's literal-'%' BETWEEN boundary quirks and the
  * 7th-character qualifier rules. */
class ApcdInjurySpec extends SparkSpec {
  import spark.implicits._

  private def included(code: String, ver: Int): Boolean =
    Seq((code, ver)).toDF("norm", "ver")
      .filter(ApcdInjury.cdcNatureInclusion(col("norm"), col("ver")))
      .count() == 1

  test("ICD-9 ranges with exclusions") {
    assert(included("8001", 9))      // in 800-9949 range
    assert(included("99551", 9))     // 9955x
    assert(!included("9093", 9))     // explicit exclusion
    assert(!included("90931", 9))    // exclusion is a prefix LIKE
    assert(!included("E950", 9))     // E-codes not in the nature ranges
    assert(!included("0801", 9))     // below range
  }

  test("literal-'%' BETWEEN bounds behave as binary string comparison") {
    // '800' sorts BELOW '800%' (prefix-shorter), so it is excluded;
    // '8000' sorts above ('0' > '%'), so it is included — the T-SQL
    // reference inherits exactly this from its string BETWEEN.
    assert(!included("800", 9))
    assert(included("8000", 9))
    // '99580' < '99580%' excluded; '99581' and '99585' included;
    // '995851' > '99585%' excluded again
    assert(!included("99580", 9))
    assert(included("99581", 9))
    assert(included("99585", 9))
    assert(!included("995851", 9))
  }

  test("ICD-10 7th-character qualifier rules") {
    assert(included("S02100A", 10))  // S + initial encounter
    assert(included("S02100", 10))   // short code: 7th char '' allowed
    assert(!included("S02100D", 10)) // subsequent encounter excluded
    assert(included("T39913A", 10))  // T36-T50 range, 6th char 1-4
    assert(!included("T39995A", 10)) // 6th char 5 and not T3[679]9+5th 1-4
    assert(included("T79010B", 10))  // T79 branch
    assert(included("M97500C", 10))  // M97 branch
    assert(included("O9A300A", 10))  // O9A pregnancy-trauma branch
    assert(!included("Z00000A", 10)) // not an injury family
    assert(!included("S02100A", 9))  // version gates the definition
  }

  test("nature-type normalization merges categories and strips suffixes") {
    val out = Seq("Fracture; initial encounter", "Crushing injury",
      "Burns", "Spinal cord injury (SCI)", "Other specified injury",
      "Dislocation, initial encounter")
      .toDF("d").select(ApcdInjury.normalizeNatureType(col("d")).as("t"))
      .as[String].collect().toSeq
    assert(out == Seq("Fracture", "Crushing injury or internal injury",
      "Burn and corrosion", "Spinal cord injury", "Other injuries",
      "Dislocation"))
  }
}
