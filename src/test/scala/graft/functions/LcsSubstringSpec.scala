package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Pins [[LcsSubstring]] to the reference T-SQL function's own documented
  * examples (longest_common_substring.sql:48-55) plus the tie-break and
  * degenerate cases. */
class LcsSubstringSpec extends SparkSpec {

  private def run(a: String, b: String) = {
    val s = spark
    import s.implicits._
    Seq((a, b)).toDF("a", "b")
      .select(LcsSubstring.lcsSubstring(col("a"), col("b")).as("r"))
      .select("r.match_length", "r.first_pos", "r.second_pos", "r.common")
      .head()
  }

  test("reference examples") {
    assert(run("1234", "1224533324") ===
      org.apache.spark.sql.Row(2, 1, 1, "12"))
    assert(run("thisisatest", "testing123testing") ===
      org.apache.spark.sql.Row(4, 8, 1, "test"))
    assert(run("465932859472109683472", "697834859472135348") ===
      org.apache.spark.sql.Row(7, 7, 7, "8594721"))
    assert(run("not beginning-middle-ending",
      "beginning-diddle-dum-ending") ===
      org.apache.spark.sql.Row(10, 5, 1, "beginning-"))
  }

  test("tie-breaks: first string start wins, then second string start") {
    // 'ab' and 'cd' both length 2; 'ab' starts earlier in s1
    assert(run("ab_cd", "cd.ab") ===
      org.apache.spark.sql.Row(2, 1, 4, "ab"))
    // same s1 start impossible for distinct runs; same CONTENT at two
    // s2 positions -> smallest s2 occurrence reported
    assert(run("xyz", "abxyzcdxyz") ===
      org.apache.spark.sql.Row(3, 1, 3, "xyz"))
  }

  test("degenerate inputs") {
    assert(run("abc", "xyz") === org.apache.spark.sql.Row(0, 0, 0, ""))
    assert(run("", "abc") === org.apache.spark.sql.Row(0, 0, 0, ""))
    val s = spark
    import s.implicits._
    val r = Seq((Option.empty[String], Option("xab")))
      .toDF("a", "b")
      .select(LcsSubstring.lcsSubstring(col("a"), col("b")).as("r"))
      .head()
    assert(r.isNullAt(0))
  }

  test("SQL registration and codegen parity with interpreted eval") {
    val viaSql = spark.sql(
      "SELECT lcs_substring('thisisatest', 'testing123testing') AS r")
      .select("r.match_length", "r.common").head()
    assert(viaSql === org.apache.spark.sql.Row(4, "test"))
  }
}
