package graft.sources

import org.apache.spark.sql.types._
import graft.SparkSpec

/** Year-sectioned config parsing + the NULL-padding year combine. */
class TableConfigSpec extends SparkSpec {

  private val yaml = """
# comment
table: stage.demo
partition_by: yr
vars:
    id: BIGINT
    amt: NUMERIC(10,2)
table_2014:
    file_path: //share/file_2014.txt
    row_count: 123
    vars_2014:
        old_flag: VARCHAR(1)
table_2015:
    vars_2015:
        new_code: VARCHAR(8)
        old_flag: VARCHAR(1)
table_2016:
"""

  test("parse: base vars, year sections, per-year extras, metadata skipped") {
    val cfg = TableConfig.parse(yaml)
    assert(cfg.table === "stage.demo")
    assert(cfg.vars === Seq("id" -> "BIGINT", "amt" -> "NUMERIC(10,2)"))
    assert(cfg.yearSections === Seq(
      TableConfig.YearSection(2014, Seq("old_flag" -> "VARCHAR(1)")),
      TableConfig.YearSection(2015,
        Seq("new_code" -> "VARCHAR(8)", "old_flag" -> "VARCHAR(1)")),
      TableConfig.YearSection(2016, Seq.empty)))
    assert(cfg.yearSchema(2014).fieldNames.toSeq ===
      Seq("id", "amt", "old_flag"))
    assert(cfg.yearSchema(2016).fieldNames.toSeq === Seq("id", "amt"))
    // union list in declaration order, first declaration wins
    assert(cfg.combinedSchema.fieldNames.toSeq ===
      Seq("id", "amt", "old_flag", "new_code"))
    assert(cfg.combinedSchema("new_code").dataType === StringType)
  }

  test("combineYears NULL-pads per-year missing columns, rejects undeclared") {
    val s = spark
    import s.implicits._
    val cfg = TableConfig.parse(yaml)
    val f14 = Seq((1L, 5.0, "Y")).toDF("id", "amt", "old_flag")
    val f16 = Seq((2L, 9.0)).toDF("id", "amt")
    val out = TableConfig.combineYears(cfg, Seq(2014 -> f14, 2016 -> f16))
    assert(out.columns.toSeq === Seq("id", "amt", "old_flag", "new_code"))
    val rows = out.collect().map(r => (r.getLong(0), r.getDecimal(1).toString,
      r.getString(2), r.getString(3))).toSet
    assert(rows === Set((1L, "5.00", "Y", null), (2L, "9.00", null, null)))
    val bad = Seq((3L, 1.0, "oops")).toDF("id", "amt", "mystery")
    val e = intercept[IllegalArgumentException] {
      TableConfig.combineYears(cfg, Seq(2016 -> bad))
    }
    assert(e.getMessage.contains("mystery"))
  }
}
