package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** YAML-declared table schemas — the reference drives every load from ~392
  * YAML configs whose `vars:` map declares column -> SQL-type
  * (load_stage.mcaid_claim_header.yaml:22-76, parsed at
  * claims_db/db_loader/scripts_general/load_table.R:126-147 and turned into
  * DDL by create_table.R).
  *
  * Here: the same YAML shape parsed (hand-rolled — the config subset is
  * flat scalars + one indented map, no YAML lib needed in this sandbox)
  * into a declared `StructType`. Schemas are FIXED, never inferred
  * (SURVEY §1.4) — CSV loads read with this schema, writes validate
  * against it.
  */
case class TableConfig(
    table: String,
    vars: Seq[(String, String)],
    partitionBy: Seq[String]) {

  /** T-SQL declared type -> Spark type (SURVEY §1.2 mapping). */
  def schema: StructType = StructType(vars.map { case (name, sqlType) =>
    StructField(name, TableConfig.sparkType(sqlType))
  })
}

object TableConfig {

  def sparkType(sqlType: String): DataType = {
    val t = sqlType.trim.toUpperCase
    val decimalRe = """(?:NUMERIC|DECIMAL)\s*\(\s*(\d+)\s*,\s*(\d+)\s*\)""".r
    t match {
      case s if s.startsWith("VARCHAR") || s.startsWith("CHAR") => StringType
      case "BIGINT" => LongType
      case "INT" | "INTEGER" => IntegerType
      case "SMALLINT" => ShortType
      case "TINYINT" => ByteType
      case "DATE" => DateType
      case "DATETIME" | "DATETIME2" | "TIMESTAMP" => TimestampType
      case "FLOAT" | "REAL" | "DOUBLE" => DoubleType
      case decimalRe(p, s) => DecimalType(p.toInt, s.toInt)
      case s if s.startsWith("TIME") => StringType // no native TIME (§1.2)
      case "BIT" | "BOOLEAN" => BooleanType
      case other => throw new IllegalArgumentException(s"unmapped SQL type: $other")
    }
  }

  /** Parse the reference's config shape:
    * {{{
    * table: stage.orders
    * partition_by: yr
    * vars:
    *     o_orderkey: BIGINT
    *     o_orderdate: DATE
    * }}}
    */
  def parse(yaml: String): TableConfig = {
    var table = ""
    var partitionBy = Seq.empty[String]
    val vars = Seq.newBuilder[(String, String)]
    var inVars = false
    yaml.linesIterator.foreach { raw =>
      val line = raw.replaceAll("#.*$", "")
      if (line.trim.nonEmpty) {
        val indented = line.startsWith(" ") || line.startsWith("\t")
        if (!indented) {
          inVars = false
          line.split(":", 2) match {
            case Array(k, v) => k.trim match {
              case "table" => table = v.trim
              case "partition_by" =>
                partitionBy = v.trim.split(",").map(_.trim).filter(_.nonEmpty).toSeq
              case "vars" => inVars = true
              case _ => () // ignore unknown top-level keys (index, schema, ...)
            }
            case _ => ()
          }
        } else if (inVars) {
          line.split(":", 2) match {
            case Array(k, v) => vars += ((k.trim, v.trim))
            case _ => ()
          }
        }
      }
    }
    TableConfig(table, vars.result(), partitionBy)
  }

  /** Create-table shell (create_table.R): an empty frame carrying the
    * declared schema — the catalog registration point for a lake table. */
  def emptyFrame(spark: SparkSession, cfg: TableConfig): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row], cfg.schema)
}
