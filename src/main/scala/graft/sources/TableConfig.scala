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
    partitionBy: Seq[String],
    yearSections: Seq[TableConfig.YearSection] = Seq.empty) {

  /** T-SQL declared type -> Spark type (SURVEY §1.2 mapping). */
  def schema: StructType = StructType(vars.map { case (name, sqlType) =>
    StructField(name, TableConfig.sparkType(sqlType))
  })

  /** One calendar-year table's declared schema: base vars + that year's
    * extra columns (load_table.R:290-324 loads `table_YYYY` sections into
    * per-year tables named `<table>_<YYYY>`). */
  def yearSchema(year: Int): StructType = {
    val extra = yearSections.find(_.year == year)
      .map(_.extraVars).getOrElse(Seq.empty)
    StructType((vars ++ extra).map { case (n, t) =>
      StructField(n, TableConfig.sparkType(t))
    })
  }

  /** The combined table's schema: base vars then every year's extras in
    * declaration order, first declaration wins (load_table.R:396-416 NULL-
    * pads each year's SELECT to this union column list). */
  def combinedSchema: StructType = {
    val seen = scala.collection.mutable.LinkedHashMap.empty[String, String]
    (vars ++ yearSections.flatMap(_.extraVars)).foreach { case (n, t) =>
      if (!seen.contains(n)) seen(n) = t
    }
    StructType(seen.toSeq.map { case (n, t) =>
      StructField(n, TableConfig.sparkType(t))
    })
  }
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

  /** Extra columns one calendar-year source carries beyond the base vars
    * (`table_YYYY:` / nested `vars_YYYY:` sections,
    * load_table_from_file_config_template.yaml:19-34). */
  case class YearSection(year: Int, extraVars: Seq[(String, String)])

  private val yearSectionRe = """table_(\d{4})""".r
  private val yearVarsRe = """vars_(\d+)""".r

  /** Parse the reference's config shape, including per-year sections:
    * {{{
    * table: stage.orders
    * partition_by: yr
    * vars:
    *     o_orderkey: BIGINT
    *     o_orderdate: DATE
    * table_2014:
    *     file_path: ignored.txt
    *     vars_2014:
    *         legacy_flag: VARCHAR(1)
    * table_2015:
    * }}}
    * Per-year metadata other than the vars_YYYY map (file_path, row_count,
    * date_min/max, ...) is load-harness detail and is skipped. */
  def parse(yaml: String): TableConfig = {
    var table = ""
    var partitionBy = Seq.empty[String]
    val vars = Seq.newBuilder[(String, String)]
    var inVars = false
    var curYear: Option[Int] = None
    var inYearVars = false
    var yearVarsIndent = 0
    val years = scala.collection.mutable.LinkedHashMap
      .empty[Int, scala.collection.mutable.ArrayBuffer[(String, String)]]
    yaml.linesIterator.foreach { raw =>
      val line = raw.replaceAll("#.*$", "").replace("\t", "    ")
      if (line.trim.nonEmpty) {
        val indent = line.takeWhile(_ == ' ').length
        if (indent == 0) {
          inVars = false; curYear = None; inYearVars = false
          line.split(":", 2) match {
            case Array(k, _) => k.trim match {
              case "table" => table = line.split(":", 2)(1).trim
              case "partition_by" => partitionBy = line.split(":", 2)(1)
                .trim.split(",").map(_.trim).filter(_.nonEmpty).toSeq
              case "vars" => inVars = true
              case yearSectionRe(y) =>
                curYear = Some(y.toInt)
                years.getOrElseUpdate(y.toInt,
                  scala.collection.mutable.ArrayBuffer.empty)
              case _ => () // ignore unknown top-level keys (index, schema, ...)
            }
            case _ => ()
          }
        } else if (inVars) {
          line.split(":", 2) match {
            case Array(k, v) => vars += ((k.trim, v.trim))
            case _ => ()
          }
        } else if (curYear.isDefined) {
          line.split(":", 2) match {
            case Array(k, v) => k.trim match {
              // the vars_YYYY digits must match the enclosing table_YYYY
              // section — a misplaced vars_2015 under table_2014 would
              // otherwise be silently attributed to 2014
              case yearVarsRe(y) if y.toInt == curYear.get =>
                inYearVars = true; yearVarsIndent = indent
              case yearVarsRe(y) =>
                throw new IllegalArgumentException(
                  s"vars_$y found inside table_${curYear.get} section")
              case _ if inYearVars && indent > yearVarsIndent =>
                years(curYear.get) += ((k.trim, v.trim))
              case _ => inYearVars = false // other per-year metadata
            }
            case _ => ()
          }
        }
      }
    }
    TableConfig(table, vars.result(), partitionBy,
      years.toSeq.map { case (y, ex) => YearSection(y, ex.toSeq) })
  }

  /** Combine per-year frames into the declared combined table
    * (load_table.R:390-440): each year's frame is cast to its declared
    * per-year schema, projected to the combined column list with typed
    * NULLs for columns that year lacks, and UNION ALL'ed (the reference
    * INSERT-SELECTs each year — no dedup, no provenance tag). */
  def combineYears(cfg: TableConfig,
      frames: Seq[(Int, DataFrame)]): DataFrame = {
    require(frames.nonEmpty, "at least one year frame")
    val combined = cfg.combinedSchema
    val normed = frames.map { case (year, df) =>
      val declared = cfg.yearSchema(year)
      val declaredNames = declared.fieldNames.toSet
      val missing = df.columns.filterNot(declaredNames)
      require(missing.isEmpty,
        s"year $year frame has undeclared columns: ${missing.mkString(",")}")
      val present = df.columns.toSet
      df.select(combined.fields.toSeq.map { f =>
        if (present(f.name))
          org.apache.spark.sql.functions.col(f.name).cast(f.dataType).as(f.name)
        else
          org.apache.spark.sql.functions.lit(null).cast(f.dataType).as(f.name)
      }: _*)
    }
    normed.reduce(_.unionByName(_))
  }

  /** Create-table shell (create_table.R): an empty frame carrying the
    * declared schema — the catalog registration point for a lake table. */
  def emptyFrame(spark: SparkSession, cfg: TableConfig): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row], cfg.schema)
}
