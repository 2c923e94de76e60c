package graft.builds

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Multi-source schema harmonization — the reference's mcare claim_header
  * union (load_stage.mcare_claim_header.R:85-404): nine differently-shaped
  * source files are each SELECTed into one declared schema (per-source
  * casts, absent columns NULL-filled, a provenance tag per file) and then
  * UNION-distinct'ed.
  *
  * Spark-first shape (SURVEY §7.5.5): per-source projection casts the
  * columns that exist to the declared type, `unionByName(allowMissing
  * Columns = true)` resolves the drift (absent columns become typed NULLs),
  * a final projection pins declared column order, and one DISTINCT
  * collapses exact duplicates. Because every present occurrence of a column
  * is cast to the declared type BEFORE the union, there is no cross-source
  * type conflict for the union resolver — int sources widen to bigint
  * targets, doubles to decimals, strings to dates, per declaration.
  *
  * Scale: per-source projections are scan-stage narrow ops; the only
  * shuffle is the final DISTINCT's partial-aggregated exchange on distinct
  * rows.
  */
object MultiSourceUnion {

  /** @param target     declared output schema (order and types are pinned)
    * @param sources    (provenance tag, frame) pairs; each frame carries
    *                   any subset of the target columns, any castable types
    * @param tagCol     name of the appended provenance column
    * @param allowExtra permit source columns outside the target schema
    *                   (dropped). Default REJECTS them: a misspelled
    *                   source column would otherwise be silently NULL-
    *                   filled instead of surfacing — the same strictness
    *                   TableConfig.combineYears applies.
    */
  def build(target: StructType, sources: Seq[(String, DataFrame)],
      tagCol: String = "filetype", allowExtra: Boolean = false): DataFrame = {
    require(sources.nonEmpty, "at least one source frame")
    val declared = target.fieldNames.toSet
    val normed = sources.map { case (tag, df) =>
      val extra = df.columns.filterNot(declared)
      require(allowExtra || extra.isEmpty,
        s"source '$tag' has undeclared columns: ${extra.mkString(",")} " +
          "(pass allowExtra = true to drop them)")
      val present = df.columns.toSet
      val kept = target.fields.toSeq.filter(f => present(f.name))
        .map(f => col(f.name).cast(f.dataType).as(f.name))
      df.select(kept: _*).withColumn(tagCol, lit(tag))
    }
    val unioned = normed.reduce(_.unionByName(_, allowMissingColumns = true))
    // a target column absent from EVERY source still needs to exist
    val complete = target.fields.foldLeft(unioned) { (df, f) =>
      if (df.columns.contains(f.name)) df
      else df.withColumn(f.name, lit(null).cast(f.dataType))
    }
    complete
      .select((target.fields.toSeq.map(f => col(f.name)) :+ col(tagCol)): _*)
      .distinct()
  }
}
