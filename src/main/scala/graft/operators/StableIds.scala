package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Stable pseudonymous ID assignment with prior-assignment preservation
  * (dugan_p1_export/mcaid_data_prep.sql:44-66): partner exports cannot
  * ship the real member id, so each extract carries a surrogate id_uw;
  * re-running the extract must KEEP every previously assigned surrogate
  * and number only the new people. The reference's kernel is
  *
  * {{{
  *   CASE WHEN prior.id_uw IS NOT NULL THEN prior.id_uw
  *        ELSE ROW_NUMBER() OVER (ORDER BY prior.id_uw DESC, id) END
  * }}}
  *
  * — prior-id rows sort first (DESC puts NULLs last in T-SQL), so a new
  * person's row number equals (#current people with a prior id) + their
  * rank among the newcomers. Faithfully kept, including the documented
  * assumption: the scheme only avoids surrogate reuse while the prior
  * population is a subset of the current one (the reference's comment);
  * if prior people drop out, a newcomer's number can collide with a
  * surviving low surrogate. Callers re-running windows that shrink
  * should check the reference's own duplicate probes (emitted by
  * [[surrogateProbes]]).
  *
  * Scale: a global ROW_NUMBER is a single-partition sort at 100 TB, so
  * the newcomer numbering runs as range-repartition + in-partition sort
  * + `zipWithIndex` (per-partition counts fold into offsets — one extra
  * job over newcomer PARTITION SIZES, no driver data collect, no
  * unpartitioned window). The kept-count offset rides a 1-row broadcast
  * cross join.
  */
object StableIds {

  /** @param current frame carrying `idCol` (any grain — distinct'd)
    * @param prior   (idCol, surrogateCol) from the previous run; pass an
    *                empty frame for the first assignment
    * @return one row per distinct current id: (idCol, surrogateCol) */
  def assign(current: DataFrame, idCol: String, prior: DataFrame,
      surrogateCol: String = "id_uw"): DataFrame = {
    val spark = current.sparkSession
    val cur = current.select(idCol).distinct()
    val j = cur.join(
      prior.select(col(idCol), col(surrogateCol).cast("long")
        .as("_prior")), Seq(idCol), "left")
    val kept = j.filter(col("_prior").isNotNull)
    val newbies = j.filter(col("_prior").isNull).select(idCol)
    val nKept = kept.agg(count(lit(1)).as("_n"))
    val sorted = newbies.repartitionByRange(col(idCol))
      .sortWithinPartitions(col(idCol))
    val schema = sorted.schema.add("_idx", LongType)
    val indexed = spark.createDataFrame(
      sorted.rdd.zipWithIndex.map { case (r, i) =>
        Row.fromSeq(r.toSeq :+ i) }, schema)
    val numbered = indexed.crossJoin(broadcast(nKept))
      .select(col(idCol),
        (col("_idx") + 1L + col("_n")).as(surrogateCol))
    kept.select(col(idCol), col("_prior").as(surrogateCol))
      .unionByName(numbered)
  }

  /** The reference's two post-assignment QA probes
    * (mcaid_data_prep.sql:68-83): surrogates mapped to more than one
    * row, and surrogates mapped to more than one real id. */
  def surrogateProbes(assigned: DataFrame, idCol: String,
      surrogateCol: String = "id_uw"): DataFrame = {
    val g = assigned.groupBy(col(surrogateCol))
      .agg(count(lit(1)).as("row_count"),
        countDistinct(col(idCol)).as("id_dcount"))
    g.agg(
      sum(when(col("row_count") > 1, 1L).otherwise(0L))
        .as("dup_row_surrogates"),
      sum(when(col("id_dcount") > 1, 1L).otherwise(0L))
        .as("dup_id_surrogates"))
  }
}
