package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** AS-OF join — "the latest right-side version at or before each left
  * event's time, per key": the operator behind point-in-time enrichment
  * (enrollment status at service date, price at trade time) that Spark
  * lacks natively and engines like kdb/Flink treat as first-class.
  *
  * The naive plan (range join + per-event argmax) explodes to
  * |events| x |versions-per-key| rows before pruning. This kernel is
  * the MERGE-SORTED formulation instead: both sides union into one
  * stream, ONE hash shuffle on the key, ONE in-partition sort on
  * (time, side, tiebreak) — right rows sort before left rows at equal
  * times, so "at or before" is inclusive — and a running
  * `last(ignoreNulls)` carries each version's payload forward to the
  * events that follow it. Cost: one shuffle + one sort over
  * |left| + |right| rows, zero row expansion, whatever the version
  * frequency — the optimal distributed as-of.
  *
  * Ties inside one side are broken by `tieCol` ascending (the LAST in
  * sort order wins), making the match total and engine-reproducible.
  * Events with no prior version keep NULL payloads.
  *
  * The payload rides as ONE struct through a single
  * `last(ignoreNulls)`, so every carried field comes from the SAME
  * version row — a NULL field in the latest version stays NULL instead
  * of inheriting that column from an older version (the bug the
  * per-column formulation has).
  */
object AsOf {

  /** @param left     events: keyCol, lTimeCol + any payload
    * @param right    versions: keyCol, rTimeCol, tieCol, `valueCols`
    * @param valueCols right-side payload columns to carry onto events
    * @return left's rows + matched `valueCols` (NULL if no version at
    *         or before the event) */
  def joinLatest(left: DataFrame, right: DataFrame, keyCol: String,
      lTimeCol: String, rTimeCol: String, tieCol: String,
      valueCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val payType = right.select(struct(valueCols.map(col): _*).as("_pay"))
      .schema("_pay").dataType
    val r = right.select(
      Seq(col(keyCol), col(rTimeCol).as("_t"), lit(0).as("_side"),
        col(tieCol).cast("long").as("_tie"),
        struct(valueCols.map(col): _*).as("_pay")) ++
        leftCols.filterNot(_ == keyCol)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val l = left.select(
      Seq(col(keyCol), col(lTimeCol).as("_t"), lit(1).as("_side"),
        lit(Long.MaxValue).as("_tie"),
        lit(null).cast(payType).as("_pay")) ++
        leftCols.filterNot(_ == keyCol).map(col): _*)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("_t"), col("_side"), col("_tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = r.unionByName(l)
      .select(Seq(col(keyCol), col("_side")) ++
        leftCols.filterNot(_ == keyCol).map(col) :+
        last(col("_pay"), ignoreNulls = true).over(w).as("_pay"): _*)
    carried.filter(col("_side") === 1)
      .select(Seq(col(keyCol)) ++
        leftCols.filterNot(_ == keyCol).map(col) ++
        valueCols.map(c => col(s"_pay.$c").as(c)): _*)
  }
}
