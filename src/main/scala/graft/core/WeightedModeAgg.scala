package graft.core

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Single-shuffle weighted mode: the typed `Aggregator` formulation SURVEY
  * §2.10 sketches (UDAF surface), complementing the two-step
  * groupBy+window in [[WeightedMode]].
  *
  * The buffer is the per-value weight tally, merged map-side, so the plan
  * is ONE partial-aggregatable shuffle keyed on the entity — no second
  * exchange for a window pass. The buffer is bounded by the attribute's
  * domain size: right for the reference's timevar attributes (gender, race,
  * language, RAC codes — small code sets), wrong for unbounded-cardinality
  * values, where the two-step form's (id, value) shuffle is safer.
  *
  * Tie-break matches [[WeightedMode.weightedMode]]: max summed weight,
  * then ascending value.
  */
object WeightedModeAgg {

  // NOT private: codegen'd projections instantiate this from generated
  // classes; a private constructor forces the interpreted fallback
  case class In(value: String, weight: Double)

  private object Agg extends Aggregator[In, Map[String, Double], String] {
    override def zero: Map[String, Double] = Map.empty

    override def reduce(b: Map[String, Double], a: In): Map[String, Double] =
      if (a.value == null) b
      else b.updated(a.value, b.getOrElse(a.value, 0.0) + a.weight)

    override def merge(a: Map[String, Double], b: Map[String, Double]): Map[String, Double] =
      if (a.size >= b.size) b.foldLeft(a) { case (m, (k, v)) =>
        m.updated(k, m.getOrElse(k, 0.0) + v)
      }
      else merge(b, a)

    override def finish(b: Map[String, Double]): String =
      if (b.isEmpty) null
      else b.minBy { case (v, w) => (-w, v) }._1

    override def bufferEncoder: Encoder[Map[String, Double]] =
      implicitly(org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Double]]())

    override def outputEncoder: Encoder[String] = Encoders.STRING
  }

  private lazy val wmUdaf =
    udaf(Agg, org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[In]())

  /** Drop-in for [[WeightedMode.weightedMode]] when the value domain is
    * bounded: same output, one shuffle. */
  def weightedMode(df: DataFrame, ids: Seq[String], value: String,
      weight: String, outName: String): DataFrame =
    df.filter(col(value).isNotNull)
      .groupBy(ids.map(col): _*)
      .agg(wmUdaf(col(value).cast("string"), col(weight).cast("double"))
        .as(outName))

  /** ALL attributes in one exchange: one UDAF column per attribute inside a
    * single groupBy(id) — vs the melt formulation's three exchanges
    * (group, rank window, pivot) and the reference's ~20 self-joins.
    * Null values don't contribute (the tally skips them), matching the
    * melt's isNotNull filter; an all-null attribute yields null (the melt
    * omits the row entirely — equivalent through the left joins every
    * caller uses). Trade: the double tally loses the melt's exact-decimal
    * order-independent tie ranking, so [[graft.api.ClaimsElig]] stays on
    * the melt; prefer this form when weights are integral (coverage days)
    * or near-ties are not load-bearing. */
  def weightedModes(df: DataFrame, ids: Seq[String], values: Seq[String],
      weight: String): DataFrame = {
    val aggs = values.map(v =>
      wmUdaf(col(v).cast("string"), col(weight).cast("double")).as(v))
    df.groupBy(ids.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }
}
