package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Parameter-driven predicate assembly — the Spark form of the reference's
  * optional-param -> SQL-fragment compiler (R/claims_elig.R:441-523,
  * :682-688, :1195-1277): each Option-typed parameter contributes a Column
  * predicate or nothing; the conjunction filters the frame.
  *
  * All predicates stay declarative Columns, so Catalyst pushes them to the
  * parquet scan (PushedFilters) — the manual "innermost subquery pre-filter"
  * tuning in the reference is free here.
  */
object Predicates {

  def eqOpt(c: String, v: Option[Any]): Option[Column] = v.map(col(c) === lit(_))

  /** Case-insensitive IN (claims_elig.R:462-465). */
  def inOptCI(c: String, vs: Option[Seq[String]]): Option[Column] =
    vs.filter(_.nonEmpty).map(x => lower(col(c)).isin(x.map(_.toLowerCase): _*))

  def inOpt(c: String, vs: Option[Seq[Any]]): Option[Column] =
    vs.filter(_.nonEmpty).map(x => col(c).isin(x: _*))

  def geOpt(c: String, v: Option[Any]): Option[Column] = v.map(col(c) >= lit(_))
  def leOpt(c: String, v: Option[Any]): Option[Column] = v.map(col(c) <= lit(_))

  /** Char-class pattern (load_stage.mcaid_claim_header.R:242,285). */
  def rlikeOpt(c: String, pattern: Option[String]): Option[Column] =
    pattern.map(col(c).rlike(_))

  /** Conjunction of whatever predicates are present; no-op when none. */
  def and(preds: Option[Column]*): Column =
    preds.flatten.reduceOption(_ && _).getOrElse(lit(true))

  def applyAll(df: DataFrame, preds: Option[Column]*): DataFrame =
    df.filter(and(preds: _*))
}
