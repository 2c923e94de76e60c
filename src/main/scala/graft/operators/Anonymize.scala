package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** k-anonymity generalization ladder — the de-identification audit
  * behind exports like the reference's UW study extract (which ships
  * single-year age instead of dob and ZIP instead of address): given a
  * ladder of increasingly coarse quasi-identifier encodings
  * (zip5+birth-year -> zip3 -> decade -> suppressed), find the minimal
  * FULL-DOMAIN level where at most a suppression budget of records sit
  * in groups smaller than k — those groups would be suppressed, the
  * rest are k-anonymous.
  *
  * Scale shape: every level's grouping runs in ONE shuffle — each record
  * explodes into (level, generalized-key) rows and a single
  * groupBy(level, key) counts them; per-level stats reduce from the
  * group frame (levels x groups rows, tiny), and the chosen level is a
  * 1-row broadcast min. Integer arithmetic throughout (the budget is
  * floor(n * num / den)).
  */
object Anonymize {

  /** @param levels  (name, generalized quasi-identifier expressions) in
    *                coarsening order — index order IS the ladder order
    * @param k       anonymity parameter
    * @param budget  suppression budget as (num, den): floor(n*num/den)
    * @return one row per level: level_idx, level_name, n_groups,
    *         n_violating (records in groups < k), satisfies, chosen */
  def ladderStats(df: DataFrame, levels: Seq[(String, Seq[Column])],
      k: Int, budget: (Int, Int) = (1, 20)): DataFrame = {
    // Length-prefixed encoding (not bare concat_ws): NULL gets its own
    // token and values containing the delimiter can't collide with a
    // column boundary, so distinct quasi-identifier tuples never
    // collapse into one group (which would overstate k-anonymity).
    def enc(c: Column): Column = {
      val s = c.cast("string")
      when(s.isNull, lit("∅"))
        .otherwise(concat(length(s).cast("string"), lit(":"), s))
    }
    val lvlStructs = levels.zipWithIndex.map { case ((_, cols), i) =>
      struct(lit(i).as("lvl"),
        concat_ws("|", cols.map(enc): _*).as("key"))
    }
    val exploded = df.select(explode(array(lvlStructs: _*)).as("g"))
      .select(col("g.lvl").as("lvl"), col("g.key").as("key"))
    val groups = exploded.groupBy(col("lvl"), col("key"))
      .agg(count(lit(1)).as("c"))
    val perLevel = groups.groupBy(col("lvl"))
      .agg(count(lit(1)).as("n_groups"),
        sum(when(col("c") < k, col("c")).otherwise(0L))
          .as("n_violating"),
        sum(col("c")).as("_n"))
      .withColumn("satisfies",
        col("n_violating") <= expr(s"(_n * ${budget._1}) div ${budget._2}"))
    val chosen = perLevel
      .agg(min(when(col("satisfies"), col("lvl"))).as("_chosen"))
    val names = levels.zipWithIndex
      .map { case ((n, _), i) => (i, n) }
      .foldLeft(lit(null).cast("string")) { case (els, (i, n)) =>
        when(col("lvl") === i, n).otherwise(els) }
    perLevel.crossJoin(broadcast(chosen))
      .select(col("lvl").as("level_idx"), names.as("level_name"),
        col("n_groups"), col("n_violating"), col("satisfies"),
        coalesce(col("lvl") === col("_chosen"), lit(false)).as("chosen"))
  }
}
