package graft.builds

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** mcare elig_demo — person-level Medicare demographics
  * (load_stage.mcare_elig_demo.R):
  *
  *  - most-recent dob / death date (latest enrollment year, :20-56);
  *  - King-County-ever from any year's ZIP (:58-70);
  *  - sex: ever flags over valid codes (non-null, != '0'), the
  *    multiple-endorsed gender_me recode, latest-year gender_recent
  *    (:72-118, ResDAC sex_ident_cd);
  *  - race/ethnicity from rti_race_cd (codes '0' unknown and '3' Other
  *    are excluded everywhere, :120-131): ever flags (1 White, 2 Black,
  *    4 Asian/PI, 5 Latino, 6 AI/AN), multiple-endorsed race_eth_me /
  *    race_me (the latter ignores Latino), latest-year race_eth_recent /
  *    race_recent (the latter excludes '5'), and the unknown flags
  *    (:133-210).
  *
  * The reference builds ~10 temp tables (one rank CTE chain per
  * variable) and re-joins them on the person id — 6 scans of
  * bene_enrollment and 5 joins. Here every reduction is a conditional
  * aggregate over ONE scan and ONE shuffle on the person id: "most
  * recent" is max(struct(year, value)) (deterministic lexicographic
  * tie-break where the reference's rank() would fan out tied years —
  * the one deliberate deviation, since the reference's own QA asserts
  * one row per person), and a person with no valid rows for a variable
  * gets NULL, exactly like the reference's left joins.
  *
  * Persons absent from a variable's valid subset keep NULL through the
  * CASE recodes: every branch condition is null-false and there is no
  * otherwise, mirroring the missing-left-join-row semantics.
  */
object McareEligDemo {

  /** @param bene year-grain enrollment: `id_mcare, year, dob, death_dt,
    *   sex_cd, rti_race_cd, zip_cd` */
  def build(bene: DataFrame, kcZips: Seq[String]): DataFrame = {
    val validSex = col("sex_cd").isNotNull && col("sex_cd") =!= "0"
    val validRace = col("rti_race_cd").isNotNull &&
      !col("rti_race_cd").isin("0", "3")
    def raceFlag(code: String) =
      max(when(col("rti_race_cd") === code, 1).when(validRace, 0))
    val agg = bene.groupBy(col("id_mcare")).agg(
      max(when(col("dob").isNotNull, struct(col("year"), col("dob"))))
        .as("_dob"),
      max(when(col("death_dt").isNotNull,
        struct(col("year"), col("death_dt")))).as("_dod"),
      max(when(substring(col("zip_cd"), 1, 5).isin(kcZips: _*), 1))
        .as("geo_kc_ever"),
      max(when(col("sex_cd") === "1", 1).when(validSex, 0))
        .as("gender_male"),
      max(when(col("sex_cd") === "2", 1).when(validSex, 0))
        .as("gender_female"),
      max(when(validSex, struct(col("year"), col("sex_cd")))).as("_sex"),
      raceFlag("1").as("race_white"),
      raceFlag("2").as("race_black"),
      raceFlag("4").as("race_asian_pi"),
      raceFlag("5").as("race_latino"),
      raceFlag("6").as("race_aian"),
      max(when(validRace, struct(col("year"), col("rti_race_cd"))))
        .as("_reth"),
      max(when(validRace && col("rti_race_cd") =!= "5",
        struct(col("year"), col("rti_race_cd")))).as("_race"))

    val ethSum = col("race_white") + col("race_black") +
      col("race_asian_pi") + col("race_latino") + col("race_aian")
    val rSum = col("race_white") + col("race_black") +
      col("race_asian_pi") + col("race_aian")
    def raceMe(sum: Column, withLatino: Boolean) = {
      val base = when(sum > 1, "Multiple")
        .when(col("race_white") === 1, "White")
        .when(col("race_black") === 1, "Black")
        .when(col("race_asian_pi") === 1, "Asian/PI")
      val mid = if (withLatino)
        base.when(col("race_latino") === 1, "Latino") else base
      mid.when(col("race_aian") === 1, "AI/AN")
        .when(sum === 0, "Unknown")
    }
    def recentLabel(code: Column, withLatino: Boolean) = {
      val base = when(code === "1", "White")
        .when(code === "2", "Black").when(code === "4", "Asian/PI")
      val mid = if (withLatino)
        base.when(code === "5", "Latino") else base
      mid.when(code === "6", "AI/AN")
        .when(code.isNotNull, "Unknown")
    }
    agg.select(
      col("id_mcare"),
      col("_dob").getField("dob").as("dob"),
      col("_dod").getField("death_dt").as("death_dt"),
      col("geo_kc_ever"),
      when(col("gender_male") === 1 && col("gender_female") === 1,
        "Multiple")
        .when(col("gender_female") === 1, "Female")
        .when(col("gender_male") === 1, "Male")
        .when(col("gender_male").isNotNull, "Unknown").as("gender_me"),
      when(col("_sex").getField("sex_cd") === "1", "Male")
        .when(col("_sex").getField("sex_cd") === "2", "Female")
        .when(col("_sex").isNotNull, "Unknown").as("gender_recent"),
      col("gender_female"), col("gender_male"),
      raceMe(rSum, withLatino = false).as("race_me"),
      raceMe(ethSum, withLatino = true).as("race_eth_me"),
      recentLabel(col("_race").getField("rti_race_cd"),
        withLatino = false).as("race_recent"),
      recentLabel(col("_reth").getField("rti_race_cd"),
        withLatino = true).as("race_eth_recent"),
      col("race_aian"), col("race_asian_pi"), col("race_black"),
      col("race_latino"), col("race_white"),
      when(rSum === 0, 1).when(rSum.isNotNull, 0).as("race_unk"),
      when(ethSum === 0, 1).when(ethSum.isNotNull, 0).as("race_eth_unk"))
  }
}
