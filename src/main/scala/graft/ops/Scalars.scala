package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar expression library (SURVEY.md §2.8 F1–F21).
  *
  * Every function here is a pure Column -> Column composition of built-ins,
  * so everything stays inside whole-stage codegen — no UDFs in the hot path.
  */
object Scalars {

  /** F14: epoch seconds (numeric or numeric-string) -> timestamp. */
  def epochToTs(c: Column): Column = timestamp_seconds(c.cast("double"))

  /** F15: timestamp -> the reference's sink string format. */
  def tsToString(c: Column): Column = date_format(c, "yyyy-MM-dd HH:mm:ss")

  /** F14/F16 flexible parse: epoch seconds FIRST (the reference extract's
    * shape — `as.POSIXct(x, origin="1970-01-01")`,
    * `code/RCLIF_adt.Rmd:88-89`), ISO datetime string fallback. A bare
    * numeric like "1583020800" parses as epoch; a non-numeric string
    * falls through to to_timestamp; unparseable stays null. */
  def flexibleTs(c: Column): Column =
    coalesce(epochToTs(c), to_timestamp(c))

  /** F18: whole-years age, calendar-aware (lubridate
    * `interval %/% years(1)`, `code/RCLIF_demographics.Rmd:118`). */
  def ageYears(birth: Column, at: Column): Column =
    floor(months_between(at, birth) / 12).cast("int")

  /** F20: R `as.numeric` — silent null on malformed input. try_cast keeps
    * the semantics even if the session ever runs ANSI-on. */
  def toNumeric(c: Column): Column = c.try_cast("double")

  /** P9: castability predicate (keep rows whose value parses numeric,
    * `code/RCLIF_adt.Rmd:33`). */
  def isNumeric(c: Column): Column = toNumeric(c).isNotNull

  /** F13: clamp into [lo, hi]. */
  def clamp(c: Column, lo: Double, hi: Double): Column =
    least(greatest(c, lit(lo)), lit(hi))

  /** F13 variant: cap above, null below zero (the reference's lpm
    * cleaning, `code/RCLIF_vitals.Rmd:139-149`). */
  def capOrNull(c: Column, cap: Double): Column =
    when(c < 0, lit(null)).otherwise(least(c, lit(cap)))

  /** F9: case_when from an ordered (predicate -> value) table; first match
    * wins, like dplyr. */
  def caseWhen(branches: Seq[(Column, Column)], default: Column): Column =
    branches.foldRight(default) { case ((p, v), acc) => when(p, v).otherwise(acc) }

  /** F9 lookup flavor: exact-match recode map with default. */
  def recode(c: Column, mapping: Map[String, String],
             default: Column): Column =
    caseWhen(mapping.toSeq.map { case (k, v) => (c === k, lit(v)) }, default)

  /** F3: first-two-words normalization
    * (`code/RCLIF_medications.Rmd:113`). */
  def firstWords(c: Column, n: Int): Column =
    array_join(slice(split(c, " "), 1, n), " ")

  /** F5: extract all digit-runs and collapse — the reference's dose-number
    * parse ("5 mg/hr" -> 5.0). */
  def extractNumber(c: Column): Column =
    array_join(regexp_extract_all(c, lit("[0-9.]+"), lit(0)), "").try_cast("double")

  /** F4/F6: strip digits, trim — dose unit ("5 mg/hr" -> "mg/hr"). */
  def stripNumber(c: Column): Column =
    trim(regexp_replace(c, "[0-9.]+", ""))

  /** F8: deterministic pseudonymization of an id
    * (`code/RCLIF_disposition.Rmd:88-91`; determinism, not digest-parity,
    * is the contract). */
  def hashId(c: Column): Column = sha2(c.cast("string"), 256)

  /** F10: priority coalesce. */
  def priorityPick(cs: Column*): Column = coalesce(cs: _*)

  /** F11: fallback when null OR empty string
    * (`code/RCLIF_medications.Rmd:138`). */
  def fallbackIfBlank(c: Column, fb: Column): Column =
    when(c.isNull || c === "", fb).otherwise(c)
}
