package graft.clif

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** CLIF limited-vocabulary dimensions and classification tables, expressed
  * as data (SURVEY.md §2 F9 tables; FIXTURES.md §2).
  *
  * The reference ships these as small Excel sheets joined against raw
  * names (`code/RCLIF_vitals.Rmd:33,93`, `code/RCLIF_labs.Rmd:38`,
  * `code/RCLIF_medications.Rmd:94`) plus inline case_when blocks. Here
  * every mapping is a Scala value: broadcast-join the frame versions,
  * fold the predicate versions into `when` chains — all codegen-friendly,
  * nothing hardcoded inside pipeline logic.
  */
object Vocabularies {

  /** Respiratory-support flowsheet rows widened into columns
    * (`code/RCLIF_vitals.Rmd:97-106`): raw name -> contract column. */
  val respSupportColumns: Seq[(String, String)] = Seq(
    "RT RS OXYGEN DEVICE" -> "o2_device",
    "RT RS VENT FIO2" -> "vent_fio2",
    "RT RS FIO2" -> "fio2_raw",
    "RT RS NI FIO2" -> "ni_fio2",
    "RT RS OXYGEN FLOW" -> "oxygen_flow",
    "RT RS VENT PRESSURES PEEP/CPAP" -> "peep",
    "RT RS VENT VOLUMES VT SET" -> "set_volume",
    "RT RS VENT PRESSURE PRESSURE SUPPORT" -> "pressure_support",
    "RT RS CONVENTIONAL VENT MODES" -> "mode_name",
    "RT RS RESP RATE SET" -> "set_resp_rate")

  /** GCS score flowsheet names (`code/RCLIF_scores.Rmd:42-46`). */
  val gcsScoreNames: Seq[String] = Seq(
    "NUR RA GLASGOW ADULT SCORING",
    "NUR RA GLASGOW ADULT BEST MOTOR RESPONSE",
    "NUR RA GLASGOW ADULT EYE OPENING",
    "NUR RA GLASGOW ADULT VERBAL RESPONSE")

  /** O2 device classification, first-match-wins
    * (`code/RCLIF_vitals.Rmd:125-135`): substring pattern -> device. */
  val deviceClassification: Seq[(String, String)] = Seq(
    "Vent" -> "Vent",
    "Bipap" -> "NIPPV",
    "CPAP" -> "NIPPV",
    "High Flow NC" -> "High Flow NC",
    "Mask" -> "Face Mask",
    "Trach Collar" -> "Trach Collar",
    "Cannula" -> "Nasal Cannula",
    "Room Air" -> "Room Air")

  /** Device classify column: null o2_device -> null; no match -> Other. */
  def classifyDevice(o2Device: Column): Column = {
    val chain = deviceClassification.foldRight(lit("Other"): Column) {
      case ((pat, name), acc) => when(o2Device.contains(pat), name).otherwise(acc)
    }
    when(o2Device.isNull, lit(null)).otherwise(chain)
  }

  /** lpm cleaning (`code/RCLIF_vitals.Rmd:139-149`): physiologic bounds per
    * device, first-match-wins. */
  def cleanLpm(lpm: Column, device: Column): Column =
    when(lpm < 0, lit(null))
      .when(device.isin("Room Air", "Vent", "Bipap", "CPAP", "Trach Collar"),
        lit(null))
      .when(device === "Nasal Cannula" && lpm > 6, lit(6.0))
      .when(device === "High Flow" && lpm > 60, lit(60.0))
      .when(lpm > 60, lit(null))
      .otherwise(lpm)

  /** Race harmonization (`code/RCLIF_demographics.Rmd:55-67`). */
  val raceRecode: Map[String, String] = Map(
    "Black or African-American" -> "Black or African-American",
    "White" -> "White",
    "American Indian or Alaska Native" -> "American Indian or Alaska Native",
    "Asian Indian" -> "Asian",
    "Asian/Mideast Indian" -> "Asian",
    "Other Asian" -> "Asian",
    "Native Hawaiian" -> "Native Hawaiian or Other Pacific Islander",
    "Native Hawaiian/Other Pacific Islander" ->
      "Native Hawaiian or Other Pacific Islander",
    "Other Pacific Islander" -> "Native Hawaiian or Other Pacific Islander",
    "Patient declines to respond" -> "Unknown",
    "Unknown or Patient unable to respond" -> "Unknown")

  /** Ethnicity harmonization (`code/RCLIF_demographics.Rmd:68-76`); no
    * catch-all in the reference -> unmatched stays null. */
  val ethnicityRecode: Map[String, String] = Map(
    "Hispanic or Latino" -> "Hispanic",
    "Mexican, Mexican American, or Chicano/a" -> "Hispanic",
    "Not Hispanic, Latino/a, or Spanish origin" -> "Not Hispanic",
    "Other Hispanic, Latino/a, or Spanish origin" -> "Not Hispanic",
    "Patient declines to respond" -> "Unknown",
    "Puerto Rican" -> "Unknown",
    "Unknown or Patient unable to respond" -> "Unknown")

  /** Disposition category sets (`code/RCLIF_demographics.Rmd:127-140`,
    * `code/RCLIF_disposition.Rmd:53-70`). */
  val homeCategories: Seq[String] = Seq(
    "Discharged/transferred to Home Under Care of Organized Home Health Service Org",
    "Discharged to Home or Self Care (Routine Discharge)",
    "Left Against Medical Advice or Discontinued Care",
    "Left before treatment complete",
    "Left without being seen")
  val deathCategories: Seq[String] = Seq("Expired")
  val hospiceCategories: Seq[String] = Seq(
    "Hospice - Home",
    "Hospice - Medical Facility (Certified) Providing Hospice Level of Care")
  val admittedCategories: Seq[String] = Seq(
    "Admitted as an Inpatient to this Hospital", "Still Patient")

  /** Disposition classify, first-match-wins incl. the prefix rule. */
  def classifyDisposition(dispo: Column): Column =
    when(dispo.isin(deathCategories: _*), "Dead")
      .when(dispo.isin(hospiceCategories: _*), "Hospice")
      .when(dispo.isin(homeCategories: _*), "Home")
      .when(dispo.startsWith("Discharged/transferred to"),
        "Discharged to another facility")
      .when(dispo === "Disch/trans to Another Type of Health Care Inst not Defined Elsewhere in this List",
        "Discharged to another facility")
      .when(dispo.isin(admittedCategories: _*), "Admitted")
      .otherwise("Other")

  /** ADT department classification regexes (`code/RCLIF_adt.Rmd:34-58`).
    * The reference's R character classes like `[E/W]` literally include
    * '/'; the translation keeps them byte-for-byte (Java classes allow the
    * same members), preserving semantics including that quirk. */
  val wardDeptPatterns: Seq[String] = Seq(
    "^N08S", "^N0[8-9][E/W]", "^N03[N/S/W]", "^N04[N/S/W]", "^N10[E/W]",
    "^T[3-6][N/S][E/W]", "^T3NO")
  val icuDeptPatterns: Seq[String] = Seq(
    "^D[2-6]IC", "^(N08N|N09N|N09S)", "^N08S", "^N03[E/B]", "^N04E",
    "^N10[N/S]", "^T6IC", "ICU")
  val orDeptPatterns: Seq[String] = Seq("CD MAIN OR|DCAM MAIN OR|COMER MAIN OR")
  val erDeptPatterns: Seq[String] = Seq("ED CCD|ER COMER|BIER|ER MITCHELL")

  /** ADT room classification regexes (`code/RCLIF_adt.Rmd:60-87`). */
  val wardRoomPatterns: Seq[String] = Seq(
    "^(0|8|9)(0)[0-9][0-9]", "^100(3[3-9]|4[0-4])", "^100(7[7-9]|80)",
    "^100*",
    "^30(0[1-9]|1[0-9]|2[0-9]|3[0-9]|4[0-7]|6[3-9]|7[0-9]|8[0-4])",
    "^34(8[1-6])", "^35(2[1-5]|3[1-6])",
    "^40(0[2-9]|1[0-9]|2[0-9]|3[0-9]|4[0-3]|7[2-9]|8[0-4])",
    "^44(8[1-6])", "^45(2[1-5]|3[1-6])", "^80(7[7-9]|8[0-8])",
    "^T[N/S][3-6][0-9][0-9]")
  val icuRoomPatterns: Seq[String] = Seq(
    "^100(3[3-9]|4[0-4])", "^100(7[7-9]|80)", "^30(4[8-9]|5[0-9]|6[0-7])",
    "^40(4[4-9]|5[0-9]|6[0-9]|7[0-1])", "^80(3[3-9]|4[0-4])",
    "^80(7[7-9]|8[0-8])", "^90(3[3-9]|4[0-4]|7[7-9]|8[0-8])",
    "^D[2-6][0-2][0-9]", "^TS6[0-2][0-9]")
  val erRoomExact: Seq[String] = Seq("OTFA", "OTFP")
  val erRoomPatterns: Seq[String] = Seq(
    "^[N/E/S/W][0-3][0-9] ", "\\bEXAM\\b|\\bTRAUMA\\b")

  private def anyMatch(c: Column, pats: Seq[String]): Column =
    pats.map(p => c.rlike(p)).reduce(_ || _)

  /** Department -> Ward/ICU/OR/ER; no match -> null (reference has no
    * catch-all here). */
  def classifyDepartment(dept: Column): Column =
    when(anyMatch(dept, wardDeptPatterns), "Ward")
      .when(anyMatch(dept, icuDeptPatterns.dropRight(1)) ||
        dept.contains("ICU"), "ICU")
      .when(anyMatch(dept, orDeptPatterns), "OR")
      .when(anyMatch(dept, erDeptPatterns), "ER")

  /** Room -> Ward/ICU/ER; no match -> null. */
  def classifyRoom(room: Column): Column =
    when(anyMatch(room, wardRoomPatterns), "Ward")
      .when(anyMatch(room, icuRoomPatterns), "ICU")
      .when(room.isin(erRoomExact: _*) || anyMatch(room, erRoomPatterns), "ER")

  /** SOFA neurologic banding from total GCS
    * (`code/RCLIF_scores.Rmd:86-92`). */
  def sofaNeuro(gcsTotal: Column): Column = {
    val g = gcsTotal.try_cast("double")
    when(g < 6, 4).when(g < 10, 3).when(g < 13, 2).when(g < 15, 1)
      .when(g === 15, 0)
  }

  /** Dialysis flo_group_name constants (`code/RCLIF_dialysis.Rmd`). */
  object DialysisGroups {
    val CrrtRemoved = "Actual Fluid Removed (mL)"
    val CrrtDelivered = "Fluid Delivered (L/Hr)"
    val IntUltraLoss = "aUltra Filtration Net Loss"
    val IntMachine = "Machine Number"
    val PeriTotalUltra = "Total Ultrafiltration"
    val PeriInitialDrain = "Initial Drain"
    val PeriFillVolume = "Fill Volume"
    val PeriManualExchange = "Manual Exchange (Output)"
  }

  /** Parse a classpath CSV resource through Spark's CSV reader (quoted
    * fields handled); vocab sheets ride the engine jar so every executor
    * resolves them without a side-channel file distribution. */
  private def csvResource(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val in = getClass.getResourceAsStream(path)
    require(in != null, s"missing vocab resource $path")
    val text =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    spark.read.option("header", "true")
      .csv(spark.createDataset(text.linesIterator.filter(_.nonEmpty).toSeq))
  }

  /** Vitals vocab: the FULL 43-name rendering of
    * `raw_data/vitals_flowsheet_names.xlsx` (flo_meas_name ->
    * vital_name, incl. the blood_pressure split trigger), plus three
    * site-extension names the sheet lacks. Deployments can swap the CSV
    * for their site's sheet. */
  def vitalsVocab(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val extensions = Seq(
      ("MAP (MM HG)", "map"),
      ("WEIGHT/SCALE", "weight"),
      ("HEIGHT", "height")
    ).toDF("flo_meas_name", "vital_name")
    csvResource(spark, "/graft/clif/vitals_flowsheet_names.csv")
      .unionByName(extensions)
  }

  /** Labs vocab: the FULL component-level rendering of
    * `rclif_data/lab_name_lab_group_units.xlsx` sheet2 (30 raw component
    * names -> lab_name, lab_group; `code/RCLIF_labs.Rmd:41-49` joins on
    * component_name). The canonical analyte dimension (sheet1, 44
    * analytes incl. units) ships alongside — [[labsAnalytes]]. */
  def labsVocab(spark: SparkSession): DataFrame =
    csvResource(spark, "/graft/clif/labs_component_map.csv")
      .select("component_name", "lab_name", "lab_group")

  /** Canonical analyte dimension: lab_name -> lab_group, reference
    * value/unit, lab_type_name (sheet1 of the labs vocab workbook). */
  def labsAnalytes(spark: SparkSession): DataFrame =
    csvResource(spark, "/graft/clif/labs_analytes.csv")

  /** Vent mode vocab (mode_name -> mode_category),
    * `code/RCLIF_vitals.Rmd:93,124`. */
  def ventModeVocab(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      ("SIMV", "simv"),
      ("AC/VC", "assist_control_volume_control"),
      ("AC/PC", "pressure_control"),
      ("PRVC", "pressure_regulated_volume_control"),
      ("PS", "pressure_support"),
      ("APRV", "aprv")
    ).toDF("mode_name", "mode_category")
  }

  /** Continuous meds vocab (med_name, med_category),
    * `code/RCLIF_medications.Rmd:94`. */
  def medsVocab(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      ("norepinephrine", "vasoactives"),
      ("epinephrine", "vasoactives"),
      ("vasopressin", "vasoactives"),
      ("phenylephrine", "vasoactives"),
      ("dopamine", "vasoactives"),
      ("propofol", "sedation"),
      ("dexmedetomidine", "sedation"),
      ("midazolam", "sedation"),
      ("fentanyl", "analgesia"),
      ("heparin", "anticoagulation"),
      ("insulin", "endocrine")
    ).toDF("med_name", "med_category")
  }
}
