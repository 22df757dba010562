package graft.clif

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.SparkSpec

class PipelinesSpec extends SparkSpec {
  import spark.implicits._

  // epoch seconds for fixture times
  private val T0 = 1700000000L

  test("vitals: vocab join, BP split to sbp/dbp rows, unmatched dropped") {
    val raw = Seq(
      (101L, 1L, T0, "BLOOD PRESSURE", "120/80", "arm"),
      (101L, 1L, T0 + 60, "PULSE", "72", null),
      (101L, 1L, T0 + 120, "SOME UNMAPPED ROW", "9", null)
    ).toDF("C19_PATIENT_ID", "C19_HAR_ID", "recorded_time", "flo_meas_name",
      "meas_value", "meas_site_name")
    val out = Pipelines.vitals(raw, Vocabularies.vitalsVocab(spark))
    val rows = out.select("vital_name", "vital_value")
      .as[(String, String)].collect().toSet
    assert(rows == Set(("sbp", "120"), ("dbp", "80"), ("pulse", "72")))
    assert(out.schema("recorded_time").dataType.typeName == "timestamp")
  }

  test("respSupport: pivot, device classify, lpm clean, fio2 coalesce, fill") {
    val raw = Seq(
      (1L, 10L, T0, "RT RS OXYGEN DEVICE", "Nasal Cannula"),
      (1L, 10L, T0, "RT RS OXYGEN FLOW", "9"),         // capped to 6 for NC
      (1L, 10L, T0 + 3600, "RT RS VENT FIO2", "40"),   // device filled from T0
      (1L, 10L, T0 + 7200, "RT RS OXYGEN DEVICE", "Vent"),
      (1L, 10L, T0 + 7200, "RT RS CONVENTIONAL VENT MODES", "SIMV")
    ).toDF("C19_PATIENT_ID", "C19_HAR_ID", "recorded_time", "flo_meas_name",
      "meas_value")
    val out = Pipelines.respSupport(raw, Vocabularies.ventModeVocab(spark))
      .filter(col("C19_PATIENT_ID").isNotNull) // vocab-only rows excluded
      .orderBy("recorded_time")
    val rows = out.select("device_name", "lpm", "fio2", "mode_name",
      "mode_category").collect()
    assert(rows(0) == Row("Nasal Cannula", 6.0, null, "SIMV", "simv"))
    // middle row: device LOCF'd from first, fio2 = 40/100
    assert(rows(1).getAs[String]("device_name") == "Nasal Cannula")
    assert(rows(1).getAs[Double]("fio2") == 0.4)
    assert(rows(2) == Row("Vent", null, null, "SIMV", "simv"))
  }

  test("labs: vocab join renames, duplicates dropped, epochs converted") {
    val raw = Seq(
      (1L, 10L, 3191L, "HEMOGLOBIN", "CBC W DIFF", T0, T0 + 600, "12.1",
        "11.5-15.5", "g/dL", "numeric"),
      (1L, 10L, 3191L, "HEMOGLOBIN", "CBC W DIFF", T0, T0 + 600, "12.1",
        "11.5-15.5", "g/dL", "numeric"), // exact dup
      (1L, 10L, 999L, "UNMAPPED LAB", "PANEL", T0, T0 + 600, "5", null,
        null, "numeric")
    ).toDF("C19_PATIENT_ID", "C19_HAR_ID", "component_id", "component_name",
      "proc_name", "order_time", "result_time", "ord_value",
      "reference_value", "reference_unit", "lab_type_name")
    val out = Pipelines.labs(raw, Vocabularies.labsVocab(spark))
    assert(out.count() == 1)
    val r = out.collect()(0)
    assert(r.getAs[String]("lab_name") == "hemoglobin")
    assert(r.getAs[String]("lab_group") == "CBC")
    assert(r.getAs[String]("lab_value") == "12.1")
  }

  test("adt: numeric-id guard and dept/room classification") {
    val raw = Seq(
      ("101", "11", "2024-01-01 10:00:00", "2024-01-02 10:00:00", "T6IC SOMETHING", "D410"),
      ("102", "12", "2024-01-01 11:00:00", null, "N08E WARD", "3021"),
      ("abc", "13", "2024-01-01 12:00:00", null, "ED CCD", "OTFA"), // dropped id
      ("104", "14", null, null, "ED CCD", "OTFA")                  // dropped time
    ).toDF("C19_PATIENT_ID", "C19_HAR_ID", "in_time", "out_time",
      "adt_department_name", "adt_room_nm_wid")
    val out = Pipelines.adt(raw).orderBy("C19_PATIENT_ID")
    val rows = out.select("dept_name", "room_name").collect()
    assert(out.count() == 2)
    assert(rows(0) == Row("ICU", "ICU"))   // T6IC dept, D410 icu room
    assert(rows(1) == Row("Ward", "Ward")) // N08E ward, 3021 ward room
  }

  test("vocab sheets load in full: 43+3 vitals names, 30 lab components") {
    val vv = Vocabularies.vitalsVocab(spark)
    assert(vv.count() == 46)
    assert(vv.select("vital_name").distinct().as[String].collect().toSet ==
      Set("blood_pressure", "temperature", "pulse", "respirations", "spo2",
        "map", "weight", "height"))
    // a name the round-1 inline subset missed now maps
    assert(vv.filter(col("flo_meas_name") === "NUR RS ARTERIAL BLOOD PRESSURE")
      .select("vital_name").as[String].head() == "blood_pressure")
    val lv = Vocabularies.labsVocab(spark)
    assert(lv.count() == 30)
    assert(lv.filter(col("component_name") === "GLUCOSE, SER/PLASMA")
      .select("lab_name").as[String].head() == "glucose_serum")
    assert(lv.filter(col("component_name") === "ALT (SGPT)")
      .select("lab_group").as[String].head() == "LFT")
    assert(Vocabularies.labsAnalytes(spark).count() == 44)
  }

  test("adt: epoch-seconds timestamps (the reference extract shape) parse") {
    // RCLIF_adt.Rmd:88-89 — as.POSIXct(in_time, origin="1970-01-01")
    val raw = Seq(
      ("101", "11", "1583020800", "1583107200", "T6IC", "D410"),
      ("102", "12", "1583020800.5", null, "N08E", "3021")
    ).toDF("C19_PATIENT_ID", "C19_HAR_ID", "in_time", "out_time",
      "adt_department_name", "adt_room_nm_wid")
    val out = Pipelines.adt(raw).orderBy("C19_PATIENT_ID")
    assert(out.count() == 2) // epoch rows survive the in_ts null guard
    val r = out.select("start_time", "end_time").collect()
    assert(r(0).getTimestamp(0).getTime == 1583020800000L)
    assert(r(0).getTimestamp(1).getTime == 1583107200000L)
    assert(r(1).getTimestamp(0).getTime == 1583020800500L)
  }

  test("scores: GCS rows filtered and renamed; sofaNeuro bands") {
    val raw = Seq(
      (1L, 10L, T0, "NUR RA GLASGOW ADULT SCORING", "14"),
      (1L, 10L, T0, "PULSE", "70")
    ).toDF("C19_PATIENT_ID", "C19_HAR_ID", "recorded_time", "flo_meas_name",
      "meas_value")
    val out = Pipelines.scores(raw)
    assert(out.count() == 1)
    assert(out.select("score_name").as[String].head() ==
      "NUR RA GLASGOW ADULT SCORING")
    val bands = Seq("3", "8", "11", "14", "15", "oops").toDF("g")
      .select(Vocabularies.sofaNeuro(col("g")).as("s"))
      .as[Option[Int]].collect()
    assert(bands.toSeq == Seq(Some(4), Some(3), Some(2), Some(1), Some(0), None))
  }

  test("scoresSofa: GCS pivoted wide, total banded at the 5/9/12/14/15 edges") {
    val gcs = "NUR RA GLASGOW ADULT SCORING"
    val motor = "NUR RA GLASGOW ADULT BEST MOTOR RESPONSE"
    val raw = Seq(
      (1L, 10L, "1583020800", gcs, "5"),    // <6  -> 4
      (1L, 10L, "1583020800", motor, "3"),  // same timestamp, other component
      (1L, 10L, "1583024400", gcs, "9"),    // <10 -> 3
      (2L, 20L, "1583020800", gcs, "12"),   // <13 -> 2
      (2L, 20L, "1583024400", gcs, "14"),   // <15 -> 1
      (3L, 30L, "1583020800", gcs, "15"),   // ==15 -> 0
      (3L, 30L, "1583024400", motor, "6")   // no total -> null sofa
    ).toDF("C19_PATIENT_ID", "C19_HAR_ID", "recorded_time", "flo_meas_name",
      "meas_value")
    val out = Pipelines.scoresSofa(raw)
      .orderBy("C19_PATIENT_ID", "score_time")
    assert(out.columns.toSeq == Seq("C19_PATIENT_ID", "C19_HAR_ID",
      "score_time", "gcs_total", "gcs_motor", "gcs_eye", "gcs_verbal",
      "sofa_neuro"))
    val rows = out.select("sofa_neuro").as[Option[Int]].collect().toSeq
    assert(rows == Seq(Some(4), Some(3), Some(2), Some(1), Some(0), None))
    // components land in their own columns, not extra rows
    val first = out.filter(col("C19_PATIENT_ID") === 1L &&
      col("gcs_motor").isNotNull).select("gcs_total", "gcs_motor")
      .as[(String, String)].head()
    assert(first == ("5", "3"))
  }

  test("medications: vocab regex match on first two words, continuous only") {
    val admin = Seq(
      (1L, 10L, 7L, "NOREPINEPHRINE 8MG/250ML", "IV CONTINUOUS", T0, T0, T0 + 600,
        "5 mcg/min", "", "IV", "x", "x", "x", "x", "x", "x"),
      (1L, 10L, 8L, "ASPIRIN EC 81MG TAB", "DAILY", T0, T0, T0 + 600,
        "81 mg", "mg", "PO", "x", "x", "x", "x", "x", "x")
    ).toDF("C19_PATIENT_ID", "C19_HAR_ID", "medication_id", "medication_name",
      "order_med_freq", "take_med_dttm", "order_start_time", "order_end_time",
      "take_med_dose", "dose_units", "med_route", "prescript_sig",
      "prescript_quantity", "prescript_refills", "mar_action",
      "ordering_mode", "rxnorm_code")
    val mapped = Pipelines.matchContinuousMeds(admin, Vocabularies.medsVocab(spark))
    assert(mapped.select("medication_name").as[String].collect().toSeq ==
      Seq("NOREPINEPHRINE 8MG/250ML"))
    assert(mapped.select("med_category").as[String].head() == "vasoactives")

    val medOut = Seq(
      (1L, 10L, 7L, T0, T0 + 600, "NOREPINEPHRINE 8MG/250ML", "IV", "1")
    ).toDF("C19_PATIENT_ID", "C19_HAR_ID", "MED_ID", "ORDER_START_TIME",
      "ORDER_END_TIME", "MEDICATION", "MED_ROUTE", "QUANTITY")
    val medOutSub = Pipelines.medOutSubset(medOut)

    val cont = Pipelines.medicationAdminContinuous(admin, medOutSub, mapped)
    assert(cont.count() == 1)
    val r = cont.collect()(0)
    assert(r.getAs[String]("med_name") == "norepinephrine")
    assert(r.getAs[String]("med_category") == "vasoactives")
    assert(r.getAs[String]("med_dose") == "5")
    assert(r.getAs[String]("med_dose_unit") == "mcg/min")
    assert(r.getAs[String]("med_route") == "IV")
  }

  test("patientDemographics: race/ethnicity harmonization, race-null gate") {
    val demo = Seq(
      (1L, T0, "F", "Other Asian", "Puerto Rican"),
      (2L, T0, "M", null, "Hispanic or Latino"), // race null -> both null
      (3L, T0, "F", "Martian", "Hispanic or Latino")
    ).toDF("C19_PATIENT_ID", "birth_date", "sex", "race", "ethnic")
    val out = Pipelines.patientDemographics(demo).orderBy("C19_PATIENT_ID")
      .select("race", "ethnicity").collect()
    assert(out(0) == Row("Asian", "Unknown"))
    assert(out(1) == Row(null, null))
    assert(out(2) == Row("Other", "Hispanic"))
  }

  test("encounterDemographicsDispo: age at admission + disposition") {
    val enc = Seq((1L, 10L, "hb", T0, T0 + 86400L),
      (1L, 11L, "pb", T0, T0 + 86400L)).toDF(
      "C19_PATIENT_ID", "C19_HAR_ID", "record_type", "adm_date", "disc_date")
    val demo = Seq((1L, 946684800L, "F", "White", "x")) // born 2000-01-01
      .toDF("C19_PATIENT_ID", "birth_date", "sex", "race", "ethnic")
    val dispo = Seq((1L, 10L, "hb", "Expired"),
      (1L, 11L, "hb", "Hospice - Home")).toDF(
      "C19_PATIENT_ID", "C19_HAR_ID", "record_type", "discharge_dispo")
    val out = Pipelines.encounterDemographicsDispo(dispo, enc, demo)
      .orderBy("C19_HAR_ID").collect()
    assert(out(0).getAs[Int]("age_at_admission") == 23) // 2000->2023-11
    assert(out(0).getAs[String]("disposition") == "Dead")
    // encounter 11 is pb in enc -> age null, dispo still classified
    assert(out(1).getAs[String]("disposition") == "Hospice")
    assert(out(1).isNullAt(out(1).fieldIndex("age_at_admission")))
  }

  test("disposition: keep-last per patient, hashed ids, classification") {
    val raw = Seq(
      (1L, 10L, "hb", "Expired"),
      (1L, 11L, "hb", "Left without being seen"), // last by ENC order -> kept
      (2L, 20L, "hb", "Discharged/transferred to a Weird Place"),
      (3L, 30L, "pb", "Expired") // non-hb dropped
    ).toDF("C19_PATIENT_ID", "C19_HAR_ID", "record_type", "discharge_dispo")
    val out = Pipelines.disposition(raw)
    assert(out.count() == 2)
    val names = out.select("disposition_name").as[String].collect().toSet
    assert(names == Set("Home", "Discharged to another facility"))
    // ids are pseudonymized
    assert(out.select("patient_ID").as[String].collect().forall(_.length == 64))
  }

  test("dialysis: crrt hour-episodes, intermittent lead-stop, peritoneal") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val flowIo = Seq(
      // crrt: two hourly docs for enc 1
      (1L, "CRRT DIALYSIS ROW", "Actual Fluid Removed (mL)", ts("2024-01-01 10:00:00"), "100"),
      (1L, "CRRT DIALYSIS ROW", "Fluid Delivered (L/Hr)", ts("2024-01-01 10:00:00"), "2"),
      (1L, "CRRT DIALYSIS ROW", "Actual Fluid Removed (mL)", ts("2024-01-01 11:00:00"), "110"),
      // intermittent: machine then loss for enc 2
      (2L, "HD DIALYSIS ROW", "Machine Number", ts("2024-01-02 08:00:00"), "M1"),
      (2L, "HD DIALYSIS ROW", "aUltra Filtration Net Loss", ts("2024-01-02 12:00:00"), "1500"),
      // peritoneal: fill then total ultra for enc 3
      (3L, "PD DIALYSIS ROW", "Fill Volume", ts("2024-01-03 09:00:00"), "2000"),
      (3L, "PD DIALYSIS ROW", "Total Ultrafiltration", ts("2024-01-03 15:00:00"), "800"),
      // non-dialysis row ignored
      (4L, "URINE OUTPUT", "Urine", ts("2024-01-04 09:00:00"), "300")
    ).toDF("C19_HAR_ID", "flo_meas_name", "flo_group_name", "recorded_time",
      "meas_value")
    val out = DialysisPipeline.build(flowIo)
    val byType = out.groupBy("dialysis_type").count()
      .as[(String, Long)].collect().toMap
    assert(byType == Map("crrt" -> 2L, "intermittent" -> 1L, "peritoneal" -> 1L))

    val crrt = out.filter(col("dialysis_type") === "crrt")
      .orderBy("stop_time").collect()
    assert(crrt(0).getAs[java.sql.Timestamp]("start_time") ==
      ts("2024-01-01 09:00:00"))
    assert(crrt(0).getAs[String]("ultrafiltration_amount") == "100")
    assert(crrt(0).getAs[String]("dialysate_flow_amount") == "2")
    assert(crrt(1).getAs[String]("dialysate_flow_amount") == null)

    val hd = out.filter(col("dialysis_type") === "intermittent").collect()(0)
    assert(hd.getAs[java.sql.Timestamp]("start_time") == ts("2024-01-02 08:00:00"))
    assert(hd.getAs[java.sql.Timestamp]("stop_time") == ts("2024-01-02 12:00:00"))
    assert(hd.getAs[String]("ultrafiltration_amount") == "1500")

    val pd = out.filter(col("dialysis_type") === "peritoneal").collect()(0)
    assert(pd.getAs[java.sql.Timestamp]("start_time") == ts("2024-01-03 09:00:00"))
    assert(pd.getAs[String]("ultrafiltration_amount") == "800")
  }

  test("blocked dataset capstone: hourly grid spans the encounter, " +
    "LOCF carries the latest observation, channels go stale past " +
    "their tolerance, rolling mean follows the grid, the label and " +
    "split attach per encounter, dedup keeps the last tiebreak") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      // encounter 7: four observations over 5.5 hours, one 'error'
      (1L, ts("2024-01-01 00:30:00"), 7L, "click", 10.0),
      (2L, ts("2024-01-01 00:45:00"), 7L, "signup", 2.0),
      (3L, ts("2024-01-01 03:10:00"), 7L, "purchase", 100.0),
      (4L, ts("2024-01-01 05:30:00"), 7L, "error", 0.0),
      // encounter 2: two same-(enc, ts) rows — keep-last wins
      (5L, ts("2024-02-01 10:00:00"), 2L, "click", 5.0),
      (6L, ts("2024-02-01 10:00:00"), 2L, "click", 7.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = BlockedDataset.build(ev, "user_id", "ts", "event_type",
      "value", "event_id",
      channels = Seq(
        BlockedDataset.Channel("click", "vital_value", 7200L),
        BlockedDataset.Channel("purchase", "lab_value", 86400L)),
      stepSeconds = 3600L, outcome = col("event_type") === "error",
      rollRows = 4, trainPct = 80, valPct = 10)
    val got = out.select("user_id", "grid_ts", "last_value",
        "vital_value", "lab_value", "roll_avg", "label", "split")
      .as[(Long, java.sql.Timestamp, Option[Double], Option[Double],
        Option[Double], Option[Double], Long, String)]
      .collect().sortBy(r => (r._1, r._2.getTime)).toList
    // encounter 2: one grid hour; dedup kept event_id 6 (v = 7)
    assert(got.head ==
      ((2L, ts("2024-02-01 10:00:00"), Some(7.0), Some(7.0), None,
        Some(7.0), 0L, "train")), got.head.toString)
    // encounter 7: grid 00:00..05:00 — LOCF, staleness, rolling
    val e7 = got.tail
    assert(e7.map(_._2) == (0 to 5).map(h =>
      ts(f"2024-01-01 0$h%d:00:00")).toList)
    assert(e7.map(_._3) == List(None, Some(2.0), Some(2.0), Some(2.0),
      Some(100.0), Some(100.0)))               // whole-stream LOCF
    assert(e7.map(_._4) == List(None, Some(10.0), Some(10.0), None,
      None, None))       // click goes stale after 2h (age 9000s at 03)
    assert(e7.map(_._5) == List(None, None, None, None, Some(100.0),
      Some(100.0)))      // purchase lands at 03:10, fresh for 24h
    assert(e7.map(_._6) == List(None, Some(2.0), Some(2.0), Some(2.0),
      Some(26.5), Some(51.0)))                 // trailing-4 grid mean
    assert(e7.forall(r => r._7 == 1L && r._8 == "train"))
  }

  test("blocked dataset runs on the REAL CLIF shape: vitals pipeline " +
    "output feeds build() with C19_HAR_ID encounters, vital_name " +
    "channels, and a vitals-derived outcome — the reference README's " +
    "artifact end to end, raw extract to feature matrix") {
    // raw flowsheet extract -> Pipelines.vitals (vocab join, BP split,
    // epoch normalize) -> the capstone assembler
    val raw = Seq(
      (1L, 10L, T0, "BLOOD PRESSURE", "120/80", "arm"),
      (1L, 10L, T0 + 1800, "PULSE", "72", null),
      (1L, 10L, T0 + 5400, "BLOOD PRESSURE", "85/60", "arm"),
      (1L, 10L, T0 + 7200, "PULSE", "80", null),
      (2L, 20L, T0, "PULSE", "60", null)
    ).toDF("C19_PATIENT_ID", "C19_HAR_ID", "recorded_time",
      "flo_meas_name", "meas_value", "meas_site_name")
    val vitals = Pipelines.vitals(raw, Vocabularies.vitalsVocab(spark))
      .withColumn("v", col("vital_value").cast("double"))
    val out = BlockedDataset.build(vitals,
      encCol = "C19_HAR_ID", tsCol = "recorded_time",
      channelCol = "vital_name", valueCol = "v",
      tiebreak = "vital_value",
      channels = Seq(
        BlockedDataset.Channel("sbp", "sbp", 7200L),
        BlockedDataset.Channel("pulse", "pulse", 7200L)),
      stepSeconds = 3600L,
      // hypotensive-ever as the encounter outcome stand-in
      outcome = col("vital_name") === "sbp" && col("v") < 90,
      rollRows = 2, trainPct = 80, valPct = 10)
    val got = out.select(col("C19_HAR_ID"), col("sbp"), col("pulse"),
        col("label"), col("grid_ts").cast("long").as("gt"))
      .as[(Long, Option[Double], Option[Double], Long, Long)]
      .collect().sortBy(r => (r._1, r._5)).toList
      .map(r => (r._1, r._2, r._3, r._4))
    // encounter 10: T0 is 22:13:20 UTC, so the grid is 22:00 (before
    // any reading — all null), 23:00 (BP 120/80 + pulse 72 carried),
    // 00:00 (the 23:43 hypotensive 85/60 carried; pulse still 72);
    // the sbp<90 reading labels EVERY hour of the encounter
    val e10 = got.filter(_._1 == 10L)
    assert(e10.map(_._2) == List(None, Some(120.0), Some(85.0)),
      got.toString)
    assert(e10.map(_._3) == List(None, Some(72.0), Some(72.0)))
    assert(e10.forall(_._4 == 1L))
    // encounter 20: pulse only, never hypotensive -> label 0
    val e20 = got.filter(_._1 == 20L)
    assert(e20.nonEmpty && e20.forall(r => r._4 == 0L && r._2.isEmpty))
  }

  test("blocked dataset at CLIF-realistic WIDTH: 15 channels carry " +
    "independently in one LOCF window pass — per-channel values, " +
    "per-channel staleness, and a Window-operator count that does " +
    "NOT grow with channel count (the one-window-pass design claim)") {
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
    val h0 = 1700000000L / 3600L * 3600L // exactly on the hour
    // channel ci observed once, i minutes into hour 0; c0 gets a
    // 1-hour tolerance so it must go stale by hour 2 while the other
    // 14 stay fresh; a tail event extends the grid to hour 2
    val ev = ((0 to 14).map(i =>
      (i.toLong, ts(h0 + i * 60L), 1L, s"c$i", i * 10.0)) :+
      ((99L, ts(h0 + 7200L), 1L, "tail", 999.0))
    ).toDF("event_id", "ts", "user_id", "chan", "value")
    val channels = (0 to 14).map(i => BlockedDataset.Channel(s"c$i",
      s"f$i", toleranceSeconds = if (i == 0) 3600L else 86400L))
    val out = BlockedDataset.build(ev, "user_id", "ts", "chan",
      "value", "event_id", channels, stepSeconds = 3600L,
      outcome = col("chan") === "tail", rollRows = 4,
      trainPct = 80, valPct = 10)
    val got = out.orderBy("grid_ts").collect()
    assert(got.length == 3) // hours 0, 1, 2
    def f(r: org.apache.spark.sql.Row, i: Int): Option[Double] =
      Option(r.getAs[java.lang.Double](s"f$i")).map(_.doubleValue())
    // hour 0 (grid ts == h0): only c0's on-the-hour observation
    // matches its own hour (the as-of >= convention)
    assert((0 to 14).map(f(got(0), _)) ==
      Some(0.0) +: (1 to 14).map(_ => None))
    // hour 1: every channel carried, each with ITS OWN value
    assert((0 to 14).map(f(got(1), _)) == (0 to 14).map(i =>
      Some(i * 10.0)))
    // hour 2: c0 aged 7200s > 3600s tolerance -> stale null; the
    // other 14 (86400s tolerance) still carried
    assert((0 to 14).map(f(got(2), _)) ==
      None +: (1 to 14).map(i => Some(i * 10.0)))
    assert(got.forall(_.getAs[Long]("label") == 1L))
    // the design claim: ALL per-channel LOCF `last` expressions share
    // ONE window spec, so Catalyst plans them into a single Window
    // operator — channel count widens the projection, never adds a
    // grid-sized exchange+sort pass. Compare against a 2-channel
    // build: the LOCF Window count must be IDENTICAL.
    def locfWindows(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.optimizedPlan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window
            if w.windowExpressions.exists(_.toString.contains("last(")) => w
      }.size
    val narrow = BlockedDataset.build(ev, "user_id", "ts", "chan",
      "value", "event_id", channels.take(2), stepSeconds = 3600L,
      outcome = col("chan") === "tail", rollRows = 4,
      trainPct = 80, valPct = 10)
    assert(locfWindows(out) == locfWindows(narrow),
      s"LOCF window passes grew with channel count: " +
        s"${locfWindows(out)} at 15 channels vs " +
        s"${locfWindows(narrow)} at 2")
    assert(locfWindows(out) == 1,
      s"expected ONE LOCF window pass, got ${locfWindows(out)}")
  }

  test("sofaHourly: reference GCS banding per hour on the micro-exact " +
    "analog, declared resp/renal bands, stale organ scores NULL " +
    "(never 0), composite sums PRESENT organs with honest n_organs") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      // micros(0.000005) % 13 = 5 → gcs 8 → sofa_neuro 3
      (1L, ts("2024-01-01 00:30:00"), 7L, "click", 0.000005),
      (2L, ts("2024-01-01 00:40:00"), 7L, "view", 450.0), // resp 4
      (3L, ts("2024-01-01 00:45:00"), 7L, "purchase", 120.0), // renal 1
      // micros 12 → gcs 15 → the g = 15 arm → sofa_neuro 0
      (4L, ts("2024-01-01 03:30:00"), 7L, "click", 0.000012),
      (5L, ts("2024-01-01 04:30:00"), 7L, "signup", 1.0) // extends t1
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val bd = BlockedDataset.build(ev, "user_id", "ts", "event_type",
      "value", "event_id",
      channels = Seq(
        BlockedDataset.Channel("click", "neuro_vital", 7200L),
        BlockedDataset.Channel("view", "resp_vital", 7200L),
        BlockedDataset.Channel("purchase", "renal_lab", 86400L)),
      stepSeconds = 3600L, outcome = col("event_type") === "error",
      rollRows = 4, trainPct = 80, valPct = 10)
    val got = Pipelines.sofaHourly(bd,
        "neuro_vital", "resp_vital", "renal_lab")
      .select("grid_ts", "sofa_neuro", "sofa_resp", "sofa_renal",
        "n_organs", "sofa_total", "label")
      .as[(java.sql.Timestamp, Option[Int], Option[Int], Option[Int],
        Int, Option[Int], Long)]
      .collect().sortBy(_._1.getTime).toList
    assert(got.map(_._1) == (0 to 4).map(h =>
      ts(f"2024-01-01 0$h%d:00:00")).toList)
    // hour 0: nothing observed yet → every organ missing, total NULL
    assert(got(0) == ((ts("2024-01-01 00:00:00"),
      None, None, None, 0, None, 0L)), got(0).toString)
    // hours 1-2: all three fresh → 3 + 4 + 1 across 3 organs
    assert(got(1)._2 == Some(3) && got(1)._3 == Some(4) &&
      got(1)._4 == Some(1) && got(1)._5 == 3 &&
      got(1)._6 == Some(8), got(1).toString)
    assert(got(2) == got(1).copy(_1 = ts("2024-01-01 02:00:00")))
    // hour 3: neuro (age 9000 s) and resp (8400 s) stale past 7200 →
    // NULL, not 0; renal alone carries the composite
    assert(got(3) == ((ts("2024-01-01 03:00:00"),
      None, None, Some(1), 1, Some(1), 0L)), got(3).toString)
    // hour 4: the 03:30 click is fresh — gcs 15 bands to 0, which
    // still COUNTS as a measured organ (n_organs 2, total 0 + 1)
    assert(got(4) == ((ts("2024-01-01 04:00:00"),
      Some(0), None, Some(1), 2, Some(1), 0L)), got(4).toString)
  }

  test("medicationOrders: 5-key join resolves duplicate end column") {
    val orders = Seq(
      (1L, 10L, 7L, T0, T0 + 99L, "DRUG X", "DAILY", "5", "mg")
    ).toDF("C19_PATIENT_ID", "C19_HAR_ID", "medication_id", "order_start_time",
      "order_end_time", "medication_name", "order_med_freq", "dose", "dose_units")
    val medOut = Seq(
      (1L, 10L, 7L, T0, T0 + 77L, "DRUG X", "PO", "30")
    ).toDF("C19_PATIENT_ID", "C19_HAR_ID", "MED_ID", "ORDER_START_TIME",
      "ORDER_END_TIME", "MEDICATION", "MED_ROUTE", "QUANTITY")
    val out = Pipelines.medicationOrders(orders, Pipelines.medOutSubset(medOut))
    val r = out.collect()(0)
    assert(r.getAs[java.sql.Timestamp]("order_end_dttm").getTime / 1000 ==
      T0 + 99L) // orders side kept
    assert(r.getAs[String]("med_route") == "PO")        // med_out side joined
    assert(r.getAs[String]("med_name") == "DRUG X")
  }
}
