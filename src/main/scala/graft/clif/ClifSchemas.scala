package graft.clif

import org.apache.spark.sql.types._

/** The CLIF table contracts from the ERD
  * (`figures/RCLIF_ERD_09142023.pdf`) plus generating-code column sets
  * (FIXTURES.md §3). Fourteen have generating pipelines (incl. the
  * SOFA-neuro derivation, `RCLIF_scores.Rmd:86-92`); the other five
  * (patient_encounters, microbiology, procedures, ecmo_mcs, intake_output)
  * are ERD-only — modeled here so the engine can validate/ingest them.
  *
  * Types follow SURVEY.md §1.2: timestamps are TimestampType internally
  * (string-rendered only at CSV sinks), measurement values stay strings
  * (the reference's EAV convention), derived numerics are double/int.
  */
object ClifSchemas {

  private def s(name: String) = StructField(name, StringType)
  private def ts(name: String) = StructField(name, TimestampType)
  private def d(name: String) = StructField(name, DoubleType)
  private def i(name: String) = StructField(name, IntegerType)
  private def l(name: String) = StructField(name, LongType)

  val vitals: StructType = StructType(Seq(
    l("C19_PATIENT_ID"), l("C19_HAR_ID"), ts("recorded_time"),
    s("vital_name"), s("vital_value"), s("meas_site_name")))

  val respiratorySupport: StructType = StructType(Seq(
    l("C19_PATIENT_ID"), l("C19_HAR_ID"), ts("recorded_time"),
    s("device_name"), s("mode_name"), s("mode_category"), s("set_volume"),
    s("pressure_support"), s("set_resp_rate"), d("lpm"), d("fio2"), s("peep")))

  val labs: StructType = StructType(Seq(
    l("C19_PATIENT_ID"), l("C19_HAR_ID"), ts("lab_order_time"),
    ts("lab_result_time"), s("lab_group"), s("proc_name"), s("lab_name"),
    s("component_name"), s("lab_value"), s("reference_value"),
    s("reference_unit"), s("lab_type_name")))

  val adt: StructType = StructType(Seq(
    l("C19_PATIENT_ID"), l("C19_HAR_ID"), ts("start_time"), ts("end_time"),
    s("adt_department_name"), s("adt_room_nm_wid"), s("dept_name"),
    s("room_name")))

  val scores: StructType = StructType(Seq(
    l("C19_PATIENT_ID"), l("C19_HAR_ID"), ts("score_time"), s("score_name"),
    s("score_value")))

  val scoresSofa: StructType = StructType(Seq(
    l("C19_PATIENT_ID"), l("C19_HAR_ID"), ts("score_time"),
    s("gcs_total"), s("gcs_motor"), s("gcs_eye"), s("gcs_verbal"),
    i("sofa_neuro")))

  val medicationOrders: StructType = StructType(Seq(
    l("patient_id"), l("encounter_id"), l("medication_id"),
    ts("order_start_dttm"), ts("order_end_dttm"), s("med_name"),
    s("med_route"), s("med_dose"), s("med_dose_units"), s("med_frequency")))

  val medicationAdminContinuous: StructType = StructType(Seq(
    l("C19_PATIENT_ID"), l("encounter_id"), ts("admin_dttm"), s("med_name"),
    s("med_route"), s("med_category"), s("med_dose"), s("med_dose_unit")))

  val medicationAdminIntermittent: StructType = StructType(Seq(
    l("C19_PATIENT_ID"), l("C19_HAR_ID"), ts("admin_dttm"),
    s("medication_name"), s("med_route"), s("med_dose"), s("med_dose_unit")))

  val patientDemographics: StructType = StructType(Seq(
    l("C19_PATIENT_ID"), s("race"), s("ethnicity"), s("sex")))

  val limitedIdentifiers: StructType = StructType(Seq(
    l("C19_PATIENT_ID"), l("C19_HAR_ID"), ts("admission_date"),
    ts("discharge_date"), ts("birth_date"), s("zip_code")))

  val encounterDemographicsDispo: StructType = StructType(Seq(
    l("C19_PATIENT_ID"), l("C19_HAR_ID"), i("age_at_admission"),
    s("disposition")))

  val disposition: StructType = StructType(Seq(
    s("patient_ID"), s("encounter_ID"), s("disposition_name")))

  val dialysis: StructType = StructType(Seq(
    l("encounter_id"), s("dialysis_type"), ts("start_time"), ts("stop_time"),
    s("dialysate_flow_amount"), s("ultrafiltration_amount")))

  val admissionDiagnosis: StructType = StructType(Seq(
    l("C19_PATIENT_ID"), l("C19_HAR_ID"), s("diagnosis_name"),
    s("dianosis_code"), // typo preserved from the reference contract
    s("pta")))

  // ---- ERD-only tables (no generating code in the reference) ----

  val patientEncounters: StructType = StructType(Seq(
    l("patient_id"), l("encounter_id")))

  val microbiology: StructType = StructType(Seq(
    l("C19_PATIENT_ID"), l("C19_HAR_ID"), ts("order_time"), ts("result_time"),
    s("fluid_name"), s("component_name"), s("organism_name"), s("result_value")))

  val procedures: StructType = StructType(Seq(
    l("C19_PATIENT_ID"), l("C19_HAR_ID"), ts("procedure_time"),
    s("procedure_name"), s("procedure_code")))

  val ecmoMcs: StructType = StructType(Seq(
    l("C19_PATIENT_ID"), l("C19_HAR_ID"), ts("recorded_time"),
    s("device_name"), s("device_metric_name"), s("device_metric_value")))

  val intakeOutput: StructType = StructType(Seq(
    l("C19_PATIENT_ID"), l("C19_HAR_ID"), ts("recorded_time"),
    s("fluid_name"), s("amount"), s("in_out_flag")))

  /** All contracts by table name (the engine's catalog). */
  val all: Map[String, StructType] = Map(
    "vitals" -> vitals,
    "respiratory_support" -> respiratorySupport,
    "labs" -> labs,
    "adt" -> adt,
    "scores" -> scores,
    "scores_sofa" -> scoresSofa,
    "medication_orders" -> medicationOrders,
    "medication_admin_continuous" -> medicationAdminContinuous,
    "medication_admin_intermittent" -> medicationAdminIntermittent,
    "patient_demographics" -> patientDemographics,
    "limited_identifiers" -> limitedIdentifiers,
    "encounter_demographics_dispo" -> encounterDemographicsDispo,
    "disposition" -> disposition,
    "dialysis" -> dialysis,
    "admission_diagnosis" -> admissionDiagnosis,
    "patient_encounters" -> patientEncounters,
    "microbiology" -> microbiology,
    "procedures" -> procedures,
    "ecmo_mcs" -> ecmoMcs,
    "intake_output" -> intakeOutput)

  /** Conform a DataFrame to its contract: project the contract columns in
    * order, casting to contract types ("dynamic at source, fixed at sink",
    * SURVEY.md §1.3). Fails analysis if a contract column is absent. */
  def conform(df: org.apache.spark.sql.DataFrame,
              contract: StructType): org.apache.spark.sql.DataFrame =
    df.select(contract.map(f =>
      org.apache.spark.sql.functions.col(f.name).cast(f.dataType)): _*)

  /** Validate a DataFrame against a contract: same column names, and
    * compatible types for the columns present. Returns human-readable
    * violations (empty = conforming). Cheap plan-level check — no job. */
  def validate(df: org.apache.spark.sql.DataFrame,
               contract: StructType): Seq[String] = {
    val have = df.schema.map(f => f.name -> f.dataType).toMap
    val want = contract.map(f => f.name -> f.dataType).toMap
    val missing = want.keySet.diff(have.keySet).toSeq.sorted
      .map(c => s"missing column: $c")
    val extra = have.keySet.diff(want.keySet).toSeq.sorted
      .map(c => s"unexpected column: $c")
    val wrongType = want.toSeq.collect {
      case (name, dt) if have.contains(name) && have(name) != dt =>
        s"column $name: expected ${dt.simpleString}, got ${have(name).simpleString}"
    }
    missing ++ extra ++ wrongType
  }
}
