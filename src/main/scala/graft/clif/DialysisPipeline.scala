package graft.clif

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.clif.Vocabularies.{DialysisGroups => G}

/** Dialysis episode derivation (`code/RCLIF_dialysis.Rmd:38-157`) — the
  * reference's sessionization workload, built from window `lead` over the
  * encounter key (SURVEY.md §2.5 W2/W3).
  *
  * Three episode semantics, unioned by name:
  *  - CRRT: hourly docs; episode start = doc time - 1h, stop = doc time
  *    (`:46-80`);
  *  - intermittent HD: start at "Machine Number" doc, stop at next event
  *    (`:84-114`);
  *  - peritoneal: start at "Initial Drain"/"Fill Volume", stop at next
  *    event, keep rows with an ultrafiltration reading (`:118-151`).
  *
  * All shuffles key on C19_HAR_ID; the contract output keys on
  * encounter_id with NULL stop for open episodes (SURVEY.md §7.8).
  */
object DialysisPipeline {

  private val ENC = "C19_HAR_ID"

  /** Filter the flowsheet IO extract to dialysis rows (`:38-40`). */
  def dialysisRows(flowIo: DataFrame): DataFrame =
    flowIo.filter(col("flo_meas_name").contains("DIALYSIS")).distinct()

  /** CRRT episodes: each documented hour is an episode ending at the doc
    * time and starting 1h before; flow/removal measurements attach by
    * (encounter, stop_time) equality. */
  def crrt(dialysis: DataFrame): DataFrame = {
    val crrtDf = dialysis
      .filter(col("flo_group_name").isin(G.CrrtRemoved, G.CrrtDelivered))
      .select(ENC, "flo_group_name", "recorded_time", "meas_value")

    val times = crrtDf.select(col(ENC).as("encounter_id"),
        col("recorded_time").as("stop_time")).distinct()
      .withColumn("start_time", col("stop_time") - expr("INTERVAL 1 HOUR"))

    val filtrate = crrtDf.filter(col("flo_group_name") === G.CrrtDelivered)
      .select(col(ENC).as("encounter_id"),
        col("meas_value").as("dialysate_flow_amount"),
        col("recorded_time").as("stop_time")).distinct()
    val removal = crrtDf.filter(col("flo_group_name") === G.CrrtRemoved)
      .select(col(ENC).as("encounter_id"),
        col("meas_value").as("ultrafiltration_amount"),
        col("recorded_time").as("stop_time")).distinct()

    times
      .join(filtrate, Seq("encounter_id", "stop_time"), "left")
      .join(removal, Seq("encounter_id", "stop_time"), "left")
      .withColumn("dialysis_type", lit("crrt"))
      .select("encounter_id", "dialysis_type", "start_time", "stop_time",
        "dialysate_flow_amount", "ultrafiltration_amount")
  }

  /** Intermittent HD: start at "Machine Number", stop at the next
    * documentation of either event type; require an ultrafiltration
    * reading at the stop. */
  def intermittent(dialysis: DataFrame): DataFrame = {
    val intDf = dialysis
      .filter(col("flo_group_name").isin(G.IntUltraLoss, G.IntMachine))
      .select(ENC, "flo_group_name", "recorded_time", "meas_value")

    val w = Window.partitionBy(col(ENC)).orderBy(col("recorded_time"))
    val timesDf = intDf.select(ENC, "flo_group_name", "recorded_time").distinct()
      .withColumn("stop_time", lead(col("recorded_time"), 1).over(w))
      .filter(col("flo_group_name") === G.IntMachine)
      .select(col(ENC).as("encounter_id"),
        col("recorded_time").as("start_time"), col("stop_time"))

    val removal = intDf.filter(col("flo_group_name") === G.IntUltraLoss)
      .select(col(ENC).as("encounter_id"),
        col("meas_value").as("ultrafiltration_amount"),
        col("recorded_time").as("stop_time")).distinct()

    timesDf.join(removal, Seq("encounter_id", "stop_time"), "left")
      .filter(col("ultrafiltration_amount").isNotNull)
      .withColumn("dialysis_type", lit("intermittent"))
      .select("encounter_id", "dialysis_type", "start_time", "stop_time",
        "ultrafiltration_amount")
  }

  /** Peritoneal: starts at drain/fill docs, stops at the next event in the
    * union of starts and nonzero ultrafiltration readings. */
  def peritoneal(dialysis: DataFrame): DataFrame = {
    val all = dialysis
      .filter(col("flo_group_name").isin(G.PeriTotalUltra, G.PeriInitialDrain,
        G.PeriFillVolume))
      .select(ENC, "flo_group_name", "recorded_time", "meas_value")
      .distinct()

    val removal = all
      .filter(col("flo_group_name").isin(G.PeriTotalUltra, G.PeriManualExchange))
      .select(ENC, "meas_value", "recorded_time")
      .filter(col("meas_value") =!= 0)
      .distinct()

    val starts = all
      .filter(col("flo_group_name").isin(G.PeriInitialDrain, G.PeriFillVolume))
      .select(ENC, "recorded_time").distinct()

    val w = Window.partitionBy(col(ENC)).orderBy(col("recorded_time"))
    val times = starts
      .unionByName(removal.select(ENC, "recorded_time"))
      .withColumn("stop_time", lead(col("recorded_time"), 1).over(w))
      .select(col(ENC).as("encounter_id"),
        col("recorded_time").as("start_time"), col("stop_time"))

    times
      .join(removal.select(col(ENC).as("encounter_id"),
          col("meas_value").as("ultrafiltration_amount"),
          col("recorded_time").as("stop_time")),
        Seq("encounter_id", "stop_time"), "left")
      .filter(col("ultrafiltration_amount").isNotNull)
      .withColumn("dialysis_type", lit("peritoneal"))
      .select("encounter_id", "dialysis_type", "start_time", "stop_time",
        "ultrafiltration_amount")
  }

  /** Full table: union by name, missing columns null (`:156-157`). */
  def build(flowIo: DataFrame): DataFrame = {
    val d = dialysisRows(flowIo)
    crrt(d)
      .unionByName(intermittent(d), allowMissingColumns = true)
      .unionByName(peritoneal(d), allowMissingColumns = true)
  }

  /** QC tally by year × type (`:162-169`). */
  def qcTally(rclifDialysis: DataFrame): DataFrame =
    rclifDialysis
      .select(to_date(col("start_time")).as("date"), col("dialysis_type"),
        col("encounter_id")).distinct()
      .groupBy(year(col("date")).as("year"), col("dialysis_type"))
      .agg(count(lit(1)).as("n"))
}
