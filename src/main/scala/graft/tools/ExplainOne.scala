package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Print the formatted physical plan of one SparkEntry query:
  * runMain graft.tools.ExplainOne <query> [sfDir] */
object ExplainOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.explain("formatted")
  }
}
