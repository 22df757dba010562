package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Keyed MERGE (SCD1 upsert) into a hive-partitioned parquet table —
  * the maintenance operation a long-lived corpus needs when documents
  * get revised or added between full rebuilds, without a table-format
  * dependency (no Delta/Iceberg in the offline dep set; the op shape
  * is what those formats automate).
  */
object Merge {

  /** Upsert `updates` into the parquet table at `basePath`
    * (hive-partitioned by `partCol`) by `keys`: an update row REPLACES
    * the base row with the same key, a new key INSERTS (new partition
    * values create partitions). Returns the touched partition values.
    *
    * Scale shape: the touched partition list comes from a distinct on
    * the updates' partition column (bounded by partition cardinality —
    * driver-safe the same way partition listings are), so the base
    * read PRUNES to touched partitions at file-listing time; the
    * rewrite uses DYNAMIC partition overwrite, so untouched
    * partitions' files are never opened, rewritten, or deleted —
    * per-merge cost is O(touched partitions), not O(table). Merged
    * rows are staged to a temp dir first because Spark (correctly)
    * refuses to overwrite a path it is simultaneously reading; the
    * staging write is also O(touched). The final write clusters on
    * `partCol` (same discipline as the IVF index build) so each
    * touched partition is written by one task — bounded open writers,
    * one file per partition per merge.
    *
    * Contracts (the ones real MERGE engines enforce): `updates` must
    * be unique on `keys` (dedupe with WindowOps.dedupKeepLast first —
    * duplicate update keys would all land); `partCol` must be STABLE
    * under updates (a key that moves partitions would leave its stale
    * row in the old, untouched partition — partition-by-domain/date
    * tables satisfy this; if yours doesn't, union the old partition
    * values into `updates`' before merging); null partition values are
    * not supported. Idempotent: re-merging the same updates is a
    * no-op on the final state. */
  def mergeUpsert(spark: SparkSession, basePath: String, updates: DataFrame,
                  keys: Seq[String], partCol: String): Seq[Any] = {
    require(keys.nonEmpty, "need at least one merge key")
    require(!keys.contains(partCol),
      "partCol can't be a merge key: a key that moves partitions would " +
        "strand its old row (see scaladoc)")
    val touched = updates.select(col(partCol)).distinct()
      .collect().map(_.get(0)).toSeq
    // fail fast, not silently wrong: a null partition value would write
    // to __HIVE_DEFAULT_PARTITION__ while isin(null) matches nothing, so
    // the base's null-partition rows would never be anti-joined and a
    // same-key row would survive next to its replacement
    require(!touched.contains(null),
      s"mergeUpsert: updates contain null $partCol values — null " +
        "partition values are not supported (see scaladoc)")
    if (touched.isEmpty) return Nil
    // first merge into a not-yet-existing table CREATES it (the sink
    // case: a streaming upsert's first micro-batch) — nothing to read,
    // nothing to anti-join
    val fsPath = new org.apache.hadoop.fs.Path(basePath)
    val fs = fsPath.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(fsPath)) {
      updates.repartition(col(partCol))
        .write.mode("overwrite").partitionBy(partCol).parquet(basePath)
      return touched
    }
    val base = spark.read.parquet(basePath)
    val survivors = base.filter(col(partCol).isin(touched: _*))
      .join(updates, keys, "left_anti")
    val merged = updates.unionByName(survivors)
    val staging = java.nio.file.Files.createTempDirectory("graft_merge_stg")
    val stagingDir = staging.toString + "/data"
    try {
      merged.write.mode("overwrite").parquet(stagingDir)
      spark.read.parquet(stagingDir)
        .repartition(col(partCol))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partCol)
        .parquet(basePath)
    } finally {
      // staging is merge-scoped scratch: delete even on a failed write
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(staging.toFile)
    }
    touched
  }
}
