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
    * no-op on the final state.
    *
    * Failure semantics: the final dynamic-partition overwrite is NOT
    * atomic across partitions (the capability Delta/Iceberg add with a
    * transaction log). A crash mid-commit can leave touched partitions
    * half-replaced. Recovery contract: the staged merged rows (path
    * named in the thrown exception) are the complete post-merge
    * content of every touched partition — restore from staging, or
    * re-run the merge from the ORIGINAL updates (idempotency makes the
    * retry safe for any partition that committed or never started; a
    * partition whose files were deleted but not rewritten needs the
    * staging restore, since its survivor rows exist nowhere else). */
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
    // staging lives INSIDE the table dir under a dot-prefix (hidden
    // from Spark/Hive file listings) so it resolves on the SAME
    // filesystem as the table on any deployment (HDFS/S3A/local) — a
    // driver-local java.nio temp dir would land on the driver's disk
    // while Spark resolved the path against the default FS, writing
    // and deleting two different locations
    val stagingPath = new org.apache.hadoop.fs.Path(
      fsPath, s".merge-staging-${java.util.UUID.randomUUID}")
    val stagingDir = stagingPath.toString + "/data"
    try {
      merged.write.mode("overwrite").parquet(stagingDir)
    } catch {
      case e: Throwable => fs.delete(stagingPath, true); throw e
    }
    try {
      spark.read.parquet(stagingDir)
        .repartition(col(partCol))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partCol)
        .parquet(basePath)
    } catch {
      // the final overwrite is NOT failure-atomic (see scaladoc): a
      // crash between partition deletes and commits can leave touched
      // partitions half-replaced, at which point staging holds the
      // only complete copy of their merged rows — PRESERVE it and say
      // where it is instead of deleting the recovery copy
      case e: Throwable =>
        throw new RuntimeException(
          s"mergeUpsert: final overwrite of $basePath failed; touched " +
            s"partitions may be half-replaced. The complete merged rows " +
            s"for the touched partitions are preserved at $stagingDir — " +
            "restore them from there, or re-run the merge with the " +
            "ORIGINAL updates (idempotent) if every touched partition " +
            "is verifiably intact.", e)
    }
    // success: staging is now redundant scratch
    fs.delete(stagingPath, true)
    touched
  }
}
