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
    // staging + dynamic overwrite + preserve-on-failure: the shared
    // commit discipline (see overwriteTouched)
    overwriteTouched(spark, fs, fsPath, merged, partCol,
      opName = "mergeUpsert")
    touched
  }

  /** Incrementally-maintained aggregate table (materialized view):
    * folds a new batch of fact rows into a hive-partitioned agg table
    * keyed by (`partCol`, `keys`) WITHOUT rescanning the fact — the
    * 100 TB answer to "the daily dashboard rollup can't re-read the
    * corpus every load". Aggregates are the mergeable
    * [[Scale.SaltedAgg]] pairs (partial on the batch, merge against
    * the stored partials — count merges by sum, exactly the
    * distributed-agg discipline), so the stored table IS the partial
    * state and any batch folds in associatively.
    *
    * Scale shape: one hash agg over the BATCH (delta), then the stored
    * table read PRUNED to the delta's touched partitions, one
    * union+merge agg bounded by |touched partitions' groups| +
    * |delta|, and a dynamic-partition overwrite of touched partitions
    * only — per-load cost is O(batch + touched), never O(table).
    * Schema stability: merged outputs are cast back to the delta
    * aggregate's types, so repeated loads never widen the stored
    * schema (a decimal sum would otherwise grow precision every load
    * and leave partitions with mixed footers).
    *
    * Contracts: each batch must be applied EXACTLY ONCE (additive
    * partials double-count on replay — this is the at-most-once dual
    * of [[mergeUpsert]]'s idempotent keyed overwrite; track a batch
    * high-water-mark upstream, e.g. foreachBatch's batchId, to get
    * exactly-once end to end). Null partition values unsupported, as
    * in [[mergeUpsert]]. Failure semantics and staging recovery are
    * mergeUpsert's — the staged rows are the complete post-merge
    * content of every touched partition. */
  def incrementalAggMv(spark: SparkSession, mvPath: String,
                       batch: DataFrame, partCol: String,
                       keys: Seq[String],
                       aggs: Seq[Scale.SaltedAgg]): Seq[Any] = {
    require(aggs.nonEmpty, "at least one aggregate required")
    val groupCols = (partCol +: keys).map(col)
    val delta = batch.groupBy(groupCols: _*)
      .agg(aggs.head.partial(col(aggs.head.srcCol)).as(aggs.head.outName),
        aggs.tail.map(a => a.partial(col(a.srcCol)).as(a.outName)): _*)
    val touched = delta.select(col(partCol)).distinct()
      .collect().map(_.get(0)).toSeq
    require(!touched.contains(null),
      s"incrementalAggMv: batch contains null $partCol values — null " +
        "partition values are not supported (see mergeUpsert scaladoc)")
    if (touched.isEmpty) return Nil
    val fsPath = new org.apache.hadoop.fs.Path(mvPath)
    val fs = fsPath.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(fsPath)) {
      delta.repartition(col(partCol))
        .write.mode("overwrite").partitionBy(partCol).parquet(mvPath)
      return touched
    }
    val existing = spark.read.parquet(mvPath)
      .filter(col(partCol).isin(touched: _*))
    val merged0 = existing.unionByName(delta)
      .groupBy(groupCols: _*)
      .agg(aggs.head.merge(col(aggs.head.outName)).as(aggs.head.outName),
        aggs.tail.map(a => a.merge(col(a.outName)).as(a.outName)): _*)
    // pin the stored schema to the delta's aggregate types
    val deltaTypes = delta.schema.map(f => f.name -> f.dataType).toMap
    val merged = merged0.select(merged0.columns.map(c =>
      col(c).cast(deltaTypes(c)).as(c)): _*)
    overwriteTouched(spark, fs, fsPath, merged, partCol,
      opName = "incrementalAggMv")
    touched
  }

  /** Shared final-commit discipline: stage `rows` inside the table dir
    * (same filesystem), then dynamic-partition-overwrite the touched
    * partitions; on failure PRESERVE staging as the recovery copy (see
    * [[mergeUpsert]] scaladoc). */
  /** Keyed SNAPSHOT DIFF — classify every key across two table
    * versions as added / removed / changed / unchanged, with the
    * differing column names and both versions' values. The audit
    * companion to [[mergeUpsert]]: "what did this load actually do",
    * the change-data-feed a table format would expose, computed from
    * plain snapshots.
    *
    * One full-outer sort-merge join on the key is the entire plan —
    * presence is tracked by side flags (never by key nullness, which
    * a null-keyed row would fake), column comparison is null-safe
    * (`<=>`: null→value and value→null are CHANGES, null→null is
    * not). `changed_cols` lists differing columns in declaration
    * order, comma-joined — '' for added/removed/unchanged rows.
    *
    * Scale: both sides shuffle once on the diff key; for
    * date-partitioned snapshots diff partition-by-partition (the
    * mergeUpsert touched-partition discipline) so a daily diff reads
    * two days, not two tables. */
  def snapshotDiff(v1: DataFrame, v2: DataFrame, keys: Seq[String],
                   compareCols: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "need at least one key column")
    require(compareCols.nonEmpty, "need at least one compare column")
    val l = v1.select((keys ++ compareCols).map(col): _*)
      .toDF(keys ++ compareCols.map("old_" + _): _*)
      .withColumn("__in_v1", lit(true))
    val r = v2.select((keys ++ compareCols).map(col): _*)
      .toDF(keys ++ compareCols.map("new_" + _): _*)
      .withColumn("__in_v2", lit(true))
    val j = l.join(r, keys, "full_outer")
    val diffs = compareCols.map(c =>
      when(!(col("old_" + c) <=> col("new_" + c)), lit(c)))
    val change =
      when(col("__in_v1").isNull, lit("added"))
        .when(col("__in_v2").isNull, lit("removed"))
        .when(diffs.map(_.isNotNull).reduce(_ || _), lit("changed"))
        .otherwise(lit("unchanged"))
    j.withColumn("change", change)
      .withColumn("changed_cols",
        when(col("change") === "changed",
          concat_ws(",", diffs: _*)).otherwise(lit("")))
      .select((keys.map(col) :+ col("change") :+ col("changed_cols")) ++
        compareCols.flatMap(c => Seq(col("old_" + c), col("new_" + c))): _*)
  }

  /** SCD TYPE 2 upsert — history-keeping merge: instead of replacing a
    * changed row ([[mergeUpsert]]'s SCD1), the current version is
    * CLOSED (valid_to = batch time, is_current = false) and the new
    * version opens (valid_from = batch time, valid_to null) — the
    * as-of-queryable dimension history every warehouse keeps for
    * "what did this customer's record say when the order shipped".
    *
    * Layout: the table hive-partitions on a portable-hash KEY BUCKET
    * (stable by construction — a key can never move buckets, the
    * mergeUpsert stability contract made structural), so a batch
    * touches only its keys' buckets: base read pruned at file-listing
    * time, dynamic overwrite of touched buckets, per-merge cost
    * O(touched), never O(table). All version rows of a key live in
    * one bucket — an as-of lookup reads one partition.
    *
    * Contracts: one row per key per batch (intra-batch dedup to the
    * latest is applied via the caller ordering `tsCol`; a batch
    * carrying a key's full intra-day sequence should be split into
    * ordered batches); change detection is null-safe over
    * `compareCols`; identical updates are no-ops (idempotent on final
    * state). Failure semantics are [[mergeUpsert]]'s staging
    * discipline. */
  def scd2Upsert(spark: SparkSession, basePath: String,
                 updates: DataFrame, keyCol: String,
                 compareCols: Seq[String], tsCol: String,
                 buckets: Int = 16): Unit = {
    require(compareCols.nonEmpty, "need at least one compare column")
    val kb = pmod(pmod(col(keyCol).cast("long"), lit(2147483647L)) *
      2654435761L, lit(2147483647L)) % buckets
    val cols = (keyCol +: compareCols).map(col)
    val upd = graft.ops.WindowOps.dedupKeepLast(updates,
        keys = Seq(keyCol), orderBy = Seq(col(tsCol)))
      .select(cols :+ col(tsCol).as("__ts"): _*)
      .withColumn("__kb", kb)
    val fsPath = new org.apache.hadoop.fs.Path(basePath)
    val fs = fsPath.getFileSystem(spark.sessionState.newHadoopConf())
    val asVersion = upd.select(cols :+
      col("__ts").as("valid_from") :+
      lit(null).cast("timestamp").as("valid_to") :+
      lit(true).as("is_current") :+ col("__kb"): _*)
    if (!fs.exists(fsPath)) {
      asVersion.repartition(col("__kb"))
        .write.mode("overwrite").partitionBy("__kb").parquet(basePath)
      return
    }
    val touched = upd.select(col("__kb")).distinct()
      .collect().map(_.get(0)).toSeq
    if (touched.isEmpty) return
    val base = spark.read.parquet(basePath)
      .filter(col("__kb").isin(touched: _*))
    val u = upd.select((keyCol +: compareCols).map(c =>
      col(c).as(s"__u_$c")) :+ col("__ts"): _*)
    val joined = base.join(u,
      col(keyCol) === col(s"__u_$keyCol"), "full_outer")
    val differs = compareCols.map(c =>
      !(col(c) <=> col(s"__u_$c"))).reduce(_ || _)
    val isChange = col("is_current") && col(s"__u_$keyCol").isNotNull &&
      differs
    // history rows and unchanged/unmatched rows pass through; a
    // changed current row closes; its replacement (and brand-new
    // keys) open.
    // SINGLE-PASS emit (guide §2.4): the old carried∪opened union put
    // the full-outer join under BOTH union arms, so the join executed
    // twice per merge. One execution now emits up to two struct rows —
    // carried when a base-side row exists, opened when the update side
    // opens a version — via array+explode with a null filter (plain
    // Generate/Filter/Project: codegen-friendly, no HOF). Every output
    // row is identical to its union-arm twin; only the execution count
    // of the join changes (2 → 1).
    val kbLong = col("__kb").cast("long")
    val carried = when(col(keyCol).isNotNull, struct(
      (keyCol +: compareCols).map(col) :+
        col("valid_from") :+
        when(isChange, col("__ts")).otherwise(col("valid_to"))
          .as("valid_to") :+
        when(isChange, lit(false)).otherwise(col("is_current"))
          .as("is_current") :+ kbLong.as("__kb"): _*))
    val opened = when(col(s"__u_$keyCol").isNotNull &&
        (col(keyCol).isNull || isChange), struct(
      (keyCol +: compareCols).map(c =>
        col(s"__u_$c").as(c)) :+
        col("__ts").as("valid_from") :+
        lit(null).cast("timestamp").as("valid_to") :+
        lit(true).as("is_current") :+
        (pmod(pmod(col(s"__u_$keyCol").cast("long"), lit(2147483647L)) *
          2654435761L, lit(2147483647L)) % buckets).as("__kb"): _*))
    val merged = joined
      .select(explode(array(carried, opened)).as("__row"))
      .filter(col("__row").isNotNull)
      .select(col("__row.*"))
    overwriteTouched(spark, fs, fsPath, merged, "__kb",
      opName = "scd2Upsert")
  }

  private def overwriteTouched(spark: SparkSession,
                               fs: org.apache.hadoop.fs.FileSystem,
                               fsPath: org.apache.hadoop.fs.Path,
                               rows: DataFrame, partCol: String,
                               opName: String): Unit = {
    val stagingPath = new org.apache.hadoop.fs.Path(
      fsPath, s".merge-staging-${java.util.UUID.randomUUID}")
    val stagingDir = stagingPath.toString + "/data"
    try {
      rows.write.mode("overwrite").parquet(stagingDir)
    } catch {
      case e: Throwable => fs.delete(stagingPath, true); throw e
    }
    try {
      spark.read.parquet(stagingDir)
        .repartition(col(partCol))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partCol)
        .parquet(fsPath.toString)
    } catch {
      case e: Throwable =>
        throw new RuntimeException(
          s"$opName: final overwrite of $fsPath failed; touched " +
            s"partitions may be half-replaced. The complete merged rows " +
            s"for the touched partitions are preserved at $stagingDir — " +
            "restore them from there (see mergeUpsert scaladoc).", e)
    }
    fs.delete(stagingPath, true)
  }
}
