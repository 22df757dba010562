package graft.ops

import org.apache.spark.sql.{Column, DataFrame, functions}
import org.apache.spark.sql.functions._

/** Scale mechanics the 100 TB plan needs beyond AQE's defaults:
  * deterministic skew salting and bucketed co-located joins
  * (SURVEY.md §4). AQE's skew-join split handles sort-merge skew at
  * runtime; explicit salting is for the cases AQE can't re-plan —
  * aggregations over a hot key and broadcast-ineligible skewed joins.
  */
object Scale {

  /** Skew-salted equi-join: the LARGE side's hot keys are spread over
    * `salts` sub-keys by a deterministic hash of `saltSource` (pick a
    * high-cardinality column — e.g. the fact table's line id); the
    * SMALL side is replicated `salts`× with explode (its row count
    * multiplies, so use for dim-sized right sides only). Join keys
    * become (keys..., salt), so one hot key becomes `salts` evenly
    * sized partitions. Result is row-identical to the plain join. */
  def saltedJoin(large: DataFrame, small: DataFrame, keys: Seq[String],
                 saltSource: Column, salts: Int = 16,
                 joinType: String = "inner"): DataFrame = {
    require(salts > 0, "salts must be positive")
    val l = large.withColumn("__graft_salt", pmod(hash(saltSource), lit(salts)))
    val s = small.withColumn("__graft_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    l.join(s, keys :+ "__graft_salt", joinType).drop("__graft_salt")
  }

  /** One aggregate of a [[Scale.saltedAgg]]: `partial` runs per
    * (key, salt) group, `merge` combines the partials per key — they
    * differ whenever the agg is not self-decomposable (count partials
    * merge by SUM; avg must be carried as sum+count and divided after).
    * Constructors for the common cases are on the companion. */
  case class SaltedAgg(partial: Column => Column, merge: Column => Column,
                       srcCol: String, outName: String)
  object SaltedAgg {
    def sum(src: String, out: String): SaltedAgg =
      SaltedAgg(functions.sum(_), functions.sum(_), src, out)
    def min(src: String, out: String): SaltedAgg =
      SaltedAgg(functions.min(_), functions.min(_), src, out)
    def max(src: String, out: String): SaltedAgg =
      SaltedAgg(functions.max(_), functions.max(_), src, out)
    /** count of non-null `src`: partials COUNT, merged by SUM — the
      * pair the old single-function signature could not express. */
    def count(src: String, out: String): SaltedAgg =
      SaltedAgg(functions.count(_), functions.sum(_), src, out)
  }

  /** Salted hot-key aggregation: two-phase agg for a skewed group key —
    * partial agg on (key, salt) spreads the hot key across `salts`
    * partitions, final agg on key merges each aggregate with its OWN
    * merge function (see [[SaltedAgg]] — count merges by sum). */
  def saltedAgg(df: DataFrame, keys: Seq[String], saltSource: Column,
                aggs: Seq[SaltedAgg], salts: Int = 16): DataFrame = {
    require(aggs.nonEmpty, "at least one aggregate required")
    val salted = df.withColumn("__graft_salt",
      pmod(hash(saltSource), lit(salts)))
    val phase1 = salted.groupBy((keys :+ "__graft_salt").map(col): _*)
      .agg(aggs.head.partial(col(aggs.head.srcCol)).as(aggs.head.outName),
        aggs.tail.map(a => a.partial(col(a.srcCol)).as(a.outName)): _*)
    phase1.groupBy(keys.map(col): _*)
      .agg(aggs.head.merge(col(aggs.head.outName)).as(aggs.head.outName),
        aggs.tail.map(a => a.merge(col(a.outName)).as(a.outName)): _*)
  }

  /** Write a bucketed + sorted table: co-locates join/agg keys at WRITE
    * time so every later equi-join or aggregation on `bucketCols`
    * against a same-bucketed table runs with NO shuffle — the 100 TB
    * answer to "this join happens every day on the same key".
    * Bucketed tables require the session catalog (`saveAsTable`);
    * pass `path` to store the files OUTSIDE the warehouse dir (an
    * external table — catalog metadata only in the session). */
  /** Compact a small-files parquet dataset: size the output file count
    * from the INPUT'S ACTUAL BYTES (one filesystem listing — no data
    * read) so each output file lands near `targetFileBytes`, then
    * rewrite with a round-robin repartition. The small-files problem is
    * the slow death of any long-lived 100 TB dataset — every
    * incremental append adds a file per task, and a million 1 MB files
    * turn file listing and scan planning into the bottleneck. Returns
    * the output file count. Round-robin (not coalesce) so output sizes
    * are even regardless of input skew; coalesce would also narrow the
    * READ parallelism to the output count. */
  def compactParquet(spark: org.apache.spark.sql.SparkSession,
                     inDir: String, outDir: String,
                     targetFileBytes: Long = 128L << 20): Int = {
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    val path = new org.apache.hadoop.fs.Path(inDir)
    val fs = path.getFileSystem(spark.sessionState.newHadoopConf())
    val it = fs.listFiles(path, true)
    var totalBytes = 0L
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.endsWith(".parquet")) totalBytes += f.getLen
    }
    val n = math.max(1L,
      (totalBytes + targetFileBytes - 1) / targetFileBytes).toInt
    spark.read.parquet(inDir).repartition(n)
      .write.mode("overwrite").parquet(outDir)
    n
  }

  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
                    buckets: Int, sortCols: Seq[String] = Nil,
                    path: Option[String] = None): Unit = {
    val w0 = df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
    val w1 =
      if (sortCols.nonEmpty) w0.sortBy(sortCols.head, sortCols.tail: _*)
      else w0
    path.fold(w1)(p => w1.option("path", p)).saveAsTable(table)
  }

  /** Pre-flight key-skew audit: the distribution of per-key row counts
    * for a prospective shuffle key, reduced to the scalars that decide
    * the partitioning strategy BEFORE a 100 TB job is launched — key
    * cardinality, max/percentile key sizes, the heaviest key's share of
    * all rows, and the Gini coefficient of the count distribution
    * (0 = uniform keys, →1 = one key owns the table). This is the
    * measurement behind the [[saltedJoin]]/[[saltedAgg]] decision and
    * the reference's category-tally QC blocks
    * (`code/RCLIF_labs.Rmd:60-71`) generalized to a skew diagnosis.
    *
    * Cost: one shuffle on the key (map-side combine → distinct-key
    * sized), then the Gini's exact sorted-rank form
    * `Σ(2·rank − n − 1)·cnt / (n·Σcnt)` evaluated over the
    * COUNT-OF-COUNTS distribution, not the keys: all f keys sharing a
    * count c occupy a contiguous rank run, whose term sums in closed
    * form to `c·(2·f·r0 + f·(f−1) − f·(n+1))` with r0 the run's first
    * rank. The window therefore orders ≤ √(2·rows) rows (distinct
    * count VALUES — a billion-key audit still windows a few thousand
    * rows) instead of ranking every key. Every term is 64-bit integer
    * arithmetic, so any SQL engine replays it exactly; the two final
    * divisions round to 6. */
  def skewReport(df: DataFrame, keyCol: String): DataFrame = {
    val counts = df.filter(col(keyCol).isNotNull)
      .groupBy(col(keyCol).cast("long").as("__k"))
      .agg(count(lit(1)).as("__c"))
    val freq = counts.groupBy(col("__c")).agg(count(lit(1)).as("__f"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("__c"))
    freq
      .withColumn("__cum", sum(col("__f")).over(w))
      .withColumn("__r0", col("__cum") - col("__f") + lit(1))
      .agg(
        sum(col("__f")).cast("long").as("n_keys"),
        sum(col("__c") * col("__f")).cast("long").as("n_rows"),
        max(col("__c")).cast("long").as("max_key_rows"),
        round(expr("percentile(__c, 0.5, __f)"), 6).as("p50_key_rows"),
        round(expr("percentile(__c, 0.99, __f)"), 6).as("p99_key_rows"),
        sum(col("__c") * (lit(2) * col("__f") * col("__r0") +
          col("__f") * (col("__f") - lit(1)))).as("__ga"))
      .select(
        col("n_keys"), col("n_rows"), col("max_key_rows"),
        col("p50_key_rows"), col("p99_key_rows"),
        round(col("max_key_rows").cast("double") /
          col("n_rows").cast("double"), 6).as("top_key_share"),
        round((col("__ga").cast("double") -
          (col("n_keys") + lit(1)).cast("double") *
            col("n_rows").cast("double")) /
          (col("n_keys").cast("double") * col("n_rows").cast("double")), 6)
          .as("gini"))
  }

  /** Morton (Z-order) key: interleaves the low `bits` bits of two
    * non-negative integer columns — bit i of x lands at output bit 2i,
    * bit i of y at 2i+1 — via the classic mask-and-shift bit spreading.
    * Pure Column bit arithmetic (whole-stage codegen, no UDF, no
    * custom expression), and exactly replayable by any SQL engine with
    * BIGINT `&`/`|`/`<<` (the s10_zorder_key oracle does). Inputs must
    * already be quantized to [0, 2^bits) — [[zorderWrite]] does that
    * from the data's min/max; callers with naturally-bounded ints can
    * mask with pmod. */
  def mortonKey(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 16, "bits must be in [1,16]")
    def spread(c: Column): Column = {
      val v0 = c.cast("long").bitwiseAND(lit((1L << bits) - 1))
      val v1 = v0.bitwiseOR(shiftleft(v0, 8)).bitwiseAND(lit(0x00FF00FFL))
      val v2 = v1.bitwiseOR(shiftleft(v1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
      val v3 = v2.bitwiseOR(shiftleft(v2, 2)).bitwiseAND(lit(0x33333333L))
      v3.bitwiseOR(shiftleft(v3, 1)).bitwiseAND(lit(0x55555555L))
    }
    spread(x).bitwiseOR(shiftleft(spread(y), 1))
  }

  /** Z-order (space-filling-curve) layout: writes `df` as parquet
    * range-partitioned and sorted by the Morton key of two quantized
    * numeric columns, so every output FILE covers a bounded range of
    * BOTH dimensions at once. A linear sort gives perfect min/max
    * pruning on its leading column and none on the other; Z-order
    * trades a little of each for skipping on BOTH — the standard
    * data-layout play for two-dimensional predicates over a 100 TB
    * fact (file/row-group min-max stats prune at planning time, no
    * index structure to maintain). ScaleSpec measures the effect:
    * per-file spans of each dimension versus single-column-sorted
    * layouts of the same data.
    *
    * Quantization bounds come from one tiny agg (4 scalars to the
    * driver). `files` controls output granularity — skipping precision
    * scales with file count; compose with [[compactParquet]]'s sizing
    * when targeting a byte size. The key column is dropped before the
    * write (projection after the partition-local sort keeps the
    * order). */
  def zorderWrite(df: DataFrame, xCol: String, yCol: String,
                  outDir: String, files: Int = 8, bits: Int = 16): Unit = {
    require(files >= 1, "files must be >= 1")
    def secsSafe(c: Column): Column = c.cast("double")
    val b = df.agg(min(secsSafe(col(xCol))).as("x0"),
      max(secsSafe(col(xCol))).as("x1"),
      min(secsSafe(col(yCol))).as("y0"),
      max(secsSafe(col(yCol))).as("y1")).head()
    // an empty frame / all-null layout column yields null bounds; fail
    // with a meaningful message instead of an unboxing NPE (a no-op
    // write of a frame with no layout signal would silently produce a
    // layout that prunes nothing)
    require((0 to 3).forall(i => !b.isNullAt(i)),
      s"zorderWrite: empty input or all-null layout column ($xCol/$yCol)")
    val (x0, x1, y0, y1) =
      (b.getDouble(0), b.getDouble(1), b.getDouble(2), b.getDouble(3))
    val hi = (1L << bits) - 1
    def quant(c: Column, lo: Double, up: Double): Column =
      if (up <= lo) lit(0L)
      else least(lit(hi), floor((secsSafe(c) - lo) / (up - lo) * hi))
        .cast("long")
    val keyed = df.withColumn("__z",
      mortonKey(quant(col(xCol), x0, x1), quant(col(yCol), y0, y1), bits))
    keyed.repartitionByRange(files, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(outDir)
  }
}
