package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted MinHash-LSH index for INCREMENTAL near-duplicate
  * detection: sign the corpus once, probe every new batch against the
  * persisted state without ever re-shingling or re-signing the corpus —
  * the text-side mirror of the persisted IVF index
  * ([[graft.sim.Similarity.buildIvfIndex]]). The batch-vs-corpus
  * alternatives re-process the corpus text per increment
  * ([[Dedup.decontaminateBloom]] prunes early but still scans text);
  * here each increment pays batch signing + one columnar scan of the
  * index's OWN compact state.
  *
  * Layout under `path`:
  *  - `bands/` — (bucket, id) hive-partitioned by `band`, sorted by
  *    bucket within files: 3 narrow columns per (doc × band), the
  *    candidate-generation surface;
  *  - `docs/` — (id, hs) ONE row per doc: the sorted-distinct PORTABLE
  *    31-bit polynomial shingle-hash set
  *    ([[graft.functions.NativeExpressions.PolyHashSet]]), the verify
  *    surface. Portable because the index OUTLIVES any one engine's
  *    hash function: a SQL engine can recompute `hs` exactly
  *    (`t_lsh_index_probe`'s DuckDB oracle does), so persisted state is
  *    auditable forever — murmur3/xxhash64 projections would freeze
  *    Spark-internal semantics into long-lived files;
  *  - `meta/` — one row of build parameters; probe/append read them, so
  *    callers cannot probe with mismatched shingle/banding params.
  *
  * Verified `jaccard` is the SET Jaccard of the portable hash sets —
  * an upper bound of string-shingle Jaccard that coincides with it
  * except on 31-bit collisions (P ≈ m²/2³² per pair; the oracle
  * recomputes the identical quantity, so the correctness gate is
  * exact, not approximate).
  *
  * Scale shape of [[probe]]: the batch is signed in-flight; its band
  * keys join the `bands/` scan (AQE broadcasts the batch side when it
  * fits — the index is scanned ONCE and never shuffled; a huge batch
  * degrades to a shuffled join on (band, bucket), still
  * candidate-sized); candidate pairs then pull `hs` — the batch side
  * in-flight, the indexed side via a broadcast-candidates join against
  * `docs/` — and pass the [[Dedup]] screen (size-ratio +
  * [[graft.functions.NativeExpressions.SortedJaccardGe]] early-exit
  * walk) before the exact set intersection. Nothing corpus-sized ever
  * shuffles: `maxBucket` is enforced on the FROZEN state at
  * build/append time and on the batch side at probe time, so the
  * per-bucket pair expansion stays cap-bounded without any window
  * ever running over the persisted bands.
  */
object LshIndex {

  private def bandsPath(path: String) = path.stripSuffix("/") + "/bands"
  private def docsPath(path: String) = path.stripSuffix("/") + "/docs"
  private def metaPath(path: String) = path.stripSuffix("/") + "/meta"

  private def signed(df: DataFrame, idCol: String, textCol: String,
                     shingleN: Int, numHashes: Int,
                     bands: Int): DataFrame = {
    val sh = Dedup.shingles(col(textCol), shingleN)
    df.select(col(idCol).as("id"), sh.as("sh"))
      .select(col("id"),
        graft.functions.NativeExpressions.poly_hash_set(col("sh")).as("hs"),
        Dedup.lshBands(Dedup.minhashSignature(col("sh"), numHashes),
          bands, numHashes / bands).as("bk"))
  }

  /** Build the index at `path` (overwrite). One signing pass over the
    * corpus; both tables written with clustered-write discipline (one
    * shuffle each, ≤1 file per band partition per write).
    *
    * `maxBucket` is enforced HERE, on the frozen state — oversize
    * (band, bucket) groups are dropped at write so no later probe ever
    * pays a window over the persisted bands (probes only cap their own
    * batch side). Dropped buckets are near-identical boilerplate,
    * exact-dedup's job — the same contract as [[Dedup.lshCandidates]]. */
  def build(df: DataFrame, idCol: String, textCol: String, path: String,
            shingleN: Int = 3, numHashes: Int = 32, bands: Int = 16,
            maxBucket: Int = 1000): Unit = {
    val spark = df.sparkSession
    val s = signed(df, idCol, textCol, shingleN, numHashes, bands)
    s.select(col("id"), col("hs"))
      .write.mode("overwrite").parquet(docsPath(path))
    Dedup.capBuckets(
        s.select(col("id"), explode(col("bk")).as("bk"))
          .select(col("bk.band").as("band"), col("bk.bucket").as("bucket"),
            col("id")),
        Seq("band", "bucket"), maxBucket)
      .repartition(col("band"))
      .sortWithinPartitions("bucket")
      .write.mode("overwrite").partitionBy("band").parquet(bandsPath(path))
    import spark.implicits._
    Seq((shingleN, numHashes, bands, maxBucket))
      .toDF("shingle_n", "num_hashes", "bands", "max_bucket")
      .coalesce(1).write.mode("overwrite").parquet(metaPath(path))
  }

  /** Append a new batch into the existing layout with the index's OWN
    * (frozen) parameters — the IVF maintenance contract: appends stay
    * drift-free and file-count-bounded; rebuild when banding params
    * should change. The bucket cap applies to THIS batch's contribution
    * (a window over the batch, not the index): a bucket can therefore
    * accumulate up to cap × appends rows across many appends — the
    * periodic rebuild the maintenance contract already prescribes is
    * what re-enforces the cap globally. */
  def append(df: DataFrame, idCol: String, textCol: String,
             path: String): Unit = {
    val (shingleN, numHashes, bands, maxBucket) =
      readMeta(df.sparkSession, path)
    val s = signed(df, idCol, textCol, shingleN, numHashes, bands)
    s.select(col("id"), col("hs"))
      .write.mode("append").parquet(docsPath(path))
    Dedup.capBuckets(
        s.select(col("id"), explode(col("bk")).as("bk"))
          .select(col("bk.band").as("band"), col("bk.bucket").as("bucket"),
            col("id")),
        Seq("band", "bucket"), maxBucket)
      .repartition(col("band"))
      .sortWithinPartitions("bucket")
      .write.mode("append").partitionBy("band").parquet(bandsPath(path))
  }

  private[graft] def readMeta(spark: SparkSession,
                              path: String): (Int, Int, Int, Int) = {
    val r = spark.read.parquet(metaPath(path))
      .select("shingle_n", "num_hashes", "bands", "max_bucket").head()
    (r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3))
  }

  /** Near-dup pairs (new_id, indexed_id, jaccard ≥ threshold) between a
    * NEW batch and the indexed corpus. The corpus is represented ONLY by
    * its persisted state — its text is never touched. */
  def probe(batch: DataFrame, idCol: String, textCol: String, path: String,
            threshold: Double): DataFrame = {
    require(threshold > 0 && threshold <= 1, "threshold must be in (0, 1]")
    val spark = batch.sparkSession
    val (shingleN, numHashes, bands, maxBucket) = readMeta(spark, path)
    val s = signed(batch, idCol, textCol, shingleN, numHashes, bands)
    // cap the BATCH side only (batch-sized window): the persisted bands
    // were capped at build/append time, so the index scan stays a scan —
    // no window, no shuffle of corpus-sized state per probe. hs_new
    // rides along through the band pipeline (batch-sized payload) so
    // the batch is signed exactly ONCE — a separate hs join-back would
    // re-run the signing scan for its branch of the self-join.
    val batchBands = Dedup.capBuckets(
      s.select(col("id").as("new_id"), col("hs").as("hs_new"),
          explode(col("bk")).as("bk"))
        .select(col("bk.band").as("band"), col("bk.bucket").as("bucket"),
          col("new_id"), col("hs_new")),
      Seq("band", "bucket"), maxBucket)
    val cands = spark.read.parquet(bandsPath(path))
      .join(batchBands, Seq("band", "bucket"))
      .select(col("new_id"), col("id").as("indexed_id"), col("hs_new"))
      .dropDuplicates("new_id", "indexed_id")
    val eps = 1e-6 // round-to-6 boundary slack (see Dedup.RoundSlack)
    // primitive long arrays: Spark's own array_intersect takes its
    // specialized hash-set path here (the string-array gap IntersectSize
    // exists for does not apply)
    val inter = size(array_intersect(col("hs_new"), col("hs_old")))
    val j = {
      val u = size(col("hs_new")) + size(col("hs_old")) - col("__i")
      when(u === 0, lit(0.0)).otherwise(col("__i").cast("double") / u)
    }
    // shuffle_hash: cands sits above a join+dedup, where the static
    // size estimate is garbage — a statically-chosen broadcast of a
    // data-driven candidate set is the failure AQE cannot undo (see
    // Dedup.jaccardSimilarityJoin's verify; observed at the 100× sweep)
    cands.hint("shuffle_hash")
      .join(spark.read.parquet(docsPath(path))
        .select(col("id").as("indexed_id"), col("hs").as("hs_old"))
        .hint("shuffle_hash"),
        Seq("indexed_id"))
      // size-ratio bound carries the same eps slack as the sorted
      // screen: the final compare admits round(J,6) >= θ (J ≥ θ−5e-7)
      .filter(size(col("hs_new")) * lit(1.0) >= size(col("hs_old")) * (threshold - eps) &&
        size(col("hs_old")) * lit(1.0) >= size(col("hs_new")) * (threshold - eps))
      .filter(graft.functions.NativeExpressions.sorted_jaccard_ge(
        col("hs_new"), col("hs_old"), threshold - eps))
      .withColumn("__i", inter)
      .withColumn("jaccard", round(j, 6))
      .filter(col("jaccard") >= threshold)
      .select(col("new_id"), col("indexed_id"), col("jaccard"))
  }
}
