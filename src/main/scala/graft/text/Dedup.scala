package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus deduplication at scale: exact, MinHash+LSH, SimHash, and exact
  * n-gram Jaccard verification.
  *
  * Scale design: every flavor reduces to (1) a narrow per-row signature
  * computation, then (2) ONE shuffle on a short signature/bucket key. No
  * all-pairs comparison ever happens — candidate generation is hash-bucket
  * equi-join (LSH bands / simhash bands), so cost is O(n) + per-bucket
  * pair expansion. Skewed buckets (boilerplate shingles) are the known
  * hazard: cap bucket size before pairing.
  */
object Dedup {

  // ---- exact ----

  /** Exact dedup: group rows by content hash, keep the smallest id.
    * One hash-agg shuffle on a 128-bit key; at 100 TB the md5 shuffle key
    * is 16 bytes/row instead of the full text. */
  def exactByContent(df: DataFrame, idCol: String, textCol: String,
                     normalized: Boolean = false): DataFrame = {
    val content = if (normalized) TextOps.normalize(col(textCol)) else col(textCol)
    df.withColumn("content_hash", md5(content))
      .groupBy(col("content_hash"))
      .agg(min(col(idCol)).as("keep_id"),
        count(lit(1)).cast("long").as("n_copies"))
  }

  // ---- shingles / MinHash + LSH ----

  /** Word n-gram shingles (distinct), the unit set for Jaccard.
    * Single expression evaluation per row: the token array is bound once
    * via a `transform` lambda variable, not re-inlined per reference
    * (higher-order lambdas re-evaluate inlined subtrees on every
    * iteration — a 30× slowdown measured at sf0.1). */
  def shingles(text: Column, n: Int): Column = {
    val ts = TextOps.tokens(text)
    // greatest(size-n, 0) covers docs shorter than n tokens: the slice
    // just comes out shorter, yielding one partial shingle.
    array_distinct(transform(sequence(lit(0), greatest(size(ts) - n, lit(0))),
      i => array_join(slice(ts, i + 1, lit(n)), " ")))
  }

  /** MinHash signature: for each of `numHashes` seeded murmur3 hash
    * functions, the min over the shingle set.
    *
    * Structured as ONE fold over the shingle array, hashing each shingle
    * `numHashes` ways and taking the element-wise min — NOT `numHashes`
    * passes over the shingles. The latter re-evaluates the shingle
    * expression once per hash function (Catalyst inlines the subtree into
    * the lambda body), which measured 140s vs <2s at sf0.1.
    */
  def minhashSignature(sh: Column, numHashes: Int): Column =
    aggregate(sh,
      array_repeat(lit(Int.MaxValue), numHashes),
      (acc, s) => zip_with(acc,
        transform(sequence(lit(1), lit(numHashes)), seed => hash(s, seed)),
        (a, b) => least(a, b)))

  /** LSH banding: signature -> array of (bandIndex, bandHash) structs.
    * Two docs collide in a band iff their signature rows in that band are
    * identical — the standard (bands × rows) S-curve knob. */
  def lshBands(sig: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => struct(b.as("band"),
        hash(slice(sig, b * rowsPerBand + 1, lit(rowsPerBand))).as("bucket")))

  /** Candidate pairs via LSH: explode bands, self-join on (band, bucket),
    * keep id1 < id2, distinct. `maxBucket` drops degenerate buckets
    * (boilerplate-heavy corpora produce huge buckets that would explode
    * quadratically — the cap bounds worst-case work; dropped buckets are
    * near-identical boilerplate better handled by exact dedup first).
    */
  def lshCandidates(df: DataFrame, idCol: String, textCol: String,
                    shingleN: Int = 3, numHashes: Int = 32, bands: Int = 8,
                    maxBucket: Int = 1000): DataFrame = {
    val sig = df.select(col(idCol).as("id"),
      minhashSignature(shingles(col(textCol), shingleN), numHashes).as("sig"))
    val banded = sig.select(col("id"), col("sig"),
        explode(lshBands(col("sig"), bands, numHashes / bands)).as("bk"))
      .select(col("id"), col("sig"), col("bk.band"), col("bk.bucket"))
    val small = banded
      .withColumn("bucket_n",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("band"), col("bucket"))))
      .filter(col("bucket_n") <= maxBucket)
      // both sides of the self-join read this; persist so signatures are
      // computed once (at 100 TB this would be a checkpointed table)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val l = small.select(col("band"), col("bucket"), col("id").as("id1"),
      col("sig").as("sig1"))
    val r = small.select(col("band"), col("bucket"), col("id").as("id2"),
      col("sig").as("sig2"))
    l.join(r, Seq("band", "bucket"))
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"),
        round(aggregate(
          zip_with(col("sig1"), col("sig2"), (a, b) => (a === b).cast("int")),
          lit(0), (acc, x) => acc + x).cast("double") / numHashes, 6)
          .as("est_jaccard"))
      .dropDuplicates("id1", "id2")
  }

  /** Exact n-gram Jaccard for a pair of shingle sets. */
  def jaccard(a: Column, b: Column): Column =
    when(size(array_union(a, b)) === 0, lit(0.0)).otherwise(
      size(array_intersect(a, b)).cast("double") / size(array_union(a, b)))

  /** Near-dup pipeline: LSH candidates verified with exact Jaccard ≥
    * threshold. The verify join re-attaches shingle sets by id (shuffle on
    * id — small, candidates only). */
  def nearDuplicates(df: DataFrame, idCol: String, textCol: String,
                     threshold: Double, shingleN: Int = 3,
                     numHashes: Int = 32, bands: Int = 8): DataFrame = {
    val cands = lshCandidates(df, idCol, textCol, shingleN, numHashes, bands)
      .select("id1", "id2")
    val sh = df.select(col(idCol).as("id"),
      shingles(col(textCol), shingleN).as("sh"))
    cands
      .join(sh.select(col("id").as("id1"), col("sh").as("sh1")), Seq("id1"))
      .join(sh.select(col("id").as("id2"), col("sh").as("sh2")), Seq("id2"))
      .withColumn("jaccard", round(jaccard(col("sh1"), col("sh2")), 6))
      .filter(col("jaccard") >= threshold)
      .select("id1", "id2", "jaccard")
  }

  // ---- SimHash ----

  /** 64-bit SimHash over tokens: per-bit vote of xxhash64(token), sign of
    * the vote sets the bit. Near-dups have small Hamming distance. */
  def simhash(text: Column): Column = {
    // hash each token ONCE up front (a lambda-var reference is cheap; an
    // inlined xxhash64 call inside the bit-loop would re-hash 64×/token)
    val hashes = transform(TextOps.tokens(text), t => xxhash64(t))
    val votes = aggregate(hashes,
      array_repeat(lit(0L), 64),
      (acc, h) => zip_with(acc,
        transform(sequence(lit(0), lit(63)),
          j => call_function("shiftright", h, j).bitwiseAND(1L)),
        (a, bit) => a + bit * 2L - 1L))
    aggregate(
      zip_with(votes, sequence(lit(0), lit(63)),
        (v, j) => when(v > 0, call_function("shiftleft", lit(1L), j)).otherwise(lit(0L))),
      lit(0L), (acc, x) => acc.bitwiseOR(x))
  }

  def hammingDistance(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b)).cast("int")

  /** SimHash near-dup candidates: band the 64-bit hash into 4×16-bit keys;
    * docs within Hamming distance ≤ 3 must share at least one band
    * (pigeonhole). Same bucket-join shape as LSH — one shuffle. */
  def simhashCandidates(df: DataFrame, idCol: String, textCol: String,
                        maxHamming: Int = 3): DataFrame = {
    val sh = df.select(col(idCol).as("id"), simhash(col(textCol)).as("sh"))
    val banded = sh.select(col("id"), col("sh"),
      explode(transform(sequence(lit(0), lit(3)),
        b => struct(b.as("band"),
          call_function("shiftright", col("sh"), (b * 16).cast("int")).bitwiseAND(0xFFFFL).as("key"))))
        .as("bk"))
      .select(col("id"), col("sh"), col("bk.band"), col("bk.key"))
    val l = banded.select(col("band"), col("key"), col("id").as("id1"),
      col("sh").as("sh1"))
    val r = banded.select(col("band"), col("key"), col("id").as("id2"),
      col("sh").as("sh2"))
    l.join(r, Seq("band", "key"))
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"),
        hammingDistance(col("sh1"), col("sh2")).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }
}
