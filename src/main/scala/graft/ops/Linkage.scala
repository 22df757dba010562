package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Probabilistic record linkage (Fellegi & Sunter 1969) — the
  * multi-field generalization of the single-field fuzzy join
  * ([[Joins.fuzzyMatchJoin]]): candidate pairs come from BLOCKING
  * (never all-pairs), each field comparison contributes a
  * log-likelihood weight — ln(m/u) on agreement, ln((1−m)/(1−u)) on
  * disagreement, where m = P(agree | same entity) and u =
  * P(agree | different entities) — and the summed score classifies
  * the pair as match / possible (review) / non-match against two
  * thresholds. This is the textbook master-data/dedup-linkage
  * pipeline (Splink, RecordLinkage, Dedupe.io all implement exactly
  * this model) re-expressed as two relational stages.
  *
  * Reference behavior context: the reference repo's pipelines join
  * patient records across hospital tables on exact keys
  * (`code/RCLIF_*.Rmd`); probabilistic linkage is the standard
  * escalation when those keys are dirty.
  */
object Linkage {

  /** Blocked candidate pairs: every row of `a` × every row of `b`
    * WITHIN a shared block key, columns prefixed `a_` / `b_`. The
    * output is Σ_blocks |a-block|·|b-block| rows — the operator's
    * honest cost — so block choice is the scale lever (a key with
    * ~constant block sizes keeps the join linear in rows).
    *
    * `maxBucket` (pairs per block) bounds the damage from a
    * degenerate block (one null-ish key holding 10⁵ rows is a
    * 10¹⁰-pair task): blocks whose |a|·|b| product exceeds the cap
    * are dropped WHOLE — truncation would bias the candidate set —
    * and the dropped-block count is observable as the
    * "linkage_dropped_blocks" Observation (the fuzzyMatchJoin
    * convention). Null block keys never pair (stated contract). */
  def blockedPairs(a: DataFrame, b: DataFrame, blockA: Column,
                   blockB: Column,
                   maxBucket: Option[Long] = None,
                   obsName: String = "linkage_dropped_blocks"): DataFrame = {
    require(maxBucket.forall(_ > 0), "maxBucket must be > 0")
    // spread the PROBE side to full cluster width before the pair
    // expansion: this join's output is quadratically larger than its
    // input, so probe parallelism must never be the input's file
    // count (a small single-file table scans as ONE partition, and a
    // broadcast pair join then runs every candidate comparison in
    // one task — measured 15 s single-core on j19 at sf0.1).
    // Round-robin is the right spread: the build side broadcasts (or
    // the join re-exchanges for SMJ anyway), so no co-location is
    // lost, no block skew is created, and the cost is one
    // INPUT-sized shuffle under an OUTPUT-sized op.
    // the spread width is a performance knob, not a correctness
    // input: on platforms where the conf holds a non-integer value
    // (e.g. "auto"), fall back to cluster default parallelism rather
    // than failing the whole op before planning
    val width = scala.util.Try(
      a.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt)
      .getOrElse(a.sparkSession.sparkContext.defaultParallelism)
    val ap = a.columns.foldLeft(a)((d, c) => d.withColumnRenamed(c, s"a_$c"))
      .withColumn("__blk", blockA).filter(col("__blk").isNotNull)
      .repartition(width)
    val bp = b.columns.foldLeft(b)((d, c) => d.withColumnRenamed(c, s"b_$c"))
      .withColumn("__blk", blockB).filter(col("__blk").isNotNull)
    maxBucket match {
      case None => ap.join(bp, Seq("__blk")).drop("__blk")
      case Some(cap) =>
        val na = ap.groupBy(col("__blk")).agg(count(lit(1)).as("__na"))
        val nb = bp.groupBy(col("__blk")).agg(count(lit(1)).as("__nb"))
        // block-frame join (block-key cardinality, not row scale);
        // the kept-block list rides the SAME key the pair join uses
        val keep = na.join(nb, Seq("__blk"))
          .withColumn("__pairs", col("__na") * col("__nb"))
        val kept = keep
          .observe(obsName,
            sum(when(col("__pairs") > cap, 1L).otherwise(0L))
              .as("dropped"))
          .filter(col("__pairs") <= cap)
          .select(col("__blk"))
        ap.join(kept, Seq("__blk"))
          .join(bp, Seq("__blk")).drop("__blk")
    }
  }

  /** Multi-pass blocking — the standard recall-recovery recipe for
    * blocked linkage: a single fine block key is cheap but loses any
    * true pair whose typo falls INSIDE the key (the records land in
    * different blocks), so production linkage runs SEVERAL cheap
    * passes with complementary keys (Splink's blocking_rules list)
    * and unions the candidate pairs. A true pair survives if ANY
    * pass co-blocks it — pass-union recall is a superset of every
    * single pass by construction.
    *
    * Pair identity for the cross-pass dedup is the full prefixed
    * row (both sides' complete column sets) — two passes emitting
    * the same record pair emit byte-identical rows, so `distinct`
    * is exact. Contract: duplicate source ROWS therefore collapse
    * to one pair (single-pass [[blockedPairs]] would emit one pair
    * per duplicate); dedup linkage wants exactly that.
    *
    * Scale shape: Σ_pass (that pass's Σ_blocks |a|·|b|) candidate
    * rows into ONE distinct shuffle — for P complementary fine keys
    * this is ≤ P× the single-pass cost, each pass individually
    * `maxBucket`-capped (degenerate blocks drop whole, per pass,
    * with the summed `linkage_dropped_blocks` Observation). The
    * scale-safe shape vs one coarse key: P fine passes with
    * ~constant block sizes stay linear where a coarse key's
    * Σ|block|² goes quadratic (BENCH_SF1.md's j19 sweep measures
    * exactly this trade). Observation names are per-pass
    * (`linkage_dropped_blocks_p<i>`) — Spark requires observation
    * names unique within one query. */
  def blockedPairsMultiPass(a: DataFrame, b: DataFrame,
                            passes: Seq[(Column, Column)],
                            maxBucket: Option[Long] = None): DataFrame = {
    require(passes.nonEmpty, "at least one blocking pass")
    passes.zipWithIndex.map { case ((ba, bb), i) =>
        blockedPairs(a, b, ba, bb, maxBucket,
          obsName = s"linkage_dropped_blocks_p$i")
      }
      .reduce(_ unionByName _)
      .distinct()
  }

  /** Blocked edit-distance similarity join — the fuzzy-string join
    * for typo-class noise (ids mistyped, names OCR'd), composing
    * [[blockedPairs]] with a banded Levenshtein: a cheap length
    * filter (|len a − len b| ≤ d is a NECESSARY condition) prunes
    * before the DP, and the DP itself is Spark's THRESHOLDED
    * `levenshtein(a, b, d)` — O(d·min(len)) banded, returning −1 the
    * moment the band is exceeded instead of filling the full matrix.
    * Same honest-cost contract as every blocked op here:
    * Σ_blocks |a|·|b| candidate pairs, `maxBucket` drops degenerate
    * blocks whole with the `linkage_dropped_blocks` Observation.
    *
    * @return the `a_`/`b_`-prefixed pair frame + `edit_dist` (long),
    *         only pairs within `maxDist` */
  def editDistanceJoin(a: DataFrame, b: DataFrame, blockA: Column,
                       blockB: Column, strA: String, strB: String,
                       maxDist: Int,
                       maxBucket: Option[Long] = None): DataFrame = {
    require(maxDist >= 0, "maxDist must be >= 0")
    blockedPairs(a, b, blockA, blockB, maxBucket)
      .filter(col(s"a_$strA").isNotNull && col(s"b_$strB").isNotNull)
      .filter(abs(length(col(s"a_$strA")) -
        length(col(s"b_$strB"))) <= maxDist)
      .withColumn("edit_dist",
        levenshtein(col(s"a_$strA"), col(s"b_$strB"), maxDist)
          .cast("long"))
      .filter(col("edit_dist") >= 0 && col("edit_dist") <= maxDist)
  }

  /** One comparison field: `agree` is a boolean Column over the
    * prefixed pair frame (e.g. `round(jaro_winkler_sim(a_name,
    * b_name), 6) >= 0.95`, `a_nation === b_nation`,
    * `abs(a_bal - b_bal) <= 50`); m / u are the standard
    * conditional-agreement probabilities. */
  final case class LinkField(name: String, agree: Column,
                             m: Double, u: Double) {
    require(m > 0 && m < 1 && u > 0 && u < 1 && m > u,
      s"field $name needs 0 < u < m < 1")
  }

  /** Score + classify an (already blocked) candidate-pair frame.
    * Adds one boolean `<field>_agree` per field, the summed
    * log-likelihood `score`, and `decision`
    * ('match' ≥ upper, 'non_match' ≤ lower, else 'review').
    *
    * Cross-engine determinism: each field's two weights are computed
    * ONCE on the driver as round(ln(·), 6) and enter the plan as
    * exact decimal literals; the per-pair sum is decimal (order-free)
    * with one double cast at the end — a null agreement (null field
    * value) contributes the disagreement weight (can't confirm =
    * doesn't confirm, the conservative linkage convention).
    *
    * Scale shape: pure narrow projection over the pair frame — the
    * cost lives entirely in [[blockedPairs]]. */
  def fellegiSunter(pairs: DataFrame, fields: Seq[LinkField],
                    lower: Double, upper: Double): DataFrame = {
    require(fields.nonEmpty, "at least one comparison field")
    require(lower <= upper, "lower must be <= upper")
    def w6(v: Double): Column = {
      val bd = BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP)
      lit(bd.underlying()).cast("decimal(18,6)")
    }
    val contribs = fields.map { f =>
      val agree = coalesce(f.agree, lit(false))
      (f, agree,
        when(agree, w6(math.log(f.m / f.u)))
          .otherwise(w6(math.log((1 - f.m) / (1 - f.u)))))
    }
    val score = contribs.map(_._3).reduce(_ + _).cast("decimal(18,6)")
    val flagged = pairs.select(
      pairs.columns.map(col) ++
        contribs.map { case (f, agree, _) =>
          agree.as(s"${f.name}_agree")
        } :+ score.cast("double").as("score"): _*)
    flagged.withColumn("decision",
      when(col("score") >= upper, lit("match"))
        .when(col("score") <= lower, lit("non_match"))
        .otherwise(lit("review")))
  }

  /** Entity-resolution clustering — the cluster tail of the ER
    * pipeline (block → [[blockedPairs]] → score → [[fellegiSunter]]
    * → THIS): match pairs become edges over a collision-free numeric
    * node encoding (file-A record = 2·key, file-B record = 2·key+1 —
    * Fellegi–Sunter's two "files"), pointer-jumping connected
    * components ([[graft.text.Dedup.duplicateClusters]], bounded
    * rounds) assign every matched record its entity id — the minimum
    * encoded node id of its component — decoded back to
    * (file, record_key, entity_id). Records with NO match edge are
    * ABSENT by contract: a singleton is its own entity and carrying
    * every unmatched record through the CC join would make the edge
    * frame corpus-sized for no information.
    *
    * Scale shape: inherits duplicateClusters' pointer-jumping
    * contract — O(log diameter) rounds over the EDGE frame (match
    * pairs, already blocked+thresholded upstream), never the corpus.
    *
    * @param matches pair frame holding one row per cross-file match
    * @param aKey    numeric record key of the file-A side
    * @param bKey    numeric record key of the file-B side
    * @param aLabel  the `file` tag emitted for the file-A side
    * @param bLabel  the `file` tag emitted for the file-B side
    * @return (file, record_key, entity_id) */
  def entityClusters(matches: DataFrame, aKey: String, bKey: String,
                     aLabel: String = "a",
                     bLabel: String = "b"): DataFrame = {
    val edges = matches.select(
      (col(aKey) * 2).as("id1"), (col(bKey) * 2 + 1).as("id2"))
    graft.text.Dedup.duplicateClusters(edges)
      .select(
        when(col("id") % 2 === 0, lit(aLabel)).otherwise(lit(bLabel))
          .as("file"),
        expr("id div 2").as("record_key"),
        col("cluster_id").as("entity_id"))
  }
}
