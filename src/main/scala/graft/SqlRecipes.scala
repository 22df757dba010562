package graft

import org.apache.spark.sql.SparkSession

/** SQL-surface parity for the flagship operator library (round-10
  * verdict #6): the 16 native functions already reach every Thrift
  * session via GraftExtensions, but the operator LIBRARY (sessionize,
  * funnel, as-of join, dedup, resample, near-dup) was DSL-only — a
  * JDBC/BI analyst could not call it. These are the five most useful
  * operators re-expressed as Spark 4 SQL TABLE FUNCTIONS
  * (`CREATE FUNCTION ... RETURNS TABLE ... RETURN <query>`): pure SQL
  * text an analyst can paste into ANY connection (beeline, hive-jdbc,
  * a BI tool) and then call like a table — no Scala, no jar.
  *
  * Each body is the SAME plan shape as its DSL twin — one key-hash
  * exchange for the window ops, the union+LOCF single-exchange design
  * for as-of/resample, banded self-join (never all-pairs) for
  * near-dup — so the 100 TB contracts carry over verbatim. Parity
  * with the DSL operators is spec'd row-for-row (SqlRecipesSpec) and
  * one recipe is proven over the wire on a FRESH Thrift connection
  * (JdbcServerSpec): the fresh session runs the DDL itself, exactly
  * as a cookbook user would.
  *
  * `prefix` qualifies the table views: "" for a session with plain
  * temp views (SqlRunner), "global_temp." for a derived JDBC session
  * (each Thrift connection sees only the global views — see
  * [[JdbcServer.start]]).
  */
object SqlRecipes {

  /** ts (TIMESTAMP_NTZ in the synthetic tables) -> fractional-second
    * epoch: NTZ refuses a direct numeric cast, the LTZ hop is identity
    * under the pinned UTC session (the sessionize convention). */
  private val T = "CAST(CAST(ts AS TIMESTAMP_LTZ) AS DOUBLE)"

  /** name -> CREATE OR REPLACE TEMPORARY FUNCTION statement. */
  def ddl(prefix: String): Seq[(String, String)] = Seq(

    // -- sessionize: gap > gap_sec starts a new session (strict, the
    // DSL contract); ONE user-keyed exchange, both windows share it.
    "graft_sessionize" ->
      s"""CREATE OR REPLACE TEMPORARY FUNCTION graft_sessionize(gap_sec BIGINT)
         |RETURNS TABLE (user_id BIGINT, event_id BIGINT, ts_epoch DOUBLE,
         |               session_id BIGINT)
         |RETURN
         |WITH e AS (
         |  SELECT user_id, event_id, $T AS t FROM ${prefix}events),
         |g AS (
         |  SELECT user_id, event_id, t,
         |    CASE WHEN t - LAG(t) OVER
         |           (PARTITION BY user_id ORDER BY t, event_id)
         |           > graft_sessionize.gap_sec
         |         OR LAG(t) OVER
         |           (PARTITION BY user_id ORDER BY t, event_id) IS NULL
         |         THEN 1L ELSE 0L END AS new_s
         |  FROM e)
         |SELECT user_id, event_id, t AS ts_epoch,
         |  SUM(new_s) OVER (PARTITION BY user_id ORDER BY t, event_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
         |FROM g""".stripMargin,

    // -- 3-stage funnel: greedy min-time cascade with null propagation
    // (the DSL semantics); one user-keyed agg carries the per-user
    // array, the roll-up is a tiny global aggregate.
    "graft_funnel" ->
      s"""CREATE OR REPLACE TEMPORARY FUNCTION graft_funnel(
         |  s1 STRING, s2 STRING, s3 STRING)
         |RETURNS TABLE (stage_idx INT, stage STRING, users BIGINT,
         |               conversion DOUBLE)
         |RETURN
         |WITH pu AS (
         |  SELECT user_id, collect_list(struct($T AS t, event_type AS et)) AS evs
         |  FROM ${prefix}events
         |  WHERE event_type IN (graft_funnel.s1, graft_funnel.s2, graft_funnel.s3)
         |  GROUP BY user_id),
         |c1 AS (
         |  SELECT evs, array_min(transform(
         |    filter(evs, x -> x.et = graft_funnel.s1), x -> x.t)) AS t1
         |  FROM pu),
         |c2 AS (
         |  SELECT evs, t1, array_min(transform(
         |    filter(evs, x -> x.et = graft_funnel.s2 AND x.t >= t1),
         |    x -> x.t)) AS t2
         |  FROM c1),
         |c3 AS (
         |  SELECT t1, t2, array_min(transform(
         |    filter(evs, x -> x.et = graft_funnel.s3 AND x.t >= t2),
         |    x -> x.t)) AS t3
         |  FROM c2),
         |s AS (
         |  SELECT 1 AS stage_idx, graft_funnel.s1 AS stage,
         |         count(t1) AS users FROM c3
         |  UNION ALL SELECT 2, graft_funnel.s2, count(t2) FROM c3
         |  UNION ALL SELECT 3, graft_funnel.s3, count(t3) FROM c3)
         |SELECT stage_idx, stage, users,
         |  CASE WHEN first_users > 0
         |       THEN round(users / first_users, 6) END AS conversion
         |FROM (SELECT s.*, max(CASE WHEN stage_idx = 1 THEN users END)
         |        OVER () AS first_users FROM s)""".stripMargin,

    // -- as-of join (self, typed): each `anchor` event matched to the
    // latest at-or-before `ref` event of the same user — the
    // union+LOCF single-exchange design (refs sort before anchors at
    // equal ts, so "at" is inclusive; no join, no range scan).
    "graft_asof_prior" ->
      s"""CREATE OR REPLACE TEMPORARY FUNCTION graft_asof_prior(
         |  anchor STRING, ref STRING)
         |RETURNS TABLE (user_id BIGINT, event_id BIGINT, ts_epoch DOUBLE,
         |               ref_ts_epoch DOUBLE)
         |RETURN
         |WITH u AS (
         |  SELECT user_id, event_id, $T AS t, event_type,
         |    CASE WHEN event_type = graft_asof_prior.ref THEN $T END AS rt
         |  FROM ${prefix}events
         |  WHERE event_type IN (graft_asof_prior.anchor, graft_asof_prior.ref))
         |SELECT user_id, event_id, ts_epoch, ref_ts_epoch FROM (
         |  SELECT user_id, event_id, t AS ts_epoch, event_type,
         |    last(rt, true) OVER (PARTITION BY user_id
         |      ORDER BY t,
         |        CASE WHEN event_type = graft_asof_prior.ref THEN 0 ELSE 1 END,
         |        event_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      AS ref_ts_epoch
         |  FROM u)
         |WHERE event_type = graft_asof_prior.anchor""".stripMargin,

    // -- exact dedup, keep-LAST by doc_id (the explicit-tiebreak DSL
    // contract): one content-hash exchange, rank-1 filter.
    "graft_dedup_docs" ->
      s"""CREATE OR REPLACE TEMPORARY FUNCTION graft_dedup_docs()
         |RETURNS TABLE (doc_id BIGINT, lang STRING, source STRING,
         |               text STRING)
         |RETURN
         |SELECT doc_id, lang, source, text FROM (
         |  SELECT doc_id, lang, source, text,
         |    ROW_NUMBER() OVER (PARTITION BY md5(text)
         |      ORDER BY doc_id DESC) AS rn
         |  FROM ${prefix}documents)
         |WHERE rn = 1""".stripMargin,

    // -- resample + LOCF: per-user regular grid from first to last
    // observation, carrying the latest at-or-before value — the
    // union+LOCF single-exchange design (grid rows union with
    // observations; obs sort before grid instants they equal, so "at"
    // is inclusive). Duplicate (user, t) observations collapse to the
    // highest event_id first (asOfJoin's right-unique contract).
    "graft_resample" ->
      s"""CREATE OR REPLACE TEMPORARY FUNCTION graft_resample(step_sec BIGINT)
         |RETURNS TABLE (user_id BIGINT, grid_epoch DOUBLE, value DOUBLE)
         |RETURN
         |WITH o AS (
         |  SELECT user_id, t, value FROM (
         |    SELECT user_id, $T AS t, value,
         |      ROW_NUMBER() OVER (PARTITION BY user_id, $T
         |        ORDER BY event_id DESC) AS rn
         |    FROM ${prefix}events) WHERE rn = 1),
         |b AS (
         |  SELECT user_id,
         |    CAST(floor(min(t) / graft_resample.step_sec)
         |      * graft_resample.step_sec AS BIGINT) AS lo,
         |    CAST(floor(max(t) / graft_resample.step_sec)
         |      * graft_resample.step_sec AS BIGINT) AS hi
         |  FROM o GROUP BY user_id),
         |grid AS (
         |  SELECT user_id, explode(sequence(lo, hi, graft_resample.step_sec)) AS g
         |  FROM b),
         |u AS (
         |  SELECT user_id, t AS x, value, 1 AS is_obs FROM o
         |  UNION ALL
         |  SELECT user_id, CAST(g AS DOUBLE), CAST(NULL AS DOUBLE), 0
         |  FROM grid)
         |SELECT user_id, x AS grid_epoch, locf AS value FROM (
         |  SELECT user_id, x, is_obs,
         |    last(CASE WHEN is_obs = 1 THEN value END, true) OVER (
         |      PARTITION BY user_id ORDER BY x, is_obs DESC
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS locf
         |  FROM u)
         |WHERE is_obs = 0""".stripMargin,

    // -- portable HLL distinct estimate: the a37 sketch in pure SQL —
    // multiply-xorshift-fold mixer, bit-op registers, exact
    // scaled-integer Z; one 64-key agg.
    "graft_hll_distinct" ->
      s"""CREATE OR REPLACE TEMPORARY FUNCTION graft_hll_distinct()
         |RETURNS TABLE (m BIGINT, registers_hit BIGINT, estimate DOUBLE)
         |RETURN
         |WITH h0 AS (
         |  SELECT (((user_id % 2147483648L) + 2147483648L) % 2147483648L)
         |    * 2654435761L AS a
         |  FROM ${prefix}events WHERE user_id IS NOT NULL),
         |h1 AS (SELECT a ^ shiftright(a, 31) AS b FROM h0),
         |h2 AS (SELECT (b & 2147483647L) * 2654435761L AS c FROM h1),
         |h AS (SELECT c ^ shiftright(c, 31) AS w FROM h2),
         |r AS (
         |  SELECT w & 63L AS idx,
         |    CASE WHEN shiftright(w, 6) = 0 THEN 57
         |         ELSE bit_count((shiftright(w, 6)
         |                & -shiftright(w, 6)) - 1) + 1
         |    END AS rho
         |  FROM h),
         |regs AS (SELECT idx, MAX(rho) AS rho FROM r GROUP BY idx),
         |a2 AS (
         |  SELECT COUNT(*) AS hit,
         |    SUM(shiftleft(1L, CAST(57 - rho AS INT))) AS z
         |  FROM regs),
         |f AS (
         |  SELECT hit,
         |    CAST(z + (64L - hit) * 144115188075855872L AS DOUBLE)
         |      / 144115188075855872D AS zz
         |  FROM a2)
         |SELECT 64L AS m, hit AS registers_hit,
         |  ROUND(CASE WHEN 0.709D * 64D * 64D / zz <= 2.5D * 64D
         |                  AND (64L - hit) > 0
         |             THEN 64D * ROUND(ln(64D
         |                    / CAST(64L - hit AS DOUBLE)), 6)
         |             ELSE 0.709D * 64D * 64D / zz END, 6) AS estimate
         |FROM f""".stripMargin,

    // -- perceptual-hash media near-dup over the native ahash62:
    // 16-bit band buckets + bit_count hamming verify, never all-pairs.
    "graft_phash_neardup" ->
      s"""CREATE OR REPLACE TEMPORARY FUNCTION graft_phash_neardup(
         |  max_hamming INT)
         |RETURNS TABLE (id_a BIGINT, id_b BIGINT, hamming INT)
         |RETURN
         |WITH h AS (
         |  SELECT doc_id, ahash62(CAST(text AS BINARY)) AS ah
         |  FROM ${prefix}documents),
         |b AS (
         |  SELECT doc_id, ah, band,
         |    CAST(shiftright(ah, CAST(band * 16 AS INT)) & 65535L
         |      AS INT) AS bk
         |  FROM h LATERAL VIEW explode(sequence(0, 3)) AS band)
         |SELECT DISTINCT a.doc_id AS id_a, b2.doc_id AS id_b,
         |  CAST(bit_count(a.ah ^ b2.ah) AS INT) AS hamming
         |FROM b a JOIN b b2
         |  ON a.band = b2.band AND a.bk = b2.bk
         |  AND a.doc_id < b2.doc_id
         |WHERE bit_count(a.ah ^ b2.ah)
         |  <= graft_phash_neardup.max_hamming""".stripMargin,

    // -- SimHash near-dup pairs: banded self-join over the native
    // portable_simhash — 62 bits in 4 contiguous blocks, pigeonhole
    // guarantees every pair within hamming <= 3 shares a block, so
    // candidates come from band-key buckets, NEVER an all-pairs join.
    "graft_neardup" ->
      s"""CREATE OR REPLACE TEMPORARY FUNCTION graft_neardup(max_hamming INT)
         |RETURNS TABLE (doc_a BIGINT, doc_b BIGINT, hamming INT)
         |RETURN
         |WITH h AS (
         |  SELECT doc_id,
         |    portable_simhash(filter(split(trim(text), '\\\\s+'),
         |      t -> t != '')) AS sh
         |  FROM ${prefix}documents),
         |b AS (
         |  SELECT doc_id, sh, band,
         |    CAST(shiftright(sh, band * 16) & 65535 AS INT) AS k
         |  FROM h LATERAL VIEW explode(sequence(0, 3)) AS band)
         |SELECT DISTINCT a.doc_id AS doc_a, b2.doc_id AS doc_b,
         |  CAST(bit_count(a.sh ^ b2.sh) AS INT) AS hamming
         |FROM b a JOIN b b2
         |  ON a.band = b2.band AND a.k = b2.k AND a.doc_id < b2.doc_id
         |WHERE bit_count(a.sh ^ b2.sh) <= graft_neardup.max_hamming"""
        .stripMargin
  )

  /** Run every recipe's DDL on the session (idempotent — CREATE OR
    * REPLACE). SqlRunner calls this with prefix = "" after the views
    * register; a JDBC analyst runs the same statements from the
    * README cookbook over the wire with prefix = "global_temp.". */
  def register(spark: SparkSession, prefix: String = ""): Unit =
    ddl(prefix).foreach { case (_, stmt) => spark.sql(stmt) }
}
