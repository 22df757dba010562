package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join operators (SURVEY.md §2.3 J1–J7).
  *
  * The reference's joins are all fact ⋈ small-vocab or fact ⋈ fact on the
  * entity key. Scale rules encoded here: dimension sides are broadcast
  * explicitly (no shuffle of the fact table); fact⋈fact joins shuffle on
  * the entity key, the same partitioning the window ops reuse.
  */
object Joins {

  /** J1/J2: left equi-join with an explicitly broadcast dimension side.
    * (`code/RCLIF_vitals.Rmd:41`, `code/RCLIF_labs.Rmd:46`.) */
  def broadcastLeft(fact: DataFrame, dim: DataFrame,
                    keys: Seq[String]): DataFrame =
    fact.join(broadcast(dim), keys, "left")

  /** J5: left semi — filter fact to rows with a vocab match, adding no
    * columns (`code/RCLIF_medications.Rmd:146,189`). */
  def semi(fact: DataFrame, filterTo: DataFrame, keys: Seq[String]): DataFrame =
    fact.join(broadcast(filterTo), keys, "left_semi")

  /** Anti-join: rows with NO match (QC `setdiff`-style checks). */
  def anti(fact: DataFrame, except: DataFrame, keys: Seq[String]): DataFrame =
    fact.join(broadcast(except), keys, "left_anti")

  /** J4: full outer join keeping unmatched rows from both sides
    * (`code/RCLIF_vitals.Rmd:124`). */
  def fullOuter(l: DataFrame, r: DataFrame, keys: Seq[String]): DataFrame =
    l.join(r, keys, "full_outer")

  /** Escape a string column's value for literal use inside a Java regex.
    * Pure Catalyst (no UDF): wraps the value in \Q...\E and neutralizes any
    * embedded \E, exactly what java.util.regex.Pattern.quote does.
    */
  def regexQuote(c: Column): Column =
    concat(lit("\\Q"), regexp_replace(c, "\\\\E", "\\\\E\\\\\\\\E\\\\Q"), lit("\\E"))

  /** J6: regex theta-join — each vocab term matched as a whole word,
    * case-insensitively, against a text column
    * (`code/RCLIF_medications.Rmd:111-125`). Vocab side must be small: the
    * plan is a broadcast nested-loop join (cross join + non-equi regex
    * predicate), cost O(|fact| × |vocab|) regex evaluations. The reference
    * does exactly this via rowwise()+sapply; distinct-ing the fact names
    * first (as the reference does at :98-101) keeps the left side small.
    *
    * @param pattern builds the regex from the (already quoted) term column.
    */
  def regexVocabJoin(fact: DataFrame, vocab: DataFrame, textCol: String,
                     termCol: String,
                     pattern: Column => Column =
                       t => concat(lit("(?i)\\b"), t, lit("\\b")))
      : DataFrame =
    fact.crossJoin(broadcast(vocab))
      .filter(regexp_like(col(textCol), pattern(regexQuote(col(termCol)))))

  /** J7: disambiguation helper — prefix every column, so post-join
    * references are explicit instead of R's .x/.y suffixes. */
  def prefixed(df: DataFrame, prefix: String): DataFrame =
    df.toDF(df.columns.map(c => s"$prefix$c"): _*)
}
