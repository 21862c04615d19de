package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance-1 similarity self-join via deletion neighborhoods
  * (the FastSS blocking scheme: Bocek et al., "Fast Similarity Search
  * in Large Dictionaries", 2007).
  *
  * Entity-resolution / near-key dedup building block: finds every pair
  * of strings within Levenshtein distance 1 (one substitution,
  * insertion, or deletion — typo-level variants of titles, names,
  * URLs) WITHOUT the naive N² theta join.
  *
  * Completeness: two strings at distance ≤ 1 always share a member of
  * their deletion-1 neighborhoods (delete the edited position from
  * both sides, or the inserted char from the longer). The converse
  * fails — "ab"/"ba" share variants "a" and "b" at distance 2 — so an
  * exact `levenshtein` verify runs on candidates only. Classic
  * block-then-verify: candidates come from an EQUI-join on the variant
  * string, which Catalyst plans as a hash shuffle join (AQE-splittable,
  * skew-safe), never a cartesian.
  *
  * 100 TB shape: the exploded frame carries |s|+1 variant rows per
  * string — linear fan-out, partitioned by variant hash; the verify
  * touches only hash-colliding candidates. For a distinct-key frame of
  * D strings of mean length L the shuffle is O(D·L) short rows, vs the
  * O(D²) comparisons of the theta join the oracle runs (fine at gate
  * scale, impossible at 10⁹ keys).
  */
object FuzzyJoin {

  /** The deletion-1 neighborhood of `s`: `s` itself plus every string
    * obtained by deleting one character. `array_union` dedups repeated
    * variants (e.g. "aa" → "a" twice) so the explode fan-out is
    * minimal and candidate pairs arrive pre-deduped per shared variant.
    */
  def deletionNeighborhood(s: Column): Column = {
    val dels = transform(sequence(lit(1), length(s)),
      i => concat(s.substr(lit(1), i - lit(1)), s.substr(i + lit(1), length(s))))
    // sequence(1, 0) would yield a DESCENDING [1, 0] — guard empties
    when(length(s) > 0, array_union(array(s), dels)).otherwise(array(s))
  }

  /** All unordered pairs (a < b) of distinct values of `strCol` within
    * Levenshtein distance 1. Input rows are deduped on the string
    * first, so callers can pass raw (duplicate-bearing) frames.
    * Output: (a, b, dist) — dist ∈ {1} for distinct strings.
    */
  def editDistance1Pairs(df: DataFrame, strCol: String): DataFrame = {
    val vars = df.select(col(strCol).as("_s")).distinct()
      .select(col("_s"), explode(deletionNeighborhood(col("_s"))).as("_v"))
    val a = vars.select(col("_s").as("a"), col("_v"))
    val b = vars.select(col("_s").as("b"), col("_v"))
    a.join(b, "_v")
      .filter(col("a") < col("b"))
      .select("a", "b").distinct() // multiple shared variants → one candidate
      .filter(levenshtein(col("a"), col("b")) <= 1)
      .withColumn("dist", levenshtein(col("a"), col("b")).cast("long"))
  }
}
