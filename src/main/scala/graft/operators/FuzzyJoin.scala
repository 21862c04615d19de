package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.FuzzyExpressions

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
  * block-then-verify: candidates come from an EQUI-join on an 8-byte
  * hash of the variant, which Catalyst plans as a hash shuffle join
  * (AQE-splittable, skew-safe), never a cartesian.
  *
  * 100 TB shape — what actually rides the shuffles: the candidate
  * join exchanges ONLY (xxhash64(string), xxhash64(variant)) pairs —
  * 16 bytes × (|s|+1) rows per string, so shuffle bytes are linear in
  * Σ|s| regardless of key length (an earlier form shuffled the full
  * string once per variant → quadratic bytes in |s|). Strings
  * themselves are exchanged exactly twice, in the id→string
  * re-attach joins. Hash collisions are correctness-neutral by
  * construction: variant-hash collisions only ADD candidates (killed
  * by the levenshtein verify), and string-id collisions are absorbed
  * by keeping `<=` self-pairs in candidate generation (see inline
  * note). For a distinct-key frame of D strings of mean length L the
  * shuffle is O(D·L) bytes vs the O(D²) comparisons of the theta
  * join the oracle runs (fine at gate scale, impossible at 10⁹ keys).
  */
object FuzzyJoin {

  /** The deletion-1 neighborhood of `s`: `s` itself plus every string
    * obtained by deleting one character. `array_union` dedups repeated
    * variants (e.g. "aa" → "a" twice) so the explode fan-out is
    * minimal and candidate pairs arrive pre-deduped per shared variant.
    *
    * This higher-order-function form is the executable SPEC; the hot
    * path ([[editDistance1Pairs]]) uses the codegen'd native twin
    * [[graft.functions.FuzzyExpressions.deletionNeighborhood]], which
    * is property-tested identical to this (RetrievalFuzzyIncrementalSpec).
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
    *
    * `maxLen` guards the |s|+1 variant fan-out: a single megabyte-long
    * key would explode into a million candidate rows and the verify
    * step's O(|a|·|b|) levenshtein would dominate. Keys longer than
    * `maxLen` fail the job loudly (raise_error) rather than silently
    * degrading — edit-distance-1 blocking is a short-key (names,
    * titles, URLs) algorithm; chunk or fingerprint longer text
    * upstream (e.g. [[Dedup.substringWindowPairs]]).
    */
  def editDistance1Pairs(df: DataFrame, strCol: String, maxLen: Int = 1024): DataFrame = {
    val guarded = when(length(col(strCol)) <= maxLen, col(strCol))
      .otherwise(raise_error(concat(
        lit(s"graft.FuzzyJoin: key exceeds maxLen=$maxLen chars: '"),
        col(strCol).substr(lit(1), lit(40)), lit("…'"))))
    // NULL keys are dropped, not guarded: length(NULL) <= maxLen is
    // NULL, which would fall through to the raise_error branch and
    // abort the job on a row the operator is documented to ignore
    val keys = df.filter(col(strCol).isNotNull)
      .select(guarded.as("_s")).distinct()
      .withColumn("_id", xxhash64(col("_s")))
    // only 8-byte ids and 8-byte variant hashes ride the candidate
    // shuffle; the strings stay behind in `keys`
    val vars = keys.select(col("_id"),
        explode(FuzzyExpressions.deletionNeighborhood(col("_s"))).as("_v"))
      .select(col("_id"), xxhash64(col("_v")).as("_vh"))
    val a = vars.select(col("_id").as("_ida"), col("_vh"))
    val b = vars.select(col("_id").as("_idb"), col("_vh"))
    // `<=`, not `<`: if two DISTINCT strings collide on _id, their
    // pair would otherwise vanish here (both orientations fail a
    // strict inequality on equal ids). Keeping the diagonal costs one
    // self-candidate row per id; the string-level a < b below drops
    // true self-pairs and orients survivors.
    val cand = a.join(b, "_vh").filter(col("_ida") <= col("_idb"))
      .select("_ida", "_idb").distinct()
    cand
      .join(keys.select(col("_id").as("_ida"), col("_s").as("_sa")), "_ida")
      .join(keys.select(col("_id").as("_idb"), col("_s").as("_sb")), "_idb")
      // id order ≠ string order — normalize, then a < b drops self-pairs
      .select(least(col("_sa"), col("_sb")).as("a"),
              greatest(col("_sa"), col("_sb")).as("b"))
      .filter(col("a") < col("b"))
      // on a string-id collision the diagonal candidate fans out to
      // BOTH orientations of the colliding pair, which least/greatest
      // fold to the same row — dedup so collisions stay fully
      // neutral (cost: one exchange of verified pairs, the small end
      // of the funnel)
      .distinct()
      .withColumn("dist", levenshtein(col("a"), col("b")).cast("long"))
      .filter(col("dist") <= 1)
      .select("a", "b", "dist")
  }
}
