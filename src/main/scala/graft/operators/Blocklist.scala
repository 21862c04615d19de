package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Domain-blocklist filtering (UT1 / C4-style): a host is blocked
  * when the host itself OR any dot-suffix of it appears in the rule
  * set — `ads.tracker.example.com` is caught by a rule for
  * `tracker.example.com`, `example.com`, or the full host. This is
  * the suffix-match semantic real URL blocklists use (a listed
  * domain bans its whole subtree); it deliberately does NOT involve
  * the PSL — a rule for `co.uk` blocks every .co.uk host, which is
  * exactly what a blocklist author writing `co.uk` means.
  *
  * 100 TB shape: each host explodes into its ≤ label-count suffixes
  * (bounded by hostname label depth, in practice ≤ 6 slim strings),
  * which semi-join the rule set. Real blocklists are millions of
  * rows — still broadcast-sized (UT1 ≈ 4M domains ≈ tens of MB), so
  * the match is map-side with NO shuffle of the corpus; if a rule
  * set ever outgrew broadcast it would become a plain shuffled
  * equi-join on the uniform suffix key. The longest matching suffix
  * wins (most-specific attribution), resolved by one
  * partial-aggregated max_by per doc over the (few) matched rows.
  */
object Blocklist {

  /** Adds `blocked` and `rule` (the LONGEST matching suffix, null if
    * none) to one row per input row. `rules` must have a single
    * string column named `rule`.
    *
    * Hostname matching is case-INSENSITIVE (DNS names are; real
    * UT1/C4 blocklist matching folds case) and tolerant of the
    * fully-qualified trailing dot (`example.com.` ≡ `example.com` —
    * the root-label form): both hosts and rules are lowercased and
    * stripped of one trailing dot before suffixes are built; the
    * attributed `rule` is the normalized form.
    */
  def matchHosts(df: DataFrame, idCol: String, hostCol: String,
      rules: DataFrame): DataFrame = {
    def norm(c: Column): Column = regexp_replace(lower(c), "\\.$", "")
    val ls = split(norm(col(hostCol)), "\\.")
    val sufs = df.select(col(idCol),
        explode(transform(sequence(lit(1), size(ls)),
          k => struct(k.as("_k"),
            array_join(slice(ls, size(ls) - k + 1, k), ".").as("_sfx"))))
          .as("_e"))
      .select(col(idCol), col("_e._k").as("_k"), col("_e._sfx").as("_sfx"))
    val matched = sufs
      .join(broadcast(rules.select(norm(col("rule")).as("_sfx")).distinct()),
        "_sfx")
      .groupBy(idCol)
      .agg(max_by(col("_sfx"), col("_k")).as("rule"))
    df.join(matched, Seq(idCol), "left")
      .withColumn("blocked", col("rule").isNotNull)
  }

  /** [[matchHosts]] as a pure per-row projection: the rule set rides
    * the plan as literals instead of a broadcast join, so the
    * operator is STATELESS and streaming-capable (no aggregation, no
    * join, no state store — ingest-time provenance filtering). Same
    * normalization, same longest-suffix-wins attribution; use this
    * form when the rule set is plan-literal-sized (thousands), the
    * broadcast-join form when it is millions of rows.
    */
  def matchHostsStateless(df: DataFrame, hostCol: String,
      rules: Seq[String]): DataFrame = {
    val normed = rules.map(_.toLowerCase.stripSuffix(".")).distinct
    val ls = split(regexp_replace(lower(col(hostCol)), "\\.$", ""), "\\.")
    // suffixes in ascending label-count order; the LAST match is the
    // longest (most-specific) rule
    val sufs = transform(sequence(lit(1), size(ls)),
      k => array_join(slice(ls, size(ls) - k + 1, k), "."))
    val matched = filter(sufs, s => s.isin(normed: _*))
    df.withColumn("rule",
        when(size(matched) > 0, element_at(matched, -1)))
      .withColumn("blocked", col("rule").isNotNull)
  }
}
