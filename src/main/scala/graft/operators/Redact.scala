package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII redaction: replace emails, phone numbers, and IPv4 addresses
  * with typed sentinel tokens (`<EMAIL>`, `<PHONE>`, `<IP>`) and count
  * what was removed — the scrubbing pass every pretraining corpus runs
  * before anything is tokenized or shipped (GDPR/CCPA hygiene; the
  * C4 / RefinedWeb pipelines both carry an equivalent stage). The
  * reference (a 631-line personal-ETL, `populate_from_json.py`) has no
  * counterpart; this is extension-tier scope.
  *
  * Pattern discipline: all three regexes are deliberately restricted
  * to constructs where Java's leftmost-first backtracking and RE2's
  * leftmost-longest matching provably agree — greedy character
  * classes and bounded repeats only, alternations whose branches are
  * mutually exclusive at any given start position, no backreferences,
  * no lookaround. That is what lets a DuckDB oracle (RE2) replay the
  * Spark result (java.util.regex) byte-for-byte. The supported
  * dialect is therefore a documented SUBSET of real-world PII
  * spellings (four phone layouts, strict dotted-quad IPv4) — the
  * oracle-replayability tradeoff; widening it means proving each new
  * branch into the same agreeing subset.
  *
  * Redaction ORDER is part of the contract: emails first (an email's
  * domain may embed an IP literal), then phones, then IPs; each
  * count is taken on the text as it stood when that pass ran, so the
  * three counts are disjoint by construction. Sentinels contain no
  * digits or `@`, so a later pass can never match inside an earlier
  * pass's replacement.
  *
  * 100 TB shape: a pure per-row projection — `regexp_replace` /
  * `regexp_count` are codegen'd Catalyst expressions, no UDF, no
  * shuffle, no state; the operator composes into any scan and keeps
  * whole-stage codegen intact. On a stream it is a stateless
  * `select` (see q156): scrubbing happens at ingest latency with no
  * watermark or state store.
  */
object Redact {

  /** Local-part @ domain-labels . TLD(2+ alpha). Greedy classes only. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Phone layouts: `+C{1,2}-NNN-NNN-NNNN` (international prefix),
    * `(NNN) NNN-NNNN`, `NNN-NNN-NNNN`, `NNN.NNN.NNNN`. The top-level
    * alternation stays in the Java∩RE2-agreeing subset because no two
    * branches can match at the same start position (each is pinned by
    * its first char / separator and the digit-initial branches are
    * word-bounded with fixed digit counts), so leftmost-first (Java)
    * and leftmost-longest (RE2) pick the same branch. Bare
    * unseparated 10-digit runs are DELIBERATELY not matched — in a
    * pretraining corpus those are ids/timestamps/quantities far more
    * often than phones, and the false-positive cost of scrubbing them
    * is asymmetric.
    */
  val PhoneRe = "\\+\\d{1,2}-\\d{3}-\\d{3}-\\d{4}" +
    "|\\(\\d{3}\\) \\d{3}-\\d{4}" +
    "|\\b\\d{3}-\\d{3}-\\d{4}\\b" +
    "|\\b\\d{3}\\.\\d{3}\\.\\d{4}\\b"

  /** One IPv4 octet, 0–255 exactly (no leading-zero forms): branch
    * order is longest-first and the dot/word-boundary structure pins
    * each octet to a whole digit run, so Java's ordered backtracking
    * and RE2's leftmost-longest agree on every match.
    */
  private val Oct = "(?:25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])"

  /** Dotted-quad IPv4 with VALID octets only (`999.999.999.999` is
    * not an address and is not redacted), word-bounded so digit runs
    * inside longer numbers don't anchor a match (RE2 and Java agree
    * on `\b`).
    */
  val IpRe = s"\\b$Oct\\.$Oct\\.$Oct\\.$Oct\\b"

  val EmailToken = "<EMAIL>"
  val PhoneToken = "<PHONE>"
  val IpToken = "<IP>"

  /** Adds `n_emails`, `n_phones`, `n_ips`, `clean_text` to `df`.
    * Counts are per-pass (emails on the input text, phones on the
    * email-redacted text, IPs on the phone-redacted text) — disjoint
    * and exactly replayable.
    */
  def redactPii(df: DataFrame, textCol: String): DataFrame =
    piiColumns(textCol).foldLeft(df) { case (d, (name, c)) =>
      d.withColumn(name, c)
    }

  /** Checksum-gated credit-card redaction ([[graft.functions
    * .LuhnKernel]]): adds `clean_text`, `n_cc` (Luhn-valid candidates
    * redacted to `<CC>`), `n_rejected` (candidates that FAILED the
    * mod-10 gate and were left in place — order ids, EANs, tracking
    * numbers). Pure per-row projection.
    */
  def redactCreditCards(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("_c", graft.functions.LuhnExpressions.luhnRedact(col(textCol)))
      .withColumn("clean_text", col("_c.clean_text"))
      .withColumn("n_cc", col("_c.n_cc"))
      .withColumn("n_rejected", col("_c.n_rejected"))
      .drop("_c")

  /** The projection alone (for streaming twins that need the exact
    * same expressions over a `readStream` relation).
    */
  def piiColumns(textCol: String): Seq[(String, Column)] = {
    val t0 = col(textCol)
    val t1 = regexp_replace(t0, EmailRe, EmailToken)
    val t2 = regexp_replace(t1, PhoneRe, PhoneToken)
    Seq(
      "n_emails" -> regexp_count(t0, lit(EmailRe)),
      "n_phones" -> regexp_count(t1, lit(PhoneRe)),
      "n_ips" -> regexp_count(t2, lit(IpRe)),
      "clean_text" -> regexp_replace(t2, IpRe, IpToken))
  }
}
