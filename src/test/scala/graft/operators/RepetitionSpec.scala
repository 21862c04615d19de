package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Gopher repetition filters: hand-computed fractions, coverage
  * (overlap counted once), degenerate docs, determinism.
  */
class RepetitionSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Long, String)]) =
    Repetition.report(rows.toDF("doc_id", "text"), "doc_id", "text")
      .orderBy("doc_id").collect()

  test("line and 2-gram fractions: hand-computed") {
    val r = run(Seq((1L, "aa bb\naa bb\ncc"))).head
    assert(r.getLong(1) === 3L)                     // n_lines
    assert(r.getDouble(2) === 0.333333)             // (3-2)/3
    assert(r.getDouble(3) === 0.833333)             // 10/12 chars in dup lines
    // top 2-gram "aa bb" x2, len 5; text len 14 -> 10/14
    assert(r.getDouble(4) === 0.714286)
    assert(r.getDouble(5) === 0.0)                  // only one 5-gram window
    assert(!r.getBoolean(6))
  }

  test("duplicated 5-gram coverage counts overlapping chars once") {
    // "a b c d e" occurs at token 0 and 5 -> all 10 tokens covered
    val r = run(Seq((1L, "a b c d e a b c d e"))).head
    assert(r.getDouble(5) === 1.0)
    // the same phrase 3x with one unique tail token: windows repeat,
    // covered = 15 of 16 token chars
    val r2 = run(Seq((2L, "a b c d e a b c d e a b c d e zz"))).head
    assert(r2.getDouble(5) === 0.882353, r2.toString) // 15/17
  }

  test("degenerate docs: empty text and distinct lines") {
    val out = run(Seq((1L, ""), (2L, "one two three\nfour five six")))
    assert(out(0).getLong(1) === 1L)
    (2 to 5).foreach(i => assert(out(0).getDouble(i) === 0.0, s"col $i"))
    assert(out(0).getBoolean(6))
    assert(out(1).getDouble(2) === 0.0 && out(1).getDouble(3) === 0.0)
  }

  test("kernel ≡ shuffle ≡ HOF rowwise (bit-identical); kernel has zero exchanges") {
    val rnd = new scala.util.Random(17)
    val vocab = Vector("aa", "bb", "cc", "dd", "buy", "now")
    val docs = ((1L to 60L).map { i =>
      val lines = (0 until 2 + rnd.nextInt(4)).map(_ =>
        Seq.fill(3 + rnd.nextInt(9))(vocab(rnd.nextInt(6))).mkString(" "))
      (i, lines.mkString("\n"))
    } ++ Seq((100L, ""), (101L, "one"), (102L, "a b c d"))).toDF("doc_id", "text")
    val kernel = Repetition.report(docs, "doc_id", "text")
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val shuffle = Repetition.reportShuffle(docs, "doc_id", "text")
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val hof = Repetition.reportRowwiseHof(docs, "doc_id", "text")
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(kernel === shuffle)
    assert(kernel === hof)
    val plan = Repetition.reportRowwise(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  /** Adversarial texts for the kernel-vs-legacy bit-identity locks:
    * multi-byte unicode (length = code points), runs of spaces/tabs,
    * odd newline runs ("\n\n\n" paragraph split is leftmost
    * non-overlapping), leading/trailing separators, planted dup
    * phrases across n = 2..10, and ties for the top gram (lex-min in
    * UTF8 byte order decides).
    */
  private val adversarialDocs = Seq(
    (1L, ""), (2L, "one"), (3L, "\n"), (4L, "\n\n"), (5L, "\n\n\n"),
    (6L, "a\n\n\nb"), (7L, "  two  spaces   here  "),
    (8L, "tab\ttok tab\ttok x"), (9L, "é ü é ü é ü 汉字 汉字"),
    (10L, "aa bb aa bb cc\naa bb aa bb cc\n\nzz"),
    (11L, "a b c d e f g h i j a b c d e f g h i j"),
    (12L, "x y x y\nx z x z\n\nx y x z"),
    (13L, "solo para 13\n\nsolo para 13\n\nbuy now buy now buy now buy now"),
    (14L, "trailing newline\n"), (15L, "\nleading newline"),
    (16L, "ß ss ß ss ß\nß ss\n\nß ss"),
    (17L, (1 to 40).map(i => s"w${i % 6}").mkString(" ")),
    (18L, "p one\n\np one\n\np two"),
    (19L, "aa bb\naa bb\ncc"), (20L, "a b c d e a b c d e a b c d e zz"))

  test("kernel ≡ legacy forms on adversarial unicode/whitespace docs (all modes)") {
    val docs = adversarialDocs.toDF("doc_id", "text")
    def seqs(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("doc_id").collect().map(_.toSeq).toSeq
    // basic: kernel vs shuffle vs HOF
    assert(seqs(Repetition.report(docs, "doc_id", "text")) ===
      seqs(Repetition.reportShuffle(docs, "doc_id", "text")))
    assert(seqs(Repetition.report(docs, "doc_id", "text")) ===
      seqs(Repetition.reportRowwiseHof(docs, "doc_id", "text")))
    // full: kernel vs shuffle vs HOF
    assert(seqs(Repetition.reportFull(docs, "doc_id", "text")) ===
      seqs(Repetition.reportFullShuffle(docs, "doc_id", "text")))
    assert(seqs(Repetition.reportFull(docs, "doc_id", "text")) ===
      seqs(Repetition.reportFullRowwiseHof(docs, "doc_id", "text")))
    // capped (caps that BITE on some docs): kernel vs HOF
    assert(seqs(Repetition.reportCapped(docs, "doc_id", "text", 8, 2)) ===
      seqs(Repetition.reportCappedHof(docs, "doc_id", "text", 8, 2)))
    assert(seqs(Repetition.reportCapped(docs, "doc_id", "text", 100, 100)) ===
      seqs(Repetition.reportCappedHof(docs, "doc_id", "text", 100, 100)))
  }

  test("deterministic at any partitioning") {
    val docs = (1L to 40L).map(i =>
      (i, s"line a $i\nline a $i\nbuy now buy now buy now\nunique $i"))
    def go(p: Int) = Repetition.report(
        docs.toDF("doc_id", "text").repartition(p), "doc_id", "text")
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(go(1) === go(7))
  }

  test("capped form equals uncapped on docs under both caps") {
    val docs = Seq(
      (1L, "aa bb\naa bb\ncc"),
      (2L, "a b c d e a b c d e a b c d e zz"),
      (3L, "")).toDF("doc_id", "text")
    val un = Repetition.reportRowwise(docs, "doc_id", "text")
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val cap = Repetition.reportCapped(docs, "doc_id", "text",
        maxTokens = 100, maxLines = 100)
      .orderBy("doc_id").collect()
    assert(cap.forall(!_.getAs[Boolean]("truncated")))
    // same metric values, truncated column dropped
    val capVals = cap.map(r => r.toSeq.patch(6, Nil, 1)).toSeq
    assert(capVals === un)
  }

  test("long-doc guard: 50k-token doc is bounded by the cap, flagged") {
    // uncapped this is ~2.5e9 window comparisons — the straggler the
    // guard exists for; capped at 2000 tokens it is ~4e6 and returns
    // promptly
    val long = (1 to 50000).map(i => s"t${i % 700}").mkString(" ")
    val docs = Seq((1L, long), (2L, "aa bb\naa bb\ncc")).toDF("doc_id", "text")
    val t0 = System.nanoTime()
    val out = Repetition.reportCapped(docs, "doc_id", "text",
        maxTokens = 2000, maxLines = 50)
      .orderBy("doc_id").collect()
    val secs = (System.nanoTime() - t0) / 1e9
    assert(secs < 120.0, s"capped long-doc run took ${secs}s")
    assert(out(0).getAs[Boolean]("truncated"))
    assert(!out(1).getAs[Boolean]("truncated"))
    // the capped prefix of 2000 tokens over a 700-token vocab is
    // saturated with duplicate 5-gram windows
    assert(out(0).getAs[Double]("dup_5gram_char_frac") > 0.5)
  }

  test("batch form: 20k-line doc line metrics are O(L)/doc, bounded") {
    // the pre-r18 filter-inside-aggregate HOF was O(L²) in the doc's
    // own line count — 4×10⁸ comparisons in one task at 20k lines;
    // the explode → within-doc line-group form is O(L)
    val big = (1 to 20000).map(i => s"line ${i % 300}").mkString("\n")
    val t0 = System.nanoTime()
    val out = run(Seq((1L, big), (2L, "aa bb\naa bb\ncc")))
    val secs = (System.nanoTime() - t0) / 1e9
    assert(secs < 120.0, s"20k-line batch run took ${secs}s")
    assert(out(0).getLong(1) === 20000L)
    assert(out(0).getDouble(2) === 0.985) // (20000-300)/20000
    assert(out(0).getDouble(3) === 1.0)   // every line is a dup group
    // the small doc's hand-computed values are untouched by the rewrite
    assert(out(1).getDouble(2) === 0.333333 && out(1).getDouble(3) === 0.833333)
  }

  test("full form: hand-computed paragraph metrics and top-{2,3,4}") {
    // lines: [p one, "", p one, "", p two] → 5, dups {p one×2, ""×2}
    // paras: [p one, p one, p two] → 3; tokens: p one p one p two
    val r = Repetition.reportFull(
        Seq((1L, "p one\n\np one\n\np two")).toDF("doc_id", "text"),
        "doc_id", "text").collect().head
    assert(r.getLong(1) === 5L && r.getDouble(2) === 0.4)
    assert(r.getDouble(3) === 0.666667)            // 10/15 line chars
    assert(r.getLong(4) === 3L && r.getDouble(5) === 0.333333)
    assert(r.getDouble(6) === 0.666667)            // 10/15 para chars
    assert(r.getDouble(7) === 0.526316)            // "one p"×2: 10/19
    assert(r.getDouble(8) === 0.736842)            // "p one p"×2: 14/19
    assert(r.getDouble(9) === 0.578947)            // lex-min 1× 4-gram: 11/19
    (10 to 15).foreach(i => assert(r.getDouble(i) === 0.0, s"col $i"))
    assert(!r.getBoolean(16))                      // dup_line_frac 0.4 > 0.30
  }

  test("full form: a twice-repeated 10-gram saturates every dup-n coverage") {
    val r = Repetition.reportFull(
        Seq((1L, "a b c d e f g h i j a b c d e f g h i j"))
          .toDF("doc_id", "text"), "doc_id", "text").collect().head
    (10 to 15).foreach(i => assert(r.getDouble(i) === 1.0, s"col $i"))
    assert(!r.getBoolean(16))
    // empty text: no paragraphs survive the filter → zeros, pass
    val e = Repetition.reportFull(Seq((1L, "")).toDF("doc_id", "text"),
      "doc_id", "text").collect().head
    assert(e.getLong(4) === 0L)
    ((5 to 15)).foreach(i => assert(e.getDouble(i) === 0.0, s"col $i"))
    assert(e.getBoolean(16))
  }

  test("full form agrees with report on the shared four metrics") {
    val rnd = new scala.util.Random(18)
    val vocab = Vector("aa", "bb", "cc", "dd", "buy", "now")
    val docs = ((1L to 50L).map { i =>
      val paras = (0 until 1 + rnd.nextInt(3)).map(_ =>
        (0 until 1 + rnd.nextInt(3)).map(_ =>
          Seq.fill(3 + rnd.nextInt(9))(vocab(rnd.nextInt(6))).mkString(" "))
          .mkString("\n"))
      (i, paras.mkString("\n\n"))
    } ++ Seq((100L, ""), (101L, "one"))).toDF("doc_id", "text")
    val a = Repetition.reportShuffle(docs, "doc_id", "text")
      .select("doc_id", "n_lines", "dup_line_frac", "dup_line_char_frac",
        "top_2gram_char_frac", "dup_5gram_char_frac")
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val b = Repetition.reportFull(docs, "doc_id", "text")
      .select("doc_id", "n_lines", "dup_line_frac", "dup_line_char_frac",
        "top_2gram_char_frac", "dup_5gram_char_frac")
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(a === b)
  }

  test("full rowwise form is bit-identical to the shuffle form; zero exchanges") {
    val rnd = new scala.util.Random(21)
    val vocab = Vector("aa", "bb", "cc", "dd", "buy", "now")
    val docs = ((1L to 50L).map { i =>
      val paras = (0 until 1 + rnd.nextInt(3)).map(_ =>
        (0 until 1 + rnd.nextInt(3)).map(_ =>
          Seq.fill(3 + rnd.nextInt(12))(vocab(rnd.nextInt(6))).mkString(" "))
          .mkString("\n"))
      (i, paras.mkString("\n\n"))
    } ++ Seq((100L, ""), (101L, "one"),
      (102L, "a b c d e f g h i j a b c d e f g h i j"))).toDF("doc_id", "text")
    val a = Repetition.reportFullShuffle(docs, "doc_id", "text")
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val b = Repetition.reportFullRowwise(docs, "doc_id", "text")
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val c = Repetition.reportFullRowwiseHof(docs, "doc_id", "text")
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(a === b)
    assert(b === c)
    val plan = Repetition.reportFullRowwise(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("line cap truncates before tokenization; token cap on the line-capped text") {
    val docs = Seq((1L, "aa bb\ncc dd\nee ff")).toDF("doc_id", "text")
    val r = Repetition.reportCapped(docs, "doc_id", "text",
        maxTokens = 3, maxLines = 2)
      .collect().head
    assert(r.getAs[Long]("n_lines") === 2L) // third line dropped
    assert(r.getAs[Boolean]("truncated"))   // both caps bit
  }

  test("rowwise maxLines guard: over-limit doc fails LOUDLY with a counted error; under-limit untouched") {
    // a 20k-line doc in a stream would make the O(lines²) dup-char
    // fold a trigger straggler — the guard rejects it with the doc id
    // and line count rather than hanging (semantics of `pass` under
    // the limit are bit-identical to the unguarded form)
    val big = (1 to 20000).map(i => s"line ${i % 7}").mkString("\n")
    val docs = Seq((1L, "aa bb\naa bb"), (2L, big)).toDF("doc_id", "text")
    val e = intercept[Exception] {
      Repetition.reportFullRowwise(docs, "doc_id", "text", maxLines = 5000)
        .collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(m =>
      m.contains("20000") && m.contains("maxLines=5000")), e.toString)
    // under the limit, guarded ≡ unguarded (and the default injects
    // no guard expression at all)
    val small = docs.filter($"doc_id" === 1L)
    val guarded = Repetition.reportFullRowwise(small, "doc_id", "text",
      maxLines = 5000).collect().map(_.toSeq).toSeq
    val plain = Repetition.reportFullRowwise(small, "doc_id", "text")
      .collect().map(_.toSeq).toSeq
    assert(guarded === plain)
  }
}
