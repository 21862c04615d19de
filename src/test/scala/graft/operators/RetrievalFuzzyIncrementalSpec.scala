package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-10 operators: BM25 retrieval, deletion-neighborhood fuzzy
  * join, incremental materialized-aggregate maintenance.
  */
class RetrievalFuzzyIncrementalSpec extends SparkSpec {
  import spark.implicits._

  // ─────────────────────────── BM25 ───────────────────────────

  test("bm25: hand-computed score on a 3-doc corpus") {
    val docs = Seq(
      (1L, "cat dog cat"),      // tf(cat)=2, dl=3
      (2L, "dog bird"),         // tf(cat)=0
      (3L, "cat fish bird dog") // tf(cat)=1, dl=4
    ).toDF("id", "text")
    val out = Retrieval.bm25TopK(docs, "id", "text", Seq("cat"), k = 10)
      .orderBy("id").as[(Long, Long, Double)].collect()

    // N=3, df=2, avgdl=3; idf = ln(1 + (3-2+0.5)/(2+0.5)) = ln(1.6)
    val idf = math.log(1.0 + (3.0 - 2.0 + 0.5) / (2.0 + 0.5))
    def s(tf: Double, dl: Double): Double = {
      val raw = (idf * (tf * (1.2 + 1.0))) /
        (tf + 1.2 * ((1.0 - 0.75) + 0.75 * (dl / 3.0)))
      BigDecimal(raw).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(out.toSeq === Seq((1L, 3L, s(2, 3)), (3L, 4L, s(1, 4))))
  }

  test("bm25: k truncates by (score desc, id) and non-matching docs drop") {
    val docs = Seq.tabulate(30)(i => (i.toLong, if (i % 3 == 0) "hit word" else "word"))
      .toDF("id", "text")
    val out = Retrieval.bm25TopK(docs, "id", "text", Seq("hit"), k = 5)
      .select("id").as[Long].collect()
    // all matching docs tie on score → id ascending decides
    assert(out.toSeq === Seq(0L, 3L, 6L, 9L, 12L))
  }

  test("termTfs kernel ≡ per-term size(filter(...)) HOFs (random corpora)") {
    val rnd = new scala.util.Random(29)
    val vocab = Seq("cat", "dog", "bird", "fish", "ant", "bee", "猫", "")
    val terms = Seq("cat", "bird", "猫", "absent")
    val docs = Seq.fill(150)(
      Seq.fill(rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      .toDF("text")
      .select(graft.functions.Text.tokens($"text").as("toks"))
    val native = docs.select(
      graft.functions.TextExpressions.termTfs($"toks", terms).as("tfs"))
      .as[Seq[Long]].collect()
    val hof = docs.select(array(terms.map(t =>
        size(filter($"toks", x => x === lit(t))).cast("long")): _*).as("tfs"))
      .as[Seq[Long]].collect()
    assert(native.toSeq === hof.toSeq)
  }

  test("termTfs rejects duplicate terms") {
    intercept[IllegalArgumentException] {
      graft.functions.TextExpressions.termTfs(lit(Array("a")), Seq("a", "a"))
    }
  }

  test("bm25: corpus stats are ONE aggregate and scoring adds no extra shuffle") {
    val docs = Seq((1L, "a b"), (2L, "b c")).toDF("id", "text")
    // the same lock at 2 terms and at 20 — the multi-term path must
    // not regress to per-term shuffles or an explode as T grows
    for (terms <- Seq(Seq("a", "b"),
        (1 to 20).map(i => s"t$i"))) {
      val plan = Retrieval.bm25TopK(docs, "id", "text", terms, k = 5)
        .queryExecution.optimizedPlan.toString
      // no per-term/explode groupBy: exactly one Aggregate (plus its
      // partial) feeding a broadcast — vocabulary never shuffles
      val aggs = "(?m)^\\s*[+:]?-?\\s*Aggregate".r.findAllIn(plan).size
      assert(aggs <= 1,
        s"expected a single logical Aggregate at ${terms.size} terms, got $aggs in:\n$plan")
      assert(!plan.contains("Generate"),
        s"unexpected explode in BM25 plan at ${terms.size} terms:\n$plan")
    }
  }

  // ─────────────────────── FuzzyJoin ───────────────────────

  test("deletionNeighborhood: contents and dedup") {
    val out = Seq("aa", "ab", "").toDF("s")
      .select(FuzzyJoin.deletionNeighborhood($"s").as("n"))
      .as[Seq[String]].collect()
    assert(out(0).toSet === Set("aa", "a"))       // dup deletions collapse
    assert(out(1).toSet === Set("ab", "a", "b"))
    assert(out(2).toSeq === Seq(""))              // empty-string guard
  }

  test("kernel ≡ HOF: native DeletionNeighborhood matches the composable spec, incl. surrogate pairs") {
    val rnd = new scala.util.Random(13)
    // BMP letters, a combining mark, and astral (surrogate-pair)
    // codepoints — the kernel deletes CODEPOINTS, as Spark's
    // length/substr count them, so 𝄞/😀 must come out whole
    val alphabet = Seq("a", "b", "é", "́", "𝄞", "😀", "中")
    val strs = (Seq("", "aa", "𝄞𝄞", "a😀b") ++ Seq.fill(200)(
      (0 until rnd.nextInt(6)).map(_ => alphabet(rnd.nextInt(alphabet.size))).mkString))
      .distinct
    val df = strs.toDF("s")
    val hof = df.select($"s", FuzzyJoin.deletionNeighborhood($"s").as("n"))
      .as[(String, Seq[String])].collect().toMap
    val native = df.select($"s",
        graft.functions.FuzzyExpressions.deletionNeighborhood($"s").as("n"))
      .as[(String, Seq[String])].collect().toMap
    assert(native === hof)
    // and the codegen path really ran: the plan contains the native fn
    val plan = df.select(
      graft.functions.FuzzyExpressions.deletionNeighborhood($"s"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("graft_deletion_neighborhood"), plan)
  }

  test("editDistance1Pairs: key longer than maxLen fails loudly") {
    val df = Seq("short", "x" * 50).toDF("s")
    val e = intercept[Exception] {
      FuzzyJoin.editDistance1Pairs(df, "s", maxLen = 10).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("exceeds maxLen")), e.toString)
  }

  test("editDistance1Pairs ≡ naive levenshtein join (random corpus)") {
    val rnd = new scala.util.Random(7)
    val alphabet = "abc"
    val strs = Seq.fill(120)(
      (0 until (1 + rnd.nextInt(4))).map(_ => alphabet(rnd.nextInt(3))).mkString)
      .distinct
    val df = strs.toDF("s")
    val blocked = FuzzyJoin.editDistance1Pairs(df, "s")
      .select("a", "b").as[(String, String)].collect().toSet
    val naive = (for {
      a <- strs; b <- strs if a < b
      if levDist(a, b) <= 1
    } yield (a, b)).toSet
    assert(blocked === naive)
  }

  test("editDistance1Pairs: substitution, insertion, deletion all found; distance-2 excluded") {
    val df = Seq("kitten", "mitten", "kitte", "kittens", "ab", "ba").toDF("s")
    val pairs = FuzzyJoin.editDistance1Pairs(df, "s")
      .select("a", "b").as[(String, String)].collect().toSet
    assert(pairs === Set(
      ("kitten", "mitten"),   // substitution
      ("kitte", "kitten"),    // deletion
      ("kitten", "kittens"))) // insertion
    assert(!pairs.contains(("ab", "ba"))) // shares variants, distance 2
  }

  private def levDist(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (j == 0) i else if (i == 0) j else 0)
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  // ─────────────────── IncrementalAgg ───────────────────

  test("view ⊕ delta ≡ full recompute, bit-identical, including key overlap") {
    val rnd = new scala.util.Random(11)
    val rows = Seq.fill(3000)((
      "k" + rnd.nextInt(4),
      math.floor(rnd.nextDouble() * 1e6) / 100, // non-dyadic 2dp values
      sqlDate(f"2024-01-${1 + rnd.nextInt(28)}%02d")))
    val df = rows.toDF("k", "v", "d")
    val keys = Seq("k")

    val full = IncrementalAgg.finish(
      IncrementalAgg.partials(df, keys, "v", "d"), keys)
      .orderBy("k").collect().toSeq

    // split at an arbitrary date boundary — every key appears on BOTH
    // sides, so merge must combine overlapping partials
    val cut = lit("2024-01-15").cast("date")
    val view = IncrementalAgg.partials(df.filter($"d" < cut), keys, "v", "d")
    val delta = IncrementalAgg.partials(df.filter($"d" >= cut), keys, "v", "d")
    val merged = IncrementalAgg.finish(
      IncrementalAgg.merge(view.unionByName(delta), keys), keys)
      .orderBy("k").collect().toSeq

    assert(merged === full)
    // totals bit-identical (decimal partials are exactly associative)
    val fT = full.map(_.getDouble(2)).map(java.lang.Double.doubleToLongBits)
    val mT = merged.map(_.getDouble(2)).map(java.lang.Double.doubleToLongBits)
    assert(fT === mT)
  }

  test("sketch partials: view ⊕ delta estimate ≡ full rebuild at any split") {
    val rnd = new scala.util.Random(17)
    val rows = Seq.fill(5000)((
      "k" + rnd.nextInt(3),
      "user" + rnd.nextInt(800),
      sqlDate(f"2024-03-${1 + rnd.nextInt(28)}%02d")))
    val df = rows.toDF("k", "u", "d")
    val keys = Seq("k")
    val full = IncrementalAgg.sketchFinish(
      IncrementalAgg.sketchPartials(df, keys, "u", "d"), keys)
      .orderBy("k").collect().toSeq
    val parts = Seq(df.filter($"d" < lit("2024-03-10").cast("date")),
        df.filter($"d" >= lit("2024-03-10").cast("date") && $"d" < lit("2024-03-20").cast("date")),
        df.filter($"d" >= lit("2024-03-20").cast("date")))
      .map(IncrementalAgg.sketchPartials(_, keys, "u", "d"))
    val merged = IncrementalAgg.sketchFinish(IncrementalAgg.sketchMerge(
      parts.reduce(_ unionByName _), keys), keys).orderBy("k").collect().toSeq
    assert(merged === full)
    // ~700 distinct/key is past the sketch's exact (coupon) phase, so
    // estimates carry HLL error — assert the q45-style ±5% envelope
    // (lgK=12 rsd ≈ 1.6%)
    val exact = df.groupBy("k").agg(countDistinct($"u").as("e"))
      .orderBy("k").collect().map(_.getLong(1))
    full.map(_.getLong(2)).zip(exact).foreach { case (est, ex) =>
      assert(math.abs(est - ex) <= ex * 0.05, s"estimate $est vs exact $ex")
    }
  }

  test("merge is associative across arbitrary batch splits") {
    val rows = (1 to 300).map(i =>
      ("k" + i % 3, i.toDouble / 4, sqlDate(f"2024-02-${1 + i % 28}%02d")))
    val df = rows.toDF("k", "v", "d")
    val keys = Seq("k")
    val full = IncrementalAgg.finish(
      IncrementalAgg.partials(df, keys, "v", "d"), keys).orderBy("k").collect().toSeq
    // three-way split, merged in two different groupings
    val parts = Seq(
      df.filter($"v" < 20), df.filter($"v" >= 20 && $"v" < 50), df.filter($"v" >= 50))
      .map(IncrementalAgg.partials(_, keys, "v", "d"))
    val leftFold = IncrementalAgg.finish(IncrementalAgg.merge(
      IncrementalAgg.merge(parts(0).unionByName(parts(1)), keys).unionByName(parts(2)),
      keys), keys).orderBy("k").collect().toSeq
    assert(leftFold === full)
  }
}
