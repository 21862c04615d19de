package graft.operators

import graft.SparkSpec
import graft.core.{AggMethod, ColSpec}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class SpineDedupRollupSpec extends SparkSpec {
  import spark.implicits._

  test("gapFill: full spine × combos, measures default-filled, day values joined") {
    val facts = Seq(
      (sqlDate("2024-01-01"), "Run", 10.0),
      (sqlDate("2024-01-03"), "Run", 30.0),
      (sqlDate("2024-01-03"), "Bike", 5.0),
    ).toDF("d", "activity", "tss")
    val day = Seq(
      (sqlDate("2024-01-01"), 7.0), (sqlDate("2024-01-02"), 8.0), (sqlDate("2024-01-03"), 9.0),
    ).toDF("d", "fatigue")
    val out = Spine.gapFill(facts, "d", Seq("activity"), Map("tss" -> 0.0), Some(day))
    assert(out.count() === 6) // 3 days × 2 combos (SURVEY Q2: FULL backfill)
    val gap = out.filter($"d" === sqlDate("2024-01-02") && $"activity" === "Run")
      .select("tss", "fatigue").as[(Double, Double)].head()
    assert(gap === ((0.0, 8.0))) // measure default, day's REAL fatigue
  }

  test("firstWins dedup is deterministic by explicit order") {
    val df = Seq((1, "b", 20.0), (1, "a", 10.0), (2, "c", 30.0)).toDF("k", "tag", "v")
    val out = Dedup.firstWins(df, Seq("k"), Seq(col("tag")))
      .orderBy("k").select("tag").as[String].collect().toSeq
    assert(out === Seq("a", "c"))
  }

  test("exactByHash keeps one row per distinct content") {
    val df = Seq((1, "same text"), (2, "same text"), (3, "other")).toDF("id", "text")
    val out = Dedup.exactByHash(df, "text", Seq(col("id")))
      .orderBy("id").select("id").as[Int].collect().toSeq
    assert(out === Seq(1, 3))
  }

  test("substringWindowPairs: shared token window pairs up, boilerplate df-cap drops") {
    // docs 1/2 share the exact 4-token run "w x y z" (span 5 tokens →
    // 5-4+1 = 2 shared 4-gram windows); docs 10..13 all share a
    // "boilerplate" window (df=4 > maxDf=3) → no pairs from it; doc 20
    // shares nothing
    val df = Seq(
      (1L, "a b w x y z q"),
      (2L, "c d w x y z q"),
      (10L, "common header line one"), (11L, "common header line two"),
      (12L, "common header line three"), (13L, "common header line four"),
      (20L, "totally unrelated text here"),
    ).toDF("doc_id", "text")
    val out = Dedup.substringWindowPairs(df, "doc_id", "text",
        windowTokens = 4, maxDf = 3)
      .orderBy("id_a", "id_b").as[(Long, Long, Long)].collect().toSeq
    // "w x y z q" span: windows "w x y z", "x y z q" → shared_windows=2
    assert(out === Seq((1L, 2L, 2L)))
  }

  test("substringWindowPairs: docs shorter than the window pair only on exact equality") {
    val df = Seq(
      (1L, "tiny doc"), (2L, "tiny doc"), (3L, "tiny dog"),
    ).toDF("doc_id", "text")
    val out = Dedup.substringWindowPairs(df, "doc_id", "text",
        windowTokens = 50, maxDf = 16)
      .as[(Long, Long, Long)].collect().toSeq
    assert(out === Seq((1L, 2L, 1L)))
  }

  test("duplicatedWindowRatio: shared windows count, unique docs score 0, short docs whole-text") {
    // doc 1/2 share "w x y" (their only window overlap); doc 3 is
    // unique; docs 4/5 are short exact duplicates (whole-text window)
    val df = Seq(
      (1L, "a b w x y"),   // windows: "a b w","b w x","w x y" → 1 of 3 dup
      (2L, "c d w x y"),   // same shape
      (3L, "p q r s t"),   // all unique
      (4L, "tiny"), (5L, "tiny"),
    ).toDF("doc_id", "text")
    val out = Dedup.duplicatedWindowRatio(df, "doc_id", "text", windowTokens = 3)
      .orderBy("doc_id").as[(Long, Long, Long, Double)].collect().toSeq
    assert(out === Seq(
      (1L, 3L, 1L, 0.333333), (2L, 3L, 1L, 0.333333),
      (3L, 3L, 0L, 0.0), (4L, 1L, 1L, 1.0), (5L, 1L, 1L, 1.0)))
  }

  test("components: min-id canonical per cluster, chain needs >1 round, singleton maps to self") {
    // chain 1-2-3 (diameter 2 forces label propagation through rounds),
    // pair 10-11, singleton 20
    val vertices = Seq(1L, 2L, 3L, 10L, 11L, 20L).toDF("id")
    val pairs = Seq((2L, 3L), (1L, 2L), (10L, 11L)).toDF("a", "b")
    val out = Dedup.components(vertices, "id", pairs, "a", "b")
      .orderBy("v").as[(Long, Long)].collect().toSeq
    assert(out === Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L), (20L, 20L)))
  }

  test("components: seeded random graph ≡ driver union-find") {
    val rnd = new scala.util.Random(41)
    val n = 120
    val edges = Seq.fill(90)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      .filter { case (a, b) => a != b }
    val vertices = (0L until n.toLong).toDF("id")
    val out = Dedup.components(vertices, "id",
        edges.toDF("a", "b"), "a", "b", maxIter = 50)
      .as[(Long, Long)].collect().toMap
    // reference union-find
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = (0 until n).map { v =>
      // canonical = min vertex in the component
      val root = find(v)
      val members = (0 until n).filter(find(_) == root)
      v.toLong -> members.min.toLong
    }.toMap
    assert(out === expected)
  }

  test("components: throws when maxIter is exhausted before convergence") {
    val vertices = Seq(1L, 2L, 3L, 4L).toDF("id")
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("a", "b")
    val e = intercept[IllegalStateException] {
      Dedup.components(vertices, "id", pairs, "a", "b", maxIter = 1).collect()
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("componentsStar: min-id canonical per cluster, singleton maps to self") {
    val vertices = Seq(1L, 2L, 3L, 10L, 11L, 20L).toDF("id")
    val pairs = Seq((2L, 3L), (1L, 2L), (10L, 11L)).toDF("a", "b")
    val out = Dedup.componentsStar(vertices, "id", pairs, "a", "b")
      .orderBy("v").as[(Long, Long)].collect().toSeq
    assert(out === Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L), (20L, 20L)))
  }

  test("componentsStar: seeded random graph ≡ min-label components") {
    val rnd = new scala.util.Random(97)
    val n = 150
    val edges = Seq.fill(110)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      .filter { case (a, b) => a != b }
    val vertices = (0L until n.toLong).toDF("id")
    val star = Dedup.componentsStar(vertices, "id", edges.toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect().toMap
    val prop = Dedup.components(vertices, "id", edges.toDF("a", "b"), "a", "b", maxIter = 50)
      .as[(Long, Long)].collect().toMap
    assert(star === prop)
    // hotDegree = 2 forces the broadcast/anti-join split in EVERY
    // round (2·count ≥ 2 always, every key hot) — the skew-safe
    // join-back path must reach the same fixed point as the adaptive
    // default, which on this toy graph runs plain joins throughout
    val forced = Dedup.componentsStar(vertices, "id", edges.toDF("a", "b"), "a", "b",
      hotDegree = 2).as[(Long, Long)].collect().toMap
    assert(forced === prop)
  }

  test("componentsStar: 1000-vertex path converges in O(log n) rounds (min-label would need ~1000)") {
    val n = 1000L
    val vertices = (0L until n).toDF("id")
    val pairs = (0L until n - 1).map(i => (i, i + 1)).toDF("a", "b")
    // maxIter = 14 is a HARD bound (componentsStar throws past it):
    // completing under it proves the O(log n) round count on the
    // adversarial max-diameter graph
    val out = Dedup.componentsStar(vertices, "id", pairs, "a", "b", maxIter = 14)
      .as[(Long, Long)].collect()
    assert(out.length === n)
    assert(out.forall(_._2 === 0L))
  }

  test("periodic rollup: SUM cols sum, MEAN cols plain-average, BoolOr counts") {
    val day = Seq(
      ("Run", "2024-1", sqlDate("2024-01-01"), 10.0, 10.0, true),
      ("Run", "2024-1", sqlDate("2024-01-02"), 30.0, 30.0, false),
      ("Run", "2024-2", sqlDate("2024-01-08"), 50.0, 50.0, true),
    ).toDF("activity", "year_week", "d", "tss", "rpe", "is_race")
    val specs = Seq(
      ColSpec("tss", "tss", DoubleType, agg = AggMethod.Sum),
      ColSpec("rpe", "rpe", DoubleType, agg = AggMethod.WeightedMean), // rolls up as plain AVG
      ColSpec("is_race", "is_race", BooleanType, agg = AggMethod.BoolOr),
    )
    val out = Rollup.periodic(day, "year_week", "Week", Seq("activity"), "d", specs)
      .orderBy("year_week")
      .select("year_week", "d", "tss", "rpe", "is_race")
      .as[(String, java.sql.Date, Double, Double, Long)].collect().toSeq
    assert(out === Seq(
      ("2024-1", sqlDate("2024-01-02"), 40.0, 20.0, 1L),
      ("2024-2", sqlDate("2024-01-08"), 50.0, 50.0, 1L)))
  }

  test("corpusDiff: added/removed/changed/unchanged by content digest") {
    val v1 = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma")).toDF("doc_id", "text")
    val v2 = Seq((2L, "beta"), (3L, "gamma EDITED"), (4L, "delta")).toDF("doc_id", "text")
    val out = Dedup.corpusDiff(v1, v2, "doc_id", "text")
      .orderBy("doc_id").as[(Long, String)].collect().toSeq
    assert(out === Seq(
      (1L, "removed"), (2L, "unchanged"), (3L, "changed"), (4L, "added")))
  }

  test("calendar attrs: ISO year-week at year boundary (SURVEY Q1)") {
    val out = Calendar.withCalendarAttrs(Seq(sqlDate("2021-01-01")).toDF("d"), "d")
      .select("year_week", "year_month", "day_of_week", "month")
      .as[(String, String, String, String)].head()
    // reference would render '2021-53' (calendar year + ISO week); we
    // lock consistent ISO year + ISO week = '2020-53'
    assert(out === (("2020-53", "2021-Jan", "Fri", "Jan")))
  }

  test("componentsIncremental: folding a delta into stored labels ≡ from-scratch recompute") {
    val rnd = new scala.util.Random(23)
    for (trial <- 1 to 4) {
      val n = 40 + rnd.nextInt(40)
      val all = Seq.fill(3 * n)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }.distinct
      // history = pairs among the first 60% of vertex ids; the rest
      // arrive as a delta (including pairs that BRIDGE old components)
      val cut = (n * 6) / 10
      val (hist, delta) = all.partition { case (a, b) => a < cut && b < cut }
      val histVerts = (0L until cut.toLong).toDF("id")
      val allVerts = (0L until n.toLong).toDF("id")
      val histLabels = Dedup.componentsStar(
        histVerts, "id", hist.toDF("a", "b"), "a", "b")
      val inc = Dedup.componentsIncremental(histLabels, "v", "comp",
          allVerts, "id", delta.toDF("a", "b"), "a", "b")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val full = Dedup.componentsStar(allVerts, "id", all.toDF("a", "b"), "a", "b")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(inc === full, s"trial $trial: incremental labels diverge from recompute")
      graft.core.OpCache.release(blocking = true)
    }
  }
}
