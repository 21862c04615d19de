package graft.operators

import graft.SparkSpec
import graft.core.{AggMethod, ColSpec}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class CubeFanoutSpec extends SparkSpec {
  import spark.implicits._

  private val d = sqlDate("2024-01-01")

  private def base = Seq(
    // (date, activity, equipment, v, seconds)
    (d, "Run", "Shoes", 10.0, 3600.0),
    (d, "Run", "Shoes", 20.0, 1800.0),
    (d, "Bike", "Not Set", 40.0, 3600.0),
  ).toDF("d", "activity", "equipment", "v", "seconds")

  private val specs = Seq(
    ColSpec("v", "v", DoubleType, agg = AggMethod.Sum),
    ColSpec("v", "v_wm", DoubleType, agg = AggMethod.WeightedMean),
  )

  private def projected = base.select(
    $"d", $"activity", $"equipment", $"seconds".as("w"),
    $"v", $"v".as("v_wm"))

  test("fan-out produces 2^dims grouping sets with 'All' markers") {
    val out = CubeFanout.dailyCube(projected, "d", Seq("activity", "equipment"),
      specs, "w")
    val rows = out.select("activity", "equipment", "v").collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet
    assert(rows === Set(
      ("Run", "Shoes", 30.0), ("Bike", "Not Set", 40.0),
      ("Run", "All", 30.0), ("Bike", "All", 40.0),
      ("All", "Shoes", 30.0), ("All", "Not Set", 40.0),
      ("All", "All", 70.0)))
  }

  test("Not-Set filter drops values only from groupings where the dim is concrete") {
    val out = CubeFanout.dailyCube(projected, "d", Seq("activity", "equipment"),
      specs, "w", notSetFilter = Map("equipment" -> Seq("Not Set", "")))
    val rows = out.select("activity", "equipment", "v").collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet
    // 'Bike/Not Set' and 'All/Not Set' rows gone; equipment-aggregated
    // rows still INCLUDE the Bike workout (reference only skips rows in
    // equipment-bearing groupings, populate_from_json.py:391-392)
    assert(rows === Set(
      ("Run", "Shoes", 30.0),
      ("Run", "All", 30.0), ("Bike", "All", 40.0),
      ("All", "Shoes", 30.0),
      ("All", "All", 70.0)))
  }

  test("weighted mean uses duration weights per output cell") {
    val out = CubeFanout.dailyCube(projected, "d", Seq("activity", "equipment"),
      specs, "w")
    val runAll = out.filter($"activity" === "Run" && $"equipment" === "All")
      .select("v_wm").as[Double].head()
    assert(math.abs(runAll - (10 * 3600 + 20 * 1800) / 5400.0) < 1e-12)
  }

  test("physical plan expands exactly 2^dims sets (no 2x tax)") {
    val out = CubeFanout.dailyCube(projected, "d", Seq("activity", "equipment"),
      specs, "w")
    val expands = out.queryExecution.optimizedPlan.collect {
      case e: org.apache.spark.sql.catalyst.plans.logical.Expand => e.projections.size
    }
    assert(expands === Seq(4)) // 2^2, date pinned in every set
  }

  test("two-level rollup-from-finest ≡ single-phase per-set aggregation (seeded random)") {
    val rnd = new scala.util.Random(99)
    val dates = (0 until 5).map(i => sqlDate(f"2024-02-${i + 1}%02d"))
    val rows = Seq.fill(400)((
      dates(rnd.nextInt(5)), s"a${rnd.nextInt(3)}", s"e${rnd.nextInt(3)}",
      math.floor(rnd.nextDouble() * 10000) / 100, // 2dp values (Exact domain)
      (rnd.nextInt(4) * 900).toDouble,            // weights incl. 0
      rnd.nextInt(3) match { case 0 => 0.0; case 1 => 1.0; case _ => 0.0 },
    ))
    val df = rows.toDF("d", "activity", "equipment", "v", "w", "b")
      .select($"d", $"activity", $"equipment", $"w",
        $"v", $"v".as("v_wm"), $"v".as("v_wm_int"), $"b".as("b"))
    val rSpecs = Seq(
      ColSpec("v", "v", DoubleType, agg = AggMethod.Sum),
      ColSpec("v", "v_wm", DoubleType, agg = AggMethod.WeightedMean),
      ColSpec("v", "v_wm_int", LongType, agg = AggMethod.WeightedMean),
      ColSpec("b", "b", BooleanType, agg = AggMethod.BoolOr),
    )
    val dims = Seq("activity", "equipment")
    val actual = CubeFanout.dailyCube(df, "d", dims, rSpecs, "w")
      .select("d", "activity", "equipment", "v", "v_wm", "v_wm_int", "b")

    // brute force: one single-phase groupBy per subset, 'All' pinned
    val expected = Seq(Seq("activity", "equipment"), Seq("activity"), Seq("equipment"), Seq.empty)
      .map { s =>
        val g = df.groupBy(($"d" +: s.map(col)): _*)
          .agg(rSpecs.head.aggregate($"w"), rSpecs.tail.map(_.aggregate($"w")): _*)
        dims.foldLeft(g)((acc, dim) =>
          if (s.contains(dim)) acc else acc.withColumn(dim, lit(CubeFanout.All)))
          .select("d", "activity", "equipment", "v", "v_wm", "v_wm_int", "b")
      }.reduce(_ unionByName _)

    val key = (r: org.apache.spark.sql.Row) => r.toSeq.map(String.valueOf).mkString("|")
    val a = actual.collect().map(key).sorted
    val e = expected.collect().map(key).sorted
    assert(a === e) // bit-identical, including the weighted-mean doubles
  }
}
