package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QualityCascadeSpec extends SparkSpec {
  import spark.implicits._

  private val rules = Seq(
    "nonempty" -> (length($"s") > 0),
    "no_x"     -> !$"s".contains("x"),
    "short"    -> (length($"s") <= 5))

  test("verdict is the FIRST failing rule in list order") {
    val df = Seq("ok", "", "xx", "toolongxxx", "toolong").toDF("s")
    val out = QualityCascade.annotate(df, rules)
      .select("s", "verdict").as[(String, String)].collect().toMap
    assert(out("ok") === "pass")
    assert(out("") === "nonempty")
    assert(out("xx") === "no_x")
    // fails no_x AND short — attributed to no_x (earlier in the list)
    assert(out("toolongxxx") === "no_x")
    assert(out("toolong") === "short")
  }

  test("report: per-verdict counts and shares sum to 1") {
    val df = Seq("ok", "", "xx", "abcdef", "fine!").toDF("s")
    val rep = QualityCascade.report(QualityCascade.annotate(df, rules))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(rep.map(_._2).sum === 5L)
    assert(math.abs(rep.map(_._3).sum - 1.0) < 1e-9)
    val byVerdict = rep.map(t => t._1 -> t._2).toMap
    assert(byVerdict("pass") === 2L) // "ok", "fine!" (≤5, no x)
  }

  test("annotate is shuffle-free: a pure projection over the scan") {
    val df = Seq("a").toDF("s")
    val plan = QualityCascade.annotate(df, rules)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
    assert(!plan.contains("Aggregate"), s"unexpected aggregate:\n$plan")
  }

  test("duplicate rule names are rejected") {
    intercept[IllegalArgumentException] {
      QualityCascade.annotate(Seq("a").toDF("s"),
        Seq("r" -> lit(true), "r" -> lit(false)))
    }
  }
}
