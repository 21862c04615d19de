package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** QualityLr (fixed-iteration full-batch logistic regression). */
class QualityLrSpec extends SparkSpec {
  import spark.implicits._

  private def toy(n: Int) = (0 until n).map { i =>
    // separable: positives cluster at x=+1, negatives at x=-1
    val y = if (i % 2 == 0) 1.0 else 0.0
    val x = if (y == 1.0) 1.0 + 0.001 * (i % 7) else -1.0 - 0.001 * (i % 5)
    (i.toLong, y, Array(1.0, x))
  }.toDF("id", "y", "x")

  test("GD separates a separable toy set") {
    val df = toy(200)
    val w = QualityLr.train(df, dims = 2, iters = 25, lr = 1.0)
    val scored = df.select(col("id"), col("y"),
      QualityLr.p9(col("x"), w).as("p")).collect()
    scored.foreach { r =>
      val (y, p) = (r.getDouble(1), r.getDouble(2))
      assert((p >= 0.5) === (y == 1.0), s"y=$y p=$p w=${w.toSeq}")
    }
    // slope dominates, pointing toward the positive cluster
    assert(w(1) > 0.5, s"w=${w.toSeq}")
  }

  test("training is bit-identical under repartitioning") {
    val df = toy(300)
    val w1 = QualityLr.train(df, dims = 2, iters = 8, lr = 0.5)
    val w2 = QualityLr.train(df.repartition(13), dims = 2, iters = 8, lr = 0.5)
    assert(w1.toSeq === w2.toSeq)
  }

  test("weights are 9-dp quantized every round") {
    val w = QualityLr.train(toy(100), dims = 2, iters = 3, lr = 0.5)
    w.foreach { wj =>
      val q = new java.math.BigDecimal(java.lang.Double.toString(wj))
        .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue()
      assert(wj === q)
    }
  }

  test("empty frame and bad hyperparameters are rejected") {
    intercept[IllegalArgumentException] {
      QualityLr.train(toy(10), dims = 2, iters = 0, lr = 0.5)
    }
    intercept[IllegalArgumentException] {
      QualityLr.train(toy(10).filter(col("id") < 0), dims = 2, iters = 1, lr = 0.5)
    }
  }
}
