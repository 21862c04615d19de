package graft.functions

import graft.SparkSpec
import graft.operators.NearDup
import org.apache.spark.sql.functions._

class HashExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private val samples = Seq(
    "the quick brown fox jumps over the lazy dog",
    "a b c",
    "single",
    "repeated repeated repeated words words",
  )

  test("native minhash signature ≡ HOF formulation (bit-identical)") {
    val df = samples.toDF("t").select(NearDup.shingles($"t", 2).as("sh"))
    val both = df.select(
      NearDup.minhashSignature($"sh", 16).as("native"),
      NearDup.minhashSignatureHof($"sh", 16).as("hof")
    ).as[(Seq[Long], Seq[Long])].collect()
    both.foreach { case (n, h) => assert(n === h) }
  }

  test("native double dot ≡ HOF formulation (bit-identical)") {
    val rnd = new scala.util.Random(13)
    val vecs = Seq.fill(20)((Array.fill(64)(rnd.nextFloat() * 2 - 1),
      Array.fill(64)(rnd.nextFloat() * 2 - 1)))
    val df = vecs.toDF("a", "b")
    val both = df.select(
      graft.operators.Similarity.dot($"a", $"b").as("native"),
      graft.operators.Similarity.dotHof($"a", $"b").as("hof")
    ).as[(Double, Double)].collect()
    both.foreach { case (n, h) => assert(n === h) }
  }

  test("native dotExact ≡ HOF decimal formulation (bit-identical)") {
    val rnd = new scala.util.Random(11)
    val vecs = Seq.fill(20)((Array.fill(64)(rnd.nextFloat() * 2 - 1),
      Array.fill(64)(rnd.nextFloat() * 2 - 1)))
    val df = vecs.toDF("a", "b")
    val both = df.select(
      graft.operators.Similarity.dotExact($"a", $"b").as("native"),
      graft.operators.Similarity.dotExactHof($"a", $"b").as("hof")
    ).as[(Double, Double)].collect()
    both.foreach { case (n, h) => assert(n === h) }
  }

  test("native simhash64 ≡ HOF formulation (bit-identical)") {
    val df = samples.toDF("t")
    val both = df.select(
      NearDup.simhash64($"t").as("native"),
      NearDup.simhash64Hof($"t").as("hof")
    ).as[(Long, Long)].collect()
    both.foreach { case (n, h) => assert(n === h) }
  }

  test("native shingles ≡ HOF formulation (same set, incl. short docs)") {
    val df = (samples :+ "two words" :+ "one").toDF("t")
    val both = df.select(
      NearDup.shingles($"t", 3).as("native"),
      NearDup.shinglesHof($"t", 3).as("hof")
    ).as[(Seq[String], Seq[String])].collect()
    both.foreach { case (n, h) => assert(n.toSet === h.toSet) }
  }

  test("native jaccard ≡ HOF formulation") {
    val df = samples.combinations(2).map(p => (p(0), p(1))).toSeq.toDF("a", "b")
    val both = df.select(
      NearDup.jaccard(NearDup.shingles($"a", 2), NearDup.shingles($"b", 2)).as("native"),
      NearDup.jaccardHof(NearDup.shinglesHof($"a", 2), NearDup.shinglesHof($"b", 2)).as("hof")
    ).as[(Double, Double)].collect()
    both.foreach { case (n, h) => assert(n === h) }
  }

  test("native tokens ≡ HOF formulation (empties, multi-space, unicode)") {
    val tricky = samples ++ Seq("", " ", "  double  space  ", " lead", "trail ",
      "ünïcødé tökens éé", "tab\tis one token")
    val both = tricky.toDF("t").select(
      Text.tokens($"t").as("native"),
      Text.tokensHof($"t").as("hof")
    ).as[(Seq[String], Seq[String])].collect()
    both.foreach { case (n, h) => assert(n === h) }
  }

  test("native countIn ≡ HOF filter-size (stopwords and lang markers)") {
    val both = samples.toDF("t").select(
      TextExpressions.countIn(Text.tokens($"t"), Text.Stopwords).as("native"),
      size(filter(Text.tokensHof($"t"), x => x.isInCollection(Text.Stopwords))).as("hof")
    ).as[(Int, Int)].collect()
    both.foreach { case (n, h) => assert(n === h) }
  }
}
