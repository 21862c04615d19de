package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Product quantization: codebooks, encoding, the certified-exact
  * pqTopK (≡ brute force for ANY codebook), and the pure-ADC ranking.
  */
class PqSpec extends SparkSpec {
  import spark.implicits._

  // 40 vectors, d=8, values dyadic (exact at 2^-43) — three tight
  // clusters plus scattered fill so top-k has real structure
  private def corpus = {
    val rnd = new scala.util.Random(11)
    (0 until 40).map { i =>
      val base = Array.tabulate(8)(d =>
        ((i % 3) * 4 + d % 4).toFloat / 4f)
      val jit = base.map(v => v + rnd.nextInt(8).toFloat / 16f)
      (i.toLong, jit.toSeq)
    }.toDF("vec_id", "embedding")
  }

  test("pqTopK equals exact brute force (certified screen, any codebook)") {
    val q = corpus.filter(col("vec_id") < 10)
    val gold = Similarity.bruteForceTopK(q, corpus, "vec_id", "embedding",
        k = 4, roundDp = -1, exact = true)
      .orderBy("query_id", "rank").collect().map(_.toSeq).toSeq
    graft.core.OpCache.release()
    val pq = Similarity.pqTopK(q, corpus, "vec_id", "embedding",
        k = 4, m = 4, ks = 4, iters = 2, roundDp = -1)
      .orderBy("query_id", "rank").collect().map(_.toSeq).toSeq
    graft.core.OpCache.release()
    assert(pq === gold)
  }

  test("pqEncode: valid codes, residual bound actually bounds") {
    val books = Similarity.pqCodebooksExact(corpus, "vec_id", "embedding",
      dim = 8, m = 4, ks = 4, iters = 2)
    assert(books.length === 4 && books.forall(_.length === 4) &&
      books.forall(_.forall(_.length === 2)))
    val enc = Similarity.pqEncode(corpus, "vec_id", "embedding", books)
      .collect()
    enc.foreach { r =>
      val codes = r.getSeq[Int](r.fieldIndex("_codes"))
      assert(codes.length === 4 && codes.forall(c => c >= 0 && c < 4))
      val v = r.getSeq[Float](r.fieldIndex("_cv")).map(_.toDouble)
      val decoded = codes.zipWithIndex.flatMap { case (c, j) => books(j)(c) }
      val resid = math.sqrt(v.zip(decoded).map { case (a, b) =>
        (a - b) * (a - b) }.sum)
      assert(r.getDouble(r.fieldIndex("_r")) >= resid - 1e-12,
        s"bound ${r.getDouble(r.fieldIndex("_r"))} < residual $resid")
    }
  }

  test("stored index roundtrip: pqTopKFromIndex equals brute force") {
    val path = java.nio.file.Files.createTempDirectory("graft_pq").toString + "/idx"
    val books = Similarity.pqCodebooksExact(corpus, "vec_id", "embedding",
      dim = 8, m = 4, ks = 4, iters = 2)
    Similarity.writePqIndex(corpus, "vec_id", "embedding", books, path)
    // codebooks roundtrip exactly
    val back = Similarity.readPqBooks(spark, path)
    assert(back.map(_.map(_.toSeq).toSeq).toSeq ===
      books.map(_.map(_.toSeq).toSeq).toSeq)
    val q = corpus.filter(col("vec_id") < 10)
    val gold = Similarity.bruteForceTopK(q, corpus, "vec_id", "embedding",
        k = 4, roundDp = -1, exact = true)
      .orderBy("query_id", "rank").collect().map(_.toSeq).toSeq
    graft.core.OpCache.release()
    val stored = Similarity.pqTopKFromIndex(q, corpus, "vec_id", "embedding",
        k = 4, path, roundDp = -1)
      .orderBy("query_id", "rank").collect().map(_.toSeq).toSeq
    graft.core.OpCache.release()
    assert(stored === gold)
  }

  test("IVF-PQ with all cells probed equals the flat ADC ranking") {
    val seeds = corpus.filter(col("vec_id") < 4)
    val books = Similarity.pqCodebooksSeeded(seeds, "vec_id", "embedding",
      dim = 8, m = 4)
    val q = corpus.filter(col("vec_id") < 10)
    val flat = Similarity.pqAdcRank(q, corpus, "vec_id", "embedding", 4, books)
      .orderBy("query_id", "rank").collect().map(_.toSeq).toSeq
    // probing every cell -> same candidate set -> identical ranking
    val ivfAll = Similarity.pqIvfAdcRank(q, corpus, seeds, "vec_id",
        "embedding", k = 4, nProbe = 4, m = 4)
      .orderBy("query_id", "rank").collect().map(_.toSeq).toSeq
    assert(ivfAll === flat)
    // nProbe = 1 prunes: every candidate's cell is its query's top cell
    val ivf1 = Similarity.pqIvfAdcRank(q, corpus, seeds, "vec_id",
      "embedding", k = 4, nProbe = 1, m = 4)
    val probed = Similarity.topSeedCells(q, seeds, "vec_id", "embedding", 1)
    val cellsOf = Similarity.assignCells(corpus, seeds, "vec_id", "embedding")
    val bad = ivf1.join(cellsOf.withColumnRenamed("vec_id", "neighbor_id"),
        "neighbor_id")
      .join(probed.withColumnRenamed("cell", "_qcell"), "query_id")
      .filter(col("cell") =!= col("_qcell"))
    assert(bad.count() === 0L)
  }

  test("seeded codebooks are the seeds' sub-vectors; ADC rank is stable") {
    val seeds = corpus.filter(col("vec_id") < 4)
    val books = Similarity.pqCodebooksSeeded(seeds, "vec_id", "embedding",
      dim = 8, m = 4)
    val seedRows = seeds.orderBy("vec_id").collect()
      .map(_.getSeq[Float](1).map(_.toDouble))
    for (j <- 0 until 4; c <- 0 until 4)
      assert(books(j)(c).toSeq === seedRows(c).slice(j * 2, j * 2 + 2))
    def run(parts: Int) = Similarity.pqAdcRank(
        corpus.filter(col("vec_id") < 10).repartition(parts),
        corpus.repartition(parts), "vec_id", "embedding", k = 4, books)
      .orderBy("query_id", "rank").collect().map(_.toSeq).toSeq
    val r1 = run(1)
    assert(r1 === run(7))
    assert(r1.size === 40) // 10 queries x k=4
  }
}
