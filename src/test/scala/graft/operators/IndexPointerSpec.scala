package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Atomic alias pointer: flip/resolve/history, the compaction flip
  * end-to-end, and the loud flip-collision contract.
  */
class IndexPointerSpec extends SparkSpec {
  import spark.implicits._

  private val vocab = Vector("spark", "join", "stream", "data", "row")

  private def corpus(lo: Long, hi: Long, seed: Int) = {
    val rnd = new scala.util.Random(seed)
    (lo to hi).map { i =>
      (i, Seq.fill(3 + rnd.nextInt(8))(vocab(rnd.nextInt(vocab.size)))
        .mkString(" "))
    }.toDF("doc_id", "text")
  }

  private def tmp(name: String) =
    java.nio.file.Files.createTempDirectory(name).toString

  test("flip/resolve/history roundtrip; resolve before any flip fails loudly") {
    val alias = tmp("ptr") + "/alias"
    val e = intercept[IllegalArgumentException] {
      IndexPointer.resolve(spark, alias)
    }
    assert(e.getMessage.contains("flip"), e.getMessage)
    assert(IndexPointer.flip(spark, alias, "/idx/a") === 1L)
    assert(IndexPointer.resolve(spark, alias) === "/idx/a")
    assert(IndexPointer.flip(spark, alias, "/idx/b") === 2L)
    assert(IndexPointer.resolve(spark, alias) === "/idx/b")
    val hist = IndexPointer.history(spark, alias)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(hist === Seq((1L, "/idx/a"), (2L, "/idx/b")))
  }

  test("compaction flip: readers resolving the alias see identical results before and after") {
    val root = tmp("ptrflip")
    val docs = corpus(1, 50, 7)
    Retrieval.writeInvertedIndex(docs.filter($"doc_id" % 3 =!= 0L),
      "doc_id", "text", s"$root/src", nBuckets = 4)
    Retrieval.appendToInvertedIndex(docs.filter($"doc_id" % 3 === 0L),
      "doc_id", "text", s"$root/src")
    IndexPointer.flip(spark, s"$root/alias", s"$root/src")
    val terms = Seq("spark", "data")
    def serveViaAlias() = Retrieval.bm25TopKFromIndex(spark,
      IndexPointer.resolve(spark, s"$root/alias"), "doc_id", terms, 15)
      .collect().map(_.toSeq).toSeq
    val before = serveViaAlias()
    Retrieval.compactInvertedIndex(spark, s"$root/src", s"$root/dst")
    IndexPointer.flip(spark, s"$root/alias", s"$root/dst")
    assert(IndexPointer.resolve(spark, s"$root/alias") === s"$root/dst")
    assert(serveViaAlias() === before)
    assert(before.nonEmpty)
    // and the retention side: a pin against the SOURCE path still
    // resolves the pre-compaction state directly (pins hold paths)
    assert(Retrieval.bm25TopKFromIndex(spark, s"$root/src", "doc_id",
      terms, 15).collect().map(_.toSeq).toSeq === before)
  }

  test("two concurrent in-process flips serialize: distinct versions, never a torn pointer") {
    val alias = tmp("ptrrace") + "/alias"
    IndexPointer.flip(spark, alias, "/idx/base")
    val gate = new java.util.concurrent.CountDownLatch(1)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = Seq("/idx/x", "/idx/y").map { t =>
      new Thread(() => {
        gate.await()
        try { IndexPointer.flip(spark, alias, t); () }
        catch { case e: Throwable => errs.add(e); () }
      })
    }
    threads.foreach(_.start()); gate.countDown()
    threads.foreach(_.join(30000))
    // in-process flips hold the JVM flip lock → both land, versions
    // distinct and monotone, resolve returns the later winner intact
    assert(errs.isEmpty, String.valueOf(errs.peek()))
    val hist = IndexPointer.history(spark, alias)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(hist.map(_._1).toSeq === Seq(1L, 2L, 3L))
    assert(Set("/idx/x", "/idx/y")(IndexPointer.resolve(spark, alias)))
  }
}
