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
    // (raw encoding: flat ADC has no coarse term to compare against)
    val ivfAll = Similarity.pqIvfAdcRank(q, corpus, seeds, "vec_id",
        "embedding", k = 4, nProbe = 4, m = 4, dim = 8, residual = false)
      .orderBy("query_id", "rank").collect().map(_.toSeq).toSeq
    assert(ivfAll === flat)
    // nProbe = 1 prunes: every candidate's cell is its query's top cell
    val ivf1 = Similarity.pqIvfAdcRank(q, corpus, seeds, "vec_id",
      "embedding", k = 4, nProbe = 1, m = 4, dim = 8, residual = false)
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

  // CLUSTERED corpus for the residual-encoding property: 4 well-
  // separated cluster centers (disjoint coordinate blocks), ±jitter
  // that carries ALL the within-cluster neighbor structure. ids 0-3 =
  // coarse seeds (near centers), 4-19 = book seeds (16 codewords),
  // 20+ = corpus fill.
  private def clustered = {
    val rnd = new scala.util.Random(23)
    val centers = Array.tabulate(4, 8)((c, d) =>
      if (d / 2 == c) 4f else 0f)
    (0 until 72).map { i =>
      val c = i % 4
      // ids 0-3 are the coarse seeds and sit AT the centers (the
      // centroid role); everyone else is center + jitter, so residuals
      // to the seed ARE the jitter — the regime §IV.A is about
      val v = if (i < 4) centers(c).toSeq
        else centers(c).map(x =>
          x + (rnd.nextInt(33) - 16).toFloat / 16f).toSeq
      (i.toLong, v)
    }.toDF("vec_id", "embedding")
  }

  test("IVFADC residual encoding beats raw encoding on clustered data") {
    val seeds = clustered.filter(col("vec_id") < 4)
    val bookSeeds = clustered.filter(col("vec_id") >= 4 && col("vec_id") < 20)
    val q = clustered.filter(col("vec_id") >= 20 && col("vec_id") < 32)
    val gold = Similarity.bruteForceTopK(q, clustered, "vec_id", "embedding",
        k = 4, roundDp = -1, exact = true)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    graft.core.OpCache.release()
    def recall(residual: Boolean): Double = {
      val got = Similarity.pqIvfAdcRank(q, clustered, seeds, "vec_id",
          "embedding", k = 4, nProbe = 2, m = 4, dim = 8,
          bookSeeds = bookSeeds, residual = residual)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      graft.core.OpCache.release()
      got.count(gold.contains).toDouble / gold.size
    }
    val raw = recall(residual = false)
    val res = recall(residual = true)
    info(s"recall@4: residual=$res raw=$raw")
    // the §IV.A claim, measured: pointing the codebook budget at the
    // residual recovers within-cell detail raw encoding blurs away
    assert(res >= raw, s"residual recall $res < raw recall $raw")
    assert(res > 0.4, s"residual recall $res suspiciously low (raw $raw)")
  }

  test("wrong dim fails fast instead of slicing short sub-vectors") {
    val seeds = clustered.filter(col("vec_id") < 4)
    val q = clustered.filter(col("vec_id") >= 20 && col("vec_id") < 24)
    val e1 = intercept[IllegalArgumentException] {
      Similarity.pqIvfAdcRank(q, clustered, seeds, "vec_id", "embedding",
        k = 4, nProbe = 2, m = 4, dim = 16)
    }
    assert(e1.getMessage.contains("dim=16"), e1.getMessage)
    val path = java.nio.file.Files.createTempDirectory("graft_dim")
      .toString + "/idx"
    val e2 = intercept[IllegalArgumentException] {
      Similarity.writeIvfPqIndex(clustered, seeds, "vec_id", "embedding",
        m = 4, dim = 16, path)
    }
    assert(e2.getMessage.contains("dim=16"), e2.getMessage)
  }

  test("mis-typed stored index fails loudly, not with empty results") {
    val path = java.nio.file.Files.createTempDirectory("graft_mistyped")
      .toString + "/idx"
    val seeds = clustered.filter(col("vec_id") < 4)
    Similarity.writeIvfPqIndex(clustered, seeds, "vec_id", "embedding",
      m = 4, dim = 8, path)
    // corrupt the cells sidecar to a string id type: probes become
    // strings while the codes partition directories stay numeric —
    // the silent pre-r18 behavior was an empty serve
    val cells = spark.read.parquet(s"$path/cells")
      .select(concat(lit("c"), col("cell")).as("cell"),
        col("sv"), col("sn")).collect()
    spark.createDataFrame(
        spark.sparkContext.parallelize(cells.toIndexedSeq),
        spark.read.parquet(s"$path/cells").schema
          .copy(fields = spark.read.parquet(s"$path/cells").schema.fields
            .map(f => if (f.name == "cell")
              f.copy(dataType = org.apache.spark.sql.types.StringType)
            else f)))
      .write.mode("overwrite").parquet(s"$path/cells")
    val q = clustered.filter(col("vec_id") >= 20 && col("vec_id") < 24)
    val e = intercept[IllegalArgumentException] {
      Similarity.pqIvfTopKFromIndex(q, path, "vec_id", "embedding",
        k = 4, nProbe = 2).collect()
    }
    assert(e.getMessage.contains("cell"), e.getMessage)
  }

  test("string-id corpus roundtrips the stored IVF-PQ index") {
    // the generic-idCol path: string cells partition as string
    // directories, the sidecar probes are strings, and serving matches
    // the in-query ranking — no hard-coded Long cast anywhere
    val sc = clustered.select(
      format_string("v%02d", col("vec_id")).as("vec_id"), col("embedding"))
    val seeds = sc.filter(col("vec_id") < "v04")
    val bookSeeds = sc.filter(col("vec_id") >= "v04" && col("vec_id") < "v20")
    val q = sc.filter(col("vec_id") >= "v20" && col("vec_id") < "v28")
    val inQuery = Similarity.pqIvfAdcRank(q, sc, seeds, "vec_id",
        "embedding", k = 4, nProbe = 2, m = 4, dim = 8,
        bookSeeds = bookSeeds)
      .orderBy("query_id", "rank").collect().map(_.toSeq).toSeq
    graft.core.OpCache.release()
    val path = java.nio.file.Files.createTempDirectory("graft_strid")
      .toString + "/idx"
    Similarity.writeIvfPqIndex(sc, seeds, "vec_id", "embedding",
      m = 4, dim = 8, path, bookSeeds = bookSeeds)
    val served = Similarity.pqIvfTopKFromIndex(q, path, "vec_id",
        "embedding", k = 4, nProbe = 2)
      .orderBy("query_id", "rank").collect().map(_.toSeq).toSeq
    graft.core.OpCache.release()
    assert(served === inQuery)
  }

  test("stored cell-partitioned IVF-PQ index serves the in-query ranking") {
    val path = java.nio.file.Files.createTempDirectory("graft_ivfpq")
      .toString + "/idx"
    val seeds = clustered.filter(col("vec_id") < 4)
    val bookSeeds = clustered.filter(col("vec_id") >= 4 && col("vec_id") < 20)
    val q = clustered.filter(col("vec_id") >= 20 && col("vec_id") < 28)
    val inQuery = Similarity.pqIvfAdcRank(q, clustered, seeds, "vec_id",
        "embedding", k = 4, nProbe = 2, m = 4, dim = 8,
        bookSeeds = bookSeeds)
      .orderBy("query_id", "rank").collect().map(_.toSeq).toSeq
    graft.core.OpCache.release()
    Similarity.writeIvfPqIndex(clustered, seeds, "vec_id", "embedding",
      m = 4, dim = 8, path, bookSeeds = bookSeeds)
    val served = Similarity.pqIvfTopKFromIndex(q, path, "vec_id",
        "embedding", k = 4, nProbe = 2)
      .orderBy("query_id", "rank").collect().map(_.toSeq).toSeq
    graft.core.OpCache.release()
    assert(served === inQuery)
  }

  test("incremental append: appended index serves the full-rebuild ranking; stale codes superseded") {
    val base = java.nio.file.Files.createTempDirectory("graft_ivfpq_app")
      .toString
    val (inc, full) = (s"$base/inc", s"$base/full")
    val seeds = clustered.filter(col("vec_id") < 4)
    val bookSeeds = clustered.filter(col("vec_id") >= 4 && col("vec_id") < 20)
    val q = clustered.filter(col("vec_id") >= 20 && col("vec_id") < 28)
    // re-ingested ids (every 3rd vector from 20 up) start out STALE —
    // negated vectors land in different cells than their replacements,
    // the case a within-partition dedup cannot fix
    val reIngested = col("vec_id") >= 20 && col("vec_id") % 3 === 0
    val stale = clustered.withColumn("embedding",
      when(reIngested, transform(col("embedding"), x => -x))
        .otherwise(col("embedding")))
    Similarity.writeIvfPqIndex(stale, seeds, "vec_id", "embedding",
      m = 4, dim = 8, inc, bookSeeds = bookSeeds)
    Similarity.appendToIvfPqIndex(clustered.filter(reIngested), inc,
      "vec_id", "embedding")
    graft.core.OpCache.release()
    Similarity.writeIvfPqIndex(clustered, seeds, "vec_id", "embedding",
      m = 4, dim = 8, full, bookSeeds = bookSeeds)
    val servedInc = Similarity.pqIvfTopKFromIndex(q, inc, "vec_id",
        "embedding", k = 4, nProbe = 2)
      .orderBy("query_id", "rank").collect().map(_.toSeq).toSeq
    graft.core.OpCache.release()
    val servedFull = Similarity.pqIvfTopKFromIndex(q, full, "vec_id",
        "embedding", k = 4, nProbe = 2)
      .orderBy("query_id", "rank").collect().map(_.toSeq).toSeq
    graft.core.OpCache.release()
    assert(servedInc === servedFull)
    // a second append supersedes the first for the same id
    Similarity.appendToIvfPqIndex(
      clustered.filter(col("vec_id") === 21L), inc, "vec_id", "embedding")
    graft.core.OpCache.release()
    val again = Similarity.pqIvfTopKFromIndex(q, inc, "vec_id",
        "embedding", k = 4, nProbe = 2)
      .orderBy("query_id", "rank").collect().map(_.toSeq).toSeq
    graft.core.OpCache.release()
    assert(again === servedFull)
    // a REBUILD at the appended path resets the generation clock:
    // stale tombstones must not drop the fresh gen-0 codes
    Similarity.writeIvfPqIndex(clustered, seeds, "vec_id", "embedding",
      m = 4, dim = 8, inc, bookSeeds = bookSeeds)
    assert(!new java.io.File(s"$inc/tombstones").exists())
    val rebuilt = Similarity.pqIvfTopKFromIndex(q, inc, "vec_id",
        "embedding", k = 4, nProbe = 2)
      .orderBy("query_id", "rank").collect().map(_.toSeq).toSeq
    graft.core.OpCache.release()
    assert(rebuilt === servedFull)
  }

  test("empty delta append is a no-op: no new generation, serving unchanged") {
    val path = java.nio.file.Files.createTempDirectory("graft_app_empty")
      .toString + "/idx"
    val seeds = clustered.filter(col("vec_id") < 4)
    val bookSeeds = clustered.filter(col("vec_id") >= 4 && col("vec_id") < 20)
    val q = clustered.filter(col("vec_id") >= 20 && col("vec_id") < 24)
    Similarity.writeIvfPqIndex(clustered, seeds, "vec_id", "embedding",
      m = 4, dim = 8, path, bookSeeds = bookSeeds)
    val before = Similarity.pqIvfTopKFromIndex(q, path, "vec_id",
        "embedding", k = 4, nProbe = 2)
      .orderBy("query_id", "rank").collect().map(_.toSeq).toSeq
    graft.core.OpCache.release()
    Similarity.appendToIvfPqIndex(clustered.filter(col("vec_id") < 0),
      path, "vec_id", "embedding")
    // no tombstone sidecar appears for an empty delta
    assert(!new java.io.File(s"$path/tombstones").exists())
    val after = Similarity.pqIvfTopKFromIndex(q, path, "vec_id",
        "embedding", k = 4, nProbe = 2)
      .orderBy("query_id", "rank").collect().map(_.toSeq).toSeq
    graft.core.OpCache.release()
    assert(after === before)
  }

  test("incremental append supersedes correctly on a string-id index") {
    val sc = clustered.select(
      format_string("v%02d", col("vec_id")).as("vec_id"), col("embedding"))
    val seeds = sc.filter(col("vec_id") < "v04")
    val bookSeeds = sc.filter(col("vec_id") >= "v04" && col("vec_id") < "v20")
    val q = sc.filter(col("vec_id") >= "v20" && col("vec_id") < "v28")
    val reIngested = col("vec_id") >= "v20" && col("vec_id").endsWith("1")
    val stale = sc.withColumn("embedding",
      when(reIngested, transform(col("embedding"), x => -x))
        .otherwise(col("embedding")))
    val base = java.nio.file.Files.createTempDirectory("graft_app_str")
      .toString
    val (inc, full) = (s"$base/inc", s"$base/full")
    Similarity.writeIvfPqIndex(stale, seeds, "vec_id", "embedding",
      m = 4, dim = 8, inc, bookSeeds = bookSeeds)
    Similarity.appendToIvfPqIndex(sc.filter(reIngested), inc,
      "vec_id", "embedding")
    graft.core.OpCache.release()
    Similarity.writeIvfPqIndex(sc, seeds, "vec_id", "embedding",
      m = 4, dim = 8, full, bookSeeds = bookSeeds)
    val servedInc = Similarity.pqIvfTopKFromIndex(q, inc, "vec_id",
        "embedding", k = 4, nProbe = 2)
      .orderBy("query_id", "rank").collect().map(_.toSeq).toSeq
    graft.core.OpCache.release()
    val servedFull = Similarity.pqIvfTopKFromIndex(q, full, "vec_id",
        "embedding", k = 4, nProbe = 2)
      .orderBy("query_id", "rank").collect().map(_.toSeq).toSeq
    graft.core.OpCache.release()
    assert(servedInc === servedFull)
  }

  // SKEWED-SEED corpus: the 4 lowest ids — the seeded coarse model —
  // all sit in cluster 0, so seeded cells cannot discriminate the
  // other three clusters; k-means training escapes the bad init
  // (ids 4+ cycle clusters as in `clustered`)
  private def skewSeeded = {
    val rnd = new scala.util.Random(41)
    val centers = Array.tabulate(4, 8)((c, d) =>
      if (d / 2 == c) 4f else 0f)
    (0 until 72).map { i =>
      val c = if (i < 4) 0 else i % 4
      val v = centers(c).map(x =>
        x + (rnd.nextInt(33) - 16).toFloat / 16f).toSeq
      (i.toLong, v)
    }.toDF("vec_id", "embedding")
  }

  test("trained coarse cells beat seeded cells at equal nProbe") {
    val corpus = skewSeeded
    val bookSeeds = corpus.filter(col("vec_id") >= 4 && col("vec_id") < 20)
    val q = corpus.filter(col("vec_id") >= 20 && col("vec_id") < 36)
    val gold = Similarity.bruteForceTopK(q, corpus, "vec_id", "embedding",
        k = 4, roundDp = -1, exact = true)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    graft.core.OpCache.release()
    def recall(seeds: org.apache.spark.sql.DataFrame): Double = {
      val got = Similarity.pqIvfAdcRank(q, corpus, seeds, "vec_id",
          "embedding", k = 4, nProbe = 1, m = 4, dim = 8,
          bookSeeds = bookSeeds)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      graft.core.OpCache.release()
      got.count(gold.contains).toDouble / gold.size
    }
    val seededR = recall(corpus.filter(col("vec_id") < 4))
    // trained coarse centroids (float-quantized for the serving
    // layout — the q206 composition) from the SAME bad init
    val cents = Similarity.kmeansCentroidsExact(corpus, "vec_id",
      "embedding", k = 4, iters = 3)
    val trained = cents.zipWithIndex.toSeq.map { case (c, i) =>
      (i.toLong, c.map(_.toFloat).toSeq) }.toDF("vec_id", "embedding")
    val trainedR = recall(trained)
    info(s"recall@4 at nProbe=1: trained=$trainedR seeded=$seededR")
    assert(trainedR >= seededR,
      s"trained recall $trainedR < seeded recall $seededR")
    assert(trainedR > 0.3, s"trained recall $trainedR suspiciously low")
  }

  test("flat-PQ append + tombstone supersede: certified serve ≡ brute force over the true corpus") {
    val path = java.nio.file.Files.createTempDirectory("graft_pqapp").toString + "/idx"
    // the BASE index holds a STALE corpus: %3==0 docs missing, %6==1
    // docs carry a reversed (wrong) vector — the re-crawl state
    val stale = corpus.select(col("vec_id"),
        when(col("vec_id") % 6 === 1L, reverse(col("embedding")))
          .otherwise(col("embedding")).as("embedding"))
      .filter(col("vec_id") % 3 =!= 0L)
    // books trained on the STALE base — the certificate must not
    // care (≡ brute force for ANY codebook), only the codes must be
    // live
    val books = Similarity.pqCodebooksExact(stale, "vec_id", "embedding",
      dim = 8, m = 4, ks = 4, iters = 2)
    Similarity.writePqIndex(stale, "vec_id", "embedding", books, path)
    // one crawl delta: the new docs AND the re-crawled true vectors
    Similarity.appendToPqIndex(
      corpus.filter(col("vec_id") % 3 === 0L || col("vec_id") % 6 === 1L),
      path, "vec_id", "embedding")
    val q = corpus.filter(col("vec_id") < 10)
    val gold = Similarity.bruteForceTopK(q, corpus, "vec_id", "embedding",
        k = 4, roundDp = -1, exact = true)
      .orderBy("query_id", "rank").collect().map(_.toSeq).toSeq
    graft.core.OpCache.release()
    val served = Similarity.pqTopKFromIndex(q, corpus, "vec_id", "embedding",
        k = 4, path, roundDp = -1)
      .orderBy("query_id", "rank").collect().map(_.toSeq).toSeq
    graft.core.OpCache.release()
    assert(served === gold)
    // a REBUILD at the same path resets the generation clock: stale
    // tombstones must not drop the fresh gen-0 codes
    Similarity.writePqIndex(corpus, "vec_id", "embedding", books, path)
    val rebuilt = Similarity.pqTopKFromIndex(q, corpus, "vec_id", "embedding",
        k = 4, path, roundDp = -1)
      .orderBy("query_id", "rank").collect().map(_.toSeq).toSeq
    graft.core.OpCache.release()
    assert(rebuilt === gold)
    assert(!new java.io.File(s"$path/tombstones").exists())
  }

  test("PQ commit protocol: orphan codes invisible, batchKey idempotent, compaction folds tombstones") {
    import org.apache.spark.sql.functions.{col, lit}
    val path = java.nio.file.Files.createTempDirectory("graft_pqcommit").toString + "/idx"
    val base = corpus.filter(col("vec_id") % 3 =!= 0L)
    val delta = corpus.filter(col("vec_id") % 3 === 0L)
    val books = Similarity.pqCodebooksExact(base, "vec_id", "embedding",
      dim = 8, m = 4, ks = 4, iters = 2)
    Similarity.writePqIndex(base, "vec_id", "embedding", books, path)
    val q = corpus.filter(col("vec_id") < 10)
    def serve() = {
      val r = Similarity.pqTopKFromIndex(q, corpus, "vec_id", "embedding",
          k = 4, path, roundDp = -1)
        .orderBy("query_id", "rank").collect().map(_.toSeq).toSeq
      graft.core.OpCache.release(); r
    }
    val before = serve()
    // a mid-append crash: orphan codes rows + an EMPTY manifest
    spark.read.parquet(s"$path/codes").limit(2)
      .withColumn("_gen", lit(9L)).withColumn("_slice", lit("dead-nonce"))
      .write.mode("append").parquet(s"$path/codes")
    spark.emptyDataFrame.select(lit(0L).as("neighbor_id"),
        lit(0L).as("gen"), lit("").as("slice"),
        lit(null).cast("string").as("batch_key")).limit(0)
      .write.mode("append").parquet(s"$path/tombstones")
    assert(serve() === before) // duplicates of live ids stay invisible
    // the committed retry (as a keyed batch) applies once
    Similarity.appendToPqIndex(delta, path, "vec_id", "embedding",
      batchKey = "b0")
    val gold = Similarity.bruteForceTopK(q, corpus, "vec_id", "embedding",
        k = 4, roundDp = -1, exact = true)
      .orderBy("query_id", "rank").collect().map(_.toSeq).toSeq
    graft.core.OpCache.release()
    assert(serve() === gold)
    Similarity.appendToPqIndex(corpus.limit(3), path, "vec_id", "embedding",
      batchKey = "b0") // re-delivery: skipped
    assert(serve() === gold)
    // compaction: live committed rows only, no tombstones, serve equal
    val dst = java.nio.file.Files.createTempDirectory("graft_pqcmp").toString + "/idx"
    Similarity.compactPqIndex(spark, path, dst)
    assert(!new java.io.File(s"$dst/tombstones").exists())
    val served = Similarity.pqTopKFromIndex(q, corpus, "vec_id", "embedding",
        k = 4, dst, roundDp = -1)
      .orderBy("query_id", "rank").collect().map(_.toSeq).toSeq
    graft.core.OpCache.release()
    assert(served === gold)
    assert(spark.read.parquet(s"$dst/codes").count() === corpus.count())
  }

  test("PQ delete: served ≡ brute force over the remaining corpus; re-ingest resurrects") {
    import org.apache.spark.sql.functions.col
    val path = java.nio.file.Files.createTempDirectory("graft_pqdel").toString + "/idx"
    val books = Similarity.pqCodebooksExact(corpus, "vec_id", "embedding",
      dim = 8, m = 4, ks = 4, iters = 2)
    Similarity.writePqIndex(corpus, "vec_id", "embedding", books, path)
    Similarity.deleteFromPqIndex(
      corpus.filter(col("vec_id") % 5 === 0L).select(col("vec_id")),
      path, "vec_id")
    val q = corpus.filter(col("vec_id") < 10)
    val remaining = corpus.filter(col("vec_id") % 5 =!= 0L)
    def gold(c: org.apache.spark.sql.DataFrame) = {
      val g = Similarity.bruteForceTopK(q, c, "vec_id", "embedding",
          k = 4, roundDp = -1, exact = true)
        .orderBy("query_id", "rank").collect().map(_.toSeq).toSeq
      graft.core.OpCache.release(); g
    }
    def serve() = {
      // the full corpus rides along for the re-score join — deleted
      // ids drop out because their codes rows are dead
      val r = Similarity.pqTopKFromIndex(q, corpus, "vec_id", "embedding",
          k = 4, path, roundDp = -1)
        .orderBy("query_id", "rank").collect().map(_.toSeq).toSeq
      graft.core.OpCache.release(); r
    }
    assert(serve() === gold(remaining))
    Similarity.appendToPqIndex(corpus.filter(col("vec_id") === 10L),
      path, "vec_id", "embedding")
    assert(serve() ===
      gold(remaining.unionByName(corpus.filter(col("vec_id") === 10L))))
  }
}
