package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every registered query on
  * $SPARK_GRAFT_SF_DIR, forcing FULL evaluation (noop sink — a bare
  * .count() would let Catalyst prune every computed column), prints one
  * JSON line. Failures are reported as value -1, never hidden as fast
  * timings.
  *
  * Each query is timed over SPARK_GRAFT_ITERS runs (default 2) and the
  * MINIMUM is reported: steady-state throughput is the number that
  * scales to a long-running cluster, while a single cold pass mixes in
  * one-time JIT/codegen-cache/file-cache effects that vary ±25%
  * run-to-run at sf0.1.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // catalog-backed layout queries (q73 bucketing) must not drop a
      // spark-warehouse dir into the repo cwd
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_wh").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the JVM (codegen, parquet reader, shuffle machinery) so the
    // first query isn't charged ~4s of one-time class loading
    try {
      spark.range(1000).selectExpr("sum(id)").collect()
      spark.read.parquet(s"$sfDir/nation.parquet").count()
    } catch { case _: Throwable => () }
    // SPARK_GRAFT_ONLY=q17_cosine_topk,q25_asof — iterate on a subset
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
      val iters = sys.env.getOrElse("SPARK_GRAFT_ITERS", "2").toInt
      val times = (1 to iters).map { _ =>
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}"); false
          }
        val dt = (System.nanoTime() - t0) / 1e9
        // drop operator-persisted intermediates (q16/q17 pipelines
        // cache) so runs are independent and the cache never
        // accumulates; clearCache additionally covers any
        // cacheTable-style entries outside the registry
        graft.core.OpCache.release()
        spark.catalog.clearCache()
        // broadcast/shuffle blocks are only reclaimed when the
        // ContextCleaner sees their refs collected — force that
        // between queries so query N's garbage never bills query N+1
        // (the GC pause itself lands outside the next timing window)
        System.gc()
        if (ok) dt else -1.0
      }
      name -> (if (times.contains(-1.0)) -1.0 else times.min)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    val failed = results.count(_._2 < 0)
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir"}"""
    println(line)
    // persist the full line as an artifact: the driver captures stdout
    // through a bounded tail buffer that has truncated past rounds'
    // per-query maps (BENCH_r10 lost q01-q13; BENCH_r12 wasn't even
    // parseable) — a file written here is the durable record
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_latest.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (line + "\n").getBytes("UTF-8"))
    catch { case e: Throwable =>
      System.err.println(s"[bench] could not write $out: ${e.getMessage}") }
    // and END stdout with a line SHORT enough to survive any tail
    // buffer whole: the headline numbers plus the slowest queries,
    // with a pointer to the full per-query map. Tail-grabbers parse
    // this; humans and the driver lift `out` verbatim.
    val slow = results.filter(_._2 >= 0).sortBy(-_._2).take(8)
      .map { case (k, v) => "\"" + k + "\":" + math.round(v * 1000) / 1000.0 }
      .mkString("{", ",", "}")
    println(s"""{"metric":"total","value":$total,"unit":"sec","n_queries":${results.size},""" +
      s""""failed":$failed,"sf":"$sfDir","slowest":$slow,"queries_file":"$out"}""")
    spark.stop()
  }
}
