package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The POINTER in "write-new-flip-pointer" — the missing operational
  * piece of the compaction story (q226/q233/q236 write the new index;
  * this is the flip). An ALIAS directory holds one tiny versioned
  * pointer file per flip (`ptr.00000001`, `ptr.00000002`, …), each
  * containing the target index path; readers [[resolve]] the alias to
  * the highest version and serve from that path.
  *
  * Atomicity without rename games: a flip CREATES a new object (next
  * version number), never overwrites or renames — a single file
  * create/PUT is atomic on HDFS, posix and object stores alike, and
  * a reader listing mid-flip sees either the old set (old target) or
  * the new set (new target), never a torn pointer. Version numbers
  * also give FLIP HISTORY for free ([[history]]): every target the
  * alias ever served, in order — pair it with `IndexLineage` (which
  * records where each compacted target came from) and the full
  * operational lineage of a serving alias is reconstructable.
  *
  * Flip concurrency: IN-PROCESS flips serialize on a JVM lock
  * (flips are rare — one per compaction), so same-process races
  * always produce distinct versions. CROSS-PROCESS flips are the
  * index writers' single-flipper contract, with two loud detectors
  * where the store allows: create-exclusive (HDFS throws on a
  * double-create of one version) and a post-write read-back (an
  * overwriting store returns the foreign winner's target).
  *
  * Retention workflow this enables (the [[IndexLineage]] contract):
  *   1. compact `src` → `dst` (src untouched, still serving);
  *   2. `flip(alias, dst)` — new readers resolve to dst;
  *   3. runs pinned to `asOfGen = N` of src keep reading src
  *      DIRECTLY (pins hold paths, not aliases);
  *   4. drop src only when no pin remains.
  */
object IndexPointer {

  private val Prefix = "ptr."

  private def fs(spark: SparkSession, dir: String) =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def versions(spark: SparkSession,
      aliasDir: String): Seq[(Long, org.apache.hadoop.fs.Path)] = {
    val d = new org.apache.hadoop.fs.Path(aliasDir)
    val f = fs(spark, aliasDir)
    if (!f.exists(d)) Seq.empty
    else f.listStatus(d).toSeq.map(_.getPath)
      .filter(_.getName.startsWith(Prefix))
      .flatMap(p => p.getName.stripPrefix(Prefix).toLongOption.map(_ -> p))
      .sortBy(_._1)
  }

  private def readTarget(spark: SparkSession,
      p: org.apache.hadoop.fs.Path): String = {
    val in = p.getFileSystem(spark.sparkContext.hadoopConfiguration).open(p)
    try new String(in.readAllBytes(), "UTF-8").trim
    finally in.close()
  }

  /** In-process flips serialize here (flips are rare — one per
    * compaction — so one JVM-wide lock costs nothing and makes
    * same-process races impossible; RawLocalFileSystem's
    * create(overwrite=false) is an exists-check, not atomic, so the
    * lock is what makes local two-thread flips safe).
    */
  private val flipLock = new Object

  /** Point `aliasDir` at `targetPath`. Returns the new version. */
  def flip(spark: SparkSession, aliasDir: String,
      targetPath: String): Long = flipLock.synchronized {
    // trim up front: readTarget trims (trailing-newline tolerance),
    // so an untrimmed write would spuriously fail its own read-back
    val target = targetPath.trim
    require(target.nonEmpty && !target.contains("\n"),
      "target path must be one non-empty line")
    val f = fs(spark, aliasDir)
    val d = new org.apache.hadoop.fs.Path(aliasDir)
    if (!f.exists(d)) f.mkdirs(d)
    val v = versions(spark, aliasDir).lastOption.map(_._1).getOrElse(0L) + 1L
    val p = new org.apache.hadoop.fs.Path(d, f"$Prefix$v%08d")
    // CROSS-PROCESS belt-and-braces: create-exclusive (overwrite =
    // false) throws on HDFS if a foreign flipper claimed our version
    val out = f.create(p, false)
    try out.write(target.getBytes("UTF-8")) finally out.close()
    // …and on stores without create-exclusivity, the read-back
    // catches a foreign overwrite of our version — BEST-EFFORT only
    // (ADVICE r20): on an overwrite-capable store the read-back can
    // return this writer's own bytes before the racing flip's
    // overwrite lands, so BOTH flips may report success and one
    // target is lost. Cross-PROCESS flips on such stores therefore
    // need an external single-flipper contract (the single-writer
    // discipline indexes already require); within one JVM flipLock
    // makes the race impossible, and on HDFS-class stores the
    // create-exclusive PUT above is the real guarantee.
    val back = readTarget(spark, p)
    if (back != target)
      throw new IllegalStateException(
        s"pointer flip collision at $aliasDir version $v: wrote " +
          s"'$target', read back '$back' — two concurrent flips " +
          "raced the version number; retry the losing flip")
    v
  }

  /** The current target of the alias (highest pointer version). */
  def resolve(spark: SparkSession, aliasDir: String): String = {
    val vs = versions(spark, aliasDir)
    require(vs.nonEmpty, s"no pointer at $aliasDir — flip() one first")
    readTarget(spark, vs.last._2)
  }

  /** Every flip, in order: (version, target) — the alias's serving
    * history. Driver-side read of pointer-file-count tiny files.
    */
  def history(spark: SparkSession, aliasDir: String): DataFrame = {
    import spark.implicits._
    versions(spark, aliasDir)
      .map { case (v, p) => (v, readTarget(spark, p)) }
      .toDF("version", "target")
  }
}
