package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PackerSpec extends SparkSpec {
  import spark.implicits._

  test("greedy boundaries, overlong isolation, hand-checked") {
    // one shard (shards=1): budget 10, chunk sizes 4,4,4 → |4,4|4…;
    // an overlong 12 gets its own sequence; following 10 fits alone
    val chunks = Seq(
      (0L, 0L, 4L), (0L, 1L, 4L), (0L, 2L, 4L),
      (0L, 3L, 12L), (0L, 4L, 10L))
      .toDF("doc_id", "chunk_idx", "n_tokens")
    val out = Packer.pack(chunks, "doc_id", "chunk_idx", "n_tokens",
        budget = 10L, shards = 1)
      .orderBy("doc_id", "chunk_idx")
      .select("seq_idx", "seq_pos").as[(Long, Long)].collect().toSeq
    assert(out === Seq((0L, 0L), (0L, 1L), (1L, 0L), (2L, 0L), (3L, 0L)))
  }

  test("property: matches a reference fold; budget respected; nothing lost") {
    val rnd = new scala.util.Random(41)
    val budget = 64L
    val rows = for (d <- 0L until 60L; c <- 0L until (1 + rnd.nextInt(4)).toLong)
      yield (d, c, 1L + rnd.nextInt(40).toLong)
    val out = Packer.pack(rows.toDF("doc_id", "chunk_idx", "n_tokens"),
        "doc_id", "chunk_idx", "n_tokens", budget, shards = 4)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))

    // nothing lost or duplicated
    assert(out.map(t => (t._2, t._3)).toSet === rows.map(t => (t._1, t._2)).toSet)

    // reference fold per shard, same order
    val byShard = rows.groupBy(_._1 % 4)
    val expected = byShard.flatMap { case (shard, rs) =>
      var seq = 0L; var used = 0L; var pos = 0L
      rs.sortBy(r => (r._1, r._2)).map { case (d, c, n) =>
        if (used > 0 && used + n > budget) { seq += 1; used = 0; pos = 0 }
        used += n; val p = pos; pos += 1
        (shard, d, c, n, seq, p)
      }
    }.toSet
    assert(out.toSet === expected)

    // every sequence of >1 chunk stays within budget
    val seqTotals = out.groupBy(t => (t._1, t._5))
      .map { case (_, ts) => (ts.length, ts.map(_._4).sum) }
    seqTotals.foreach { case (nChunks, total) =>
      if (nChunks > 1) assert(total <= budget, s"$nChunks chunks, $total tokens")
    }
  }

  test("pack is ONE exchange: the shard partition of metadata rows") {
    val df = Seq((0L, 0L, 4L)).toDF("doc_id", "chunk_idx", "n_tokens")
    val plan = Packer.pack(df, "doc_id", "chunk_idx", "n_tokens", 10L, 2)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(exchanges === 1, s"expected exactly one exchange:\n$plan")
  }

  test("non-integral id column fails fast with a clear error, not an encoder NPE") {
    // a string id would cast to NULL (non-ANSI) and only die deep in
    // the Tuple4 encoder at execution — the guard names the column
    val df = Seq(("doc-a", 0L, 4L)).toDF("doc_id", "chunk_idx", "n_tokens")
    val e = intercept[IllegalArgumentException] {
      Packer.pack(df, "doc_id", "chunk_idx", "n_tokens", budget = 10L, shards = 2)
    }
    assert(e.getMessage.contains("doc_id") && e.getMessage.contains("integral"))
  }
}
