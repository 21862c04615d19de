package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{UnigramExpressions, UnigramLmModel}

/** Unigram-LM (SentencePiece-style) subword tokenizer trainer —
  * Kudo, "Subword Regularization: Improving Neural Network
  * Translation Models with Multiple Subword Candidates", ACL 2018,
  * the third production tokenizer family beside BPE
  * ([[BpeTrainer]], Sennrich ACL 2016) and WordPiece (q123, Song
  * EMNLP 2021). Trains on the DISTINCT-WORD table:
  *
  *  1. SEED inventory: every corpus character (never prunable —
  *     guarantees coverage) plus the top-K multi-char substrings
  *     (length ≤ `maxPieceLen`) by occurrence-weighted corpus
  *     frequency; initial piece probabilities ∝ those frequencies.
  *  2. EM rounds (hard-EM / Viterbi variant — the E-step uses the
  *     single best segmentation rather than lattice expectations;
  *     documented simplification of Kudo §3.2, exactly replayable
  *     cross-engine where forward-backward's float sums are not):
  *     Viterbi-segment every distinct word under the current model
  *     ([[graft.functions.UnigramKernel]] — integer-exact scaled
  *     costs, ties to the longest piece), count piece usage
  *     weighted by word frequency, then re-estimate p(s) with
  *     add-one smoothing over the FIXED inventory (keeps every
  *     piece alive and the round structure oracle-replayable; the
  *     pruning schedule of full SentencePiece is a vocab-size
  *     knob, not a semantics change).
  *
  * Neg-log-probs are quantized to 9-dp SCALED LONGS
  * (round(−ln(c/C)·1e9) — the q133 scaled-integer discipline), so
  * every Viterbi comparison and every EM hand-off is bit-identical
  * in any engine; the DuckDB oracle replays seeding, both EM
  * rounds' DP folds, and the final model.
  *
  * 100 TB shape: the corpus collapses to the distinct-word table
  * ONCE (vocabulary-sized — Heaps' law, millions of rows, not
  * corpus-sized); seeding is one explode+groupBy over it (shuffle ∝
  * distinct substrings); each EM round is a map-side segmentation
  * under a plan-constant model plus a map-side-combinable count;
  * driver traffic is one model-sized collect per round (the
  * [[BpeTrainer]] contract — models ride `addReferenceObj`, never
  * a join).
  */
object UnigramTrainer {

  /** Distinct words with corpus frequency (the q123 word table). */
  def distinctWords(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(graft.functions.Text.tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))

  /** Occurrence-weighted substring counts of one length. */
  private def grams(words: DataFrame, n: Int): DataFrame =
    words.filter(length(col("w")) >= n)
      .select(col("freq"), explode(expr(
        s"transform(sequence(1, length(w) - ${n - 1}), i -> substring(w, i, $n))")).as("piece"))
      .groupBy("piece").agg(sum(col("freq")).as("f"))

  /** Seed inventory: all single chars ∪ top-`topKMulti` substrings of
    * length 2..`maxPieceLen` by (occurrence-weighted freq DESC,
    * piece). Output: (piece, f).
    */
  def seedInventory(words: DataFrame, maxPieceLen: Int, topKMulti: Int): DataFrame = {
    require(maxPieceLen >= 2, s"maxPieceLen must be >= 2, got $maxPieceLen")
    require(topKMulti >= 1, s"topKMulti must be >= 1, got $topKMulti")
    val chars = grams(words, 1)
    val multi = (2 to maxPieceLen).map(grams(words, _))
      .reduce(_ unionByName _)
      .orderBy(col("f").desc, col("piece")).limit(topKMulti)
    chars.unionByName(multi)
  }

  /** nlp9 = round(−ln(c / Σc) · 1e9) as an exact long, in-plan. */
  private def nlp9(c: Column, tot: Column): Column =
    round(-log(c.cast("double") / tot.cast("double")) * 1e9).cast("long")

  /** Collect a (piece, c) frame into a plan-constant model.
    * Model-sized by contract; ordered collect (plan must not depend
    * on collect order).
    */
  private def modelFrom(counts: DataFrame): UnigramLmModel = {
    // the normalizer rides a GLOBAL window over the model-sized counts
    // frame (one single-partition exchange inside the one collect job)
    // instead of a separate aggregate + broadcast-exchange job per EM
    // round — same exact long sum, same in-engine nlp9 arithmetic,
    // half the jobs per round
    val w = org.apache.spark.sql.expressions.Window
      .rowsBetween(Long.MinValue, Long.MaxValue)
    val rows = counts
      .select(col("piece"), nlp9(col("c"), sum(col("c")).over(w)).as("_nlp"))
      .orderBy("piece")
      .collect()
    new UnigramLmModel(
      rows.map(_.getString(0)), rows.map(_.getLong(1)))
  }

  /** Raw Viterbi piece counts of `words` under `model`, left-joined
    * back to the fixed inventory: (piece, c_raw ≥ 0).
    */
  private def segCounts(words: DataFrame, inventory: DataFrame,
      model: UnigramLmModel): DataFrame = {
    val c = words.select(col("freq"),
        explode(UnigramExpressions.unigramSegment(col("w"), model)).as("piece"))
      .groupBy("piece").agg(sum("freq").as("_cr"))
    inventory.select("piece").join(c, Seq("piece"), "left")
      .select(col("piece"), coalesce(col("_cr"), lit(0L)).as("c_raw"))
  }

  /** Train `emRounds` hard-EM rounds; returns the LAZY final piece
    * table (piece, freq = raw Viterbi count under the last-round
    * input model, nlp9 = the re-estimated final model's scaled
    * neg-log-prob with add-one smoothing). One model-sized collect
    * per round before the last.
    */
  def train(words: DataFrame, maxPieceLen: Int, topKMulti: Int,
      emRounds: Int): DataFrame = {
    require(emRounds >= 1, s"emRounds must be >= 1, got $emRounds")
    import graft.core.OpCache.TrackedPersist
    val w = words.persistTracked
    val inventory = seedInventory(w, maxPieceLen, topKMulti).persistTracked
    var model = modelFrom(inventory.select(col("piece"), col("f").as("c")))
    for (_ <- 1 until emRounds) {
      model = modelFrom(
        segCounts(w, inventory, model)
          .select(col("piece"), (col("c_raw") + 1L).as("c")))
    }
    // the LAST round's counts stay lazy — the output plan IS the
    // final E-step plus the in-plan M-step re-estimate (persisted:
    // the normalizer aggregate and the output both read it)
    val counts = segCounts(w, inventory, model).persistTracked
    val sm = counts.select(col("piece"), col("c_raw"), (col("c_raw") + 1L).as("c"))
    val tot = sm.agg(sum(col("c")).as("_tot"))
    sm.crossJoin(broadcast(tot))
      .select(col("piece"), col("c_raw").as("freq"),
        nlp9(col("c"), col("_tot")).as("nlp9"))
  }

  /** [[train]] plus the VOCAB-SIZE KNOB — the pruning step that makes
    * the trainer a production tokenizer (SentencePiece trains a large
    * seed inventory and prunes toward --vocab_size; Kudo §3.2 prunes
    * by likelihood loss, this prunes by final-round usage — the
    * count-ordered simplification that stays exactly SQL-replayable;
    * a piece's hard-EM likelihood contribution is monotone in its
    * usage count for fixed segmentations, so the orders agree except
    * near the cut line). Single chars are NEVER pruned (coverage);
    * the top `pruneToMulti` multi-char pieces by (final-round count
    * DESC, piece) survive; probabilities re-estimate add-one over the
    * PRUNED inventory and one more Viterbi pass produces the final
    * table — (piece, freq = count under the pruned model, nlp9).
    */
  def trainPruned(words: DataFrame, maxPieceLen: Int, topKMulti: Int,
      emRounds: Int, pruneToMulti: Int): DataFrame = {
    require(emRounds >= 1, s"emRounds must be >= 1, got $emRounds")
    require(pruneToMulti >= 0, s"pruneToMulti must be >= 0, got $pruneToMulti")
    import graft.core.OpCache.TrackedPersist
    val w = words.persistTracked
    val inventory = seedInventory(w, maxPieceLen, topKMulti).persistTracked
    var model = modelFrom(inventory.select(col("piece"), col("f").as("c")))
    for (_ <- 1 to emRounds) {
      model = modelFrom(
        segCounts(w, inventory, model)
          .select(col("piece"), (col("c_raw") + 1L).as("c")))
    }
    // prune on usage under the final EM model
    val cnts = segCounts(w, inventory, model).persistTracked
    val prunedInv = cnts.filter(length(col("piece")) === 1).select("piece")
      .unionByName(cnts.filter(length(col("piece")) > 1)
        .orderBy(col("c_raw").desc, col("piece")).limit(pruneToMulti)
        .select("piece"))
      .persistTracked
    val prunedModel = modelFrom(
      cnts.join(prunedInv, Seq("piece"), "left_semi")
        .select(col("piece"), (col("c_raw") + 1L).as("c")))
    val fin = segCounts(w, prunedInv, prunedModel).persistTracked
    val sm = fin.select(col("piece"), col("c_raw"), (col("c_raw") + 1L).as("c"))
    val tot = sm.agg(sum(col("c")).as("_tot"))
    sm.crossJoin(broadcast(tot))
      .select(col("piece"), col("c_raw").as("freq"),
        nlp9(col("c"), col("_tot")).as("nlp9"))
  }

  /** Train and hand back the plan-constant MODEL (for application
    * queries — the q144 shape). Identical rounds to [[train]].
    */
  def trainModel(words: DataFrame, maxPieceLen: Int, topKMulti: Int,
      emRounds: Int): UnigramLmModel = {
    require(emRounds >= 1, s"emRounds must be >= 1, got $emRounds")
    import graft.core.OpCache.TrackedPersist
    val w = words.persistTracked
    val inventory = seedInventory(w, maxPieceLen, topKMulti).persistTracked
    var model = modelFrom(inventory.select(col("piece"), col("f").as("c")))
    for (_ <- 1 to emRounds) {
      val counts = segCounts(w, inventory, model)
      model = modelFrom(
        counts.select(col("piece"), (col("c_raw") + 1L).as("c")))
    }
    model
  }
}
