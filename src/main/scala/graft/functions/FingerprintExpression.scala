package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared scalar kernel for [[Fingerprint]] — called from both the
  * interpreted and the generated code path so the two cannot drift.
  */
object FingerprintKernel {
  /** Σ_i codepoint(c_i)·((i mod 31)+1) mod (2³¹−1), i 1-based over
    * CODEPOINTS — exactly the semantics of [[Text.fingerprint]]'s
    * higher-order-function formulation (`length`/`substr`/`ascii` are
    * all codepoint-based).
    */
  def compute(s: UTF8String): Long = {
    val str = s.toString
    var sum = 0L
    var i = 0      // char (UTF-16) offset
    var cp = 1     // codepoint index, 1-BASED (matches sequence(1, length))
    while (i < str.length) {
      val c = str.codePointAt(i)
      sum += c.toLong * ((cp % 31) + 1)
      i += Character.charCount(c)
      cp += 1
    }
    sum % 2147483647L
  }
}

/** Native Catalyst expression for the document fingerprint
  * (LLM-pipeline text analysis, SURVEY.md §2.5).
  *
  * The composable formulation ([[Text.fingerprint]]) builds a
  * per-character array through `sequence`/`transform`/`aggregate` —
  * correct, but it allocates O(len) array elements per row and
  * evaluates lambdas interpretively. This expression is a single
  * tight loop, participates in whole-stage codegen via
  * [[doGenCode]], and shares one kernel with the interpreted path.
  * This is the (b)-tier extension point of the engine: a custom
  * `Expression` only where the built-in operators genuinely can't
  * express the computation efficiently.
  */
case class Fingerprint(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_fingerprint requires STRING, got ${child.dataType.sql}")
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_fingerprint"

  override protected def nullSafeEval(input: Any): Any =
    FingerprintKernel.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.FingerprintKernel.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Fingerprint =
    copy(child = newChild)
}

/** Registration: either inject at session build time via
  * `.withExtensions(new GraftExtensions)` /
  * `spark.sql.extensions=graft.functions.GraftExtensions`, or call
  * [[GraftFunctions.register]] on a live session (the driver owns the
  * session in this harness).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach(ext.injectFunction)
}

object FingerprintExpression {
  /** Column API for the native kernel (the HOF spec lives at
    * [[Text.fingerprint]]).
    */
  def fingerprint(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      Fingerprint(org.apache.spark.sql.graftbridge.ColumnBridge.expression(c)))
}

object GraftFunctions {
  private def descriptor(name: String, clazz: Class[_],
      builder: Seq[Expression] => Expression) =
    (FunctionIdentifier(name), new ExpressionInfo(clazz.getName, name), builder)

  /** Every native graft expression, SQL-callable. */
  val all: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    descriptor("graft_fingerprint", classOf[Fingerprint], c => Fingerprint(c.head)),
    descriptor("graft_minhash", classOf[MinhashSig], c =>
      MinhashSig(c.head, c(1).eval().asInstanceOf[Int])),
    descriptor("graft_simhash64", classOf[SimHash64], c => SimHash64(c.head)),
    descriptor("graft_simhash_poly", classOf[SimHashPoly], c => SimHashPoly(c.head)),
    descriptor("graft_shingles", classOf[WordShingles], c =>
      WordShingles(c.head, c(1).eval().asInstanceOf[Int])),
    descriptor("graft_jaccard", classOf[JaccardSim], c => JaccardSim(c.head, c(1))),
    descriptor("graft_dot", classOf[DotProduct], c => DotProduct(c.head, c(1))),
    descriptor("graft_dot_exact", classOf[DotExact], c => DotExact(c.head, c(1))),
    descriptor("graft_tokens", classOf[WordTokens], c => WordTokens(c.head)),
    descriptor("graft_count_in", classOf[CountInSet], c =>
      CountInSet(c.head, c.drop(1).map(_.eval().toString))),
    descriptor("graft_i8_scale", classOf[Int8Scale], c => Int8Scale(c.head)),
    descriptor("graft_i8_quant", classOf[Int8Quantize], c => Int8Quantize(c.head)),
    descriptor("graft_i8_dot", classOf[Int8Dot], c => Int8Dot(c.head, c(1))),
    descriptor("graft_i8_abssum", classOf[Int8AbsSum], c => Int8AbsSum(c.head)),
    // graft_term_tfs(tokens, 'term', ...): per-term tf counts over a
    // token array in ONE pass (the q79 multi-term BM25 kernel)
    descriptor("graft_term_tfs", classOf[TermTfCounts], c =>
      TermTfCounts(c.head, c.drop(1).map(_.eval().toString))),
    // graft_deletion_neighborhood(str): FastSS deletion variants (the
    // q76 edit-distance-1 fuzzy-join candidate kernel)
    descriptor("graft_deletion_neighborhood", classOf[DeletionNeighborhood], c =>
      DeletionNeighborhood(c.head)),
    // graft_nfc(str): Unicode NFC normalization (the q88 canonical-
    // text kernel)
    descriptor("graft_nfc", classOf[NfcNormalize], c => NfcNormalize(c.head)),
    // graft_cdc_chunks(text, divisor): content-defined chunking (the
    // q101 kernel)
    descriptor("graft_cdc_chunks", classOf[CdcChunks], c =>
      CdcChunks(c.head, c(1).eval().asInstanceOf[Int])),
    // graft_psl_domain(host): Public-Suffix-List registrable domain
    // (the q113 kernel; embedded snapshot table)
    descriptor("graft_psl_domain", classOf[PslDomain], c =>
      PslDomain(c.head, Psl.snapshot)),
    // graft_bpe_segment(word, l1, r1, l2, r2, ...): BPE segmentation
    // under a literal merge list in rank order (the q102 kernel)
    descriptor("graft_bpe_segment", classOf[BpeSegment], c => {
      val flat = c.drop(1)
      require(flat.nonEmpty && flat.size % 2 == 0,
        "graft_bpe_segment needs merge pairs: (word, left1, right1, ...)")
      BpeSegment(c.head,
        flat.map(_.eval().toString).grouped(2).map(p => (p(0), p(1))).toSeq)
    }),
    // graft_wordpiece(word, piece1, piece2, ...): greedy longest-
    // match-first segmentation under a literal piece inventory (the
    // q123 kernel)
    descriptor("graft_wordpiece", classOf[WordPieceSegment], c => {
      require(c.size >= 2, "graft_wordpiece needs (word, piece1, ...)")
      WordPieceSegment(c.head,
        new WordPieceVocab(c.drop(1).map(_.eval().toString).toArray))
    }),
  )

  def register(spark: SparkSession): Unit =
    all.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}
