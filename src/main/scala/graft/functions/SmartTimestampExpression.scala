package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.types.{DataType, StringType, TimestampType}
import org.apache.spark.unsafe.types.UTF8String

/** `smart_to_timestamp(str)` — native Catalyst expression for the reference's
  * multi-locale date parsing (B3, analysis/helpers.py:13-27).
  *
  * Why an Expression and not a coalesce of try_to_timestamp formats: the
  * 16-format chain generated ~11k lines of Java per projection, tripping
  * Janino's 64 KB method limit → whole-stage codegen fell back to interpreted
  * eval. Here doGenCode emits ONE static call into SmartDateUtil, so the
  * expression costs a few lines inside the stage and stays codegen'd at any
  * schema width. */
case class SmartToTimestamp(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"smart_to_timestamp expects a string argument, got ${child.dataType.sql}")

  override def dataType: DataType = TimestampType
  override def nullable: Boolean = true
  override def prettyName: String = "smart_to_timestamp"

  override protected def nullSafeEval(input: Any): Any =
    SmartDateUtil.parseMicrosBoxed(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val util = SmartDateUtil.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => {
      val tmp = ctx.freshName("smartTs")
      s"""
         |java.lang.Long $tmp = $util.parseMicrosBoxed($c);
         |if ($tmp == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $tmp.longValue();
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): SmartToTimestamp =
    copy(child = newChild)
}

/** Registration: either inject via `spark.sql.extensions=graft.GraftExtensions`
  * or call `GraftFunctions.register(spark)` on an existing session. */
object GraftFunctions {

  private def literalLong(e: Expression): Long =
    e.eval(null) match {
      case i: Int => i.toLong
      case l: Long => l
      case other => throw new IllegalArgumentException(s"expected integer literal, got $other")
    }

  private def literalDouble(e: Expression): Double =
    e.eval(null) match {
      case d: Double => d
      case f: Float => f.toDouble
      case i: Int => i.toDouble
      case l: Long => l.toDouble
      case d: java.math.BigDecimal => d.doubleValue()
      case d: org.apache.spark.sql.types.Decimal => d.toDouble
      case other => throw new IllegalArgumentException(s"expected numeric literal, got $other")
    }

  private def literalInt(e: Expression): Int =
    e.eval(null) match {
      case i: Int => i
      case l: Long => l.toInt
      case other => throw new IllegalArgumentException(s"expected integer literal, got $other")
    }

  private val fns: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (new FunctionIdentifier("smart_to_timestamp"),
      new ExpressionInfo(classOf[SmartToTimestamp].getName, "smart_to_timestamp"),
      (args: Seq[Expression]) => SmartToTimestamp(args.head)),
    (new FunctionIdentifier("graft_simhash64"),
      new ExpressionInfo(classOf[GraftSimhash64].getName, "graft_simhash64"),
      (args: Seq[Expression]) => GraftSimhash64(args.head)),
    (new FunctionIdentifier("graft_minhash_bands"),
      new ExpressionInfo(classOf[GraftMinhashBands].getName, "graft_minhash_bands"),
      (args: Seq[Expression]) =>
        GraftMinhashBands(args.head, literalInt(args(1)), literalInt(args(2)))),
    (new FunctionIdentifier("graft_ngram_hashes"),
      new ExpressionInfo(classOf[GraftNgramHashes].getName, "graft_ngram_hashes"),
      (args: Seq[Expression]) => GraftNgramHashes(args.head, literalInt(args(1)))),
    (new FunctionIdentifier("graft_intersect_count"),
      new ExpressionInfo(classOf[GraftSortedIntersectCount].getName, "graft_intersect_count"),
      (args: Seq[Expression]) => GraftSortedIntersectCount(args.head, args(1))),
    (new FunctionIdentifier("graft_sort_distinct"),
      new ExpressionInfo(classOf[GraftSortDistinct].getName, "graft_sort_distinct"),
      (args: Seq[Expression]) => GraftSortDistinct(args.head)),
    (new FunctionIdentifier("graft_mix64"),
      new ExpressionInfo(classOf[GraftMix64].getName, "graft_mix64"),
      (args: Seq[Expression]) => GraftMix64(args.head, args(1), args(2))),
    (new FunctionIdentifier("graft_gram_hashes_fnv"),
      new ExpressionInfo(classOf[GraftGramHashesFnv].getName, "graft_gram_hashes_fnv"),
      (args: Seq[Expression]) => GraftGramHashesFnv(args.head)),
    (new FunctionIdentifier("graft_winnow_hashes"),
      new ExpressionInfo(classOf[GraftWinnowHashes].getName, "graft_winnow_hashes"),
      (args: Seq[Expression]) =>
        GraftWinnowHashes(args.head, literalInt(args(1)), literalInt(args(2)))),
    (new FunctionIdentifier("graft_shingle_hashes"),
      new ExpressionInfo(classOf[GraftShingleHashes].getName, "graft_shingle_hashes"),
      (args: Seq[Expression]) => GraftShingleHashes(args.head, literalInt(args(1)))),
    (new FunctionIdentifier("graft_lang_id"),
      new ExpressionInfo(classOf[GraftLangId].getName, "graft_lang_id"),
      (args: Seq[Expression]) => GraftLangId(args.head, literalInt(args(1)))),
    (new FunctionIdentifier("graft_hyperplane_sketch"),
      new ExpressionInfo(classOf[GraftHyperplaneSketch].getName, "graft_hyperplane_sketch"),
      (args: Seq[Expression]) => GraftHyperplaneSketch(args.head,
        literalInt(args(1)), literalInt(args(2)), literalLong(args(3)))),
    (new FunctionIdentifier("graft_hyperplane_sketches"),
      new ExpressionInfo(classOf[GraftHyperplaneSketches].getName, "graft_hyperplane_sketches"),
      (args: Seq[Expression]) => GraftHyperplaneSketches(args.head,
        literalInt(args(1)), literalInt(args(2)), literalLong(args(3)),
        literalInt(args(4)))),
    (new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[GraftDot].getName, "graft_dot"),
      (args: Seq[Expression]) => GraftDot(args.head, args(1))),
    (new FunctionIdentifier("graft_norm"),
      new ExpressionInfo(classOf[GraftNorm].getName, "graft_norm"),
      (args: Seq[Expression]) => GraftNorm(args.head)),
    (new FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[GraftCosine].getName, "graft_cosine"),
      (args: Seq[Expression]) => GraftCosine(args.head, args(1))),
    (new FunctionIdentifier("graft_l2sq"),
      new ExpressionInfo(classOf[GraftL2Sq].getName, "graft_l2sq"),
      (args: Seq[Expression]) => GraftL2Sq(args.head, args(1))),
    (new FunctionIdentifier("graft_nearest_centroid"),
      new ExpressionInfo(classOf[GraftNearestCentroid].getName, "graft_nearest_centroid"),
      (args: Seq[Expression]) => {
        // the centroid matrix must be a foldable literal (typedlit) — the
        // quantizer is trained before the plan exists
        require(args(1).foldable, "graft_nearest_centroid: centroids must be a literal")
        val ad = args(1).eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        val cents = (0 until ad.numElements()).map { i =>
          ad.getArray(i).toDoubleArray()
        }.toArray
        GraftNearestCentroid(args.head, cents)
      }),
    (new FunctionIdentifier("graft_token_hashes"),
      new ExpressionInfo(classOf[GraftTokenHashes].getName, "graft_token_hashes"),
      (args: Seq[Expression]) => GraftTokenHashes(args.head)),
    (new FunctionIdentifier("graft_token_hashes_fnv"),
      new ExpressionInfo(classOf[GraftTokenHashesFnv].getName, "graft_token_hashes_fnv"),
      (args: Seq[Expression]) => GraftTokenHashesFnv(args.head)),
    (new FunctionIdentifier("graft_text_stats"),
      new ExpressionInfo(classOf[GraftTextStats].getName, "graft_text_stats"),
      (args: Seq[Expression]) => GraftTextStats(args.head)),
    (new FunctionIdentifier("graft_quality_score"),
      new ExpressionInfo(classOf[GraftQualityScore].getName, "graft_quality_score"),
      (args: Seq[Expression]) => GraftQualityScore(args.head)),
    (new FunctionIdentifier("graft_repetition_stats"),
      new ExpressionInfo(classOf[GraftRepetitionStats].getName, "graft_repetition_stats"),
      (args: Seq[Expression]) => GraftRepetitionStats(args.head)),
    (new FunctionIdentifier("graft_normalize"),
      new ExpressionInfo(classOf[GraftNormalize].getName, "graft_normalize"),
      (args: Seq[Expression]) => GraftNormalize(args.head)),
    // Spark's runtime-filter bloom expressions, surfaced as session
    // functions so an EXPLICIT semi-join reduction can be planned (the
    // built-in InjectRuntimeFilter only fires inside one optimizer run —
    // a bloom built in job A cannot prune job B's scan without these).
    (new FunctionIdentifier("graft_bloom_agg"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
        "graft_bloom_agg"),
      (args: Seq[Expression]) =>
        if (args.length >= 2)
          new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
            args.head, literalLong(args(1)))
        else
          new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(args.head)),
    (new FunctionIdentifier("graft_bloom_contains"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
        "graft_bloom_contains"),
      (args: Seq[Expression]) =>
        new org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          args.head, args(1))),
    (new FunctionIdentifier("graft_kmv_agg"),
      new ExpressionInfo(classOf[GraftKmvAgg].getName, "graft_kmv_agg"),
      (args: Seq[Expression]) => GraftKmvAgg(args.head, literalInt(args(1)))),
    (new FunctionIdentifier("graft_kmv_sketch_agg"),
      new ExpressionInfo(classOf[GraftKmvSketchAgg].getName, "graft_kmv_sketch_agg"),
      (args: Seq[Expression]) => GraftKmvSketchAgg(args.head, literalInt(args(1)))),
    (new FunctionIdentifier("graft_mg_topk"),
      new ExpressionInfo(classOf[GraftMgTopK].getName, "graft_mg_topk"),
      (args: Seq[Expression]) => GraftMgTopK(args.head, literalInt(args(1)))),
    (new FunctionIdentifier("graft_dot_fd"),
      new ExpressionInfo(classOf[GraftDotFd].getName, "graft_dot_fd"),
      (args: Seq[Expression]) => GraftDotFd(args.head, args(1))),
    (new FunctionIdentifier("graft_gram_agg"),
      new ExpressionInfo(classOf[GraftGramAgg].getName, "graft_gram_agg"),
      (args: Seq[Expression]) => GraftGramAgg(args.head, args(1), literalInt(args(2)))),
    (new FunctionIdentifier("graft_hist"),
      new ExpressionInfo(classOf[GraftHistAgg].getName, "graft_hist"),
      (args: Seq[Expression]) => GraftHistAgg(args.head,
        literalDouble(args(1)), literalDouble(args(2)), literalInt(args(3)))))

  def register(spark: SparkSession): Unit =
    fns.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    }

  def inject(ext: SparkSessionExtensions): Unit =
    fns.foreach(ext.injectFunction)
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = GraftFunctions.inject(ext)
}
