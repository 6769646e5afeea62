package graft.plans

import graft.functions.{CountMinSketchAgg, LongArrayDot, LongArrayL1, MinHashBands, QDigestAgg, SimHash64, TokenNgrams}

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session-extension hook: makes graft's native expressions callable
  * from SQL text on any cluster via
  * `--conf spark.sql.extensions=graft.plans.GraftExtensions`
  * (or `SparkSession.builder().withExtensions(new GraftExtensions)`).
  *
  * Registers the native SQL functions, the [[TopKPerKeyStrategy]]
  * planner strategy, and the [[RowNumberTopKRewrite]] optimizer rule
  * (window top-k filters → bounded-heap operator).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.longArrayDot)
    ext.injectFunction(GraftExtensions.longArrayL1)
    ext.injectFunction(GraftExtensions.simhash64)
    ext.injectFunction(GraftExtensions.minhashBands)
    ext.injectFunction(GraftExtensions.tokenNgrams)
    ext.injectFunction(GraftExtensions.countMinSketch)
    ext.injectFunction(GraftExtensions.qdigestQuantiles)
    ext.injectFunction(GraftExtensions.qdigestQuantilesWeighted)
    ext.injectPlannerStrategy(_ => TopKPerKeyStrategy)
    ext.injectOptimizerRule(_ => RowNumberTopKRewrite)
  }
}

object GraftExtensions {

  import org.apache.spark.sql.catalyst.expressions.Literal

  /** Extract an integer-literal builder argument (buffer-sizing
    * parameters must be literals) — shared by every builder below.
    */
  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case _ => throw new IllegalArgumentException(s"$what must be an integer literal")
  }

  /** (name, info, builder) for `long_array_dot(array<bigint>, array<bigint>)`. */
  val longArrayDot: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    new FunctionIdentifier("long_array_dot"),
    new ExpressionInfo(classOf[LongArrayDot].getName, "long_array_dot"),
    (args: Seq[Expression]) => {
      require(args.length == 2, "long_array_dot(a, b) takes exactly two arguments")
      LongArrayDot(args.head, args(1))
    })

  /** (name, info, builder) for `long_array_l1(array<bigint>, array<bigint>)`. */
  val longArrayL1: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    new FunctionIdentifier("long_array_l1"),
    new ExpressionInfo(classOf[LongArrayL1].getName, "long_array_l1"),
    (args: Seq[Expression]) => {
      require(args.length == 2, "long_array_l1(a, b) takes exactly two arguments")
      LongArrayL1(args.head, args(1))
    })

  /** (name, info, builder) for `simhash64(string)`. */
  val simhash64: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    new FunctionIdentifier("simhash64"),
    new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
    (args: Seq[Expression]) => {
      require(args.length == 1, "simhash64(text) takes exactly one argument")
      SimHash64(args.head)
    })

  /** (name, info, builder) for `minhash_bands(string)`. */
  val minhashBands: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    new FunctionIdentifier("minhash_bands"),
    new ExpressionInfo(classOf[MinHashBands].getName, "minhash_bands"),
    (args: Seq[Expression]) => {
      require(args.length == 1, "minhash_bands(text) takes exactly one argument")
      MinHashBands(args.head)
    })

  /** (name, info, builder) for the aggregate
    * `count_min_sketch_exactable(tok, depth, width)` — depth/width must
    * be integer literals (they size the aggregation buffer). Returns the
    * row-major depth×width counter array; see
    * [[graft.functions.CountMinSketchAgg]] for the replayable-bucket
    * contract.
    */
  val countMinSketch: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    new FunctionIdentifier("count_min_sketch_exactable"),
    new ExpressionInfo(classOf[CountMinSketchAgg].getName, "count_min_sketch_exactable"),
    (args: Seq[Expression]) => {
      require(args.length == 3,
        "count_min_sketch_exactable(tok, depth, width) takes exactly three arguments")
      CountMinSketchAgg(args.head,
        intLit(args(1), "depth"), intLit(args(2), "width")).toAggregateExpression()
    })

  /** (name, info, builder) for the aggregate
    * `qdigest_quantiles(v, bits, k, q1[, q2, ...])` — bits/k and the
    * permille targets must be integer literals (they size the buffer
    * and the output array). Returns array<bigint> of rank estimates;
    * see [[graft.functions.QDigestAgg]] for the worst-case bound.
    */
  val qdigestQuantiles: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    new FunctionIdentifier("qdigest_quantiles"),
    new ExpressionInfo(classOf[QDigestAgg].getName, "qdigest_quantiles"),
    (args: Seq[Expression]) => {
      require(args.length >= 4,
        "qdigest_quantiles(v, bits, k, q1[, q2, ...]) takes at least four arguments")
      QDigestAgg(args.head, intLit(args(1), "bits"), intLit(args(2), "k"),
        args.drop(3).zipWithIndex.map { case (e, i) => intLit(e, s"q${i + 1}") })
        .toAggregateExpression()
    })

  /** (name, info, builder) for
    * `qdigest_quantiles_weighted(v, w, bits, k, q1[, q2, ...])` — the
    * weighted-ingest form (value v carries multiplicity w; identical
    * to ingesting v repeated w times, QDigestAggSpec's multiset
    * contract). Same literal rules as the unweighted spelling.
    */
  val qdigestQuantilesWeighted: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    new FunctionIdentifier("qdigest_quantiles_weighted"),
    new ExpressionInfo(classOf[QDigestAgg].getName, "qdigest_quantiles_weighted"),
    (args: Seq[Expression]) => {
      require(args.length >= 5,
        "qdigest_quantiles_weighted(v, w, bits, k, q1[, q2, ...]) takes at least five arguments")
      QDigestAgg(args.head, intLit(args(2), "bits"), intLit(args(3), "k"),
        args.drop(4).zipWithIndex.map { case (e, i) => intLit(e, s"q${i + 1}") },
        args(1))
        .toAggregateExpression()
    })

  /** (name, info, builder) for `token_ngrams(text, n[, max_starts[, skip_empty]])`
    * — n / max_starts / skip_empty must be literals (they parameterize
    * the generated kernel). Defaults: unbounded starts, skip-empty
    * tokenization.
    */
  val tokenNgrams: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    new FunctionIdentifier("token_ngrams"),
    new ExpressionInfo(classOf[TokenNgrams].getName, "token_ngrams"),
    (args: Seq[Expression]) => {
      require(args.length >= 2 && args.length <= 4,
        "token_ngrams(text, n[, max_starts[, skip_empty]])")
      val maxStarts =
        if (args.length >= 3) intLit(args(2), "max_starts") else Int.MaxValue
      val skipEmpty = if (args.length == 4) args(3) match {
        case Literal(b: Boolean, _) => b
        case _ => throw new IllegalArgumentException("skip_empty must be a boolean literal")
      } else true
      TokenNgrams(args.head, intLit(args(1), "n"), maxStarts, skipEmpty)
    })
}
