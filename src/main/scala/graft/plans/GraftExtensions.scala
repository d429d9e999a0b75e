package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.expressions.{ChunkMd5, DotProduct, MultiMinHash, ShingleMd5, SortedIntersectAtLeastFracLeftLong, SortedIntersectAtLeastLong, SortedIntersectCount, SortedIntersectCountLong, TokenFingerprint, TokenPairs}

/** SQL-surface registration of the engine's custom expressions, so
  * `spark.sql("SELECT token_fingerprint(lower(text)) …")` works.
  *
  * Two entry points:
  *  - `GraftExtensions` for session construction:
  *    `SparkSession.builder().withExtensions(new GraftExtensions)` or
  *    `spark.sql.extensions=graft.plans.GraftExtensions`;
  *  - `GraftExtensions.register(spark)` to add the functions to an
  *    already-running session (temp-function registry).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import GraftExtensions._

  override def apply(ext: SparkSessionExtensions): Unit =
    functions.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {
  import org.apache.spark.sql.graftbridge
  import org.apache.spark.sql.types.IntegerType

  /** Resolve argument `idx` of `fn` as a literal Int, failing analysis
    * (with the function's name, via Spark's own error classes) on a
    * non-foldable / non-integral / null argument instead of leaking a
    * raw NPE or ClassCastException from `eval(null)`.
    */
  private def intLit(fn: String, param: String,
                     es: Seq[Expression], idx: Int): Int = {
    val e = es(idx)
    if (!e.foldable)
      throw graftbridge.nonFoldableArgumentError(fn, param, IntegerType)
    e.eval(null) match {
      case n: Number => n.intValue()
      case _ =>
        throw graftbridge.nonFoldableArgumentError(fn, param, IntegerType)
    }
  }

  /** Like [[intLit]] for a literal Double threshold argument. */
  private def doubleLit(fn: String, param: String,
                        es: Seq[Expression], idx: Int): Double = {
    val e = es(idx)
    if (!e.foldable)
      throw graftbridge.nonFoldableArgumentError(fn, param,
        org.apache.spark.sql.types.DoubleType)
    e.eval(null) match {
      case n: Number => n.doubleValue()
      // a bare SQL decimal literal (0.9 without the D suffix) folds to
      // Spark's Decimal, which is NOT a java.lang.Number — without this
      // arm a perfectly foldable literal would fail analysis with the
      // misleading non-foldable error
      case d: org.apache.spark.sql.types.Decimal => d.toDouble
      case _ =>
        throw graftbridge.nonFoldableArgumentError(fn, param,
          org.apache.spark.sql.types.DoubleType)
    }
  }

  /** Wrap a builder with an exact-arity gate so `fn(wrong, number,
    * of, args)` fails analysis naming `fn`, not with an
    * IndexOutOfBounds from `es(i)`.
    */
  private def arity(fn: String, n: Int)(
      build: Seq[Expression] => Expression): Seq[Expression] => Expression =
    es => {
      if (es.length != n)
        throw graftbridge.wrongNumArgsError(fn, n, es.length)
      build(es)
    }

  /** (name, info, builder) for each custom expression. */
  val functions: Seq[(String, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    ("multi_min_hash",
      new ExpressionInfo(classOf[MultiMinHash].getName, "multi_min_hash"),
      arity("multi_min_hash", 3)(es => MultiMinHash(es.head,
        intLit("multi_min_hash", "numHashes", es, 1),
        intLit("multi_min_hash", "seed", es, 2)))),
    ("sorted_intersect_count",
      new ExpressionInfo(classOf[SortedIntersectCount].getName,
        "sorted_intersect_count"),
      arity("sorted_intersect_count", 2)(es =>
        SortedIntersectCount(es.head, es(1)))),
    ("sorted_intersect_count_long",
      new ExpressionInfo(classOf[SortedIntersectCountLong].getName,
        "sorted_intersect_count_long"),
      arity("sorted_intersect_count_long", 2)(es =>
        SortedIntersectCountLong(es.head, es(1)))),
    ("token_fingerprint",
      new ExpressionInfo(classOf[TokenFingerprint].getName,
        "token_fingerprint"),
      arity("token_fingerprint", 1)(es => TokenFingerprint(es.head))),
    ("dot_product",
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      arity("dot_product", 2)(es => DotProduct(es.head, es(1)))),
    ("shingle_md5",
      new ExpressionInfo(classOf[ShingleMd5].getName, "shingle_md5"),
      arity("shingle_md5", 2)(es => ShingleMd5(es.head,
        intLit("shingle_md5", "shingleLen", es, 1)))),
    ("chunk_md5",
      new ExpressionInfo(classOf[ChunkMd5].getName, "chunk_md5"),
      arity("chunk_md5", 2)(es => ChunkMd5(es.head,
        intLit("chunk_md5", "chunkLen", es, 1)))),
    ("token_pairs",
      new ExpressionInfo(classOf[TokenPairs].getName, "token_pairs"),
      arity("token_pairs", 1)(es => TokenPairs(es.head))),
    ("sorted_intersect_at_least_long",
      new ExpressionInfo(classOf[SortedIntersectAtLeastLong].getName,
        "sorted_intersect_at_least_long"),
      arity("sorted_intersect_at_least_long", 3)(es =>
        SortedIntersectAtLeastLong(es.head, es(1),
          doubleLit("sorted_intersect_at_least_long", "threshold", es, 2)))),
    ("sorted_intersect_at_least_frac_left_long",
      new ExpressionInfo(
        classOf[SortedIntersectAtLeastFracLeftLong].getName,
        "sorted_intersect_at_least_frac_left_long"),
      arity("sorted_intersect_at_least_frac_left_long", 3)(es =>
        SortedIntersectAtLeastFracLeftLong(es.head, es(1),
          doubleLit("sorted_intersect_at_least_frac_left_long",
            "threshold", es, 2)))))

  /** Register into an existing session's temp-function registry. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
}
