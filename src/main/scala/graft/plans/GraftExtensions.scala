package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.expressions.{ChunkMd5, DotProduct, MultiMinHash, ShingleMd5, SortedIntersectCount, SortedIntersectCountLong, TokenFingerprint}

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

  private def intLit(e: Expression): Int =
    e.eval(null).asInstanceOf[Number].intValue()

  /** (name, info, builder) for each custom expression. */
  val functions: Seq[(String, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    ("multi_min_hash",
      new ExpressionInfo(classOf[MultiMinHash].getName, "multi_min_hash"),
      (es: Seq[Expression]) =>
        MultiMinHash(es.head, intLit(es(1)), intLit(es(2)))),
    ("sorted_intersect_count",
      new ExpressionInfo(classOf[SortedIntersectCount].getName,
        "sorted_intersect_count"),
      (es: Seq[Expression]) => SortedIntersectCount(es.head, es(1))),
    ("sorted_intersect_count_long",
      new ExpressionInfo(classOf[SortedIntersectCountLong].getName,
        "sorted_intersect_count_long"),
      (es: Seq[Expression]) => SortedIntersectCountLong(es.head, es(1))),
    ("token_fingerprint",
      new ExpressionInfo(classOf[TokenFingerprint].getName,
        "token_fingerprint"),
      (es: Seq[Expression]) => TokenFingerprint(es.head)),
    ("dot_product",
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (es: Seq[Expression]) => DotProduct(es.head, es(1))),
    ("shingle_md5",
      new ExpressionInfo(classOf[ShingleMd5].getName, "shingle_md5"),
      (es: Seq[Expression]) => ShingleMd5(es.head, intLit(es(1)))),
    ("chunk_md5",
      new ExpressionInfo(classOf[ChunkMd5].getName, "chunk_md5"),
      (es: Seq[Expression]) => ChunkMd5(es.head, intLit(es(1)))))

  /** Register into an existing session's temp-function registry. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
}
