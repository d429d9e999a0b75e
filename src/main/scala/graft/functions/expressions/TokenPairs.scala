package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** All unordered pairs `(t1, t2)` with `t1 < t2` (binary UTF8 order —
  * the same comparison `Column.<` compiles to) of the DISTINCT
  * elements of a string array, one pass.
  *
  * Semantically identical to the per-doc self-join
  * `t a JOIN t b ON a.doc_id = b.doc_id AND a.t < b.t` over the
  * exploded distinct-token table — the co-occurrence pair generator —
  * but the pairs are produced inside the scan projection, so the
  * doc_id exchange and the join disappear from the plan:
  * `explode(token_pairs(toks))` feeds the (t1, t2) count aggregate
  * directly and the only shuffle left is the final map-side-combined
  * groupBy. Input elements are deduped and null elements skipped, so
  * the composed-form equivalence holds for arbitrary arrays, not just
  * `array_distinct` outputs.
  *
  * Unlike the engine's other custom expressions (CodegenFallback —
  * scalar outputs where the interpreted boundary is one value per
  * row), this one implements `doGenCode`: its output fans out C(n,2)
  * rows per input row through Generate into HashAggregate, and a
  * fallback here would break whole-stage fusion for the entire
  * scan→explode→partial-agg stage, putting every PAIR row through an
  * interpreted iterator (measured ~2x on the q99 co-occurrence query
  * at sf0.1). The generated code calls the same static `pairs`
  * helper eval uses — compiled Scala either way, fused stage.
  *
  * Null array → null (standard unary null propagation); fewer than 2
  * distinct non-null elements → empty array. Output length is
  * C(n, 2) in the distinct-token count n — per-ROW quadratic, which
  * is the co-occurrence semantics itself (documents are bounded; the
  * corpus never self-joins).
  */
case class TokenPairs(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("t1", StringType, nullable = false),
      StructField("t2", StringType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"token_pairs requires array<string>, got ${other.catalogString}")
    }

  override def prettyName: String = "token_pairs"

  override protected def nullSafeEval(input: Any): Any =
    TokenPairs.pairs(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.expressions.TokenPairs.pairs($c);")

  override protected def withNewChildInternal(newChild: Expression): TokenPairs =
    copy(child = newChild)
}

object TokenPairs {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graftbridge.{toColumn, toExpression}

  def tokenPairs(tokens: Column): Column =
    toColumn(TokenPairs(toExpression(tokens)))

  /** Shared by eval and generated code (must be public static for the
    * janino-compiled caller). */
  def pairs(arr: ArrayData): ArrayData = {
    val n0 = arr.numElements()
    // gather + binary sort + adjacent dedupe (cheaper than a TreeSet:
    // no per-element node); clone() because getUTF8String returns a
    // view into the scan's reused row buffer and the output rows
    // outlive this call
    val buf = new Array[UTF8String](n0)
    var m = 0
    var i = 0
    while (i < n0) {
      if (!arr.isNullAt(i)) { buf(m) = arr.getUTF8String(i).clone(); m += 1 }
      i += 1
    }
    java.util.Arrays.sort(buf.asInstanceOf[Array[Object]], 0, m,
      null) // null comparator = natural (binary UTF8) order
    var n = 0
    i = 0
    while (i < m) {
      if (n == 0 || !buf(i).equals(buf(n - 1))) { buf(n) = buf(i); n += 1 }
      i += 1
    }
    if (n < 2) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](n * (n - 1) / 2)
    var k = 0
    i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        out(k) = new GenericInternalRow(Array[Any](buf(i), buf(j)))
        k += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}
