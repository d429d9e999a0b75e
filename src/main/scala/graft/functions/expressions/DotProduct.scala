package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

import org.apache.spark.sql.graftbridge.{toColumn, toExpression}

/** Dot product of two float/double array columns in one pass:
  * exactly `aggregate(zip_with(toDoubles(a), toDoubles(b), _ * _),
  * 0.0, _ + _)` — the identical sequential left fold (element i is
  * cast to double, multiplied, and added in index order, so the
  * result is bit-for-bit the composed built-in form and the DuckDB
  * `list_dot_product` oracle) — without three interpreted
  * higher-order passes materializing intermediate arrays per row.
  * Spark's HOFs never reach codegen, and on the pair-scoring paths
  * (q50/q57/q68: millions of in-bucket cosines) the HOF dispatch was
  * the dominant cost — q57 measured ~25x DuckDB before this.
  *
  * Null semantics mirror the composed form: null array -> null;
  * different lengths (zip_with pads with null) -> null; any null
  * element -> null.
  *
  * REAL codegen (`doGenCode`), not `CodegenFallback`: a fallback
  * expression in the pair-scoring join would both eval interpreted
  * (boxed, virtual-dispatch) AND sever the surrounding stage's
  * whole-stage codegen — at sf3 q57 scores 2.5×10^8 in-bucket pairs,
  * where the interpreted constant dominated (15.1 s → 9.5 s).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true // length mismatch yields null
  override def prettyName: String = "dot_product"

  @transient private lazy val leftFloat =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType
  @transient private lazy val rightFloat =
    right.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs array<float|double> inputs, got " +
          s"${left.dataType.sql} and ${right.dataType.sql}")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) null
    else {
      var acc = 0.0
      var i = 0
      var anyNull = false
      while (i < n && !anyNull) {
        if (x.isNullAt(i) || y.isNullAt(i)) anyNull = true
        else {
          val xv = if (leftFloat) x.getFloat(i).toDouble else x.getDouble(i)
          val yv = if (rightFloat) y.getFloat(i).toDouble else y.getDouble(i)
          // same fold order as aggregate(): ((0 + x0*y0) + x1*y1) + ...
          acc = acc + xv * yv
        }
        i += 1
      }
      if (anyNull) null else acc
    }
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      // element getters are plan-time constants (input array types)
      val getA = if (leftFloat) s"(double) $a.getFloat($i)"
                 else s"$a.getDouble($i)"
      val getB = if (rightFloat) s"(double) $b.getFloat($i)"
                 else s"$b.getDouble($i)"
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) {
         |      ${ev.isNull} = true; break;
         |    }
         |    // same fold order as aggregate(): ((0 + x0*y0) + x1*y1) + …
         |    $acc = $acc + $getA * $getB;
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  def dotProduct(a: Column, b: Column): Column =
    toColumn(DotProduct(toExpression(a), toExpression(b)))
}
