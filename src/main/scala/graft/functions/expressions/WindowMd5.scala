package graft.functions.expressions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** md5 hex digests of EVERY sliding word `windowLen`-gram of a token
  * array — one digest per window POSITION, duplicates KEPT, document
  * order. The positional sibling of [[ShingleMd5]] (which dedups gram
  * strings): span-level dedup needs window multiplicity, because a
  * span repeated WITHIN one document is still a duplicated span
  * (Lee et al. 2022, "Deduplicating Training Data Makes Language
  * Models Better", arXiv:2107.06499 — their ExactSubstr dedup; this
  * is its fixed-granularity relational form).
  *
  * Semantically identical to composing
  * `transform(sequence(0, size(t)-n), i -> md5(concat_ws(' ',
  * slice(t, i+1, n))))` — pinned in CustomExpressionsSpec — minus the
  * interpreted per-element lambda on the explode path (the same 13×
  * pathology ShingleMd5 documents).
  *
  * Null token array → null; fewer than `windowLen` tokens → empty
  * array. Null ELEMENTS are skipped without a separator — exactly
  * concat_ws's null rule (see ShingleMd5).
  */
case class WindowMd5(child: Expression, windowLen: Int)
    extends UnaryExpression with CodegenFallback {

  // windowLen <= 0 would silently emit n+1 (or more) md5("") digests
  // per doc — every document would report 100% duplicated spans with
  // green gates (r20 advisor). Fail loudly, like CountMin/bloom dials.
  require(windowLen >= 1, s"windowLen must be >= 1, got $windowLen")

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)

  override def prettyName: String = "window_md5"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n < windowLen) return new GenericArrayData(Array.empty[Any])
    val toks = new Array[Array[Byte]](n) // null slot = null element
    var i = 0
    while (i < n) {
      toks(i) = if (arr.isNullAt(i)) null
                else arr.getUTF8String(i).getBytes
      i += 1
    }
    val md = MessageDigest.getInstance("MD5")
    val buf = new java.io.ByteArrayOutputStream(256)
    val out = new Array[Any](n - windowLen + 1)
    i = 0
    while (i <= n - windowLen) {
      buf.reset()
      var w = 0
      var wrote = false // concat_ws: null elements skipped, no separator
      while (w < windowLen) {
        val t = toks(i + w)
        if (t != null) {
          if (wrote) buf.write(' ')
          buf.write(t, 0, t.length)
          wrote = true
        }
        w += 1
      }
      md.reset()
      out(i) = UTF8String.fromString(Hex.hex(md.digest(buf.toByteArray)))
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): WindowMd5 =
    copy(child = newChild)
}

object WindowMd5 {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graftbridge.{toColumn, toExpression}

  def windowMd5(tokens: Column, n: Int): Column =
    toColumn(WindowMd5(toExpression(tokens), n))
}
