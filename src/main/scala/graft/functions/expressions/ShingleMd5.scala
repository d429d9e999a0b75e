package graft.functions.expressions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** md5 hex digests of the DISTINCT word `shingleLen`-gram shingles of
  * a token array, one pass, first-occurrence order.
  *
  * Semantically identical to composing
  * `md5 ∘ explode ∘ array_distinct ∘ shinglesOf(toks, n)` — distinct
  * is applied to the gram STRINGS before hashing, exactly like the
  * composed form and the DuckDB oracle mirror — but ~13× faster on
  * the explode path: the higher-order `transform` inside shinglesOf
  * evaluates its lambda interpreted per element (measured 3.5 s vs
  * 0.27 s for a plain-array explode over sf0.1 documents), while this
  * builds each shingle's bytes once in a reused buffer and hands the
  * generator a plain materialized array.
  *
  * Null token array → null; fewer than `shingleLen` tokens → empty
  * array (matching shinglesOf's `otherwise(array())` branch). Null
  * ELEMENTS are skipped without a separator — exactly concat_ws's
  * null rule — so `["a", null, "b"]` grams to `"a b"`, not `"a  b"`
  * (tokens() never emits nulls, but the SQL-registered shingle_md5
  * accepts arbitrary arrays).
  */
case class ShingleMd5(child: Expression, shingleLen: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)

  override def prettyName: String = "shingle_md5"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n < shingleLen) return new GenericArrayData(Array.empty[Any])
    val toks = new Array[Array[Byte]](n) // null slot = null element
    var i = 0
    while (i < n) {
      toks(i) = if (arr.isNullAt(i)) null
                else arr.getUTF8String(i).getBytes
      i += 1
    }
    val grams = new java.util.LinkedHashSet[UTF8String]()
    val buf = new java.io.ByteArrayOutputStream(256)
    i = 0
    while (i <= n - shingleLen) {
      buf.reset()
      var w = 0
      var wrote = false // concat_ws: null elements skipped, no separator
      while (w < shingleLen) {
        val t = toks(i + w)
        if (t != null) {
          if (wrote) buf.write(' ')
          buf.write(t, 0, t.length)
          wrote = true
        }
        w += 1
      }
      grams.add(UTF8String.fromBytes(buf.toByteArray))
      i += 1
    }
    val md = MessageDigest.getInstance("MD5")
    val out = new Array[Any](grams.size)
    val it = grams.iterator()
    i = 0
    while (it.hasNext) {
      md.reset()
      out(i) =
        UTF8String.fromString(Hex.hex(md.digest(it.next().getBytes)))
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleMd5 =
    copy(child = newChild)
}

object ShingleMd5 {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graftbridge.{toColumn, toExpression}

  def shingleMd5(tokens: Column, n: Int): Column =
    toColumn(ShingleMd5(toExpression(tokens), n))
}

/** md5 hex digests of fixed-width non-overlapping token chunks
  * (stride = chunkLen, the tail partial chunk included, duplicates
  * KEPT — chunk multiplicity is the boilerplate signal), one pass.
  *
  * Semantically identical to q78's composed
  * `md5 ∘ explode ∘ transform(sequence(0, floor((n-1)/W)), i =>
  * concat_ws(" ", slice(toks, i*W+1, W)))` form, minus the
  * interpreted higher-order lambda on the explode path (same
  * pathology ShingleMd5 documents). Null elements are skipped without
  * a separator, matching concat_ws (see ShingleMd5).
  */
case class ChunkMd5(child: Expression, chunkLen: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)

  override def prettyName: String = "chunk_md5"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val md = MessageDigest.getInstance("MD5")
    val buf = new java.io.ByteArrayOutputStream(256)
    val out = new Array[Any]((n + chunkLen - 1) / chunkLen)
    var c = 0
    var i = 0
    while (i < n) {
      buf.reset()
      val end = math.min(i + chunkLen, n)
      var w = i
      var wrote = false // concat_ws: null elements skipped, no separator
      while (w < end) {
        if (!arr.isNullAt(w)) {
          val t = arr.getUTF8String(w).getBytes
          if (wrote) buf.write(' ')
          buf.write(t, 0, t.length)
          wrote = true
        }
        w += 1
      }
      md.reset()
      out(c) = UTF8String.fromString(Hex.hex(md.digest(buf.toByteArray)))
      c += 1
      i += chunkLen
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): ChunkMd5 =
    copy(child = newChild)
}

object ChunkMd5 {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graftbridge.{toColumn, toExpression}

  def chunkMd5(tokens: Column, w: Int): Column =
    toColumn(ChunkMd5(toExpression(tokens), w))
}

private[expressions] object Hex {
  def hex(bytes: Array[Byte]): String = {
    val sb = new java.lang.StringBuilder(32)
    var i = 0
    while (i < bytes.length) {
      sb.append(Character.forDigit((bytes(i) >> 4) & 0xf, 16))
      sb.append(Character.forDigit(bytes(i) & 0xf, 16))
      i += 1
    }
    sb.toString
  }
}
