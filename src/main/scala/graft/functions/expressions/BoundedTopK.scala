package graft.functions.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StructField, StructType}

/** Bounded top-k aggregate: keeps the k best (score, id) entries under
  * the total order (score DESC, id ASC) in a k-bounded min-heap, and
  * evaluates to `array<struct<score, id>>` sorted best-first.
  *
  * This is the aggregate that makes per-group top-k SCALE: a window
  * `row_number() <= k` must shuffle EVERY candidate row to its group's
  * partition before ranking, so the shuffle carries Θ(candidates) rows
  * — for blocked pair mining that is the full qualifying-pair volume
  * (~10^9 directed rows at sf10). As a TypedImperativeAggregate this
  * runs inside ObjectHashAggregate with map-side PARTIAL aggregation:
  * each map partition ships at most one k-entry buffer per group, so
  * the shuffle is Θ(groups × k × partitions) regardless of candidate
  * volume. Same result, pinned in `CustomExpressionsSpec` against the
  * window form.
  *
  * Determinism: bounded top-k under a TOTAL order is merge-order
  * independent — every (partial ∪ partial) merge keeps exactly the
  * global k best, and ties cannot exist (the id breaks them), so the
  * result is identical however Spark partitions or reorders the input.
  *
  * Null handling mirrors built-in aggregates: rows with a null score
  * or id are ignored; a group with no valid rows evaluates to an empty
  * array (never null), so downstream `posexplode` simply emits nothing.
  */
case class BoundedTopK(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BoundedTopK.TopKBuffer] {

  require(k >= 1, s"k must be >= 1, got $k")

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def prettyName: String = "bounded_top_k"

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (score.dataType == DoubleType && id.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs (double, bigint) inputs, got " +
          s"${score.dataType.sql} and ${id.dataType.sql}")

  override def createAggregationBuffer(): BoundedTopK.TopKBuffer =
    new BoundedTopK.TopKBuffer(k)

  override def update(buf: BoundedTopK.TopKBuffer,
                      input: InternalRow): BoundedTopK.TopKBuffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      buf.offer(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(buf: BoundedTopK.TopKBuffer,
                     other: BoundedTopK.TopKBuffer): BoundedTopK.TopKBuffer = {
    other.foreach((s, i) => buf.offer(s, i))
    buf
  }

  override def eval(buf: BoundedTopK.TopKBuffer): Any = {
    val arr = buf.sortedBestFirst()
    new GenericArrayData(arr.map { case (s, i) =>
      InternalRow(s, i): Any
    })
  }

  override def serialize(buf: BoundedTopK.TopKBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    buf.foreach { (s, i) => bb.putDouble(s); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): BoundedTopK.TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new BoundedTopK.TopKBuffer(k)
    var j = 0
    while (j < n) { buf.offer(bb.getDouble, bb.getLong); j += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): BoundedTopK =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BoundedTopK =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BoundedTopK =
    copy(score = newChildren(0), id = newChildren(1))
}

object BoundedTopK {

  /** k-bounded min-heap over (score, id), worst entry at the head.
    * "Worse" = smaller score, ties by LARGER id (so the kept set is
    * the k best under (score DESC, id ASC)). Flat primitive arrays,
    * no boxing: `offer` is O(log k), memory is exactly 16·k bytes.
    */
  final class TopKBuffer(k: Int) {
    private val scores = new Array[Double](k)
    private val ids = new Array[Long](k)
    private var n = 0

    def size: Int = n

    /** a-entry strictly worse than b-entry? */
    private def worse(sa: Double, ia: Long, sb: Double, ib: Long): Boolean =
      sa < sb || (sa == sb && ia > ib)

    private def siftUp(pos0: Int): Unit = {
      var pos = pos0
      while (pos > 0) {
        val parent = (pos - 1) / 2
        if (worse(scores(pos), ids(pos), scores(parent), ids(parent))) {
          swap(pos, parent); pos = parent
        } else return
      }
    }

    private def siftDown(pos0: Int): Unit = {
      var pos = pos0
      var continue = true
      while (continue) {
        val l = 2 * pos + 1
        val r = l + 1
        var m = pos
        if (l < n && worse(scores(l), ids(l), scores(m), ids(m))) m = l
        if (r < n && worse(scores(r), ids(r), scores(m), ids(m))) m = r
        if (m == pos) continue = false
        else { swap(pos, m); pos = m }
      }
    }

    private def swap(i: Int, j: Int): Unit = {
      val ts = scores(i); scores(i) = scores(j); scores(j) = ts
      val ti = ids(i); ids(i) = ids(j); ids(j) = ti
    }

    def offer(s: Double, i: Long): Unit =
      if (n < k) {
        scores(n) = s; ids(n) = i; n += 1; siftUp(n - 1)
      } else if (worse(scores(0), ids(0), s, i)) {
        scores(0) = s; ids(0) = i; siftDown(0)
      }

    def foreach(f: (Double, Long) => Unit): Unit = {
      var j = 0
      while (j < n) { f(scores(j), ids(j)); j += 1 }
    }

    /** Entries best-first: (score DESC, id ASC). */
    def sortedBestFirst(): Array[(Double, Long)] = {
      val out = new Array[(Double, Long)](n)
      var j = 0
      while (j < n) { out(j) = (scores(j), ids(j)); j += 1 }
      scala.util.Sorting.stableSort(out,
        (a: (Double, Long), b: (Double, Long)) =>
          a._1 > b._1 || (a._1 == b._1 && a._2 < b._2))
      out
    }
  }
}
