package graft.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k state: a size-k min-heap of (key, payload) pairs where the
  * ROOT is the weakest element kept so far. Ordering: higher key wins; on a
  * key tie the SMALLER payload wins (so results are total-ordered and
  * deterministic). Insertion is O(log k) and the heap never exceeds k
  * entries, which is the entire point: a partial aggregate ships at most k
  * pairs per group per partition instead of every row.
  */
final class TopKBuffer(val k: Int) {
  var size = 0
  val keys = new Array[Long](k)
  val payloads = new Array[Long](k)

  // a weaker than b: a loses first
  private def weaker(ka: Long, pa: Long, kb: Long, pb: Long): Boolean =
    ka < kb || (ka == kb && pa > pb)

  def insert(key: Long, payload: Long): Unit = {
    if (size < k) {
      var i = size
      keys(i) = key; payloads(i) = payload; size += 1
      // sift up
      while (i > 0 && weaker(keys(i), payloads(i), keys((i - 1) / 2), payloads((i - 1) / 2))) {
        swap(i, (i - 1) / 2); i = (i - 1) / 2
      }
    } else if (weaker(keys(0), payloads(0), key, payload)) {
      keys(0) = key; payloads(0) = payload
      siftDown(0)
    }
  }

  private def swap(i: Int, j: Int): Unit = {
    val tk = keys(i); keys(i) = keys(j); keys(j) = tk
    val tp = payloads(i); payloads(i) = payloads(j); payloads(j) = tp
  }

  private def siftDown(start: Int): Unit = {
    var i = start
    var done = false
    while (!done) {
      val l = 2 * i + 1; val r = 2 * i + 2
      var m = i
      if (l < size && weaker(keys(l), payloads(l), keys(m), payloads(m))) m = l
      if (r < size && weaker(keys(r), payloads(r), keys(m), payloads(m))) m = r
      if (m == i) done = true else { swap(i, m); i = m }
    }
  }

  /** Strongest-first (key desc, payload asc) snapshot. Explicit
    * comparator, not `sortBy(-key)`: negating Long.MinValue overflows to
    * itself and would sort that key strongest instead of weakest — and
    * graft_top_k is a session-registered SQL function, so arbitrary user
    * data can carry it. */
  def sortedPairs: Array[(Long, Long)] = {
    val out = Array.tabulate(size)(i => (keys(i), payloads(i)))
    out.sortWith((a, b) => a._1 > b._1 || (a._1 == b._1 && a._2 < b._2))
  }
}

/** Native grouped top-k aggregate (`graft_top_k(key, payload, k)`): returns
  * `array<struct<key bigint, payload bigint>>` with the k largest keys,
  * sorted key-descending (payload ascending breaks ties). Null keys or
  * payloads are skipped.
  *
  * Why an aggregate and not a window: `row_number() OVER (PARTITION BY g
  * ORDER BY key DESC) <= k` shuffles and SORTS every row of every group.
  * This aggregate is planned as ObjectHashAggregate with a map-side
  * partial: each partition reduces each group to at most k pairs BEFORE
  * the exchange, so the shuffle carries O(groups × k) instead of O(rows),
  * and nothing is ever globally sorted. At 100 TB that is the difference
  * between a top-3-per-nation that ships 25×3 pairs per partition and one
  * that ships the whole fact table into 25 sort buckets.
  *
  * Registered via [[graft.GraftExtensions]]; call with
  * `call_function("graft_top_k", keyCol, payloadCol, lit(k))`.
  */
case class TopK(keyExpr: Expression, payloadExpr: Expression, kExpr: Expression,
                mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(LongType, LongType, IntegerType)
  override def children: Seq[Expression] = Seq(keyExpr, payloadExpr, kExpr)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_top_k"
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("key", LongType, nullable = false),
      StructField("payload", LongType, nullable = false))),
    containsNull = false)

  private lazy val k: Int = {
    require(kExpr.foldable, "graft_top_k: k must be a literal")
    val v = kExpr.eval().asInstanceOf[Int]
    require(v >= 1 && v <= (1 << 20), s"graft_top_k: bad k=$v")
    v
  }

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buffer: TopKBuffer, input: InternalRow): TopKBuffer = {
    val key = keyExpr.eval(input)
    val payload = payloadExpr.eval(input)
    if (key != null && payload != null)
      buffer.insert(key.asInstanceOf[Long], payload.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    var i = 0
    while (i < other.size) { buffer.insert(other.keys(i), other.payloads(i)); i += 1 }
    buffer
  }

  override def eval(buffer: TopKBuffer): Any =
    new GenericArrayData(buffer.sortedPairs.map { case (key, p) =>
      InternalRow(key, p)
    }.toArray[Any])

  override def serialize(buffer: TopKBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + 16 * buffer.size)
    bb.putInt(buffer.k).putInt(buffer.size)
    var i = 0
    while (i < buffer.size) { bb.putLong(buffer.keys(i)).putLong(buffer.payloads(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new TopKBuffer(bb.getInt())
    val n = bb.getInt()
    var i = 0
    // replay through insert: order within the heap array is not canonical
    while (i < n) { val key = bb.getLong(); val p = bb.getLong(); buf.insert(key, p); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopK =
    copy(keyExpr = newChildren(0), payloadExpr = newChildren(1), kExpr = newChildren(2))
}
