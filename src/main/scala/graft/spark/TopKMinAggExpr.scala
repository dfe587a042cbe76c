package graft.spark

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native bounded top-k aggregate: keep the `k` smallest (key, payload)
  * pairs per group, `ORDER BY key, payload`, returning them ascending as
  * `array<struct<key bigint, payload string>>`.
  *
  * Why a native aggregate: the window form of "k rows per group"
  * (`row_number() OVER (PARTITION BY g ORDER BY ...) <= k`) SORTS every
  * group in full — a hot stratum with 10⁹ rows sorts 10⁹ rows to keep 7.
  * This aggregate holds a k-element bounded heap per group, does
  * map-side PARTIAL aggregation (each input partition reduces to ≤ k
  * elements before the shuffle), and merges heaps on the reduce side —
  * per-group state is O(k) everywhere, the shuffle carries at most
  * k·partitions rows per group, and nothing ever sorts the full group.
  * This is the documented scale path for
  * [[graft.ops.CorpusOps.stratifiedSample]]'s hot-strata caveat.
  *
  * Determinism: the order is total (key, then payload bytes), so ties on
  * the hash key resolve identically on any layout — callers who need
  * numeric tiebreak order must zero-pad the payload (see
  * `CorpusOps.stratifiedSampleAgg`). Null keys/payloads are ignored,
  * like the built-in aggregates.
  *
  * Registered as SQL function `graft_topk_min(key, payload, k)` via
  * [[GraftExtensions]].
  */
case class TopKMinAgg(
    key: Expression, payload: Expression, kExpr: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKMinAgg.Buffer] {

  import TopKMinAgg.{Buffer, Item}

  private lazy val k: Int = kExpr.eval().asInstanceOf[Number].intValue()

  override def children: Seq[Expression] = Seq(key, payload, kExpr)

  override def checkInputDataTypes(): TypeCheckResult = {
    if (key.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_topk_min key must be bigint, got ${key.dataType.catalogString}")
    else if (payload.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_topk_min payload must be string, got ${payload.dataType.catalogString}")
    else if (kExpr.dataType != IntegerType || !kExpr.foldable)
      TypeCheckResult.TypeCheckFailure("graft_topk_min k must be a literal int")
    else if (kExpr.eval() == null || kExpr.eval().asInstanceOf[Number].intValue() <= 0)
      TypeCheckResult.TypeCheckFailure("graft_topk_min k must be > 0")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("key", LongType, nullable = false),
      StructField("payload", StringType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = false
  override def prettyName: String = "graft_topk_min"

  override def createAggregationBuffer(): Buffer = new Buffer(k)

  override def update(buf: Buffer, input: InternalRow): Buffer = {
    val kv = key.eval(input)
    val pv = payload.eval(input)
    if (kv != null && pv != null)
      // clone: the UTF8String may point into a reused row buffer
      buf.offer(Item(kv.asInstanceOf[Long], pv.asInstanceOf[UTF8String].clone()))
    buf
  }

  override def merge(buf: Buffer, other: Buffer): Buffer = {
    other.foreach(buf.offer)
    buf
  }

  override def eval(buf: Buffer): Any = {
    val items = buf.sortedAscending
    new GenericArrayData(items.map(it =>
      new GenericInternalRow(Array[Any](it.key, it.payload))))
  }

  override def serialize(buf: Buffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    val items = buf.sortedAscending
    out.writeInt(items.length)
    items.foreach { it =>
      out.writeLong(it.key)
      val b = it.payload.getBytes
      out.writeInt(b.length)
      out.write(b)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Buffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new Buffer(k)
    var i = 0
    while (i < n) {
      val kv = in.readLong()
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.offer(Item(kv, UTF8String.fromBytes(b)))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKMinAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKMinAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKMinAgg =
    copy(key = newChildren(0), payload = newChildren(1), kExpr = newChildren(2))
}

object TopKMinAgg {

  final case class Item(key: Long, payload: UTF8String)

  private val itemOrd: Ordering[Item] = new Ordering[Item] {
    override def compare(a: Item, b: Item): Int = {
      val c = java.lang.Long.compare(a.key, b.key)
      if (c != 0) c else a.payload.compareTo(b.payload)
    }
  }

  /** Bounded max-heap of the k smallest items seen: head = current
    * worst; a new item beats it → evict, insert. O(log k) per offer,
    * O(k) memory regardless of group size. */
  final class Buffer(k: Int) {
    private val heap =
      new java.util.PriorityQueue[Item](math.max(k, 1), itemOrd.reverse)

    def offer(it: Item): Unit = {
      if (heap.size < k) heap.offer(it)
      else if (itemOrd.lt(it, heap.peek())) { heap.poll(); heap.offer(it) }
    }

    def foreach(f: Item => Unit): Unit = heap.iterator().forEachRemaining(i => f(i))

    def sortedAscending: Array[Item] = {
      val arr = heap.toArray(new Array[Item](heap.size))
      java.util.Arrays.sort(arr, itemOrd)
      arr
    }
  }
}
