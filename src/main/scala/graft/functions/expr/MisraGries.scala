package graft.functions.expr

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitters summary: at most `capacity` counters per
  * group, mergeable, with the classic deterministic guarantee
  *
  *   true_count − N/(capacity+1)  ≤  reported  ≤  true_count
  *
  * (N = group size), so every item with frequency above N/(capacity+1)
  * is guaranteed present. This is the fixed-size scale path for
  * "top-k most frequent" — the sketch analog of the exact per-key
  * `count`/`threshold` ops (reference coll.rs semantics): at 100 TB an
  * exact count of a high-cardinality column shuffles the full key set,
  * while this summary is O(capacity) per group and combines map-side.
  *
  * Implemented as a native [[TypedImperativeAggregate]] (the same
  * machinery as Spark's own `approx_percentile`/`hll_sketch_agg`;
  * Spark 4.1 ships a DataSketches-based `approx_top_k` — this variant
  * exists because its summary is DETERMINISTIC, so results reproduce
  * run-to-run and, in the exact regime below, oracle-check to SQL):
  * partial aggregation runs in the scan stage (ObjectHashAggregate),
  * only the O(capacity) summaries cross the exchange.
  *
  * Update: present → +1; absent with room → insert 1; absent at
  * capacity → decrement ALL counters, drop zeros (the new item is not
  * inserted). Merge (Agarwal et al., "Mergeable Summaries", PODS'12):
  * sum counters, then subtract the (capacity+1)-th largest count from
  * all and drop non-positives.
  *
  * EXACT REGIME: while a group's distinct-item count stays ≤ capacity,
  * no decrement ever fires anywhere in the tree — every reported count
  * is the exact frequency regardless of partitioning (q_heavy_hitters
  * pins this against the DuckDB oracle). Beyond that regime counts are
  * honest lower bounds but partitioning-dependent (like every MG).
  *
  * The result array is sorted (count desc, item asc): `slice(.., 1, k)`
  * + `posexplode` yields ranked top-k with no extra window exchange.
  */
case class MisraGries(child: Expression, capacity: Int,
                      mutableAggBufferOffset: Int = 0,
                      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[UTF8String, Long]]
    with UnaryLike[Expression] {

  require(capacity >= 1, s"capacity must be >= 1, got $capacity")

  override def prettyName: String = "mg_summary"

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("cnt", LongType, nullable = false))), containsNull = false)

  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"mg_summary requires a string item column, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): mutable.HashMap[UTF8String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[UTF8String, Long],
                      row: InternalRow): mutable.HashMap[UTF8String, Long] = {
    val v = child.eval(row)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String]
      buf.get(s) match {
        case Some(c) => buf.update(s, c + 1L)
        case None if buf.size < capacity =>
          buf.update(s.clone(), 1L) // clone: row buffers are reused
        case None => // decrement-all step; the arriving item is dropped
          buf.keysIterator.toArray.foreach { key =>
            val c = buf(key) - 1L
            if (c == 0L) buf.remove(key) else buf.update(key, c)
          }
      }
    }
    buf
  }

  override def merge(a: mutable.HashMap[UTF8String, Long],
                     b: mutable.HashMap[UTF8String, Long])
      : mutable.HashMap[UTF8String, Long] = {
    b.foreach { case (k, c) =>
      a.get(k) match {
        case Some(c0) => a.update(k, c0 + c)
        case None     => a.update(k, c)
      }
    }
    if (a.size > capacity) {
      // subtract the (capacity+1)-th largest count, drop non-positives
      val cut = a.valuesIterator.toArray.sorted(Ordering[Long].reverse)(capacity)
      a.keysIterator.toArray.foreach { key =>
        val c = a(key) - cut
        if (c <= 0L) a.remove(key) else a.update(key, c)
      }
    }
    a
  }

  override def eval(buf: mutable.HashMap[UTF8String, Long]): Any = {
    val sorted = buf.toArray.sortWith { case ((i1, c1), (i2, c2)) =>
      if (c1 != c2) c1 > c2 else i1.compareTo(i2) < 0
    }
    new GenericArrayData(sorted.map { case (item, cnt) =>
      new GenericInternalRow(Array[Any](item, cnt))
    })
  }

  override def serialize(buf: mutable.HashMap[UTF8String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (k, c) =>
      val bytes = k.getBytes
      out.writeInt(bytes.length); out.write(bytes); out.writeLong(c)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[UTF8String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val m = mutable.HashMap.empty[UTF8String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      m.update(UTF8String.fromBytes(b), in.readLong())
      i += 1
    }
    m
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MisraGries =
    copy(child = newChild)
}
