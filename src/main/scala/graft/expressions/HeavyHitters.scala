package graft.expressions

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer
import scala.collection.mutable
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy hitters as a native Catalyst aggregate
  * (`TypedImperativeAggregate`): one pass, fixed memory (≤ k counters per
  * partial), partial/merge combine — the shape that finds frequent terms
  * over 100 TB where an exact `groupBy(term)` would shuffle the full token
  * stream. Guarantees (Misra-Gries 1982; merge per Agarwal et al.,
  * "Mergeable Summaries", PODS 2012):
  *
  *  - every term with true frequency > n/(k+1) is present in the output;
  *  - each reported count c satisfies true - n/(k+1) <= c <= true.
  *
  * When k >= |distinct terms| no counter is ever evicted and the sketch
  * DEGENERATES TO EXACT counts under any update/merge order — the declared
  * query q71 runs in that regime, so its DuckDB oracle (an exact
  * groupBy) is a true hash gate; the under-capacity approximate regime is
  * property-tested in HeavyHittersSpec instead (its counters are
  * merge-order-dependent by construction, so no cross-engine oracle can
  * exist).
  *
  * The update path is the classic unit-increment step (hit +1; room →
  * insert; else decrement all, drop zeros — amortized O(1) per token);
  * the merge path sums counters then subtracts the (k+1)-th largest
  * value, keeping positives (the PODS-12 mergeable reduction).
  */
case class HeavyHittersAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]]
  with UnaryLike[Expression] {

  require(k > 0, s"heavy-hitters capacity must be positive, got $k")

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[String, Long], input: InternalRow)
      : mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val term = v.asInstanceOf[UTF8String].toString
      buf.get(term) match {
        case Some(c) => buf.update(term, c + 1)
        case None if buf.size < k => buf.update(term, 1L)
        case None => // full: decrement-all, evict zeros (MG step)
          val dead = mutable.ArrayBuffer.empty[String]
          buf.mapValuesInPlace { (_, c) => c - 1 }
          buf.foreach { case (t, c) => if (c <= 0) dead += t }
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(buf: mutable.HashMap[String, Long],
                     other: mutable.HashMap[String, Long])
      : mutable.HashMap[String, Long] = {
    other.foreach { case (t, c) => buf.update(t, buf.getOrElse(t, 0L) + c) }
    if (buf.size > k) {
      // subtract the (k+1)-th largest count from everything, keep positives
      val counts = buf.values.toArray.sorted(Ordering.Long.reverse)
      val cut = counts(k)
      val dead = mutable.ArrayBuffer.empty[String]
      buf.mapValuesInPlace { (_, c) => c - cut }
      buf.foreach { case (t, c) => if (c <= 0) dead += t }
      dead.foreach(buf.remove)
    }
    buf
  }

  /** array<struct<term,count>> ordered by (count desc, term) — a total
    * deterministic order so downstream explodes stay hash-gateable. */
  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val rows = buf.toArray.sortBy { case (t, c) => (-c, t) }.map { case (t, c) =>
      InternalRow(UTF8String.fromString(t), c)
    }
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (t, c) =>
      val b = t.getBytes("UTF-8")
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = ByteBuffer.wrap(bytes)
    val n = in.getInt
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val len = in.getInt
      val b = new Array[Byte](len); in.get(b)
      buf.update(new String(b, "UTF-8"), in.getLong)
      i += 1
    }
    buf
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("term", StringType), StructField("count", LongType))),
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_heavy_hitters"

  override def withNewMutableAggBufferOffset(newOffset: Int): HeavyHittersAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HeavyHittersAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HeavyHittersAgg =
    copy(child = newChild)
}

object HeavyHitters {
  /** Column builder: MG summary of a string column with capacity k. */
  def heavyHitters(c: Column, k: Int): Column =
    GraftBridge.column(HeavyHittersAgg(GraftBridge.expression(c), k)
      .toAggregateExpression())
}
