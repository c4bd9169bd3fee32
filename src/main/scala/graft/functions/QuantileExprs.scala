package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Deterministic mergeable QUANTILE sketch — the fourth member of the
  * sketch family next to HLL distinct counts, theta set algebra and
  * Misra-Gries frequencies: persistable percentile summaries that
  * refresh by MERGE instead of re-scanning the corpus (the built-in
  * `approx_percentile`/GK path computes one-shot, its internal state
  * is not a first-class persistable column).
  *
  * The structure is the classic multi-level compactor (Munro-Paterson /
  * Manku-Rajagopalan-Lindsay lineage, the same frame KLL refines):
  * level i holds values of weight 2^i; a level reaching `k` values is
  * sorted and every other value is promoted to level i+1. Where KLL
  * flips a random coin for the keep-offset, this sketch ALTERNATES it
  * per (level, compaction count) — deterministic by construction, so
  * identical input in identical order yields identical bytes and the
  * repo's golden-digest/repartition-stability contracts hold (the
  * trade: the error guarantee is the deterministic-compactor
  * O(log²(n/k)/k) rather than KLL's randomized O(1/k); QuantileSpec
  * pins a measured envelope).
  *
  * Exactness anchor: below `k` values nothing ever compacts — every
  * value is retained at weight 1 and every quantile is the EXACT order
  * statistic. Same TypedImperativeAggregate shape as [[ThetaExprs]] /
  * [[FreqExprs]]: partials combine map-side, only ≤ k·log₂(n/k)
  * doubles shuffle per group.
  */
object QuantileExprs {

  def quantSketchAgg(value: Column, k: Int = 256): Column =
    ColumnBridge.column(
      QuantileSketchAgg(ColumnBridge.expression(value), k).toAggregateExpression())

  def quantMergeAgg(sketch: Column, k: Int = 256): Column =
    ColumnBridge.column(
      QuantileMergeAgg(ColumnBridge.expression(sketch), k).toAggregateExpression())

  /** Estimated `q`-quantile (0 ≤ q ≤ 1) of a serialized sketch —
    * percentile_disc-style: the smallest retained value whose
    * cumulative weight exceeds q·(n−1). NULL for an empty sketch.
    */
  def quantEstimate(sketch: Column, q: Column): Column =
    ColumnBridge.column(QuantileEstimate(
      ColumnBridge.expression(sketch), ColumnBridge.expression(q)))

  /** Total count folded into a serialized sketch. */
  def quantCount(sketch: Column): Column =
    ColumnBridge.column(QuantileCount(ColumnBridge.expression(sketch)))
}

/** The mutable buffer: `levels(i)` holds weight-2^i values (level 0
  * append-ordered, higher levels kept sorted), `comps(i)` counts that
  * level's compactions (drives the deterministic keep-offset).
  */
final class QuantileBuffer(val k: Int) {
  var n: Long = 0L
  val levels = scala.collection.mutable.ArrayBuffer[scala.collection.mutable.ArrayBuffer[Double]]()
  val comps = scala.collection.mutable.ArrayBuffer[Int]()

  private def ensureLevel(i: Int): Unit =
    while (levels.size <= i) { levels += scala.collection.mutable.ArrayBuffer[Double](); comps += 0 }

  def update(v: Double): Unit = {
    ensureLevel(0)
    levels(0) += v
    n += 1
    if (levels(0).size >= k) compactFrom(0)
  }

  /** Promote every overfull level upward; each compaction keeps every
    * other value of the SORTED level, starting at the deterministic
    * alternating offset.
    */
  private def compactFrom(start: Int): Unit = {
    var i = start
    while (i < levels.size) {
      if (levels(i).size >= k) {
        val sorted = levels(i).toArray
        java.util.Arrays.sort(sorted)
        val offset = comps(i) & 1
        comps(i) += 1
        levels(i).clear()
        ensureLevel(i + 1)
        var j = offset
        while (j < sorted.length) { levels(i + 1) += sorted(j); j += 2 }
      }
      i += 1
    }
  }

  def merge(other: QuantileBuffer): Unit = {
    require(other.k == k, s"quantile sketch k mismatch: $k vs ${other.k}")
    n += other.n
    var i = 0
    while (i < other.levels.size) {
      ensureLevel(i)
      levels(i) ++= other.levels(i)
      i += 1
    }
    compactFrom(0)
  }

  def estimate(q: Double): Option[Double] = {
    if (n == 0) return None
    val qq = math.min(1.0, math.max(0.0, q))
    val items = scala.collection.mutable.ArrayBuffer[(Double, Long)]()
    var i = 0
    while (i < levels.size) {
      val w = 1L << i
      levels(i).foreach(v => items += ((v, w)))
      i += 1
    }
    val sorted = items.sortBy(_._1)
    val total = sorted.iterator.map(_._2).sum
    val target = qq * (total - 1)
    var cum = 0L
    var idx = 0
    while (idx < sorted.length) {
      cum += sorted(idx)._2
      if (cum > target) return Some(sorted(idx)._1)
      idx += 1
    }
    Some(sorted.last._1)
  }

  def toBytes: Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(k); out.writeLong(n); out.writeInt(levels.size)
    levels.indices.foreach { i =>
      out.writeInt(comps(i))
      out.writeInt(levels(i).size)
      levels(i).foreach(out.writeDouble)
    }
    out.flush()
    bos.toByteArray
  }
}

object QuantileBuffer {
  def fromBytes(bytes: Array[Byte]): QuantileBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val b = new QuantileBuffer(in.readInt())
    b.n = in.readLong()
    val nLevels = in.readInt()
    (0 until nLevels).foreach { i =>
      while (b.levels.size <= i) {
        b.levels += scala.collection.mutable.ArrayBuffer[Double](); b.comps += 0
      }
      b.comps(i) = in.readInt()
      val len = in.readInt()
      (0 until len).foreach(_ => b.levels(i) += in.readDouble())
    }
    b
  }
}

trait QuantileBuffered {
  self: TypedImperativeAggregate[QuantileBuffer] =>
  def k: Int
  override def createAggregationBuffer(): QuantileBuffer = new QuantileBuffer(k)
  override def merge(buffer: QuantileBuffer, input: QuantileBuffer): QuantileBuffer = {
    buffer.merge(input); buffer
  }
  override def eval(buffer: QuantileBuffer): Any = buffer.toBytes
  override def serialize(buffer: QuantileBuffer): Array[Byte] = buffer.toBytes
  override def deserialize(bytes: Array[Byte]): QuantileBuffer =
    QuantileBuffer.fromBytes(bytes)
}

/** Build a quantile sketch over a numeric column (cast to double). */
case class QuantileSketchAgg(child: Expression, k: Int,
                             mutableAggBufferOffset: Int = 0,
                             inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[QuantileBuffer]
  with QuantileBuffered with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(DoubleType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "quant_sketch_agg"

  override def update(buffer: QuantileBuffer, input: InternalRow): QuantileBuffer = {
    val v = child.eval(input)
    if (v != null) buffer.update(v.asInstanceOf[Double])
    buffer
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): QuantileSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QuantileSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** Merge pre-built quantile sketches (binary column) — k mismatch
  * RAISES (the buffers check), surfacing config drift loudly like the
  * HLL strict mode.
  */
case class QuantileMergeAgg(child: Expression, k: Int,
                            mutableAggBufferOffset: Int = 0,
                            inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[QuantileBuffer]
  with QuantileBuffered with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "quant_merge_agg"

  override def update(buffer: QuantileBuffer, input: InternalRow): QuantileBuffer = {
    val v = child.eval(input)
    if (v != null) buffer.merge(QuantileBuffer.fromBytes(v.asInstanceOf[Array[Byte]]))
    buffer
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): QuantileMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QuantileMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** q-quantile estimate off a serialized sketch (NULL when empty).
  * Runs on sketch tables — facet rows — so CodegenFallback costs
  * nothing measurable, as with the theta/freq scalars.
  */
case class QuantileEstimate(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes with CodegenFallback {
  override def inputTypes: Seq[DataType] = Seq(BinaryType, DoubleType)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "quant_estimate"
  override protected def nullSafeEval(bytes: Any, q: Any): Any =
    QuantileBuffer.fromBytes(bytes.asInstanceOf[Array[Byte]])
      .estimate(q.asInstanceOf[Double]).orNull
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Total value count folded into a serialized sketch. */
case class QuantileCount(child: Expression)
  extends UnaryExpression with ExpectsInputTypes with CodegenFallback {
  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = LongType
  override def prettyName: String = "quant_count"
  override protected def nullSafeEval(bytes: Any): Any =
    QuantileBuffer.fromBytes(bytes.asInstanceOf[Array[Byte]]).n
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
