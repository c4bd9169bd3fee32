package graft.functions

import org.apache.datasketches.common.ArrayOfStringsSerDe
import org.apache.datasketches.frequencies.{ErrorType, ItemsSketch}
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Frequent-items (Misra-Gries) sketch expressions over DataSketches'
  * `ItemsSketch<String>` — the mergeable HEAVY-HITTER summary that
  * completes the sketch family next to the HLL distinct counts and the
  * theta set algebra ([[ThetaExprs]]): "which tokens / domains / sources
  * dominate this corpus" at 100 TB without materializing the full
  * frequency table (q40's exact top-k shuffles every distinct token;
  * the sketch shuffles ≤ `maxMapSize` (item, count) pairs per partial).
  *
  * Contract (Misra-Gries, as implemented by DataSketches):
  *  - while a sketch never purges (distinct items stay under the load
  *    threshold, 0.75·maxMapSize), every estimate is EXACT and
  *    `getMaximumError == 0` — the spec's exactness anchor;
  *  - above capacity, for every item `lb <= true count <= ub` with
  *    `ub - lb <= getMaximumError <= 3.5·n/maxMapSize` (a purge drops
  *    the map's MEDIAN count — DataSketches' documented epsilon), and
  *    NO_FALSE_NEGATIVES reports every item whose true count exceeds
  *    the error bound.
  *
  * Same TypedImperativeAggregate shape as Spark's HllSketchAgg /
  * [[ThetaSketchAgg]]: partials combine map-side, only sketch bytes
  * shuffle. The weighted update ([[FreqExprs.freqSketchAgg]] with a
  * weight column) lets a pre-aggregated (item, count) table feed the
  * sketch without re-expanding rows.
  */
object FreqExprs {

  private[functions] val serde = new ArrayOfStringsSerDe

  def freqSketchAgg(value: Column, maxMapSize: Int = 256): Column =
    freqSketchAgg(value, org.apache.spark.sql.functions.lit(1L), maxMapSize)

  def freqSketchAgg(value: Column, weight: Column, maxMapSize: Int): Column =
    ColumnBridge.column(
      FreqSketchAgg(ColumnBridge.expression(value),
        ColumnBridge.expression(weight), maxMapSize).toAggregateExpression())

  def freqMergeAgg(sketch: Column, maxMapSize: Int = 256): Column =
    ColumnBridge.column(
      FreqMergeAgg(ColumnBridge.expression(sketch), maxMapSize).toAggregateExpression())

  /** Top-`k` frequent items of a serialized sketch as
    * `array<struct<item, est, lb, ub>>`, ordered (est DESC, item ASC) —
    * a total order, so output is deterministic given the sketch bytes.
    * `noFalsePositives=true` keeps only items GUARANTEED frequent
    * (lb > error bound); false reports every candidate (no false
    * negatives — the curation default: review candidates, never miss a
    * heavy hitter).
    */
  def freqTopItems(sketch: Column, k: Int, noFalsePositives: Boolean = false): Column =
    ColumnBridge.column(FreqTopItems(ColumnBridge.expression(sketch), k, noFalsePositives))

  /** The sketch's worst-case estimate error (0 ⇒ every estimate exact). */
  def freqMaxError(sketch: Column): Column =
    ColumnBridge.column(FreqMaxError(ColumnBridge.expression(sketch)))

  private[functions] def wrap(bytes: Array[Byte]): ItemsSketch[String] =
    ItemsSketch.getInstance(Memory.wrap(bytes), serde)
}

/** Shared buffer plumbing: live ItemsSketch buffer, serialized items on
  * the wire.
  */
trait FreqSketchBuffered {
  self: TypedImperativeAggregate[ItemsSketch[String]] =>
  def maxMapSize: Int

  override def createAggregationBuffer(): ItemsSketch[String] =
    new ItemsSketch[String](maxMapSize)

  override def merge(buffer: ItemsSketch[String],
                     input: ItemsSketch[String]): ItemsSketch[String] = {
    buffer.merge(input); buffer
  }

  override def eval(buffer: ItemsSketch[String]): Any =
    buffer.toByteArray(FreqExprs.serde)

  override def serialize(buffer: ItemsSketch[String]): Array[Byte] =
    buffer.toByteArray(FreqExprs.serde)

  override def deserialize(bytes: Array[Byte]): ItemsSketch[String] =
    FreqExprs.wrap(bytes)
}

/** Build a frequent-items sketch over a string column, weighted by
  * `weight` (lit(1) for raw rows; a count column for pre-aggregated
  * tables). `maxMapSize` must be a power of 2 (DataSketches raises
  * otherwise); error bound is n/maxMapSize.
  */
case class FreqSketchAgg(child: Expression, weight: Expression, maxMapSize: Int,
                         mutableAggBufferOffset: Int = 0,
                         inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ItemsSketch[String]]
  with FreqSketchBuffered with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType, LongType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child, weight)
  override def prettyName: String = "freq_sketch_agg"

  override def update(buffer: ItemsSketch[String],
                      input: InternalRow): ItemsSketch[String] = {
    val v = child.eval(input)
    if (v != null) {
      val w = weight.eval(input)
      if (w != null) buffer.update(v.asInstanceOf[UTF8String].toString, w.asInstanceOf[Long])
    }
    buffer
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0), weight = newChildren(1))
}

/** Merge pre-built frequent-items sketches (binary column) — the
  * build-once/merge-forever side, like [[ThetaUnionAgg]]. Merging keeps
  * the BUFFER's maxMapSize; keep one size per sketch family (the
  * [[graft.ext.Sketches]] wrappers thread a single value).
  */
case class FreqMergeAgg(child: Expression, maxMapSize: Int,
                        mutableAggBufferOffset: Int = 0,
                        inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ItemsSketch[String]]
  with FreqSketchBuffered with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "freq_merge_agg"

  override def update(buffer: ItemsSketch[String],
                      input: InternalRow): ItemsSketch[String] = {
    val v = child.eval(input)
    if (v != null) buffer.merge(FreqExprs.wrap(v.asInstanceOf[Array[Byte]]))
    buffer
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** Top-k rows off a serialized sketch (see [[FreqExprs.freqTopItems]]).
  * Runs on SKETCH TABLES (facet rows), so CodegenFallback is
  * immaterial, as with the theta scalar ops.
  */
case class FreqTopItems(child: Expression, k: Int, noFalsePositives: Boolean)
  extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("est", LongType, nullable = false),
    StructField("lb", LongType, nullable = false),
    StructField("ub", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "freq_top_items"

  override protected def nullSafeEval(bytes: Any): Any = {
    val sk = FreqExprs.wrap(bytes.asInstanceOf[Array[Byte]])
    val errorType =
      if (noFalsePositives) ErrorType.NO_FALSE_POSITIVES else ErrorType.NO_FALSE_NEGATIVES
    val rows = sk.getFrequentItems(errorType)
      .sortBy(r => (-r.getEstimate, r.getItem))
      .take(k)
      .map { r =>
        InternalRow(UTF8String.fromString(r.getItem),
          r.getEstimate, r.getLowerBound, r.getUpperBound)
      }
    new GenericArrayData(rows.toSeq)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Worst-case estimate error of a serialized sketch (0 ⇒ exact). */
case class FreqMaxError(child: Expression)
  extends UnaryExpression with ExpectsInputTypes with CodegenFallback {
  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = LongType
  override def prettyName: String = "freq_max_error"
  override protected def nullSafeEval(bytes: Any): Any =
    FreqExprs.wrap(bytes.asInstanceOf[Array[Byte]]).getMaximumError
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
