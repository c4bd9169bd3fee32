package graft.functions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{SetOperation, Sketch}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Theta-sketch expressions (DataSketches): the mergeable DISTINCT-SET
  * algebra Spark's built-in HLL functions don't cover — HLL unions
  * only; theta also intersects and subtracts, which is what corpus
  * OVERLAP estimation needs (train ∩ benchmark contamination, snapshot
  * ∩ snapshot drift) without an exact join's full shuffle.
  *
  * [[ThetaSketchAgg]] / [[ThetaUnionAgg]] follow Spark's own
  * HllSketchAgg shape (TypedImperativeAggregate with the live Union as
  * the buffer, compact-ordered bytes on the wire) so they partial-
  * aggregate map-side like any builtin: only ≤8·2^lgK-byte sketches
  * ever shuffle. The scalar set ops ([[ThetaEstimate]],
  * [[ThetaIntersect]], [[ThetaANotB]]) run on SKETCH TABLES — facet
  * cardinality rows, not corpus rows — so CodegenFallback costs
  * nothing measurable there.
  *
  * Determinism: theta sketches hash with fixed seeds and compact
  * ordered, so the same value set yields the same bytes on any
  * partitioning — golden digests in ExportSpec hold.
  */
object ThetaExprs {

  def thetaSketchAgg(value: Column, lgK: Int = 12): Column =
    ColumnBridge.column(
      ThetaSketchAgg(ColumnBridge.expression(value), lgK).toAggregateExpression())

  def thetaUnionAgg(sketch: Column, lgK: Int = 12): Column =
    ColumnBridge.column(
      ThetaUnionAgg(ColumnBridge.expression(sketch), lgK).toAggregateExpression())

  def thetaEstimate(sketch: Column): Column =
    ColumnBridge.column(ThetaEstimate(ColumnBridge.expression(sketch)))

  def thetaIntersect(a: Column, b: Column): Column =
    ColumnBridge.column(ThetaIntersect(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def thetaANotB(a: Column, b: Column): Column =
    ColumnBridge.column(ThetaANotB(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  private[functions] def wrap(bytes: Array[Byte]): Sketch =
    Sketch.wrap(Memory.wrap(bytes))
}

/** Common buffer plumbing for the two theta aggregates: the buffer is
  * a live theta Union; the wire format is the compact-ordered result
  * sketch (re-absorbed via `union(Memory)` on deserialize).
  */
trait ThetaUnionBuffered {
  self: TypedImperativeAggregate[org.apache.datasketches.theta.Union] =>
  def lgK: Int

  override def createAggregationBuffer(): org.apache.datasketches.theta.Union =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()

  override def merge(buffer: org.apache.datasketches.theta.Union,
                     input: org.apache.datasketches.theta.Union): org.apache.datasketches.theta.Union = {
    buffer.union(input.getResult()); buffer
  }

  override def eval(buffer: org.apache.datasketches.theta.Union): Any =
    buffer.getResult().toByteArray

  override def serialize(buffer: org.apache.datasketches.theta.Union): Array[Byte] =
    buffer.getResult().toByteArray

  override def deserialize(bytes: Array[Byte]): org.apache.datasketches.theta.Union = {
    val u = createAggregationBuffer()
    u.union(Memory.wrap(bytes))
    u
  }
}

/** Build a theta sketch over a string column (one per group).
  * `lgK` = log2 nominal entries: estimates are EXACT below 2^lgK
  * distinct values, ~1/sqrt(2^lgK) RSE above.
  */
case class ThetaSketchAgg(child: Expression, lgK: Int,
                          mutableAggBufferOffset: Int = 0,
                          inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[org.apache.datasketches.theta.Union]
  with ThetaUnionBuffered with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "theta_sketch_agg"

  override def update(buffer: org.apache.datasketches.theta.Union,
                      input: InternalRow): org.apache.datasketches.theta.Union = {
    val v = child.eval(input)
    if (v != null) buffer.update(v.asInstanceOf[UTF8String].getBytes)
    buffer
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** Union pre-built theta sketches (binary column) — the merge side of
  * the build-once/merge-forever lifecycle. NOTE: a union with smaller
  * `lgK` than its inputs silently downsamples (theta's contract, unlike
  * the HLL aggregate's strict mode) — keep one lgK per index family;
  * [[graft.ext.Sketches]] threads a single value through build and
  * merge for exactly this reason.
  */
case class ThetaUnionAgg(child: Expression, lgK: Int,
                         mutableAggBufferOffset: Int = 0,
                         inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[org.apache.datasketches.theta.Union]
  with ThetaUnionBuffered with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "theta_union_agg"

  override def update(buffer: org.apache.datasketches.theta.Union,
                      input: InternalRow): org.apache.datasketches.theta.Union = {
    val v = child.eval(input)
    if (v != null) buffer.union(Memory.wrap(v.asInstanceOf[Array[Byte]]))
    buffer
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaUnionAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaUnionAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** Distinct-count estimate of a serialized theta sketch. */
case class ThetaEstimate(child: Expression)
  extends UnaryExpression with ExpectsInputTypes with CodegenFallback {
  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "theta_estimate"
  override protected def nullSafeEval(bytes: Any): Any =
    ThetaExprs.wrap(bytes.asInstanceOf[Array[Byte]]).getEstimate
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Intersection of two serialized theta sketches (compact bytes out). */
case class ThetaIntersect(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes with CodegenFallback {
  override def inputTypes: Seq[DataType] = Seq(BinaryType, BinaryType)
  override def dataType: DataType = BinaryType
  override def prettyName: String = "theta_intersect"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    SetOperation.builder().buildIntersection()
      .intersect(ThetaExprs.wrap(a.asInstanceOf[Array[Byte]]),
                 ThetaExprs.wrap(b.asInstanceOf[Array[Byte]]))
      .toByteArray
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** A \ B of two serialized theta sketches — "distinct values new in A"
  * (snapshot drift, incremental-ingest novelty).
  */
case class ThetaANotB(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes with CodegenFallback {
  override def inputTypes: Seq[DataType] = Seq(BinaryType, BinaryType)
  override def dataType: DataType = BinaryType
  override def prettyName: String = "theta_a_not_b"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    SetOperation.builder().buildANotB()
      .aNotB(ThetaExprs.wrap(a.asInstanceOf[Array[Byte]]),
             ThetaExprs.wrap(b.asInstanceOf[Array[Byte]]))
      .toByteArray
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
