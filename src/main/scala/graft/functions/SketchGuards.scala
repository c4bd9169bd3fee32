package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{BinaryType, DataType}

/** Exact-mode guards for the sketch families: identity pass-throughs
  * over the binary sketch column that FAIL LOUDLY the moment a sketch
  * has left its exact regime (theta started sampling, Misra-Gries
  * purged, the quantile compactor fired).
  *
  * Why they exist: several registry queries (q96/q99/q102) carry EXACT
  * DuckDB oracles that are only valid while every facet stays below
  * the sketch's exactness capacity — the tested scale factors do, but
  * a run beyond them would fail the oracle with a confusing value/hash
  * mismatch. With the guard in the plan, an above-capacity run fails
  * with an explicit "sketch left exact mode" diagnostic instead, at
  * zero extra passes (the check rides the same row the estimate reads;
  * per-facet rows, a handful per corpus).
  *
  * These are plan-level expressions, not driver-side asserts, so they
  * hold wherever the frame is finally executed — bench, verify, or a
  * downstream consumer. CodegenFallback is fine: one evaluation per
  * FACET row, never in a join hot path (the ShingleHashes precedent).
  */
object SketchGuards {

  def thetaExactOrFail(sketch: Column): Column =
    ColumnBridge.column(ThetaExactOrFail(ColumnBridge.expression(sketch)))

  def freqExactOrFail(sketch: Column): Column =
    ColumnBridge.column(FreqExactOrFail(ColumnBridge.expression(sketch)))

  def quantExactOrFail(sketch: Column): Column =
    ColumnBridge.column(QuantExactOrFail(ColumnBridge.expression(sketch)))
}

/** Identity over a theta sketch; throws once the sketch samples
  * (theta < 1, i.e. a facet crossed 2^lgK distinct values).
  */
case class ThetaExactOrFail(child: Expression)
  extends UnaryExpression with ExpectsInputTypes with CodegenFallback {
  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = BinaryType
  override def prettyName: String = "theta_exact_or_fail"
  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    if (ThetaExprs.wrap(bytes).isEstimationMode)
      throw new IllegalStateException(
        "theta sketch left exact mode: a facet exceeded 2^lgK distinct values " +
          "and began sampling, so estimates are approximate and the exact-oracle " +
          "contract no longer holds — raise lgK or stop requiring exactness")
    bytes
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Identity over a frequent-items sketch; throws once the sketch has
  * purged (distinct items crossed the 0.75·maxMapSize load threshold,
  * so counts carry a nonzero error bound).
  */
case class FreqExactOrFail(child: Expression)
  extends UnaryExpression with ExpectsInputTypes with CodegenFallback {
  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = BinaryType
  override def prettyName: String = "freq_exact_or_fail"
  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    if (FreqExprs.wrap(bytes).getMaximumError > 0)
      throw new IllegalStateException(
        "frequent-items sketch left exact mode: a facet purged (distinct items " +
          "crossed 0.75*maxMapSize), so counts are now bounded estimates and the " +
          "exact-oracle contract no longer holds — raise maxMapSize or stop " +
          "requiring exactness")
    bytes
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Identity over a quantile sketch; throws once any compaction has
  * fired (a facet crossed k values, so order statistics are now
  * deterministic-compactor estimates, not exact).
  */
case class QuantExactOrFail(child: Expression)
  extends UnaryExpression with ExpectsInputTypes with CodegenFallback {
  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = BinaryType
  override def prettyName: String = "quant_exact_or_fail"
  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    val buf = QuantileBuffer.fromBytes(bytes)
    if (buf.comps.exists(_ != 0))
      throw new IllegalStateException(
        "quantile sketch left exact mode: a facet compacted (more than k values), " +
          "so quantiles are now deterministic-compactor estimates and the " +
          "exact-oracle contract no longer holds — raise k or stop requiring " +
          "exactness")
    bytes
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
