package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Interval mechanics of the exact-substring dedup family
  * ([[graft.ext.Dedup.duplicatedSubstringRegions]] /
  * `stripExactSubstrings` and their char-grain siblings): a flagged
  * WINDOW START at position s covers positions [s, s+w). The family's
  * original shape computed that coverage by exploding one row per unit
  * position and running a sliding-max window function — linear, but
  * with a per-unit constant (25M exploded rows at sf1 char grain) that
  * dominated the queries. Coverage of a start set is exactly the UNION
  * of its [s, s+w) intervals, so once the (few) flagged starts per
  * document are aggregated into one sorted int array, the regions and
  * the cut both reduce to a ROW-LOCAL merge/splice — these
  * expressions. Shuffled data shrinks from one row per unit position
  * to one row per flagged window start.
  */
object SpanExprs {

  /** Merged covered runs of width-`w` windows at `starts` (sorted
    * ascending, 0-based): `array<struct<start:long, len:long>>` —
    * adjacent/overlapping intervals union (s ≤ end merges), exactly
    * the gaps-and-islands regions of the sliding-max formulation.
    */
  def mergedRuns(starts: Column, w: Column): Column =
    ColumnBridge.column(MergedRuns(
      ColumnBridge.expression(starts), ColumnBridge.expression(w)))

  /** Splice the units covered by `runs` (sorted, disjoint — a
    * [[mergedRuns]] output) out of `text`:
    * `struct<text: string, n_cut: bigint>`. `mode` picks the unit:
    * "char" (code points, joined with nothing), "token" (space-split,
    * rejoined with single spaces), or "line" (newline-split, rejoined
    * with newlines) — byte-for-byte what the explode/filter/array_join
    * rebuild produced, in one linear pass per document.
    */
  def cutRuns(text: Column, runs: Column, mode: String): Column =
    ColumnBridge.column(CutRuns(
      ColumnBridge.expression(text), ColumnBridge.expression(runs), mode))
}

/** See [[SpanExprs.mergedRuns]]. Null-safe binary expression over
  * (array<int|long> starts, int width); per-row tight loop
  * (CodegenFallback — the ShingleHashes precedent: not in any join
  * hot path, called once per affected document).
  */
case class MergedRuns(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(IntegerType, containsNull = false), IntegerType)
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("start", LongType, nullable = false),
      StructField("len", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "merged_runs"

  override protected def nullSafeEval(startsAny: Any, wAny: Any): Any = {
    val arr = startsAny.asInstanceOf[ArrayData]
    val w = wAny.asInstanceOf[Int].toLong
    val n = arr.numElements()
    val elemLong = left.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var runStart = -1L
    var runEnd = -1L // exclusive
    var i = 0
    while (i < n) {
      val s = if (elemLong) arr.getLong(i) else arr.getInt(i).toLong
      if (runStart < 0) { runStart = s; runEnd = s + w }
      else if (s <= runEnd) { if (s + w > runEnd) runEnd = s + w }
      else {
        out += InternalRow(runStart, runEnd - runStart)
        runStart = s; runEnd = s + w
      }
      i += 1
    }
    if (runStart >= 0) out += InternalRow(runStart, runEnd - runStart)
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** See [[SpanExprs.cutRuns]]. Tight-loop splice (CodegenFallback, the
  * family precedent); runs are (start, len) longs in unit coordinates,
  * sorted and disjoint by the [[MergedRuns]] contract. `mode` is one
  * of "char" / "token" / "line" — the unit split and the rejoin
  * separator ("" / " " / "\n").
  */
case class CutRuns(left: Expression, right: Expression, mode: String)
  extends BinaryExpression with ExpectsInputTypes with CodegenFallback {
  require(CutRuns.Seps.contains(mode),
    s"CutRuns mode must be one of ${CutRuns.Seps.keys.mkString("/")}, got $mode")

  override def inputTypes: Seq[DataType] = Seq(StringType,
    ArrayType(StructType(Seq(
      StructField("start", LongType, nullable = false),
      StructField("len", LongType, nullable = false))), containsNull = false))
  override def dataType: DataType = StructType(Seq(
    StructField("text", StringType, nullable = false),
    StructField("n_cut", LongType, nullable = false)))
  override def prettyName: String = "cut_runs"

  override protected def nullSafeEval(textAny: Any, runsAny: Any): Any = {
    val text = textAny.toString
    val runs = runsAny.asInstanceOf[ArrayData]
    val units: Array[String] = mode match {
      case "char" => BpeCore.codepointStrings(text)
      case "token" => text.split(" ", -1)
      case _ => text.split("\n", -1)
    }
    val sep = CutRuns.Seps(mode)
    val sb = new java.lang.StringBuilder(text.length)
    var nCut = 0L
    var ri = 0
    var i = 0
    var first = true
    while (i < units.length) {
      // advance past runs that end at or before i (runs are sorted)
      while (ri < runs.numElements() &&
             runs.getStruct(ri, 2).getLong(0) + runs.getStruct(ri, 2).getLong(1) <= i)
        ri += 1
      val covered = ri < runs.numElements() && {
        val r = runs.getStruct(ri, 2)
        i >= r.getLong(0) && i < r.getLong(0) + r.getLong(1)
      }
      if (covered) nCut += 1L
      else {
        if (sep.nonEmpty && !first) sb.append(sep)
        sb.append(units(i))
        first = false
      }
      i += 1
    }
    InternalRow(UTF8String.fromString(sb.toString), nCut)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object CutRuns {
  private[functions] val Seps = Map("char" -> "", "token" -> " ", "line" -> "\n")
}
