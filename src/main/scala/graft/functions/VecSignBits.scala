package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType}

/**
 * Native codegen'd 1-bit sign quantization of an embedding: bit i of the
 * result is set iff `vec[i] > 0`, over the first (up to) 63 dimensions —
 * one BIGINT per vector, a ~32x compression of a float32 dim-64 embedding.
 * 63 bits, not 64: a signed-long 1<<63 overflows in SQL engines (DuckDB
 * raises), and the last dimension's sign rides the exact rerank anyway.
 *
 * The downstream similarity proxy is pure integer work the engines share
 * bit-for-bit: `hamming(a, b) = bit_count(a XOR b)` approximates angular
 * distance (Charikar 2002's SimHash bound: P[bit differs] = theta / pi),
 * and both Spark and DuckDB evaluate `bit_count`/XOR natively, so a
 * sign-bit shortlist is exactly replayable in the SQL oracle. Strictly
 * `> 0` (zeros quantize to 0) keeps the rule engine-agnostic.
 */
case class VecSignBits(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def prettyName: String = "vec_sign_bits"

  private def elemIsDouble: Boolean = child.dataType match {
    case org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType, _) => true
    case _ => false
  }

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), 63)
    var bits = 0L
    var i = 0
    while (i < n) {
      val v = if (elemIsDouble) x.getDouble(i) else x.getFloat(i).toDouble
      if (v > 0.0) bits |= (1L << i)
      i += 1
    }
    bits
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val bits = ctx.freshName("bits")
      val get = if (elemIsDouble) s"$a.getDouble($i)" else s"(double) $a.getFloat($i)"
      s"""
         |int $n = java.lang.Math.min($a.numElements(), 63);
         |long $bits = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($get > 0.0) $bits |= (1L << $i);
         |}
         |${ev.value} = $bits;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): VecSignBits =
    copy(child = newChild)
}

object VecSignBits {
  /** Column wrapper: packed sign bits of an array<float|double> column. */
  def apply(v: Column): Column =
    Bridge.column(VecSignBits(Bridge.expression(v)))
}
