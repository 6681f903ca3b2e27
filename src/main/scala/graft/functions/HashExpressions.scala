package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions for document fingerprinting (SURVEY.md §2.9
  * X1/X4, §2.10 escape-hatch policy: built-ins → higher-order functions →
  * native Expression, never a Scala UDF).
  *
  * These two are the cases built-ins genuinely can't express:
  *  - a *rolling* polynomial hash must fold bytes in order with 64-bit
  *    wrap-around arithmetic (SQL higher-order functions could fold, but
  *    per-character array explosion is ~40× slower and allocates);
  *  - SimHash needs per-token hash bits summed into 64 signed counters.
  *
  * Both are deterministic pure functions of their input, null-in → null-out.
  */

/** 64-bit FNV-1a-style rolling hash over a string's UTF-8 bytes, with full
  * whole-stage codegen (`doGenCode` emits the byte loop inline — no virtual
  * calls, no allocation in the hot path). */
case class PolyHash64(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "poly_hash64"

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var h = PolyHash64.Seed
    var i = 0
    while (i < bytes.length) {
      h = (h ^ (bytes(i) & 0xffL)) * PolyHash64.Prime
      i += 1
    }
    java.lang.Long.valueOf(h)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      s"""
         |byte[] $bytes = $c.getBytes();
         |long $h = ${PolyHash64.Seed}L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  $h = ($h ^ ($bytes[$i] & 0xffL)) * ${PolyHash64.Prime}L;
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PolyHash64 =
    copy(child = newChild)
}

object PolyHash64 {
  val Seed = -3750763034362895579L   // FNV-1a 64 offset basis
  val Prime = 1099511628211L         // FNV-1a 64 prime
  def apply(c: Column): Column =
    ColumnBridge.column(PolyHash64(ColumnBridge.expression(c)))
}

/** SimHash over an array of tokens: each token's 64-bit hash votes ±1 per
  * bit position; the signature takes each bit's majority sign. Hamming
  * distance between signatures approximates 1 - cosine similarity of the
  * token multisets — near-dup docs land within a few bits (Charikar 2002,
  * public algorithm). Interpreted eval (CodegenFallback): the per-row cost
  * is dominated by the token loop either way. */
case class SimHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val counts = new Array[Int](64)
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val tok = arr.getUTF8String(i)
        val bytes = tok.getBytes
        var h = PolyHash64.Seed
        var j = 0
        while (j < bytes.length) {
          h = (h ^ (bytes(j) & 0xffL)) * PolyHash64.Prime
          j += 1
        }
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) sig |= (1L << b)
      b += 1
    }
    java.lang.Long.valueOf(sig)
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  def apply(c: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(c)))

  /** Hamming distance between two signatures as a Column (bit_count is a
    * Spark built-in — stays in codegen). */
  def hamming(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.bit_count(a.bitwiseXOR(b))
}
