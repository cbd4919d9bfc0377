package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash over a token array (Charikar 2002, "Similarity
  * estimation techniques from rounding algorithms" — public algorithm).
  *
  * Near-duplicate docs differ in few bits, so candidate pairs can be
  * found by exact-matching 16-bit bands (pigeonhole: Hamming ≤ 3 ⇒ ≥1 of
  * 4 bands equal) and verified with `bit_count(a ^ b)` — both ends stay
  * inside whole-stage codegen.
  *
  * Implementation note: a native Catalyst expression (not a Scala UDF) so
  * the per-row path is a static call with no serialization, null-handling
  * is inherited, and codegen splices it into the stage
  * (SURVEY §2.12 extension surface; preference order (b) of the build
  * brief). Token hashing reuses Spark's XXH64 (same hash family as the
  * built-in `xxhash64`).
  */
case class SimHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash requires array<string>, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any =
    SimHashImpl.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.SimHashImpl.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash =
    copy(child = newChild)
}

/** Static kernel shared by interpreted eval and generated code. */
object SimHashImpl {
  def compute(tokens: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val s: UTF8String = tokens.getUTF8String(i)
        val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset,
          s.numBytes, 42L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** Column-API entry: `simhash(tokens)`. */
  def simhash(tokens: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      SimHash(org.apache.spark.sql.GraftSqlBridge.expression(tokens)))
}
