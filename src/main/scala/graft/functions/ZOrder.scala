package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Morton (Z-order) codes for two-dimensional clustering keys.
  *
  * Interleaving the bits of two dimensions gives a single sort key whose
  * contiguous ranges are axis-aligned blocks in BOTH dimensions — the
  * multi-column generalization of [[graft.io.Layout.writeRangeSorted]]'s
  * linear clustering. A table laid out in z-order keeps per-file min/max
  * statistics selective for predicates on EITHER dimension (a lexicographic
  * sort only serves its leading column; the trailing column's per-file
  * range spans the whole domain and nothing skips). Same idea as
  * warehouse-engine multi-dimensional clustering keys (e.g. the Z-ordering
  * described in the Delta Lake / DB2 MDC literature).
  *
  * The spread uses the classic mask-shift doubling trick (5 bitwise steps
  * per dimension instead of a 16-step bit loop); everything is a
  * composition of builtin shift/and/or Columns, so the whole code stays
  * inside whole-stage codegen — no UDF, no custom expression needed. The
  * identical arithmetic is emitted as DuckDB SQL by [[zvalueSql]] from the
  * same mask table, so engine and oracle cannot drift.
  */
object ZOrder {

  /** (shift, mask) pairs for the bit-doubling spread of a 16-bit value
    * into the even bit positions of a 32-bit result. */
  private val Spread: Seq[(Int, Long)] = Seq(
    (8, 0x00FF00FFL), (4, 0x0F0F0F0FL), (2, 0x33333333L), (1, 0x55555555L))

  /** Low 16 bits of `x` spread to even bit positions (operates on long;
    * callers cast). */
  def spread16(x: Column): Column =
    Spread.foldLeft(x.bitwiseAND(lit(0xFFFFL))) { case (acc, (s, m)) =>
      acc.bitwiseOR(shiftleft(acc, s)).bitwiseAND(lit(m))
    }

  /** 32-bit Morton code of two 16-bit dimensions: bits of `a` at even
    * positions, bits of `b` at odd. Bijective on [0,2^16)² so grouping by
    * the z-value is grouping by the (a,b) cell. */
  def zvalue16(a: Column, b: Column): Column =
    spread16(a.cast("long"))
      .bitwiseOR(shiftleft(spread16(b.cast("long")), 1))

  private def spreadSql(x: String): String =
    Spread.foldLeft(s"($x & 65535)") { case (acc, (s, m)) =>
      s"((($acc | ($acc << $s)) & $m))"
    }

  /** The same Morton arithmetic as [[zvalue16]], as a DuckDB SQL scalar
    * expression over column (or expression) strings. */
  def zvalueSql(a: String, b: String): String =
    s"(${spreadSql(s"CAST($a AS BIGINT)")}" +
      s" | (${spreadSql(s"CAST($b AS BIGINT)")} << 1))"
}
