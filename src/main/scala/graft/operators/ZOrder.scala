package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Morton (Z-order) interleaving — the multi-dimensional clustering key
  * a 100 TB lake sorts/ranges its files by so that a range predicate on
  * EITHER dimension touches a contiguous, small fraction of files
  * (single-column sort clusters one dimension and scatters the other;
  * bit-interleaving keeps both locally dense). The reference has no
  * layout optimization at all — its only clustering is the LSH shard
  * (index.py:53-68); this is the companion operator for the relational
  * columns.
  *
  * Pure integer bit arithmetic on two quantized dimensions — identical
  * semantics as a Spark expression and in ANSI/DuckDB SQL, so the audit
  * query is fully oracle-paired. The expression is codegen-friendly
  * (shifts, masks, adds — no UDF).
  */
object ZOrder {

  /** Interleave the low `bits` bits of two non-negative ints:
    * bit j of `x` lands at position 2j, bit j of `y` at 2j+1.
    * Result fits in 2·bits bits (long). */
  def interleave2(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    (0 until bits).map { j =>
      shiftright(x, j).bitwiseAND(lit(1)).cast("long") * lit(1L << (2 * j)) +
        shiftright(y, j).bitwiseAND(lit(1)).cast("long") * lit(1L << (2 * j + 1))
    }.reduce(_ + _)
  }

  /** The same interleave as portable SQL over integer expressions. */
  def sqlInterleave2(x: String, y: String, bits: Int): String =
    (0 until bits).map { j =>
      s"((($x) >> $j) & 1) * ${1L << (2 * j)} + ((($y) >> $j) & 1) * ${1L << (2 * j + 1)}"
    }.mkString("(", " + ", ")")
}
