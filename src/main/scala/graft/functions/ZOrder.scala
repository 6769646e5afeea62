package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Morton (z-curve) interleave of two 16-bit dimensions — the layout key
  * behind multi-dimensional data clustering (Delta/Iceberg `ZORDER BY`):
  * sorting by the interleaved bits gives every contiguous file run a
  * bounded bounding box in BOTH dimensions, so min/max footer stats
  * prune scans on either predicate. A single-column sort only ever
  * prunes its own column — at 100 TB the second dimension's full range
  * sits in every file and nothing prunes.
  *
  * The interleave is a STATIC 32-term expression tree of shifts/ands —
  * integer-exact, codegen-friendly (one flat projection, no UDF), and
  * replayable in any engine; [[zvalueSql]] emits the identical
  * arithmetic as ANSI SQL so the DuckDB oracle shares the generator
  * (one source of truth, the c38 cross-engine proof).
  */
object ZOrder {

  /** z = interleave(x₀..x₁₅, y₀..y₁₅), y in the odd bits. Inputs are
    * masked to 16 bits, so callers can pass raw nonneg columns.
    */
  def zvalue16(x: Column, y: Column): Column = {
    val xm = x.cast("long").bitwiseAND(lit(65535L))
    val ym = y.cast("long").bitwiseAND(lit(65535L))
    (0 until 16).foldLeft(lit(0L)) { (acc, i) =>
      acc +
        shiftleft(shiftright(xm, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(ym, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }
  }

  /** The same interleave as SQL text over two (already masked or
    * in-range) integer expressions — for oracle engines.
    */
  def zvalueSql(x: String, y: String): String =
    (0 until 16).map { i =>
      s"((($x >> $i) & 1) << ${2 * i}) + ((($y >> $i) & 1) << ${2 * i + 1})"
    }.mkString("(", " + ", ")")
}
