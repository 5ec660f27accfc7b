package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * THE portability rounding primitives (STATUS lesson 11 / SURVEY §8):
 * floor(|u|·1e6 + 0.5)/1e6 — the identical IEEE op sequence on both
 * engines at every input, unlike round()'s engine-specific half
 * behavior — and the quantize-to-integer-micro-units form the
 * exact-integer-sum operators build on. ONE definition (this file);
 * every Scala/SQL call site delegates here so a boundary fix can
 * never fork between copies (a round-12 review found five drifting
 * textual copies — this object replaced them).
 */
private[graft] object Round6 {

  /** Symmetric 6dp floor-formula round (negatives mirror). */
  def r6(c: Column): Column =
    when(c >= 0, floor(c * lit(1e6) + lit(0.5)) / lit(1e6))
      .otherwise(-(floor(-c * lit(1e6) + lit(0.5)) / lit(1e6)))

  /** Quantize to signed integer micro-units (long). */
  def q6(c: Column): Column =
    when(c >= 0, floor(c * lit(1e6) + lit(0.5)))
      .otherwise(-floor(-c * lit(1e6) + lit(0.5))).cast("long")

  /** [[r6]]'s verbatim DuckDB twin. */
  def r6Sql(e: String): String =
    s"""(CASE WHEN ($e) >= 0
       |  THEN floor(($e) * 1000000.0 + 0.5) / 1000000.0
       |  ELSE -(floor(-($e) * 1000000.0 + 0.5) / 1000000.0) END)""".stripMargin

  /** [[q6]]'s verbatim DuckDB twin. */
  def q6Sql(e: String): String =
    s"""CAST(CASE WHEN ($e) >= 0 THEN floor(($e) * 1000000.0 + 0.5)
       |  ELSE -floor(-($e) * 1000000.0 + 0.5) END AS BIGINT)""".stripMargin
}
