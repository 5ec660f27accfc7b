package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/**
 * Driver-testdata table loader (TESTDATA.md).
 *
 * `events.ts` has shipped in two physical forms across driver
 * generations, and this loader normalizes BOTH to a microsecond
 * session-zone timestamp so every downstream `unix_micros` kernel sees
 * one type:
 *  - Parquet TIMESTAMP(NANOS) (no native Spark 4 type): sessions must
 *    set `spark.sql.legacy.parquet.nanosAsLong=true` and the long
 *    nanos are floored to micros — the same floor semantics DuckDB
 *    applies when casting TIMESTAMP_NS down, so oracle comparisons
 *    line up even for pre-epoch (negative) nanos, where `div` would
 *    truncate toward zero and land 1 µs late;
 *  - Parquet timestamp[us] without timezone (isAdjustedToUTC=false),
 *    which Spark 4 infers as TIMESTAMP_NTZ: cast to TIMESTAMP under
 *    the required UTC session zone — the identical wall-clock instant
 *    DuckDB's naive timestamps carry, so the oracle hashes match.
 * All other tables (timestamp[ms], primitives) read natively.
 */
object Tables {

  /** Columns physically stored as nano timestamps, per table. */
  private val nanoTsCols: Map[String, Seq[String]] = Map(
    "events" -> Seq("ts"))

  def read(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val raw = spark.read.parquet(s"$sfDir/$name.parquet")
    nanoTsCols.getOrElse(name, Nil).foldLeft(raw) { (df, c) =>
      df.schema.find(_.name == c) match {
        case Some(f) if f.dataType == LongType =>
          // floor-div in pure long arithmetic (no double round-trip:
          // ns magnitudes exceed 2^53): subtract the non-negative
          // remainder, then the division is exact.
          df.withColumn(c,
            timestamp_micros(expr(s"(`$c` - ((`$c` % 1000) + 1000) % 1000) div 1000")))
        case Some(f) if f.dataType == TimestampNTZType =>
          df.withColumn(c, col(c).cast(TimestampType))
        case _ => df
      }
    }
  }

  /** SparkSession.builder config required to read the driver testdata. */
  val requiredConfs: Map[String, String] = Map(
    "spark.sql.legacy.parquet.nanosAsLong" -> "true",
    "spark.sql.session.timeZone" -> "UTC")
}
