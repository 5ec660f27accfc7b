package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/**
 * Driver-testdata table loader (TESTDATA.md).
 *
 * `events.ts` is physically Parquet TIMESTAMP(NANOS), which Spark 4 has
 * no native type for; sessions must set
 * `spark.sql.legacy.parquet.nanosAsLong=true` and this loader converts
 * the long nanos to a microsecond timestamp by FLOOR division — the
 * same floor semantics DuckDB applies when casting TIMESTAMP_NS down,
 * so oracle comparisons line up even for pre-epoch (negative) nanos,
 * where `div` would truncate toward zero and land 1 µs late.
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
        case _ => df
      }
    }
  }

  /** SparkSession.builder config required to read the driver testdata. */
  val requiredConfs: Map[String, String] = Map(
    "spark.sql.legacy.parquet.nanosAsLong" -> "true",
    "spark.sql.session.timeZone" -> "UTC")
}
