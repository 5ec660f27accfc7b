package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.Tables
import java.nio.file.Files

/** The ns→µs ingest conversion must FLOOR (DuckDB's TIMESTAMP_NS cast
  * semantics), not truncate toward zero — they differ for pre-epoch
  * nanos (ADVICE r1 #4). */
class TablesSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("nano timestamps floor to micros, including pre-epoch") {
    val dir = Files.createTempDirectory("graft_tables").toString
    // ns values: +1500 → +1 µs; −1500 → −2 µs (floor, not −1);
    // exact multiples stay put
    Seq((1L, 1500L), (2L, -1500L), (3L, -2000L), (4L, 0L))
      .toDF("event_id", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Tables.read(spark, dir, "events")
      .select(col("event_id"), unix_micros(col("ts")).as("us"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) == 1L)
    assert(got(2L) == -2L, "pre-epoch ns must floor, not truncate toward zero")
    assert(got(3L) == -2L)
    assert(got(4L) == 0L)
  }
}
