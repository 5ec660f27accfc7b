package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoders}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Event
import Kernels._

/** Per-(series, chunk) item for the boundary-merge fold: either a
  * non-empty-chunk marker (runId = null) or one flagged-run summary.
  * rn fields are row positions WITHIN the chunk. */
private[operators] case class ChunkItem(
    series_id: String,
    chunk_id: Long,
    run_id: Option[Long],
    rn_min: Long,
    rn_max: Long,
    chunk_rows: Long,
    start_us: Long,
    stop_us: Long,
    n_points: Long,
    total: Double,
    any_value: Boolean)

/**
 * Skew-robust gaps-and-islands (SCALE_NOTES.md): [[Kernels.withRunId]]
 * sorts each series on ONE task, so a single multi-billion-row series
 * pins an executor. This variant:
 *
 *  1. splits every series into fixed time chunks and computes run ids
 *     with a window partitioned by (series, chunk) — the sort spreads
 *     over #chunks tasks;
 *  2. aggregates each chunk to flagged-run summaries plus a non-empty
 *     chunk marker;
 *  3. merges boundary runs per series in a `flatMapGroups` fold over
 *     the SUMMARIES (O(#runs), not O(#rows)): a run ending on its
 *     chunk's last row continues into the next non-empty chunk's
 *     first-row run — empty chunks in between are irrelevant because
 *     contiguity is in row order.
 *
 * Output is row-for-row identical to
 * `assembleEvents(withRunId(df, cond), ...)` for ANY chunk size
 * (property-tested), so callers trade one config knob for immunity to
 * single-series skew.
 */
object ChunkedRuns {

  def assembleEventsChunked(
      df: DataFrame,
      cond: Column,
      eventType: String,
      minPoints: Long = 1L,
      chunk: String = "30D"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val chunkUs = Steps.parseMicros(chunk)

    val flagged = df
      .withColumn("cond", safeMask(cond))
      .withColumn("chunk_id", floor(unix_micros(col("ts")) / chunkUs.toDouble).cast("long"))
    val w = Window.partitionBy("series_id", "chunk_id").orderBy("ts")
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy("series_id", "chunk_id")
    val prepped = flagged
      .withColumn("rn", row_number().over(w))
      .withColumn("chunk_rows", count(lit(1)).over(wAll))
      .withColumn("run_id",
        sum(when(!col("cond"), 1L).otherwise(0L)).over(wRun))

    val runs = prepped
      .where(col("cond"))
      .groupBy(col("series_id"), col("chunk_id"), col("run_id"))
      .agg(
        min(col("rn")).as("rn_min"),
        max(col("rn")).as("rn_max"),
        max(col("chunk_rows")).as("chunk_rows"),
        min(unix_micros(col("ts"))).as("start_us"),
        max(unix_micros(col("ts"))).as("stop_us"),
        count(lit(1)).as("n_points"),
        coalesce(sum(nanToNull(col("value"))), lit(0.0)).as("total"),
        max(nanToNull(col("value")).isNotNull).as("any_value"))
      .select(col("series_id"), col("chunk_id"),
        col("run_id").cast("long").as("run_id"),
        col("rn_min"), col("rn_max"), col("chunk_rows"),
        col("start_us"), col("stop_us"), col("n_points"), col("total"), col("any_value"))

    // one marker per non-empty chunk, so the fold knows which chunk is
    // "next in row order" even when a chunk has zero flagged rows
    val markers = prepped
      .groupBy(col("series_id"), col("chunk_id"))
      .agg(count(lit(1)).as("chunk_rows"))
      .select(col("series_id"), col("chunk_id"),
        lit(null).cast("long").as("run_id"),
        lit(0L).as("rn_min"), lit(0L).as("rn_max"), col("chunk_rows"),
        lit(0L).as("start_us"), lit(0L).as("stop_us"),
        lit(0L).as("n_points"), lit(0.0).as("total"), lit(false).as("any_value"))

    runs.unionByName(markers)
      .as[ChunkItem]
      .groupByKey(_.series_id)
      .flatMapGroups { (sid, it) =>
        // markers first within a chunk (rn_min 0 < any run's rn_min 1+)
        val items = it.toArray.sortBy(x => (x.chunk_id, x.rn_min))
        val out = Array.newBuilder[Event]
        // open run state
        var open = false
        var oStartUs = 0L; var oStopUs = 0L; var oN = 0L; var oTotal = 0.0
        var oAny = false; var oEndsAtTail = false; var oChunk = 0L
        def tsOf(us: Long): java.sql.Timestamp = TimeMicros.timestamp(us)
        def close(): Unit = {
          if (open && oN >= minPoints) {
            out += Event(sid, eventType, tsOf(oStartUs), tsOf(oStopUs),
              oStopUs - oStartUs, oN, if (oAny) Some(oTotal) else None)
          }
          open = false
        }
        // markers participate only through isNextNonEmptyChunk: a run
        // continues across a chunk boundary iff it ended on its chunk's
        // last row, the next run starts on row 1 of ITS chunk, and no
        // other non-empty chunk lies between (an all-unflagged chunk is
        // non-empty, has a marker, and correctly breaks the run)
        items.foreach { x =>
          if (x.run_id.isDefined) {
            val continues = open && oEndsAtTail && x.rn_min == 1L &&
              isNextNonEmptyChunk(items, oChunk, x.chunk_id)
            if (continues) {
              oStopUs = x.stop_us; oN += x.n_points; oTotal += x.total
              oAny = oAny || x.any_value
            } else {
              close()
              open = true
              oStartUs = x.start_us; oStopUs = x.stop_us; oN = x.n_points
              oTotal = x.total; oAny = x.any_value
            }
            oEndsAtTail = x.rn_max == x.chunk_rows
            oChunk = x.chunk_id
          }
        }
        close()
        out.result().iterator
      }(Encoders.product[Event])
      .toDF()
      .select(col("series_id"), col("event_type"),
        col("start"), col("stop"), col("duration_us"), col("n_points"),
        when(col("total").isNull, lit(null).cast("double")).otherwise(col("total")).as("total"))
  }

  /** True iff `to` is the first non-empty chunk after `from` (markers
    * exist for every non-empty chunk, sorted input). */
  private def isNextNonEmptyChunk(items: Array[ChunkItem], from: Long, to: Long): Boolean =
    !items.exists(x => x.run_id.isEmpty && x.chunk_id > from && x.chunk_id < to)
}
