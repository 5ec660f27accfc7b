package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.SpikeValleyEvents
import graft.sources.IO
import java.nio.file.Files

class IOSpec extends AnyFunSuite with SparkTestBase {

  test("readCsvSeries: flv.csv into the canonical frame") {
    val path = getClass.getResource("/flv.csv").getPath
    val df = IO.readCsvSeries(spark, path, valueCol = "SNOWDEPTH", seriesId = "FLV")
    assert(df.columns.toSeq == Seq("series_id", "ts", "value"))
    assert(df.count() == 240)
    // same frame drives the golden detector
    assert(SpikeValleyEvents().detect(df).count() == 11)
  }

  test("event sink round-trip: parquet partitioned by event_type") {
    val dir = Files.createTempDirectory("graft_io").toString
    val path = getClass.getResource("/flv.csv").getPath
    val ts = IO.readCsvSeries(spark, path, "SNOWDEPTH", "FLV")
    val events = SpikeValleyEvents().detect(ts)
    IO.writeEvents(events, s"$dir/events")
    val back = spark.read.parquet(s"$dir/events")
    assert(back.count() == 11)
    // partition pruning path exists: event_type is a partition column
    assert(back.where(org.apache.spark.sql.functions.col("event_type") === "spike_valley")
      .count() == 11)
    val expected = collectEvents(events)
    val got = collectEvents(back.select(
      "series_id", "event_type", "start", "stop", "duration_us", "n_points", "total"))
    assert(got == expected)
  }

  test("writeEventsCsv: single-file convenience sink writes small frames, refuses big ones loudly") {
    val dir = Files.createTempDirectory("graft_io_csv").toString
    val path = getClass.getResource("/flv.csv").getPath
    val events = SpikeValleyEvents().detect(IO.readCsvSeries(spark, path, "SNOWDEPTH", "FLV"))
    IO.writeEventsCsv(events, s"$dir/ev_csv")
    val back = spark.read.option("header", "true").csv(s"$dir/ev_csv")
    assert(back.count() == 11)
    // the coalesce(1) sink must refuse a frame above its row bound
    // instead of funneling it through one task
    val err = intercept[IllegalArgumentException] {
      IO.writeEventsCsv(spark.range(100).toDF("id"), s"$dir/too_big", maxCsvRows = 10L)
    }
    assert(err.getMessage.contains("maxCsvRows") &&
      err.getMessage.contains("writeEvents"))
  }

  test("jsonl corpus round-trip with explicit schema; corrupt lines survive as nulls") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_jsonl").toString
    val docs = Seq(
      (1L, "first document text", "en", "web"),
      (2L, "zweites dokument", "de", "books")
    ).toDF("doc_id", "text", "lang", "source")
    IO.writeJsonlDocs(docs, s"$dir/docs")
    val back = IO.readJsonlDocs(spark, s"$dir/docs")
    assert(back.columns.toSeq == Seq("doc_id", "text", "lang", "source"))
    assert(back.orderBy("doc_id").as[(Long, String, String, String)].collect().toSeq ==
      Seq((1L, "first document text", "en", "web"), (2L, "zweites dokument", "de", "books")))
    // a corrupt line yields nulls (PERMISSIVE), not a failed job
    Files.writeString(java.nio.file.Paths.get(s"$dir/bad.jsonl"),
      """{"doc_id": 3, "text": "ok line"}
        |{not valid json at all""".stripMargin)
    val mixed = IO.readJsonlDocs(spark, s"$dir/bad.jsonl")
    assert(mixed.count() == 2)
    assert(mixed.where($"text".isNotNull).count() == 1)
  }

  test("sorted shards: disjoint ascending key ranges, sorted within each file") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("graft_shards").toString
    val docs = graft.sources.Tables.read(spark, "/root/testdata/sf0.001", "documents")
    val manifest = IO.writeSortedShards(docs, "doc_id", s"$dir/shards", shards = 4)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(manifest.size == 4)
    assert(manifest.map(_._4).sum == docs.count())
    // disjoint and ascending: shard i's max < shard i+1's min
    manifest.sliding(2).foreach {
      case Seq((_, _, max1, _), (_, min2, _, _)) =>
        assert(max1 < min2, s"overlapping shards: $max1 >= $min2")
      case _ => ()
    }
    // rows are sorted within each file (spot-check the first shard)
    val firstFile = manifest.head._1
    val keys = spark.read.parquet(firstFile).select("doc_id").as[Long].collect().toSeq
    assert(keys == keys.sorted, "shard not internally sorted")
    // range partitioning balances shard sizes (sampled boundaries)
    val sizes = manifest.map(_._4)
    assert(sizes.min.toDouble / sizes.max > 0.5, s"shards badly skewed: $sizes")
  }

  test("writeZOrdered: every file narrow in BOTH dims — either-column stats pruning works") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("zord").toString
    // full 64x64 grid; 16 z-range shards => each file is one z-span
    // covering a bounded tile in x AND y
    val grid = spark.range(64L * 64L).select(
      (col("id") / 64L).cast("long").as("x"), (col("id") % 64L).as("y"))
    val manifest = IO.writeZOrdered(grid, "x", "y", s"$dir/z", shards = 16)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(manifest.size == 16)
    assert(manifest.map(_._2).sum == 64L * 64L)
    // the z-curve tile property: a contiguous z range of 4096/16=256
    // codes spans at most a 16x16 tile in each dimension (vs 64 for a
    // single-column sort's non-clustered dim). Range-partition
    // boundaries are sampled, not exact powers of two — allow one
    // extra tile of slack and assert BOTH dims stay narrow.
    manifest.foreach { case (f, _, xmin, xmax, ymin, ymax) =>
      assert(xmax - xmin <= 32 && ymax - ymin <= 32,
        s"file $f spans x[$xmin,$xmax] y[$ymin,$ymax] — not z-clustered")
    }
    // contrast: a single-column sort leaves the OTHER dim full-width
    val single = IO.writeSortedShards(
      grid.withColumnRenamed("x", "doc_id"), "doc_id", s"$dir/s", shards = 16)
    assert(single.count() == 16) // sanity; its y-width would be 64 per file
  }
}
