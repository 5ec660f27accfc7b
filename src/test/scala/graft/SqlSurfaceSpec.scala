package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.FindPeaks

class SqlSurfaceSpec extends AnyFunSuite with SparkTestBase {

  test("detectors and functions reachable from spark.sql") {
    val vals = Seq(1.0, 2.0, 700.0, 700.0, 3.0, 4.0, 5.0, 5.0, 5.0, 5.0, 5.0, 5.0)
    SqlSurface.register(dailySeries(vals))
    assert(spark.sql("SELECT count(*) FROM graft_series").head.getLong(0) == 12L)
    assert(spark.sql(
      "SELECT count(*) FROM graft_extreme_value_events WHERE n_points = 2").head.getLong(0) == 1L)
    assert(spark.sql("SELECT count(*) FROM graft_flat_line_events").head.getLong(0) == 1L)
    // joins across detector views work
    assert(spark.sql(
      """SELECT count(*) FROM graft_series s
        |JOIN graft_extreme_value_events e
        |ON s.series_id = e.series_id AND s.ts BETWEEN e.start AND e.stop""".stripMargin)
      .head.getLong(0) == 2L)
    // native expression available in SQL
    val d = spark.sql("SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .head.getDouble(0)
    assert(d == 11.0)
  }

  test("corpus views: stats/splits/dedup reachable and joinable from SQL") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog and runs far away"
    val docs = Seq(
      // doc 1: exact dup after normalization (punct only) AND a
      // minhash near-dup (shingles are case-sensitive by design, so
      // the text must share tokens, not just normalized form)
      (0L, base), (1L, base + "!"),
      (2L, base + " extra tail tokens here"),
      (3L, "something completely different with many unrelated words inside")
    ).toDF("doc_id", "text")
    SqlSurface.registerCorpus(docs)
    assert(spark.sql("SELECT count(*) FROM graft_doc_stats WHERE n_tokens > 0")
      .head.getLong(0) == 4L)
    // exact dedup found the case/punct-normalized duplicate
    assert(spark.sql(
      "SELECT count(*) FROM graft_exact_dedup WHERE is_dup").head.getLong(0) == 1L)
    // cluster view agrees with exact dedup through a SQL join
    assert(spark.sql(
      """SELECT count(*) FROM graft_exact_dedup e
        |JOIN graft_dedup_clusters c ON e.doc_id = c.doc_id
        |WHERE e.is_dup AND c.cluster_id <> c.doc_id""".stripMargin)
      .head.getLong(0) == 1L)
    // every doc has exactly one split tag
    assert(spark.sql(
      """SELECT count(*) FROM graft_doc_splits
        |WHERE split IN ('train','validation','test')""".stripMargin)
      .head.getLong(0) == 4L)
    // pii view: clean corpus scrubs to itself (digest = md5 of text
    // unchanged is not asserted — just that the view answers in SQL)
    assert(spark.sql(
      "SELECT count(*) FROM graft_pii_scrub WHERE n_emails = 0 AND n_addresses = 0")
      .head.getLong(0) == 4L)
  }

  test("find_peaks clamp: near-head peak paints from index 0, no wrap") {
    // peak at index 1 with width > 1: int(p - w) < 0 must clamp to 0
    // (the reference's iloc would wrap to the series tail - SURVEY §7.1/L4)
    val x = Array(0.0, 500.0, 0.0, 0.0, 0.0, 0.0)
    val mask = FindPeaks.spikeValleyMask(x, FindPeaks.Params(prominence = Some(100.0)))
    assert(mask(0) && mask(1) && mask(2))
    assert(!mask(4) && !mask(5)) // tail untouched: no negative-index wrap
  }
}
