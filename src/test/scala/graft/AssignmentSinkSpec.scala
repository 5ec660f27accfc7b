package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.dedup.Dedup
import graft.sources.AssignmentSink

/** The MERGE-shaped assignment sink: incrementalClustersDelta →
  * dynamic-partition-overwrite upsert. The contract under test is
  * twofold — the stored table equals the from-scratch recluster, and
  * untouched shards' files are byte-identical (never rewritten). */
class AssignmentSinkSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def fileState(dir: String): Map[String, Long] = {
    val root = java.nio.file.Paths.get(dir)
    val out = scala.collection.mutable.Map[String, Long]()
    java.nio.file.Files.walk(root).forEach { p =>
      val s = p.toString
      if (s.endsWith(".parquet"))
        out(s) = java.nio.file.Files.getLastModifiedTime(p).toMillis
    }
    out.toMap
  }

  test("delta upsert: table equals from-scratch recluster; untouched shards untouched") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sink").toString + "/assign"
    // batch 1: docs 0-7, two components {0,1,2} and {4,5}
    val docs1 = (0L to 7L).toDF("doc_id")
    val pairs1 = Seq((0L, 1L), (1L, 2L), (4L, 5L)).toDF("doc_a", "doc_b")
    val prior = Dedup.dedupClusters(docs1, pairs1)
    // shards = 8 → doc 3 (a singleton the batch never touches) lives
    // alone in shard 3
    AssignmentSink.init(dir, prior, shards = 8)
    val before = fileState(dir)
    assert(before.nonEmpty)

    // batch 2: doc 8 bridges the two components; doc 9 is new+isolated
    val docs2 = Seq(8L, 9L).toDF("doc_id")
    val pairs2 = Seq((2L, 8L), (8L, 4L)).toDF("doc_a", "doc_b")
    val delta = Dedup.incrementalClustersDelta(prior, docs2, pairs2)
    AssignmentSink.upsertDelta(dir, delta, shards = 8)

    // stored table == from-scratch recluster of everything
    val stored = AssignmentSink.read(spark, dir)
      .orderBy("doc_id").as[(Long, Long, Long, Boolean)].collect().toSeq
    val scratch = Dedup.dedupClusters(
        docs1.unionByName(docs2), pairs1.unionByName(pairs2))
      .orderBy("doc_id").as[(Long, Long, Long, Boolean)].collect().toSeq
    assert(stored == scratch)

    // doc 3's shard was untouched by the delta: its files must be the
    // SAME files (no rewrite), while touched shards have new files
    val after = fileState(dir)
    val shard3Before = before.keys.filter(_.contains("shard=3"))
    assert(shard3Before.nonEmpty)
    shard3Before.foreach { f =>
      assert(after.contains(f) && after(f) == before(f), s"untouched shard rewritten: $f")
    }
    // at least one touched shard gained a new file
    val newFiles = after.keySet -- before.keySet
    assert(newFiles.nonEmpty, "no shard was rewritten at all")

    // idempotence: re-applying the same delta leaves the table equal
    AssignmentSink.upsertDelta(dir, delta, shards = 8)
    val again = AssignmentSink.read(spark, dir)
      .orderBy("doc_id").as[(Long, Long, Long, Boolean)].collect().toSeq
    assert(again == scratch)

    // an empty delta (e.g. a batch with no changed docs) is a no-op,
    // not a crash on the zero-file staging read-back
    val emptyState = fileState(dir)
    AssignmentSink.upsertDelta(dir, delta.limit(0), shards = 8)
    assert(fileState(dir) == emptyState)
    val unchanged = AssignmentSink.read(spark, dir)
      .orderBy("doc_id").as[(Long, Long, Long, Boolean)].collect().toSeq
    assert(unchanged == scratch)
  }
}
