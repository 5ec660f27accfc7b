package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.dedup.Dedup

/** bucketPairsBlocked (the hot-bucket skew decomposition) must be
  * row-identical to bucketPairs for every block size — including
  * block=1 (pure cross blocks), block larger than any bucket
  * (degenerates to one diagonal block), and buckets overlapping
  * across keys. */
class BlockedPairsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def pairsOf(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("doc_a", "doc_b").as[(Long, Long)].collect().toSet

  test("blocked == narrow across block sizes on multi-bucket keyed data") {
    // bucket A: 7 docs, bucket B: 3 docs (2 shared with A), bucket C: 1 doc
    val keyed = (
      (1L to 7L).map(d => ("A", d)) ++
      Seq(("B", 6L), ("B", 7L), ("B", 99L)) ++
      Seq(("C", 42L))
    ).toDF("bucket", "doc_id")
    val expect = pairsOf(Dedup.bucketPairs(keyed, "bucket"))
    assert(expect.nonEmpty)
    Seq(1, 2, 3, 7, 100).foreach { block =>
      val got = pairsOf(Dedup.bucketPairsBlocked(keyed, block, "bucket"))
      assert(got == expect, s"block=$block")
    }
  }

  test("one hot bucket: all ordered pairs, no row wider than 2*block") {
    val n = 40L
    val keyed = (1L to n).map(d => ("HOT", d)).toDF("bucket", "doc_id")
    val got = pairsOf(Dedup.bucketPairsBlocked(keyed, 5, "bucket"))
    assert(got.size == (n * (n - 1) / 2).toInt)
    assert(got.forall { case (a, b) => a < b })
  }

  test("duplicate doc_id under one key never yields a self-pair") {
    val keyed = Seq(("K", 1L), ("K", 1L), ("K", 2L)).toDF("bucket", "doc_id")
    Seq(1, 2, 10).foreach { block =>
      val got = pairsOf(Dedup.bucketPairsBlocked(keyed, block, "bucket"))
      assert(got == Set((1L, 2L)), s"block=$block")
    }
  }

  test("end-to-end: minhash with blocked expansion equals default") {
    val base = "the quick brown fox jumps over the lazy dog and runs far away today"
    val docs = (0L to 19L).map { i =>
      (i, if (i % 2 == 0) base else s"$base variant $i")
    }.toDF("doc_id", "text")
    val d1 = pairsOf(Dedup.minhashNearDups(docs, threshold = 0.5))
    val d2 = pairsOf(Dedup.minhashNearDups(docs, threshold = 0.5, hotBucketBlock = Some(3)))
    assert(d1 == d2 && d1.nonEmpty)
  }
}
