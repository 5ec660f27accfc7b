package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.{GraftFunctions, JaroWinkler, JaroWinklerSim}

/** [[graft.plans.JaroWinklerLengthBound]]: the O(1) byte-length-ratio
  * guard must be NECESSARY (never rejects a pair the exact kernel
  * keeps — the theorem r >= 5t - 4, hammered on random pairs), the
  * rewrite must fire exactly once (marker idempotence), stay off for
  * t <= 0.8, and leave filter values bit-identical. */
class JaroWinklerBoundSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def jw(a: String, b: String): Double =
    JaroWinkler.similarity(
      org.apache.spark.unsafe.types.UTF8String.fromString(a),
      org.apache.spark.unsafe.types.UTF8String.fromString(b))

  test("theorem: jw >= t implies byte-length ratio >= 5t - 4 (random pairs, multi-byte included)") {
    val rnd = new scala.util.Random(421)
    val alphabets = Seq("abcdef", "abcdefghijklmnop XYZ", "aé∂b c")
    val pairs = (1 to 4000).map { _ =>
      val alpha = alphabets(rnd.nextInt(alphabets.length))
      def mk(n: Int) = (1 to n).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
      val a = mk(1 + rnd.nextInt(18))
      // half the pairs are edits of a (the high-sim region the bound
      // must not clip), half independent
      val b = if (rnd.nextBoolean()) {
        val drop = rnd.nextInt(math.max(1, a.length / 2))
        a.drop(drop) + mk(rnd.nextInt(4))
      } else mk(1 + rnd.nextInt(18))
      (a, b)
    } ++ Seq(("", ""), ("", "abc"), ("martha", "marhta"), ("dwayne", "duane"),
      ("aé", "aé∂"), ("aaaa", "aaaaaaaa"))
    for (t <- Seq(0.801, 0.85, 0.9, 0.94, 0.99, 1.0); (a, b) <- pairs) {
      if (jw(a, b) >= t) {
        val la = a.getBytes("UTF-8").length.toDouble
        val lb = b.getBytes("UTF-8").length.toDouble
        val guard = la >= (5 * t - 4 - 1e-9) * lb && lb >= (5 * t - 4 - 1e-9) * la
        assert(guard, s"guard rejected kept pair ('$a','$b') jw=${jw(a, b)} t=$t")
      }
    }
  }

  test("rewrite fires once with the octet-length guard; values identical; off at t <= 0.8") {
    import org.apache.spark.sql.catalyst.plans.logical.{Filter => LFilter}
    GraftFunctions.register(spark)
    val dir = java.nio.file.Files.createTempDirectory("jwbound").toString
    val names = Seq(
      ("martha", "marhta"), ("dwayne", "duane"), ("dixon", "dicksonx"),
      ("x", "xxxxxxxxxx"), ("same", "same"), ("red widget", "red wdget"),
      (null.asInstanceOf[String], "abc"), ("", ""), ("aé", "aé∂"))
      .toDF("a", "b")
    names.write.mode("overwrite").parquet(s"$dir/rows")
    val rows = spark.read.parquet(s"$dir/rows")
    def filtered(t: Double) =
      rows.where(call_function("graft_jaro_winkler", col("a"), col("b")) >= lit(t))
    // fires: the optimized filter carries the marked call + the guard
    val df = filtered(0.9)
    val conds = df.queryExecution.optimizedPlan.collect {
      case f: LFilter => f.condition
    }
    assert(conds.nonEmpty)
    val markedCalls = conds.map(_.collect {
      case j: JaroWinklerSim if j.bounded => j }.size).sum
    val rawCalls = conds.map(_.collect {
      case j: JaroWinklerSim if !j.bounded => j }.size).sum
    assert(markedCalls == 1 && rawCalls == 0,
      s"expected exactly one marked call (idempotence): $conds")
    assert(conds.head.toString.toLowerCase.contains("octet_length"), conds.head)
    // values: exactly the pairs the raw kernel keeps
    val kept = df.collect().map(r => (r.getString(0), r.getString(1))).toSet
    val expected = names.collect()
      .map(r => (r.getString(0), r.getString(1)))
      .filter { case (a, b) => a != null && b != null && jw(a, b) >= 0.9 }.toSet
    assert(kept == expected)
    // below the useful range: untouched
    val low = filtered(0.75)
    val lowMarked = low.queryExecution.optimizedPlan.collect {
      case f: LFilter => f.condition.collect {
        case j: JaroWinklerSim if j.bounded => j }.size
    }.sum
    assert(lowMarked == 0, "rewrite fired at t <= 0.8 where the bound is vacuous")
  }

  test("jw1's shipped plan carries the guard (minSim = 0.94 -> ratio 0.7)") {
    val ddir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$ddir/part.parquet").exists())
    GraftFunctions.register(spark)
    val plan = graft.queries.Relational.jw1NameSimilarity(spark, ddir)
      .queryExecution.optimizedPlan.toString.toLowerCase
    assert(plan.contains("octet_length"),
      "jw1's pair filter did not pick up the length-ratio guard:\n" + plan.take(1500))
  }
}
