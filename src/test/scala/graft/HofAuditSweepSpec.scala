package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The [[graft.tools.HofAudit]] sweep as a BUILD GATE: every
  * `SparkEntry.queries` key's optimized plan is scanned for lambda
  * bodies that recompute a loop-invariant expensive kernel per array
  * element — the class that made `wordShingles` O(tokens²) until the
  * round-15 zip rewrite (PLANS.md). Baseline: the only accepted
  * finding is t9's chars-in-counts (O(len·σ) character histogram by
  * design, measured fine); anything else fails the build.
  *
  * Known blind spot, shared with PlanAuditSweepSpec: eagerly
  * materialized construction stages are LogicalRDD leaves in the
  * final plan, so their internals are not swept — operators with
  * eager barriers (chunkDedup's occurrence frame) were audited by
  * hand and fixed with the ck1 hoist idiom (tokens projected below
  * the Generate so lambdas slice an attribute). */
class HofAuditSweepSpec extends AnyFunSuite with SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  /** key -> substring of the accepted finding's subtree */
  private val accepted: Map[String, String] = Map(
    "t9_char_stats" -> "transform(sequence(1,")

  test("no lambda recomputes an expensive loop-invariant kernel, full key surface") {
    assume(new java.io.File(dir).isDirectory, s"driver testdata absent at $dir")
    var errors = Map.empty[String, String]
    var unexpected = Map.empty[String, Seq[graft.tools.HofAudit.Finding]]
    graft.SparkEntry.queries.foreach { case (name, q) =>
      try {
        val fs = graft.tools.HofAudit.audit(q(spark, dir))
        val bad = fs.filterNot(f =>
          accepted.get(name).exists(sub => f.subtree.contains(sub)))
        if (bad.nonEmpty) unexpected += name -> bad
      } catch {
        case e: Throwable =>
          errors += name -> s"${e.getClass.getSimpleName} ${String.valueOf(e.getMessage).take(120)}"
      }
    }
    assert(errors.isEmpty, s"construction failures: $errors")
    assert(unexpected.isEmpty, unexpected.map { case (k, fs) =>
      s"$k:\n  ${fs.mkString("\n  ")}"
    }.mkString("\n"))
  }

  test("the detector actually fires: the pre-fix shingle shape is flagged") {
    // non-foldable text column: a literal frame would constant-fold
    // the whole expression away before the audit sees it
    val d = spark.range(1).select(
      concat(lit("a b c d e f "), col("id").cast("string")).as("text"))
    val toks = split(trim(col("text")), "\\s+")
    val oldShingles = transform(sequence(lit(1), size(toks) - 2),
      i => concat_ws(" ", slice(toks, i, lit(3))))
    val findings = graft.tools.HofAudit.audit(d.select(oldShingles.as("sh")))
    assert(findings.nonEmpty, "old wordShingles shape must be flagged")
    assert(findings.head.subtree.contains("split"))
    // and the shipped zip form is clean
    val clean = graft.tools.HofAudit.audit(
      d.select(graft.dedup.Dedup.wordShingles(col("text")).as("sh")))
    assert(clean.isEmpty, s"shipped wordShingles flagged: $clean")
  }

  test("nested lambdas: inner-scope kernels are not false positives, invariant inner HOFs still are") {
    import org.apache.spark.sql.functions._
    val d = spark.range(1).select(
      array(array(concat(lit("x"), col("id").cast("string")))).as("aa"),
      array(concat(lit("y"), col("id").cast("string"))).as("c"))
    // ADVICE r15 false positive: md5(y) is bound by the INNER lambda —
    // legitimate nested-lambda code must not trip the build gate
    val legit = d.select(
      transform(col("aa"), x => transform(x, y => md5(y))).as("o"))
    assert(graft.tools.HofAudit.audit(legit).isEmpty,
      s"nested inner-bound kernel flagged: ${graft.tools.HofAudit.audit(legit)}")
    // true positive kept: the WHOLE inner HOF consumes none of the
    // outer lambda's variables — recomputed per outer element
    val trap = d.select(
      transform(col("aa"), x => transform(col("c"), y => concat(y, element_at(x, 1)))
        ).as("o"),
      transform(col("aa"), x => element_at(transform(col("c"), y => md5(y)), 1)).as("p"))
    val fs = graft.tools.HofAudit.audit(trap)
    assert(fs.exists(_.subtree.contains("md5")),
      s"loop-invariant nested HOF not flagged: $fs")
  }
}
