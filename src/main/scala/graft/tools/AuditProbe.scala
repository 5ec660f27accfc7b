package graft.tools

import org.apache.spark.sql.SparkSession

/** The [[PlanAudit]] sweep over every driver-contract key with ALL
  * size gates forced OPEN (the at-scale shipped shape — barriers
  * active, range-rank paths live): any duplicate reuse-defeated
  * subtree is a shipped re-computation. The baseline is ZERO `warn`
  * findings; [[graft.PlanAuditSweepSpec]] enforces that baseline in
  * `sbt test` (VERDICT r14 item 2), and the `main` below keeps the
  * standalone dev loop.
  *
  * Two passes: pass 1 constructs every query once, which makes each
  * size gate REGISTER its conf key in
  * [[graft.Materialize.registeredGateKeys]] (no hand-maintained key
  * list — a new gated operator is swept automatically); pass 2 sets
  * every registered key to 0 and audits the resulting plans. A pass-1
  * construction failure leaves that key's gate UNREGISTERED — pass 2
  * would audit it with the gate still closed — so pass-1 errors count
  * as failures, never as clean (ADVICE r13/r14).
  *
  * Usage: sbt "runMain graft.tools.AuditProbe [sfDir]" */
object AuditProbe {

  final case class Sweep(
      pass1Errors: Map[String, String],
      pass2Errors: Map[String, String],
      findings: Map[String, Seq[PlanAudit.Finding]],
      gateKeys: Seq[String]) {
    def warnFindings: Map[String, Seq[PlanAudit.Finding]] =
      findings.map { case (k, fs) => k -> fs.filter(_.severity == "warn") }
        .filter(_._2.nonEmpty)
    def failing: Int = warnFindings.size + pass1Errors.size + pass2Errors.size
  }

  /** Run the two-pass sweep. Gate confs are restored afterwards, so
    * this is safe on a shared session. */
  def sweep(spark: SparkSession, dir: String): Sweep = {
    val keys = graft.SparkEntry.queries.toSeq.sortBy(_._1)
    val pass1Errors = keys.flatMap { case (name, q) =>
      try { q(spark, dir); None } catch {
        case e: Throwable =>
          Some(name -> s"${e.getClass.getSimpleName} ${String.valueOf(e.getMessage).take(120)}")
      }
    }.toMap
    import scala.jdk.CollectionConverters._
    val gateKeys = graft.Materialize.registeredGateKeys.asScala.toSeq.sorted
    val previous = gateKeys.map(k => k -> spark.conf.getOption(k))
    gateKeys.foreach(k => spark.conf.set(k, "0"))
    try {
      var pass2Errors = Map.empty[String, String]
      var findings = Map.empty[String, Seq[PlanAudit.Finding]]
      keys.foreach { case (name, q) =>
        try {
          val fs = PlanAudit.audit(q(spark, dir))
          if (fs.nonEmpty) findings += name -> fs
        } catch {
          case e: Throwable => pass2Errors += name ->
            s"${e.getClass.getSimpleName} ${String.valueOf(e.getMessage).take(80)}"
        }
      }
      Sweep(pass1Errors, pass2Errors, findings, gateKeys)
    } finally previous.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  def main(args: Array[String]): Unit = {
    val builder = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
    graft.sources.Tables.requiredConfs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val s = sweep(spark, dir)
    s.pass1Errors.toSeq.sortBy(_._1).foreach { case (n, e) => println(s"PASS1 $n: ERR $e") }
    println(s"GATES: ${s.gateKeys.mkString(", ")}")
    s.findings.toSeq.sortBy(_._1).foreach { case (name, fs) =>
      println(s"KEY $name: ${fs.size}")
      fs.foreach(f => println("  " + f.toString.take(240)))
    }
    s.pass2Errors.toSeq.sortBy(_._1).foreach { case (n, e) => println(s"KEY $n: ERR $e") }
    // pass-1/pass-2 failures fold into the headline count (ADVICE r14):
    // a key whose gate never registered was audited gate-CLOSED, so a
    // "clean" total that hides one is a lie a last-line scan would miss
    val errs = s.pass1Errors.size + s.pass2Errors.size
    println(s"TOTAL keys with warnings: ${s.findings.size + errs} of " +
      s"${graft.SparkEntry.queries.size}" +
      (if (errs > 0) s" (including $errs construction/audit failures — " +
        "unregistered gates audit gate-closed)" else ""))
    spark.stop()
  }
}
