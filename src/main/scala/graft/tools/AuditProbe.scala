package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only sweep: run [[PlanAudit]] over every driver-contract key
  * with ALL size gates forced OPEN (the at-scale shipped shape —
  * barriers active, range-rank path live) and print any duplicate
  * reuse-defeated subtrees. The round-13 baseline is ZERO warnings;
  * a new key that prints one ships a re-computation.
  *
  * Two passes: pass 1 constructs every query once, which makes each
  * size gate REGISTER its conf key in
  * [[graft.Materialize.registeredGateKeys]] (no hand-maintained key
  * list — a new gated operator is swept automatically); pass 2 sets
  * every registered key to 0 and audits the resulting plans.
  *
  * Usage: sbt "runMain graft.tools.AuditProbe [sfDir]" */
object AuditProbe {
  def main(args: Array[String]): Unit = {
    val builder = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
    graft.sources.Tables.requiredConfs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    // pass 1: let every gate register its conf key. A construction
    // failure here leaves that key's gate UNREGISTERED, so pass 2
    // would audit it with the gate still closed — print it loudly
    // rather than silently reporting the key clean (ADVICE r13)
    var pass1Errs = 0
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, q) =>
      try q(spark, dir) catch {
        case e: Throwable =>
          pass1Errs += 1
          println(s"PASS1 $name: ERR ${e.getClass.getSimpleName} " +
            String.valueOf(e.getMessage).take(120))
      }
    }
    import scala.jdk.CollectionConverters._
    val gateKeys = graft.Materialize.registeredGateKeys.asScala.toSeq.sorted
    println(s"GATES: ${gateKeys.mkString(", ")}")
    gateKeys.foreach(k => spark.conf.set(k, "0"))
    // pass 2: audit the at-scale plans
    var warned = 0
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, q) =>
      try {
        val fs = PlanAudit.audit(q(spark, dir))
        if (fs.nonEmpty) { warned += 1
          println(s"KEY $name: ${fs.size}")
          fs.foreach(f => println("  " + f.toString.take(240)))
        }
      } catch {
        case e: Throwable =>
          println(s"KEY $name: ERR ${e.getClass.getSimpleName} " +
            String.valueOf(e.getMessage).take(80))
      }
    }
    // pass-1 failures fold into the headline count (ADVICE r14): a key
    // whose gate never registered was audited with the gate CLOSED, so
    // a "clean" total that hides one is a lie a last-line scan would miss
    println(s"TOTAL keys with warnings: ${warned + pass1Errs} of " +
      s"${graft.SparkEntry.queries.size}" +
      (if (pass1Errs > 0) s" (including $pass1Errs pass-1 construction " +
        "failures — those keys' gates never registered, their audit ran gate-closed)"
       else ""))
    spark.stop()
  }
}
