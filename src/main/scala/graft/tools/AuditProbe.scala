package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only sweep: run [[PlanAudit]] over every driver-contract key
  * with ALL size gates forced OPEN (the at-scale shipped shape —
  * barriers active, range-rank path live) and print any duplicate
  * reuse-defeated subtrees. The round-13 baseline is ZERO warnings;
  * a new key that prints one ships a re-computation.
  *
  * Usage: sbt "runMain graft.tools.AuditProbe [sfDir]" */
object AuditProbe {
  /** Every size-gate conf key in the engine — forced open so the
    * audit sees the plans a 100 TB deployment would run. */
  val GateConfKeys: Seq[String] = Seq(
    "spark.graft.activeUsers.barrierMinBytes",
    "spark.graft.funnel.barrierMinBytes",
    "spark.graft.dc4.barrierMinBytes",
    "spark.graft.ov1.barrierMinBytes",
    "spark.graft.rangerank.minBytes",
    "spark.graft.vocab.barrierMinBytes",
    "spark.graft.keyskew.barrierMinBytes",
    "spark.graft.basket.barrierMinBytes",
    "spark.graft.series.barrierMinBytes",
    "spark.graft.lb1.barrierMinBytes",
    "spark.graft.pk2.barrierMinBytes")

  def main(args: Array[String]): Unit = {
    val builder = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
    graft.sources.Tables.requiredConfs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    GateConfKeys.foreach(k => spark.conf.set(k, "0"))
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
    println(s"TOTAL keys with warnings: $warned of ${graft.SparkEntry.queries.size}")
    spark.stop()
  }
}
