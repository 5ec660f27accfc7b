package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only profiling harness (not part of the driver contract): run
  * selected SparkEntry queries repeatedly in one session to separate
  * fixed per-query overhead (jobs, shuffles, checkpoints) from
  * data-proportional cost. Usage:
  *   sbt "runMain graft.tools.Profile <sfDir> <iters> [key ...]"
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val iters = if (args.length > 1) args(1).toInt else 3
    val keys = if (args.length > 2) args.drop(2).toSeq else graft.SparkEntry.queries.keys.toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", "4m")
    graft.sources.Tables.requiredConfs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def clearPersisted(): Unit =
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    keys.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      val times = (1 to iters).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        clearPersisted()
        dt
      }
      println(f"PROFILE $name%-28s ${times.map(t => f"$t%.2f").mkString(" ")}")
    }
    spark.stop()
  }
}
