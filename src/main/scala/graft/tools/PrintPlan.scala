package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: print the executed (post-AQE) physical plan of named
  * driver-contract queries at a given SF — the evidence PLANS.md
  * records. Usage: sbt "runMain graft.tools.PrintPlan <sfDir> <key ...>" */
object PrintPlan {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    graft.sources.Tables.requiredConfs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // intermediate stages whose plans the final key hides behind a
    // storage barrier — inspectable here under a pseudo-key
    import org.apache.spark.sql.functions.col
    val stages: Map[String, (SparkSession, String) => org.apache.spark.sql.DataFrame] = Map(
      "s5_pruned_stage" -> ((s, dir) => {
        val e = graft.sources.Tables.read(s, dir, "embeddings")
        graft.similarity.Similarity.pqEncodeAdc(
          graft.similarity.Similarity.ivfAdcPruned(
            e, e.where(col("vec_id") === 17),
            e.where(col("vec_id") % 25 === 0), nProbe = 3),
          e.where(col("vec_id") < 16), e.where(col("vec_id") === 17))
      }))
    args.drop(1).foreach { name =>
      val df = stages.getOrElse(name, graft.SparkEntry.queries(name))(spark, sfDir)
      df.count() // finalize AQE
      println(s"=== $name ===")
      println(df.queryExecution.executedPlan.toString.linesIterator
        .map(_.take(110)).take(60).mkString("\n"))
    }
    spark.stop()
  }
}
