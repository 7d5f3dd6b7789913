package graft

/** Dev tool: write `.explain("formatted")` output for declared queries to
  * one file per query, under the SAME session config and prepared (bucketed)
  * table layout the bench runs with — so plan evidence matches what Bench
  * times. Usage: runMain graft.PlanDump <sfDir> <outDir> [qprefix,...]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outDir = if (args.length > 1) args(1) else "plans/r08"
    val only = if (args.length > 2) Some(args(2).split(",").toSet) else None
    val suffix = if (args.length > 3) args(3) else "before"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (!sys.env.contains("SPARK_GRAFT_NO_BUCKET")) SparkEntry.prepare(spark, sfDir)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (only.forall(_.exists(name.startsWith))) {
        try {
          val plan = fn(spark, sfDir).queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          java.nio.file.Files.write(
            java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"),
            plan.getBytes("UTF-8"))
          System.err.println(s"[plandump] wrote $name")
        } catch {
          case e: Throwable =>
            System.err.println(s"[plandump] $name FAILED: ${e.getMessage}")
        }
      }
    }
    spark.stop()
  }
}
