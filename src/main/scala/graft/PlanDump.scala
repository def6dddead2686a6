package graft

/** Dev tool: dump `.explain("formatted")` for named SparkEntry queries
  * to `<outDir>/<query>_<tag>.txt` — the optimization rounds' plan
  * evidence (plans/r18, _before and _after files). Usage:
  *
  *   runMain graft.PlanDump <outDir> <tag> [query ...]
  *
  * With no query names, dumps every registered query. Reads the data
  * dir from SPARK_GRAFT_SF_DIR (default sf0.1) so the dumped plans are
  * the bench's plans (same fixture, same AQE confs as Bench).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanDump <outDir> <tag> [query ...]")
    val outDir = java.nio.file.Paths.get(args(0))
    val tag = args(1)
    val only = args.drop(2).toSet
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "64m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(outDir)
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.isEmpty || only.contains(n) }
      .foreach { case (name, fn) =>
        try {
          val df = fn(spark, sfDir)
          val txt = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          java.nio.file.Files.writeString(
            outDir.resolve(s"${name}_$tag.txt"), txt)
          println(s"[plandump] $name -> ${name}_$tag.txt (${txt.length} chars)")
        } catch {
          case e: Throwable =>
            println(s"[plandump] ERROR $name: ${e.getMessage}")
        }
        spark.catalog.clearCache()
      }
    println("PLANDUMP DONE")
    spark.stop()
  }
}
