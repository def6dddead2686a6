package graft
/** Scratch: PlanLint over every SparkEntry query (dev tool run). */
object LintAll {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val findings = graft.plans.PlanLint.lint(fn(spark, sfDir))
        findings.foreach(f => println(s"[$name] ${f.rule}: ${f.detail.take(120)}"))
      } catch { case e: Throwable => println(s"[$name] LINT-ERROR ${e.getMessage}") }
      spark.catalog.clearCache()
    }
    println("LINT DONE")
    spark.stop()
  }
}
