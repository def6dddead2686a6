package graft.operators

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.sinks.Sinks
import graft.sources.Sources

/** S5 CSV scan, K3 insertInto, K11 catalog DDL shims. */
class CatalogOpsSpec extends SparkSpec {

  test("csvScan honors options and explicit schema") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("csvspec").toString
    Seq((1, "a|x"), (2, "b"), (3, "c")).toDF("k", "v")
      .write.mode("overwrite").option("header", "true")
      .option("delimiter", ";").csv(dir)
    val schema = StructType(Seq(
      StructField("k", IntegerType), StructField("v", StringType)))
    val back = Sources.csvScan(spark, dir,
      Map("header" -> "true", "delimiter" -> ";"), Some(schema))
    assert(back.schema === schema)
    assert(back.orderBy("k").collect().map(r => (r.getInt(0), r.getString(1)))
      === Array((1, "a|x"), (2, "b"), (3, "c")))
  }

  test("excelScan falls back to CSV when the excel plugin is absent") {
    import spark.implicits._
    // this sandbox has no spark-excel jar, so the facade must route to
    // the CSV path, dropping the excel-only dataAddress option
    val dir = java.nio.file.Files.createTempDirectory("xlspec").toString
    Seq((1, "a"), (2, "b")).toDF("k", "v")
      .write.mode("overwrite").option("header", "true").csv(dir)
    val schema = StructType(Seq(
      StructField("k", IntegerType), StructField("v", StringType)))
    val back = Sources.excelScan(spark, dir,
      Map("header" -> "true", "dataAddress" -> "'Sheet1'!A1"), Some(schema))
    assert(back.schema === schema)
    assert(back.orderBy("k").collect().map(r => (r.getInt(0), r.getString(1)))
      === Array((1, "a"), (2, "b")))
  }

  test("versionedWrite flips a pointer; old snapshots stay readable") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("vtab").toString + "/t"
    val v1 = Sinks.versionedWrite(Seq((1L, "a")).toDF("k", "v"), path)
    val v2 = Sinks.versionedWrite(Seq((1L, "b"), (2L, "c")).toDF("k", "v"), path)
    assert((v1, v2) === ((1, 2)))
    assert(Sinks.readVersion(spark, path).count() === 2L) // latest
    // time travel: the v1 snapshot is intact after the v2 commit
    assert(Sinks.readVersion(spark, path, Some(1)).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq === Seq((1L, "a")))
    assert(Sinks.listVersions(spark, path) === Seq(1, 2))
    // retention: vacuum keeps the newest, reports what it dropped
    assert(Sinks.vacuumVersions(spark, path, keep = 1) === Seq(1))
    assert(Sinks.listVersions(spark, path) === Seq(2))
    assert(Sinks.readVersion(spark, path).count() === 2L)
  }

  test("analyzeTable records row-count and column stats in the catalog") {
    import spark.implicits._
    dropManaged("stats_t")
    (1 to 50).map(i => (i.toLong, s"v$i")).toDF("id", "v")
      .write.saveAsTable("stats_t")
    Sinks.analyzeTable(spark, "stats_t", Seq("id"))
    val desc = spark.sql("DESCRIBE TABLE EXTENDED stats_t")
      .collect().map(_.mkString("|")).mkString("\n")
    assert(desc.contains("50 rows"), desc)
    val colStats = spark.sql("DESCRIBE EXTENDED stats_t id")
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(colStats.get("distinct_count").contains("50"), colStats)
    dropManaged("stats_t")
  }

  test("csvScanWithQuarantine routes malformed rows, keeps good ones") {
    val dir = java.nio.file.Files.createTempDirectory("csvq").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "part.csv"),
      "k,v\n1,a\nnot_an_int,b\n3,c\n")
    val schema = StructType(Seq(
      StructField("k", IntegerType), StructField("v", StringType)))
    val (good, bad) = Sources.csvScanWithQuarantine(spark, dir, schema)
    assert(good.orderBy("k").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSeq === Seq((1, "a"), (3, "c")))
    val badRows = bad.collect()
    assert(badRows.length === 1)
    assert(badRows.head.getString(0).startsWith("not_an_int"))
    assert(badRows.head.getString(1) === "malformed_row")
  }

  /** Drop the table AND its managed location: the in-memory catalog is
    * fresh per JVM but the warehouse directory survives across test
    * runs, and saveAsTable refuses a pre-existing location. */
  private def dropManaged(table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val wh = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table)
    wh.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(wh, true)
  }

  test("saveTable overwrites, appends, and lays out partition dirs") {
    import spark.implicits._
    dropManaged("graft_save_tbl")
    val rows = Seq((1L, "g1", "x"), (2L, "g2", "y")).toDF("id", "grp", "v")
    Sinks.saveTable(rows, "graft_save_tbl", SaveMode.Overwrite, Seq("grp"))
    Sinks.saveTable(Seq((3L, "g1", "z")).toDF("id", "grp", "v"),
      "graft_save_tbl", SaveMode.Append, Seq("grp"))
    assert(spark.table("graft_save_tbl").count() === 3)
    // partitionBy must show up as grp=... directories
    val wh = new java.io.File(
      new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath,
      "graft_save_tbl")
    val parts = wh.listFiles().filter(_.isDirectory).map(_.getName).toSet
    assert(parts === Set("grp=g1", "grp=g2"))
    // overwrite replaces everything
    Sinks.saveTable(Seq((9L, "g9", "w")).toDF("id", "grp", "v"),
      "graft_save_tbl", SaveMode.Overwrite, Seq("grp"))
    assert(spark.table("graft_save_tbl").collect().map(_.getLong(0)) === Array(9L))
  }

  test("insertInto appends by position, not by name") {
    import spark.implicits._
    dropManaged("graft_ins_tbl")
    Seq((1L, "one")).toDF("id", "label").write.saveAsTable("graft_ins_tbl")
    // source frame has DIFFERENT column names — position decides
    Sinks.insertInto(Seq((2L, "two")).toDF("x", "y"), "graft_ins_tbl")
    val rows = spark.table("graft_ins_tbl").orderBy("id").collect()
    assert(rows.map(r => (r.getLong(0), r.getString(1)))
      === Array((1L, "one"), (2L, "two")))
    // overwrite replaces the full table content
    Sinks.insertInto(Seq((9L, "nine")).toDF("a", "b"), "graft_ins_tbl",
      overwrite = true)
    assert(spark.table("graft_ins_tbl").collect().map(_.getLong(0)) === Array(9L))
  }

  test("bucketed tables join and aggregate without a shuffle") {
    import spark.implicits._
    dropManaged("graft_bkt_a")
    dropManaged("graft_bkt_b")
    val a = (1 to 1000).map(i => (i.toLong, s"a$i")).toDF("k", "va")
    val b = (1 to 1000).map(i => (i.toLong, i * 2.0)).toDF("k", "vb")
    Sinks.saveBucketedTable(a, "graft_bkt_a", 4, Seq("k"), SaveMode.Overwrite)
    Sinks.saveBucketedTable(b, "graft_bkt_b", 4, Seq("k"), SaveMode.Overwrite)
    // force the sort-merge path (tiny fixtures would broadcast) so the
    // co-location is visible: bucketed scans feed the join AND the
    // groupBy with zero shuffle exchanges
    val thresholdKey = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(thresholdKey)
    try {
      spark.conf.set(thresholdKey, "-1")
      val joined = spark.table("graft_bkt_a")
        .join(spark.table("graft_bkt_b"), "k")
        .groupBy("k").agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan.take(800))
      assert(joined.count() === 1000)
    } finally spark.conf.set(thresholdKey, prev)
  }

  test("external parquet table DDL: create over location, repoint, properties") {
    import spark.implicits._
    val locA = java.nio.file.Files.createTempDirectory("extA").toString
    val locB = java.nio.file.Files.createTempDirectory("extB").toString
    Seq((1, "a"), (2, "b")).toDF("id", "tag")
      .write.mode(SaveMode.Overwrite).parquet(locA)
    Seq((3, "c")).toDF("id", "tag")
      .write.mode(SaveMode.Overwrite).parquet(locB)

    spark.sql("DROP TABLE IF EXISTS graft_ext_tbl")
    Sinks.createExternalParquetTable(spark, "graft_ext_tbl", locA)
    assert(spark.table("graft_ext_tbl").count() === 2)

    Sinks.setTableLocation(spark, "graft_ext_tbl", locB)
    spark.sql("REFRESH TABLE graft_ext_tbl")
    assert(spark.table("graft_ext_tbl").collect().map(_.getInt(0)) === Array(3))

    Sinks.setTableProperties(spark, "graft_ext_tbl",
      Map("layer" -> "bronze", "owner_team" -> "ingest"))
    val props = spark.sql("SHOW TBLPROPERTIES graft_ext_tbl")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props("layer") === "bronze")
    assert(props("owner_team") === "ingest")
  }
}
