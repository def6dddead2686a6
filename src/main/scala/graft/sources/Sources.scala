package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** External-source operators (SURVEY §2.1).
  *
  * Network endpoints from the reference (REST, SMB, SharePoint, SOAP)
  * become local fixtures/strings here; what the engine owns is the
  * string→rows and filesystem→rows machinery.
  */
object Sources {

  /** S2: JSON document strings → DataFrame with inferred nested schema
    * (`spark.read.json(Seq(json).toDS)` at
    * `bp-scala-api-ingestions/dataSource bp/Tables.scala:268`). */
  def jsonStrings(spark: SparkSession, docs: Dataset[String]): DataFrame =
    spark.read.json(docs)

  /** S2 column-level: parse a JSON string column with explicit schema
    * (no inference job — the scale-safe variant). */
  def parseJsonColumn(df: DataFrame, jsonCol: String, schema: StructType,
                      as: String = "parsed"): DataFrame =
    df.withColumn(as, from_json(col(jsonCol), schema))

  /** S11: XML documents → rows by element path + attribute/child
    * extraction, executor-side via scala-xml (the reference walks
    * nodes with `\`/`\\` on the driver,
    * `PSS WHI (XML)/ModuleFunctions.scala:483-526`). */
  def xmlStrings(spark: SparkSession, docs: Dataset[String],
                 recordTag: String, fields: Seq[String]): DataFrame = {
    val schema = StructType(fields.map(f => StructField(f, StringType)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    docs.mapPartitions { it =>
      it.flatMap { s =>
        val root = scala.xml.XML.loadString(s)
        (root \\ recordTag).map { node =>
          Row.fromSeq(fields.map { f =>
            val attr = node.attribute(f).map(_.text)
            val child = (node \ f).headOption.map(_.text)
            attr.orElse(child).orNull
          })
        }
      }
    }(enc)
  }

  /** File-listing row (S9): one row per file in a tree walk. */
  case class FileMeta(path: String, name: String, ext: String,
                      sizeBytes: Long, modifiedMs: Long, isDir: Boolean)

  /** S9: recursive filesystem listing → Dataset[FileMeta].
    *
    * Distributed: the driver lists only the FIRST level of `root`;
    * each top-level directory's recursive walk (Hadoop FS
    * RemoteIterator — HDFS/ABFS/S3A/local) runs executor-side via
    * mapPartitions, one task per directory. At 100M files the driver
    * holds only the top-level entry list, never the tree — unlike the
    * reference's driver-side 50k-row accumulation loops. */
  def listFiles(spark: SparkSession, root: String): Dataset[FileMeta] = {
    import spark.implicits._
    val path = new org.apache.hadoop.fs.Path(root)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def toMeta(st: org.apache.hadoop.fs.FileStatus): FileMeta = {
      val name = st.getPath.getName
      val ext = name.lastIndexOf('.') match {
        case -1 => ""
        case i => name.substring(i + 1).toLowerCase
      }
      FileMeta(st.getPath.toUri.getPath, name, ext, st.getLen,
        st.getModificationTime, st.isDirectory)
    }
    val top = fs.listStatus(path).toSeq
    val (dirs, files) = top.partition(_.isDirectory)
    val topFileRows = files.map(toMeta)
    val dirPaths = dirs.map(_.getPath.toString)
    val walked =
      if (dirPaths.isEmpty) spark.emptyDataset[FileMeta]
      else spark.createDataset(dirPaths)
        .repartition(dirPaths.size) // one walk task per directory
        .mapPartitions { it =>
          val conf = new org.apache.hadoop.conf.Configuration()
          it.flatMap { d =>
            val p = new org.apache.hadoop.fs.Path(d)
            val dfs = p.getFileSystem(conf)
            val remote = dfs.listFiles(p, true) // recursive, files only
            new Iterator[FileMeta] {
              def hasNext: Boolean = remote.hasNext
              def next(): FileMeta = {
                val st = remote.next()
                val name = st.getPath.getName
                val ext = name.lastIndexOf('.') match {
                  case -1 => ""
                  case i => name.substring(i + 1).toLowerCase
                }
                FileMeta(st.getPath.toUri.getPath, name, ext, st.getLen,
                  st.getModificationTime, st.isDirectory)
              }
            }
          }
        }
    spark.createDataset(topFileRows).unionByName(walked)
  }

  /** S5: tabular file scan with options. The reference reads Excel
    * workbooks option-driven (header/sheet,
    * `dataSource bp/Tables.scala:366`); the spreadsheet codec isn't in
    * public Spark, so CSV is the built-in tabular analogue with the
    * same options-map shape. Pass an explicit `schema` for the
    * scale-safe path (no inference pass over the files). */
  def csvScan(spark: SparkSession, path: String,
              options: Map[String, String] = Map("header" -> "true"),
              schema: Option[StructType] = None): DataFrame = {
    val r = spark.read.options(options)
    schema.fold(r.option("inferSchema", "true"))(r.schema).csv(path)
  }

  /** S5 Excel facade: delegate to the `com.crealytics:spark-excel`
    * plugin when its DataSource class is on the classpath — the exact
    * format the reference reads XLSX with (`dataSource bp/
    * Tables.scala:366`), same options map (`header`, `dataAddress` for
    * sheet!range, `inferSchema`) — and fall back to [[csvScan]]
    * otherwise, so a job ports without code changes and only the
    * artifact's presence decides the codec. The fallback expects the
    * same logical table shape in CSV form (the sandbox has no excel
    * jar; see SURVEY §7.4).
    *
    * Plugin contract when present: `spark.read.format("excel")
    * .options(opts).load(path)` with an explicit `schema` for the
    * scale-safe path (inference reads the whole workbook). */
  def excelScan(spark: SparkSession, path: String,
                options: Map[String, String] = Map("header" -> "true"),
                schema: Option[StructType] = None): DataFrame = {
    val pluginPresent =
      Seq("com.crealytics.spark.excel.v2.ExcelDataSource",
          "com.crealytics.spark.excel.DefaultSource").exists { c =>
        try { Class.forName(c, false, getClass.getClassLoader); true }
        catch { case _: ClassNotFoundException => false }
      }
    if (pluginPresent) {
      val r = spark.read.format("excel").options(options)
      schema.fold(r.option("inferSchema", "true"))(r.schema).load(path)
    } else csvScan(spark, path, options - "dataAddress", schema)
  }

  /** Columnar-format interop: ORC scan with the same explicit-schema
    * contract as `csvScan` (ORC self-describes, so the schema arg is
    * a projection/validation hook, not an inference escape). ORC
    * carries per-stripe min/max like parquet — predicate pushdown and
    * partition pruning behave identically, so pipelines landing in
    * either format share every downstream operator. */
  def orcScan(spark: SparkSession, path: String,
              schema: Option[StructType] = None): DataFrame = {
    val r = spark.read
    schema.fold(r)(r.schema).orc(path)
  }

  /** Malformed-row quarantine for delimited/JSON scans: PERMISSIVE
    * parsing with a corrupt-record column, split into (good, bad) so a
    * handful of broken lines in a 100-TB landing zone cannot fail the
    * run OR silently vanish — the row-level counterpart of
    * `PagedSource`'s page-level schema-drift quarantine (ref
    * `Well Logs Curve Data/ModuleFunctions.scala:688-697` routes
    * failures to a table instead of raising). `bad` carries the raw
    * line for replay after the parser/schema is fixed.
    *
    * One scan feeds both sides (same cached-split shape as
    * `PagedSource`): rows where every data column is null AND the raw
    * column is set are parse failures. */
  def csvScanWithQuarantine(spark: SparkSession, path: String,
                            schema: StructType,
                            options: Map[String, String] = Map(
                              "header" -> "true")
                           ): (DataFrame, DataFrame) = {
    val corrupt = "_corrupt_record"
    val full = schema.add(corrupt, StringType)
    val df = spark.read.options(options)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corrupt)
      .schema(full).csv(path)
      .persist() // one scan, two consumers; small relative to downstream
    val bad = df.where(col(corrupt).isNotNull)
      .select(col(corrupt).as("raw"), lit("malformed_row").as("reason"))
    val good = df.where(col(corrupt).isNull)
      .select(schema.fieldNames.map(col).toSeq: _*)
    (good, bad)
  }

  /** S1: JDBC scan with pushdown subquery — the `(query) AS tab` idiom
    * keeps the predicate in the remote database. */
  def jdbcQuery(spark: SparkSession, url: String, query: String,
                props: java.util.Properties = new java.util.Properties,
                fetchSize: Int = 10000): DataFrame = {
    props.setProperty("fetchsize", fetchSize.toString)
    spark.read.jdbc(url, s"($query) tab", props)
  }

  /** S1 at scale: PARTITIONED parallel JDBC read — the single-stream
    * `jdbcQuery` caps ingest at one connection's throughput, which is
    * the first bottleneck a 100-TB deployment hits on a JDBC source
    * (the reference reads its job-queue and audit tables single-
    * stream; its biggest fetchsize is 108k rows —
    * `bp-scala-api-ingestions/dataSource bp - Well Logs Curve Data/
    * Tables.scala:68`). Spark splits [lowerBound, upperBound) on the
    * numeric `partitionColumn` into `numPartitions` range predicates,
    * one connection per task; bounds only shape the split, rows
    * OUTSIDE the bounds still load (first/last partitions are
    * unbounded). Pick a roughly uniform column (surrogate key) —
    * skewed split columns re-serialize the read. */
  def jdbcQueryPartitioned(spark: SparkSession, url: String, query: String,
                           partitionColumn: String, lowerBound: Long,
                           upperBound: Long, numPartitions: Int,
                           props: java.util.Properties = new java.util.Properties,
                           fetchSize: Int = 10000): DataFrame = {
    props.setProperty("fetchsize", fetchSize.toString)
    spark.read.jdbc(url, s"($query) tab", partitionColumn, lowerBound,
      upperBound, numPartitions, props)
  }

  /** S8: empty frame with an explicit schema (union seed). */
  def emptyFrame(spark: SparkSession, schema: StructType): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
}
