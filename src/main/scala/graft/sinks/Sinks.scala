package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Sink operators (SURVEY §2.2). Parquet-native equivalents of the
  * reference's Delta writes, plus the maintenance operations it runs
  * as DDL.
  */
object Sinks {

  /** K1/K2: snapshot-overwrite or append to a catalog table, with
    * optional partition columns (`partitionBy('jobGroup','jobOrder')`
    * at `bp-unstructured-netapp-ingestion/ModuleFunctions.py:538-539`). */
  def saveTable(df: DataFrame, table: String, mode: SaveMode,
                partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode(mode)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .saveAsTable(table)
  }

  /** Bucketed save: hash-bucket the table by join keys at WRITE time
    * so repeated joins/aggregations on those keys skip their shuffle —
    * the co-located-join answer for fact tables that are joined on the
    * same key run after run (a 100-TB table shuffles once at ingest,
    * not once per query). Bucket counts must match across tables that
    * join with each other. */
  def saveBucketedTable(df: DataFrame, table: String, buckets: Int,
                        bucketCols: Seq[String], mode: SaveMode,
                        sortCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode(mode)
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }

  /** K3: position-based insert into an EXISTING catalog table — column
    * order, not names, decides the mapping (the reference's
    * `insertInto`, `PSS WHI (XML)/ModuleFunctions.scala:252`). */
  def insertInto(df: DataFrame, table: String, overwrite: Boolean = false): Unit =
    df.write.mode(if (overwrite) SaveMode.Overwrite else SaveMode.Append)
      .insertInto(table)

  /** K11: register an external parquet table over an existing location
    * (`basic/Create DBX Table from ADL.py:46-52`). */
  def createExternalParquetTable(spark: SparkSession, table: String,
                                 location: String): Unit =
    spark.sql(s"CREATE TABLE IF NOT EXISTS $table USING parquet " +
      s"LOCATION '$location'")

  /** K11: repoint a catalog table at a new storage location
    * (`basic/Changing ADLS Location in DBX Entities.py:36-66`). */
  def setTableLocation(spark: SparkSession, table: String,
                       location: String): Unit =
    spark.sql(s"ALTER TABLE $table SET LOCATION '$location'")

  /** K11: set table properties (ownership/layer tags in the reference). */
  def setTableProperties(spark: SparkSession, table: String,
                         props: Map[String, String]): Unit = {
    val kv = props.map { case (k, v) => s"'$k'='$v'" }.mkString(", ")
    spark.sql(s"ALTER TABLE $table SET TBLPROPERTIES ($kv)")
  }

  /** K8: parquet export with file-count control + "ready" marker
    * (`bp-bentley-idms/AGT_Chirag_Platform.py:41-42`,
    * `Rushmore Reviews/ModuleFunctions.scala:811-836`). A coalesce(1)
    * is only for hand-off exports — never for big data. */
  def exportParquet(df: DataFrame, path: String, numFiles: Int = 1,
                    readyMarker: Boolean = true): Unit = {
    df.coalesce(numFiles).write.mode(SaveMode.Overwrite).parquet(path)
    if (readyMarker) {
      val p = new org.apache.hadoop.fs.Path(path, "_READY")
      val fs = p.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
      fs.create(p, true).close()
    }
  }

  /** Media-shard export: one file per row from a binary column — the
    * inverse of the `binaryFile` source (write side of the multimodal
    * landing path). Distributed: each task writes its own partition's
    * files through the Hadoop filesystem API, so the same code targets
    * local disk, HDFS, or an object store; no driver collect. File
    * name is `<id>.<ext>` — ids must be unique (they key the files).
    * Returns the number of files written. */
  def writeBinaryFiles(df: DataFrame, idCol: String, contentCol: String,
                       dir: String, ext: String): Long = {
    val conf = new org.apache.spark.util.SerializableConfiguration(
      df.sparkSession.sparkContext.hadoopConfiguration)
    val base = new org.apache.hadoop.fs.Path(dir)
    base.getFileSystem(conf.value).mkdirs(base)
    val rows = df.select(col(idCol).cast("string").as("f"),
      col(contentCol).cast("binary").as("c"))
    val written = df.sparkSession.sparkContext.longAccumulator("filesWritten")
    rows.foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
      val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(conf.value)
      it.foreach { r =>
        val out = fs.create(
          new org.apache.hadoop.fs.Path(dir, s"${r.getString(0)}.$ext"), true)
        try out.write(r.getAs[Array[Byte]](1)) finally out.close()
        written.add(1)
      }
    }
    written.value
  }

  /** K10 parquet fallback for DELETE FROM t WHERE p: rewrite keeping
    * the complement. Safe two-phase: write to a temp dir, then swap. */
  def deleteWhere(spark: SparkSession, path: String,
                  predicate: org.apache.spark.sql.Column): Unit = {
    val tmp = path.stripSuffix("/") + "__rewrite"
    spark.read.parquet(path).where(!predicate || predicate.isNull)
      .write.mode(SaveMode.Overwrite).parquet(tmp)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(path), true)
    fs.rename(new org.apache.hadoop.fs.Path(tmp), new org.apache.hadoop.fs.Path(path))
  }

  /** K11 analogue of OPTIMIZE: compact a parquet directory to
    * `targetFiles` (read → repartition → overwrite-swap). */
  def compact(spark: SparkSession, path: String, targetFiles: Int): Unit = {
    val tmp = path.stripSuffix("/") + "__compact"
    spark.read.parquet(path).repartition(targetFiles)
      .write.mode(SaveMode.Overwrite).parquet(tmp)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(path), true)
    fs.rename(new org.apache.hadoop.fs.Path(tmp), new org.apache.hadoop.fs.Path(path))
  }

  /** Training-data shard export: assign every row a deterministic
    * shard via the md5-derived 60-bit hash of its id (same
    * `TextFunctions.hash64` contract the samplers use, so shard
    * membership reproduces in any engine), repartition BY that shard
    * column so each shard's rows land in exactly one task, and write
    * partitioned by shard. A trainer reads `shard_id=K/` directories
    * independently; re-running the export moves no row between shards.
    * Returns the per-shard row counts (the manifest a loader checks). */
  /** Deterministic shard assignment (pure): md5-derived 60-bit hash of
    * the id modulo `shards` — reproducible in any engine. */
  def shardAssignment(df: DataFrame, idCol: String, shards: Int): DataFrame = {
    import graft.functions.TextFunctions.hash64
    df.withColumn("shard_id",
      pmod(hash64(col(idCol).cast("string")), lit(shards)))
  }

  def shardedExport(df: DataFrame, idCol: String, path: String,
                    shards: Int): DataFrame = {
    val sharded = shardAssignment(df, idCol, shards)
    sharded.repartition(shards, col("shard_id"))
      .write.mode(SaveMode.Overwrite).partitionBy("shard_id").parquet(path)
    val manifest = sharded.groupBy(col("shard_id"))
      .agg(count(lit(1)).as("n_rows"))
    manifest.coalesce(1).write.mode(SaveMode.Overwrite)
      .parquet(path.stripSuffix("/") + "__manifest")
    manifest
  }

  /** Training-data export: gzip JSONL shards — the exchange format
    * most trainer data loaders ingest — plus a manifest of per-shard
    * row counts. Shard assignment is the same deterministic md5 hash
    * as [[shardedExport]], so re-exports of the same corpus land rows
    * in the same shards (stable resume/diff). One shuffle keyed by
    * shard; JSON encoding is codegen'd per row. */
  def jsonlExport(df: DataFrame, idCol: String, path: String,
                  shards: Int): DataFrame = {
    val sharded = shardAssignment(df, idCol, shards)
    sharded.repartition(shards, col("shard_id"))
      .write.mode(SaveMode.Overwrite).partitionBy("shard_id")
      .option("compression", "gzip").json(path)
    val manifest = sharded.groupBy(col("shard_id"))
      .agg(count(lit(1)).as("n_rows"))
    manifest.coalesce(1).write.mode(SaveMode.Overwrite)
      .json(path.stripSuffix("/") + "__manifest")
    manifest
  }

  /** K7: JDBC append (run-log rows to an audit database). */

  /** Outcome of an optimistic [[versionedCommit]]. */
  sealed trait CommitOutcome { def latest: Int }
  /** The commit landed as `version`; it is now the latest. */
  final case class Committed(version: Int) extends CommitOutcome {
    def latest: Int = version
  }
  /** Another writer claimed the version first; `latest` is the newest
    * COMMITTED version observed after the loss — re-derive from it
    * and retry (or surface the conflict). Nothing was torn: the
    * loser's data never became visible. */
  final case class VersionConflict(expectedBase: Int, latest: Int)
    extends CommitOutcome

  /** Poor-man's versioned table with OPTIMISTIC CONCURRENCY, shaped
    * like a real table format's transaction log: data is STAGED under
    * a unique `d-<token>` directory, then made visible by atomically
    * creating the small `_commit.vN` file whose content names the
    * data directory. The commit-file create is the ONLY shared-state
    * transition — it either lands (the version is complete and
    * latest) or fails because another writer took N first
    * ([[VersionConflict]], and the loser's staged data never becomes
    * visible). "Latest" is the max committed N; readers that resolved
    * a version before a later commit keep reading a complete old
    * snapshot, so there is no torn-read window.
    *
    * Round-9 verdict item 5 — why this shape: the previous design
    * flipped a single `_LATEST` file (delete+rename), so two racing
    * writers could interleave last-wins with no detection and the
    * pointer could REGRESS to the slower writer's older version. A
    * first redesign used separate claim + commit markers, but a
    * crashed claimer would block its version number forever and the
    * claim→commit gap let a writer commit past an in-flight
    * predecessor it had not derived from. Fusing claim and commit
    * into one atomic create (Delta's log-entry shape) removes both:
    * commits are strictly sequential (Committed(N) ⇒ N was max at
    * commit time), and a crashed stager leaves only an invisible
    * orphan directory that blocks nobody (`vacuumVersions` sweeps
    * it). `_LATEST` is still written afterwards as a best-effort
    * CACHE, but correctness never depends on it.
    *
    * Commit-file atomicity: local posix uses the hard-link trick
    * (write tmp, `link(2)` to the final name — EEXIST-atomic with
    * content in place); HDFS uses rename-without-clobber. Object
    * stores need their conditional-put instead. */
  def versionedCommit(df: DataFrame, path: String,
                      expectedBase: Int): CommitOutcome = {
    val spark = df.sparkSession
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(conf)
    fs.mkdirs(new org.apache.hadoop.fs.Path(path))
    val dataDir = s"d-${java.util.UUID.randomUUID()}"
    df.write.mode("errorifexists").parquet(s"$path/$dataDir")
    val next = expectedBase + 1
    if (atomicCommitFile(fs, path, s"_commit.v$next", dataDir)) {
      advanceLatestCache(fs, path, next)
      Committed(next)
    } else {
      // lost the race: our staged data is garbage — best-effort clean
      // (vacuumVersions sweeps it if this delete dies with us)
      fs.delete(new org.apache.hadoop.fs.Path(path, dataDir), true)
      VersionConflict(expectedBase,
        latestCommitted(spark, path).getOrElse(expectedBase))
    }
  }

  /** Atomically create `$dir/$name` with `content` — true iff WE
    * created it (false = name already exists). Local posix: tmp file
    * + hard link (EEXIST-atomic, content already durable at link
    * time; NIO CREATE_NEW would expose a momentarily-empty file).
    * Other schemes: tmp file + rename, which refuses to clobber on
    * HDFS. */
  private def atomicCommitFile(fs: org.apache.hadoop.fs.FileSystem,
                               dir: String, name: String,
                               content: String): Boolean = {
    val tmpName = s".$name.tmp-${java.util.UUID.randomUUID()}"
    if (fs.getScheme == "file") {
      val d = java.nio.file.Paths.get(
        new org.apache.hadoop.fs.Path(dir).toUri.getPath)
      val tmp = d.resolve(tmpName)
      java.nio.file.Files.write(tmp, content.getBytes("UTF-8"))
      try {
        java.nio.file.Files.createLink(d.resolve(name), tmp)
        java.nio.file.Files.delete(tmp); true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          java.nio.file.Files.delete(tmp); false
      }
    } else {
      val tmp = new org.apache.hadoop.fs.Path(dir, tmpName)
      val out = fs.create(tmp, true)
      out.write(content.getBytes("UTF-8")); out.close()
      val ok = fs.rename(tmp, new org.apache.hadoop.fs.Path(dir, name))
      if (!ok) fs.delete(tmp, false)
      ok
    }
  }

  private def advanceLatestCache(fs: org.apache.hadoop.fs.FileSystem,
                                 path: String, v: Int): Unit = try {
    val ptr = new org.apache.hadoop.fs.Path(path, "_LATEST")
    val cur = try {
      val in = fs.open(ptr)
      val s = scala.io.Source.fromInputStream(in).mkString.trim
      in.close(); s.toInt
    } catch { case _: java.io.IOException => 0 }
    if (cur < v) {
      val tmp = new org.apache.hadoop.fs.Path(path, s"_LATEST.tmp$v")
      val out = fs.create(tmp, true)
      out.write(v.toString.getBytes("UTF-8")); out.close()
      fs.delete(ptr, false)
      fs.rename(tmp, ptr)
    }
  } catch { case _: java.io.IOException => () } // cache only — never fatal

  /** Newest COMMITTED version, resolved from the monotonic commit
    * markers; falls back to the `_LATEST` cache then to bare `v=N`
    * dirs for layouts written before the marker protocol. */
  def latestCommitted(spark: SparkSession, path: String): Option[Int] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return None
    val committed = fs.listStatus(p).toSeq.map(_.getPath.getName)
      .filter(_.startsWith("_commit.v"))
      .map(_.stripPrefix("_commit.v").toInt)
    committed.maxOption.orElse {
      try {
        val in = fs.open(new org.apache.hadoop.fs.Path(path, "_LATEST"))
        val s = scala.io.Source.fromInputStream(in).mkString.trim
        in.close(); Some(s.toInt)
      } catch { case _: java.io.IOException =>
        listVersions(spark, path).maxOption
      }
    }
  }

  /** Versioned write with automatic conflict retry: re-reads the
    * latest committed version and re-claims until the commit lands
    * (bounded attempts — under genuine contention each loss means
    * someone ELSE committed, so the bound is never hit by livelock).
    * Returns the committed version number. */
  def versionedWrite(df: DataFrame, path: String,
                     maxAttempts: Int = 10): Int = {
    var attempt = 0
    while (attempt < maxAttempts) {
      val base = latestCommitted(df.sparkSession, path).getOrElse(0)
      versionedCommit(df, path, base) match {
        case Committed(v) => return v
        case VersionConflict(_, _) => attempt += 1
      }
    }
    throw new IllegalStateException(
      s"versionedWrite lost $maxAttempts claim races for $path")
  }

  /** Read the latest committed (or an explicit) version. */
  def readVersion(spark: SparkSession, path: String,
                  version: Option[Int] = None): DataFrame = {
    val v = version.orElse(latestCommitted(spark, path)).getOrElse(
      throw new IllegalStateException(s"no committed version at $path"))
    spark.read.parquet(s"$path/${resolveDataDir(spark, path, v)}")
  }

  /** Data directory of version `v`: named by its commit file's
    * content; bare `v=N` for layouts written before the log protocol. */
  private def resolveDataDir(spark: SparkSession, path: String,
                             v: Int): String = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    try {
      val in = fs.open(new org.apache.hadoop.fs.Path(path, s"_commit.v$v"))
      val s = scala.io.Source.fromInputStream(in).mkString.trim
      in.close()
      if (s.nonEmpty) s else s"v=$v"
    } catch { case _: java.io.IOException => s"v=$v" }
  }

  /** All committed versions (log protocol) plus bare legacy `v=N`
    * dirs, ascending. */
  def listVersions(spark: SparkSession, path: String): Seq[Int] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else {
      val names = fs.listStatus(p).toSeq.map(_.getPath.getName)
      (names.filter(_.startsWith("_commit.v"))
        .map(_.stripPrefix("_commit.v").toInt) ++
        names.filter(_.startsWith("v="))
          .map(_.stripPrefix("v=").toInt)).distinct.sorted
    }
  }

  /** Drop all but the newest `keep` versions (never the latest
    * committed one) — data dir + commit file — and sweep orphaned
    * `d-*` stage dirs left by crashed or race-losing writers. An
    * orphan is swept only when older than `orphanGraceMs`, so a
    * concurrent IN-FLIGHT stager is never vacuumed from under its
    * commit attempt. Returns the versions removed. */
  def vacuumVersions(spark: SparkSession, path: String, keep: Int,
                     orphanGraceMs: Long = 3600000L): Seq[Int] = {
    require(keep >= 1, "keep >= 1")
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val versions = listVersions(spark, path)
    // an uncommitted legacy v=N dir counts toward `keep` slots, so
    // explicitly shield the latest COMMITTED version from the drop
    val latest = latestCommitted(spark, path)
    val doomed = versions.dropRight(keep).filterNot(latest.contains)
    doomed.foreach { v =>
      fs.delete(new org.apache.hadoop.fs.Path(
        path, resolveDataDir(spark, path, v)), true)
      fs.delete(new org.apache.hadoop.fs.Path(path, s"v=$v"), true)
      fs.delete(new org.apache.hadoop.fs.Path(path, s"_commit.v$v"), false)
    }
    // orphan sweep: stage dirs no commit file references
    if (fs.exists(p)) {
      val stats = fs.listStatus(p).toSeq
      val names = stats.map(_.getPath.getName)
      val referenced = listVersions(spark, path)
        .map(v => resolveDataDir(spark, path, v)).toSet
      val now = System.currentTimeMillis()
      stats.filter { s =>
        val n = s.getPath.getName
        n.startsWith("d-") && !referenced.contains(n) &&
          now - s.getModificationTime >= orphanGraceMs
      }.foreach(s => fs.delete(s.getPath, true))
      // tmp commit files from crashed atomicCommitFile attempts
      names.filter(_.startsWith("._commit.")).foreach(n =>
        fs.delete(new org.apache.hadoop.fs.Path(path, n), false))
    }
    doomed
  }

  /** Catalog statistics for cost-based optimization: table row/byte
    * counts plus per-column ndv/null/min/max histograms. At scale this
    * is what lets Catalyst pick broadcast sides and join orders from
    * MEASURED sizes instead of file-size guesses — run it after large
    * loads the way the reference runs post-merge maintenance
    * (`PSS WHI (XML)/Tables.scala:646-649` vacuums there). */
  def analyzeTable(spark: SparkSession, table: String,
                   columns: Seq[String] = Nil): Unit = {
    spark.sql(s"ANALYZE TABLE $table COMPUTE STATISTICS")
    if (columns.nonEmpty)
      spark.sql(s"ANALYZE TABLE $table COMPUTE STATISTICS FOR COLUMNS " +
        columns.mkString(", "))
  }

  def jdbcAppend(df: DataFrame, url: String, table: String,
                 props: java.util.Properties = new java.util.Properties): Unit =
    df.write.mode(SaveMode.Append).jdbc(url, table, props)

  /** K12: external-table DDL for a warehouse (Synapse-style) from a
    * Spark schema. The reference string-replaces `SHOW CREATE TABLE`
    * output (STRING→NVARCHAR etc.,
    * `dataSource bp/ModuleFunctions.scala:67-103`) — fragile against
    * column names containing type words; this translation is
    * schema-driven, quotes identifiers, and maps nested types to
    * NVARCHAR(MAX) (serialized as JSON on export). */
  def externalTableDdl(schema: org.apache.spark.sql.types.StructType,
                       extSchema: String, table: String, location: String,
                       dataSource: String): String = {
    import org.apache.spark.sql.types._
    def sqlType(dt: DataType): String = dt match {
      case StringType => "NVARCHAR(MAX)"
      case IntegerType => "INT"
      case LongType => "BIGINT"
      case ShortType => "SMALLINT"
      case ByteType => "TINYINT"
      case DoubleType => "FLOAT"
      case FloatType => "REAL"
      case BooleanType => "BIT"
      case TimestampType => "DATETIME2"
      case DateType => "DATE"
      case d: DecimalType => s"DECIMAL(${d.precision},${d.scale})"
      case BinaryType => "VARBINARY(MAX)"
      case _ => "NVARCHAR(MAX)"
    }
    val cols = schema.fields
      .map(f => s"[${f.name.replace("]", "]]")}] ${sqlType(f.dataType)}")
      .mkString(", ")
    s"IF EXISTS (SELECT * FROM sys.external_tables WHERE object_id = " +
      s"OBJECT_ID('$extSchema.$table')) DROP EXTERNAL TABLE $extSchema.$table; " +
      s"CREATE EXTERNAL TABLE $extSchema.$table ($cols) WITH (" +
      s"LOCATION='$location', DATA_SOURCE=$dataSource, FILE_FORMAT=Parquet);"
  }
}
