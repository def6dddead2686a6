package graft.control

/** Stage-once artifact store — THE house discipline for anything a
  * query must materialize on local disk before (or instead of)
  * computing: media fixture trees, CSV landing zones, saved graph
  * labelings and distance tables (the saved-index idiom's on-disk
  * half). Previously each saver hand-rolled the same three lines
  * (tag-hash dir, done-probe, conditional write); this helper is that
  * core with the contract spelled out once.
  *
  * Keying contract: the staged dir is `tmpdir/graft_stage_<md5(tag |
  * scope)>`. The `tag` is a CONTENT FINGERPRINT — the caller states
  * every constant that determines the staged bytes (counts, dimension
  * formulas, color seeds, algorithm parameters) so editing the
  * formula without the adjacent tag string is the only way to serve
  * stale bytes, and any tag change automatically lands in a fresh dir
  * (no manual version bump to forget). For artifacts DERIVED FROM
  * FIXTURE DATA (a saved BFS distance table, an SCC labeling), the
  * caller must ALSO fold [[fingerprint]] of the source files into the
  * tag: regenerated fixture data at the same path then lands in a
  * fresh staging dir instead of silently serving distances for data
  * that no longer exists — for a saved under-approximation like BFS
  * distances a stale read breaks the monotone-repair invariant with
  * no error anywhere.
  *
  * The `done` probe gates the write: bench repeats and plan-lint
  * sweeps must not fold fixture-write time into the measured query or
  * leak a fresh temp dir per invocation. A probe that FAILS (torn
  * earlier write, missing `_SUCCESS`) re-runs `write` into the same
  * dir — writers therefore overwrite, never append.
  */
object ArtifactStore {

  private def md5hex(s: String, bytes: Int): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).take(bytes).map(b => f"$b%02x").mkString

  /** Resolve the staged dir for `tag` within `scope` (typically the
    * data dir), running `write` only when `done` reports the staged
    * content absent or torn. Returns the absolute dir path.
    *
    * Dir layout `graft_stage_<family>_<key>`: `key` hashes the full
    * (tag, scope) as before; `family` hashes only the tag's leading
    * name segment (before the first `:`) plus the scope. A tag change
    * within the same family — a bumped constant, a regenerated-fixture
    * [[fingerprint]] — therefore lands in a FRESH key dir, and resolve
    * deletes the family's now-stale sibling dirs, so regenerations
    * cannot accumulate orphaned stage dirs in tmpdir unboundedly.
    *
    * Sweep ordering: stale siblings are removed only AFTER the
    * current dir is known valid (its probe passed, or `write`
    * returned without throwing). Sweeping first — as this method
    * originally did — had two failure modes: a `write` that throws
    * left the family with NEITHER the old nor the new artifact, and a
    * concurrent JVM sharing java.io.tmpdir that still resolves the
    * older tag could have its staged artifact deleted mid-read. The
    * mtime grace window guards the second case's remainder: a sibling
    * touched recently (an in-flight writer or reader in another
    * process — bench and `sbt test` do run concurrently on dev boxes)
    * is spared this pass and collected by a later one. */
  def resolve(tag: String, scope: String)(done: java.io.File => Boolean)
             (write: String => Unit): String = {
    val family = md5hex(tag.takeWhile(_ != ':') + "|" + scope, 4)
    val key = md5hex(tag + "|" + scope, 8)
    val tmp = new java.io.File(sys.props("java.io.tmpdir"))
    val d = new java.io.File(tmp, s"graft_stage_${family}_$key")
    if (!d.isDirectory || !done(d)) {
      // In-flight sentinel: Spark stages parquet under a _temporary
      // SUBDIR, so a write running longer than the sweep grace may
      // never refresh the top dir's mtime — another JVM resolving a
      // newer tag in the same family could then sweep this dir
      // mid-write. The sentinel (a SIBLING file — inside the dir an
      // overwrite-mode writer would delete it first thing — dropped
      // at write start, removed on success) marks the dir as a live
      // write site; sweeps spare it for a generous writer window. A
      // writer that CRASHES leaves the sentinel behind, so the
      // probe-failed re-write path re-enters here and the dir is
      // refreshed, or once the writer window lapses, collected.
      val writing = writingSentinel(d)
      writing.createNewFile(); writing.setLastModified(System.currentTimeMillis())
      write(d.getAbsolutePath)
      writing.delete(): Unit
    }
    // reaching here means the current dir is valid — safe to sweep
    val graceMs = 15L * 60 * 1000
    val writerGraceMs = 6L * 60 * 60 * 1000
    val now = System.currentTimeMillis()
    val stale = tmp.listFiles((_, n) =>
      n.startsWith(s"graft_stage_${family}_") &&
        n != d.getName && n != writingSentinel(d).getName)
    if (stale != null)
      stale.filter { s =>
        if (s.getName.endsWith(writingSuffix))
          // an orphaned sentinel (its writer crashed): collect only
          // after its dir is also collectible
          now - s.lastModified() > writerGraceMs
        else {
          val sentinel = writingSentinel(s)
          val liveWrite =
            sentinel.isFile && now - sentinel.lastModified() <= writerGraceMs
          !liveWrite && now - s.lastModified() > graceMs
        }
      }.foreach(deleteTree)
    d.getAbsolutePath
  }

  private val writingSuffix = ".writing"
  private[graft] def writingSentinel(dir: java.io.File): java.io.File =
    new java.io.File(dir.getParentFile, dir.getName + writingSuffix)

  private[graft] def deleteTree(f: java.io.File): Unit = {
    val kids = f.listFiles()
    if (kids != null) kids.foreach(deleteTree)
    f.delete(): Unit
  }

  /** [[resolve]] specialized to parquet artifacts: done = the
    * committed `_SUCCESS` marker exists. `refresh = true` forces the
    * write (the q_scc "recompute and refresh the artifact" hook). */
  def parquet(tag: String, scope: String, refresh: Boolean = false)
             (write: String => Unit): String =
    resolve(tag, scope)(d => !refresh && parquetDone(d))(write)

  /** The committed-parquet probe: Spark writes `_SUCCESS` last. */
  def parquetDone(d: java.io.File): Boolean =
    new java.io.File(d, "_SUCCESS").isFile

  /** Count of direct children with `suffix` — the probe for staged
    * file trees (N PNGs, N WAVs, ...). */
  def countFiles(d: java.io.File, suffix: String): Int = {
    val l = d.list((_, n) => n.endsWith(suffix))
    if (l == null) 0 else l.length
  }

  /** Cheap data fingerprint of fixture paths (plain files or
    * one-level part-file directories, the two parquet layouts):
    * every entry's NAME, SIZE, and MTIME folded into the hash (not
    * aggregate totals — a regeneration that shuffles bytes between
    * part files at the same total size, or lands within a coarse
    * filesystem's mtime granularity on one file, still changes some
    * per-entry triple). Pure filesystem stats — no Spark job, safe to
    * call on every query invocation. A MISSING path is an error, not a
    * stable `name:0:0` hash: a typo'd or non-local fixture path must
    * not silently disable the staleness invalidation this fingerprint
    * exists to provide (local-filesystem fixtures are this store's
    * documented scope; cluster artifacts go through the catalog). */
  def fingerprint(paths: String*): String = {
    val parts = paths.map { p =>
      val f = new java.io.File(p)
      require(f.exists, s"ArtifactStore.fingerprint: fixture path missing: $p")
      val entries: Seq[java.io.File] =
        if (f.isDirectory) {
          val l = f.listFiles()
          if (l == null) Nil else l.toSeq.sortBy(_.getName)
        } else Seq(f)
      val detail = entries
        .map(e => s"${e.getName}=${e.length()}@${e.lastModified()}")
        .mkString(",")
      s"${f.getName}:$detail"
    }
    md5hex(parts.mkString(";"), 6)
  }
}
