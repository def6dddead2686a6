package graft.operators

import graft.control.ArtifactStore
import org.scalatest.funsuite.AnyFunSuite

/** The stage-once contract: write runs exactly once while the probe
  * holds, a failed probe re-writes in place, a changed tag (including
  * the fingerprint component) lands in a fresh dir — the stale-tag
  * invalidation the saved-distance/labeling artifacts depend on. */
class ArtifactStoreSpec extends AnyFunSuite {

  private def freshTag(): String =
    "artifact-spec-" + java.util.UUID.randomUUID().toString

  test("write runs once; satisfied probe skips the second write") {
    val tag = freshTag()
    var writes = 0
    def stage(): String = ArtifactStore.resolve(tag, "scopeA")(
      d => new java.io.File(d, "done").isFile) { p =>
      writes += 1
      val d = new java.io.File(p)
      d.mkdirs()
      java.nio.file.Files.writeString(d.toPath.resolve("done"), "x")
    }
    val d1 = stage()
    val d2 = stage()
    assert(d1 === d2)
    assert(writes === 1)
  }

  test("failed probe (torn write) re-runs the writer in the same dir") {
    val tag = freshTag()
    var writes = 0
    def stage(succeed: Boolean): String = ArtifactStore.resolve(tag, "s")(
      d => new java.io.File(d, "done").isFile) { p =>
      writes += 1
      val d = new java.io.File(p)
      d.mkdirs()
      if (succeed)
        java.nio.file.Files.writeString(d.toPath.resolve("done"), "x")
    }
    val d1 = stage(succeed = false) // torn: dir exists, marker missing
    val d2 = stage(succeed = true)
    assert(d1 === d2 && writes === 2)
    assert(stage(succeed = true) === d1 && writes === 2)
  }

  test("changed tag and changed scope each land in a fresh dir") {
    val tag = freshTag()
    def dirOf(t: String, s: String): String =
      ArtifactStore.resolve(t, s)(_ => true)(_ => ())
    val base = dirOf(tag, "s1")
    assert(dirOf(tag + ":fp2", "s1") !== base)
    assert(dirOf(tag, "s2") !== base)
    assert(dirOf(tag, "s1") === base)
  }

  test("parquet(): _SUCCESS gates; refresh forces the writer") {
    val tag = freshTag()
    var writes = 0
    def stage(refresh: Boolean): String =
      ArtifactStore.parquet(tag, "s", refresh) { p =>
        writes += 1
        val d = new java.io.File(p)
        d.mkdirs()
        java.nio.file.Files.writeString(d.toPath.resolve("_SUCCESS"), "")
      }
    stage(refresh = false)
    stage(refresh = false)
    assert(writes === 1)
    stage(refresh = true) // the q_scc recompute hook
    assert(writes === 2)
  }

  test("a changed tag deletes the family's now-stale sibling dir") {
    val fam = freshTag() // no ':' — the whole tag is the family name
    var dirs = List.empty[String]
    def stage(fp: String): String =
      ArtifactStore.resolve(s"$fam:$fp", "s")(_ => false) { p =>
        dirs ::= p
        new java.io.File(p).mkdirs()
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(p).resolve("payload"), fp)
      }
    val d1 = stage("fp1")
    assert(new java.io.File(d1, "payload").isFile)
    val d2 = stage("fp2") // regenerated fixture → new fingerprint
    assert(d2 !== d1)
    // the just-written sibling sits INSIDE the mtime grace window
    // (it could be another process's in-flight artifact), so the
    // sweep spares it this pass...
    assert(new java.io.File(d1).isDirectory,
      s"recent sibling $d1 must survive the grace window")
    // ...and collects it once it ages past the window
    val old = System.currentTimeMillis() - 16L * 60 * 1000
    assert(new java.io.File(d1).setLastModified(old))
    val d3 = stage("fp3")
    assert(d3 !== d1)
    assert(!new java.io.File(d1).exists(),
      s"aged stale stage dir $d1 should have been deleted")
    // a DIFFERENT family (and a different scope) is never touched,
    // whatever its age
    val other = ArtifactStore.resolve(freshTag(), "s")(_ => false) { p =>
      new java.io.File(p).mkdirs(): Unit
    }
    assert(new java.io.File(other).setLastModified(old))
    stage("fp4")
    assert(new java.io.File(other).isDirectory)
  }

  test("a live writing sentinel spares an aged sibling from the sweep") {
    val fam = freshTag()
    val d1 = ArtifactStore.resolve(s"$fam:a", "s")(_ => false) { p =>
      new java.io.File(p).mkdirs(): Unit
    }
    // simulate another JVM mid-write in d1: its top-level mtime is
    // stale (Spark stages under _temporary, so a long write never
    // refreshes it) but its sibling sentinel is fresh
    val old = System.currentTimeMillis() - 16L * 60 * 1000
    assert(new java.io.File(d1).setLastModified(old))
    val sentinel = ArtifactStore.writingSentinel(new java.io.File(d1))
    assert(sentinel.createNewFile())
    try {
      val d2 = ArtifactStore.resolve(s"$fam:b", "s")(_ => false) { p =>
        new java.io.File(p).mkdirs(): Unit
      }
      assert(d2 !== d1)
      assert(new java.io.File(d1).isDirectory,
        s"aged sibling $d1 with a live write sentinel must survive the sweep")
      // once the sentinel itself ages past the writer window (the
      // writer crashed), both sentinel and dir are collectible
      val crashed = System.currentTimeMillis() - 7L * 60 * 60 * 1000
      assert(sentinel.setLastModified(crashed))
      ArtifactStore.resolve(s"$fam:c", "s")(_ => false) { p =>
        new java.io.File(p).mkdirs(): Unit
      }
      assert(!new java.io.File(d1).exists(),
        "a crashed writer's dir should be collected after the writer window")
      assert(!sentinel.exists(),
        "a crashed writer's sentinel should be collected with its dir")
    } finally { sentinel.delete(): Unit }
  }

  test("a write that throws leaves the family's prior artifact intact") {
    val fam = freshTag()
    val d1 = ArtifactStore.resolve(s"$fam:a", "s")(_ => false) { p =>
      new java.io.File(p).mkdirs()
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(p).resolve("payload"), "a"): Unit
    }
    // age it past the grace window so ONLY the validate-before-sweep
    // ordering protects it from the failing regeneration below
    assert(new java.io.File(d1)
      .setLastModified(System.currentTimeMillis() - 16L * 60 * 1000))
    val boom = intercept[RuntimeException] {
      ArtifactStore.resolve(s"$fam:b", "s")(_ => false) { _ =>
        throw new RuntimeException("torn write")
      }
    }
    assert(boom.getMessage === "torn write")
    assert(new java.io.File(d1, "payload").isFile,
      "a failed regeneration must not delete the family's old artifact")
  }

  test("fingerprint refuses a missing fixture path") {
    val missing = "/nonexistent/graft-fp-" + java.util.UUID.randomUUID()
    val e = intercept[IllegalArgumentException] {
      ArtifactStore.fingerprint(missing)
    }
    assert(e.getMessage.contains(missing))
  }

  test("fingerprint sees per-entry layout, not just aggregate totals") {
    // same TOTAL bytes, same max mtime — bytes merely moved between
    // part files; the per-entry fold must still notice
    val dir = java.nio.file.Files.createTempDirectory("artifact-fp-layout")
    val p0 = dir.resolve("part-0"); val p1 = dir.resolve("part-1")
    java.nio.file.Files.writeString(p0, "ab")
    java.nio.file.Files.writeString(p1, "c")
    val t = 1700000000000L
    p0.toFile.setLastModified(t); p1.toFile.setLastModified(t)
    val before = ArtifactStore.fingerprint(dir.toString)
    java.nio.file.Files.writeString(p0, "a")
    java.nio.file.Files.writeString(p1, "bc")
    p0.toFile.setLastModified(t); p1.toFile.setLastModified(t)
    assert(ArtifactStore.fingerprint(dir.toString) !== before)
  }

  test("fingerprint changes when fixture bytes or mtime change") {
    val dir = java.nio.file.Files.createTempDirectory("artifact-fp")
    val f = dir.resolve("orders.parquet")
    java.nio.file.Files.writeString(f, "v1-bytes")
    val fp1 = ArtifactStore.fingerprint(f.toString)
    assert(fp1 === ArtifactStore.fingerprint(f.toString)) // stable
    java.nio.file.Files.writeString(f, "v2-bytes-longer")
    val fp2 = ArtifactStore.fingerprint(f.toString)
    assert(fp2 !== fp1)
    // same size, newer mtime (in-place regeneration) still invalidates
    java.nio.file.Files.writeString(f, "v3-bytes-longer")
    f.toFile.setLastModified(f.toFile.lastModified() + 5000)
    assert(ArtifactStore.fingerprint(f.toString) !== fp2)
    // directory layout (part files) is covered too
    val part = dir.resolve("more.parquet")
    java.nio.file.Files.createDirectory(part)
    java.nio.file.Files.writeString(part.resolve("part-0.parquet"), "a")
    val dfp1 = ArtifactStore.fingerprint(part.toString)
    java.nio.file.Files.writeString(part.resolve("part-1.parquet"), "b")
    assert(ArtifactStore.fingerprint(part.toString) !== dfp1)
  }
}
