package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Grep-enforced house convention (r16 verdict #5): every eager
  * checkpoint in src/main goes through
  * `Converge.SanitizedCheckpoint#sanitizedCheckpoint` (or
  * `Converge.checkpointWithSig`), never bare `.localCheckpoint()` —
  * a bare site is harmless under single-join loops but re-arms the
  * r16 BigInteger stats bomb the moment a multiplicative loop is
  * written over its frame. The only allowed bare call sites are the
  * wrappers themselves. */
class CheckpointConventionSpec extends AnyFunSuite {

  test("no bare .localCheckpoint() outside the Converge wrappers") {
    val root = new java.io.File("src/main/scala")
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
      else if (f.getName.endsWith(".scala")) Seq(f) else Seq.empty
    val allowed = Set("Converge.scala")
    val offenders = for {
      f <- walk(root) if !allowed(f.getName)
      (line, i) <- scala.io.Source.fromFile(f, "UTF-8").getLines().zipWithIndex
      if line.contains(".localCheckpoint(")
      if !line.trim.startsWith("*") && !line.trim.startsWith("//")
    } yield s"${f.getPath}:${i + 1}: ${line.trim}"
    assert(offenders.isEmpty,
      "bare .localCheckpoint() found — use .sanitizedCheckpoint() " +
        "(import graft.operators.Converge.SanitizedCheckpoint) or " +
        "Converge.checkpointWithSig:\n" + offenders.mkString("\n"))
  }
}
