package graft.operators

import graft.SparkSpec
import graft.sample.Manifest
import org.apache.spark.sql.functions._

/** [[Manifest.curationManifest]] — the composed dedup × quality
  * accounting. The oracle gate (q_mix_manifest) proves engine ≡ SQL;
  * this spec pins the attribution semantics on a corpus where the
  * answers are countable by hand: duplicates charged to their OWN
  * slice even when the keeper is elsewhere, quality and dup gates
  * independent, ppm rates floor-divided.
  */
class ManifestSpec extends SparkSpec {
  import spark.implicits._

  private val longText =
    "the quick brown fox jumps over the lazy dog again and again today"

  test("cross-source duplicate attribution and kept accounting") {
    val docs = Seq(
      // keeper (min id) lives in source A ...
      (1L, "A", "en", longText),
      // ... its duplicate (normalized: case + internal whitespace) in
      // source B — leading/trailing space would NOT normalize away
      (2L, "B", "en", "The quick  brown fox jumps over the lazy dog " +
        "again and again today"),
      // quality fail (too_short), unique
      (3L, "A", "en", "tiny doc"),
      // unique pass
      (4L, "B", "en", "a perfectly ordinary sentence with enough words " +
        "to pass the gate here")).toDF("doc_id", "source", "lang", "text")
    val m = Manifest.curationManifest(docs, Seq("source", "lang"),
        "doc_id", "text")
      .collect().map(r => (r.getAs[String]("source") -> r)).toMap
    val a = m("A")
    assert(a.getAs[Long]("n_docs") == 2L)
    assert(a.getAs[Long]("n_dup_docs") == 0L) // keeper side, not a dup
    assert(a.getAs[Long]("n_quality_fail") == 1L)
    assert(a.getAs[Long]("n_kept_docs") == 1L)
    assert(a.getAs[Long]("kept_ppm") == 500000L)
    val b = m("B")
    assert(b.getAs[Long]("n_docs") == 2L)
    // doc 2 is charged to B although its keeper (doc 1) lives in A
    assert(b.getAs[Long]("n_dup_docs") == 1L)
    assert(b.getAs[Long]("n_quality_fail") == 0L)
    assert(b.getAs[Long]("n_kept_docs") == 1L)
    assert(b.getAs[Long]("dup_ppm") == 500000L)
  }

  test("kept_tokens sums only docs passing BOTH gates") {
    val docs = Seq(
      (1L, "A", "en", longText),
      (2L, "A", "en", longText), // exact dup of 1 → dropped
      (3L, "A", "en", "short one")) // quality fail → dropped
      .toDF("doc_id", "source", "lang", "text")
    val row = Manifest.curationManifest(docs, Seq("source", "lang"),
      "doc_id", "text").head()
    assert(row.getAs[Long]("n_tokens") == 13L + 13L + 2L)
    assert(row.getAs[Long]("kept_tokens") == 13L)
    assert(row.getAs[Long]("n_kept_docs") == 1L)
    assert(row.getAs[Long]("kept_ppm") == 333333L)
  }
}
