package graft.operators

import graft.SparkSpec
import graft.functions.Phrase
import org.apache.spark.sql.functions._

class PhraseSpec extends SparkSpec {
  import spark.implicits._

  private def run(docs: Seq[(Long, String)], phrases: Seq[String]) =
    Phrase.phraseMatches(docs.toDF("id", "text"), "id", "text", phrases)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("phrase"),
        r.getAs[Long]("n_matches"), r.getAs[Long]("first_pos")))
      .toSet

  test("simple phrase: counts and 0-based first position") {
    val out = run(Seq(
      (1L, "the quick brown fox"),
      (2L, "quick brown shoes and quick brown fox")),
      Seq("quick brown"))
    assert(out == Set((1L, "quick brown", 1L, 1L),
      (2L, "quick brown", 2L, 0L)))
  }

  test("adjacent terms in the wrong order do not match") {
    val out = run(Seq((1L, "brown quick")), Seq("quick brown"))
    assert(out.isEmpty)
  }

  test("repeated-term phrase needs the full run") {
    val out = run(Seq(
      (1L, "go go go"),
      (2L, "go stop go")),
      Seq("go go"))
    // "go go go" contains two overlapping occurrences at 0 and 1
    assert(out == Set((1L, "go go", 2L, 0L)))
  }

  test("matching is analyzer-normalized (case and punctuation)") {
    val out = run(Seq((1L, "Quick, Brown!")), Seq("quick brown"))
    assert(out == Set((1L, "quick brown", 1L, 0L)))
  }

  test("multiple phrases resolve in one pass") {
    val out = run(Seq((1L, "a b c d")), Seq("a b", "c d", "b d"))
    assert(out == Set((1L, "a b", 1L, 0L), (1L, "c d", 1L, 2L)))
  }
}
