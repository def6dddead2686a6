package graft.operators

import graft.SparkSpec
import graft.graph.RandomWalks

class RandomWalksSpec extends SparkSpec {

  import spark.implicits._

  private def hash64(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString.take(15)
    java.lang.Long.parseLong(hex, 16)
  }

  /** Serial reference of the seeded-hash walk contract. */
  private def brute(edges: Seq[(String, String)], walksPerNode: Int,
                    len: Int, seed: String): Set[(String, Int, String)] = {
    val adj = edges.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    val nodes = edges.map(_._1).distinct
    val out = scala.collection.mutable.Set[(String, Int, String)]()
    for (n <- nodes; w <- 0 until walksPerNode) {
      val id = s"$n#$w"
      var cur = n
      out += ((id, 0, cur))
      var t = 1
      var dead = false
      while (t <= len && !dead) {
        adj.get(cur) match {
          case None => dead = true
          case Some(ns) =>
            cur = ns.distinct.minBy(d => (hash64(s"$seed:$id:$t:$d"), d))
            out += ((id, t, cur))
            t += 1
        }
      }
    }
    out.toSet
  }

  private def sym(pairs: (String, String)*): Seq[(String, String)] =
    pairs.flatMap { case (a, b) => Seq((a, b), (b, a)) }

  test("walks match the serial seeded-hash reference") {
    val edges = sym(("a", "b"), ("b", "c"), ("c", "d"), ("a", "c"), ("d", "e"))
    val got = RandomWalks.walks(edges.toDF("src", "dst"), "src", "dst",
        walksPerNode = 2, len = 3, seed = "t1")
      .as[(String, Int, String)].collect().toSet
    assert(got === brute(edges, 2, 3, "t1"))
  }

  test("walks are deterministic across partitionings and seeds differ") {
    val edges = sym(("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"))
    val df = edges.toDF("src", "dst")
    val a = RandomWalks.walks(df.repartition(1), "src", "dst", 1, 4, "s")
      .as[(String, Int, String)].collect().toSet
    val b = RandomWalks.walks(df.repartition(5), "src", "dst", 1, 4, "s")
      .as[(String, Int, String)].collect().toSet
    assert(a === b)
    val c = RandomWalks.walks(df, "src", "dst", 1, 4, "OTHER")
      .as[(String, Int, String)].collect().toSet
    assert(a !== c) // a different seed must change some step
  }

  test("walk co-occurrence counts match brute-force windowed pairs") {
    val edges = sym(("a", "b"), ("b", "c"), ("c", "d"), ("a", "c"))
    val pos = RandomWalks.walks(edges.toDF("src", "dst"), "src", "dst",
      walksPerNode = 2, len = 3, seed = "t2")
    val got = RandomWalks.walkCooccurrence(pos, window = 2)
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    // brute: rebuild sequences from the serial walk reference
    val walks = brute(edges, 2, 3, "t2").groupBy(_._1)
      .map { case (_, v) => v.toSeq.sortBy(_._2).map(_._3) }
    val want = scala.collection.mutable.Map[(String, String), Long]()
      .withDefaultValue(0L)
    walks.foreach { seq =>
      for (i <- seq.indices; d <- 1 to 2 if i + d < seq.size) {
        want((seq(i), seq(i + d))) += 1
        want((seq(i + d), seq(i))) += 1
      }
    }
    assert(got === want.toMap)
  }

  test("a dead-end node ends its walk early") {
    // directed: a -> b, b has no out-edges
    val edges = Seq(("a", "b")).toDF("src", "dst")
    val got = RandomWalks.walks(edges, "src", "dst", 1, 3, "s")
      .as[(String, Int, String)].collect().toSet
    assert(got === Set(("a#0", 0, "a"), ("a#0", 1, "b")))
  }
}
