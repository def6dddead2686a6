package graft.operators

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.functions.TextFunctions
import graft.operators.{AsofJoin, Merge}

/** ScalaCheck properties (SURVEY §5): the subtle operators are checked
  * against naive driver-side reference implementations on random
  * inputs, not just fixed cases. */
class PropertiesSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def holds(p: Prop, n: Int = 12): Unit = {
    val res = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(n).withInitialSeed(42L), p)
    assert(res.passed, res.status.toString)
  }

  test("upsert matches naive keyed merge with COALESCE nulls") {
    val side = Gen.listOf(Gen.zip(Gen.choose(0L, 15L),
        Gen.option(Gen.alphaNumStr.map(_.take(6)))))
      .map(_.distinctBy(_._1)) // keyed tables: one row per key
    holds(Prop.forAll(side, side) { (ex, nw) =>
      val exDf = ex.toDF("k", "v")
      val nwDf = nw.toDF("k", "v")
      val got = Merge.upsert(exDf, nwDf, Seq("k"))
        .collect().map(r => (r.getLong(0), Option(r.getString(1)))).toSet
      val exM = ex.toMap
      val nwM = nw.toMap
      // matched: COALESCE(new, old); one-sided: that side
      val want = (exM.keySet ++ nwM.keySet).map { k =>
        k -> ((nwM.get(k), exM.get(k)) match {
          case (Some(n), Some(e)) => n.orElse(e)
          case (Some(n), None) => n
          case (None, e) => e.flatten
        })
      }
      got == want
    })
  }

  test("shingles expression matches a naive Scala implementation") {
    val text = Gen.listOf(Gen.frequency(
      8 -> Gen.alphaNumChar, 2 -> Gen.const(' '),
      1 -> Gen.oneOf('.', ',', '!', 'ü', '-'))).map(_.mkString)
    holds(Prop.forAll(text) { s =>
      val k = 3
      val cleaned = s.replaceAll("[^a-zA-Z0-9 ]", " ").toLowerCase.trim
      val w = if (cleaned.isEmpty) Seq.empty[String]
        else cleaned.split("\\s+").toSeq
      val want =
        if (w.length < k) Seq(w.mkString(" "))
        else w.sliding(k).map(_.mkString(" ")).toSeq.distinct
      val got = Seq(s).toDF("t")
        .select(TextFunctions.shingles(org.apache.spark.sql.functions.col("t"), k))
        .collect().head.getSeq[String](0)
      got == want
    })
  }

  test("FuzzyJoin PassJoin blocking equals brute force on random strings") {
    import org.apache.spark.sql.functions.{col, levenshtein}
    val word = Gen.choose(0, 6).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    val inputs = Gen.zip(Gen.choose(1, 2),
      Gen.listOfN(8, word).map(_.zipWithIndex.map { case (w, i) => (i.toLong, w) }))
    holds(Prop.forAll(inputs) { case (d, rows) =>
      val df = rows.toDF("id", "s")
      val got = FuzzyJoin.selfPairs(df, "id", "s", d)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val brute = df.alias("a").join(df.alias("b"),
          col("a.id") < col("b.id") &&
            levenshtein(col("a.s"), col("b.s")) <= d)
        .select(col("a.id"), col("b.id"), levenshtein(col("a.s"), col("b.s")))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      got == brute
    }, n = 8)
  }

  test("KthLargest equals sort-based k-th largest on random groups") {
    import org.apache.spark.sql.functions.col
    val inputs = Gen.zip(Gen.choose(1, 8),
      Gen.nonEmptyListOf(Gen.choose(-1000, 1000).map(_.toDouble)))
    holds(Prop.forAll(inputs) { case (k, vs) =>
      val got = vs.map(v => (0, v)).toDF("g", "v").repartition(5)
        .groupBy(col("g"))
        .agg(graft.functions.KthLargest(k)(col("v")).as("kth"))
        .collect().head.getDouble(1)
      val sorted = vs.sorted.reverse
      got == sorted(math.min(k, sorted.size) - 1)
    })
  }

  test("AggMaintain fold equals full aggregate for any batch split") {
    import org.apache.spark.sql.functions.col
    val batch = Gen.listOf(Gen.zip(Gen.choose(0, 3),
      Gen.choose(-100, 100).map(_ / 4.0)))
    holds(Prop.forAll(batch, batch) { (a, b) =>
      def st(xs: List[(Int, Double)]) =
        AggMaintain.state(xs.toDF("g", "v"), "g", "v")
      def key(df: org.apache.spark.sql.DataFrame) =
        df.select(col("g"), col("n"), col("sum_v").cast("double"),
          col("min_v"), col("max_v"))
          .collect().map(_.toSeq).toSet
      if (a.isEmpty && b.isEmpty) true
      else {
        val folded = key(AggMaintain.merge(st(a), st(b)))
        val full = key(st(a ++ b))
        folded == full
      }
    })
  }

  test("star-op connected components match driver-side union-find") {
    // random multigraphs incl. self-loops, chains, and dup edges — the
    // shapes that broke naive CC implementations; 30 node ids keep
    // components overlapping often
    val edges = Gen.nonEmptyListOf(
      Gen.zip(Gen.choose(0L, 29L), Gen.choose(0L, 29L)))
    holds(Prop.forAll(edges) { es =>
      val got = graft.dedup.Dedup.duplicateClusters(es.toDF("id_a", "id_b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // union-find reference
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      es.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      // expected label = MIN member of each component
      val nodes = es.flatMap(e => Seq(e._1, e._2)).distinct
      val minOf = nodes.groupBy(find).map { case (r, ns) => r -> ns.min }
      val want = nodes.map(n => n -> minOf(find(n))).toMap
      got == want
    }, n = 8)
  }

  test("degree-ordered triangle counts match brute-force enumeration") {
    val edgeGen = Gen.listOf(Gen.zip(Gen.choose(0L, 11L), Gen.choose(0L, 11L)))
    holds(Prop.forAll(edgeGen) { raw =>
      val edges = raw.filter { case (a, b) => a != b }
      if (edges.isEmpty) true else {
        val got = graft.graph.Triangles
          .triangleCounts(edges.toDF("s", "d"), "s", "d")
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        spark.catalog.clearCache()
        val und = edges.map { case (a, b) => (a min b, a max b) }.toSet
        val nodes = und.flatMap(e => Set(e._1, e._2))
        val want = nodes.map { n =>
          val others = nodes.toSeq.sorted
          n -> (for {
            x <- others; y <- others
            if x < y && x != n && y != n &&
              und((n min x, n max x)) && und((n min y, n max y)) && und((x, y))
          } yield 1).size.toLong
        }.toMap
        got == want
      }
    }, n = 8)
  }

  test("cmsJoinSizeEstimate never underestimates and is exact sans collisions") {
    val keys = Gen.nonEmptyListOf(Gen.choose(0L, 30L))
    holds(Prop.forAll(keys, keys) { (l, r) =>
      {
        val est = graft.sketch.Sketches.cmsJoinSizeEstimate(
            l.toDF("k"), "k", r.toDF("k"), "k", depth = 4, width = 4096)
          .head().getLong(0)
        val lc = l.groupBy(identity).view.mapValues(_.size.toLong)
        val rc = r.groupBy(identity).view.mapValues(_.size.toLong)
        val exact = lc.keys.map(k => lc(k) * rc.getOrElse(k, 0L)).sum
        // 31 possible keys in 4096 buckets: collisions essentially never
        // fire at this size, so the bound should be TIGHT — and the
        // inequality must hold regardless
        est >= exact && est == exact
      }
    }, n = 10)
  }

  test("skipgramCounts equals brute-force windowed pairs on random docs") {
    val doc = Gen.listOf(Gen.oneOf("a", "b", "c", "d"))
    holds(Prop.forAll(Gen.nonEmptyListOf(doc).map(_.take(5))) { docs =>
      {
        val df = docs.zipWithIndex
          .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
          .toDF("doc_id", "text")
        val got = graft.functions.Vocab.skipgramCounts(df, "doc_id", "text",
            window = 2)
          .collect().map(r => ((r.getString(0), r.getString(1)),
            r.getLong(2))).toMap
        val want = docs.flatMap { ws =>
          (1 to 2).flatMap(d => ws.drop(d).zip(ws).map(_.swap))
        }.groupBy(identity).view.mapValues(_.size.toLong).toMap
        got == want
      }
    }, n = 10)
  }

  test("asofJoinTolerance matches brute force on random series") {
    // right side: distinct (key, ts) like a real series; left ids unique
    val rightGen = Gen.listOf(Gen.zip(Gen.oneOf("u", "v"),
        Gen.choose(0L, 200L), Gen.choose(0.0, 9.0)))
      .map(_.distinctBy(x => (x._1, x._2)))
    val leftGen = Gen.listOf(Gen.zip(Gen.choose(0L, 100L),
        Gen.oneOf("u", "v"), Gen.choose(0L, 200L)))
      .map(_.distinctBy(_._1))
    holds(Prop.forAll(leftGen, rightGen) { (l, r) =>
      val out = AsofJoin.asofJoinTolerance(l.toDF("id", "k", "ts"),
          r.toDF("k", "ts", "px"), Seq("k"), "ts", Seq("px"),
          tolerance = org.apache.spark.sql.functions.lit(30L))
        .collect()
        .map(row => (row.getLong(row.fieldIndex("id")),
          Option(row.get(row.fieldIndex("px"))))).toSet
      // the LATEST at-or-before row decides; stale latest nulls the
      // match (never falls back to an older fresh row)
      val want = l.map { case (id, k, ts) =>
        val latest = r.filter(x => x._1 == k && x._2 <= ts)
          .maxByOption(_._2)
        (id, latest.collect {
          case (_, rts, px) if ts - rts <= 30L => px
        }: Option[Any])
      }.toSet
      out == want
    }, n = 10)
  }

  test("label propagation matches serial synchronous LPA on random graphs") {
    val edgeGen = Gen.listOfN(14, Gen.zip(Gen.choose(0, 9), Gen.choose(0, 9)))
      .map(_.filter(e => e._1 != e._2)
        .flatMap { case (a, b) => Seq(("n" + a, "n" + b), ("n" + b, "n" + a)) }
        .distinct)
      .suchThat(_.nonEmpty)
    holds(Prop.forAll(edgeGen) { edges =>
      val got = graft.graph.LabelProp
        .propagate(edges.toDF("src", "dst"), "src", "dst", iters = 2)
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
      var labels = nodes.map(n => n -> n).toMap
      for (_ <- 1 to 2) {
        val votes = edges.map { case (s, d) => d -> labels(s) } ++ labels.toSeq
        val grouped = votes.groupBy(_._1)
        labels = nodes.map { n =>
          n -> grouped(n).map(_._2).groupBy(identity)
            .map { case (l, o) => (l, o.size) }
            .minBy { case (l, c) => (-c, l) }._1
        }.toMap
      }
      got == labels
    }, n = 8)
  }

  test("Bradley-Terry fixed point matches serial integer MM on random games") {
    val gameGen = Gen.listOfN(20, Gen.zip(Gen.choose(0L, 5L), Gen.choose(0L, 5L)))
      .map(_.filter(g => g._1 != g._2)).suchThat(_.nonEmpty)
    holds(Prop.forAll(gameGen) { games =>
      val got = graft.sample.Preference
        .bradleyTerry(games.toDF("w", "l"), "w", "l", iters = 2)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
        .toMap
      val items = (games.map(_._1) ++ games.map(_._2)).distinct
      val nIj = scala.collection.mutable.Map[(Long, Long), Long]().withDefaultValue(0L)
      val wIj = scala.collection.mutable.Map[(Long, Long), Long]().withDefaultValue(0L)
      games.foreach { case (w, l) => nIj((w, l)) += 1; nIj((l, w)) += 1; wIj((w, l)) += 1 }
      val wins = items.map(i => i -> items.filter(_ != i).map(j => wIj((i, j))).sum).toMap
      val ng = items.map(i => i -> items.filter(_ != i).map(j => nIj((i, j))).sum).toMap
      var s = items.map(_ -> 1000000L).toMap
      for (_ <- 1 to 2) {
        s = items.map { i =>
          val denom = items.filter(j => j != i && nIj((i, j)) > 0)
            .map(j => (nIj((i, j)) * 1000000000000L) / (s(i) + s(j))).sum
          i -> (if (denom == 0) 0L else (wins(i) * 1000000000000L) / denom)
        }.toMap
      }
      got == items.map(i => i -> ((ng(i), wins(i), s(i)))).toMap
    }, n = 8)
  }

  test("BPE training matches serial merge learning on random corpora") {
    val docGen = Gen.listOfN(6, Gen.listOfN(5,
        Gen.oneOf("ab", "aab", "abc", "ba", "cab", "abab", "aa"))
      .map(_.mkString(" ")))
    holds(Prop.forAll(docGen) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      // serial reference: same argmax tie-break + greedy-left apply
      val counts = texts.flatMap(_.split(" ")).groupBy(identity)
        .map { case (w, o) => w -> o.size.toLong }
      var types: Map[String, (Long, Seq[String])] =
        counts.map { case (w, n) => w -> (n, w.map(_.toString)) }.toMap
      val expect = scala.collection.mutable.ArrayBuffer
        .empty[(Int, String, String, Long)]
      var r = 1
      var done = false
      while (r <= 4 && !done) {
        val pc = scala.collection.mutable.Map[(String, String), Long]()
          .withDefaultValue(0L)
        types.values.foreach { case (n, s) =>
          s.sliding(2).filter(_.size == 2).foreach(p => pc((p(0), p(1))) += n)
        }
        if (pc.isEmpty) done = true
        else {
          val ((a, b), c) = pc.toSeq.minBy { case ((a, b), c) => (-c, a, b) }
          expect += ((r, a, b, c))
          types = types.map { case (w, (n, s)) =>
            w -> (n, s.foldLeft(Vector.empty[String]) { (acc, x) =>
              if (acc.nonEmpty && acc.last == a && x == b) acc.init :+ (a + b)
              else acc :+ x
            })
          }
          r += 1
        }
      }
      val model = graft.functions.Bpe.train(
        graft.functions.Bpe.wordTypes(docs.toDF("doc_id", "text"), "text"), 4)
      model.merges == expect.toSeq
    }, n = 6)
  }

  test("NB classification matches the serial micro-nat argmin on random docs") {
    val word = Gen.oneOf("aa", "bb", "cc", "dd", "ee")
    val docGen = Gen.listOfN(6, Gen.zip(
      Gen.listOfN(4, word).map(_.mkString(" ")), Gen.oneOf("x", "y")))
      .suchThat(d => d.map(_._2).distinct.size >= 1)
    holds(Prop.forAll(docGen) { rows =>
      val docs = rows.zipWithIndex.map { case ((t, l), i) => (i.toLong, t, l) }
      val tok = docs.flatMap { case (id, t, l) => t.split(" ").map(w => (l, w)) }
      val nWc = tok.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
        .withDefaultValue(0L)
      val nC = tok.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
      val vocab = tok.map(_._2).distinct.size.toLong
      val nDocs = docs.groupBy(_._3).map { case (k, v) => k -> v.size.toLong }
      val classes = nDocs.keys.toSeq.sorted
      val expect = docs.map { case (id, t, _) =>
        val costs = classes.map { c =>
          val pc = math.round(math.log(docs.size.toDouble / nDocs(c)) * 1e6)
          val wcost = t.split(" ").map { w =>
            math.round(math.log((nC(c) + vocab).toDouble / (nWc((c, w)) + 1.0)) * 1e6)
          }.sum
          c -> (pc + wcost)
        }
        val (pred, cost) = costs.minBy { case (c, k) => (k, c) }
        id -> ((pred, cost))
      }.toMap
      val got = graft.classify.NaiveBayes.classify(
          docs.toDF("doc_id", "text", "lang"), "doc_id", "text", "lang")
        .collect().map(r => r.getLong(0) -> ((r.getString(2), r.getLong(3))))
        .toMap
      got == expect
    }, n = 6)
  }
}
