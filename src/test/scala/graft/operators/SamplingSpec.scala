package graft.operators

import graft.SparkSpec
import graft.sample.Sampling

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def ids(n: Int) = (1 to n).map(_.toLong).toDF("id")

  test("deterministicSample is partitioning-invariant and ~fraction-sized") {
    val df = ids(10000)
    val a = Sampling.deterministicSample(df, "id", 0.3)
      .as[Long].collect().toSet
    val b = Sampling.deterministicSample(df.repartition(17), "id", 0.3)
      .as[Long].collect().toSet
    assert(a === b)
    assert(math.abs(a.size - 3000) < 300, s"got ${a.size}")
  }

  test("salts give independent samples; split is disjoint and complete") {
    val df = ids(5000)
    val s1 = Sampling.deterministicSample(df, "id", 0.5, salt = "a")
      .as[Long].collect().toSet
    val s2 = Sampling.deterministicSample(df, "id", 0.5, salt = "b")
      .as[Long].collect().toSet
    assert(s1 !== s2)
    val overlap = (s1 & s2).size.toDouble / 5000
    assert(overlap > 0.15 && overlap < 0.35, s"overlap $overlap") // ~0.25
    val (train, holdout) = Sampling.split(df, "id", 0.1)
    val t = train.as[Long].collect().toSet
    val h = holdout.as[Long].collect().toSet
    assert((t & h).isEmpty && (t | h).size === 5000)
  }

  test("stratifiedSample applies per-stratum fractions, drops unlisted strata") {
    val df = (1 to 3000).map(i => (i.toLong, Seq("en", "de", "zh")(i % 3)))
      .toDF("id", "lang")
    val out = Sampling.stratifiedSample(df, "lang", "id",
      Map("en" -> 1.0, "de" -> 0.2))
      .collect().map(r => r.getString(1))
    val byLang = out.groupBy(identity).view.mapValues(_.length).toMap
    assert(byLang("en") === 1000)
    assert(math.abs(byLang("de") - 200) < 80)
    assert(!byLang.contains("zh"))
  }

  test("mixtureResample hits target proportions, keeps binding group whole") {
    // 800 en / 100 de / 100 fr, targets 50/25/25 → de,fr binding (400
    // out max), en thins to ~200; "xx" absent from spec → dropped
    val df = ((1 to 800).map(i => (s"e$i", "en")) ++
      (1 to 100).map(i => (s"d$i", "de")) ++
      (1 to 100).map(i => (s"f$i", "fr")) ++
      (1 to 50).map(i => (s"x$i", "xx"))).toDF("id", "g")
    val out = Sampling.mixtureResample(df, "g", "id",
      Map("en" -> 0.5, "de" -> 0.25, "fr" -> 0.25))
    val counts = out.groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("de") === 100L) // binding groups fully kept
    assert(counts("fr") === 100L)
    assert(!counts.contains("xx"))
    // en keep-rate 200/800; hash-bucket variance at n=800 is a few %
    assert(math.abs(counts("en") - 200L) < 40, s"en=${counts("en")}")
  }

  test("mixtureResample is stable under repartitioning") {
    val df = (1 to 500).map(i => (s"i$i", if (i % 5 == 0) "a" else "b"))
      .toDF("id", "g")
    val a = Sampling.mixtureResample(df, "g", "id",
      Map("a" -> 0.5, "b" -> 0.5))
    val b = Sampling.mixtureResample(df.repartition(17), "g", "id",
      Map("a" -> 0.5, "b" -> 0.5))
    assert(a.exceptAll(b).count() === 0)
    assert(b.exceptAll(a).count() === 0)
  }

  test("capPerGroup caps every group, keeps small groups whole, is stable") {
    val df = ((1 to 100).map(i => (s"a$i", "big")) ++
      (1 to 3).map(i => (s"b$i", "small"))).toDF("id", "g")
    val out = Sampling.capPerGroup(df, "g", "id", cap = 10)
    val counts = out.groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("big") === 10L)
    assert(counts("small") === 3L)
    val again = Sampling.capPerGroup(df.repartition(13), "g", "id", cap = 10)
    assert(out.exceptAll(again).count() === 0)
    assert(again.exceptAll(out).count() === 0)
  }

  test("capPerGroup plan uses map-side WindowGroupLimit (hot-group safety)") {
    val df = (1 to 100).map(i => (s"a$i", "g" + (i % 3))).toDF("id", "g")
    val plan = Sampling.capPerGroup(df, "g", "id", cap = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"no WindowGroupLimit in:\n$plan")
  }

  test("leakageSafeSplit keeps near-dup clusters on one side") {
    import org.apache.spark.sql.functions.col
    val docs = (1L to 200L).toDF("id")
    // every block of 4 consecutive ids is one near-dup cluster
    val clusters = (1L to 200L).map(i => (i, ((i - 1) / 4) * 4 + 1))
      .toDF("id", "cluster_id")
    val out = Sampling.leakageSafeSplit(docs, "id", clusters,
      holdoutFraction = 0.3)
    // same cluster → same split, always
    val perCluster = out
      .join(clusters, Seq("id"))
      .select(col("cluster_id"), col("split")).distinct()
      .groupBy("cluster_id").count()
      .where(col("count") > 1).count()
    assert(perCluster === 0L)
    // both sides populated, and the fraction is cluster-granular
    val holdout = out.where(col("split") === "holdout").count()
    assert(holdout > 0L && holdout < 200L)
    assert(holdout % 4 === 0L) // whole clusters of 4 only
  }

  test("leakageSafeSplit falls back to own id for unclustered docs") {
    import org.apache.spark.sql.functions.col
    val docs = Seq(1L, 2L).toDF("id")
    val clusters = Seq((99L, 99L)).toDF("id", "cluster_id")
    val reps = Sampling.leakageSafeSplit(docs, "id", clusters, 0.5)
      .select(col("id"), col("rep")).as[(Long, Long)].collect().toSet
    assert(reps === Set((1L, 1L), (2L, 2L)))
  }

  test("weightedSample is deterministic and biased toward heavy rows") {
    import org.apache.spark.sql.functions.col
    // one group; half the ids carry 50× the weight
    val df = (1L to 400L).map(i => (0, i, if (i % 2 == 0) 500L else 10L))
      .toDF("g", "id", "w")
    val pick = Sampling.weightedSample(df, "g", "id", "w", k = 50)
      .select(col("id")).as[Long].collect().toSet
    assert(pick.size === 50)
    val heavy = pick.count(_ % 2 == 0)
    assert(heavy > 35, s"heavy rows underrepresented: $heavy/50")
    val again = Sampling.weightedSample(df.repartition(7), "g", "id", "w", 50)
      .select(col("id")).as[Long].collect().toSet
    assert(again === pick)
  }
}
