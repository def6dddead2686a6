package graft.operators

import graft.SparkSpec
import graft.sketch.Sketches

class HllSpec extends SparkSpec {

  import spark.implicits._

  private def hash64(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString.take(15)
    java.lang.Long.parseLong(hex, 16)
  }

  /** Serial reference of hllDistinctByKey's exact-integer contract. */
  private def brute(values: Seq[String]): Long = {
    val regs = Array.fill(64)(0)
    values.foreach { v =>
      val h = hash64(v)
      val bucket = (h / 18014398509481984L).toInt
      val w = h % 18014398509481984L
      val rho = if (w == 0) 55 else 55 - java.lang.Long.toBinaryString(w).length
      regs(bucket) = math.max(regs(bucket), rho)
    }
    val s = regs.map(r => 1L << (55 - r)).sum
    val v0 = regs.count(_ == 0)
    val raw = (BigInt(2904064) * (BigInt(1) << 55) / (BigInt(1000) * s)).toLong
    if (raw <= 160 && v0 > 0) math.round(64.0 * math.log(64.0 / v0))
    else raw
  }

  test("matches the serial reference and stays within HLL error bounds") {
    val data = (1 to 3000).map(i => ("g" + (i % 3), "v" + (i % (100 * (1 + i % 3)))))
    val got = Sketches.hllDistinctByKey(data.toDF("k", "v"), "k", "v")
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    data.groupBy(_._1).foreach { case (k, rows) =>
      val vals = rows.map(_._2).distinct
      val (est, exact) = got(k)
      assert(exact === vals.size.toLong, s"exact for $k")
      assert(est === brute(rows.map(_._2)), s"reference for $k")
      // m=64 standard error is ~13%; 40% is a generous determinism-
      // safe bound (the estimate itself is exact vs the reference)
      assert(math.abs(est - exact).toDouble / exact < 0.4, s"error for $k: est=$est exact=$exact")
    }
  }

  test("small cardinalities take the linear-counting branch near-exactly") {
    val data = (1 to 500).map(i => ("k", "v" + (i % 7)))
    val got = Sketches.hllDistinctByKey(data.toDF("k", "v"), "k", "v")
      .as[(String, Long, Long)].collect().head
    assert(got._3 === 7L)
    assert(math.abs(got._2 - 7L) <= 1L) // linear counting at V≈57/64
  }

  test("registers merge by max: union equals recombined halves") {
    // the operator over the union must equal the brute merge of the
    // halves' register arrays — mergeability is the sketch contract
    val a = (1 to 400).map(i => ("k", "a" + i))
    val b = (200 to 600).map(i => ("k", if (i <= 400) "a" + i else "b" + i))
    val together = Sketches.hllDistinctByKey((a ++ b).toDF("k", "v"), "k", "v")
      .as[(String, Long, Long)].collect().head
    assert(together._2 === brute((a ++ b).map(_._2)))
  }
}
