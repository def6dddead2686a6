package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SkewJoinSpec extends SparkSpec {

  import spark.implicits._

  // 1 hot key (900 rows) + a long tail; small dim with extras
  private lazy val big = ((1 to 900).map(i => (7L, i.toLong)) ++
    (1 to 100).map(i => (i.toLong % 13, 1000L + i)))
    .toDF("k", "row_id")
  private lazy val dim = (0 to 20).map(i => (i.toLong, s"name$i"))
    .toDF("k", "name")

  test("salted inner join equals plain inner join") {
    val plain = big.join(dim, Seq("k"), "inner")
    val salted = SkewJoin.saltedJoin(big, dim, Seq("k"), "row_id", salts = 4)
    assert(salted.columns.toSeq === plain.columns.toSeq)
    assert(salted.exceptAll(plain).count() === 0)
    assert(plain.exceptAll(salted).count() === 0)
  }

  test("salted left_outer preserves unmatched big rows exactly once") {
    val bigWithMiss = big.union(Seq((99L, 5000L)).toDF("k", "row_id"))
    val plain = bigWithMiss.join(dim, Seq("k"), "left_outer")
    val salted = SkewJoin.saltedJoin(bigWithMiss, dim, Seq("k"), "row_id",
      salts = 4, joinType = "left_outer")
    assert(salted.exceptAll(plain).count() === 0)
    assert(plain.exceptAll(salted).count() === 0)
    assert(salted.where(col("k") === 99L).count() === 1L)
  }

  test("rejects right/full outer") {
    intercept[IllegalArgumentException] {
      SkewJoin.saltedJoin(big, dim, Seq("k"), "row_id", 4, "full_outer")
    }
  }

  test("a user column named __salt survives salting untouched") {
    val bigSalt = big.withColumn("__salt", lit("mine"))
    val out = SkewJoin.saltedJoin(bigSalt, dim, Seq("k"), "row_id", salts = 4)
    assert(out.columns.count(_ == "__salt") === 1)
    assert(out.select("__salt").distinct().as[String].collect().toSeq === Seq("mine"))
    assert(out.count() === big.join(dim, Seq("k"), "inner").count())
  }

  test("shuffle is keyed by (key, salt) when the small side can't broadcast") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plan = SkewJoin.saltedJoin(big, dim, Seq("k"), "row_id", salts = 4)
        .queryExecution.executedPlan.toString
      assert(plan.contains("__salt"), s"salt column absent from plan:\n$plan")
      assert("hashpartitioning\\(k#\\d+L?, __salt".r.findFirstIn(plan).isDefined,
        s"exchange not keyed by (k, __salt):\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
