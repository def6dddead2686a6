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

  test("suggestSalts sizes the salt count from the measured hot key") {
    // hot key 7 = 900 planted rows + 8 tail hits (i % 13 == 7) = 908;
    // at 100 rows/task that key needs ceil(908/100) = 10 reducers
    assert(SkewJoin.suggestSalts(big, Seq("k"), 100L) === 10)
    // unskewed (hot ≤ target) → 1: salting would only replicate
    assert(SkewJoin.suggestSalts(dim, Seq("k"), 100L) === 1)
    assert(SkewJoin.suggestSalts(big.limit(0), Seq("k"), 100L) === 1)
  }

  test("salting removes the straggler on a 90%-hot fixture (plain vs salted)") {
    // 400k rows, 90% on key 7 — the one-giant-customer shape. Broadcast
    // and AQE off so both plans are bare sort-merge joins: what a
    // shuffle join degrades to when the small side outgrows broadcast.
    val n = 400000L
    val bigSkew = spark.range(n).select(
      when(col("id") % 10 < 9, 7L).otherwise(col("id") % 1000).as("k"),
      col("id").as("row_id"))
    val dim1k = spark.range(1000).select(col("id").as("k"),
      concat(lit("name"), col("id")).as("name"))
    val confs = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.enabled", "spark.sql.shuffle.partitions")
    val prev = confs.map(k => k -> spark.conf.get(k))
    try {
      spark.conf.set(confs(0), "-1")
      spark.conf.set(confs(1), "false")
      // 16 reducers (not the suite's 4): with partitions ≈ salts the
      // (key, salt) buckets hash-collide onto the same reducer and
      // mask the split this test measures
      spark.conf.set(confs(2), "16")
      val salts = SkewJoin.suggestSalts(bigSkew, Seq("k"), 45000L)
      assert(salts === 8) // measured: hot=360k, 45k/task → 8 reducers
      val plain = bigSkew.join(dim1k, Seq("k"), "inner")
      val salted = SkewJoin.saltedJoin(bigSkew, dim1k, Seq("k"), "row_id", salts)

      // wall clock (informational: box noise can be ±2×, so the hard
      // assert below is on the deterministic straggler metric instead)
      def time(df: org.apache.spark.sql.DataFrame): Double = {
        val t0 = System.nanoTime()
        df.queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }
      val (tPlain, tSalted) = (time(plain), time(salted))
      info(f"plain=$tPlain%.2fs salted=$tSalted%.2fs (salts=$salts)")

      // the straggler itself, measured: rows in the fullest join
      // partition. Plain puts all 360k hot rows on one reducer;
      // salting must cut the max near 1/salts.
      def maxPart(df: org.apache.spark.sql.DataFrame): Long = df.queryExecution
        .toRdd.mapPartitions(it => Iterator(it.size.toLong)).collect().max
      val (mPlain, mSalted) = (maxPart(plain), maxPart(salted))
      info(s"max join-partition rows: plain=$mPlain salted=$mSalted")
      assert(mPlain >= 360000L, "fixture lost its hot key")
      assert(mSalted * 2 <= mPlain,
        s"salting did not split the hot key: $mSalted vs $mPlain")

      // same result: row count + order-independent content checksum
      // (bit_xor, not sum — an ANSI long sum of 400k hashes overflows)
      def sig(df: org.apache.spark.sql.DataFrame) = df
        .select(xxhash64(col("k"), col("row_id"), col("name")).as("h"))
        .agg(count(lit(1)), expr("bit_xor(h)"))
        .head()
      assert(sig(salted) === sig(plain))
    } finally prev.foreach { case (k, v) => spark.conf.set(k, v) }
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
