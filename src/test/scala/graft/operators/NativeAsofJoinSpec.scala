package graft.operators

import graft.SparkSpec
import graft.plans.NativeAsofJoin
import org.apache.spark.sql.functions._

class NativeAsofJoinSpec extends SparkSpec {
  import spark.implicits._

  private def quotes = Seq(
    // (sym, ts, px)
    ("A", 10L, 1.0), ("A", 20L, 2.0), ("A", 30L, 3.0),
    ("B", 15L, 9.0)
  ).toDF("qsym", "qts", "px")

  private def trades = Seq(
    // (sym, ts, qty)
    ("A", 5L, 100L),  // before any quote → null px
    ("A", 20L, 200L), // exactly at quote 20 → inclusive match, px=2
    ("A", 25L, 300L), // between 20 and 30 → px=2
    ("A", 99L, 400L), // after all → px=3
    ("B", 15L, 500L), // exact → 9.0
    ("C", 50L, 600L)  // key with no quotes at all → null
  ).toDF("sym", "tts", "qty")

  test("matches latest right row at-or-before each left ts, nulls otherwise") {
    val out = NativeAsofJoin
      .asofJoin(trades, quotes, Seq("sym"), Seq("qsym"), "tts", "qts")
      .select($"sym", $"tts", $"qty", $"px")
      .orderBy($"sym", $"tts")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
      .toSeq
    assert(out == Seq(
      ("A", 5L, 100L, None),
      ("A", 20L, 200L, Some(2.0)),
      ("A", 25L, 300L, Some(2.0)),
      ("A", 99L, 400L, Some(3.0)),
      ("B", 15L, 500L, Some(9.0)),
      ("C", 50L, 600L, None)))
  }

  test("plans the custom exec (no nested-loop join), with required sorts") {
    // SparkPlan.nodeName strips the Exec suffix, so the physical node
    // prints as "AsofJoin" followed by its key lists
    val plan = NativeAsofJoin
      .asofJoin(trades, quotes, Seq("sym"), Seq("qsym"), "tts", "qts")
      .queryExecution.executedPlan.toString
    assert(plan.contains("AsofJoin ["))
    assert(!plan.contains("NestedLoop"))
    assert(plan.contains("Sort"))
  }

  test("agrees with the union+window composition on the events fixture") {
    val ev = graft.Tables(spark, sf, "events")
    val clicks = ev.where($"event_type" === "click")
      .select($"event_id", $"user_id", $"ts")
    val views = ev.where($"event_type" === "view")
      .select($"user_id".as("v_user"), $"ts".as("vts"),
        $"value".as("asof_value"))
    val native = NativeAsofJoin
      .asofJoin(clicks, views, Seq("user_id"), Seq("v_user"), "ts", "vts")
      .select($"event_id", $"asof_value")
    val composed = AsofJoin.asofJoin(clicks,
      views.select($"v_user".as("user_id"), $"vts".as("ts"), $"asof_value"),
      Seq("user_id"), "ts", Seq("asof_value"))
      .select($"event_id", $"asof_value")
    val n = native.collect().map(r =>
      (r.getLong(0), Option(r.get(1)))).toSeq.sortBy(_._1)
    val c = composed.collect().map(r =>
      (r.getLong(0), Option(r.get(1)))).toSeq.sortBy(_._1)
    assert(n.nonEmpty && n == c)
  }
}
