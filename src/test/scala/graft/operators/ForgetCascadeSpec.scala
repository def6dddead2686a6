package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.functions.Privacy
import graft.functions.Privacy.CascadeLevel

class ForgetCascadeSpec extends AnyFunSuite with SparkSpec {

  test("cascade counts parent, child, and grandchild purges in order") {
    import spark.implicits._
    val customers = Seq(1L, 2L, 3L).toDF("ck")
    val orders = Seq((10L, 1L), (11L, 1L), (12L, 2L), (13L, 3L))
      .toDF("ok", "ck")
    val items = Seq((10L, "a"), (10L, "b"), (11L, "c"), (12L, "d"),
        (13L, "e"))
      .toDF("ok", "sku")
    val seeds = Seq(1L, 3L, 99L).toDF("ck") // 99 matches nothing
    val got = Privacy.forgetCascade(seeds, "ck", Seq(
        CascadeLevel("customers", customers, "ck", Some("ck")),
        CascadeLevel("orders", orders, "ck", Some("ok")),
        CascadeLevel("items", items, "ok", None)))
      .orderBy("level")
      .as[(Int, String, Long)].collect().toSeq
    // customer 1 → orders 10,11 → items a,b,c; customer 3 → 13 → e
    assert(got === Seq((1, "customers", 2L), (2, "orders", 3L),
      (3, "items", 4L)))
  }

  test("an empty seed purges nothing anywhere") {
    import spark.implicits._
    val customers = Seq(1L).toDF("ck")
    val orders = Seq((10L, 1L)).toDF("ok", "ck")
    val seeds = Seq.empty[Long].toDF("ck")
    val got = Privacy.forgetCascade(seeds, "ck", Seq(
        CascadeLevel("customers", customers, "ck", Some("ck")),
        CascadeLevel("orders", orders, "ck", None)))
      .orderBy("level")
      .as[(Int, String, Long)].collect().toSeq
    assert(got === Seq((1, "customers", 0L), (2, "orders", 0L)))
  }
}
