package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col

import graft.SparkSpec

class TimeSeriesSpec extends AnyFunSuite with SparkSpec {

  test("depth-3 weights are 4,2,1 with renormalized early rows") {
    import spark.implicits._
    val df = Seq((1L, 1L, 10.0), (1L, 2L, 20.0), (1L, 3L, 30.0),
        (1L, 4L, 40.0))
      .toDF("k", "t", "x")
    val got = TimeSeries
      .truncatedEwma(df, col("k"), col("x"), depth = 3, col("t"))
      .orderBy("t").select("ewma").as[Double].collect().toSeq
    assert(got(0) === 10.0)                    // 4·10/4
    assert(got(1) === (4 * 20 + 2 * 10) / 6.0) // 100/6
    assert(got(2) === (4 * 30 + 2 * 20 + 10) / 7.0)
    assert(got(3) === (4 * 40 + 2 * 30 + 20) / 7.0)
  }

  test("keys are independent and order columns break ties") {
    import spark.implicits._
    val df = Seq((1L, 1L, 100.0), (2L, 1L, 1.0), (2L, 2L, 3.0))
      .toDF("k", "t", "x")
    val got = TimeSeries
      .truncatedEwma(df, col("k"), col("x"), depth = 2, col("t"))
      .orderBy("k", "t").select("ewma").as[Double].collect().toSeq
    assert(got === Seq(100.0, 1.0, (2 * 3 + 1) / 3.0))
  }

  test("null values propagate: null row → null ewma, null lag skipped") {
    import spark.implicits._
    val df = Seq((1L, 1L, Some(10.0)), (1L, 2L, None), (1L, 3L, Some(30.0)))
      .toDF("k", "t", "x")
    val got = TimeSeries
      .truncatedEwma(df, col("k"), col("x"), depth = 3, col("t"))
      .orderBy("t").select("ewma").as[Option[Double]].collect().toSeq
    assert(got(0) === Some(10.0)) // first row, renormalized
    assert(got(1) === None)       // own value null → null, not NaN/0
    // lag-1 (null) contributes weight 0; lag-2 carries the 10
    assert(got(2) === Some((4 * 30 + 1 * 10) / 5.0))
  }

  test("all-null first row emits null ewma, not NaN (0/0 guard)") {
    import spark.implicits._
    val df = Seq((1L, 1L, None: Option[Double])).toDF("k", "t", "x")
    val got = TimeSeries
      .truncatedEwma(df, col("k"), col("x"), depth = 3, col("t"))
      .select("ewma").as[Option[Double]].collect().head
    assert(got === None)
  }

  test("decimal truncation is at 4 places") {
    import spark.implicits._
    val df = Seq((1L, 1L, 1.00006)).toDF("k", "t", "x")
    val got = TimeSeries
      .truncatedEwma(df, col("k"), col("x"), depth = 4, col("t"))
      .select("ewma").as[Double].collect().head
    // 1.00006 → DECIMAL(18,4) rounds to 1.0001 (clearly off the
    // half-way boundary, so binary representation noise is moot)
    assert(got === 1.0001)
  }
}
