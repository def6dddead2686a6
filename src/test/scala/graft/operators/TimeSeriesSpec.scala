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
