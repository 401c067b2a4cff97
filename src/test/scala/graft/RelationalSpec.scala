package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.ops.Relational

class RelationalSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val orders = Seq(
    (1L, 10L, "O", 100.0, ts("1996-01-01 00:00:00"), "1-URGENT"),
    (2L, 10L, "O", 300.0, ts("1996-02-01 00:00:00"), "1-URGENT"),
    (3L, 10L, "F", 200.0, ts("1996-03-01 00:00:00"), "2-HIGH"),
    (4L, 10L, "F", 400.0, ts("1996-04-01 00:00:00"), "2-HIGH"),
    (5L, 20L, "O", 50.0, ts("1996-05-01 00:00:00"), "3-MEDIUM")
  ).toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
    "o_orderdate", "o_orderpriority")

  test("top-k per customer via window rank") {
    val out = Relational.topOrdersPerCustomer(orders, k = 2).collect()
      .map(r => (r.getAs[Long]("o_custkey"), r.getAs[Long]("o_orderkey"), r.getAs[Long]("rnk")))
    assert(out.toSeq == Seq((10L, 4L, 1L), (10L, 2L, 2L), (20L, 5L, 1L)))
  }

  test("typed top-k Aggregator matches the window-function formulation") {
    val viaWindow = Relational.topOrdersPerCustomer(orders, k = 2).collect().toSeq
    val viaAgg = Relational.topOrdersPerCustomerAgg(orders, k = 2).collect().toSeq
    assert(viaWindow == viaAgg)
    // and on real data
    val o = Relational.table(spark, "/root/testdata/sf0.001", "orders")
    val w = Relational.topOrdersPerCustomer(o).collect().toSeq
    val a = Relational.topOrdersPerCustomerAgg(o).collect().toSeq
    assert(w == a)
  }

  test("rollup emits subtotal and grand-total rows") {
    val out = Relational.orderStatusRollup(orders).collect()
    // 3 (status,priority) combos + 2 status subtotals + 1 grand total
    assert(out.length == 6)
    val grand = out.head // nulls sort first
    assert(grand.isNullAt(0) && grand.isNullAt(1))
    assert(grand.getAs[Long]("n") == 5)
    assert(grand.getAs[Double]("total") == 1050.0)
  }

  test("anti join keeps only customers with no orders") {
    val customer = Seq((10L, "A"), (20L, "B"), (30L, "C"))
      .toDF("c_custkey", "c_name")
    val out = Relational.customersWithoutOrders(customer, orders)
      .as[(Long, String)].collect()
    assert(out.toSeq == Seq((30L, "C")))
  }

  test("pricing summary computes exact decimal-routed sums") {
    val li = Seq(
      (1L, 1L, 1L, 1, 10.0, 100.0, 0.1, 0.02, "A", "F", ts("1996-01-01 00:00:00")),
      (1L, 2L, 1L, 2, 20.0, 200.0, 0.0, 0.02, "A", "F", ts("1996-01-02 00:00:00"))
    ).toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
      "l_quantity", "l_extendedprice", "l_discount", "l_tax",
      "l_returnflag", "l_linestatus", "l_shipdate")
    val r = Relational.pricingSummary(li).head()
    assert(r.getAs[Double]("sum_qty") == 30.0)
    assert(r.getAs[Double]("sum_base_price") == 300.0)
    assert(r.getAs[Double]("sum_disc_price") == 90.0 + 200.0)
    assert(r.getAs[Long]("count_order") == 2)
  }
}
