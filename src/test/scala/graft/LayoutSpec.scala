package graft

import org.apache.spark.sql.functions._
import graft.ops.Layout

class LayoutSpec extends SparkTestBase {
  import spark.implicits._

  test("zValue2 interleaves bits: known Morton codes and order-preservation on tiles") {
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (7L, 0L), (0L, 7L), (5L, 3L))
      .toDF("a", "b")
      .withColumn("z", Layout.zValue2(col("a"), col("b"), bits = 4))
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Long]("z")).toMap
    // hand-computed Morton codes: a takes even bit positions, b odd
    assert(got((0L, 0L)) == 0L)
    assert(got((1L, 0L)) == 1L)
    assert(got((0L, 1L)) == 2L)
    assert(got((1L, 1L)) == 3L)
    assert(got((7L, 0L)) == 21L)  // 0b010101
    assert(got((0L, 7L)) == 42L)  // 0b101010
    assert(got((5L, 3L)) == 27L)  // interleave(101, 011) = 0b011011
  }

  test("zorderLayout buckets are tight 64x64 tiles on lineitem") {
    val li = graft.ops.Relational.table(spark, "/root/testdata/sf0.001", "lineitem")
    val rows = Layout.zorderLayout(li).collect()
    assert(rows.nonEmpty)
    // zval >> 12 buckets own a 2^6 x 2^6 axis-aligned tile: both spans < 64.
    // In a plain (l_partkey, l_suppkey) sort the suppkey span would be
    // domain-wide in every partkey run — this narrowness IS the z-order win.
    rows.foreach { r =>
      val pSpan = r.getAs[Long]("part_hi") - r.getAs[Long]("part_lo")
      val sSpan = r.getAs[Long]("supp_hi") - r.getAs[Long]("supp_lo")
      assert(pSpan >= 0 && pSpan < 64, s"bucket ${r.get(0)}: part span $pSpan")
      assert(sSpan >= 0 && sSpan < 64, s"bucket ${r.get(0)}: supp span $sSpan")
    }
    // tiles must partition the rows: total count equals the scan count
    assert(rows.map(_.getAs[Long]("n")).sum == li.count())
  }

  test("clusterByZ range-partitions by the Morton key with in-partition sort") {
    val li = graft.ops.Relational.table(spark, "/root/testdata/sf0.001", "lineitem")
      .select(col("l_partkey"), col("l_suppkey"))
    val out = Layout.clusterByZ(li, "l_partkey", "l_suppkey", nFiles = 8)
    // each output partition holds a contiguous, internally sorted z range
    val perPart = out.select(spark_partition_id().as("pid"), col("zval"))
      .groupBy("pid").agg(min("zval").as("lo"), max("zval").as("hi"), count(lit(1)).as("n"))
      .collect().map(r => (r.getAs[Int]("pid"), r.getAs[Long]("lo"), r.getAs[Long]("hi")))
      .sortBy(_._1)
    assert(perPart.length > 1)
    // ranges are disjoint and ordered across partition ids
    perPart.sliding(2).foreach {
      case Array((_, _, hi1), (_, lo2, _)) => assert(hi1 <= lo2, s"overlap: $hi1 > $lo2")
      case _ =>
    }
    // within a partition rows are sorted by zval
    val sortedWithin = out.mapPartitions { it =>
      val zs = it.map(_.getAs[Long]("zval")).toArray
      Iterator.single(zs.sameElements(zs.sorted))
    }(org.apache.spark.sql.Encoders.scalaBoolean).collect()
    assert(sortedWithin.forall(identity))
  }

  test("encodingAdvisor: dictionary wins on wide low-NDV columns, loses on key columns") {
    val orders = (0 until 100)
      .map(i => (i.toLong, (i % 10).toLong, "O", "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")
    val out = Layout.encodingAdvisor(orders).collect()
      .map(r => (r.getAs[String]("col_name"), (r.getAs[Long]("n_rows"),
        r.getAs[Long]("ndv"), r.getAs[Long]("raw_bytes"),
        r.getAs[Long]("avg_len_e2"), r.getAs[Long]("dict_bytes"),
        r.getAs[Boolean]("dict_saves")))).toMap
    // unique key as text: "0".."99" = 10·1 + 90·2 bytes; dictionary is
    // pure overhead (4-byte codes + the full value set again)
    assert(out("o_orderkey") == (100L, 100L, 190L, 190L, 900L, false))
    // 8-char priority with NDV 1: 4-byte codes + a 12-byte dictionary
    assert(out("o_orderpriority") == (100L, 1L, 800L, 800L, 412L, true))
    // 1-char status: codes alone exceed the raw bytes — advisor says no
    assert(out("o_orderstatus")._6 == false)
  }

  test("compactionPlan: exclusive-prefix binning conserves files and bytes") {
    // five "file" days sized 600/500/300/200/100 cents; target 700 →
    // exclusive prefixes 0/600/1100/1400/1600 → bins 0,0,1,2,2
    val rows = Seq(
      (1L, 6.00, "2024-01-01"), (2L, 5.00, "2024-01-02"),
      (3L, 3.00, "2024-01-03"), (4L, 2.00, "2024-01-04"),
      (5L, 1.00, "2024-01-05"))
    val orders = rows.map { case (k, p, d) =>
      (k, p, java.sql.Timestamp.valueOf(d + " 00:00:00")) }
      .toDF("o_orderkey", "o_totalprice", "o_orderdate")
    val out = Layout.compactionPlan(orders, targetBytes = 700L)
      .select(col("bin_id"), col("n_files"), col("bin_bytes"))
      .as[(Long, Long, Long)].collect().toSeq
    assert(out == Seq((0L, 2L, 1100L), (1L, 1L, 300L), (2L, 2L, 300L)))
    assert(out.map(_._2).sum == 5L && out.map(_._3).sum == 1700L)
  }
}
