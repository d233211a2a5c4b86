package graft

import org.apache.spark.sql.functions._
import graft.sql.KerfSql

/** The textual surface the reference parses but never evaluates
  * (/root/reference/parser.h:541–567) — here it runs. */
class KerfSqlSpec extends SparkSpec {

  private lazy val init: Unit = {
    Tables.orders(spark, sf).createOrReplaceTempView("orders_v")
    Tables.lineitem(spark, sf).createOrReplaceTempView("lineitem_v")
  }

  test("select with where/group/order/limit lowers to DataFrame ops") {
    init
    val got = KerfSql.run(spark,
      "select l_returnflag, sum(l_quantity) as sq, count(*) as n " +
      "from lineitem_v where l_discount >= 0.05 group l_returnflag order l_returnflag")
    val want = Tables.lineitem(spark, sf)
      .filter(col("l_discount") >= 0.05)
      .groupBy(col("l_returnflag"))
      .agg(sum("l_quantity").as("sq"), count(lit(1)).as("n"))
      .orderBy("l_returnflag")
    assert(got.collect().toSeq == want.collect().toSeq)
  }

  test("kerf temporal literal in predicate (2024.01.05 form)") {
    init
    val got = KerfSql.run(spark,
      "select count(*) as n from orders_v where o_orderdate < 1994.01.01")
    val want = Tables.orders(spark, sf)
      .filter(col("o_orderdate") < lit("1994-01-01")).count()
    assert(got.collect()(0).getLong(0) == want)
  }

  test("q-style descending order: order -o_totalprice limit 3") {
    init
    val got = KerfSql.run(spark,
      "select o_orderkey, o_totalprice from orders_v order -o_totalprice, o_orderkey limit 3")
      .collect().map(_.getDouble(1)).toSeq
    val want = Tables.orders(spark, sf)
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(3).collect().map(_.getDouble(3)).toSeq
    assert(got == want)
  }

  test("arithmetic expressions with auto-alias") {
    init
    val df = KerfSql.run(spark,
      "select l_orderkey, l_extendedprice * (1 - l_discount) as net from lineitem_v limit 5")
    assert(df.columns.toSeq == Seq("l_orderkey", "net"))
    assert(df.count() == 5)
  }

  test("update … set … where lowers to TableOps.update") {
    init
    val got = KerfSql.run(spark,
      "update orders_v set o_totalprice = 0 where o_orderstatus = 'F'")
    assert(got.filter(col("o_orderstatus") === "F")
      .agg(sum("o_totalprice")).collect()(0).getDouble(0) == 0.0)
    assert(got.count() == Tables.orders(spark, sf).count())
  }

  test("delete from … where") {
    init
    val got = KerfSql.run(spark, "delete from orders_v where o_totalprice > 0")
    assert(got.count() == Tables.orders(spark, sf).filter(col("o_totalprice") <= 0).count())
  }

  test("upsert into … key … values replaces and inserts") {
    init
    val before = Tables.orders(spark, sf).count()
    val existing = Tables.orders(spark, sf).select("o_orderkey").first().getLong(0)
    val got = KerfSql.run(spark,
      s"upsert into orders_v key o_orderkey values " +
      s"($existing, 1, 'X', 123.45, '1995-01-01', 'LOW'), " +
      s"(999999999, 1, 'X', 50.0, '1995-01-01', 'LOW')")
    assert(got.count() == before + 1)
    assert(got.filter(col("o_orderkey") === existing).first().getString(2) == "X")
  }
}
