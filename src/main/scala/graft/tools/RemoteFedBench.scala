package graft.tools

import org.apache.spark.sql.functions._
import graft.Engine
import graft.sources.RemoteTableServer

/** Dev tool: measure what each remote-folio pushdown layer actually
  * saves on the wire (rows + bytes shipped by the server, wall time),
  * at a given scale factor. `runMain graft.tools.RemoteFedBench [sfDir]`.
  *
  * Shapes, over a 4-fragment remote lineitem:
  *   rows      — full-width row shipping (the worst case)
  *   project   — 2-of-16 column projection
  *   filter    — projection + a pushed selective predicate
  *   agg       — grouped aggregate as fragment×group partials
  * plus the gzip-vs-plain byte ratio on the `project` shape.
  */
object RemoteFedBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = Engine.session()
    val scratch = java.nio.file.Files.createTempDirectory("graft_fedbench").toString
    spark.read.parquet(s"$dir/lineitem.parquet")
      .repartition(4).write.mode("overwrite").parquet(s"$scratch/li")
    val srv = RemoteTableServer.start(spark, Map("li" -> s"$scratch/li"))
    def remote(codec: String) = spark.read.format("graft.sources.RemoteFolioSource")
      .option("endpoint", s"127.0.0.1:${srv.port}").option("table", "li")
      .option("wireCodec", codec).load()
    val total = spark.read.parquet(s"$dir/lineitem.parquet").count()

    def measure(name: String, run: () => Long): Unit = {
      val r0 = srv.rowsSent.get(); val b0 = srv.bytesSent.get()
      val t0 = System.nanoTime()
      val out = run()
      val ms = (System.nanoTime() - t0) / 1e6
      println(f"$name%-10s out=$out%8d rowsShipped=${srv.rowsSent.get() - r0}%8d " +
        f"MBshipped=${(srv.bytesSent.get() - b0) / 1e6}%9.2f wall=${ms / 1000}%6.2fs " +
        f"(table rows: $total)")
    }

    measure("rows",    () => remote("gzip").select("l_orderkey", "l_partkey", "l_quantity",
      "l_extendedprice", "l_returnflag", "l_shipdate").collect().length.toLong)
    measure("project", () => remote("gzip").select("l_orderkey", "l_quantity").collect().length.toLong)
    measure("filter",  () => remote("gzip").filter(col("l_discount") >= 0.09).select("l_orderkey").count())
    measure("count",   () => remote("gzip").count()) // CountStar pushes: one partial/fragment
    measure("agg",     () => remote("gzip").groupBy("l_returnflag").agg(sum("l_orderkey"), count(lit(1))).collect().length.toLong)

    // codec ratio on a row-shipping shape
    def bytesOf(codec: String): Long = {
      val b0 = srv.bytesSent.get()
      remote(codec).select("l_orderkey", "l_quantity", "l_returnflag").collect()
      srv.bytesSent.get() - b0
    }
    val plain = bytesOf("none"); val gz = bytesOf("gzip")
    println(f"codec      plain=${plain / 1e6}%.2f MB gzip=${gz / 1e6}%.2f MB ratio=${plain.toDouble / gz}%.1fx")
    srv.stop()
    spark.stop()
  }
}
