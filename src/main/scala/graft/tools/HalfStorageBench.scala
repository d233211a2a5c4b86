package graft.tools

import org.apache.spark.sql.functions._

/** Measures the fp16 tier's ON-DISK win over the float32 embedding
  * column — the claim behind graft.functions.HalfPack (FLOAT1_ARRAY,
  * /root/reference/enums.h:196): parquet stores array<float> pages
  * whose mantissa noise defeats dictionary/RLE encoding, while the
  * binary16 bit pattern (array<smallint>, INT32-physical with INT(16)
  * annotation) re-enters the encodable regime. Writes the sf
  * embeddings three ways — float32 (as fixtured), fp16-packed, and
  * fp16-packed+zstd — and prints bytes + decode-probe time. Run:
  * `sbt "runMain graft.tools.HalfStorageBench [sfDir]"`. */
object HalfStorageBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.Engine.session()
    val out = s"/tmp/graft_half_storage/${spark.sparkContext.applicationId}"

    def du(path: String): Long = {
      def walk(f: java.io.File): Long =
        if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).map(walk).sum
        else f.length()
      walk(new java.io.File(path))
    }
    def time[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    val emb = graft.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
    emb.write.mode("overwrite").parquet(s"$out/f32")
    emb.select(col("vec_id"),
        graft.functions.Half.pack(col("embedding")).as("embedding"))
      .write.mode("overwrite").parquet(s"$out/f16")
    emb.select(col("vec_id"),
        graft.functions.Half.pack(col("embedding")).as("embedding"))
      .write.mode("overwrite").option("compression", "zstd")
      .parquet(s"$out/f16z")

    // decode-probe cost: mean over the DECODED fp16 column vs native
    val tF32 = time(spark.read.parquet(s"$out/f32")
      .select(avg(graft.llm.Similarity.dot(col("embedding"), col("embedding")))).first())
    val tF16 = time(spark.read.parquet(s"$out/f16")
      .select(avg(graft.llm.Similarity.dot(
        graft.functions.Half.unpack(col("embedding")),
        graft.functions.Half.unpack(col("embedding"))))).first())

    println(s"""{"sf":"$sfDir","f32_bytes":${du(s"$out/f32")},""" +
      s""""f16_bytes":${du(s"$out/f16")},"f16_zstd_bytes":${du(s"$out/f16z")},""" +
      s""""scan_f32_sec":${math.round(tF32 * 1000) / 1000.0},""" +
      s""""scan_f16_sec":${math.round(tF16 * 1000) / 1000.0}}""")
    spark.stop()
  }
}
