package graft.tools

import org.apache.spark.sql.functions._

/** Pins the STREAMING STATE claim with observed numbers: q67/q90-style
  * stateful streams bound their state by the WATERMARK HORIZON, not by
  * total input — the property that makes an always-on dedup/join stream
  * viable at 100 TB/day (state is a sliding window over arrival time,
  * so a 10× longer replay must NOT grow a 10× larger state store).
  *
  * Method: deterministic event stream at a fixed RATE (rows per hour of
  * event time), deduplicated by (id) under `withWatermark(1 hour)`, fed
  * chronologically through a MemoryStream in hour-sized micro-batches
  * so the watermark advances as it would live. After each run the state
  * rows come from the engine's own accounting
  * (StreamingQueryProgress.stateOperators.numRowsTotal — the number the
  * state store actually holds, not an estimate).
  *
  * Two scale axes, separated on purpose:
  *   - 10× the HOURS at the same rate (10× input rows): state must stay
  *     ≈ horizon × rate — flat, the bounded-state claim;
  *   - 10× the RATE at the same hours (also 10× input rows): state must
  *     grow ~10× — state tracks rate × horizon, not input size.
  *
  * Run: `sbt "runMain graft.tools.StreamStateBench"`
  * Prints one JSON line per (hours, rate) run.
  */
object StreamStateBench {
  def main(args: Array[String]): Unit = {
    val spark = graft.Engine.session()
    import spark.implicits._

    def run(hours: Int, rowsPerHour: Int): (Long, Long, Long) = {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      implicit val sqlc: org.apache.spark.sql.SQLContext = spark.sqlContext
      val input = MemoryStream[(Long, java.sql.Timestamp)]
      val deduped = input.toDF().toDF("id", "ts")
        .withWatermark("ts", "1 hour")
        .dropDuplicates("id", "ts")
      val q = deduped.writeStream.outputMode("append")
        .format("memory").queryName(s"state_bench_${hours}_$rowsPerHour")
        .start()
      var total = 0L
      try {
        // epoch base is arbitrary but fixed: determinism over wall time
        val t0 = 1700000000000L
        for (h <- 0 until hours) {
          val batch = (0 until rowsPerHour).map { i =>
            // ids repeat across hours (same id universe) — only the
            // watermark, never id cardinality, may bound the state
            (i.toLong, new java.sql.Timestamp(t0 + h * 3600000L + (i % 3600) * 1000L))
          }
          input.addData(batch: _*)
          q.processAllAvailable()
          total += batch.length
        }
        val st = q.lastProgress.stateOperators(0)
        (total, st.numRowsTotal, st.numRowsDroppedByWatermark)
      } finally q.stop()
    }

    // ---- axis 3 (r17, SURVEY §7.5.6): transformWithState last-tick in
    // RocksDB over a GROWING KEY SPACE — the un-evictable-state op whose
    // footprint is keys × fixed record, measured instead of asserted.
    // Fixed 100k-row batches cycle the key universe (every key touched
    // ≥2×), so per-batch latency isolates per-key RocksDB I/O from row
    // throughput; state size comes from the engine's own accounting
    // (numRowsTotal, memoryUsedBytes, and the RocksDB SST/memory custom
    // metrics where the provider reports them).
    def runLastTick(nKeys: Int): String = {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      implicit val sqlc: org.apache.spark.sql.SQLContext = spark.sqlContext
      val provKey = "spark.sql.streaming.stateStore.providerClass"
      val prevProv = spark.conf.getOption(provKey)
      spark.conf.set(provKey,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      try {
        val input = MemoryStream[(Long, Long, Double)]
        val ticks = graft.streaming.EventStream.lastTicksTws(
          input.toDF().toDF("user_id", "ts_ns", "value"))
        val q = ticks.writeStream.outputMode("update")
          .format("noop").start()
        val rowsPerBatch = 100000
        val nBatches = math.max(3, (nKeys.toLong * 2 / rowsPerBatch).toInt + 1)
        val batchSec = new Array[Double](nBatches)
        try {
          var rowNo = 0L
          for (b <- 0 until nBatches) {
            val batch = (0 until rowsPerBatch).map { i =>
              val key = (rowNo + i) % nKeys
              (key, rowNo + i, (key % 97).toDouble)
            }
            rowNo += rowsPerBatch
            val t0 = System.nanoTime()
            input.addData(batch: _*)
            q.processAllAvailable()
            batchSec(b) = (System.nanoTime() - t0) / 1e9
          }
          val st = q.lastProgress.stateOperators(0)
          val cm = st.customMetrics
          def metric(name: String): Long =
            if (cm.containsKey(name)) cm.get(name).longValue() else -1L
          val steady = batchSec.takeRight(3).sorted.apply(1) // median of last 3
          f"""{"keys":$nKeys,"batches":$nBatches,"rows_per_batch":$rowsPerBatch,""" +
            f""""state_rows":${st.numRowsTotal},"mem_used_bytes":${st.memoryUsedBytes},""" +
            f""""rocksdb_sst_bytes":${metric("rocksdbSstFileSize")},""" +
            f""""rocksdb_pinned_bytes":${metric("rocksdbPinnedBlocksMemoryUsage")},""" +
            f""""steady_batch_sec":$steady%.2f,"first_batch_sec":${batchSec(0)}%.2f}"""
        } finally q.stop()
      } finally prevProv match {
        case Some(v) => spark.conf.set(provKey, v)
        case None => spark.conf.unset(provKey)
      }
    }

    // warmup pays codegen/state-store init once
    run(2, 100)
    for ((hours, rate) <- Seq((10, 1000), (100, 1000), (10, 10000))) {
      val t0 = System.nanoTime()
      val (in, state, dropped) = run(hours, rate)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"hours":$hours,"rows_per_hour":$rate,"rows_in":$in,"state_rows":$state,"dropped_late":$dropped,"sec":$sec%.1f}""")
    }
    runLastTick(1000) // RocksDB warmup (instance load ~2s/partition)
    for (nKeys <- Seq(1000, 10000, 100000, 1000000))
      println(runLastTick(nKeys))
    spark.stop()
  }
}
