package graft.tools

import org.apache.spark.sql.functions._

/** Measures the EMA scan's cost curve over series length — the claim
  * behind graft.functions.EmaScan (the O(n) native pass that replaced
  * the O(n²) aggregate/concat fold and its 16384-tick guard): doubling
  * the series should double the cost, not quadruple it. Runs one row
  * per series length (the fold is array-local, so one long row is the
  * worst case a task can see) and prints sec per length for both the
  * native scan and, at lengths the old guard allowed, the retired fold
  * formulation for contrast. Run:
  * `sbt "runMain graft.tools.EmaScalingBench"`. */
object EmaScalingBench {
  def main(args: Array[String]): Unit = {
    val spark = graft.Engine.session()

    def timeIt(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    // the retired fold, kept here for the contrast measurement only
    def emaFold(arr: org.apache.spark.sql.Column, alpha: Double) =
      when(size(arr) === 0, array().cast("array<double>"))
        .otherwise(aggregate(
          slice(arr, lit(2), greatest(size(arr) - 1, lit(0))),
          array(element_at(arr, 1).cast("double")),
          (acc, x) => concat(acc, array(
            element_at(acc, -1) + lit(alpha) * (x.cast("double") - element_at(acc, -1))))))

    def series(n: Int) = spark.range(1)
      .select(sequence(lit(1), lit(n)).cast("array<double>").as("a"))

    // the windowed (q161 emas) form: ONE key of n ordered rows — the
    // worst case for a window frame; the incremental aggregate must
    // stay O(n) (a re-scanning frame would be quadratic here)
    def windowed(n: Int) = {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("k").orderBy("id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      spark.range(n).select(lit(1).as("k"), col("id"),
          (col("id") % 97).cast("double").as("x"))
        .select(graft.functions.EmaWindowAgg.emas(0.25)(col("x")).over(w).as("e"))
        .agg(sum(col("e")))
    }

    println("len,native_sec,windowed_sec,fold_sec")
    for (n <- Seq(1000, 4000, 16000, 64000, 256000, 1000000)) {
      val tNative = timeIt(series(n)
        .select(sum(element_at(graft.ops.Adverbs.ema(col("a"), 0.25), -1))).first())
      val tWin = timeIt(windowed(n).first())
      // the fold is quadratic: past the old guard's regime it would take
      // minutes — measure it only where the old implementation ran
      val tFold = if (n <= 16000)
        timeIt(series(n)
          .select(sum(element_at(emaFold(col("a"), 0.25), -1))).first()).toString
        else "-"
      println(s"$n,$tNative,$tWin,$tFold")
    }
    spark.stop()
  }
}
