package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-pipeline operators beyond cleaning/dedup (BASELINE north-star):
  * PII redaction, reproducible sampling, sequence packing, benchmark
  * decontamination. Everything is column algebra or one bounded shuffle —
  * the shapes that survive a 100 TB corpus.
  */
object Pipeline {

  /** PII redaction — the scrub pass every released corpus runs. Three
    * codegen'd regex passes (email → `<EMAIL>`, IPv4 → `<IP>`, intl-style
    * phone → `<PHONE>`), in that order so emails' dotted domains are gone
    * before the IP pattern looks. RE2-and-Java-compatible patterns only,
    * so an external engine (and the DuckDB oracle) can run the identical
    * chain. Map-only: zero shuffles at any scale. */
  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val phoneRe = "\\+\\d[\\d\\- ]{6,}\\d"
  def redactPii(t: Column): Column =
    regexp_replace(regexp_replace(regexp_replace(t,
      emailRe, "<EMAIL>"), ipv4Re, "<IP>"), phoneRe, "<PHONE>")

  /** Deterministic hash sampling: keep rows whose md5(key) hex prefix
    * sorts below `hexCeil` (e.g. "29" ≈ 16%). Seed-free, engine-portable
    * (md5 is bit-identical everywhere — the sample is REPRODUCIBLE across
    * reruns, engines, and partitionings, unlike rand()), and map-only: the
    * filter pushes into the scan pipeline with no shuffle and no RNG
    * state. This is how a 100 TB corpus cuts a stable dev subsample. */
  def hashSample(df: DataFrame, key: Column, hexCeil: String): DataFrame =
    df.filter(substring(md5(key), 1, hexCeil.length) < hexCeil)

  /** Deterministic CORPUS MIXING — the dataset-assembly step between
    * cleaning and packing: each source contributes a [[hashSample]] at
    * its own rate (the mixture weights a training run prescribes) and
    * carries a provenance tag. Seed-free and engine-portable like the
    * sample it composes: re-running, re-partitioning, or re-ordering the
    * sources reproduces the EXACT same mixture (a rand()-based mixer
    * resamples differently every run — unusable for a reproducible data
    * recipe). Map-only per source; the union is a metadata operation.
    * Schemas must agree (same contract as a folio). `sourceCol` must not
    * collide with a data column. */
  def mixCorpora(sources: Seq[(String, DataFrame, String)], key: Column,
                 sourceCol: String = "mix_source"): DataFrame = {
    require(sources.nonEmpty, "mixCorpora needs at least one source")
    val cols = sources.head._2.columns.toSeq
    sources.foreach { case (tag, df, _) =>
      require(df.columns.toSeq == cols,
        s"mix source '$tag' schema mismatch: ${df.columns.mkString(",")} vs ${cols.mkString(",")}")
      require(!df.columns.exists(_.equalsIgnoreCase(sourceCol)),
        s"mix source '$tag' already has a '$sourceCol' column")
    }
    sources.map { case (tag, df, hexCeil) =>
      hashSample(df, key, hexCeil).withColumn(sourceCol, lit(tag))
    }.reduce(_.unionByName(_))
  }

  /** GPT-style sequence packing (concat-and-chunk): documents are laid
    * end-to-end in a deterministic order within each stream and cut into
    * fixed `ctxTokens` windows; a document lands in the chunk containing
    * its start offset. Exactly one shuffle (the per-stream window sort);
    * at scale each stream partition packs independently — the same
    * contract a sharded training-data writer uses. */
  def packChunks(docs: DataFrame, streamCol: String, orderCol: String,
                 textCol: String, ctxTokens: Int): DataFrame = {
    require(ctxTokens > 0, "ctxTokens must be positive")
    val w = Window.partitionBy(col(streamCol)).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .withColumn("__toks", TextOps.tokenCount(col(textCol)).cast("long"))
      .withColumn("__start", coalesce(sum(col("__toks")).over(w), lit(0L)))
      .withColumn("chunk_id", expr(s"__start div $ctxTokens"))
      .drop("__start")
      .withColumnRenamed("__toks", "n_tokens")
  }

  /** Benchmark decontamination check: for each corpus document, the
    * fraction of its distinct word n-grams that appear anywhere in the
    * benchmark set (the overlap metric eval-set decontamination uses).
    * The benchmark's distinct shingles BROADCAST (eval sets are tiny next
    * to the corpus); the corpus side is explode → broadcast semi-join →
    * partial-agg groupBy, so nothing n² and no wide shuffle of text.
    * Returns only docs with ≥1 shared shingle (semi-join hits) — clean
    * docs are the overwhelming majority at scale and are implicitly 0. */
  def contamination(corpus: DataFrame, benchmark: DataFrame,
                    idCol: String, textCol: String, n: Int = 3): DataFrame = {
    // shingles leave the map stage as 8-byte xxhash64 longs, never as
    // n-gram strings: the native ShingleHashes expression hashes token
    // windows in place (distinct, bit-identical to hashing the shingle
    // string), so the exploded corpus column and the broadcast set stay
    // compact (collision odds ~|shingles|²/2⁶⁴ — immaterial for an
    // overlap metric; the DuckDB twin joins the raw strings and agrees)
    def sh(df: DataFrame) = df
      .select(col(idCol).as("doc_id"),
        graft.functions.ShingleHashes.shingleHashes(
          Dedup.normText(col(textCol)), n).as("__shh"))
    val bench = sh(benchmark).select(explode(col("__shh")).as("s")).distinct()
    val corp = sh(corpus).select(col("doc_id"),
      size(col("__shh")).cast("long").as("n_shingles"), explode(col("__shh")).as("s"))
    corp.join(broadcast(bench), Seq("s"), "left_semi")
      .groupBy(col("doc_id"), col("n_shingles"))
      .agg(count(lit(1)).as("n_shared"))
      .withColumn("contamination",
        round(col("n_shared").cast("double") / col("n_shingles").cast("double"), 6))
      .select(col("doc_id"), col("n_shingles"), col("n_shared"), col("contamination"))
  }
}
