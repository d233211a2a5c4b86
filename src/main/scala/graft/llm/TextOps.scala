package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text analysis for training-data pipelines (BASELINE north-star):
  * token counting, quality scoring, language ID, document fingerprinting.
  * Pure column algebra (regex + higher-order functions) — whole-stage
  * codegen end to end, map-only at scale.
  */
object TextOps {

  /** Whitespace-delimited token count (regex `\S+` matches). */
  def tokenCount(text: Column): Column = {
    val t = trim(text)
    when(length(t) === 0, 0).otherwise(size(split(t, "\\s+")))
  }

  /** BPE-ish subword unit count: splits on word/number/punct boundaries
    * the way a byte-pair tokenizer's pre-tokenizer does. */
  def subwordCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  private val stopwords = Seq("the", "a", "an", "of", "to", "and", "in",
    "is", "it", "that", "for", "on", "as", "with", "was", "at", "by")

  /** Heuristic quality features: length, token stats, punctuation /
    * stopword / uppercase ratios. Ratios are exact divisions of exact
    * integer counts — deterministic across engines. */
  /** Append the quality-feature columns, PRESERVING existing ones — the
    * composable form: a pipeline stacking several feature passes stays
    * ONE scan (each pass is a projection, not a join). */
  def withQualityFeatures(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val toks = tokenCount(t)
    val chars = length(t)
    df.withColumns(Map(
      "n_chars" -> chars.cast("long"),
      "n_tokens" -> toks.cast("long"),
      "avg_token_len" -> (chars.cast("double") / greatest(toks, lit(1)).cast("double")),
      "punct_ratio" -> (size(regexp_extract_all(t, lit("[.,!?;:]"), lit(0))).cast("double") /
        greatest(chars, lit(1)).cast("double")),
      "upper_ratio" -> (size(regexp_extract_all(t, lit("[A-Z]"), lit(0))).cast("double") /
        greatest(chars, lit(1)).cast("double")),
      "stopword_ratio" -> (graft.functions.ArrayKernels.countInSet(
        split(lower(t), "\\s+"), stopwords).cast("double") /
        greatest(toks, lit(1)).cast("double"))))
  }

  def qualityFeatures(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    withQualityFeatures(docs, textCol)
      .select(col(idCol), col("n_chars"), col("n_tokens"), col("avg_token_len"),
              col("punct_ratio"), col("upper_ratio"), col("stopword_ratio"))

  /** Character-frequency language-ID heuristic: scores each candidate
    * language by frequency of its marker n-grams, argmax wins. A toy
    * (real pipelines plug a model here) but a deterministic, distributed
    * one: per-doc map-only scoring. */
  private val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq(" the ", " and ", " of ", "th", "ing"),
    "de" -> Seq(" der ", " und ", " die ", "sch", "ch"),
    "fr" -> Seq(" le ", " les ", " des ", " est ", "ou"),
    "es" -> Seq(" el ", " los ", " de ", " que ", "ción"),
    "zh" -> Seq("的", "是", "了", "在", "不"))

  /** ONE regex scan of each document for ALL languages: a longest-first
    * alternation of every marker extracts the hit sequence once; each
    * language's score is then an in-row count over that (small) hit
    * array. Round 1 ran one `regexp_count` scan per language — 5 full
    * passes over every doc on the hot text path. */
  /** Append `pred_lang`/`score`, preserving existing columns (staged
    * through real projections — the lambda-CSE discipline). */
  def withLanguageId(df: DataFrame, textCol: String): DataFrame = {
    val master = langMarkers.values.flatten.toSeq.distinct
      .sortBy(m => (-m.length, m))                    // longest-first ≈ longest-match
      .map(java.util.regex.Pattern.quote).mkString("|")
    val scored = langMarkers.toSeq.sortBy(_._1).map { case (lang, ms) =>
      struct(graft.functions.ArrayKernels.countInSet(col("__hits"), ms).as("score"),
             lit(lang).as("lang"))
    }
    df.withColumn("__padded", concat(lit(" "), lower(col(textCol)), lit(" ")))
      .withColumn("__hits", regexp_extract_all(col("__padded"), lit(master), lit(0)))
      .withColumn("__best", array_max(array(scored: _*)))
      .withColumn("pred_lang", col("__best").getField("lang"))
      .withColumn("score", col("__best").getField("score"))
      .drop("__padded", "__hits", "__best")
  }

  def languageId(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    withLanguageId(docs, textCol)
      .select(col(idCol), col("pred_lang"), col("score"))

  /** Pipeline text cleaning (the pre-tokenization stages every corpus
    * build runs): each is one codegen'd regex pass; chain as needed.
    * Patterns use only RE2-compatible syntax so the DuckDB oracle can
    * mirror them exactly. */
  def stripHtml(t: Column): Column =
    regexp_replace(t, "<[^>]*>", " ")
  def stripUrls(t: Column): Column =
    regexp_replace(t, "https?://[^\\s]+", " ")
  def collapseWhitespace(t: Column): Column =
    trim(regexp_replace(t, "\\s+", " "))
  /** Full cleaning chain: tags → urls → whitespace. */
  def cleanText(t: Column): Column =
    collapseWhitespace(stripUrls(stripHtml(t)))

  /** Per-doc term frequencies: explode normalized tokens → partial-agg
    * groupBy (map-side combine carries (doc, term, n) — never raw text).
    * One shuffle at any scale. */
  def termCounts(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol).as("doc_id"), explode(Dedup.tokens(col(textCol))).as("term"))
      .filter(col("term") =!= "")
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("n"))

  /** Top-k most frequent terms per document (keyword extraction) —
    * deterministic tie-break on the term itself. Count shuffle + one
    * per-doc window; rank state is O(k) per doc after the partial agg. */
  def topTerms(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("n").desc, col("term"))
    termCounts(docs, idCol, textCol)
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col("doc_id"), col("rk"), col("term"), col("n"))
  }

  /** Gopher-style repetition signals (Rae et al. 2021 §A1.1, re-expressed
    * word-level for newline-free corpora): the quality gates that catch
    * boilerplate/spam before training. All IN-ROW column algebra — a
    * map-only pass at any scale:
    *
    *  - `top_bigram_frac`:  occurrences of the most frequent word bigram
    *    over all bigrams (high ⇒ looping text);
    *  - `dup_trigram_frac`: 1 − distinct/total word trigrams;
    *  - `word_entropy`:     Shannon entropy of the word distribution in
    *    nats, summed in SORTED-distinct-word order so the float fold is
    *    bit-reproducible across engines (and rounded to 6 dp).
    *
    * The n-gram arrays are staged as real columns (the no-CSE-in-lambda
    * discipline); the per-distinct-element counting is O(distinct·n) in
    * the row — bounded by document length, never a shuffle. */
  def withRepetitionSignals(df: DataFrame, textCol: String): DataFrame = {
    def grams(w: Column, n: Int): Column =
      when(size(w) < n, array().cast("array<string>")).otherwise(
        transform(sequence(lit(0), size(w) - n),
          i => concat_ws(" ", slice(w, i + 1, lit(n)))))
    val cnt = (arr: Column, distinctSorted: Column) =>
      transform(distinctSorted, g => size(filter(arr, x => x === g)))
    df.withColumn("__w", Dedup.tokens(col(textCol)))
      .withColumn("__bg", grams(col("__w"), 2))
      .withColumn("__tg", grams(col("__w"), 3))
      .withColumn("__wd", array_sort(array_distinct(col("__w"))))
      .withColumn("__wc", cnt(col("__w"), col("__wd")))
      .withColumn("top_bigram_frac",
        when(size(col("__bg")) === 0, 0.0).otherwise(round(
          array_max(cnt(col("__bg"), array_distinct(col("__bg")))).cast("double") /
          size(col("__bg")).cast("double"), 6)))
      .withColumn("dup_trigram_frac",
        when(size(col("__tg")) === 0, 0.0).otherwise(round(
          lit(1.0) - size(array_distinct(col("__tg"))).cast("double") /
          size(col("__tg")).cast("double"), 6)))
      .withColumn("word_entropy",
        when(size(col("__w")) === 0, 0.0).otherwise(round(
          -aggregate(col("__wc"), lit(0.0), (acc, c) => {
            val p = c.cast("double") / size(col("__w")).cast("double")
            acc + p * log(p)
          }), 6)))
      .drop("__w", "__bg", "__tg", "__wd", "__wc")
  }

  def repetitionSignals(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    withRepetitionSignals(docs, textCol)
      .select(col(idCol), col("top_bigram_frac"), col("dup_trigram_frac"),
              col("word_entropy"))

  /** TF-IDF salient terms: the corpus-level companion to [[topTerms]]
    * (raw frequency ranks boilerplate terms first; IDF damps them).
    * Shuffle shape at 100 TB: one explode→partial-agg for tf, one
    * partial-agg for df, one JOIN ON TERM — both sides hash-partitioned
    * by term, so the join co-locates with df's aggregation shuffle; the
    * per-doc top-k window runs on the (doc, term, score) triples, never
    * raw text. `nDocs` is one count() scalar folded into the plan as a
    * literal — the same "model state" tier as the IVF centroids. */
  def tfIdfTerms(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val nDocs = docs.count().toDouble
    val tf = termCounts(docs, idCol, textCol)
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("tfidf").desc, col("term"))
    tf.join(dfreq, Seq("term"))
      .withColumn("tfidf",
        round(col("n").cast("double") * log(lit(nDocs) / col("df").cast("double")), 6))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col("doc_id"), col("rk"), col("term"), col("tfidf"))
  }

  /** Winnowing-style document fingerprint: k-gram rolling hashes, keep the
    * min hash in each window of w consecutive k-grams → compact sketch of
    * positions that survives small edits (Schleimer et al., SIGMOD'03). */
  def fingerprint(docs: DataFrame, idCol: String, textCol: String,
                  k: Int = 8, w: Int = 4): DataFrame =
    // NULL text coalesces to the empty doc BEFORE the kernel: the
    // empty/short guards live INSIDE the native expression ("" → no
    // grams; 0 < len < k → one whole-text gram), so every null-text doc
    // fingerprints to the empty sketch, never a shared phantom. The
    // whole gram-hash → window-min → distinct → sort chain is ONE
    // native codegen loop (r18 structural-net fallback removal — the
    // column form drove two interpreted transforms per DOCUMENT, one
    // per k-gram and one per winnow window).
    docs.select(col(idCol),
      graft.functions.ArrayKernels.winnowFingerprint(
        coalesce(Dedup.normText(col(textCol)), lit("")), k, w).as("fingerprint"))

  /** The column-algebra twin [[fingerprint]] replaced — kept for
    * bit-identity adjudication (ExtensionSpec pins native == this,
    * including the empty/short/null guard edges the comments below
    * document).
    *
    * Staged through real columns: lambda bodies re-evaluate whatever
    * expression tree they reference PER ELEMENT (no CSE inside
    * higher-order functions), so the normalized text and the k-gram hash
    * array must each be materialized attributes before the next step
    * slices them — otherwise this is O(len²·regex) per row.
    * sequence(1, hi) is INCLUSIVE and runs DESCENDING when hi < 1 (the
    * segmented() trap): a doc shorter than k must short-circuit to one
    * whole-text gram (the shinglesFromTokens convention) and an EMPTY
    * doc to no grams at all — the old greatest(...,0) clamp instead
    * produced sequence(1,0)=[1,0] and gave every empty doc the same
    * phantom fingerprint, pairing them all with each other. NULL text
    * coalesces to the empty doc BEFORE the guards: the `length === 0`
    * branch is NULL (not true) on a null __t, so the otherwise-branch
    * would run and — greatest(null, 0) = 0 ignores the null — hand
    * every null-text doc the same [null] phantom fingerprint. */
  private[graft] def fingerprintColumnAlgebra(docs: DataFrame, idCol: String,
                                              textCol: String,
                                              k: Int = 8, w: Int = 4): DataFrame =
    docs
      .select(col(idCol),
        coalesce(Dedup.normText(col(textCol)), lit("")).as("__t"))
      .select(col(idCol),
        when(length(col("__t")) === 0, array().cast("array<bigint>"))
          .when(length(col("__t")) < k, array(xxhash64(col("__t"))))
          .otherwise(transform(
            sequence(lit(1), length(col("__t")) - (k - 1)),
            i => xxhash64(col("__t").substr(i, lit(k))))).as("__hashes"))
      .select(col(idCol),
        when(size(col("__hashes")) === 0, array().cast("array<bigint>"))
          .otherwise(array_sort(array_distinct(transform(
            sequence(lit(0), greatest(size(col("__hashes")) - w, lit(0))),
            j => array_min(slice(col("__hashes"), j + 1, lit(w)))))))
          .as("fingerprint"))

  /** Corpus-unigram-LM document statistics — the CCNet-style "score
    * docs against a language model" filter with the corpus's OWN
    * unigram distribution as the model (fully in-engine, no external
    * LM): per doc,
    *  - `mean_p`: mean add-one-smoothed token probability
    *    (cnt+1)/(total+vocab) — boilerplate scores high, gibberish low;
    *  - `hapax_frac` / `rare_frac`: fraction of tokens occurring once /
    *    ≤ `rareMax` times in the corpus — the novelty tail.
    * Deliberately LOG-FREE: ln/log2 are libm-dependent (the q39
    * determinism rule), while these are division/count rationals both
    * engines compute bit-identically; the per-doc mean folds a SORTED
    * probability array (the q71 entropy discipline) so the float sum is
    * order-deterministic. Shuffle shape: one term census + one
    * token→census join + one per-doc agg — all partial-agged; the
    * census is the only global state and it lives as a table, never on
    * the driver. */
  def unigramStats(docs: DataFrame, idCol: String, textCol: String,
                   rareMax: Int = 2): DataFrame = {
    import graft.ops.Caches
    // persist the VOCAB-sized census (bounded model state, the right
    // cache at 100 TB); the token-level frame stays a recomputed
    // map-only explode — never cached, never on the driver
    val census = unigramCensus(docs, idCol, textCol).persist(Caches.lvl)
    Caches.seal(unigramScore(docs, census, idCol, textCol, rareMax), census)
  }

  /** The unigram model: corpus-wide `(tok, cnt)`. Bounded by vocabulary
    * — the table a production deployment persists and reuses. */
  def unigramCensus(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(explode(Dedup.tokens(col(textCol))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))

  /** Score ANY frame (batch or stream) against a FIXED census — the
    * deployment split: the model is trained on the reference corpus,
    * incoming documents score at ingest via a stream-static join. A
    * token absent from the census scores with cnt = 0 (the smoothing
    * already budgets for unseen tokens). */
  def unigramScore(docs: DataFrame, census: DataFrame,
                   idCol: String, textCol: String, rareMax: Int = 2): DataFrame = {
    val g = census.agg(sum(col("cnt")).as("total"), count(lit(1)).as("vocab")).first()
    // an empty census makes sum(cnt) NULL — fail with the same loud
    // posture as censusDrift instead of a bare NPE out of getLong
    require(!g.isNullAt(0) && g.getLong(0) > 0,
      "unigramScore needs a non-empty census (sum(cnt) must be > 0)")
    val denom = (g.getLong(0) + g.getLong(1)).toDouble
    docs.select(col(idCol).as("doc_id"),
        explode(Dedup.tokens(col(textCol))).as("tok"))
      .join(census, Seq("tok"), "left")
      .withColumn("cnt", coalesce(col("cnt"), lit(0L)))
      .withColumn("__p", (col("cnt") + 1).cast("double") / lit(denom))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
           round(aggregate(array_sort(collect_list(col("__p"))),
             lit(0.0), (a, x) => a + x) / count(lit(1)), 6).as("mean_p"),
           round(sum(when(col("cnt") === 1, 1).otherwise(0)).cast("double")
             / count(lit(1)), 6).as("hapax_frac"),
           round(sum(when(col("cnt") <= rareMax, 1).otherwise(0)).cast("double")
             / count(lit(1)), 6).as("rare_frac"))
  }

  /** Corpus DRIFT between two unigram censuses (crawl-over-crawl
    * monitoring: did the token distribution move?): total-variation
    * distance TV = Σ|p_A − p_B| / 2 plus the top-`topK` drifted tokens.
    * Computed in EXACT integer arithmetic — |cntA·totalB − cntB·totalA|
    * as DECIMAL(38,0) numerators summed order-free, one division at the
    * end — so there is no fp fold order to reconcile and no overflow at
    * any corpus size (cnt·total fits 38 digits far past 100 TB). The
    * ranking ties break on the token itself: fully deterministic. */
  def censusDrift(a: DataFrame, b: DataFrame, topK: Int = 10): DataFrame = {
    import graft.ops.Caches
    // the four consumers below (two totals, the TV aggregate, the top-K
    // scan) would otherwise recompute each census — typically a full
    // tokenize+explode+aggregate over its half of the corpus — four
    // times over. Censuses are vocab-BOUNDED model state (the exact
    // thing a production deployment persists), so cache them and the
    // equally-bounded joined frame for the drift pass; the sealed
    // result is topK rows, after which every cache is released.
    val (ca, ownA) = Caches.acquire(a)
    val (cb, ownB) = Caches.acquire(b)
    val ta = ca.agg(sum(col("cnt"))).first().getLong(0)
    val tb = cb.agg(sum(col("cnt"))).first().getLong(0)
    require(ta > 0 && tb > 0, "censusDrift needs two non-empty censuses")
    val joined = ca.select(col("tok"), col("cnt").as("cnt_a"))
      .join(cb.select(col("tok"), col("cnt").as("cnt_b")), Seq("tok"), "full")
      .na.fill(0L, Seq("cnt_a", "cnt_b"))
      .withColumn("__num", abs(
        col("cnt_a").cast("decimal(38,0)") * lit(tb) -
        col("cnt_b").cast("decimal(38,0)") * lit(ta)))
      .persist(Caches.lvl)
    // one DOUBLE division over the exact integer sum — the identical
    // expression an oracle computes — then the standard round(…, 6)
    val tv = joined.agg(sum(col("__num"))).first().getDecimal(0)
      .doubleValue() / (2.0 * ta * tb)
    // top-K via orderBy+limit (TakeOrderedAndProject — never a global
    // sort materialization), rank assigned within the K-row result
    val result = joined.orderBy(col("__num").desc, col("tok")).limit(topK)
      .withColumn("drift_rank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("__num").desc, col("tok"))).cast("long"))
      .select(col("drift_rank"), col("tok"), col("cnt_a"), col("cnt_b"),
        round(lit(tv), 6).as("tv_distance"))
    Caches.seal(result,
      Seq(joined) ++ (if (ownA) Seq(ca) else Nil) ++
        (if (ownB) Seq(cb) else Nil): _*)
  }

  /** Hashing-trick LINEAR quality scorer — the fastText-style classifier
    * archetype of production corpus filters (a learned linear model over
    * bag-of-tokens features, applied at scan speed to every document):
    * each token hashes into one of `dim` buckets (md5-prefix → int, the
    * engine-portable convention of the sampling family — hashSample),
    * each bucket carries an INTEGER weight (trained weights quantized to
    * a 1/`scale` grid — the standard determinism move; floats would make
    * the per-doc sum fold-order-dependent), and a document scores the
    * mean bucket weight, centered: Σw / (scale·n) − 0.5.
    *
    * Exactness discipline (the censusDrift pattern): the per-doc
    * accumulation is an exact BIGINT sum — order-free — with ONE double
    * division at the rim, so two engines agree bit-for-bit. No
    * sigmoid/exp on purpose (the q39 libm rule): thresholding is
    * monotone in the raw score, which is all a filter needs.
    *
    * Map-only + one hash shuffle on the doc id; weights ride the plan as
    * a literal array (KBs at dim ≤ 64k — broadcast-in-plan). At 100 TB
    * this is scan-speed like the other in-row quality signals. */
  def hashedLinearScore(docs: DataFrame, idCol: String, textCol: String,
                        weights: Array[Long], scale: Long,
                        dim: Int = 1024): DataFrame = {
    require(dim > 0 && weights.length == dim,
      s"weights must have exactly dim=$dim entries, got ${weights.length}")
    require(scale > 0, s"scale must be positive, got $scale")
    docs.select(col(idCol).as("doc_id"),
        explode(Dedup.tokens(col(textCol))).as("tok"))
      .withColumn("__bucket",
        pmod(conv(substring(md5(col("tok")), 1, 6), 16, 10).cast("long"), lit(dim)))
      .withColumn("__w", element_at(typedLit(weights.toSeq), (col("__bucket") + 1).cast("int")))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("__w")).as("__sw"))
      .withColumn("score",
        col("__sw").cast("double") / (lit(scale.toDouble) * col("n_tokens")) - 0.5)
      .drop("__sw")
  }

  /** Deterministic placeholder weights on the 1/1997 grid — a stand-in
    * for an offline-trained model so the scoring path is testable
    * end-to-end (production swaps in real quantized weights; the
    * PIPELINE is what this exercises). */
  def syntheticWeights(dim: Int): Array[Long] =
    Array.tabulate(dim)(b => (b.toLong * 2654435761L) % 1997L)

  /** Fixed-size token CHUNKING with overlap — the embedding-prep op: a
    * long document embeds in windows of `chunkSize` tokens advancing by
    * `stride = chunkSize − overlap` (chunk k covers tokens
    * [k·stride, k·stride + chunkSize)); the trailing chunk may be short,
    * and a doc no longer than one window yields exactly one chunk. The
    * inverse of [[graft.llm.Similarity.meanPool]]'s chunk→doc pooling.
    * Map-only: stage tokens, one explode over a tiny chunk-index range,
    * slice per chunk — no shuffle; at 100 TB chunking is scan-speed.
    * Tokenization is the [[graft.llm.Dedup.normText]] whitespace
    * convention (the engine↔oracle-proven pairing). */
  def chunk(docs: DataFrame, idCol: String, textCol: String,
            chunkSize: Int, overlap: Int = 0): DataFrame = {
    require(chunkSize >= 1, s"chunkSize must be >= 1, got $chunkSize")
    require(overlap >= 0 && overlap < chunkSize,
      s"overlap must be in [0, chunkSize): $overlap vs $chunkSize")
    val stride = chunkSize - overlap
    docs
      .select(col(idCol).as("doc_id"), Dedup.tokens(col(textCol)).as("__toks"))
      .withColumn("__k", greatest(lit(1),
        expr(s"(size(__toks) - $overlap + ${stride - 1}) div $stride")))
      .select(col("doc_id"), col("__toks"),
        explode(sequence(lit(0), col("__k") - 1)).as("chunk_id"))
      .withColumn("__c",
        slice(col("__toks"), col("chunk_id") * stride + 1, lit(chunkSize)))
      .select(col("doc_id"), col("chunk_id").cast("long").as("chunk_id"),
        size(col("__c")).cast("long").as("n_tokens"),
        concat_ws(" ", col("__c")).as("chunk_text"))
  }

  // ----- BPE vocabulary induction (tokenizer training at corpus scale) -----
  //
  // Byte-pair encoding (Sennrich et al. 2016, the public subword
  // algorithm behind GPT/Llama-family tokenizers): start from
  // characters, repeatedly merge the most frequent adjacent symbol
  // pair. The scale design: ONE corpus-sized pass builds the
  // distinct-word census; every merge round then iterates on that
  // VOCAB-bounded table (a groupBy over adjacent pairs + a 1-row
  // argmax collect — the same bounded-model-state discipline as the
  // k-means centroids). At 100 TB the corpus is touched once; 1000
  // rounds touch only the vocabulary.
  //
  // Symbol representation: DOUBLED separators. A word is
  // `||c||h||a||t||</w>||`; merging (l, r) is the plain string replace
  // `|l||r|` → `|lr|`. Because each match consumes only the INNER
  // separator pair, the neighbors' separators survive and replace's
  // left-to-right non-overlapping scan equals BPE's one-round merge of
  // every occurrence ('a a a a' merges to 'aa aa', not the 'aa a a' a
  // single-space representation would give — the shared-boundary
  // artifact). Plain replace, no regex: codegen string ops at scan
  // speed, identical semantics in any engine.

  /** `'|'` cannot be a symbol character (it IS the separator): the
    * normalization maps it to a space before tokenizing. */
  private def bpeSanitize(t: Column): Column = regexp_replace(t, "\\|", " ")

  /** word → its initial symbol representation (chars + end-of-word
    * marker): `chat` → `||c||h||a||t||</w>||`. */
  private def bpeRep(w: Column, endMark: String): Column =
    concat(lit("||"), regexp_replace(w, "(.)", "$1||"), lit(endMark + "||"))

  /** Apply a merge chain to the `rep` column — each rule rewrites
    * `|l||r|` to `|lr|` left-to-right (the shared last mile of
    * bpeWordTokens/bpeVocab/bpeEncode: one definition, one encoding). */
  private def applyMerges(df: DataFrame,
                          merges: Seq[(String, String)]): DataFrame =
    merges.foldLeft(df) { case (d, (l, r)) =>
      d.withColumn("rep",
        replace(col("rep"), lit("|" + l + "||" + r + "|"), lit("|" + l + r + "|")))
    }

  private def bpeSyms(rep: Column): Column =
    split(regexp_replace(rep, "^\\|\\||\\|\\|$", ""), "\\|\\|")

  /** Adjacent-pair census over a (rep, freq) word table: `(l, r, cnt)`
    * with cnt = Σ word-freq per occurrence — the argmax input of one
    * BPE round, and the oracle-checkable heart of the training loop.
    * Deterministic total order: (cnt desc, l, r). */
  def bpePairCensus(words: DataFrame): DataFrame =
    words
      .select(col("freq"), bpeSyms(col("rep")).as("__syms"))
      .filter(size(col("__syms")) >= 2)
      .select(col("freq"), explode(transform(
        sequence(lit(0), size(col("__syms")) - 2),
        i => struct(element_at(col("__syms"), i + 1).as("l"),
                    element_at(col("__syms"), i + 2).as("r")))).as("__p"))
      .groupBy(col("__p.l").as("l"), col("__p.r").as("r"))
      .agg(sum(col("freq")).as("cnt"))
      .orderBy(col("cnt").desc, col("l"), col("r"))

  /** The distinct-word census in symbol representation — the ONE
    * corpus-scale pass of BPE training. */
  def bpeWordCensus(docs: DataFrame, textCol: String,
                    endMark: String = "</w>"): DataFrame =
    docs.select(explode(Dedup.tokens(bpeSanitize(col(textCol)))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .select(bpeRep(col("w"), endMark).as("rep"), col("freq"))

  /** Train `numMerges` BPE merges over a corpus. Returns the ordered
    * merge table `(rank, left, right, merged)` — the published
    * tokenizer model (k rows of driver state, like the IVF centroids).
    * Ties in the pair census break on (left, right): fully
    * deterministic on any cluster shape. Stops early when no pair
    * occurs at least `minCount` times. */
  def bpeTrain(docs: DataFrame, textCol: String, numMerges: Int,
               minCount: Long = 2, endMark: String = "</w>"): DataFrame = {
    require(numMerges >= 1 && numMerges <= 10000,
      s"numMerges must be in [1, 10000], got $numMerges")
    val spark = docs.sparkSession
    import graft.ops.Caches
    var words = bpeWordCensus(docs, textCol, endMark).persist(Caches.lvl)
    words.count()
    val merges = scala.collection.mutable.ArrayBuffer[(String, String)]()
    var done = false
    while (!done && merges.lengthCompare(numMerges) < 0) {
      val top = bpePairCensus(words).limit(1).collect()
      if (top.isEmpty || top(0).getLong(2) < minCount) done = true
      else {
        val (l, r) = (top(0).getString(0), top(0).getString(1))
        merges += ((l, r))
        val next = words.withColumn("rep",
          replace(col("rep"), lit("|" + l + "||" + r + "|"), lit("|" + l + r + "|")))
          .persist(Caches.lvl)
        next.count()
        words.unpersist()
        words = next
      }
    }
    words.unpersist()
    import spark.implicits._
    merges.toSeq.zipWithIndex
      .map { case ((l, r), i) => (i.toLong, l, r, l + r) }
      .toDF("rank", "left", "right", "merged")
  }

  /** Tokenize with a TRAINED merge list (the deployment split, like
    * `lmscore … using census`): per word, the merges apply in rank
    * order as a chain of plain string replaces — whole-stage-codegen
    * scan-speed work, no UDF, no shuffle before the per-doc rollup.
    * Returns one row per (doc, word occurrence): (doc_id, toks). */
  def bpeWordTokens(docs: DataFrame, idCol: String, textCol: String,
                    merges: Seq[(String, String)],
                    endMark: String = "</w>"): DataFrame = {
    require(merges.nonEmpty && merges.lengthCompare(10000) <= 0,
      s"merges must be 1..10000 rules, got ${merges.length}")
    merges.foreach { case (l, r) =>
      require(l.nonEmpty && r.nonEmpty && !l.contains("|") && !r.contains("|"),
        s"malformed merge rule ($l, $r)") }
    val start = docs
      .select(col(idCol).as("doc_id"),
        explode(Dedup.tokens(bpeSanitize(col(textCol)))).as("w"))
      .filter(length(col("w")) > 0)
      .select(col("doc_id"), bpeRep(col("w"), endMark).as("rep"))
    val mergedRep = applyMerges(start, merges)
    mergedRep.select(col("doc_id"), bpeSyms(col("rep")).as("toks"))
  }

  /** Per-document BPE tokenization summary: (doc_id, n_words,
    * n_tokens) — each merge that fires shrinks n_tokens by one, so the
    * counts verify the whole merge chain. */
  def bpeApply(docs: DataFrame, idCol: String, textCol: String,
               merges: Seq[(String, String)],
               endMark: String = "</w>"): DataFrame =
    bpeWordTokens(docs, idCol, textCol, merges, endMark)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"),
           sum(size(col("toks"))).cast("long").as("n_tokens"))

  /** The learned VOCABULARY: distinct post-merge tokens ranked by
    * corpus frequency — `(token, id, cnt)` with id = rank by
    * (cnt desc, token), the deterministic tie-break. Computed from the
    * distinct-word census (vocab-bounded, like training itself). */
  def bpeVocab(docs: DataFrame, textCol: String,
               merges: Seq[(String, String)],
               endMark: String = "</w>"): DataFrame = {
    val words = bpeWordCensus(docs, textCol, endMark)
    val mergedRep = applyMerges(words, merges)
    import org.apache.spark.sql.expressions.Window
    mergedRep
      .select(col("freq"), explode(bpeSyms(col("rep"))).as("token"))
      .groupBy("token").agg(sum(col("freq")).as("cnt"))
      .withColumn("id",
        (row_number().over(Window.orderBy(col("cnt").desc, col("token"))) - 1)
          .cast("long"))
      .select("token", "id", "cnt")
  }

  /** ENCODE documents to id sequences — the tensor-ready last mile
    * (tokenize → ids → [[graft.llm.Pipeline]] packing): per doc, the
    * BPE tokens in DOCUMENT ORDER (word position × in-word position)
    * mapped through the vocabulary; tokens outside it encode as -1
    * (UNK). Map-only until the per-doc rollup; the vocabulary joins
    * broadcast (vocab-bounded). Returns (doc_id, ids, n_tokens). */
  def bpeEncode(docs: DataFrame, idCol: String, textCol: String,
                merges: Seq[(String, String)], vocab: DataFrame,
                endMark: String = "</w>"): DataFrame = {
    require(Seq("token", "id").forall(vocab.columns.contains),
      s"bpeEncode needs a (token, id) vocabulary, got ${vocab.columns.mkString(", ")}")
    // CONTRACT: vocab tokens must be UNIQUE ([[bpeVocab]]'s output is,
    // by construction) — a duplicated token would silently multiply
    // sequence rows through the join below
    val words = docs
      .select(col(idCol).as("doc_id"),
        posexplode(Dedup.tokens(bpeSanitize(col(textCol)))).as(Seq("wpos", "w")))
      .filter(length(col("w")) > 0)
      .select(col("doc_id"), col("wpos"), bpeRep(col("w"), endMark).as("rep"))
    val mergedRep = applyMerges(words, merges)
    mergedRep
      .select(col("doc_id"), col("wpos"),
        posexplode(bpeSyms(col("rep"))).as(Seq("tpos", "token")))
      .join(broadcast(vocab.select(col("token"), col("id"))), Seq("token"), "left")
      .select(col("doc_id"),
        struct(col("wpos"), col("tpos"),
          coalesce(col("id"), lit(-1L)).as("id")).as("__p"))
      .groupBy("doc_id")
      .agg(transform(array_sort(collect_list(col("__p"))), s => s.getField("id"))
             .as("ids"),
           count(lit(1)).as("n_tokens"))
  }

  // ----- perceptron training for the hashed linear quality classifier -----

  /** Batch-perceptron training — the LEARNING side of
    * [[hashedLinearScore]] (deploy via `classify … using`, the same
    * train/deploy split as census→lmscore and bpetrain→bpe): labels
    * are ±1 (any boolean-castable column), features the SAME md5-bucket
    * token counts the scorer reads, so a trained table drops straight
    * into the deployed scorer. Each epoch: per-doc integer margins
    * against the broadcast weight vector, then the summed update from
    * misclassified docs (batch perceptron: v[b] += Σ y·count over docs
    * with y·margin ≤ 0; a ZERO margin counts as misclassified, so
    * epoch 1 from v = 0 is exactly the label-weighted bucket census —
    * the oracle-checkable step, q176). All arithmetic is INTEGER
    * (exact, order-free on any partitioning); the published (bucket,
    * w) table maps the signed weights onto the scorer's [0, scale)
    * grid centered at scale/2: w = clamp(scale/2 + v, 0, scale−1).
    * Model state is dim-bounded driver memory (the classify ≤ 1e6
    * contract); the feature frame is computed once and cached, each
    * epoch is two bounded jobs over it. A NULL label reads as false
    * (−1) via the boolean cast — filter upstream if null means
    * unknown rather than negative. */
  def perceptronTrain(docs: DataFrame, idCol: String, textCol: String,
                      labelCol: String, dim: Int = 1024, epochs: Int = 5,
                      scale: Long = 1997L): DataFrame = {
    require(dim >= 1 && dim <= 1000000, s"dim must be in [1, 1e6], got $dim")
    require(epochs >= 1 && epochs <= 100, s"epochs must be in [1, 100], got $epochs")
    require(scale >= 2, s"scale must be >= 2, got $scale")
    val spark = docs.sparkSession
    import graft.ops.Caches
    val feats = docs.select(col(idCol).as("doc_id"),
        when(col(labelCol).cast("boolean"), 1L).otherwise(-1L).as("y"),
        explode(Dedup.tokens(col(textCol))).as("tok"))
      .withColumn("bucket",
        pmod(conv(substring(md5(col("tok")), 1, 6), 16, 10).cast("long"), lit(dim)))
      .groupBy(col("doc_id"), col("y"), col("bucket"))
      .agg(count(lit(1)).as("c"))
      .persist(Caches.lvl)
    feats.count()
    val v = new Array[Long](dim)
    try {
      var epoch = 0
      var converged = false
      while (epoch < epochs && !converged) {
        // weights travel as a BROADCAST (bucket, w) join, not a plan
        // literal: a typedLit array re-embeds all dim entries into the
        // plan each epoch (serialized to every task, ~8 MB at the 1e6
        // dim cap × up to 100 epochs); the broadcast ships once per
        // epoch and only the NONZERO rows. A missing bucket is weight
        // 0 — identical integer math to the element_at lookup.
        import spark.implicits._
        val wPairs = v.iterator.zipWithIndex
          .collect { case (w, b) if w != 0L => (b.toLong, w) }.toSeq
        // ALL-ZERO model (every first epoch; also any epoch the updates
        // cancelled back to zero): every margin is exactly 0 and a zero
        // margin counts as misclassified, so `wrong` = every doc BY
        // ALGEBRA — skip the score/filter/re-join chain (three jobs of
        // shuffled work per epoch) and aggregate the update directly.
        // Identical integer math: sum(y·c) per bucket over all docs.
        val upd = if (wPairs.isEmpty) {
          feats.groupBy(col("bucket"))
            .agg(sum(col("y") * col("c")).as("u"))
            .collect()
        } else {
          val wTab = wPairs.toDF("bucket", "w")
          val scored = feats.join(broadcast(wTab), Seq("bucket"), "left")
            .withColumn("w", coalesce(col("w"), lit(0L)))
          val wrong = scored
            .groupBy(col("doc_id"), col("y"))
            .agg(sum(col("w") * col("c")).as("m"))
            .filter(col("y") * col("m") <= 0)
            .select("doc_id")
          feats.join(wrong, Seq("doc_id"))
            .groupBy(col("bucket"))
            .agg(sum(col("y") * col("c")).as("u"))
            .collect()
        }
        // an empty update = nothing misclassified: converged, stop —
        // burning the remaining epochs on empty jobs helps nobody
        if (upd.isEmpty) converged = true
        else upd.foreach(r => v(r.getLong(0).toInt) += r.getLong(1))
        epoch += 1
      }
    } finally feats.unpersist()
    val half = scale / 2
    import spark.implicits._
    (0 until dim).map(b =>
        (b.toLong, math.max(0L, math.min(scale - 1, half + v(b)))))
      .toDF("bucket", "w")
  }
}
