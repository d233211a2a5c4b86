package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.functions._

/** Physical-plan hygiene: the properties that decide whether a query
  * survives a 100× scale-up. These assertions pin the plans we want —
  * pushdown reaching the scan, broadcasts chosen for dims, top-k not
  * full-sorting — so a regression in plan shape fails CI, not the
  * cluster. */
class PlanSpec extends SparkSpec {

  private def planOf(name: String): String = {
    val df = Queries.all(name)(spark, sf)
    df.queryExecution.executedPlan.toString
  }

  test("q02: filters and projection push down to the parquet scan") {
    val p = planOf("q02_filter_project")
    assert(p.contains("PushedFilters: ["), "no pushed filters in scan")
    assert(p.contains("l_shipdate"), "shipdate predicate not pushed")
    // column pruning: scan must not read the 11-col schema
    assert(!p.contains("l_returnflag"), "unused column read by scan")
  }

  test("q03: top-k compiles to TakeOrderedAndProject, not a global sort") {
    val p = planOf("q03_topk")
    assert(p.contains("TakeOrderedAndProject"), s"no top-k operator:\n$p")
  }

  test("q04/q05: dimension joins broadcast (no shuffle of the dims)") {
    assert(planOf("q04_join_agg").contains("BroadcastHashJoin"))
    val p5 = planOf("q05_star_join")
    assert(p5.contains("BroadcastHashJoin"), "star dims not broadcast")
  }

  test("q01: aggregation is partial+final (map-side combine)") {
    val p = planOf("q01_agg_pricing")
    assert(p.contains("partial_sum") || p.contains("partial"),
      "no partial aggregation before the shuffle")
  }

  test("q86: the typed Aggregator runs partial+final like a built-in") {
    // the OhlcAggregator scaladoc's scale claim, pinned: constant-size
    // buffers merge map-side, so only per-key buffers cross the shuffle
    val p = planOf("q86_ohlc_aggregator")
    assert(p.contains("partial_ohlc") ||
           ("(?i)partial.*ohlc".r.findFirstIn(p).isDefined),
      s"typed aggregation is not partial+final:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("q06/q07: semi/anti joins stay joins (no subquery materialization)") {
    assert(planOf("q06_semi_join").contains("LeftSemi"))
    assert(planOf("q07_anti_join").contains("LeftAnti"))
  }

  test("q22: as-of join is ONE shuffle per side (union+window, no join explosion)") {
    val p = planOf("q22_asof_join")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges <= 2, s"as-of should shuffle each side once, saw $exchanges exchanges")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("q14: whole-stage codegen covers the aggregation pipeline") {
    // AQE reveals the final physical plan only after executing THIS df's
    // own QueryExecution (count() would plan a different query)
    val df = Queries.all("q14_hourly_buckets")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // codegen'd operators print with the `*(stageId)` star marker
    assert(p.contains("*("), s"agg path fell out of whole-stage codegen:\n$p")
    assert(p.contains("isFinalPlan=true"))
  }

  test("q29: minhash plan has no cartesian product (LSH bucketing holds)") {
    // inspect the LAZY plan (the public minhashPairs seals the result and
    // releases these caches — which is separately asserted in
    // CacheHygieneSpec; the plan shape lives one layer in)
    val (df, caches) = llm.Dedup.minhashPairsPlan(
      Tables.fanOut(Tables.documents(spark, sf)), "doc_id", "text",
      jaccardThreshold = 0.2)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), "pair generation exploded to n²")
    // the skew guard must be a partial aggregate, never a window sort of
    // every banded row (the round-1 90s regression shape)
    assert(!p.contains("Window"), s"minhash skew guard regressed to a window:\n$p")
    // the banded self-join carries no array payload: shingle hashes enter
    // only through the two verification joins on doc id
    assert(p.contains("InMemoryTableScan") || p.contains("TableCacheQueryStage"),
      s"banded/hashed intermediates not cached (3x recompute):\n$p")
    caches.foreach(_.unpersist(true))
  }

  test("q30: simhash blocking plan — cached signatures, no window, no cartesian") {
    // same discipline as minhashPairs: the chunked signature frame feeds
    // the skew guard and (via the anti-join) both self-join sides, so an
    // unpersisted plan recomputes the 64-bit sign-sum up to 4×
    val (df, caches) = llm.Dedup.simhashPairsPlan(
      Tables.fanOut(Tables.documents(spark, sf)), "doc_id", "text")
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), "simhash pair generation exploded to n²")
    assert(!p.contains("Window"), s"simhash skew guard regressed to a window:\n$p")
    assert(p.contains("InMemoryTableScan") || p.contains("TableCacheQueryStage"),
      s"chunked signatures not cached (4x recompute):\n$p")
    caches.foreach(_.unpersist(true))
  }

  test("q114/q115: ADC scans broadcast the query+LUT side; IVF-PQ joins on list_id") {
    // inspect the LAZY plans (the public wrappers seal the tiny result,
    // which hides the interior plan behind a checkpoint scan — same
    // discipline as the q29/q30 pins above)
    val emb = Tables.fanOut(Tables.embeddings(spark, sf))
    val qs = emb.filter(col("vec_id") < 3)
    // PQ flat scan: candidates stream as codes against the broadcast
    // query/lookup-table side — a SortMergeJoin here would shuffle the
    // whole coded corpus per query batch
    val (df114, c114) = llm.Similarity.pqTopKPlan(qs, emb, 3)
    val p114 = df114.queryExecution.executedPlan.toString
    assert(p114.contains("BroadcastNestedLoopJoin") || p114.contains("BroadcastExchange"),
      s"q114 ADC scan does not broadcast the query side:\n$p114")
    c114.foreach(_.unpersist(true))
    // IVF-PQ: the probed-list join is an equi-join on list_id with the
    // query side broadcast — never a cross product of codes × queries
    val (df115, c115) = llm.Similarity.ivfPqTopKPlan(qs, emb, 3)
    val p115 = df115.queryExecution.executedPlan.toString
    assert(p115.contains("BroadcastExchange"),
      s"q115 probed-list join does not broadcast the query side:\n$p115")
    assert(!p115.contains("CartesianProduct"),
      s"q115 IVF-PQ regressed to a cross product:\n$p115")
    c115.foreach(_.unpersist(true))
  }

  test("q57: corpus-clean composition is ONE scan (features are projections)") {
    val p = planOf("q57_corpus_clean")
    val scans = "Scan parquet|FileScan parquet".r.findAllIn(p).length
    assert(scans == 1, s"feature passes re-scanned the corpus ($scans scans):\n$p")
  }

  test("q52: text-front-end span filter pushes to the parquet scan") {
    val p = planOf("q52_kerf_text")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"),
      s"span-literal predicate did not reach the scan:\n$p")
    assert(!p.contains("l_orderkey"), "unused columns read by text-lowered scan")
  }

  test("q100: dialect where + bars group key push to the scan / stay codegen") {
    val p = planOf("q100_kerf_bars")
    assert(p.contains("PushedFilters: [IsNotNull(event_type), EqualTo(event_type,click)]"),
      s"dialect where did not reach the parquet scan:\n$p")
    assert(!p.contains("props"), "unused columns read by the bars rollup scan")
  }

  test("q44: band range-join stays an equi-join (no nested-loop explosion)") {
    val p = planOf("q44_range_join")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "band join fell back to a theta join")
  }

  test("q47: correlated avg lowers to one extra agg + join, not a rescan per row") {
    val p = planOf("q47_below_avg")
    assert(!p.contains("CartesianProduct"))
    val scans = "Scan parquet|FileScan parquet".r.findAllIn(p).length
    assert(scans <= 2, s"expected <=2 lineitem scans, got $scans") // self-agg + probe
  }

  test("q63/q64: scrub + hash-sample stay map-only (no join, no window)") {
    val p63 = planOf("q63_pii_scrub")
    assert(!p63.contains("Join") && !p63.contains("Window"),
      s"redaction must be a pure projection pipeline:\n$p63")
    val p64 = planOf("q64_hash_sample")
    assert(!p64.contains("Join") && !p64.contains("Window"),
      s"hash sampling must be a pushed filter + one aggregate:\n$p64")
    assert(p64.contains("partial"), "sample aggregate lost map-side combine")
  }

  test("q66: benchmark shingles broadcast; corpus is never sort-merge joined") {
    val p = planOf("q66_contamination")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"),
      s"contamination check must broadcast the benchmark set:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"corpus side must not shuffle for the semi-join:\n$p")
  }

  test("q106: bloom prefilter rides the exploded shingle stream map-side") {
    // q106's FINAL plan hides the dirty-id computation behind the sealed
    // checkpoint (by design — only the tiny id list is pinned), so the
    // bloom placement is pinned on the stage it lives in: the same
    // explode → filter → confirm-semi-join pipeline decontaminate builds,
    // composed from the public pieces
    val docs = Tables.documents(spark, sf)
    def sh(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id"), explode(graft.functions.ShingleHashes.shingleHashes(
        llm.Dedup.normText(col("text")), 3)).as("s"))
    val bench = sh(docs.filter(col("doc_id") % 97 === 0)).select(col("s")).distinct()
    val pred = llm.Pipeline.bloomPredicate(bench, "s")
    val stage = sh(docs).filter(pred(col("s"))).join(bench, Seq("s"), "left_semi")
    val p = stage.queryExecution.executedPlan.toString
    assert(p.contains("might_contain"),
      s"bloom prefilter missing from the decontamination stage:\n$p")
    // the prefilter must sit in the corpus scan's own stage: the tree
    // prints parent-above-child, so between the might_contain filter and
    // the corpus FileScan directly below it there must be no Exchange
    // (an exchange there = every shingle shuffled before the filter)
    val probe = p.substring(p.indexOf("might_contain"))
    val scanAt = "FileScan parquet|Scan parquet".r.findFirstMatchIn(probe)
      .map(_.start).getOrElse(fail(s"no corpus scan under the filter:\n$p"))
    assert(!probe.substring(0, scanAt).contains("Exchange"),
      s"shingles were shuffled BEFORE the bloom prefilter:\n$p")
    assert(p.contains("LeftSemi"), s"exact confirm semi-join missing:\n$p")
    // and the final q106 plan: clean-doc removal is the lazy anti-join
    // against the sealed (ExistingRDD) dirty list — never a cartesian
    val pq = planOf("q106_decontaminate")
    assert(!pq.contains("CartesianProduct"))
    assert(pq.contains("LeftAnti") && pq.contains("ExistingRDD"), pq)
  }

  test("q107/q110: stratified sample and dialect sample stay map-only") {
    val p107 = planOf("q107_stratified_sample")
    assert(!p107.contains("Join") && !p107.contains("Window"),
      s"stratified sampling must be a pushed CASE filter:\n$p107")
    val p110 = planOf("q110_kerf_sample")
    // sample is a filter; shard adds exactly the one per-shard rank window
    assert(!p110.contains("Join"), s"sample/shard composed plan grew a join:\n$p110")
  }

  test("q112: stratum cap runs a partial top-N BEFORE the shuffle (WindowGroupLimit)") {
    // the rank<=N predicate must rewrite to per-map-task group limits so
    // a hot stratum ships ~N·tasks rows, not its whole page count
    val p = planOf("q112_stratum_cap")
    assert(p.contains("WindowGroupLimit"),
      s"rank filter not rewritten to a pre-shuffle group limit:\n$p")
    // per-line match so the Partial mode must appear on the
    // WindowGroupLimit node itself, not anywhere else in the plan
    assert(p.linesIterator.exists(l =>
      l.contains("WindowGroupLimit") && l.contains("Partial")),
      s"no PARTIAL (map-side) group limit in plan:\n$p")
  }

  test("q111: repeated-span removal — census is partial-agg, no cartesian") {
    val p = planOf("q111_repeated_spans")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"segment census exploded:\n$p")
    assert(p.contains("partial_count") || p.contains("partial"),
      s"census count not map-side combined:\n$p")
  }

  test("semDedup: pair stage is an equi-join on list_id, no cartesian; witness election partial-aggs") {
    val emb = Tables.fanOut(Tables.embeddings(spark, sf))
    val (victims, caches) = llm.Similarity.semDedupVictimsPlan(
      emb, threshold = 0.95, nClusters = 4)
    val p = victims.queryExecution.executedPlan.toString
    // the quadratic must stay cluster-bounded: an equi-shuffle on
    // list_id, never an all-pairs product over the corpus
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"semDedup pair stage exploded to all-pairs:\n$p")
    assert(p.contains("list_id"), s"pair join lost its cluster key:\n$p")
    // min-struct witness election map-side combines before its shuffle
    // (SortAggregate: struct-typed min isn't hash-aggregable)
    assert(p.linesIterator.exists(l =>
      l.contains("Aggregate") && l.contains("partial_min")),
      s"witness election not partial-agged:\n$p")
    caches.foreach(_.unpersist(true))
  }

  test("persisted IVF probe: the scan is statically partition-pruned on list_id") {
    val emb = Tables.fanOut(Tables.embeddings(spark, sf))
    val path = java.nio.file.Files.createTempDirectory("graft_ivfplan").toString
    llm.Similarity.writeIvfIndex(emb, s"$path/idx", nLists = 8)
    val probe = llm.Similarity.ivfTopKIndexed(spark, s"$path/idx",
      emb.filter(col("vec_id") < 3), 3, nProbe = 2)
    probe.collect()
    val p = probe.queryExecution.executedPlan.toString
    // the probed-list isin literal must reach the scan as a partition
    // filter — the index's whole point: read nProbe/nLists of the corpus
    assert(p.contains("PartitionFilters") &&
      p.linesIterator.exists(l => l.contains("PartitionFilters") && l.contains("list_id")),
      s"probe scan not partition-pruned:\n$p")
  }

  test("fp16 IVF probe keeps the static list_id partition pruning") {
    // the tiers must COMPOSE: decoding fp16 at scan cannot cost the
    // directory pruning (the decode is a projection over the pruned scan)
    val emb = Tables.fanOut(Tables.embeddings(spark, sf))
    val path = java.nio.file.Files.createTempDirectory("graft_ivffp16plan").toString
    llm.Similarity.writeIvfIndex(emb, s"$path/idx", nLists = 8, halfPrecision = true)
    val probe = llm.Similarity.ivfTopKIndexed(spark, s"$path/idx",
      emb.filter(col("vec_id") < 3), 3, nProbe = 2)
    probe.collect()
    val p = probe.queryExecution.executedPlan.toString
    assert(p.linesIterator.exists(l =>
      l.contains("PartitionFilters") && l.contains("list_id")),
      s"fp16 probe scan not partition-pruned:\n$p")
  }

  test("nested-path select prunes the events scan to the referenced columns") {
    // ATLAS access must not widen the scan: a dialect select touching
    // only (event_type, props) reads exactly those two columns —
    // from_json is a projection, never a schema-inference pass
    Tables.events(spark, sf).createOrReplaceTempView("events_planspec")
    val df = sql.KerfSql.run(spark,
      "t: select event_type, fromjson(props, 'k int') as pj from events_planspec; " +
      "select event_type, sum(pj.k) as sk from t group event_type order event_type")
    val p = df.queryExecution.executedPlan.toString
    val scanLine = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(scanLine.contains("props") && scanLine.contains("event_type") &&
      !scanLine.contains("user_id") && !scanLine.contains("value"),
      s"nested select read more than (event_type, props):\n$scanLine")
  }

  test("topK tiers: row_number<=k rewrites to WindowGroupLimit partial limits") {
    // the 100 TB re-rank property: each per-q_id top-k window must run a
    // PARTIAL (map-side) group limit before its shuffle, so the exchange
    // carries ~k·tasks candidate rows per query instead of every scored
    // candidate — the same Spark 4 rank-limit pushdown pinned for q112
    val emb = Tables.fanOut(Tables.embeddings(spark, sf))
    val qs = emb.filter(col("vec_id") < 3)
    def pin(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("WindowGroupLimit"),
        s"$name: rank filter not rewritten to WindowGroupLimit:\n$p")
      // per-line match so the Partial mode must appear on the
      // WindowGroupLimit node itself, not anywhere else in the plan
      assert(p.linesIterator.exists(l =>
        l.contains("WindowGroupLimit") && l.contains("Partial")),
        s"$name: no PARTIAL (map-side) group limit:\n$p")
    }
    pin("bruteForceTopK", llm.Similarity.bruteForceTopK(qs, emb, 3))
    val (dfIvf, cIvf) = llm.Similarity.ivfTopKPlan(qs, emb, 3)
    pin("ivfTopK", dfIvf); cIvf.foreach(_.unpersist(true))
    val (dfPq, cPq) = llm.Similarity.pqTopKPlan(qs, emb, 3)
    pin("pqTopK", dfPq); cPq.foreach(_.unpersist(true))
    val (dfIvfPq, cIvfPq) = llm.Similarity.ivfPqTopKPlan(qs, emb, 3)
    pin("ivfPqTopK", dfIvfPq); cIvfPq.foreach(_.unpersist(true))
  }

  test("entry: flagship plan reads only needed columns") {
    val p = SparkEntry.entry(spark).queryExecution.executedPlan.toString
    assert(p.contains("ReadSchema"), "no schema info in scan")
  }

  test("q155: all four moving-verb columns share ONE window shuffle + sort") {
    // fills/msums/mavgs/mmins/mmaxs ride the SAME (group, order) window
    // spec, so Catalyst collapses them into one Window operator over one
    // Exchange and one Sort — a per-verb shuffle would multiply the cost
    // of exactly the multi-column tick queries the family exists for
    val p = planOf("q155_kerf_moving")
    val windows = "Window ".r.findAllIn(p).length
    // frame specs differ (3-row vs 5-row), so Spark may emit one Window
    // op per distinct frame — but never per column, and all downstream
    // of a single hash exchange on the partition key
    assert(windows <= 2, s"expected <=2 Window ops (one per frame), got $windows:\n$p")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges == 1, s"expected exactly 1 window shuffle, got $exchanges:\n$p")
  }

  test("q158: five moments share one aggregation pass (deduped decimal sums)") {
    // wavg/var/dev/cov/cor re-derive the same decimal sums; Catalyst
    // must dedup the aggregate expressions into ONE partial+final pair
    // over ONE shuffle — per-moment passes would multiply the scan cost
    val p = planOf("q158_kerf_stats")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges == 1, s"expected 1 agg shuffle, got $exchanges:\n$p")
    assert(p.contains("partial"), "no partial aggregation before the shuffle")
  }

  test("q168/q169: collect is ONE partial-agg shuffle; ungroup adds a generate, no extra shuffle") {
    // collect_list cannot partial-aggregate element-wise, but the plan
    // must still be ONE hash shuffle into ObjectHashAggregate — and
    // the array bytes exist only post-aggregation (the scan reads
    // scalar columns)
    val p8 = planOf("q168_kerf_collect")
    val agg8 = "Exchange hashpartitioning".r.findAllIn(p8).length
    assert(agg8 == 1, s"expected 1 collect shuffle, got $agg8:\n$p8")
    // ungroup: the round trip is collect's shuffle + one Generate —
    // the lockstep zip-explode itself must NOT shuffle
    val p9 = planOf("q169_kerf_ungroup")
    assert(p9.contains("Generate"), s"no generate in ungroup plan:\n$p9")
    val agg9 = "Exchange hashpartitioning".r.findAllIn(p9).length
    assert(agg9 == 1, s"ungroup added a shuffle beyond collect's: $agg9:\n$p9")
  }

  test("q170: differs is ONE window pass, never a self-join") {
    val p = planOf("q170_kerf_differs")
    assert(p.contains("Window"), s"no window in differs plan:\n$p")
    assert(!p.contains("Join"), s"differs lowered to a join:\n$p")
  }

  test("q172: BPE apply is map-only until the per-doc rollup (codegen replaces, no UDF)") {
    val p = planOf("q172_bpe_tokenize")
    // one shuffle: the per-doc groupBy; the merge chain itself is
    // projection work at scan speed
    val agg = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(agg == 1, s"expected 1 rollup shuffle, got $agg:\n$p")
    assert(!p.contains("BatchEvalPython") && !p.contains("ScalaUDF"),
      s"UDF in the BPE hot path:\n$p")
    // the whole merge chain must collapse into ONE projection (nested
    // codegen `replace` calls), not one projection per rule
    val projects = "Project \\[".r.findAllIn(p).length
    assert(projects <= 2, s"merge chain did not collapse ($projects projects):\n$p")
  }

  test("q136: the tokenize step stays inside whole-stage codegen (no higher-order fallback)") {
    // the r16 lesson: one CodegenFallback expression in a rim verb
    // (tokens() spelled with an ArrayFilter lambda) taxed EVERY text
    // pipeline 20-27% — census, TF-IDF, BPE, perceptron all tokenize.
    // Pin the hot path: no higher-order functions in the unigram plan,
    // and the tokenize projection lives under a WholeStageCodegen span.
    // (q136's own output is sealed behind a localCheckpoint, so pin the
    // INNER census plan — the per-token scan path where the lambda
    // filter lived; the deterministic sorted fold at the aggregation
    // rim is a deliberate ArrayAggregate over a vocab-bounded list)
    val census = graft.llm.TextOps.unigramCensus(
      Tables.documents(spark, sf), "doc_id", "text")
    // collect() (not count()) — count() builds its OWN queryExecution;
    // collect() executes THIS one, so AQE finalizes and codegen spans
    // become visible in the executed plan. The census is vocab-sized.
    census.collect()
    val p = census.queryExecution.executedPlan.toString
    assert(!p.contains("array_filter") && !p.contains("ArrayFilter"),
      s"lambda filter (CodegenFallback) back in the tokenize hot path:\n$p")
    // AQE's final-plan rendering marks codegen'd operators with the
    // `*(n)` prefix; the Generate(tokenize) node must carry one
    assert("\\*\\(\\d+\\) Generate explode".r.findFirstIn(p).isDefined,
      s"the tokenize Generate is outside whole-stage codegen:\n$p")
    assert(p.contains("array_remove"),
      s"empty-doc phantom guard missing from the tokenize path:\n$p")
  }

  test("q175/q179/q183: TWAP one window+agg; prevailing stays merge-joined; cap gets WindowGroupLimit") {
    // TWAP: one window pass (nexts) + one grouped aggregate — no join,
    // no second window
    val p175 = planOf("q175_kerf_twap")
    assert(!p175.contains("Join"), s"TWAP grew a join:\n$p175")
    assert("Window\\b".r.findAllIn(p175).length >= 1 &&
      !p175.contains("CartesianProduct"), s"TWAP window shape:\n$p175")
    // wj prevailing: the band join stays hash/merge and the prevailing
    // rows ride the native as-of merge — never a nested-loop
    val p179 = planOf("q179_kerf_wj_prevailing")
    assert(!p179.contains("CartesianProduct") &&
           !p179.contains("BroadcastNestedLoopJoin"),
      s"prevailing degenerated:\n$p179")
    assert(p179.contains("AsOfJoin") || p179.contains("AsOfMerge") ||
           p179.toLowerCase.contains("asof"),
      s"prevailing did not use the native as-of merge:\n$p179")
    // coverage sampling: the per-stratum cut must be WindowGroupLimit
    // partial limits, not a full per-stratum sort
    val p183 = planOf("q183_diversity_sample")
    assert(p183.contains("WindowGroupLimit"), s"no WindowGroupLimit:\n$p183")
  }

  test("q185: aggregate navigation scans the rollup, never the batch history") {
    val p = planOf("q185_rollup_navigation")
    assert(p.contains("/meta/"), s"navigation missed the rollup:\n$p")
    assert(!p.contains("/batches/"), s"history scanned despite navigation:\n$p")
  }

  test("fanOut widens unstatted non-file leaves (defaultSizeInBytes sentinel)") {
    // an RDD-backed frame has no file listing AND reports the
    // defaultSizeInBytes sentinel as its stats — taking the sentinel at
    // face value would make the width estimate >= target always and
    // silently skip the repartition for exactly the frames that need it
    import spark.implicits._
    val rddDf = spark.createDataset(
      spark.sparkContext.parallelize(Seq(1L, 2L, 3L), 1)).toDF("v")
    assert(rddDf.rdd.getNumPartitions == 1)
    assert(Tables.fanOut(rddDf).rdd.getNumPartitions ==
      spark.sparkContext.defaultParallelism)
    // file-backed behavior unchanged: a small parquet still fans out
    assert(Tables.fanOut(Tables.documents(spark, sf)).rdd.getNumPartitions ==
      spark.sparkContext.defaultParallelism)
  }
}
