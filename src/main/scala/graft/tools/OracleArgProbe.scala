package graft.tools

import org.apache.spark.sql.functions._
import graft.{Engine, Tables}

/** One-off fixture measurements backing the closed-form planted-replica
  * oracle constructions (the q33/q46/q55 pattern): each rows-only query
  * graduates to a full DuckDB oracle only if the ORGANIC data provably
  * cannot produce the planted signal. This tool measures those margins
  * on the actual fixtures so the "provably" is an observed fact of the
  * fixed, seeded, deterministic test data, not an assumption.
  *
  *   runMain graft.tools.OracleArgProbe /root/testdata/sf0.01
  *
  * Measured 2026-08-13 (sf0.01 AND sf0.1) — recorded in FIXTURES.md §3.
  */
object OracleArgProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = Engine.session()
    val docs = Tables.documents(spark, dir)

    // 1. SimHash: minimum pairwise hamming distance over ALL organic
    //    pairs (including the fixture's planted near-dups). A planted
    //    EXACT replica has hamming 0; the closed form needs
    //    min-organic-hamming > tau.
    val sigs = graft.llm.Dedup.simhash(docs, "doc_id", "text")
    val a = sigs.select(col("doc_id").as("ia"), col("simhash").as("sa"))
    val b = sigs.select(col("doc_id").as("ib"), col("simhash").as("sb"))
    val ham = a.crossJoin(b).filter(col("ia") < col("ib"))
      .select(bit_count(col("sa").bitwiseXOR(col("sb"))).as("h"))
    val hs = ham.agg(min("h").as("min_h"),
      sum(when(col("h") <= 3, 1).otherwise(0)).as("n_le3"),
      sum(when(col("h") <= 10, 1).otherwise(0)).as("n_le10")).first()
    println(s"PROBE simhash: min_hamming=${hs.get(0)} pairs_le3=${hs.get(1)} pairs_le10=${hs.get(2)}")

    // 2. Winnowing fingerprints: organic pairs with IDENTICAL fingerprint
    //    arrays (exact replicas are identical by construction).
    val fps = graft.llm.TextOps.fingerprint(docs, "doc_id", "text")
    val fpCollisions = fps.groupBy(col("fingerprint"))
      .agg(count(lit(1)).as("n")).filter(col("n") > 1).count()
    println(s"PROBE fingerprint: organic_identical_sets=$fpCollisions")

    // 3. Group minhash sketch: max organic source-pair est_jaccard (a
    //    planted whole-source replica estimates exactly 1.0).
    val srcSigs = docs
      .select(col("source"), graft.llm.Dedup.normText(col("text")).as("__t"))
      .groupBy(col("source"))
      .agg(graft.functions.MinHashAgg.minhash(col("__t"), 64).as("sig"))
    val sa2 = srcSigs.select(col("source").as("ia"), col("sig").as("siga"))
    val sb2 = srcSigs.select(col("source").as("ib"), col("sig").as("sigb"))
    val maxJ = sa2.crossJoin(sb2).filter(col("ia") < col("ib"))
      .select(graft.functions.MinHashAgg.estJaccard(col("siga"), col("sigb"), 64).as("j"))
      .agg(max("j")).first().get(0)
    println(s"PROBE group_sketch: max_organic_est_jaccard=$maxJ")

    // 3b. Are the organic simhash-colliding pairs exact (normalized-)text
    //     duplicates — i.e. DuckDB-identifiable — or lossy near-dups?
    val txt = docs.select(col("doc_id"),
      graft.llm.Dedup.normText(col("text")).as("nt"))
    val ta = txt.select(col("doc_id").as("ia"), col("nt").as("nta"))
    val tb = txt.select(col("doc_id").as("ib"), col("nt").as("ntb"))
    val hamPairs = a.crossJoin(b).filter(col("ia") < col("ib"))
      .withColumn("h", bit_count(col("sa").bitwiseXOR(col("sb"))))
      .filter(col("h") <= 3)
      .join(ta, Seq("ia")).join(tb, Seq("ib"))
      .withColumn("text_eq", (col("nta") === col("ntb")).cast("int"))
    hamPairs.groupBy(col("h"), col("text_eq")).agg(count(lit(1)).as("n"))
      .orderBy(col("h"), col("text_eq"))
      .collect().foreach(r => println(s"PROBE simhash_le3: hamming=${r.get(0)} text_eq=${r.get(1)} n=${r.get(2)}"))

    // 3c. Hamming floor on q93's EXACT clean subset: doc_id < 200 minus
    //     members of any pair with exact 3-gram Jaccard >= 0.3 (the rule
    //     both engines compute identically). The floor must clear q93's
    //     tau = 1.
    val sh = docs.filter(col("doc_id") < 200)
      .select(col("doc_id"), graft.llm.Dedup.tokens(col("text")).as("__tk"))
      .select(col("doc_id"), graft.llm.Dedup.shinglesFromTokens(col("__tk"), 3).as("shg"))
    val sha = sh.select(col("doc_id").as("ia"), col("shg").as("ga"))
    val shb = sh.select(col("doc_id").as("ib"), col("shg").as("gb"))
    val nearDupIds = sha.crossJoin(shb).filter(col("ia") < col("ib"))
      .withColumn("j", size(array_intersect(col("ga"), col("gb"))).cast("double") /
                       size(array_union(col("ga"), col("gb"))).cast("double"))
      .filter(col("j") >= 0.3)
      .select(explode(array(col("ia"), col("ib"))).as("doc_id")).distinct()
    println(s"PROBE neardup_members_lt200: ${nearDupIds.count()}")
    val clean = sigs.filter(col("doc_id") < 200)
      .join(nearDupIds, Seq("doc_id"), "left_anti")
    val ca = clean.select(col("doc_id").as("ia"), col("simhash").as("sa"))
    val cb = clean.select(col("doc_id").as("ib"), col("simhash").as("sb"))
    val cleanMin = ca.crossJoin(cb).filter(col("ia") < col("ib"))
      .select(bit_count(col("sa").bitwiseXOR(col("sb"))).as("h"))
      .agg(min("h")).first().get(0)
    println(s"PROBE simhash_clean_subset: min_hamming=$cleanMin")

    // 3d. Same question for fingerprints: do identical organic
    //     fingerprint sets come from identical normalized text?
    val fpa = fps.select(col("doc_id").as("ia"), col("fingerprint").as("fa"))
    val fpb = fps.select(col("doc_id").as("ib"), col("fingerprint").as("fb"))
    val fpPairs = fpa.crossJoin(fpb).filter(col("ia") < col("ib"))
      .filter(col("fa") === col("fb"))
      .join(ta, Seq("ia")).join(tb, Seq("ib"))
      .withColumn("text_eq", (col("nta") === col("ntb")).cast("int"))
    fpPairs.groupBy(col("text_eq")).agg(count(lit(1)).as("n"))
      .collect().foreach(r => println(s"PROBE fp_identical: text_eq=${r.get(0)} n=${r.get(1)}"))

    // 4. Multimodal fake-feature f0: replica equality is deterministic
    //    (same bytes -> same xxhash64 chain); nothing to measure. But
    //    record the organic f0 spread so a degenerate constant-feature
    //    bug is visibly excluded by the n_distinct count.
    val f0s = graft.llm.Multimodal.pipeline(docs, "doc_id", "text")
      .select(round(element_at(col("features"), 1), 6).as("f0"))
    println(s"PROBE multimodal: n_distinct_f0=${f0s.distinct().count()} of ${f0s.count()}")

    spark.stop()
  }
}
