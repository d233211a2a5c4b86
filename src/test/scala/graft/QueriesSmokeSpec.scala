package graft

/** Every registered query runs at sf0.001 and (except known-sparse ones)
  * returns rows. The real correctness gate is the DuckDB oracle at sf0.01
  * (scripts/oracle_check.py); this is the fast regression net. */
class QueriesSmokeSpec extends SparkSpec {

  private val mayBeEmpty = Set("q29_minhash_dedup", "q34_ngram_jaccard",
    "q07_anti_join", "q18_string_funcs")

  Queries.all.foreach { case (name, fn) =>
    test(s"$name runs at sf0.001") {
      val n = fn(spark, sf).count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a query") {
    assert(Oracles.all.keySet.subsetOf(Queries.all.keySet))
  }
}
