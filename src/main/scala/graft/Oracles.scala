package graft

/** DuckDB-runnable ANSI SQL twins of [[Queries]]. Same table names, same
  * output column aliases, same ORDER BY, same exact-decimal arithmetic —
  * the driver hash-compares after sorting columns by name.
  *
  * events.ts is TIMESTAMP_NS in DuckDB; the Spark side reads it as a
  * ns-long (`ts_ns`) → the SQL twin uses epoch_ns(ts).
  */
object Oracles {

  // ── SplitMix64 replayed in DuckDB (graft.functions.Rng twin) ───────
  // a·b mod 2^64 via 32-bit limb split: a full 64×64 product would
  // overflow signed HUGEINT, the limbs never do.
  private def mm(a: String, b: String): String =
    s"(((($a) % 4294967296) * (($b) % 4294967296) + " +
    s"((((($a) % 4294967296) * (($b) // 4294967296)) + " +
    s"((($a) // 4294967296) * (($b) % 4294967296))) % 4294967296) * " +
    s"4294967296) % 18446744073709551616)"
  // z ^ (z >>> k) — logical shift and xor in UBIGINT, back to HUGEINT
  private def xs(z: String, k: Int): String =
    s"xor(($z)::UBIGINT, ($z)::UBIGINT >> $k)::HUGEINT"
  private val G  = "11400714819323198485::HUGEINT" // 0x9E3779B97F4A7C15
  private val C1 = "13787848793156543929::HUGEINT" // 0xBF58476D1CE4E5B9
  private val C2 = "10723151780598845931::HUGEINT" // 0x94D049BB133111EB
  /** CTE stage columns for u64(seed, key): z0→z1→z2→u per stage. */
  private def rngZ0(seed: Long, key: String): String =
    s"($seed::HUGEINT + ${mm(s"($key)::HUGEINT + 1", G)}) % 18446744073709551616"
  private def rngZ1(z: String): String = mm(xs(z, 30), C1)
  private def rngZ2(z: String): String = mm(xs(z, 27), C2)
  private def rngU(z: String): String = xs(z, 31)
  /** unsigned [0,2^64) → the engine's signed-long face */
  private def signed(u: String): String =
    s"(($u) - CASE WHEN ($u) >= 9223372036854775808::HUGEINT " +
    s"THEN 18446744073709551616::HUGEINT ELSE 0::HUGEINT END)::BIGINT"
  /** unsigned → the 53-bit [0,1) conversion (exact in doubles) */
  private def u01(u: String): String =
    s"((($u)::UBIGINT >> 11)::DOUBLE / 9007199254740992.0)"

  // ONE definition for an engine that answers through two faces (API
  // query + dialect-verb query): the incremental probes' oracles are
  // shared vals, so the "same engine, same answer" contract cannot
  // drift between the q197/q116 and q198/q117 pairs
  private val incrementalDedupSql =
    """WITH toks AS (
           SELECT doc_id,
                  string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS t
           FROM documents),
         shing AS (
           SELECT doc_id,
                  CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
                       ELSE list_distinct(list_transform(range(1, len(t) - 1),
                              i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
                  END AS s
           FROM toks),
         ex AS (SELECT doc_id, unnest(s) AS sh FROM shing),
         sizes AS (SELECT doc_id, count(*) AS c FROM ex GROUP BY 1),
         inter AS (SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS i
                   FROM ex a JOIN ex b ON a.sh = b.sh
                   WHERE a.doc_id % 3 <> 0 AND b.doc_id % 3 = 0
                   GROUP BY 1, 2)
         SELECT ia AS id_a, ib AS id_b,
                i::DOUBLE / (sa.c + sb.c - i)::DOUBLE AS jaccard
         FROM inter
         JOIN sizes sa ON sa.doc_id = ia
         JOIN sizes sb ON sb.doc_id = ib
         WHERE i::DOUBLE / (sa.c + sb.c - i)::DOUBLE >= 0.2
         ORDER BY id_a, id_b"""

  // one truth per BEHAVIORAL PAIR (batch/stream, API/dialect twins):
  // a verbatim duplicate string lets an edit to one copy silently
  // strand its twin (the incrementalDedupSql lesson, generalized)
  private val hourlyBucketsSql =
    """SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS bucket, event_type,
                count(*) AS n,
                CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
                min(value) AS low, max(value) AS high
         FROM events GROUP BY 1, 2 ORDER BY bucket, event_type"""

  private val bpeTokenizeSql =
    """WITH w AS (
           SELECT doc_id,
                  unnest(string_split(trim(regexp_replace(
                    replace(lower(text), '|', ' '), '\s+', ' ', 'g')), ' ')) AS w
           FROM documents),
         r0 AS (
           SELECT doc_id,
                  '||' || regexp_replace(w, '(.)', '\1||', 'g') || '</w>||' AS rep
           FROM w WHERE length(w) > 0),
         r1 AS (SELECT doc_id, replace(rep, '|t||h|', '|th|') AS rep FROM r0),
         r2 AS (SELECT doc_id, replace(rep, '|th||e|', '|the|') AS rep FROM r1),
         r3 AS (SELECT doc_id, replace(rep, '|the||</w>|', '|the</w>|') AS rep FROM r2),
         r4 AS (SELECT doc_id, replace(rep, '|v||a|', '|va|') AS rep FROM r3),
         r5 AS (SELECT doc_id, replace(rep, '|va||l|', '|val|') AS rep FROM r4),
         r6 AS (SELECT doc_id, replace(rep, '|a||</w>|', '|a</w>|') AS rep FROM r5)
         SELECT doc_id, count(*) AS n_words,
                CAST(sum((length(rep) - length(replace(rep, '|', ''))) // 2 - 1)
                     AS BIGINT) AS n_tokens
         FROM r6 GROUP BY doc_id ORDER BY doc_id"""

  private val corpusDriftSql =
    """WITH ta AS (
           SELECT tok, count(*) AS cnt FROM (
             SELECT unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS tok
             FROM documents WHERE doc_id < 250) GROUP BY tok),
         tbl AS (
           SELECT tok, count(*) AS cnt FROM (
             SELECT unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS tok
             FROM documents WHERE doc_id >= 250) GROUP BY tok),
         tot AS (SELECT (SELECT sum(cnt) FROM ta) AS sa, (SELECT sum(cnt) FROM tbl) AS sb),
         j AS (
           SELECT coalesce(a.tok, b.tok) AS tok,
                  coalesce(a.cnt, 0) AS cnt_a, coalesce(b.cnt, 0) AS cnt_b,
                  abs(CAST(coalesce(a.cnt, 0) AS HUGEINT) * (SELECT sb FROM tot)
                    - CAST(coalesce(b.cnt, 0) AS HUGEINT) * (SELECT sa FROM tot)) AS num
           FROM ta a FULL JOIN tbl b ON a.tok = b.tok),
         tv AS (SELECT round(CAST(sum(num) AS DOUBLE)
                  / (2.0 * (SELECT sa FROM tot) * (SELECT sb FROM tot)), 6) AS d FROM j)
         SELECT CAST(row_number() OVER (ORDER BY num DESC, tok) AS BIGINT) AS drift_rank,
                tok, cnt_a, cnt_b, (SELECT d FROM tv) AS tv_distance
         FROM j ORDER BY num DESC, tok LIMIT 10"""

  private val incrementalSemDedupSql =
    """SELECT vec_id AS id_a, vec_id + 10000000 AS id_b,
                CAST(1.0 AS DOUBLE) AS cos
         FROM embeddings WHERE vec_id % 20 = 0
         ORDER BY id_a, id_b"""

  val all: Map[String, String] = Map(

    "q01_agg_pricing" ->
      """SELECT l_returnflag, l_linestatus,
         sum(l_quantity) AS sum_qty,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
         avg(l_quantity) AS avg_qty,
         count(*) AS count_order
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01'
         GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",

    "q02_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1995-03-01'
           AND l_discount >= 0.05 AND l_quantity < 5
         ORDER BY l_orderkey, l_linenumber""",

    "q03_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
         FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 25""",

    "q04_join_agg" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY c_mktsegment ORDER BY c_mktsegment""",

    "q05_star_join" ->
      """SELECT n_name,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
         count(*) AS n_lines
         FROM lineitem
         JOIN orders   ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation   ON c_nationkey = n_nationkey
         JOIN region   ON n_regionkey = r_regionkey
         GROUP BY n_name ORDER BY n_name""",

    "q06_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE EXISTS (SELECT 1 FROM orders
                       WHERE o_custkey = c_custkey AND o_totalprice > 100000)
         ORDER BY c_custkey""",

    "q07_anti_join" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders
                           WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
         ORDER BY c_custkey""",

    "q08_outer_join" ->
      """SELECT c_custkey, count(o_orderkey) AS n_orders,
         coalesce(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 0.0) AS spend
         FROM customer LEFT JOIN orders ON c_custkey = o_custkey
         GROUP BY c_custkey ORDER BY c_custkey""",

    "q09_distinct" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
         ORDER BY l_returnflag, l_linestatus""",

    "q10_set_ops" ->
      """WITH cn AS (SELECT c_nationkey AS nk FROM customer),
              sn AS (SELECT s_nationkey AS nk FROM supplier),
              onlyc AS (SELECT nk, 'customers_only' AS tag FROM (SELECT nk FROM cn EXCEPT SELECT nk FROM sn)),
              inboth AS (SELECT nk, 'both' AS tag FROM (SELECT nk FROM cn INTERSECT SELECT nk FROM sn))
         SELECT nk, tag FROM onlyc UNION ALL SELECT nk, tag FROM inboth
         ORDER BY tag, nk""",

    "q11_window_rank" ->
      """SELECT o_custkey, rk, o_orderkey, o_totalprice FROM (
           SELECT o_custkey, o_orderkey, o_totalprice,
                  row_number() OVER (PARTITION BY o_custkey
                                     ORDER BY o_totalprice DESC, o_orderkey) AS rk
           FROM orders) t
         WHERE rk <= 3 ORDER BY o_custkey, rk""",

    "q12_window_running" ->
      """SELECT o_custkey, order_seq, o_orderkey, running_spend FROM (
           SELECT o_custkey, o_orderkey,
                  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                       OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend,
                  row_number() OVER (PARTITION BY o_custkey
                                     ORDER BY o_orderdate, o_orderkey) AS order_seq
           FROM orders) t
         ORDER BY o_custkey, order_seq""",

    "q13_mapback_delta" ->
      """SELECT user_id, event_id, epoch_us(ts) AS ts_us, value,
                value - lag(value) OVER (PARTITION BY user_id
                                         ORDER BY epoch_us(ts), event_id) AS delta
         FROM events
         ORDER BY user_id, epoch_us(ts), event_id""",

    "q14_hourly_buckets" -> hourlyBucketsSql,

    "q15_span_shift" ->
      """SELECT strftime(o_orderdate + INTERVAL 3 MONTH, '%Y-%m') AS due_month,
                count(*) AS n_orders,
                CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS month_total
         FROM orders GROUP BY 1 ORDER BY due_month""",

    "q16_cond_agg" ->
      """SELECT l_returnflag,
                sum(CASE WHEN l_discount > 0.05 THEN l_quantity ELSE 0.0 END) AS qty_discounted,
                CAST(sum(CASE WHEN l_tax > 0.04 THEN 1 ELSE 0 END) AS BIGINT) AS n_taxed,
                count(*) AS n
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "q17_rollup" ->
      """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty, count(*) AS n
         FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
         ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""",

    "q18_string_funcs" ->
      """SELECT p_partkey, upper(p_brand) AS brand_u, substr(p_name, 1, 12) AS name12,
                length(p_name) AS name_len, concat_ws('|', p_brand, p_type) AS brand_type
         FROM part WHERE p_name LIKE '%re%' ORDER BY p_partkey""",

    "q19_json_extract" ->
      """SELECT event_type, count(*) AS n,
                CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
                min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
                max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
         FROM events GROUP BY event_type ORDER BY event_type""",

    "q20_in_subquery" ->
      """SELECT o_orderstatus, count(*) AS n,
                CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
         FROM orders
         WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
         GROUP BY o_orderstatus ORDER BY o_orderstatus""",

    "q21_update_delete" ->
      """SELECT l_returnflag,
                CAST(sum(CAST(new_disc AS DECIMAL(18,2))) AS DOUBLE) AS sum_disc,
                count(*) AS n
         FROM (SELECT l_returnflag,
                      CASE WHEN l_shipdate < TIMESTAMP '1993-01-01' THEN 0.0 ELSE l_discount END AS new_disc
               FROM lineitem WHERE l_quantity >= 2) t
         GROUP BY l_returnflag ORDER BY l_returnflag""",

    "q22_asof_join" ->
      """WITH ev AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us, value, event_type FROM events),
              clicks AS (SELECT user_id, event_id, ts_us, value FROM ev WHERE event_type = 'click'),
              purchases AS (SELECT user_id, ts_us AS pts, value AS purchase_value FROM ev WHERE event_type = 'purchase')
         SELECT c.user_id, c.event_id, c.ts_us, p.purchase_value, p.pts AS purchase_ts_us
         FROM clicks c ASOF LEFT JOIN purchases p
           ON c.user_id = p.user_id AND p.pts <= c.ts_us
         ORDER BY c.user_id, c.ts_us, c.event_id""",

    "q47_below_avg" ->
      """SELECT count(*) AS n,
                CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
         FROM lineitem l
         JOIN (SELECT l_partkey AS pk, avg(l_quantity) AS avg_qty
               FROM lineitem GROUP BY l_partkey) p
           ON l.l_partkey = p.pk
         WHERE l.l_quantity < p.avg_qty * 0.5""",

    "q48_topn_join" ->
      """SELECT c_custkey, c_name, rk, o_orderkey, o_totalprice FROM (
           SELECT o_custkey, o_orderkey, o_totalprice,
                  row_number() OVER (PARTITION BY o_custkey
                                     ORDER BY o_totalprice DESC, o_orderkey) AS rk
           FROM orders) t
         JOIN customer ON t.o_custkey = c_custkey
         WHERE rk <= 2 ORDER BY c_custkey, rk""",

    "q49_range_frame" ->
      """SELECT user_id, event_id, epoch_us(ts) AS ts_us,
                count(*) OVER w AS trailing_n,
                CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS trailing_sum
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                      RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
         ORDER BY user_id, ts_us, event_id""",

    "q50_binary_meta" ->
      """SELECT doc_id, octet_length(encode(text)) AS byte_len,
                md5(text) AS content_md5, substr(text, 1, 1) AS first_char
         FROM documents ORDER BY doc_id""",

    "q45_asof_native" ->
      """WITH ev AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us, value, event_type FROM events),
              clicks AS (SELECT user_id, event_id, ts_us FROM ev WHERE event_type = 'click'),
              purchases AS (SELECT user_id, ts_us AS pts, value AS purchase_value FROM ev WHERE event_type = 'purchase')
         SELECT c.user_id, c.event_id, c.ts_us, p.purchase_value, p.pts AS purchase_ts_us
         FROM clicks c ASOF LEFT JOIN purchases p
           ON c.user_id = p.user_id AND p.pts <= c.ts_us
         ORDER BY c.user_id, c.ts_us, c.event_id""",

    // mirrors Dedup.minhashPairs end-to-end from first principles: exact
    // all-pairs Jaccard over the SAME normalization (lowercase, collapse
    // whitespace, trim), token split, distinct 3-token shingles, and the
    // <3-token whole-text fallback. Sound because LSH + exact-verify is
    // exhaustive on this fixture: the corpus pair-Jaccard distribution is
    // bimodal (J < 0.1 organic noise vs J ≥ 0.9 planted near-dups, gap
    // empty — measured), the 0.2 verify threshold sits in the gap, and a
    // 32-hash/8-band LSH misses a J ≥ 0.9 pair with p = (1-J⁴)⁸ < 2e-9.
    // Spark verifies on shingle-HASH sets; 64-bit collisions aside (none
    // at this scale), set sizes equal shingle-string set sizes, and both
    // engines compute the same int/int division → bit-identical doubles.
    "q29_minhash_dedup" ->
      """WITH toks AS (
           SELECT doc_id,
                  string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS t
           FROM documents),
         shing AS (
           SELECT doc_id,
                  CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
                       ELSE list_distinct(list_transform(range(1, len(t) - 1),
                              i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
                  END AS s
           FROM toks),
         ex AS (SELECT doc_id, unnest(s) AS sh FROM shing),
         sizes AS (SELECT doc_id, count(*) AS c FROM ex GROUP BY 1),
         inter AS (SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS i
                   FROM ex a JOIN ex b ON a.sh = b.sh AND a.doc_id < b.doc_id
                   GROUP BY 1, 2)
         SELECT ia AS id_a, ib AS id_b,
                i::DOUBLE / (sa.c + sb.c - i)::DOUBLE AS jaccard
         FROM inter
         JOIN sizes sa ON sa.doc_id = ia
         JOIN sizes sb ON sb.doc_id = ib
         WHERE i::DOUBLE / (sa.c + sb.c - i)::DOUBLE >= 0.2
         ORDER BY id_a, id_b""",

    // q55's planted-margin construction makes the rows-only sketch
    // query fully oracle-able: every 20th embedding re-enters under a
    // shifted id (cosine exactly 1.0 after round-6), while the organic
    // isotropic bulk stays below ~0.5 cosine — far under τ=0.9 — so the
    // TRUE answer is precisely the planted pair list, and LSH recall on
    // identical vectors is 1.0 by construction (identical sketches in
    // every table). Verified exact at sf0.01 before promotion.
    "q55_cosine_neardup" ->
      """SELECT vec_id AS id_a, vec_id + 10000000 AS id_b, CAST(1.0 AS DOUBLE) AS cos
         FROM embeddings WHERE vec_id % 20 = 0
         ORDER BY id_a, id_b""",

    // q93/q94: the lossy-sketch closed form (FIXTURES.md §3). The corpus
    // (doc_id < 200) is cleaned of near-dup members by EXACT 3-gram
    // Jaccard >= 0.3 — recomputed here from shingle strings, the
    // q29-proven pairing with Spark's shingle-hash sets — after which no
    // organic pair collides (simhash floor 2 > tau 1; no identical
    // fingerprint sets), so the true answer is each surviving doc
    // against its planted exact replica.
    "q93_simhash_dedup" ->
      """WITH toks AS (
           SELECT doc_id,
                  string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS t
           FROM documents WHERE doc_id < 200),
         shing AS (
           SELECT doc_id,
                  CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
                       ELSE list_distinct(list_transform(range(1, len(t) - 1),
                              i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
                  END AS s
           FROM toks),
         ex AS (SELECT doc_id, unnest(s) AS sh FROM shing),
         sizes AS (SELECT doc_id, count(*) AS c FROM ex GROUP BY 1),
         inter AS (SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS i
                   FROM ex a JOIN ex b ON a.sh = b.sh AND a.doc_id < b.doc_id
                   GROUP BY 1, 2),
         ndp AS (SELECT ia, ib FROM inter
                 JOIN sizes sa ON sa.doc_id = ia
                 JOIN sizes sb ON sb.doc_id = ib
                 WHERE i::DOUBLE / (sa.c + sb.c - i)::DOUBLE >= 0.3),
         nd AS (SELECT ia AS doc_id FROM ndp UNION SELECT ib FROM ndp)
         SELECT doc_id AS id_a, doc_id + 10000000 AS id_b,
                CAST(0 AS BIGINT) AS hamming
         FROM documents
         WHERE doc_id < 200 AND doc_id NOT IN (SELECT doc_id FROM nd)
         ORDER BY id_a""",

    "q94_fingerprint_dedup" ->
      """WITH toks AS (
           SELECT doc_id,
                  string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS t
           FROM documents WHERE doc_id < 200),
         shing AS (
           SELECT doc_id,
                  CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
                       ELSE list_distinct(list_transform(range(1, len(t) - 1),
                              i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
                  END AS s
           FROM toks),
         ex AS (SELECT doc_id, unnest(s) AS sh FROM shing),
         sizes AS (SELECT doc_id, count(*) AS c FROM ex GROUP BY 1),
         inter AS (SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS i
                   FROM ex a JOIN ex b ON a.sh = b.sh AND a.doc_id < b.doc_id
                   GROUP BY 1, 2),
         ndp AS (SELECT ia, ib FROM inter
                 JOIN sizes sa ON sa.doc_id = ia
                 JOIN sizes sb ON sb.doc_id = ib
                 WHERE i::DOUBLE / (sa.c + sb.c - i)::DOUBLE >= 0.3),
         nd AS (SELECT ia AS doc_id FROM ndp UNION SELECT ib FROM ndp)
         SELECT doc_id AS id_a, doc_id + 10000000 AS id_b
         FROM documents
         WHERE doc_id < 200 AND doc_id NOT IN (SELECT doc_id FROM nd)
         ORDER BY id_a""",

    // q35: blob metadata recomputed from UTF-8 byte lengths; the
    // xxhash64-valued feature column is pinned by the query itself
    // (second-pass determinism check) and surfaces here as f0_eq = 1.
    "q35_multimodal" ->
      """SELECT doc_id, 'application/octet-stream' AS mime,
                CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
                CAST(GREATEST(octet_length(encode(text)) // 64, 1) AS BIGINT) AS n_frames,
                CAST(1 AS BIGINT) AS f0_eq
         FROM documents ORDER BY doc_id""",

    // q95: the width-promoted folio must aggregate as if both batches
    // had been double all along; floor-then-cast mirrors Spark's
    // truncating double→int cast for the narrow batch.
    "q95_width_promotion" ->
      """SELECT CAST(l_orderkey % 7 AS BIGINT) AS bucket,
                CAST(sum(CASE WHEN l_orderkey % 2 = 0
                              THEN CAST(CAST(floor(l_quantity) AS INTEGER) AS DECIMAL(18,2))
                              ELSE CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS sum_qty,
                count(*) AS n
         FROM lineitem GROUP BY 1 ORDER BY bucket""",

    // q96: the workspace round-trip must be invisible — same join+agg
    // straight off the base tables.
    "q96_workspace" ->
      """SELECT c_mktsegment, count(*) AS n,
                CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY c_mktsegment ORDER BY c_mktsegment""",

    // q97: salting must be semantically invisible — plain join + group-by.
    "q97_salted" ->
      """SELECT o_orderpriority,
                CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
                count(*) AS n
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         GROUP BY o_orderpriority ORDER BY o_orderpriority""",

    // q98: final transformWithState state row per key == arg_max over
    // the replayed events (ns epochs; no (user_id, ts) ties in the
    // fixture, so the latest tick is unique).
    "q98_lasttick_tws" ->
      """SELECT user_id,
                max(epoch_us(ts)) AS ts_us,
                arg_max(value, epoch_us(ts)) AS value,
                CAST(count(*) AS BIGINT) AS n_events
         FROM events GROUP BY user_id ORDER BY user_id""",

    // q99: streaming as-of enrichment == batch ASOF LEFT JOIN. The
    // MATERIALIZED CTEs are the q76 optimization barrier (DuckDB pushes
    // outer predicates into an ASOF join and errors on the extra
    // inequality). µs resolution both sides; no (user_id, µs) ties in
    // the fixture, so truncation cannot flip an as-of decision.
    "q99_stream_asof" ->
      """WITH t AS MATERIALIZED (
           SELECT user_id, epoch_us(ts) AS ts_us, value AS trade_value
           FROM events WHERE event_type = 'click'),
         q AS MATERIALIZED (
           SELECT user_id, epoch_us(ts) AS q_ts, value AS quote_value
           FROM events WHERE event_type = 'purchase')
         SELECT t.user_id, t.ts_us, t.trade_value,
                q.q_ts AS quote_ts_us, q.quote_value
         FROM t ASOF LEFT JOIN q
           ON t.user_id = q.user_id AND t.ts_us >= q.q_ts
         ORDER BY t.user_id, t.ts_us""",

    // q100: Kerf `bars(15i, ts)` == epoch-µs grid arithmetic; integer
    // cents for the order-insensitive sum.
    "q100_kerf_bars" ->
      """SELECT epoch_us(ts) - epoch_us(ts) % 900000000 AS bucket_us,
                count(value) AS n,
                CAST(sum(floor(value * 100 + 0.5)) AS BIGINT) AS total_cents
         FROM events WHERE event_type = 'click'
         GROUP BY 1 ORDER BY bucket_us""",

    // q101: ordered first/last aggregates == arg_min/arg_max (no
    // (user_id, µs) ties in the fixture, so both are deterministic).
    "q101_kerf_lastby" ->
      """SELECT user_id, count(value) AS n,
                arg_min(value, epoch_us(ts)) AS open,
                arg_max(value, epoch_us(ts)) AS close,
                min(value) AS low, max(value) AS high
         FROM events GROUP BY user_id ORDER BY user_id""",

    // q102: the dialect math verbs — q39's IEEE-exact subset through
    // the text path. ceil/floor return BIGINT in both engines' casts;
    // l_tax*100 is exactly representable (2-decimal doubles).
    "q102_kerf_math" ->
      """SELECT l_orderkey, l_linenumber,
                sqrt(l_quantity) AS sq,
                abs(l_discount - 0.05) AS ad,
                CAST(floor(l_extendedprice) AS BIGINT) AS fe,
                CAST(ceil(l_tax * 100) AS BIGINT) AS ct
         FROM lineitem WHERE l_orderkey < 100
         ORDER BY l_orderkey, l_linenumber""",

    // q103: the >>/<< round-trip is invisible — same agg off the base
    // table; integer cents for the order-insensitive sum.
    "q103_kerf_fileverbs" ->
      """SELECT o_orderstatus, count(*) AS n,
                CAST(sum(floor(o_totalprice * 100 + 0.5)) AS BIGINT) AS total_cents
         FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",

    // q58: the sketch input keeps only single-source normalized texts,
    // so organic sources share zero sketch slots BY CONSTRUCTION (at
    // any sf) and a whole-source replica agrees on all 64 — the entire
    // similarity matrix is two constants. Sources = those retaining at
    // least one unique doc (all of them, both fixtures).
    "q58_group_sketch" ->
      """WITH n AS (SELECT source,
                           trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t
                    FROM documents),
              uq AS (SELECT t FROM n GROUP BY t HAVING count(DISTINCT source) = 1),
              s AS (SELECT DISTINCT n.source FROM n JOIN uq USING (t)),
              u AS (SELECT source FROM s UNION ALL SELECT 'dup:' || source FROM s)
         SELECT a.source AS src_a, b.source AS src_b,
                CASE WHEN b.source = 'dup:' || a.source OR a.source = 'dup:' || b.source
                     THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END AS est_jaccard
         FROM u a JOIN u b ON a.source < b.source
         ORDER BY src_a, src_b""",

    // q54 = connected components over the q29 pair graph (which the q29
    // oracle proves exhaustive on this fixture) → per-cluster sizes.
    // DuckDB side: full transitive closure by recursive CTE — fine on a
    // 25-edge graph; the Spark side is the O(log n) large/small-star
    // contraction, so this is a genuinely independent algorithm.
    "q54_dedup_clusters" ->
      """WITH RECURSIVE toks AS (
           SELECT doc_id,
                  string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS t
           FROM documents),
         shing AS (
           SELECT doc_id,
                  CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
                       ELSE list_distinct(list_transform(range(1, len(t) - 1),
                              i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
                  END AS s
           FROM toks),
         ex AS (SELECT doc_id, unnest(s) AS sh FROM shing),
         sizes AS (SELECT doc_id, count(*) AS c FROM ex GROUP BY 1),
         inter AS (SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS i
                   FROM ex a JOIN ex b ON a.sh = b.sh AND a.doc_id < b.doc_id
                   GROUP BY 1, 2),
         pairs AS (
           SELECT ia, ib FROM inter
           JOIN sizes sa ON sa.doc_id = ia
           JOIN sizes sb ON sb.doc_id = ib
           WHERE i::DOUBLE / (sa.c + sb.c - i)::DOUBLE >= 0.2),
         edges AS (SELECT ia AS u, ib AS v FROM pairs
                   UNION SELECT ib, ia FROM pairs),
         reach AS (
           SELECT u, v FROM edges
           UNION
           SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
         labels AS (
           SELECT u AS id, least(u, min(v)) AS cluster FROM reach GROUP BY u)
         SELECT cluster, count(*) AS n_members
         FROM labels GROUP BY cluster ORDER BY cluster""",

    "q52_kerf_text" ->
      """SELECT l_returnflag, sum(l_quantity) AS sum_qty, count(*) AS n
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1995-02-01'
           AND l_shipdate < TIMESTAMP '1995-08-01'
         GROUP BY l_returnflag ORDER BY l_returnflag""",

    "q53_kerf_adverb" ->
      """SELECT CAST(sum(x * x) AS BIGINT) AS value FROM range(101) t(x)""",

    "q31_lang_id" ->
      // mirrors TextOps.languageId exactly: one longest-first alternation
      // extract (markers are literal text — no regex metachars, and both
      // Java regex and RE2 alternations are leftmost-first), per-language
      // in-row hit counts, argmax with largest-language tie-break
      """WITH hits AS (
           SELECT doc_id,
                  regexp_extract_all(' ' || lower(text) || ' ', ' der | des | est | les | los | que | and | die | the | und | el | de | le | of |ción|ing|sch|ch|ou|th|不|了|在|是|的') AS hs
           FROM documents),
         scores AS (
           SELECT doc_id,
                  len(list_filter(hs, h -> h IN (' der ', ' und ', ' die ', 'sch', 'ch'))) AS s_de,
                  len(list_filter(hs, h -> h IN (' the ', ' and ', ' of ', 'th', 'ing'))) AS s_en,
                  len(list_filter(hs, h -> h IN (' el ', ' los ', ' de ', ' que ', 'ción'))) AS s_es,
                  len(list_filter(hs, h -> h IN (' le ', ' les ', ' des ', ' est ', 'ou'))) AS s_fr,
                  len(list_filter(hs, h -> h IN ('的', '是', '了', '在', '不'))) AS s_zh
           FROM hits),
         best AS (
           SELECT doc_id,
                  greatest(s_de, s_en, s_es, s_fr, s_zh) AS score,
                  CASE greatest(s_de, s_en, s_es, s_fr, s_zh)
                    WHEN s_zh THEN 'zh' WHEN s_fr THEN 'fr' WHEN s_es THEN 'es'
                    WHEN s_en THEN 'en' WHEN s_de THEN 'de' END AS pred_lang
           FROM scores)
         SELECT pred_lang, count(*) AS n,
                CAST(sum(score) AS BIGINT) AS total_score
         FROM best GROUP BY pred_lang ORDER BY pred_lang""",

    "q34_ngram_jaccard" ->
      // mirrors Dedup.tokens/shinglesFromTokens(n=2) + exact Jaccard on
      // the bounded sample — same normalize/split/distinct pipeline
      """WITH toks AS (
           SELECT doc_id, string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS t
           FROM documents WHERE doc_id < 40),
         sh AS (
           SELECT doc_id,
                  CASE WHEN len(t) < 2 THEN [array_to_string(t, ' ')]
                       ELSE list_distinct([t[i] || ' ' || t[i+1] for i in range(1, len(t))])
                  END AS s
           FROM toks)
         SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
                      CAST(len(list_distinct(list_concat(a.s, b.s))) AS DOUBLE), 6) AS jaccard
         FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         WHERE round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
                     CAST(len(list_distinct(list_concat(a.s, b.s))) AS DOUBLE), 6) > 0.02
         ORDER BY id_a, id_b""",

    "q57_corpus_clean" ->
      // composition of the proven q31 (language), q27 (token/char counts)
      // and q25 (normalized-md5 dedup) formulas
      """WITH hits AS (
           SELECT doc_id,
                  regexp_extract_all(' ' || lower(text) || ' ', ' der | des | est | les | los | que | and | die | the | und | el | de | le | of |ción|ing|sch|ch|ou|th|不|了|在|是|的') AS hs
           FROM documents),
         scores AS (
           SELECT doc_id,
                  len(list_filter(hs, h -> h IN (' der ', ' und ', ' die ', 'sch', 'ch'))) AS s_de,
                  len(list_filter(hs, h -> h IN (' the ', ' and ', ' of ', 'th', 'ing'))) AS s_en,
                  len(list_filter(hs, h -> h IN (' el ', ' los ', ' de ', ' que ', 'ción'))) AS s_es,
                  len(list_filter(hs, h -> h IN (' le ', ' les ', ' des ', ' est ', 'ou'))) AS s_fr,
                  len(list_filter(hs, h -> h IN ('的', '是', '了', '在', '不'))) AS s_zh
           FROM hits),
         best AS (
           SELECT doc_id,
                  CASE greatest(s_de, s_en, s_es, s_fr, s_zh)
                    WHEN s_zh THEN 'zh' WHEN s_fr THEN 'fr' WHEN s_es THEN 'es'
                    WHEN s_en THEN 'en' WHEN s_de THEN 'de' END AS pred_lang
           FROM scores),
         q AS (
           SELECT doc_id, length(text) AS n_chars,
                  CASE WHEN trim(text) = '' THEN 0
                       ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tokens
           FROM documents),
         keep AS (
           SELECT doc_id FROM (
             SELECT doc_id, row_number() OVER (
               PARTITION BY md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))
               ORDER BY doc_id) AS rk
             FROM documents) WHERE rk = 1)
         SELECT best.pred_lang, count(*) AS n_docs,
                CAST(sum(q.n_tokens) AS BIGINT) AS total_tokens,
                CAST(sum(q.n_chars) AS BIGINT) AS total_chars
         FROM q JOIN best USING (doc_id) JOIN keep USING (doc_id)
         WHERE q.n_tokens >= 20
         GROUP BY best.pred_lang ORDER BY pred_lang""",

    "q59_text_clean" ->
      """SELECT doc_id,
                length(trim(regexp_replace(regexp_replace(regexp_replace(
                  text, '<[^>]*>', ' ', 'g'), 'https?://[^\s]+', ' ', 'g'),
                  '\s+', ' ', 'g'))) AS clean_len,
                md5(trim(regexp_replace(regexp_replace(regexp_replace(
                  text, '<[^>]*>', ' ', 'g'), 'https?://[^\s]+', ' ', 'g'),
                  '\s+', ' ', 'g'))) AS clean_md5
         FROM documents ORDER BY doc_id""",

    "q56_variant_json" ->
      """SELECT event_type, count(*) AS n,
                CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
                count(json_extract(props, '$.nope')) AS n_missing
         FROM events GROUP BY event_type ORDER BY event_type""",

    "q51_asof_fwd_tol" ->
      """WITH ev AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us, value, event_type FROM events),
              clicks AS (SELECT user_id, event_id, ts_us FROM ev WHERE event_type = 'click'),
              purchases AS (SELECT user_id, ts_us AS pts, value AS purchase_value FROM ev WHERE event_type = 'purchase')
         SELECT c.user_id, c.event_id, c.ts_us,
                CASE WHEN p.pts - c.ts_us <= 3600000000 THEN p.purchase_value END AS purchase_value,
                CASE WHEN p.pts - c.ts_us <= 3600000000 THEN p.pts END AS purchase_ts_us
         FROM clicks c ASOF LEFT JOIN purchases p
           ON c.user_id = p.user_id AND p.pts >= c.ts_us
         ORDER BY c.user_id, c.ts_us, c.event_id""",

    "q23_enum_intern" ->
      """SELECT g.event_type, d.code AS event_type_code, g.n FROM
           (SELECT event_type, count(*) AS n FROM events GROUP BY event_type) g
         JOIN (SELECT value, row_number() OVER (ORDER BY value) - 1 AS code
               FROM (SELECT DISTINCT event_type AS value FROM events)) d
           ON g.event_type = d.value
         ORDER BY event_type_code""",

    "q24_affine_range" ->
      """SELECT count(*) AS n, CAST(sum(3 + 2*i) AS BIGINT) AS total,
                CAST(min(3 + 2*i) AS BIGINT) AS lo, CAST(max(3 + 2*i) AS BIGINT) AS hi
         FROM range(100000) t(i)""",

    "q25_dedup_exact" ->
      """SELECT source, count(*) AS n_docs,
                count(DISTINCT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))) AS n_distinct
         FROM documents GROUP BY source ORDER BY source""",

    "q26_token_stats" ->
      """WITH t AS (SELECT lang,
                CASE WHEN trim(text) = '' THEN 0
                     ELSE len(string_split_regex(trim(text), '\s+')) END AS toks,
                len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS subw
              FROM documents)
         SELECT lang, count(*) AS n_docs,
                CAST(sum(toks) AS BIGINT) AS sum_tokens,
                CAST(sum(subw) AS BIGINT) AS sum_subwords,
                avg(toks) AS avg_tokens,
                CAST(max(toks) AS BIGINT) AS max_tokens
         FROM t GROUP BY lang ORDER BY lang""",

    "q27_text_quality" ->
      """SELECT doc_id,
                length(text) AS n_chars,
                CASE WHEN trim(text) = '' THEN 0
                     ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tokens,
                CAST(length(text) AS DOUBLE) / greatest(
                  CASE WHEN trim(text) = '' THEN 0
                       ELSE len(string_split_regex(trim(text), '\s+')) END, 1) AS avg_token_len,
                CAST(len(regexp_extract_all(text, '[.,!?;:]')) AS DOUBLE) / greatest(length(text), 1) AS punct_ratio,
                CAST(len(regexp_extract_all(text, '[A-Z]')) AS DOUBLE) / greatest(length(text), 1) AS upper_ratio,
                CAST(len(list_filter(string_split_regex(lower(text), '\s+'),
                  w -> w IN ('the','a','an','of','to','and','in','is','it','that','for','on','as','with','was','at','by'))) AS DOUBLE)
                  / greatest(CASE WHEN trim(text) = '' THEN 0
                                  ELSE len(string_split_regex(trim(text), '\s+')) END, 1) AS stopword_ratio
         FROM documents ORDER BY doc_id""",

    // q30/q32 (GRADUATED r8): xxhash64 VALUES have no DuckDB twin, so
    // the queries emit closed-form derived facts instead — replica
    // hamming/equality (identical text ⇒ identical sketch ⇒ 0 / equal),
    // a second-pass determinism pin, and the input-size column both
    // engines compute from the text. Empty/whitespace-only text
    // normalizes to "" whose split is [""] — one token, hence THEN 1.
    "q30_simhash" ->
      """SELECT doc_id,
                CASE WHEN trim(text) = '' THEN 1
                     ELSE len(string_split_regex(trim(text), '\s+')) END AS n_toks,
                CAST(0 AS BIGINT) AS ham_replica,
                CAST(1 AS BIGINT) AS det_eq
         FROM documents ORDER BY doc_id""",

    "q32_fingerprint" ->
      """SELECT doc_id,
                length(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS n_chars,
                CAST(1 AS BIGINT) AS fp_eq_replica,
                CAST(1 AS BIGINT) AS det_eq
         FROM documents ORDER BY doc_id""",

    // q33/q46: the ANN tier's planted-replica closed-form answers (see
    // the query docstrings — replicas at cosine exactly 1.0, ties by
    // cand_id, organic bulk provably below; identical-vector cosine
    // rounds to 1.0 exactly, the q55-proven pairing)
    "q33_ann_lsh" ->
      """SELECT q.vec_id AS q_id, CAST(t.j AS BIGINT) AS rk,
                q.vec_id + t.j * 20000000 AS cand_id,
                CAST(1.0 AS DOUBLE) AS sim
         FROM embeddings q CROSS JOIN (VALUES (1), (2), (3)) t(j)
         WHERE q.vec_id < 5 ORDER BY q_id, rk""",

    "q46_ann_ivf" ->
      """SELECT q.vec_id AS q_id, CAST(t.j AS BIGINT) AS rk,
                q.vec_id + t.j * 20000000 AS cand_id,
                CAST(1.0 AS DOUBLE) AS sim
         FROM embeddings q CROSS JOIN (VALUES (1), (2), (3)) t(j)
         WHERE q.vec_id < 5 ORDER BY q_id, rk""",

    // q104: the int8 round-trip preserves replica identity exactly
    // (same codes, same scale), so the closed form is q33/q46's.
    "q104_ann_quantized" ->
      """SELECT q.vec_id AS q_id, CAST(t.j AS BIGINT) AS rk,
                q.vec_id + t.j * 20000000 AS cand_id,
                CAST(1.0 AS DOUBLE) AS sim
         FROM embeddings q CROSS JOIN (VALUES (1), (2), (3)) t(j)
         WHERE q.vec_id < 5 ORDER BY q_id, rk""",

    // q105: the program's loops resolve to closed-form scalars
    // (for: 0+1+2+3+4 = 10; do/while: 1*2*2*2 = 8; threshold 80) and
    // the def's early return is a CASE — DuckDB replays the whole thing
    "q105_kerf_control" ->
      """SELECT o_orderpriority, count(*) AS n
         FROM orders WHERE o_orderkey % 160 >= 80
         GROUP BY o_orderpriority ORDER BY o_orderpriority""",

    // q66's shingle CTEs inverted: the CLEAN corpus (no shared shingle
    // with the planted benchmark) — no bloom here at all, which is the
    // point: the Spark bloom only prefilters, exactness is join-confirmed
    "q106_decontaminate" ->
      """WITH toks AS (
           SELECT doc_id, string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS t
           FROM documents),
         sh AS (
           SELECT doc_id,
                  CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
                       ELSE list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                                           for i in range(1, len(t)-1)])
                  END AS s
           FROM toks),
         bench AS (SELECT DISTINCT unnest(s) AS g FROM sh WHERE doc_id % 97 = 0),
         dirty AS (
           SELECT DISTINCT doc_id FROM (SELECT doc_id, unnest(s) AS g FROM sh) c
           WHERE g IN (SELECT g FROM bench))
         SELECT d.doc_id, d.lang, d.source, d.n_chars, md5(d.text) AS content_md5
         FROM documents d WHERE d.doc_id NOT IN (SELECT doc_id FROM dirty)
         ORDER BY d.doc_id""",

    // same per-stratum md5-prefix Bernoulli keep rule (q64's portability
    // contract); strata absent from the recipe drop via the NULL CASE
    "q107_stratified_sample" ->
      """SELECT lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars
         FROM documents
         WHERE CASE lang
                 WHEN 'en' THEN substring(md5(CAST(doc_id AS VARCHAR) || ':' || lang), 1, 2) < '10'
                 WHEN 'de' THEN substring(md5(CAST(doc_id AS VARCHAR) || ':' || lang), 1, 2) < '40'
                 WHEN 'fr' THEN substring(md5(CAST(doc_id AS VARCHAR) || ':' || lang), 1, 2) < '40'
                 WHEN 'es' THEN substring(md5(CAST(doc_id AS VARCHAR) || ':' || lang), 1, 2) < 'c0'
                 WHEN 'zh' THEN substring(md5(CAST(doc_id AS VARCHAR) || ':' || lang), 1, 2) < 'ff'
               END
         GROUP BY lang ORDER BY lang""",

    // identical md5→long shard/order math (top 15 hex chars < 2^60, so
    // plain % == pmod); order_md5 is position-sensitive via ORDER BY pos
    "q108_shard_shuffle" ->
      """WITH a AS (
           SELECT doc_id,
                  (('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':graft'), 1, 15))::BIGINT) % 8 AS shard,
                  ('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':graft:o'), 1, 15))::BIGINT AS ord
           FROM documents),
         r AS (
           SELECT doc_id, shard,
                  row_number() OVER (PARTITION BY shard ORDER BY ord, CAST(doc_id AS VARCHAR)) AS pos
           FROM a)
         SELECT CAST(shard AS BIGINT) AS shard, count(*) AS n_docs,
                CAST(sum(doc_id) AS BIGINT) AS id_sum,
                md5(string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY pos)) AS order_md5
         FROM r GROUP BY shard ORDER BY shard""",

    // the T=2 recipe re-derived in SQL: keep rate ∝ 1/floor(sqrt(count))
    // normalized to the rarest stratum (correctly-rounded IEEE sqrt —
    // identical in any engine), integer division, 3-hex-char uniform draw
    "q109_temperature_mix" ->
      """WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
         w AS (SELECT lang, GREATEST(CAST(floor(sqrt(n)) AS BIGINT), 1) AS wt FROM c),
         t AS (SELECT lang,
                      (4096 * (SELECT min(wt) FROM w)) // wt AS thresh
               FROM w)
         SELECT d.lang, count(*) AS n_docs, CAST(sum(d.n_chars) AS BIGINT) AS sum_chars
         FROM documents d JOIN t ON d.lang = t.lang
         WHERE ('0x' || substring(md5(CAST(d.doc_id AS VARCHAR) || '#' || d.lang), 1, 3))::BIGINT < t.thresh
         GROUP BY d.lang ORDER BY d.lang""",

    // the sample verb's md5 cut then the shard verb's md5→long math —
    // the same portable formulas as q64/q108, driven from the dialect
    "q110_kerf_sample" ->
      """WITH sm AS (
           SELECT doc_id FROM documents
           WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '29'),
         sh AS (
           SELECT doc_id,
                  (('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':graft'), 1, 15))::BIGINT) % 4 AS shard
           FROM sm)
         SELECT CAST(shard AS BIGINT) AS shard, count(*) AS n_docs,
                CAST(sum(doc_id) AS BIGINT) AS id_sum
         FROM sh GROUP BY shard ORDER BY shard""",

    // identical segmentation (8-token cuts of the whitespace-normalized
    // token stream), census, and ordered reassembly from raw string
    // algebra — no dedup machinery shared with the Spark side
    "q111_repeated_spans" ->
      """WITH toks AS (
           SELECT doc_id, string_split(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ') AS t
           FROM documents),
         segi AS (
           SELECT doc_id, t, unnest(range(0, CAST(ceil(len(t) / 8.0) AS BIGINT))) AS i
           FROM toks WHERE len(t) > 0 AND NOT (len(t) = 1 AND t[1] = '')),
         segs AS (
           SELECT doc_id, CAST(i AS INT) AS seg_idx,
                  array_to_string(t[(8*i+1):(8*i+8)], ' ') AS seg
           FROM segi),
         freq AS (
           SELECT seg FROM (SELECT DISTINCT doc_id, seg FROM segs) d
           GROUP BY seg HAVING count(*) >= 2),
         clean AS (
           SELECT doc_id, string_agg(seg, ' ' ORDER BY seg_idx) AS text
           FROM segs WHERE seg NOT IN (SELECT seg FROM freq)
           GROUP BY doc_id)
         SELECT doc_id, md5(text) AS content_md5,
                CAST(length(text) AS BIGINT) AS n_chars_clean
         FROM clean ORDER BY doc_id""",

    // the same md5 rank cut: ties broken by the key string itself
    "q112_stratum_cap" ->
      """SELECT doc_id, source FROM (
           SELECT doc_id, source,
                  row_number() OVER (PARTITION BY source
                    ORDER BY md5(CAST(doc_id AS VARCHAR) || '|' || source),
                             CAST(doc_id AS VARCHAR) || '|' || source) AS rk
           FROM documents) t
         WHERE rk <= 40 ORDER BY doc_id""",

    // q113: q54's independent recursive-CTE closure, then quality-aware
    // winner election per cluster (max n_chars, tie min doc_id) — the
    // Spark side is one associative min(struct(-score,id)) partial agg.
    "q113_dedup_keepbest" ->
      """WITH RECURSIVE toks AS (
           SELECT doc_id,
                  string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS t
           FROM documents),
         shing AS (
           SELECT doc_id,
                  CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
                       ELSE list_distinct(list_transform(range(1, len(t) - 1),
                              i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
                  END AS s
           FROM toks),
         ex AS (SELECT doc_id, unnest(s) AS sh FROM shing),
         sizes AS (SELECT doc_id, count(*) AS c FROM ex GROUP BY 1),
         inter AS (SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS i
                   FROM ex a JOIN ex b ON a.sh = b.sh AND a.doc_id < b.doc_id
                   GROUP BY 1, 2),
         pairs AS (
           SELECT ia, ib FROM inter
           JOIN sizes sa ON sa.doc_id = ia
           JOIN sizes sb ON sb.doc_id = ib
           WHERE i::DOUBLE / (sa.c + sb.c - i)::DOUBLE >= 0.2),
         edges AS (SELECT ia AS u, ib AS v FROM pairs
                   UNION SELECT ib, ia FROM pairs),
         reach AS (
           SELECT u, v FROM edges
           UNION
           SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
         labels AS (
           SELECT u AS id, least(u, min(v)) AS cluster FROM reach GROUP BY u),
         lab AS (
           SELECT d.doc_id, coalesce(l.cluster, d.doc_id) AS cluster, d.n_chars
           FROM documents d LEFT JOIN labels l ON l.id = d.doc_id),
         win AS (
           SELECT doc_id, cluster, n_chars,
                  count(*) OVER (PARTITION BY cluster) AS n_members,
                  row_number() OVER (PARTITION BY cluster
                                     ORDER BY n_chars DESC, doc_id) AS rk
           FROM lab)
         SELECT doc_id, cluster, n_members, n_chars
         FROM win WHERE rk = 1 ORDER BY doc_id""",

    // q114: PQ-ADC with exact re-rank — replica codes minimize the ADC
    // lookup table, so each query's planted replica is rank 1 at
    // cosine exactly 1.0 (q104's closed form, k=1).
    "q114_ann_pq" ->
      """SELECT vec_id AS q_id, CAST(1 AS BIGINT) AS rk,
                vec_id + 20000000 AS cand_id, CAST(1.0 AS DOUBLE) AS sim
         FROM embeddings WHERE vec_id < 5 ORDER BY q_id""",

    // q115: IVF-PQ — identical closed form (replica in the first probe
    // list, globally minimal ADC, exact re-rank → rank 1 at cos 1.0).
    "q115_ann_ivfpq" ->
      """SELECT vec_id AS q_id, CAST(1 AS BIGINT) AS rk,
                vec_id + 20000000 AS cand_id, CAST(1.0 AS DOUBLE) AS sim
         FROM embeddings WHERE vec_id < 5 ORDER BY q_id""",

    // q118: the general enumerated grouping form — DuckDB's GROUPING
    // SETS recomputes the identical three-set union
    "q118_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty, count(*) AS n
         FROM lineitem
         GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
         ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""",

    // q119: socket-federated folio — the local-site + remote-site split of
    // customer must be semantically invisible, so the oracle aggregates
    // the undivided table
    "q119_remote_folio" ->
      """SELECT c_mktsegment,
                count(*) AS n,
                CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS bal
         FROM customer
         WHERE c_acctbal > 0
         GROUP BY c_mktsegment
         ORDER BY c_mktsegment""",

    // q120: sketch adjudication — the exact side must match bit-for-bit,
    // the estimate side is asserted as tolerance flags (estimates are not
    // bit-stable across engines; a degraded sketch flips a flag)
    "q120_sketch_agg" ->
      """SELECT l_returnflag,
                count(DISTINCT l_orderkey) AS n_exact,
                true AS hll_ok,
                true AS gk_ok,
                true AS union_ok,
                count(*) AS n_rows
         FROM lineitem
         GROUP BY l_returnflag
         ORDER BY l_returnflag""",

    // q121: remote partial-aggregate pushdown — federation must be
    // invisible, so the oracle aggregates the undivided table; every
    // aggregate is merge-order-exact
    "q121_remote_agg" ->
      """SELECT c_mktsegment,
                count(*) AS n,
                count(c_name) AS n_name,
                CAST(sum(c_custkey) AS BIGINT) AS sum_key,
                min(c_acctbal) AS min_bal,
                max(c_acctbal) AS max_bal,
                min(c_name) AS first_name
         FROM customer
         GROUP BY c_mktsegment
         ORDER BY c_mktsegment""",

    "q28_sim_topk" ->
      """WITH q AS (SELECT vec_id AS q_id, embedding AS q_vec FROM embeddings WHERE vec_id < 5),
              c AS (SELECT vec_id AS cand_id, embedding AS cand_vec FROM embeddings),
              sims AS (
                SELECT q_id, cand_id,
                  round(
                    list_sum(list_transform(range(1, len(q_vec)+1),
                      i -> CAST(q_vec[i] AS DOUBLE) * CAST(cand_vec[i] AS DOUBLE)))
                    / sqrt(list_sum(list_transform(q_vec, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE))))
                    / sqrt(list_sum(list_transform(cand_vec, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)))), 6) AS sim
                FROM c CROSS JOIN q WHERE q_id <> cand_id)
         SELECT q_id, rk, cand_id, sim FROM (
           SELECT q_id, cand_id, sim,
                  row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, cand_id) AS rk
           FROM sims) t
         WHERE rk <= 5 ORDER BY q_id, rk""",

    "q37_upsert" ->
      """WITH incoming AS (
           SELECT o_orderkey, o_custkey, o_orderstatus,
                  CAST(999.99 AS DOUBLE) AS o_totalprice, o_orderdate, o_orderpriority
           FROM orders WHERE o_orderkey % 100 = 0),
         merged AS (
           SELECT * FROM orders
           WHERE o_orderkey NOT IN (SELECT o_orderkey FROM incoming)
           UNION ALL SELECT * FROM incoming)
         SELECT o_orderstatus, count(*) AS n,
                CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
         FROM merged GROUP BY o_orderstatus ORDER BY o_orderstatus""",

    "q38_ohlc" ->
      """SELECT user_id, strftime(ts, '%Y-%m-%d') AS day,
                arg_min(value, epoch_us(ts)) AS open,
                max(value) AS high, min(value) AS low,
                arg_max(value, epoch_us(ts)) AS close,
                count(*) AS volume,
                CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS notional
         FROM events GROUP BY 1, 2 ORDER BY user_id, day""",

    "q39_math_funcs" ->
      """SELECT l_orderkey, l_linenumber,
                sqrt(l_quantity) AS sqrt_qty,
                abs(l_discount - 0.05) AS abs_disc,
                CAST(floor(l_extendedprice) AS BIGINT) AS floor_price,
                CAST(ceil(l_extendedprice) AS BIGINT) AS ceil_price,
                pow(l_quantity, 2) AS qty_sq,
                l_orderkey % 7 AS key_mod
         FROM lineitem WHERE l_orderkey < 100
         ORDER BY l_orderkey, l_linenumber""",

    "q40_cube" ->
      """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty, count(*) AS n
         FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
         ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""",

    "q41_array_agg" ->
      """WITH g AS (SELECT l_orderkey, list_sort(list(l_quantity)) AS qtys
                    FROM lineitem WHERE l_orderkey < 200 GROUP BY l_orderkey)
         SELECT l_orderkey, len(qtys) AS n_items,
                list_sum(qtys) AS qty_total,
                qtys[-1] AS qty_max,
                array_to_string(list_transform(list_reverse_sort(qtys),
                    v -> printf('%d.%02d',
                                CAST(floor(v * 100 + 0.5) AS BIGINT) // 100,
                                CAST(floor(v * 100 + 0.5) AS BIGINT) % 100)),
                    ',') AS qtys_desc
         FROM g ORDER BY l_orderkey""",

    "q42_percentiles" ->
      """SELECT l_returnflag,
                quantile_cont(l_extendedprice, 0.5) AS p50,
                quantile_cont(l_extendedprice, 0.9) AS p90,
                quantile_cont(l_quantity, 0.25) AS q1_qty,
                count(*) AS n
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "q43_sessionize" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us FROM events),
         flagged AS (
           SELECT user_id, ts_us,
                  CASE WHEN lag(ts_us) OVER w IS NULL THEN 1
                       WHEN ts_us - lag(ts_us) OVER w > 1800000000 THEN 1
                       ELSE 0 END AS new_session
           FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us)),
         sessions AS (
           SELECT user_id, ts_us,
                  CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts_us
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
           FROM flagged)
         SELECT user_id, session_id, count(*) AS n_events,
                min(ts_us) AS session_start,
                max(ts_us) - min(ts_us) AS duration_us
         FROM sessions GROUP BY user_id, session_id
         ORDER BY user_id, session_id""",

    "q44_range_join" ->
      """WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us FROM events),
         errs AS (SELECT user_id, event_id AS err_id, ts_us AS err_ts FROM e WHERE event_type = 'error'),
         purchases AS (SELECT user_id, event_id AS p_id, ts_us AS p_ts FROM e WHERE event_type = 'purchase')
         SELECT a.user_id, a.err_id, b.p_id, b.p_ts - a.err_ts AS delta_us
         FROM errs a JOIN purchases b
           ON a.user_id = b.user_id AND abs(b.p_ts - a.err_ts) <= 300000000
         ORDER BY a.user_id, a.err_id, b.p_id""",

    "q36_stream_hourly" -> hourlyBucketsSql,

    // text-path forward as-of with tolerance — same truth as q51 (DuckDB
    // ASOF with the inequality reversed IS forward; tolerance via CASE)
    "q60_kerf_asof" ->
      """WITH ev AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us, value, event_type FROM events),
              clicks AS (SELECT user_id, event_id, ts_us FROM ev WHERE event_type = 'click'),
              purchases AS (SELECT user_id, ts_us AS pts, value AS purchase_value FROM ev WHERE event_type = 'purchase')
         SELECT c.user_id, c.event_id, c.ts_us,
                CASE WHEN p.pts - c.ts_us <= 3600000000 THEN p.purchase_value END AS purchase_value,
                CASE WHEN p.pts - c.ts_us <= 3600000000 THEN p.pts END AS purchase_ts_us
         FROM clicks c ASOF LEFT JOIN purchases p
           ON c.user_id = p.user_id AND p.pts >= c.ts_us
         ORDER BY c.user_id, c.ts_us, c.event_id""",

    // list-verb program: first(w)=0, last=1000, count=101, find hit=100,
    // find miss=count=101, dict 3*4=12, sum(w)=sum(til 100)+1000
    "q61_kerf_verbs" ->
      """SELECT CAST(0 + 1000 + 101 + 100 + 101 + 12 + 1000 +
                (SELECT sum(x) FROM range(100) t(x)) AS BIGINT) AS value""",

    // CSV round-trip fidelity: the Spark side re-reads its CSV export of
    // documents; the oracle reads the parquet original — equality proves
    // the CSV source is lossless (md5 over the free-text column)
    "q62_csv_roundtrip" ->
      """SELECT source, lang, count(*) AS n_docs,
                CAST(sum(n_chars) AS BIGINT) AS sum_chars,
                min(md5(text)) AS min_text_md5
         FROM documents GROUP BY source, lang ORDER BY source, lang""",

    // identical 3-pass redaction chain (email → IP → phone), identical
    // synthetic-PII construction
    "q63_pii_scrub" ->
      """WITH red AS (
           SELECT doc_id,
                  regexp_replace(regexp_replace(regexp_replace(
                    text || ' contact: user' || CAST(doc_id AS VARCHAR) || '@example.com at 192.168.0.1 or +1-555-0199',
                    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
                    '\+\d[\d\- ]{6,}\d', '<PHONE>', 'g') AS r
           FROM documents)
         SELECT doc_id, CAST(length(r) AS BIGINT) AS redacted_len,
                md5(r) AS redacted_md5
         FROM red ORDER BY doc_id""",

    // md5 hex prefix is engine-portable: same sampled row set
    "q64_hash_sample" ->
      """SELECT source, count(*) AS n_docs,
                CAST(sum(n_chars) AS BIGINT) AS sum_chars
         FROM documents
         WHERE substring(md5(CAST(doc_id AS VARCHAR) || ':' || source), 1, 2) < '29'
         GROUP BY source ORDER BY source""",

    // concat-and-chunk: same whitespace token count (q26 formula), same
    // exclusive-prefix window, same integer chunk division
    "q65_pack_chunks" ->
      """WITH t AS (
           SELECT source, doc_id,
                  CASE WHEN trim(text) = '' THEN 0
                       ELSE len(string_split_regex(trim(text), '\s+')) END AS toks
           FROM documents),
         offs AS (
           SELECT source, toks,
                  coalesce(sum(toks) OVER (PARTITION BY source ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start
           FROM t)
         SELECT source, CAST(start // 2048 AS BIGINT) AS chunk_id,
                count(*) AS n_docs, CAST(sum(toks) AS BIGINT) AS chunk_tokens
         FROM offs GROUP BY source, chunk_id ORDER BY source, chunk_id""",

    // same normalize/split/3-gram-shingle pipeline as the Spark op (q34's
    // list-comprehension idiom extended to trigrams), same semi-join
    "q66_contamination" ->
      """WITH toks AS (
           SELECT doc_id, string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS t
           FROM documents),
         sh AS (
           SELECT doc_id,
                  CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
                       ELSE list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                                           for i in range(1, len(t)-1)])
                  END AS s
           FROM toks),
         bench AS (SELECT DISTINCT unnest(s) AS g FROM sh WHERE doc_id % 97 = 0),
         corp AS (SELECT doc_id, len(s) AS n_shingles, unnest(s) AS g FROM sh)
         SELECT doc_id, CAST(n_shingles AS BIGINT) AS n_shingles,
                count(*) AS n_shared,
                round(CAST(count(*) AS DOUBLE) / n_shingles, 6) AS contamination
         FROM corp WHERE g IN (SELECT g FROM bench)
         GROUP BY doc_id, n_shingles ORDER BY doc_id""",

    // the doubled stream deduped in-flight must equal the single-feed
    // batch truth (event ids are unique in the fixture)
    "q67_stream_dedup" ->
      """SELECT event_type, count(*) AS n
         FROM events GROUP BY event_type ORDER BY event_type""",

    // same normalize/split tokenization (q26/q34 idiom), same count +
    // term tie-break ranking
    "q68_term_topk" ->
      """WITH terms AS (
           SELECT doc_id, unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS term
           FROM documents WHERE doc_id < 30),
         counts AS (
           SELECT doc_id, term, count(*) AS n FROM terms
           WHERE term <> '' GROUP BY doc_id, term),
         ranked AS (
           SELECT doc_id, term, n,
                  row_number() OVER (PARTITION BY doc_id ORDER BY n DESC, term) AS rk
           FROM counts)
         SELECT doc_id, rk, term, n FROM ranked WHERE rk <= 3
         ORDER BY doc_id, rk""",

    // SQL-macro surface: q26's token formula + q59's cleaning chain,
    // composed
    "q69_sql_macros" ->
      """SELECT lang, count(*) AS n_docs,
                CAST(sum(CASE WHEN trim(text) = '' THEN 0
                         ELSE len(string_split_regex(trim(text), '\s+')) END) AS BIGINT) AS sum_tokens,
                min(md5(trim(regexp_replace(regexp_replace(regexp_replace(
                  text, '<[^>]*>', ' ', 'g'), 'https?://[^\s]+', ' ', 'g'),
                  '\s+', ' ', 'g')))) AS min_clean_md5
         FROM documents GROUP BY lang ORDER BY lang""",

    // the decoder's output must equal the closed-form image construction
    // (PNG is lossless): this oracles the REAL javax.imageio decode path
    "q70_image_decode" ->
      """SELECT doc_id, 16.0 AS w, 8.0 AS h,
                CAST((doc_id * 7) % 256 AS DOUBLE) AS r,
                CAST((doc_id * 13) % 256 AS DOUBLE) AS g,
                CAST((doc_id * 31) % 256 AS DOUBLE) AS b
         FROM documents WHERE doc_id < 64 ORDER BY doc_id""",

    // identical in-row list algebra: bigram/trigram lists via the q34
    // range-comprehension idiom, per-distinct-gram counting via
    // list_filter, entropy folded in SORTED-distinct-word order (the same
    // order Spark's array_sort fixes, so the float sum is bit-identical).
    // KNOWN ln() EXPOSURE (q39 keeps ln out of oracle scope; q71/q72 are
    // the two deliberate exceptions): JVM Math.log (1-ulp contract) vs
    // libm log can differ in the last ulp. Acceptable here, unlike the
    // q41 HALF_UP ties: the only EXACTLY-representable entropy/idf values
    // are ln(1)=0 (single-token docs, df=N terms), identical on both
    // engines; every other value is irrational, so it cannot sit ON a
    // 6-dp rounding boundary and a 1-ulp disagreement flips the rounding
    // with probability ~1e-10 per value — tie-proof in the cases ties
    // actually occur, not merely fixture-safe.
    "q71_repetition" ->
      """WITH toks AS (
           SELECT doc_id,
                  string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS w
           FROM documents WHERE doc_id < 200),
         grams AS (
           SELECT doc_id, w,
                  CASE WHEN len(w) < 2 THEN [] ELSE
                    [w[i] || ' ' || w[i+1] for i in range(1, len(w))] END AS bg,
                  CASE WHEN len(w) < 3 THEN [] ELSE
                    [w[i] || ' ' || w[i+1] || ' ' || w[i+2] for i in range(1, len(w)-1)] END AS tg
           FROM toks)
         SELECT doc_id,
                CASE WHEN len(bg) = 0 THEN 0.0 ELSE round(
                  CAST(list_max(list_transform(list_distinct(bg),
                    g -> len(list_filter(bg, x -> x = g)))) AS DOUBLE)
                  / CAST(len(bg) AS DOUBLE), 6) END AS top_bigram_frac,
                CASE WHEN len(tg) = 0 THEN 0.0 ELSE round(
                  1.0 - CAST(len(list_distinct(tg)) AS DOUBLE)
                      / CAST(len(tg) AS DOUBLE), 6) END AS dup_trigram_frac,
                CASE WHEN len(w) = 0 THEN 0.0 ELSE round(
                  -list_sum(list_transform(list_sort(list_distinct(w)),
                    t -> (CAST(len(list_filter(w, x -> x = t)) AS DOUBLE) / CAST(len(w) AS DOUBLE))
                         * ln(CAST(len(list_filter(w, x -> x = t)) AS DOUBLE) / CAST(len(w) AS DOUBLE)))), 6)
                END AS word_entropy
         FROM grams ORDER BY doc_id""",

    // tf over the q68 tokenization, document frequency over the FULL
    // corpus, idf = ln(N/df), score rounded to 6 dp BEFORE ranking
    "q72_tfidf" ->
      """WITH terms AS (
           SELECT doc_id, unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS term
           FROM documents),
         tf AS (
           SELECT doc_id, term, count(*) AS n FROM terms
           WHERE term <> '' GROUP BY doc_id, term),
         dfreq AS (
           SELECT term, count(*) AS df FROM tf GROUP BY term),
         n_docs AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
         scored AS (
           SELECT tf.doc_id, tf.term,
                  round(CAST(tf.n AS DOUBLE) * ln((SELECT n FROM n_docs) / CAST(dfreq.df AS DOUBLE)), 6) AS tfidf
           FROM tf JOIN dfreq USING (term)),
         ranked AS (
           SELECT doc_id, term, tfidf,
                  row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rk
           FROM scored)
         SELECT doc_id, rk, term, tfidf FROM ranked
         WHERE rk <= 3 AND doc_id < 50 ORDER BY doc_id, rk""",

    // same floor(x/scale + 0.5) rounding rule (bit-identical across
    // engines — no HALF_EVEN/HALF_UP divergence), same clamped ±127
    // range, same L2R cosine fold as q28
    "q73_quantize8" ->
      """WITH base AS (
           SELECT vec_id,
                  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings WHERE vec_id < 200),
         scaled AS (
           SELECT vec_id, v,
                  list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale
           FROM base),
         quant AS (
           SELECT vec_id, v, scale,
                  CASE WHEN scale = 0 THEN list_transform(v, x -> 0.0)
                       ELSE list_transform(v, x ->
                         greatest(-127.0, least(127.0, floor(x / scale + 0.5)))) END AS q
           FROM scaled),
         dq AS (
           SELECT vec_id, v, scale,
                  list_transform(q, x -> x * scale) AS d
           FROM quant)
         SELECT vec_id,
                round(scale, 6) AS scale_r,
                round(list_max(list_transform(range(1, len(v)+1),
                  i -> abs(v[i] - d[i]))), 6) AS max_abs_err,
                round(
                  list_sum(list_transform(range(1, len(v)+1), i -> v[i] * d[i]))
                  / sqrt(list_sum(list_transform(v, x -> x*x)))
                  / sqrt(list_sum(list_transform(d, x -> x*x))), 6) AS cos_keep
         FROM dq ORDER BY vec_id""",

    // the rewritten idiom must agree with DuckDB's FIRST-CLASS ASOF JOIN
    // (inner flavor — unmatched clicks absent, like the rn=1-over-inner-
    // join idiom): same answer, entirely different algorithm
    "q74_asof_rewrite" ->
      """WITH ev AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us, value, event_type FROM events),
              clicks AS (SELECT user_id, event_id, ts_us, value FROM ev WHERE event_type = 'click'),
              purchases AS (SELECT user_id, ts_us AS pts, value AS purchase_value FROM ev WHERE event_type = 'purchase')
         SELECT c.user_id, c.event_id, c.ts_us, p.purchase_value, p.pts
         FROM clicks c ASOF JOIN purchases p
           ON c.user_id = p.user_id AND p.pts <= c.ts_us
         ORDER BY c.user_id, c.ts_us, c.event_id""",

    // timestamp-axis as-of with interval tolerance: DuckDB's first-class
    // ASOF picks the latest pts <= ts; the band's lower bound commutes
    // with that top-1 (any other in-band candidate is older), so a
    // post-join staleness filter gives exactly the banded-window answer
    "q76_asof_ts_tol" ->
      """WITH ev AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us, value, event_type FROM events),
              clicks AS (SELECT user_id, event_id, ts_us, value FROM ev WHERE event_type = 'click'),
              purchases AS (SELECT user_id, ts_us AS pts_us, value AS purchase_value FROM ev WHERE event_type = 'purchase'),
              j AS MATERIALIZED (
                SELECT c.user_id, c.event_id, c.ts_us, p.purchase_value, p.pts_us
                FROM clicks c ASOF JOIN purchases p
                  ON c.user_id = p.user_id AND p.pts_us <= c.ts_us)
         SELECT user_id, event_id, ts_us, purchase_value, pts_us
         FROM j WHERE pts_us >= ts_us - 3600000000
         ORDER BY user_id, ts_us, event_id""",

    // the dialect's window table verbs against DuckDB's own window
    // machinery: same frame (UNBOUNDED PRECEDING..CURRENT ROW), integer
    // cents so running sums are exact; lag gets its own frame-less spec
    "q77_kerf_window" ->
      """WITH ev AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us,
                            CAST(round(value * 100) AS BIGINT) AS vc
                     FROM events)
         SELECT user_id, event_id, ts_us,
                CAST(sum(vc) OVER w AS BIGINT) AS cum_vc,
                count(vc) OVER w AS n_seen,
                max(vc) OVER w AS max_vc,
                min(vc) OVER w AS min_vc,
                ts_us - lag(ts_us) OVER w2 AS gap_us,
                lag(vc) OVER w2 AS prev_vc,
                avg(vc) OVER w AS avg_vc
         FROM ev
         WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                w2 AS (PARTITION BY user_id ORDER BY ts_us, event_id)
         ORDER BY user_id, ts_us, event_id""",

    // federation must be invisible: the two-site folio aggregate equals
    // the same aggregate over the undivided table
    "q78_federated" ->
      """SELECT l_returnflag,
                count(*) AS n,
                CAST(sum(l_linenumber) AS BIGINT) AS sum_line,
                max(l_quantity) AS max_qty
         FROM lineitem
         WHERE l_discount >= 0.05
         GROUP BY l_returnflag
         ORDER BY l_returnflag""",

    // the LEFT OUTER rewritten idiom must agree with DuckDB's first-class
    // ASOF LEFT JOIN (unmatched views kept null-padded)
    "q79_asof_outer" ->
      """WITH ev AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us, value, event_type FROM events),
              views AS (SELECT user_id, event_id, ts_us FROM ev WHERE event_type = 'view'),
              purchases AS (SELECT user_id, ts_us AS pts, value AS purchase_value FROM ev WHERE event_type = 'purchase')
         SELECT v.user_id, v.event_id, v.ts_us, p.purchase_value, p.pts
         FROM views v ASOF LEFT JOIN purchases p
           ON v.user_id = p.user_id AND p.pts <= v.ts_us
         ORDER BY v.user_id, v.ts_us, v.event_id""",

    // corpus mixing: DuckDB replays the identical md5-prefix predicates
    // per pseudo-source — the mixture is reproducible across engines
    "q81_mix_corpora" ->
      """WITH tagged AS (
           SELECT *, 'web' AS mix_source, '80' AS ceil_hex FROM documents WHERE doc_id % 3 = 0
           UNION ALL
           SELECT *, 'books', '40' FROM documents WHERE doc_id % 3 = 1
           UNION ALL
           SELECT *, 'code', '20' FROM documents WHERE doc_id % 3 = 2)
         SELECT mix_source, count(*) AS n_docs,
                CAST(sum(n_chars) AS BIGINT) AS sum_chars,
                min(doc_id) AS min_id
         FROM tagged
         WHERE substring(md5(CAST(doc_id AS VARCHAR) || ':' || source), 1, 2) < ceil_hex
         GROUP BY mix_source ORDER BY mix_source""",

    // epsilon comparator in a WHERE: same |a-b| <= 1e-14*max(|a|,|b|)
    // formula (missing-equals-missing never triggers here: inputs are
    // non-null doubles). n_bitwise counts the strict bit-equal subset —
    // IEEE multiply + HALF_UP round are engine-independent, so both
    // counts replay exactly
    "q82_eps_predicate" ->
      """WITH t AS (SELECT l_returnflag,
                          l_discount * 100 AS x,
                          round(l_discount * 100) AS y
                   FROM lineitem)
         SELECT l_returnflag, count(*) AS n,
                CAST(count(CASE WHEN x = y THEN 1 END) AS BIGINT) AS n_bitwise
         FROM t
         WHERE x = y OR abs(x - y) <= 1e-14 * greatest(abs(x), abs(y))
         GROUP BY l_returnflag ORDER BY l_returnflag""",

    // mapright fixes the left operand over til 5; mapleft the right;
    // both folds recomputed from range()
    "q83_kerf_maplr" ->
      """SELECT CAST((SELECT sum(10*3 + x) FROM range(5) t(x)) * 1000 +
                     (SELECT sum(x - 2) FROM range(5) t(x)) AS BIGINT) AS value""",

    // the derived counters are deterministic: all three equal count(*)
    // iff two independent rand(42) instances reproduce the same stream
    // and every draw lands in [0,1)
    "q84_seeded_rng" ->
      """SELECT count(*) AS n, count(*) AS n_agree, count(*) AS n_unit
         FROM orders""",

    // map round-trip must be invisible: ordered string aggregation
    // replays keys/values (stringified — the q41 pandas-compare rule);
    // the keyed lookup is a conditional max
    "q85_map_funcs" ->
      """WITH sc AS (SELECT o_orderpriority, o_orderstatus, count(*) AS n
                     FROM orders GROUP BY 1, 2)
         SELECT o_orderpriority,
                string_agg(o_orderstatus, ',' ORDER BY o_orderstatus) AS statuses,
                string_agg(CAST(n AS VARCHAR), ',' ORDER BY o_orderstatus) AS counts,
                max(CASE WHEN o_orderstatus = 'F' THEN n END) AS n_f
         FROM sc GROUP BY o_orderpriority ORDER BY o_orderpriority""",

    // the dialect's cube + exact percentile vs DuckDB's own: Spark
    // `percentile` == DuckDB `quantile_cont` (both exact interpolated,
    // the q42-proven pairing); null grouping keys sort FIRST to match
    // Spark's asc default
    "q87_kerf_cube" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
                sum(l_quantity) AS sum_qty,
                quantile_cont(l_quantity, 0.5) AS med_qty
         FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
         ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""",

    // pervasive ops recomputed with plain arithmetic: the matrix+scalar
    // broadcast sums the flattened elements + 10 each; the vector chain
    // is 2x+100 over 1..3
    "q88_kerf_pervasive" ->
      """SELECT CAST((SELECT sum(x + 10) FROM (VALUES (1),(2),(3),(4)) t(x)) +
                     (SELECT sum(2*x + 100) FROM range(1, 4) t(x)) AS BIGINT) AS value""",

    // the sorted bucketed folio layout must be invisible: same grouped
    // stats from the undivided table
    "q89_sorted_folio" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, value FROM events)
         SELECT user_id, count(*) AS n,
                min(ts_us) AS first_ts, max(ts_us) AS last_ts,
                CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
         FROM e GROUP BY user_id ORDER BY user_id""",

    // the append-mode stream-stream join replayed to completion equals
    // the plain interval join
    "q90_stream_join" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type FROM events),
              c AS (SELECT user_id, event_id AS click_id, ts_us AS c_us FROM e WHERE event_type = 'click'),
              p AS (SELECT user_id AS p_user, event_id AS p_id, ts_us AS p_us FROM e WHERE event_type = 'purchase')
         SELECT user_id, click_id, p_id, c_us, p_us
         FROM c JOIN p ON user_id = p_user
           AND p_us >= c_us - 600000000 AND p_us <= c_us
         ORDER BY user_id, c_us, click_id, p_id""",

    // the dialect dedup verb == exact content dedup recomputed from
    // scratch: md5 of whitespace-normalized lowercased text, min-id
    // witness, group size (both engines emit lowercase md5 hex)
    "q92_kerf_dedup" ->
      """SELECT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS text_key,
                min(doc_id) AS keep_id, count(*) AS group_size
         FROM documents GROUP BY 1 ORDER BY text_key""",

    // frame export → chunk-feed ingestion → parse must be lossless: the
    // streamed aggregate equals the undivided table's
    "q91_feed_roundtrip" ->
      """SELECT event_type, count(*) AS n,
                CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
         FROM events GROUP BY event_type ORDER BY event_type""",

    // the typed Aggregator's one-pass OHLC vs DuckDB arg_min/arg_max on
    // the µs stamp; open/high/low/close are picked raw doubles (no
    // summation), so full-precision equality holds
    "q86_ohlc_aggregator" ->
      """SELECT user_id,
                arg_min(value, epoch_us(ts)) AS open,
                max(value) AS high, min(value) AS low,
                arg_max(value, epoch_us(ts)) AS close,
                count(*) AS n_ticks
         FROM events GROUP BY user_id ORDER BY user_id""",

    // the dialect's plain equi-join (named-sides on a = b) + group + order
    "q80_kerf_join" ->
      """SELECT c_mktsegment, count(*) AS n, max(o_totalprice) AS max_price
         FROM customer JOIN orders ON c_custkey = o_custkey
         GROUP BY c_mktsegment ORDER BY c_mktsegment""",

    // elementwise group means over 1-based subscripts (range is
    // end-exclusive); pos re-based to Spark's 0-based posexplode. The
    // fixture dim (64) is a fixture constant, as elsewhere.
    "q75_mean_pool" ->
      """SELECT vec_id % 50 AS group_key,
                CAST(count(*) AS BIGINT) AS n_vectors,
                CAST(i.pos - 1 AS BIGINT) AS pos,
                round(avg(CAST(embedding[i.pos] AS DOUBLE)), 6) AS m
         FROM embeddings, (SELECT unnest(range(1, 65)) AS pos) i
         WHERE i.pos <= 8
         GROUP BY 1, 3
         ORDER BY group_key, pos""",

    // SemDeDup victims: the q55-proven planted-replica closed form —
    // organic pairwise cosine ≲ 0.6 (FIXTURES.md §3) so at τ=0.95 the
    // only victims are the planted exact copies (cos rounds to 1.0),
    // witnessed by their originals. Cluster assignment cannot split an
    // identical pair, so the k-means stage is answer-invariant here.
    "q122_semdedup" ->
      """SELECT vec_id + 10000000 AS dropped_id, vec_id AS witness_id,
                CAST(1.0 AS DOUBLE) AS cos
         FROM embeddings WHERE vec_id % 20 = 0
         ORDER BY dropped_id""",

    // folio compaction must be semantically invisible: the compacted
    // read's aggregate equals the undivided table's (file-count collapse
    // is pinned in FolioSpec; this adjudicates losslessness)
    "q124_folio_compact" ->
      """SELECT event_type, count(*) AS n,
                CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total,
                min(epoch_ns(ts)) AS first_ns,
                max(epoch_ns(ts)) AS last_ns
         FROM events GROUP BY event_type ORDER BY event_type""",

    // persisted IVF-PQ probe: q115's closed form through the on-disk
    // index (pruned dirs × stored codes)
    "q135_ann_ivfpq_indexed" ->
      """SELECT vec_id AS q_id, CAST(1 AS BIGINT) AS rk,
                vec_id + 20000000 AS cand_id, CAST(1.0 AS DOUBLE) AS sim
         FROM embeddings WHERE vec_id < 5 ORDER BY q_id""",

    // persisted-codes probe: q114's planted-replica closed form — the
    // stored codes + LUT must reproduce the train-per-call ADC order
    "q134_ann_pq_indexed" ->
      """SELECT vec_id AS q_id, CAST(1 AS BIGINT) AS rk,
                vec_id + 20000000 AS cand_id, CAST(1.0 AS DOUBLE) AS sim
         FROM embeddings WHERE vec_id < 5 ORDER BY q_id""",

    // streamed replicas are retrievable exactly: each query's top hit is
    // its stream-appended copy at cosine 1.0 (q133's closed form; the
    // stream side is pinned separately in StreamingSpec)
    "q156_ann_stream_append" ->
      """SELECT vec_id AS q_id, CAST(1 AS BIGINT) AS rk,
                vec_id + 20000000 AS cand_id, CAST(1.0 AS DOUBLE) AS sim
         FROM embeddings WHERE vec_id < 5 ORDER BY q_id""",

    // persisted-index probe: q46's planted-replica closed form — the
    // round-trip through the stored layout must not change the answer
    "q133_ann_ivf_indexed" ->
      """SELECT q.vec_id AS q_id, CAST(t.j AS BIGINT) AS rk,
                q.vec_id + t.j * 20000000 AS cand_id,
                CAST(1.0 AS DOUBLE) AS sim
         FROM embeddings q CROSS JOIN (VALUES (1), (2), (3)) t(j)
         WHERE q.vec_id < 5 ORDER BY q_id, rk""",

    // corpus drift in exact integer numerators: |cntA*totB - cntB*totA|
    // summed as HUGEINT (order-free), divided once; rank ties on token
    "q140_corpus_drift" -> corpusDriftSql,

    // rolling median over FULL 3-row frames only: the median is the
    // picked middle element (no interpolation, no fp reconciliation)
    "q139_rolling_median" ->
      """WITH e AS (
           SELECT user_id, epoch_us(ts) AS ts_us, value,
                  row_number() OVER w AS rn,
                  median(value) OVER (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS med3
           FROM events WHERE user_id < 10
           WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), value))
         SELECT user_id, ts_us, med3 FROM e WHERE rn >= 3
         ORDER BY user_id, ts_us""",

    // sequential EMA via recursive CTE: the identical
    // prev + 0.25*(x - prev) expression tree per step — dyadic alpha,
    // no libm, bit-identical fold on both engines
    "q138_ema" ->
      """WITH RECURSIVE e AS (
           SELECT user_id, epoch_us(ts) AS ts_us, value,
                  row_number() OVER (PARTITION BY user_id
                    ORDER BY epoch_us(ts), value) AS rn
           FROM events WHERE user_id < 10),
         r AS (
           SELECT user_id, rn, ts_us, CAST(value AS DOUBLE) AS ema FROM e WHERE rn = 1
           UNION ALL
           SELECT e.user_id, e.rn, e.ts_us,
                  r.ema + 0.25 * (CAST(e.value AS DOUBLE) - r.ema)
           FROM e JOIN r ON e.user_id = r.user_id AND e.rn = r.rn + 1)
         SELECT user_id, ts_us, ema
         FROM r ORDER BY user_id, ts_us""",

    // quality-aware SemDeDup: replicas outscore originals (score =
    // vec_id) so the election keeps the copies; component labels are
    // min-id, sizes 2 for planted pairs, 1 for organic singletons
    "q137_semdedup_keepbest" ->
      """SELECT vec_id, vec_id AS cluster, CAST(1 AS BIGINT) AS n_members
         FROM embeddings WHERE vec_id % 20 <> 0
         UNION ALL
         SELECT vec_id + 10000000 AS vec_id, vec_id AS cluster,
                CAST(2 AS BIGINT) AS n_members
         FROM embeddings WHERE vec_id % 20 = 0
         ORDER BY vec_id""",

    // corpus-unigram LM stats: census over the WHOLE corpus, smoothed
    // probabilities summed in SORTED order (the q71 fold discipline),
    // every statistic a log-free rational
    "q136_unigram_lm" ->
      """WITH toks AS (
           SELECT doc_id,
                  unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS tok
           FROM documents),
         census AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY tok),
         g AS (SELECT CAST(sum(cnt) + count(*) AS DOUBLE) AS denom FROM census),
         scored AS (
           SELECT t.doc_id, c.cnt,
                  CAST(c.cnt + 1 AS DOUBLE) / (SELECT denom FROM g) AS p
           FROM toks t JOIN census c USING (tok))
         SELECT doc_id, count(*) AS n_tokens,
                round(list_sum(list_sort(list(p))) / count(*), 6) AS mean_p,
                round(CAST(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS DOUBLE)
                  / count(*), 6) AS hapax_frac,
                round(CAST(sum(CASE WHEN cnt <= 2 THEN 1 ELSE 0 END) AS DOUBLE)
                  / count(*), 6) AS rare_frac
         FROM scored WHERE doc_id < 200
         GROUP BY doc_id ORDER BY doc_id""",

    // identical slicing over DuckDB list algebra: same normalization
    // and whitespace tokenization as the q29/q93-proven pairing; list
    // slices are 1-based inclusive and clamp, matching Spark's slice
    "q132_chunking" ->
      """WITH t AS (
           SELECT doc_id,
                  string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS toks
           FROM documents WHERE doc_id < 200),
         sized AS (
           SELECT doc_id, toks,
                  greatest(1, (len(toks) - 16 + 47) // 48) AS nchunks
           FROM t),
         e AS (SELECT doc_id, toks, unnest(range(0, nchunks)) AS cid FROM sized)
         SELECT doc_id, cid AS chunk_id,
                CAST(len(toks[cid*48 + 1 : cid*48 + 64]) AS BIGINT) AS n_tokens,
                array_to_string(toks[cid*48 + 1 : cid*48 + 64], ' ') AS chunk_text
         FROM e ORDER BY doc_id, chunk_id""",

    // the media composition: dedup keeps min-id per byte-identical
    // group (doc_id 0..15), solid colors are exact under resize, sums
    // of integer-valued doubles are exact in any order
    "q131_media_pipeline" ->
      """SELECT doc_id % 4 AS bucket, count(*) AS n,
                CAST(sum(doc_id * 17) AS DOUBLE) AS sum_r,
                CAST(sum(doc_id * 11) AS DOUBLE) AS sum_g,
                CAST(sum(doc_id * 5) AS DOUBLE) AS sum_b
         FROM documents WHERE doc_id < 16 GROUP BY 1 ORDER BY bucket""",

    // constant-amplitude PCM: every decoded feature is exact in double
    // arithmetic (dyadic sample values, exact mean, exact sqrt), so the
    // oracle is closed-form with NO tolerance
    "q130_audio_decode" ->
      """SELECT doc_id, 8000.0 AS sample_rate, 1.0 AS channels,
                CAST(100 + doc_id % 50 AS DOUBLE) AS n_frames,
                CAST(100 + doc_id % 50 AS DOUBLE) / 8000.0 AS duration_sec,
                CAST(1000 + (doc_id * 37) % 20000 AS DOUBLE) / 32768.0 AS rms
         FROM documents WHERE doc_id < 64 ORDER BY doc_id""",

    // perceptual (average-hash) near-dup: aHash equals the planted mask
    // bit-for-bit, organic masks differ in >>3 bits (margin asserted in
    // LlmOpsSpec), so the true pair list is the planted enumeration at
    // hamming exactly 2
    "q129_perceptual_dedup" ->
      """SELECT doc_id AS id_a, doc_id + 1000 AS id_b, CAST(2 AS INT) AS hamming
         FROM documents WHERE doc_id < 40 AND doc_id % 5 = 0
         ORDER BY id_a, id_b""",

    // content-hash dedup of byte-identical blobs: 64 PNGs from
    // doc_id % 16 → 16 groups of 4, min-id witnesses closed form
    "q128_media_dedup" ->
      """SELECT doc_id AS keep_id, CAST(4 AS BIGINT) AS group_size
         FROM documents WHERE doc_id < 16 ORDER BY keep_id""",

    // decode→resize→re-encode→decode: solid colors survive bilinear
    // scaling bit-exactly, so the resized blobs re-decode to the q70
    // closed form at the new 4×4 dims
    "q127_image_resize" ->
      """SELECT doc_id, 4.0 AS w, 4.0 AS h,
                CAST((doc_id * 7) % 256 AS DOUBLE) AS r,
                CAST((doc_id * 13) % 256 AS DOUBLE) AS g,
                CAST((doc_id * 31) % 256 AS DOUBLE) AS b
         FROM documents WHERE doc_id < 64 ORDER BY doc_id""",

    // real GIF demux: per-doc animated GIFs with planted solid-gray
    // frames (palette is exact for one color) — the sampled-frame rows
    // are a closed-form enumeration
    "q126_frame_sample" ->
      """SELECT d.doc_id, CAST(k AS INT) AS frame_no,
                8 AS width, 8 AS height,
                CAST((d.doc_id * 7 + k * 13) % 200 AS DOUBLE) AS mean_luma
         FROM documents d, range(0, 4) r(k)
         WHERE d.doc_id < 64 AND k < 1 + d.doc_id % 4 AND k % 2 = 0
         ORDER BY doc_id, frame_no""",

    // storage-layer upsert: replace-by-key merge through the versioned
    // folio == a CASE recompute over the undivided table
    "q125_folio_upsert" ->
      """SELECT event_type, count(*) AS n,
                CAST(sum(CAST(CASE WHEN event_id % 50 = 0 THEN 999.99 ELSE value END
                              AS DECIMAL(18,2))) AS DOUBLE) AS total
         FROM events GROUP BY event_type ORDER BY event_type""",

    // streaming session_window vs the batch lag-window island rule: the
    // two boundary conventions differ only when a consecutive gap is
    // EXACTLY 30min (session_window's end is exclusive; the lag rule's
    // `>` keeps it) — measured zero such pairs at every sf (seeded
    // fixture), so closed sessions agree exactly
    "q123_stream_sessions" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us FROM events),
         flagged AS (
           SELECT user_id, ts_us,
                  CASE WHEN lag(ts_us) OVER w IS NULL THEN 1
                       WHEN ts_us - lag(ts_us) OVER w > 1800000000 THEN 1
                       ELSE 0 END AS new_session
           FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us)),
         sessions AS (
           SELECT user_id, ts_us,
                  sum(new_session) OVER (PARTITION BY user_id ORDER BY ts_us
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
           FROM flagged)
         SELECT user_id, min(ts_us) AS session_start,
                count(*) AS n_events,
                max(ts_us) - min(ts_us) AS duration_us
         FROM sessions GROUP BY user_id, sid
         ORDER BY user_id, session_start""",

    // nested-document twin: struct field paths recomputed as JSON path
    // extraction; the absent $.extra.depth branch must agree as NULL →
    // count 0 on both engines
    "q141_nested_atlas" ->
      """WITH t AS (
           SELECT event_type,
                  CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
                  CAST(json_extract_string(props, '$.extra.depth') AS INTEGER) AS deep
           FROM events)
         SELECT event_type, count(*) AS n,
                CAST(sum(k) AS BIGINT) AS sum_k,
                min(k) AS min_k, max(k) AS max_k,
                count(deep) AS n_deep
         FROM t WHERE k >= 5
         GROUP BY event_type ORDER BY event_type""",

    // Kerf-mode ordering twin: the total order (NaN smallest, ==null)
    // emulated with an explicit CASE … NULLS FIRST — neither engine's
    // native NaN sort placement is trusted
    "q142_kerf_order" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice
         FROM (SELECT l_orderkey, l_linenumber, l_extendedprice,
                      CASE WHEN l_orderkey % 7 = 0 THEN CAST('NaN' AS DOUBLE)
                           ELSE l_extendedprice END AS x
               FROM lineitem)
         ORDER BY (CASE WHEN isnan(x) THEN NULL ELSE x END) ASC NULLS FIRST,
                  l_orderkey, l_linenumber
         LIMIT 25""",

    // fp16 tier closed form: pack/unpack is a pure function, so each
    // query's planted replica decodes to identical floats — rank 1 at
    // cosine exactly 1.0 (the q104/q114 pattern)
    "q143_fp16_tier" ->
      """SELECT vec_id AS q_id, CAST(1 AS BIGINT) AS rk,
                vec_id + 20000000 AS cand_id, CAST(1.0 AS DOUBLE) AS sim
         FROM embeddings WHERE vec_id < 5 ORDER BY q_id""",

    // streaming EMA twin: the identical prev + a*(x - prev) double
    // recurrence replayed with a recursive CTE in per-key event order
    "q144_stream_ema" ->
      """WITH RECURSIVE e AS (
           SELECT user_id, epoch_us(ts) AS ts_us, value,
                  CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts) AS BIGINT) AS rn
           FROM events WHERE event_type = 'view'),
         r AS (
           SELECT user_id, ts_us, value, rn, value AS ema FROM e WHERE rn = 1
           UNION ALL
           SELECT e.user_id, e.ts_us, e.value, e.rn,
                  r.ema + 0.25 * (e.value - r.ema)
           FROM e JOIN r ON e.user_id = r.user_id AND e.rn = r.rn + 1)
         SELECT user_id, ts_us, value, ema
         FROM r ORDER BY user_id, ts_us""",

    // fp16 x IVF composed tiers: symmetric quantization preserves
    // replica identity — same closed form as the other indexed probes
    "q145_ann_ivf_fp16" ->
      """SELECT vec_id AS q_id, CAST(1 AS BIGINT) AS rk,
                vec_id + 20000000 AS cand_id, CAST(1.0 AS DOUBLE) AS sim
         FROM embeddings WHERE vec_id < 5 ORDER BY q_id""",

    // hashed linear classifier twin: same md5-prefix buckets, same
    // synthetic integer weight grid, exact BIGINT sum, one division
    "q146_quality_classifier" ->
      """WITH toks AS (
           SELECT doc_id,
                  unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS tok
           FROM documents),
         b AS (
           SELECT doc_id,
                  CAST(concat('0x', substring(md5(tok), 1, 6)) AS BIGINT) % 1024 AS bucket
           FROM toks)
         SELECT doc_id, count(*) AS n_tokens,
                CAST(sum((bucket * 2654435761) % 1997) AS DOUBLE)
                  / (1997.0 * count(*)) - 0.5 AS score
         FROM b GROUP BY doc_id ORDER BY doc_id""",

    "q147_select_distinct" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
         ORDER BY l_returnflag, l_linestatus""",

    // fuzzy-join twin: identical normalization, prefix blocks, skew
    // guard, length band, and Levenshtein — recomputed from scratch
    "q148_fuzzy_join" ->
      """WITH corpus AS (
           SELECT doc_id, substring(text, 1, 40) AS title FROM documents
           UNION ALL
           SELECT doc_id + 1000000,
                  concat(substring(substring(text, 1, 40), 1, 10), 'X',
                         substring(substring(text, 1, 40), 12, 29))
           FROM documents WHERE doc_id < 20),
         k AS (
           SELECT doc_id, trim(regexp_replace(lower(title), '\s+', ' ', 'g')) AS t
           FROM corpus),
         kb AS (SELECT doc_id, t, substring(t, 1, 8) AS blk FROM k),
         keep AS (SELECT blk FROM kb GROUP BY blk HAVING count(*) <= 256)
         SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                CAST(levenshtein(a.t, b.t) AS INTEGER) AS dist
         FROM kb a JOIN keep ka ON a.blk = ka.blk
              JOIN kb b ON a.blk = b.blk
         WHERE a.doc_id < b.doc_id
           AND abs(length(a.t) - length(b.t)) <= 3
           AND levenshtein(a.t, b.t) <= 3
         ORDER BY id_a, id_b""",

    // video near-dup closed form: byte-identical planted copies share
    // their original's frame-hash set exactly (Jaccard 1.0); the organic
    // pattern family is pairwise-distinct below the threshold
    "q149_video_dedup" ->
      """SELECT doc_id AS id_a, doc_id + 1000000 AS id_b,
                CAST(1.0 AS DOUBLE) AS jaccard
         FROM documents WHERE doc_id < 16 ORDER BY id_a""",

    // audio near-dup closed form: the 3 volume-rescaled copies of each
    // of the 8 waveform patterns pair up exactly (volume-invariant
    // envelope hash -> identical hash sets -> jaccard 1.0); patterns
    // share no window hash, so no cross-pattern pair survives
    "q159_audio_neardup" ->
      """SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                CAST(1.0 AS DOUBLE) AS jaccard
         FROM documents a JOIN documents b
           ON b.doc_id > a.doc_id AND a.doc_id % 8 = b.doc_id % 8
         WHERE a.doc_id < 24 AND b.doc_id < 24
         ORDER BY id_a, id_b""",

    "q151_kerf_countd" ->
      """SELECT o_orderstatus, count(DISTINCT o_custkey) AS nc, count(*) AS n
         FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",

    // the six-statement dialect pipeline replayed stage by stage: md5
    // min-id dedup witnesses -> survivors -> hashed linear classifier
    // (exact integer sums, one rim division) -> threshold -> md5-prefix
    // Bernoulli sample
    "q153_dialect_pipeline" ->
      """WITH keep AS (
           SELECT min(doc_id) AS doc_id FROM documents
           GROUP BY md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))),
         surv AS (SELECT d.doc_id, d.text FROM documents d JOIN keep USING (doc_id)),
         toks AS (
           SELECT doc_id,
                  unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS tok
           FROM surv),
         b AS (
           SELECT doc_id,
                  CAST(concat('0x', substring(md5(tok), 1, 6)) AS BIGINT) % 1024 AS bucket
           FROM toks),
         sc AS (
           SELECT doc_id, count(*) AS n_tokens,
                  CAST(sum((bucket * 2654435761) % 1997) AS DOUBLE)
                    / (1997.0 * count(*)) - 0.5 AS score
           FROM b GROUP BY doc_id),
         flt AS (SELECT * FROM sc WHERE score > -0.01)
         SELECT doc_id, n_tokens, score FROM flt
         WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cc'
         ORDER BY doc_id""",

    "q152_kerf_ranks" ->
      """SELECT o_custkey, o_orderkey,
                CAST(row_number() OVER w AS BIGINT) AS rk,
                CAST(ntile(4) OVER w AS BIGINT) AS nt
         FROM orders
         WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
         ORDER BY o_custkey, o_orderdate, o_orderkey""",

    // pivot with an explicit value domain replays as conditional
    // aggregation; integer-valued quantity sums are order-free exact
    "q165_kerf_pivot" ->
      """SELECT l_returnflag,
                sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END) AS "O",
                sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END) AS "F"
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    // unpivot: the melt inverse — UNION ALL keeps null cells as null
    // qty rows, the exact round trip of the pivot
    "q166_kerf_unpivot" ->
      """WITH w AS (
           SELECT l_returnflag,
                  sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END) AS o_q,
                  sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END) AS f_q
           FROM lineitem GROUP BY l_returnflag)
         SELECT l_returnflag, 'F' AS status, f_q AS qty FROM w
         UNION ALL
         SELECT l_returnflag, 'O' AS status, o_q AS qty FROM w
         ORDER BY l_returnflag, status""",

    // uj: schema-aligning union — null-fill + width promotion, then
    // exact statistics across both sides (sum of integer-valued
    // doubles is order-free exact below 2^53)
    "q164_kerf_uj" ->
      """WITH a AS (
           SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS key_c,
                  l_quantity, CAST(NULL AS DOUBLE) AS l_extendedprice
           FROM lineitem WHERE l_linenumber <= 3),
         b AS (
           SELECT l_orderkey, l_suppkey AS key_c,
                  CAST(NULL AS DOUBLE) AS l_quantity, l_extendedprice
           FROM lineitem WHERE l_linenumber > 3),
         u AS (SELECT * FROM a UNION ALL SELECT * FROM b)
         SELECT count(*) AS n, sum(l_quantity) AS sq,
                max(l_extendedprice) AS mp, max(key_c) AS mk,
                count(DISTINCT l_orderkey) AS no
         FROM u""",

    // wj: per-trade band aggregates over the in-window quotes — the
    // same equi-band left join + group; max/min/count are exact picks
    "q163_kerf_wj" ->
      """WITH t AS (
           SELECT user_id, event_id AS t_id, epoch_us(ts) * 1000 AS t_ts,
                  value AS price
           FROM events WHERE event_type = 'purchase'),
         q AS (
           SELECT user_id, epoch_us(ts) * 1000 AS q_ts, value AS quote
           FROM events WHERE event_type = 'view')
         SELECT t.user_id, t.t_id, t.t_ts, t.price,
                max(q.quote) AS top_q, min(q.quote) AS low_q,
                count(q.quote) AS n_q
         FROM t LEFT JOIN q ON t.user_id = q.user_id
           AND q.q_ts >= t.t_ts - 600000000000
           AND q.q_ts <= t.t_ts + 600000000000
         GROUP BY t.user_id, t.t_id, t.t_ts, t.price
         ORDER BY t.user_id, t.t_id""",

    // fby: rows achieving the groupwise max, via the same window
    "q162_kerf_fby" ->
      """WITH pur AS (
           SELECT user_id, event_id, value FROM events
           WHERE event_type = 'purchase'),
         w AS (
           SELECT user_id, event_id, value,
                  max(value) OVER (PARTITION BY user_id) AS mx
           FROM pur)
         SELECT user_id, event_id, value FROM w WHERE value = mx
         ORDER BY user_id, event_id""",

    // table-ordered EMA from the dialect: the identical recurrence as
    // the q138/q144 twins, sequenced by the same (ts, event_id) axis
    "q161_kerf_emas" ->
      """WITH RECURSIVE e AS (
           SELECT user_id, epoch_us(ts) * 1000 AS ts_ns, value,
                  CAST(row_number() OVER (PARTITION BY user_id
                    ORDER BY ts, event_id) AS BIGINT) AS rn
           FROM events WHERE user_id < 10),
         r AS (
           SELECT user_id, ts_ns, value, rn, value AS ema FROM e WHERE rn = 1
           UNION ALL
           SELECT e.user_id, e.ts_ns, e.value, e.rn,
                  r.ema + 0.25 * (e.value - r.ema)
           FROM e JOIN r ON e.user_id = r.user_id AND e.rn = r.rn + 1)
         SELECT user_id, ts_ns, value, ema
         FROM r ORDER BY user_id, ts_ns""",

    // the tick capstone replayed stage by stage: DuckDB's native ASOF
    // LEFT JOIN is the same latest-at-or-before merge; the moment
    // formulas replay q158's exact-decimal tree (VARCHAR-path casts)
    "q160_tick_pipeline" ->
      """WITH trades AS (
           SELECT user_id, epoch_us(ts) * 1000 AS t_ts, value AS price
           FROM events WHERE event_type = 'purchase'),
         quotes AS (
           SELECT user_id, epoch_us(ts) * 1000 AS q_ts, value AS quote
           FROM events WHERE event_type = 'view'),
         enr AS (
           SELECT t.user_id, t.t_ts, t.price, q.quote
           FROM trades t ASOF LEFT JOIN quotes q
             ON t.user_id = q.user_id AND t.t_ts >= q.q_ts),
         liq AS (SELECT * FROM enr WHERE quote >= 0),
         dec AS (
           SELECT user_id, t_ts, price, quote,
                  CAST(price AS DECIMAL(19,6)) AS dp,
                  CAST(quote AS DECIMAL(19,6)) AS dq
           FROM liq),
         summ AS (
           SELECT user_id,
                  CAST(count(*) AS DOUBLE) AS n,
                  CAST(CAST(sum(dp) AS VARCHAR) AS DOUBLE) AS sp,
                  CAST(CAST(sum(dq) AS VARCHAR) AS DOUBLE) AS sq,
                  CAST(CAST(sum(dq * dp) AS VARCHAR) AS DOUBLE) AS sqp,
                  CAST(CAST(sum(dp * dp) AS VARCHAR) AS DOUBLE) AS spp,
                  CAST(CAST(sum(dq * dq) AS VARCHAR) AS DOUBLE) AS sqq
           FROM dec GROUP BY user_id),
         mom AS (
           SELECT user_id,
                  sqp / sq AS vwap,
                  ((sqp / n) - (sp / n) * (sq / n))
                    / (sqrt(greatest((spp / n) - (sp / n) * (sp / n), 0.0))
                       * sqrt(greatest((sqq / n) - (sq / n) * (sq / n), 0.0))) AS pq
           FROM summ)
         SELECT l.user_id, l.t_ts, l.price, l.quote,
                sum(l.price) OVER w3 AS ms3,
                avg(l.price) OVER w3 AS ma3,
                CAST(CAST(sum(CAST(l.quote AS DECIMAL(19,6)) * CAST(l.price AS DECIMAL(19,6)))
                          OVER wr AS VARCHAR) AS DOUBLE)
                  / CAST(CAST(sum(CAST(l.quote AS DECIMAL(19,6)))
                          OVER wr AS VARCHAR) AS DOUBLE) AS cvwap,
                m.vwap, m.pq
         FROM liq l JOIN mom m USING (user_id)
         WINDOW w3 AS (PARTITION BY l.user_id ORDER BY l.t_ts
                       ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),
                wr AS (PARTITION BY l.user_id ORDER BY l.t_ts
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         ORDER BY l.user_id, l.t_ts""",

    // statistical aggregates replay the IDENTICAL expression tree:
    // exact DECIMAL(38,6) sums (order-free), double rim arithmetic in
    // the same association — bit-exact across engines by construction
    "q158_kerf_stats" ->
      """WITH q AS (
           SELECT l_returnflag,
                  -- width 19 forces INT128 physical so the in-decimal
                  -- products cannot overflow; the VALUES equal Spark's
                  -- DECIMAL(18,6) quantization exactly
                  CAST(l_quantity AS DECIMAL(19,6)) AS dq,
                  CAST(l_extendedprice AS DECIMAL(19,6)) AS dp,
                  CAST(l_discount AS DECIMAL(19,6)) AS dd
           FROM lineitem),
         g AS (
           -- decimal -> double through VARCHAR: DuckDB's direct decimal
           -- cast double-rounds (int128 -> double, then /10^scale); the
           -- string path is correctly rounded, matching the JVM
           SELECT l_returnflag,
                  CAST(count(*) AS DOUBLE) AS n,
                  CAST(CAST(sum(dq) AS VARCHAR) AS DOUBLE) AS sq,
                  CAST(CAST(sum(dp) AS VARCHAR) AS DOUBLE) AS sp,
                  CAST(CAST(sum(dd) AS VARCHAR) AS DOUBLE) AS sd_,
                  CAST(CAST(sum(dq * dp) AS VARCHAR) AS DOUBLE) AS sqp,
                  CAST(CAST(sum(dq * dq) AS VARCHAR) AS DOUBLE) AS sqq,
                  CAST(CAST(sum(dp * dp) AS VARCHAR) AS DOUBLE) AS spp,
                  CAST(CAST(sum(dd * dd) AS VARCHAR) AS DOUBLE) AS sdd
           FROM q GROUP BY l_returnflag)
         SELECT l_returnflag,
                sqp / sq AS vwap,
                greatest((sdd / n) - (sd_ / n) * (sd_ / n), 0.0) AS vr,
                sqrt(greatest((sdd / n) - (sd_ / n) * (sd_ / n), 0.0)) AS sd,
                (sqp / n) - (sq / n) * (sp / n) AS cv,
                ((sqp / n) - (sq / n) * (sp / n))
                  / (sqrt(greatest((sqq / n) - (sq / n) * (sq / n), 0.0))
                     * sqrt(greatest((spp / n) - (sp / n) * (sp / n), 0.0))) AS cr
         FROM g ORDER BY l_returnflag""",

    // streaming forward-fill replay == the batch IGNORE NULLS window:
    // carried values are copies, so equality is bit-exact
    "q157_stream_fills" ->
      """SELECT user_id, epoch_us(ts) AS ts_us,
                CASE WHEN event_type = 'purchase' THEN value END AS value,
                last_value(CASE WHEN event_type = 'purchase' THEN value END
                           IGNORE NULLS) OVER (
                  PARTITION BY user_id ORDER BY ts
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
         FROM events WHERE user_id < 20
         ORDER BY user_id, ts_us""",

    // forward-fill: purchase prices left-joined onto every tick (the
    // null plant), then carried with last_value IGNORE NULLS over the
    // same running frame — rows before a user's first purchase stay null
    "q154_kerf_fills" ->
      """WITH pur AS (
           SELECT event_id AS pe, value AS pv FROM events
           WHERE event_type = 'purchase'),
         j AS (
           SELECT e.user_id, epoch_us(e.ts) * 1000 AS ts_ns, e.event_id, p.pv
           FROM events e LEFT JOIN pur p ON e.event_id = p.pe)
         SELECT user_id, ts_ns,
                last_value(pv IGNORE NULLS) OVER (w
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS lastp,
                first_value(pv IGNORE NULLS) OVER (w
                  ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nextp
         FROM j
         WINDOW w AS (PARTITION BY user_id ORDER BY ts_ns, event_id)
         ORDER BY user_id, ts_ns, event_id""",

    // rolling 3-tick sum/mean + 5-tick min/max + 4-tick volatility per
    // user: bounded ROWS frames over one (user, time) window; ≤3-term
    // double sums associate identically left-to-right in both engines,
    // min/max are exact picks, and the volatility pair replays the
    // exact decimal-sum tree (VARCHAR-path casts: DuckDB's direct
    // decimal->double cast double-rounds)
    "q155_kerf_moving" ->
      """WITH b AS (
           SELECT user_id, epoch_us(ts) * 1000 AS ts_ns, event_id, value,
                  CAST(value AS DECIMAL(19,6)) AS dv
           FROM events),
         v AS (
           SELECT user_id, ts_ns, event_id, value,
                  CAST(count(value) OVER (w ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS DOUBLE) AS c4,
                  CAST(CAST(sum(dv) OVER (w ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS VARCHAR) AS DOUBLE) AS sx4,
                  CAST(CAST(sum(dv * dv) OVER (w ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS VARCHAR) AS DOUBLE) AS sxx4,
                  sum(value) OVER (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS ms3,
                  avg(value) OVER (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS ma3,
                  min(value) OVER (w ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS mn5,
                  max(value) OVER (w ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS mx5,
                  lag(value, 1) OVER w AS pv
           FROM b
           WINDOW w AS (PARTITION BY user_id ORDER BY ts_ns, event_id))
         SELECT user_id, ts_ns, ms3, ma3, mn5, mx5,
                greatest((sxx4 / c4) - (sx4 / c4) * (sx4 / c4), 0.0) AS mv4,
                sqrt(greatest((sxx4 / c4) - (sx4 / c4) * (sx4 / c4), 0.0)) AS md4,
                CASE WHEN pv = 0 OR pv IS NULL THEN NULL ELSE value / pv END AS rt
         FROM v ORDER BY user_id, ts_ns, event_id""",

    // the dialect-driven workflow computes q140's exact answer
    "q150_dialect_drift" -> corpusDriftSql,

    // pairwise deletion replayed as the identical masked decimal tree:
    // both inputs null where the partner is, n = the pair count —
    // every sum and the count cover the same row set (q158 cast
    // discipline: DECIMAL(19,6) int128 sums, VARCHAR-path to double)
    "q167_stats_pairwise" ->
      """WITH p AS (
           SELECT l_returnflag,
                  CASE WHEN l_linenumber = 1 THEN NULL ELSE l_quantity END AS x,
                  CASE WHEN l_linenumber = 2 THEN NULL ELSE l_extendedprice END AS y
           FROM lineitem),
         q AS (
           SELECT l_returnflag,
                  CAST(CASE WHEN x IS NOT NULL AND y IS NOT NULL THEN x END
                       AS DECIMAL(19,6)) AS dx,
                  CAST(CASE WHEN x IS NOT NULL AND y IS NOT NULL THEN y END
                       AS DECIMAL(19,6)) AS dy
           FROM p),
         g AS (
           SELECT l_returnflag,
                  CAST(count(dx) AS DOUBLE) AS n,
                  CAST(CAST(sum(dx) AS VARCHAR) AS DOUBLE) AS sx,
                  CAST(CAST(sum(dy) AS VARCHAR) AS DOUBLE) AS sy,
                  CAST(CAST(sum(dx * dy) AS VARCHAR) AS DOUBLE) AS sxy,
                  CAST(CAST(sum(dx * dx) AS VARCHAR) AS DOUBLE) AS sxx,
                  CAST(CAST(sum(dy * dy) AS VARCHAR) AS DOUBLE) AS syy
           FROM q GROUP BY l_returnflag)
         SELECT l_returnflag,
                ((sxy / n) - (sx / n) * (sy / n))
                  / (sqrt(greatest((sxx / n) - (sx / n) * (sx / n), 0.0))
                     * sqrt(greatest((syy / n) - (sy / n) * (sy / n), 0.0))) AS cr,
                (sxy / n) - (sx / n) * (sy / n) AS cv,
                sxy / sx AS wa
         FROM g ORDER BY l_returnflag""",

    // collect = list with a TOTAL order: (axis, value) for the
    // axis-ordered form, value-sorted for the bare form; stringified
    // (array_to_string — the q41 pandas-compare convention)
    "q168_kerf_collect" ->
      """WITH p AS (
           SELECT user_id, epoch_us(ts) * 1000 AS ts_ns, value
           FROM events WHERE event_type = 'purchase')
         SELECT user_id,
                array_to_string(list(printf('%.4f', value)
                                     ORDER BY ts_ns, value), ',') AS series,
                array_to_string(list(ts_ns ORDER BY ts_ns), ',') AS ticks,
                count(*) AS n
         FROM p GROUP BY user_id ORDER BY user_id""",

    // DuckDB zips multiple unnests in one SELECT — the same lockstep
    // contract as ungroup; the round trip reproduces the input rows
    "q169_kerf_ungroup" ->
      """WITH p AS (
           SELECT user_id, epoch_us(ts) * 1000 AS ts_ns, value
           FROM events WHERE event_type = 'purchase'),
         g AS (
           SELECT user_id,
                  list(ts_ns ORDER BY ts_ns) AS t,
                  list(value ORDER BY ts_ns, value) AS v
           FROM p GROUP BY user_id)
         SELECT user_id, unnest(t) AS ts_ns, unnest(v) AS value FROM g
         ORDER BY user_id, ts_ns, value""",

    // aggregate navigation must return the full recompute's answer
    // (exact decimal sums; avg = exact sum / exact count in doubles)
    "q185_rollup_navigation" ->
      """SELECT l_returnflag AS k,
                count(*) AS n_rows,
                CAST(CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS VARCHAR)
                     AS DOUBLE) AS sv,
                min(l_quantity) AS mn,
                max(l_quantity) AS mx,
                CAST(CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS VARCHAR)
                     AS DOUBLE) / count(l_quantity) AS av
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    // the dialect string family: 0-based substr/find, regex ssr with
    // the 'g' flag (Spark's regexp_replace replaces every match),
    // literal split, wildcard like
    "q186_kerf_strings" ->
      """SELECT p_partkey,
                substring(p_name, 6) AS tail5,
                substring(p_name, 1, 4) AS head4,
                replace(p_type, 'ECONOMY', 'econ') AS ty,
                regexp_replace(p_name, '[aeiou]', '*', 'g') AS starred,
                CAST(CASE WHEN strpos(p_name, 'widget') = 0
                          THEN length(p_name)
                          ELSE strpos(p_name, 'widget') - 1 END AS BIGINT) AS w_at,
                regexp_matches(p_name, 'gadget|gizmo') AS is_g,
                trim(lpad(p_brand, 12, ' ')) AS br,
                CAST(len(string_split(p_name, ' ')) AS BIGINT) AS n_words,
                rpad(p_brand, 10, '.') AS brp
         FROM part
         WHERE p_name LIKE '%e%' AND p_name NOT LIKE 'small%'
         ORDER BY p_partkey""",

    // stamp attribute indexing: every date part replayed from DuckDB's
    // extract family; sub-second parts from the epoch remainder
    "q190_kerf_stamp_attrs" ->
      """SELECT event_id,
                CAST(year(ts) AS BIGINT) AS y,
                CAST(month(ts) AS BIGINT) AS mo,
                CAST(day(ts) AS BIGINT) AS d,
                CAST(hour(ts) AS BIGINT) AS h,
                CAST(minute(ts) AS BIGINT) AS mi,
                CAST(date_part('second', ts) AS BIGINT) AS sec,
                (epoch_us(ts) % 1000000) // 1000 AS msec,
                epoch_us(ts) % 1000000 AS usec,
                CAST(ts AS DATE) AS dte,
                CAST(isodow(ts) AS BIGINT) AS dow,
                CAST(dayofyear(ts) AS BIGINT) AS doy,
                CAST(weekofyear(ts) AS BIGINT) AS wk
         FROM events WHERE event_type = 'click'
         ORDER BY event_id LIMIT 400""",

    // scatter-gather rexec: per-site partials re-aggregated == the
    // undivided recompute (exact integer arithmetic end to end)
    "q191_rexec_scatter" ->
      """SELECT l_returnflag,
                count(*) AS n,
                CAST(sum(CAST(trunc(l_quantity) AS BIGINT)) AS BIGINT) AS sq
         FROM lineitem
         GROUP BY l_returnflag ORDER BY l_returnflag""",

    // Kerf IPC: the remote evaluation must equal the undivided-table
    // recompute (exact integer sum after the trunc-toward-zero cast)
    "q189_kerf_rexec" ->
      """SELECT l_returnflag,
                count(*) AS n,
                CAST(sum(CAST(trunc(l_quantity) AS BIGINT)) AS BIGINT) AS sq
         FROM lineitem WHERE l_linestatus = 'F'
         GROUP BY l_returnflag ORDER BY l_returnflag""",

    // cast family: trunc-toward-zero long, TRY_CAST null on malformed,
    // stamp/nanos epoch arithmetic (ts is µs; ns = µs × 1000)
    "q188_kerf_casts" ->
      """SELECT event_id,
                CAST(trunc(value) AS BIGINT) AS lv,
                CAST(event_id AS DOUBLE) AS dv,
                CAST(event_id AS VARCHAR) AS sv,
                TRY_CAST(CAST(event_id AS VARCHAR) AS BIGINT) AS rt,
                TRY_CAST('not a number' AS BIGINT) AS bad,
                ts AS t_us,
                epoch_us(ts) * 1000 AS ns_us,
                epoch_us(ts) * 1000 AS ts_long
         FROM events WHERE event_type = 'purchase'
         ORDER BY event_id LIMIT 500""",

    // table management: meta of (lineitem minus 3 dropped columns) —
    // the fixture-contract schema as a closed-form VALUES frame
    "q187_kerf_meta" ->
      """SELECT * FROM (VALUES
           ('l_orderkey',      'bigint', TRUE),
           ('l_partkey',       'bigint', TRUE),
           ('l_suppkey',       'bigint', TRUE),
           ('l_quantity',      'double', TRUE),
           ('l_extendedprice', 'double', TRUE),
           ('l_discount',      'double', TRUE),
           ('l_returnflag',    'string', TRUE),
           ('l_linestatus',    'string', TRUE)
         ) AS t(col, "type", nullable) ORDER BY col""",

    // the dialect rollup face: the maintained picks == full recompute
    "q184_dialect_rollup" ->
      """SELECT l_returnflag AS k,
                count(*) AS n_rows,
                count(l_quantity) AS v_cnt,
                min(l_quantity) AS v_min,
                max(l_quantity) AS v_max
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    // coverage sampling: exact sign-test octants + q112's md5-rank cut
    "q183_diversity_sample" ->
      """WITH s AS (
           SELECT vec_id,
                  (CASE WHEN embedding[1] >= 0 THEN '1' ELSE '0' END ||
                   CASE WHEN embedding[2] >= 0 THEN '1' ELSE '0' END ||
                   CASE WHEN embedding[3] >= 0 THEN '1' ELSE '0' END) AS octant
           FROM embeddings)
         SELECT vec_id, octant FROM (
           SELECT vec_id, octant,
                  row_number() OVER (PARTITION BY octant
                    ORDER BY md5(CAST(vec_id AS VARCHAR)),
                             CAST(vec_id AS VARCHAR)) AS rk
           FROM s) t
         WHERE rk <= 25 ORDER BY octant, vec_id""",

    // packing on the tokenizer's counts: q172's merge-chain counts
    // feed the per-stream running-offset chunk layout
    "q182_bpe_packing" ->
      """WITH w AS (
           SELECT doc_id,
                  unnest(string_split(trim(regexp_replace(
                    replace(lower(text), '|', ' '), '\s+', ' ', 'g')), ' ')) AS w
           FROM documents),
         r0 AS (
           SELECT doc_id,
                  '||' || regexp_replace(w, '(.)', '\1||', 'g') || '</w>||' AS rep
           FROM w WHERE length(w) > 0),
         r1 AS (SELECT doc_id, replace(rep, '|t||h|', '|th|') AS rep FROM r0),
         r2 AS (SELECT doc_id, replace(rep, '|th||e|', '|the|') AS rep FROM r1),
         r3 AS (SELECT doc_id, replace(rep, '|the||</w>|', '|the</w>|') AS rep FROM r2),
         r4 AS (SELECT doc_id, replace(rep, '|v||a|', '|va|') AS rep FROM r3),
         r5 AS (SELECT doc_id, replace(rep, '|va||l|', '|val|') AS rep FROM r4),
         r6 AS (SELECT doc_id, replace(rep, '|a||</w>|', '|a</w>|') AS rep FROM r5),
         counts AS (
           SELECT doc_id,
                  CAST(sum((length(rep) - length(replace(rep, '|', ''))) // 2 - 1)
                       AS BIGINT) AS n_tokens
           FROM r6 GROUP BY doc_id),
         c AS (SELECT doc_id, doc_id % 4 AS stream, n_tokens FROM counts),
         p AS (
           SELECT doc_id, stream, n_tokens,
                  CAST(coalesce(sum(n_tokens) OVER (PARTITION BY stream
                         ORDER BY doc_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                       AS BIGINT) AS start_tok
           FROM c)
         SELECT doc_id, stream, n_tokens, start_tok,
                start_tok // 512 AS chunk_id
         FROM p ORDER BY doc_id""",

    // encode replayed end-to-end: positions via range-zip structs, the
    // same replace chain on documents AND on the vocab census, ids =
    // rank by (cnt desc, token), sequences ordered (wpos, tpos)
    "q181_bpe_encode" ->
      """WITH doc AS (
           SELECT doc_id,
                  string_split(trim(regexp_replace(
                    replace(lower(text), '|', ' '), '\s+', ' ', 'g')), ' ') AS ws
           FROM documents),
         w AS (
           SELECT doc_id, unnest(list_transform(range(1, len(ws) + 1),
                    i -> struct_pack(wpos := i, w := ws[i]))) AS p
           FROM doc),
         w2 AS (SELECT doc_id, p.wpos AS wpos, p.w AS w FROM w
                WHERE length(p.w) > 0),
         r0 AS (SELECT doc_id, wpos,
                       '||' || regexp_replace(w, '(.)', '\1||', 'g') || '</w>||' AS rep
                FROM w2),
         r1 AS (SELECT doc_id, wpos, replace(rep, '|t||h|', '|th|') AS rep FROM r0),
         r2 AS (SELECT doc_id, wpos, replace(rep, '|th||e|', '|the|') AS rep FROM r1),
         r3 AS (SELECT doc_id, wpos, replace(rep, '|the||</w>|', '|the</w>|') AS rep FROM r2),
         r4 AS (SELECT doc_id, wpos, replace(rep, '|v||a|', '|va|') AS rep FROM r3),
         r5 AS (SELECT doc_id, wpos, replace(rep, '|va||l|', '|val|') AS rep FROM r4),
         r6 AS (SELECT doc_id, wpos, replace(rep, '|a||</w>|', '|a</w>|') AS rep FROM r5),
         tk0 AS (SELECT doc_id, wpos, string_split(trim(rep, '|'), '||') AS tl FROM r6),
         tk AS (SELECT doc_id, wpos, unnest(list_transform(range(1, len(tl) + 1),
                  i -> struct_pack(tpos := i, tok := tl[i]))) AS p
                FROM tk0),
         tk2 AS (SELECT doc_id, wpos, p.tpos AS tpos, p.tok AS token FROM tk),
         wf AS (SELECT w, count(*) AS freq FROM w2 GROUP BY w),
         vr0 AS (SELECT freq,
                        '||' || regexp_replace(w, '(.)', '\1||', 'g') || '</w>||' AS rep
                 FROM wf),
         vr1 AS (SELECT freq, replace(rep, '|t||h|', '|th|') AS rep FROM vr0),
         vr2 AS (SELECT freq, replace(rep, '|th||e|', '|the|') AS rep FROM vr1),
         vr3 AS (SELECT freq, replace(rep, '|the||</w>|', '|the</w>|') AS rep FROM vr2),
         vr4 AS (SELECT freq, replace(rep, '|v||a|', '|va|') AS rep FROM vr3),
         vr5 AS (SELECT freq, replace(rep, '|va||l|', '|val|') AS rep FROM vr4),
         vr6 AS (SELECT freq, replace(rep, '|a||</w>|', '|a</w>|') AS rep FROM vr5),
         vt AS (SELECT freq, unnest(string_split(trim(rep, '|'), '||')) AS token
                FROM vr6),
         voc AS (SELECT token, sum(freq) AS cnt FROM vt GROUP BY token),
         vid AS (SELECT token,
                        CAST(row_number() OVER (ORDER BY cnt DESC, token) - 1
                             AS BIGINT) AS id
                 FROM voc)
         SELECT t.doc_id,
                array_to_string(list(coalesce(v.id, -1)
                                     ORDER BY t.wpos, t.tpos), ',') AS ids,
                count(*) AS n_tokens
         FROM tk2 t LEFT JOIN vid v ON t.token = v.token
         GROUP BY t.doc_id ORDER BY t.doc_id""",

    // the maintained rollup must equal the FULL recompute bit-for-bit:
    // exact decimal sums (VARCHAR-path to double), count/min/max picks
    "q180_folio_rollup" ->
      """SELECT l_returnflag,
                count(*) AS n_rows,
                count(l_quantity) AS q_cnt,
                CAST(CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS VARCHAR)
                     AS DOUBLE) AS q_sum,
                min(l_quantity) AS q_min,
                max(l_quantity) AS q_max,
                count(l_extendedprice) AS p_cnt,
                CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(38,6))) AS VARCHAR)
                     AS DOUBLE) AS p_sum,
                min(l_extendedprice) AS p_min,
                max(l_extendedprice) AS p_max
         FROM lineitem WHERE l_linenumber <= 7
         GROUP BY l_returnflag ORDER BY l_returnflag""",

    // wj proper = wj1's band pairs UNION the prevailing-on-entry row
    // (latest quote strictly before band start; quotes deduped per
    // (user, ts) so the carried row is tie-free)
    "q179_kerf_wj_prevailing" ->
      """WITH pur AS (
           SELECT user_id, event_id AS t_id, epoch_us(ts) * 1000 AS t_ts,
                  value AS price
           FROM events WHERE event_type = 'purchase'),
         q0 AS (
           SELECT DISTINCT user_id, epoch_us(ts) * 1000 AS q_ts, value AS quote
           FROM events WHERE event_type = 'view'),
         quo AS (
           SELECT user_id, q_ts, quote FROM (
             SELECT user_id, q_ts, quote,
                    max(quote) OVER (PARTITION BY user_id, q_ts) AS mx
             FROM q0) WHERE quote = mx),
         band AS (
           SELECT p.user_id, p.t_id, p.t_ts, p.price, q.quote
           FROM pur p LEFT JOIN quo q ON p.user_id = q.user_id
             AND q.q_ts >= p.t_ts - 600000000000
             AND q.q_ts <= p.t_ts + 600000000000),
         pv AS (
           SELECT user_id, t_id, t_ts, price, quote FROM (
             SELECT p.user_id, p.t_id, p.t_ts, p.price, q.quote,
                    row_number() OVER (PARTITION BY p.t_id
                                       ORDER BY q.q_ts DESC) AS rn
             FROM pur p JOIN quo q ON p.user_id = q.user_id
               AND q.q_ts < p.t_ts - 600000000000)
           WHERE rn = 1),
         allp AS (SELECT * FROM band UNION ALL SELECT * FROM pv)
         SELECT user_id, t_id, t_ts, price, max(quote) AS top_q,
                count(quote) AS n_q
         FROM allp GROUP BY user_id, t_id, t_ts, price
         ORDER BY user_id, t_id""",

    // top-N per group: the row_number-filter twin with the identical
    // total tiebreak
    "q178_kerf_top" ->
      """WITH p AS (
           SELECT user_id, event_id, value FROM events
           WHERE event_type = 'purchase'),
         r AS (
           SELECT user_id, event_id, value,
                  row_number() OVER (PARTITION BY user_id
                                     ORDER BY value DESC, event_id) AS rn
           FROM p)
         SELECT user_id, event_id, value FROM r WHERE rn <= 3
         ORDER BY user_id, value DESC, event_id""",

    // the capstone replayed as one tree: change filter (differs), TWAP
    // over conflated intervals (lead + exact-decimal wavg), exact
    // distinct count, axis-ordered list — every stage's oracle pattern
    // reused verbatim
    "q177_conflation_capstone" ->
      """WITH p AS (
           SELECT user_id, epoch_us(ts) * 1000 AS ts_ns, value
           FROM events WHERE event_type = 'purchase'),
         d AS (
           SELECT user_id, ts_ns, value,
                  (row_number() OVER w = 1) OR
                  (value IS DISTINCT FROM lag(value) OVER w) AS chg
           FROM p
           WINDOW w AS (PARTITION BY user_id ORDER BY ts_ns, value)),
         c AS (SELECT user_id, ts_ns, value FROM d WHERE chg),
         n AS (
           SELECT user_id, value, ts_ns,
                  lead(ts_ns) OVER (PARTITION BY user_id
                                    ORDER BY ts_ns, value) AS nts
           FROM c),
         f AS (
           SELECT user_id,
                  CAST((nts - ts_ns) / 1000000000 AS DECIMAL(19,6)) AS w,
                  CAST(value AS DECIMAL(19,6)) AS x
           FROM n WHERE nts > 0),
         t AS (
           SELECT user_id,
                  CAST(CAST(sum(w * x) AS VARCHAR) AS DOUBLE)
                    / CAST(CAST(sum(w) AS VARCHAR) AS DOUBLE) AS twap,
                  count(DISTINCT x) AS nv
           FROM f GROUP BY user_id),
         g AS (
           SELECT user_id,
                  array_to_string(list(printf('%.4f', value)
                                       ORDER BY ts_ns, value), ',') AS series
           FROM c GROUP BY user_id)
         SELECT t.user_id, t.twap, t.nv, g.series
         FROM t JOIN g ON t.user_id = g.user_id
         ORDER BY t.user_id""",

    // one batch-perceptron epoch from v=0: every margin is 0 (counts
    // as misclassified), so the update is the label-weighted bucket
    // census, published on the [0, scale) grid centered at scale/2
    "q176_perceptron_step" ->
      """WITH toks AS (
           SELECT doc_id, CASE WHEN doc_id % 2 = 0 THEN 1 ELSE -1 END AS y,
                  unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS tok
           FROM documents),
         b AS (
           SELECT doc_id, y,
                  CAST(concat('0x', substring(md5(tok), 1, 6)) AS BIGINT) % 1024 AS bucket
           FROM toks),
         c AS (SELECT doc_id, y, bucket, count(*) AS c FROM b GROUP BY 1, 2, 3),
         u AS (SELECT bucket, CAST(sum(y * c) AS BIGINT) AS u FROM c GROUP BY bucket),
         g AS (SELECT r.range AS bucket, coalesce(u.u, 0) AS u
               FROM range(0, 1024) r LEFT JOIN u ON u.bucket = r.range)
         SELECT CAST(bucket AS BIGINT) AS bucket,
                CAST(greatest(0, least(1996, 998 + u)) AS BIGINT) AS w
         FROM g ORDER BY bucket""",

    // TWAP replayed stage by stage: lead for the interval end, the
    // seconds conversion (whole-µs ticks land exactly on the 6-decimal
    // grid), the identical exact-decimal wavg tree (q158 discipline)
    "q175_kerf_twap" ->
      """WITH p AS (
           SELECT user_id, epoch_us(ts) * 1000 AS ts_ns, value
           FROM events WHERE event_type = 'view'),
         d AS (
           SELECT user_id, value, ts_ns,
                  lead(ts_ns) OVER (PARTITION BY user_id
                                    ORDER BY ts_ns, value) AS nts
           FROM p),
         f AS (
           SELECT user_id,
                  CAST((nts - ts_ns) / 1000000000 AS DECIMAL(19,6)) AS w,
                  CAST(value AS DECIMAL(19,6)) AS x
           FROM d WHERE nts > 0)
         SELECT user_id,
                CAST(CAST(sum(w * x) AS VARCHAR) AS DOUBLE)
                  / CAST(CAST(sum(w) AS VARCHAR) AS DOUBLE) AS twap
         FROM f GROUP BY user_id ORDER BY user_id""",

    // BPE apply replayed as the identical replace chain over the
    // doubled-separator representation ('||c||h||a||t||</w>||'; a
    // merge consumes only the INNER separator pair, so replace's
    // left-to-right scan equals BPE's one-round merge of every
    // occurrence); tokens per word = pipes//2 − 1
    "q172_bpe_tokenize" -> bpeTokenizeSql,

    // the dialect face drives the SAME chain with the same published
    // rules — q172's oracle verbatim
    "q174_dialect_bpe" -> bpeTokenizeSql,

    // one BPE training round's argmax input: adjacent-pair counts over
    // the distinct-word census, weighted by word frequency
    "q173_bpe_pair_census" ->
      """WITH w AS (
           SELECT unnest(string_split(trim(regexp_replace(
                    replace(lower(text), '|', ' '), '\s+', ' ', 'g')), ' ')) AS w
           FROM documents),
         wf AS (SELECT w, count(*) AS freq FROM w WHERE length(w) > 0 GROUP BY w),
         s AS (SELECT freq, list_append(string_split(w, ''), '</w>') AS syms FROM wf),
         pr AS (SELECT freq,
                       unnest(list_transform(range(1, len(syms)),
                         i -> struct_pack(l := syms[i], r := syms[i+1]))) AS p
                FROM s)
         SELECT p.l AS l, p.r AS r, CAST(sum(freq) AS BIGINT) AS cnt
         FROM pr GROUP BY 1, 2 ORDER BY cnt DESC, l, r LIMIT 10""",

    // the streaming conflation replayed as the batch differs filter:
    // a suppressed tick's value equals the last emitted one, so
    // "differs from last emitted" == "differs from previous row"
    "q171_stream_onchange" ->
      """WITH p AS (
           SELECT user_id, epoch_us(ts) AS ts_us, value
           FROM events WHERE user_id < 20 AND event_type = 'purchase'),
         d AS (
           SELECT user_id, ts_us, value,
                  (value IS DISTINCT FROM lag(value) OVER
                    (PARTITION BY user_id ORDER BY ts_us, value)) AS chg
           FROM p)
         SELECT user_id, ts_us, value FROM d WHERE chg
         ORDER BY user_id, ts_us, value""",

    // q's differ: first row opens a run; IS DISTINCT FROM is the
    // null-safe change test (null→null no change, null↔value change)
    "q170_kerf_differs" ->
      """WITH p AS (
           SELECT user_id, epoch_us(ts) * 1000 AS ts_ns, value
           FROM events WHERE event_type = 'purchase')
         SELECT user_id, ts_ns, value,
                (row_number() OVER w = 1) OR
                (value IS DISTINCT FROM lag(value) OVER w) AS chg
         FROM p
         WINDOW w AS (PARTITION BY user_id ORDER BY ts_ns, value)
         ORDER BY user_id, ts_ns, value""",

    // seeded split: SplitMix64(11, doc_id) → u01 → cumulative-weight
    // fold (8:1:1 → thresholds .8/.9), fold populations hash-compared
    "q192_rng_split" ->
      s"""WITH s0 AS (SELECT doc_id, n_chars, ${rngZ0(11, "doc_id")} AS z FROM documents),
          s1 AS (SELECT doc_id, n_chars, ${rngZ1("z")} AS z FROM s0),
          s2 AS (SELECT doc_id, n_chars, ${rngZ2("z")} AS z FROM s1),
          s3 AS (SELECT doc_id, n_chars, ${rngU("z")} AS u FROM s2),
          f AS (SELECT n_chars,
                  CAST(CASE WHEN ${u01("u")} < 0.8::DOUBLE THEN 0
                            WHEN ${u01("u")} < 0.9::DOUBLE THEN 1
                            ELSE 2 END AS BIGINT) AS fold FROM s3)
          SELECT fold, count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS chars
          FROM f GROUP BY fold ORDER BY fold""",

    // exact-n sample: order by the signed u64 draw (seed 3), tiebreak
    // doc_id, limit 64; the u01 face under seed 7 pins both conversions
    "q193_rng_sample" ->
      s"""WITH s0 AS (SELECT doc_id, ${rngZ0(3, "doc_id")} AS za,
                             ${rngZ0(7, "doc_id")} AS zb FROM documents),
          s1 AS (SELECT doc_id, ${rngZ1("za")} AS za, ${rngZ1("zb")} AS zb FROM s0),
          s2 AS (SELECT doc_id, ${rngZ2("za")} AS za, ${rngZ2("zb")} AS zb FROM s1),
          s3 AS (SELECT doc_id, ${rngU("za")} AS ua, ${rngU("zb")} AS ub FROM s2)
          SELECT doc_id, ${signed("ua")} AS draw, ${u01("ub")} AS u
          FROM s3 ORDER BY draw, doc_id LIMIT 64""",

    // the dialect faces of the incremental probes reuse their engines'
    // oracles verbatim (same engine, same answer — the lowering is what
    // the extra queries pin)
    "q116_dialect_dedup_probe" -> incrementalDedupSql,

    "q117_dialect_semdedup_probe" -> incrementalSemDedupSql,

    // as-of on a RAW int64-ns axis with a 300-NANOSECOND tolerance:
    // DuckDB replays the identical planted integer axis from epoch_ns,
    // so every match/no-match decided below the microsecond crosses as
    // a bigint compare — a µs-rounding engine fails the hash
    "q199_asof_ns" ->
      """WITH t AS (SELECT user_id, event_id,
                           epoch_ns(ts) + event_id % 997 AS tick_ns
                    FROM events WHERE event_type = 'click'),
              q AS (SELECT user_id,
                           tick_ns - event_id % 499 AS q_ns,
                           CAST((tick_ns - event_id % 499) % 997 AS DOUBLE) AS q_val
                    FROM t)
         SELECT t.user_id, t.event_id, t.tick_ns,
                CASE WHEN t.tick_ns - q.q_ns <= 300 THEN q.q_val END AS q_val,
                CASE WHEN t.tick_ns - q.q_ns <= 300 THEN q.q_ns END AS q_ns_at
         FROM t ASOF LEFT JOIN q
           ON t.user_id = q.user_id AND q.q_ns <= t.tick_ns
         ORDER BY t.user_id, t.tick_ns, t.event_id""",

    // granularity verbs on the raw ns lane: identical BIGINT floor/mod
    // math — hourly bars, within-second ns, hour/minute of day. The
    // planted `event_id % 997` jitter makes sum_subsec_ns depend on
    // sub-µs bits, so a µs round-trip anywhere fails the hash.
    "q201_ns_bars" ->
      """WITH t AS (SELECT user_id, event_id,
                           epoch_ns(ts) + event_id % 997 AS tick_ns
                    FROM events WHERE event_type = 'click')
         SELECT user_id, tick_ns - tick_ns % 3600000000000 AS bar_ns,
                count(*) AS n,
                CAST(sum(tick_ns % 1000000000) AS BIGINT) AS sum_subsec_ns,
                min((tick_ns // 3600000000000) % 24) AS h_min,
                max((tick_ns // 60000000000) % 60) AS m_max
         FROM t GROUP BY user_id, bar_ns ORDER BY user_id, bar_ns""",

    // ns-exact literal lane: every constant re-derived as epoch_ns of
    // the seconds part + the fraction digits as BIGINT (DuckDB 1.0's
    // string→TIMESTAMP_NS cast truncates to µs, so the decomposition
    // IS the independent derivation). off_ns carries the literal's
    // sub-µs digits into every row; the span is plain BIGINT ns.
    "q202_ns_literals" ->
      """WITH t AS (SELECT user_id, event_id,
                           epoch_ns(ts) + event_id % 997 AS tick_ns
                    FROM events WHERE event_type = 'click')
         SELECT user_id, event_id,
                tick_ns - (epoch_ns(TIMESTAMP '2024-01-10 00:00:00') + 123) AS off_ns,
                tick_ns + (3600000000000 + 2000000000 + 150) AS bump_ns
         FROM t
         WHERE tick_ns >= epoch_ns(TIMESTAMP '2024-01-05 06:30:00') + 1
           AND tick_ns < epoch_ns(TIMESTAMP '2024-02-01 00:00:00')
         ORDER BY user_id, event_id""",

    // session-wide Kerf ordering twin (q142's adjudication, bare key):
    // NaN (%7) and null (%11) coincide at the BOTTOM of the total order
    // — emulated with an explicit CASE … NULLS FIRST, no engine-native
    // NaN placement trusted on either side
    "q203_kerf_session" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice
         FROM (SELECT l_orderkey, l_linenumber, l_extendedprice,
                      CASE WHEN l_orderkey % 7 = 0 THEN CAST('NaN' AS DOUBLE)
                           WHEN l_orderkey % 11 = 0 THEN NULL
                           ELSE l_extendedprice END AS x
               FROM lineitem)
         ORDER BY (CASE WHEN x IS NULL OR isnan(x) THEN NULL ELSE x END)
                    ASC NULLS FIRST,
                  l_orderkey, l_linenumber
         LIMIT 25""",

    // session-wide Kerf EQUALITY twin: epsEq replayed as an explicit
    // CASE tree — null==NaN==NaN equal, finite pairs equal within the
    // reference's own E=1e-20 relative (grade.cc:9 — sub-ulp, so the
    // epsilon clause is kept for FORM but can only admit bit-equal
    // pairs; the r17 alignment this twin holds: z = x·(1+2⁻⁵⁰) is
    // within the old 1e-14 but UNEQUAL now). Every operand is
    // identical-bits on both engines (power-of-two constants, IEEE
    // ops); no native NaN/tolerance semantics trusted
    "q204_kerf_eq" ->
      """WITH t AS (SELECT l_returnflag,
                           CASE WHEN l_orderkey % 7 = 0 THEN CAST('NaN' AS DOUBLE)
                                WHEN l_orderkey % 11 = 0 THEN NULL
                                ELSE l_extendedprice END AS x
                    FROM lineitem),
              v AS (SELECT l_returnflag, x,
                           x * 1.0 AS y,
                           x * (1.0 + power(2.0, -50.0)) AS z
                    FROM t)
         SELECT l_returnflag, count(*) AS n_finite
         FROM v
         WHERE (((y IS NULL OR isnan(y)) AND (x IS NULL OR isnan(x)))
                OR (y IS NOT NULL AND NOT isnan(y)
                    AND x IS NOT NULL AND NOT isnan(x) AND y = x)
                OR (isfinite(y) AND isfinite(x)
                    AND abs(y - x) <= 1e-20 * greatest(abs(y), abs(x))))
           AND NOT (((z IS NULL OR isnan(z)) AND (x IS NULL OR isnan(x)))
                OR (z IS NOT NULL AND NOT isnan(z)
                    AND x IS NOT NULL AND NOT isnan(x) AND z = x)
                OR (isfinite(z) AND isfinite(x)
                    AND abs(z - x) <= 1e-20 * greatest(abs(z), abs(x))))
         GROUP BY l_returnflag ORDER BY l_returnflag""",

    // single-arg fromjson INFERENCE: the sampled schema must land on
    // {k: bigint} for this fixture (every props row carries integer k),
    // so the aggregates replay exactly as q141's explicit-DDL tree
    "q200_atlas_infer" ->
      """WITH t AS (
           SELECT event_type,
                  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
           FROM events)
         SELECT event_type, count(*) AS n,
                CAST(sum(k) AS BIGINT) AS sum_k,
                min(k) AS min_k, max(k) AS max_k
         FROM t WHERE k >= 5
         GROUP BY event_type ORDER BY event_type""",

    // incremental SEMANTIC dedup: q55's planted closed form — the probe
    // batch is exactly the shifted twins, each hits its original at
    // cosine exactly 1.0, and nothing organic reaches τ=0.9
    "q198_semdedup_incremental" -> incrementalSemDedupSql,

    // incremental LSH-index dedup: the exact cross-set Jaccard between
    // the indexed corpus (doc_id % 3 != 0) and the probe batch — q29's
    // oracle tree restricted to corpus×batch pairs, id_a = indexed side
    "q197_dedup_incremental" -> incrementalDedupSql,

    // bigint (DECIMAL(38,0)) arithmetic: DuckDB replays in HUGEINT
    // (int128 — same exact-integer semantics, different carrier); the
    // digits cross as strings so the compare is representation-exact
    "q196_bigint" ->
      """SELECT l_returnflag,
                CAST(sum(CAST(l_orderkey AS HUGEINT) * l_orderkey * l_orderkey
                         * 10000) AS VARCHAR) AS cube_sum,
                CAST(sum(CAST(l_orderkey AS HUGEINT) * 1000000000000) AS VARCHAR)
                  AS big_sum,
                CAST(max(CAST('123456789012345678901234567890' AS HUGEINT)
                         + l_orderkey) AS VARCHAR) AS lit_max
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    // histogram-rollup quantile navigation: rebuild the identical
    // (flag × grid-bucket) histogram from the raw rows, then replay the
    // identical rank → cumulative-bucket → interpolate → clamp math
    "q195_hist_quantile" ->
      """WITH h AS (
           SELECT l_returnflag,
                  CASE WHEN l_extendedprice < 900.0 THEN -1
                       WHEN l_extendedprice >= 900.0 + 1750.0 * 64 THEN 64
                       ELSE CAST(floor((l_extendedprice - 900.0) / 1750.0) AS BIGINT)
                  END AS b,
                  count(l_extendedprice) AS cnt,
                  min(l_extendedprice) AS bmin,
                  max(l_extendedprice) AS bmax
           FROM lineitem GROUP BY l_returnflag, b),
         c AS (
           SELECT *,
                  CAST(sum(cnt) OVER (PARTITION BY l_returnflag ORDER BY b
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
                  CAST(sum(cnt) OVER (PARTITION BY l_returnflag) AS BIGINT) AS total
           FROM h),
         j AS (
           SELECT c.*, q.q,
                  greatest(CAST(ceil(q.q * c.total) AS BIGINT), 1) AS rank
           FROM c CROSS JOIN
             (SELECT unnest([0.5::DOUBLE, 0.95::DOUBLE, 0.99::DOUBLE]) AS q) q)
         SELECT l_returnflag, q, rank,
                least(greatest(
                  900.0 + 1750.0 * (CAST(b AS DOUBLE) +
                    CAST(rank - (cum - cnt) AS DOUBLE) / CAST(cnt AS DOUBLE)),
                  bmin), bmax) AS est,
                bmin AS lo_bound, bmax AS hi_bound
         FROM j WHERE cum >= rank AND (cum - cnt) < rank
         ORDER BY l_returnflag, q""",

    // bitops family: &, |, xor, ~, << (wrapping), arithmetic >>,
    // bit_count, pow2 test, grouped by the bin-length floor-log2
    "q194_bitops" ->
      """SELECT CAST(CASE WHEN l_orderkey <= 0 THEN NULL
                          ELSE length(bin(l_orderkey)) - 1 END AS BIGINT) AS lg,
                count(*) AS n,
                CAST(sum(l_orderkey & 255) AS BIGINT) AS low8,
                CAST(sum(l_orderkey | l_linenumber) AS BIGINT) AS orr,
                CAST(sum(xor(l_orderkey, l_partkey)) AS BIGINT) AS xr,
                CAST(sum((~l_orderkey) & 1023) AS BIGINT) AS nt,
                CAST(sum((l_orderkey << 3) & 4095) AS BIGINT) AS sl,
                CAST(sum(l_orderkey >> 4) AS BIGINT) AS sr,
                CAST(sum(bit_count(l_orderkey)) AS BIGINT) AS bits,
                CAST(sum(CAST(l_orderkey > 0 AND
                              (l_orderkey & (l_orderkey - 1)) = 0 AS BIGINT)) AS BIGINT) AS pows
         FROM lineitem GROUP BY lg ORDER BY lg""",
  )
}
