package graft.oracle

/** DuckDB oracle SQL, one entry per oracle-eligible key in
  * `SparkEntry.queries` (SURVEY §2, §5.1). The driver replays these over
  * the same parquet tables (views named `lineitem`, `orders`, ...) and
  * hash-compares against the Spark result with columns sorted by name —
  * so every alias here matches the Spark side exactly, every query ends
  * in the same ORDER BY, and money aggregates use the same
  * decimal-then-DOUBLE discipline (graft.Determinism, SURVEY §7.4).
  */
object OracleSql {

  private val relational: Map[String, String] = Map(
    "scan_parquet" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
        |       l_returnflag, l_linestatus, l_shipdate
        |FROM lineitem
        |ORDER BY l_orderkey NULLS LAST, l_linenumber NULLS LAST, l_quantity NULLS LAST,
        |  l_extendedprice NULLS LAST, l_returnflag NULLS LAST, l_linestatus NULLS LAST,
        |  l_shipdate NULLS LAST""".stripMargin,

    "scan_parquet_pruned" ->
      """SELECT l_partkey, l_extendedprice
        |FROM lineitem
        |ORDER BY l_partkey NULLS LAST, l_extendedprice NULLS LAST""".stripMargin,

    "project_rename_cast" ->
      """SELECT o_orderkey AS orderkey,
        |       CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR) AS totalprice_dec,
        |       CAST(o_orderdate AS DATE) AS orderdate,
        |       upper(o_orderpriority) AS priority
        |FROM orders
        |ORDER BY orderkey""".stripMargin,

    "filter_compound" ->
      """SELECT l_orderkey, l_linenumber, l_shipdate, l_discount, l_returnflag
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.03 AND 0.07
        |  AND NOT (l_returnflag = 'R')
        |ORDER BY l_orderkey NULLS LAST, l_linenumber NULLS LAST, l_shipdate NULLS LAST,
        |  l_discount NULLS LAST, l_returnflag NULLS LAST""".stripMargin,

    "filter_in_like_between" ->
      """SELECT p_partkey, p_name, p_brand, p_size
        |FROM part
        |WHERE p_brand IN ('Brand#1', 'Brand#2', 'Brand#3')
        |  AND p_name LIKE '%bolt%'
        |  AND p_size BETWEEN 5 AND 25
        |ORDER BY p_partkey""".stripMargin,

    "filter_null_semantics" ->
      """SELECT l_orderkey, l_linenumber, flag_n, disc_n,
        |       flag_n IS NOT DISTINCT FROM 'A' AS flag_is_a
        |FROM (
        |  SELECT l_orderkey, l_linenumber,
        |         nullif(l_returnflag, 'N') AS flag_n,
        |         nullif(l_discount, 0.0) AS disc_n
        |  FROM lineitem
        |)
        |WHERE flag_n IS NULL OR disc_n IS NOT NULL
        |ORDER BY l_orderkey NULLS LAST, l_linenumber NULLS LAST, flag_n NULLS LAST,
        |  disc_n NULLS LAST, flag_is_a NULLS LAST""".stripMargin,

    "case_when_bucketing" ->
      """SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
        |            WHEN o_totalprice < 150000 THEN 'medium'
        |            WHEN o_totalprice < 300000 THEN 'large'
        |            ELSE 'jumbo' END AS price_band,
        |       count(*) AS n_orders
        |FROM orders
        |GROUP BY 1
        |ORDER BY price_band""".stripMargin,

    "join_broadcast_inner" ->
      """SELECT l_orderkey, l_linenumber, p_name, p_brand, l_quantity, p_retailprice
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |ORDER BY l_orderkey NULLS LAST, l_linenumber NULLS LAST, p_name NULLS LAST,
        |  p_brand NULLS LAST, l_quantity NULLS LAST, p_retailprice NULLS LAST""".stripMargin,

    "join_shuffle_inner" ->
      """SELECT o_orderkey, l_linenumber, o_custkey, o_totalprice, l_extendedprice
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |ORDER BY o_orderkey NULLS LAST, l_linenumber NULLS LAST, o_custkey NULLS LAST,
        |  o_totalprice NULLS LAST, l_extendedprice NULLS LAST""".stripMargin,

    "join_left_outer" ->
      """SELECT c_custkey, c_name, count(o_orderkey) AS n_orders
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey, c_name
        |ORDER BY c_custkey""".stripMargin,

    "join_full_outer" ->
      """SELECT coalesce(user_id, o_custkey) AS ukey, n_events, n_orders
        |FROM (SELECT user_id, count(*) AS n_events FROM events GROUP BY user_id) e
        |FULL JOIN (SELECT o_custkey, count(*) AS n_orders FROM orders GROUP BY o_custkey) o
        |  ON user_id = o_custkey
        |ORDER BY ukey""".stripMargin,

    "join_left_semi" ->
      """SELECT c_custkey, c_name, c_mktsegment
        |FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "join_left_anti" ->
      """SELECT c_custkey, c_name, c_mktsegment
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    // <=> / IS NOT DISTINCT FROM: the null bucket matches itself
    "join_null_safe" ->
      """SELECT c.c_custkey, s.s_suppkey,
        |       coalesce(nullif(c.c_nationkey, 3), -1) AS nk_or_unknown
        |FROM customer c
        |JOIN supplier s
        |  ON nullif(c.c_nationkey, 3) IS NOT DISTINCT FROM nullif(s.s_nationkey, 3)
        |ORDER BY c.c_custkey, s.s_suppkey""".stripMargin,

    "join_cross" ->
      """SELECT r_name, n_name
        |FROM region CROSS JOIN nation
        |WHERE r_regionkey <> n_regionkey
        |ORDER BY r_name, n_name""".stripMargin,

    "join_theta_range" ->
      """SELECT l_orderkey, l_linenumber, p_partkey, l_extendedprice, p_retailprice
        |FROM (SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        |      WHERE l_quantity >= 49 AND l_returnflag = 'R') li
        |JOIN (SELECT p_partkey, p_retailprice FROM part WHERE p_size = 1) p
        |  ON p_retailprice >= l_extendedprice * 0.009
        | AND p_retailprice <= l_extendedprice * 0.011
        |ORDER BY l_orderkey NULLS LAST, l_linenumber NULLS LAST, p_partkey NULLS LAST,
        |  l_extendedprice NULLS LAST, p_retailprice NULLS LAST""".stripMargin,

    "join_multiway_star" ->
      """SELECT r_name, n_name,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |                 * CAST(1.0 - l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |       count(*) AS n_items
        |FROM orders
        |JOIN lineitem ON o_orderkey = l_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY r_name, n_name
        |ORDER BY r_name, n_name""".stripMargin,

    "join_self_dedup" ->
      """SELECT a.user_id, a.event_id AS a_id, b.event_id AS b_id,
        |       a.ts AS a_ts, b.ts AS b_ts
        |FROM events a JOIN events b
        |  ON a.user_id = b.user_id
        | AND a.event_id < b.event_id
        | AND b.ts >= a.ts
        | AND b.ts <= a.ts + INTERVAL 1 HOUR
        |ORDER BY a.user_id, a_id, b_id""".stripMargin,

    "agg_groupby_basic" ->
      """SELECT l_returnflag, l_linestatus,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |                 * CAST(1.0 - l_discount AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |                 * CAST((1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(18,4))) AS DOUBLE) AS sum_charge,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price,
        |       count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2001-09-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
  )

  private val asof: Map[String, String] = Map(
    "sql_tpch_q3" ->
      """SELECT l_orderkey,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |                (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |       o_orderdate, o_orderpriority
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1997-06-01 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1997-06-01 00:00:00'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey
        |LIMIT 10""".stripMargin,

    "sql_exists_subquery" ->
      """SELECT c_custkey, c_mktsegment
        |FROM customer c
        |WHERE EXISTS (
        |        SELECT 1 FROM orders o
        |        WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000)
        |  AND NOT EXISTS (
        |        SELECT 1 FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |        WHERE o.o_custkey = c.c_custkey AND l.l_returnflag = 'R')
        |ORDER BY c_custkey""".stripMargin,

    "sql_scalar_subquery" ->
      """SELECT c_custkey,
        |       (SELECT CAST(max(o_totalprice) AS DOUBLE) FROM orders o
        |        WHERE o.o_custkey = c.c_custkey) AS max_order_price,
        |       (SELECT CAST(count(*) AS BIGINT) FROM orders o
        |        WHERE o.o_custkey = c.c_custkey) AS n_orders
        |FROM customer c
        |ORDER BY c_custkey""".stripMargin,

    "events_funnel" ->
      """WITH f AS (
        |  SELECT user_id,
        |         min(CASE WHEN event_type = 'signup' THEN ts END) AS t_signup,
        |         min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
        |         min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
        |  FROM events GROUP BY user_id)
        |SELECT count(*) AS n_users,
        |       count(t_signup) AS n_signup,
        |       count(CASE WHEN t_click > t_signup THEN 1 END) AS n_signup_then_click,
        |       count(CASE WHEN t_click > t_signup AND t_purchase > t_click THEN 1 END)
        |         AS n_full_funnel
        |FROM f""".stripMargin,

    "win_cumulative_distinct" ->
      """WITH f AS (
        |  SELECT user_id, ts, event_id, event_type,
        |         CASE WHEN row_number() OVER (PARTITION BY user_id, event_type
        |                    ORDER BY ts, event_id) = 1
        |              THEN 1 ELSE 0 END AS is_new
        |  FROM events)
        |SELECT user_id, event_id, event_type,
        |       CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |         AS n_types_seen
        |FROM f
        |ORDER BY user_id, event_id""".stripMargin,

    "events_funnel_windowed" ->
      """WITH s1 AS (
        |  SELECT user_id, min(ts) AS t_signup
        |  FROM events WHERE event_type = 'signup' GROUP BY user_id),
        |s2 AS (
        |  SELECT e.user_id, min(e.ts) AS t_click
        |  FROM events e JOIN s1 USING (user_id)
        |  WHERE e.event_type = 'click'
        |    AND e.ts >= s1.t_signup AND e.ts <= s1.t_signup + INTERVAL 7 DAY
        |  GROUP BY e.user_id),
        |s3 AS (
        |  SELECT e.user_id, min(e.ts) AS t_purchase
        |  FROM events e JOIN s2 USING (user_id)
        |  WHERE e.event_type = 'purchase'
        |    AND e.ts >= s2.t_click AND e.ts <= s2.t_click + INTERVAL 7 DAY
        |  GROUP BY e.user_id)
        |SELECT (SELECT count(*) FROM s1) AS n_signup,
        |       (SELECT count(*) FROM s2) AS n_click_7d,
        |       (SELECT count(*) FROM s3) AS n_purchase_7d""".stripMargin,

    "events_retention_cohort" ->
      """WITH e AS (
        |  SELECT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk FROM events),
        |first AS (SELECT user_id, min(wk) AS cohort_week FROM e GROUP BY user_id)
        |SELECT cohort_week,
        |       CAST(datediff('day', cohort_week, wk) / 7 AS INT) AS week_offset,
        |       count(DISTINCT e.user_id) AS n_active
        |FROM e JOIN first ON e.user_id = first.user_id
        |GROUP BY cohort_week, week_offset
        |ORDER BY cohort_week, week_offset""".stripMargin,

    "agg_corr_exact" ->
      """WITH m AS (
        |  SELECT l_returnflag, count(*) AS n,
        |         CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
        |         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
        |         CAST(sum(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
        |         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS syy,
        |         CAST(sum(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, n,
        |       round((n * sxy - sx * sy) /
        |             (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 6)
        |         AS corr_qty_price
        |FROM m
        |ORDER BY l_returnflag""".stripMargin,

    "text_pii_scrub" ->
      """SELECT doc_id,
        |       CAST(len(regexp_extract_all(text,
        |         '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INT) AS n_emails,
        |       CAST(len(regexp_extract_all(text,
        |         '\+?[0-9][0-9 ()-]{6,}[0-9]')) AS INT) AS n_phones,
        |       sha256(regexp_replace(regexp_replace(text,
        |         '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
        |         '\+?[0-9][0-9 ()-]{6,}[0-9]', '[PHONE]', 'g')) AS scrub_hash
        |FROM documents
        |ORDER BY doc_id""".stripMargin,

    "time_series_gap_fill" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS d,
        |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
        |  FROM orders GROUP BY 1),
        |bounds AS (SELECT min(d) AS lo, max(d) AS hi FROM daily),
        |spine AS (SELECT CAST(unnest(generate_series(CAST(lo AS TIMESTAMP),
        |                 CAST(hi AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS d
        |          FROM bounds)
        |SELECT spine.d, coalesce(rev, 0.0) AS day_rev, (rev IS NULL) AS filled
        |FROM spine LEFT JOIN daily ON spine.d = daily.d
        |ORDER BY spine.d""".stripMargin,

    "stream_stream_join" ->
      """SELECT c.event_id AS click_id, c.user_id, c.ts AS click_ts,
        |       p.event_id AS purchase_id, p.ts AS purchase_ts,
        |       p.value AS purchase_value
        |FROM (SELECT * FROM events WHERE event_type = 'click') c
        |JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
        |  ON c.user_id = p.user_id
        | AND p.ts >= c.ts
        | AND p.ts <= c.ts + INTERVAL 30 MINUTE
        |ORDER BY click_id, purchase_id""".stripMargin,

    "join_range_bucketed" ->
      """SELECT l_orderkey, l_linenumber, p_partkey, l_extendedprice, p_retailprice
        |FROM (SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        |      WHERE l_quantity >= 49 AND l_returnflag = 'R') li
        |JOIN (SELECT p_partkey, p_retailprice FROM part WHERE p_size = 1) p
        |  ON p_retailprice >= l_extendedprice * 0.009
        | AND p_retailprice <= l_extendedprice * 0.011
        |ORDER BY l_orderkey NULLS LAST, l_linenumber NULLS LAST, p_partkey NULLS LAST,
        |  l_extendedprice NULLS LAST, p_retailprice NULLS LAST""".stripMargin,

    "join_interval_overlap" ->
      """WITH a AS (
        |  SELECT o_orderkey AS a_id,
        |         CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS a_s
        |  FROM orders
        |  WHERE o_orderpriority = '1-URGENT'
        |    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'),
        |b AS (
        |  SELECT o_orderkey AS b_id,
        |         CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS b_s
        |  FROM orders
        |  WHERE o_orderpriority = '5-LOW'
        |    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00')
        |SELECT a_id AS a_orderkey, count(*) AS n_overlaps,
        |       CAST(sum(least(a_s + 9, b_s + 9) - greatest(a_s, b_s) + 1) AS BIGINT)
        |         AS sum_overlap_days
        |FROM a JOIN b ON a_s <= b_s + 9 AND b_s <= a_s + 9
        |GROUP BY a_id
        |ORDER BY a_orderkey""".stripMargin,

    "reshape_unpivot" ->
      """SELECT l_orderkey, l_linenumber, metric, value FROM (
        |  UNPIVOT (SELECT l_orderkey, l_linenumber, l_quantity AS qty,
        |             l_extendedprice AS price, l_discount AS discount, l_tax AS tax
        |           FROM lineitem)
        |  ON qty, price, discount, tax INTO NAME metric VALUE value)
        |ORDER BY l_orderkey NULLS LAST, l_linenumber NULLS LAST, metric NULLS LAST,
        |  value NULLS LAST""".stripMargin,

    "text_ngram_freq" ->
      """WITH d AS (
        |  SELECT doc_id,
        |         list_distinct(list_transform(generate_series(1, len(toks) - 1),
        |           i -> toks[i] || ' ' || toks[i + 1])) AS grams
        |  FROM (SELECT doc_id,
        |          string_split(lower(regexp_replace(trim(text), '\s+', ' ', 'g')), ' ') AS toks
        |        FROM documents)
        |  WHERE len(toks) >= 2),
        |f AS (SELECT gram, count(*) AS df
        |      FROM (SELECT doc_id, unnest(grams) AS gram FROM d)
        |      GROUP BY gram)
        |SELECT CAST(row_number() OVER (ORDER BY df DESC, gram ASC) AS INT) AS rank,
        |       gram, df
        |FROM (SELECT gram, df FROM f ORDER BY df DESC, gram ASC LIMIT 20)
        |ORDER BY rank""".stripMargin,

    "join_asof" ->
      """SELECT event_id, user_id, ts, asof_orderkey, asof_orderdate
        |FROM (SELECT e.event_id, e.user_id, e.ts,
        |             o.o_orderkey AS asof_orderkey, o.o_orderdate AS asof_orderdate,
        |             row_number() OVER (PARTITION BY e.event_id
        |                                ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
        |      FROM events e JOIN orders o
        |        ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts)
        |WHERE rn = 1
        |ORDER BY event_id""".stripMargin,

    "join_asof_tolerance" ->
      """SELECT event_id, user_id, ts, asof_orderkey, asof_orderdate
        |FROM (SELECT e.event_id, e.user_id, e.ts,
        |             o.o_orderkey AS asof_orderkey, o.o_orderdate AS asof_orderdate,
        |             row_number() OVER (PARTITION BY e.event_id
        |                                ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
        |      FROM events e JOIN orders o
        |        ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts
        |       AND o.o_orderdate >= e.ts - INTERVAL 8400 DAY)
        |WHERE rn = 1
        |ORDER BY event_id""".stripMargin,

    "join_asof_nearest" ->
      """SELECT event_id, user_id, ts, nearest_orderkey, nearest_orderdate
        |FROM (SELECT e.event_id, e.user_id, e.ts,
        |             o.o_orderkey AS nearest_orderkey,
        |             o.o_orderdate AS nearest_orderdate,
        |             row_number() OVER (PARTITION BY e.event_id ORDER BY
        |               abs(epoch_us(CAST(e.ts AS TIMESTAMP))
        |                   - epoch_us(o.o_orderdate)),
        |               CASE WHEN o.o_orderdate <= e.ts THEN 0 ELSE 1 END,
        |               CASE WHEN o.o_orderdate <= e.ts THEN -o.o_orderkey
        |                    ELSE o.o_orderkey END) AS rn
        |      FROM events e JOIN orders o ON e.user_id = o.o_custkey)
        |WHERE rn = 1
        |ORDER BY event_id""".stripMargin,

    "events_dau_wau" ->
      """WITH du AS (
        |  SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events),
        |days AS (SELECT DISTINCT d FROM du),
        |wau AS (
        |  SELECT days.d, count(DISTINCT du.user_id) AS wau_7d
        |  FROM days JOIN du ON du.d BETWEEN days.d - 6 AND days.d
        |  GROUP BY days.d),
        |dau AS (SELECT d, count(*) AS dau FROM du GROUP BY d)
        |SELECT dau.d, dau.dau, wau.wau_7d
        |FROM dau JOIN wau USING (d)
        |ORDER BY d""".stripMargin,
  )

  private val scalarFns: Map[String, String] = Map(
    "str_clean_standardize" ->
      """SELECT c_custkey,
        |       trim(lower(c_name)) AS clean_name,
        |       upper(c_mktsegment) AS seg_u,
        |       nullif(trim(c_mktsegment), '') AS seg_n,
        |       lpad(CAST(c_nationkey AS VARCHAR), 4, '0') AS nation_code,
        |       concat_ws('|', c_name, c_mktsegment) AS name_seg,
        |       substring(c_name, 1, 9) AS name_prefix,
        |       regexp_replace(c_name, '\s+', ' ', 'g') AS name_ws,
        |       array_to_string(string_split(c_name, '#'), '~') AS name_parts
        |FROM customer
        |ORDER BY c_custkey""".stripMargin,

    "str_regexp_extract" ->
      """SELECT p_partkey,
        |       regexp_extract(p_type, '^([A-Za-z]+)', 1) AS type_first,
        |       regexp_extract(p_type, '([A-Za-z]+)$', 1) AS type_last,
        |       regexp_extract(p_name, '([0-9]+)', 1) AS name_digits
        |FROM part
        |ORDER BY p_partkey""".stripMargin,

    "str_levenshtein" ->
      """SELECT a.s_suppkey AS a_key, b.s_suppkey AS b_key,
        |       a.s_name AS a_name, b.s_name AS b_name,
        |       levenshtein(a.s_name, b.s_name) AS dist
        |FROM supplier a JOIN supplier b
        |  ON a.s_suppkey < b.s_suppkey
        | AND abs(length(a.s_name) - length(b.s_name)) <= 1
        |WHERE levenshtein(a.s_name, b.s_name) <= 1
        |ORDER BY a_key, b_key""".stripMargin,

    "str_levenshtein_k2" ->
      """SELECT a.s_suppkey AS a_key, b.s_suppkey AS b_key,
        |       a.s_name AS a_name, b.s_name AS b_name,
        |       levenshtein(a.s_name, b.s_name) AS dist
        |FROM supplier a JOIN supplier b
        |  ON a.s_suppkey < b.s_suppkey
        | AND abs(length(a.s_name) - length(b.s_name)) <= 2
        |WHERE levenshtein(a.s_name, b.s_name) <= 2
        |ORDER BY a_key, b_key""".stripMargin,

    "date_parts_trunc" ->
      """SELECT o_orderkey,
        |       CAST(EXTRACT(year FROM o_orderdate) AS INT) AS y,
        |       CAST(EXTRACT(month FROM o_orderdate) AS INT) AS m,
        |       CAST(EXTRACT(dow FROM o_orderdate) AS INT) + 1 AS dow,
        |       CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
        |       datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since,
        |       CAST(o_orderdate AS DATE) + 30 AS d_plus30,
        |       last_day(CAST(o_orderdate AS DATE)) AS month_end
        |FROM orders
        |ORDER BY o_orderkey""".stripMargin,

    "math_decimal_arith" ->
      """SELECT l_orderkey, l_linenumber,
        |       CAST(CAST(l_extendedprice AS DECIMAL(18,2))
        |            * CAST(1.0 - l_discount AS DECIMAL(18,4))
        |            * CAST(1.0 + l_tax AS DECIMAL(18,4)) AS DOUBLE) AS revenue,
        |       CAST(round(CAST(l_extendedprice AS DECIMAL(18,2)) * 0.1, 2)
        |            AS DOUBLE) AS tenth_rounded,
        |       abs(l_discount - 0.05) AS disc_dev,
        |       CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
        |       CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
        |       l_quantity * l_quantity AS qty_sq,
        |       round(ln(l_extendedprice), 6) AS ln_price
        |FROM lineitem
        |ORDER BY l_orderkey NULLS LAST, l_linenumber NULLS LAST, revenue NULLS LAST,
        |  tenth_rounded NULLS LAST, disc_dev NULLS LAST, price_ceil NULLS LAST,
        |  price_floor NULLS LAST, qty_sq NULLS LAST, ln_price NULLS LAST""".stripMargin,

    "cond_coalesce_least" ->
      """SELECT c_custkey,
        |       coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS seg_or_other,
        |       greatest(c_acctbal, 0.0) AS bal_floor0,
        |       least(c_acctbal, 1000.0) AS bal_cap1k,
        |       nullif(c_nationkey, 5) AS nation_n5
        |FROM customer
        |ORDER BY c_custkey""".stripMargin,

    "array_explode_ops" ->
      """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS tokens FROM documents),
        |agg AS (SELECT doc_id, count(*) AS n_tokens, count(DISTINCT token) AS n_distinct
        |        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
        |        GROUP BY doc_id)
        |SELECT tok.doc_id, agg.n_tokens, agg.n_distinct,
        |       CAST(len(tok.tokens) AS INT) AS n_tokens_sz,
        |       list_contains(tok.tokens, 'the') AS has_the,
        |       array_to_string(list_slice(tok.tokens, 1, 3), ',') AS first3
        |FROM tok JOIN agg ON tok.doc_id = agg.doc_id
        |ORDER BY tok.doc_id""".stripMargin,

    "array_higher_order" ->
      """SELECT vec_id,
        |       list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |                   list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
        |                   (acc, x) -> acc + x) AS sum_squares,
        |       CAST(len(list_filter(embedding, x -> x > 0)) AS INT) AS n_positive,
        |       list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |                   list_transform(embedding, x -> CAST(x AS DOUBLE))),
        |                   (acc, x) -> acc + x) AS sum_emb,
        |       CAST(len(embedding) AS INT) AS dim
        |FROM embeddings
        |ORDER BY vec_id""".stripMargin,

    "map_from_json_props" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS INT) AS k,
        |       count(*) AS n_events,
        |       min(value) AS min_value,
        |       max(value) AS max_value,
        |       min(event_id) AS first_event
        |FROM events
        |GROUP BY 1
        |ORDER BY k""".stripMargin,
  )

  private val aggregations: Map[String, String] = Map(
    "agg_count_distinct" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n_events
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,

    "agg_grouping_sets" ->
      """SELECT n_name, c_mktsegment,
        |       CAST(GROUPING(n_name) AS INT) AS g_n,
        |       CAST(GROUPING(c_mktsegment) AS INT) AS g_m,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |       count(*) AS n_orders
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY GROUPING SETS ((n_name), (c_mktsegment), (n_name, c_mktsegment), ())
        |ORDER BY n_name NULLS LAST, c_mktsegment NULLS LAST, g_n NULLS LAST,
        |  g_m NULLS LAST, revenue NULLS LAST, n_orders NULLS LAST""".stripMargin,

    "agg_rollup" ->
      """SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS y,
        |       CAST(EXTRACT(month FROM o_orderdate) AS INT) AS m,
        |       CAST(GROUPING(CAST(EXTRACT(year FROM o_orderdate) AS INT)) AS INT) AS g_y,
        |       CAST(GROUPING(CAST(EXTRACT(month FROM o_orderdate) AS INT)) AS INT) AS g_m,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |       count(*) AS n_orders
        |FROM orders
        |GROUP BY ROLLUP (1, 2)
        |ORDER BY y NULLS LAST, m NULLS LAST, g_y NULLS LAST, g_m NULLS LAST,
        |  revenue NULLS LAST, n_orders NULLS LAST""".stripMargin,

    "agg_cube" ->
      """SELECT l_returnflag, l_linestatus,
        |       CAST(GROUPING(l_returnflag) AS INT) AS g_f,
        |       CAST(GROUPING(l_linestatus) AS INT) AS g_s,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |       count(*) AS n_items
        |FROM lineitem
        |GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS LAST, l_linestatus NULLS LAST, g_f NULLS LAST,
        |  g_s NULLS LAST, sum_price NULLS LAST, n_items NULLS LAST""".stripMargin,

    "agg_filtered" ->
      """SELECT o_orderpriority,
        |       count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_finished,
        |       count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_open,
        |       CAST(SUM(CASE WHEN o_totalprice > 200000
        |                     THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS rev_big,
        |       count(*) AS n_total
        |FROM orders
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "agg_collect_sorted" ->
      """SELECT o_custkey AS custkey,
        |       array_to_string(list_sort(array_agg(o_orderkey)), ',') AS orderkeys,
        |       count(*) AS n_orders
        |FROM orders
        |GROUP BY o_custkey
        |ORDER BY custkey""".stripMargin,

    "agg_pivot" ->
      """SELECT CAST(date_trunc('month', ts) AS DATE) AS month,
        |       count(*) FILTER (WHERE event_type = 'click') AS click,
        |       count(*) FILTER (WHERE event_type = 'error') AS error,
        |       count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
        |       count(*) FILTER (WHERE event_type = 'signup') AS signup,
        |       count(*) FILTER (WHERE event_type = 'view') AS view
        |FROM events
        |GROUP BY 1
        |ORDER BY month""".stripMargin,

    "agg_percentile_exact" ->
      """SELECT o_orderpriority,
        |       round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
        |       round(quantile_cont(o_totalprice, 0.9), 4) AS p90,
        |       count(*) AS n
        |FROM orders
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "agg_custom_aggregator" ->
      """SELECT l_returnflag,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |                 * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
        |         / CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS wavg_price,
        |       count(*) AS n_items
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    "udf_scalar_normalize" ->
      """SELECT doc_id,
        |       lower(regexp_replace(trim(text), '\s+', ' ', 'g')) AS norm_text,
        |       length(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS norm_len
        |FROM documents
        |ORDER BY doc_id""".stripMargin,

    "events_new_vs_returning" ->
      """WITH f AS (
        |  SELECT ts, user_id,
        |         CASE WHEN row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) = 1
        |              THEN 1 ELSE 0 END AS is_first
        |  FROM events)
        |SELECT CAST(ts AS DATE) AS d, count(*) AS n_events,
        |       count(DISTINCT user_id) AS n_active_users,
        |       CAST(sum(is_first) AS BIGINT) AS n_new_users
        |FROM f
        |GROUP BY 1
        |ORDER BY d""".stripMargin,

    "time_series_ohlc" ->
      """WITH w AS (
        |  SELECT event_type, date_trunc('hour', ts) AS h, value,
        |         row_number() OVER (PARTITION BY event_type, date_trunc('hour', ts)
        |                            ORDER BY ts, event_id) AS rn_a,
        |         row_number() OVER (PARTITION BY event_type, date_trunc('hour', ts)
        |                            ORDER BY ts DESC, event_id DESC) AS rn_d
        |  FROM events)
        |SELECT event_type, h,
        |       max(CASE WHEN rn_a = 1 THEN value END) AS open,
        |       max(value) AS high, min(value) AS low,
        |       max(CASE WHEN rn_d = 1 THEN value END) AS close,
        |       count(*) AS n
        |FROM w
        |GROUP BY event_type, h
        |ORDER BY event_type, h""".stripMargin,

    "agg_heavy_hitters" ->
      """WITH t AS (
        |  SELECT tok FROM (
        |    SELECT unnest(string_split(lower(regexp_replace(trim(text), '\s+', ' ', 'g')), ' ')) AS tok
        |    FROM documents WHERE trim(text) <> '')
        |  WHERE tok <> '')
        |SELECT tok, count(*) AS c
        |FROM t
        |GROUP BY tok
        |HAVING count(*) * 50 > (SELECT count(*) FROM t)
        |ORDER BY tok""".stripMargin,
  )

  private val windows: Map[String, String] = Map(
    "win_row_number_topk" ->
      """SELECT o_custkey, rn, o_orderkey, o_totalprice
        |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
        |             row_number() OVER (PARTITION BY o_custkey
        |                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |      FROM orders)
        |WHERE rn <= 3
        |ORDER BY o_custkey, rn""".stripMargin,

    "win_rank_dense" ->
      """SELECT s_suppkey, s_nationkey, s_acctbal,
        |       rank() OVER wv AS rnk,
        |       dense_rank() OVER wv AS drnk,
        |       percent_rank() OVER wv AS prnk,
        |       cume_dist() OVER wv AS cdist,
        |       ntile(4) OVER wk AS quartile
        |FROM supplier
        |WINDOW wv AS (PARTITION BY s_nationkey ORDER BY s_acctbal DESC),
        |       wk AS (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey)
        |ORDER BY s_suppkey""".stripMargin,

    "win_lag_lead" ->
      """SELECT user_id, event_id, ts, value,
        |       value - lag(value, 1) OVER w AS delta_value,
        |       epoch_us(ts) - epoch_us(lag(ts, 1) OVER w) AS gap_us,
        |       lead(event_id, 1) OVER w AS next_event_id
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY user_id, ts, event_id""".stripMargin,

    "win_running_sum" ->
      """SELECT o_custkey, o_orderkey, o_orderdate,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
        |             OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |            AS DOUBLE) AS running_rev
        |FROM orders
        |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin,

    "win_moving_range" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS d,
        |         datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS day,
        |         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
        |  FROM orders GROUP BY 1, 2)
        |SELECT d, CAST(rev AS DOUBLE) AS day_rev,
        |       CAST(SUM(rev) OVER (ORDER BY day
        |             RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE) AS mov7_rev
        |FROM daily
        |ORDER BY d""".stripMargin,

    "win_first_last" ->
      """SELECT DISTINCT user_id,
        |       first_value(value) OVER w AS first_value,
        |       last_value(value) OVER w AS last_value,
        |       first_value(event_type) OVER w AS first_type,
        |       last_value(event_type) OVER w AS last_type
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY user_id""".stripMargin,

    "events_sessionize" ->
      """WITH g AS (
        |  SELECT user_id, ts, event_id, value,
        |         CASE WHEN lag(ts) OVER w IS NULL
        |                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
        |              THEN 1 ELSE 0 END AS brk
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (
        |  SELECT user_id, ts, value,
        |         CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT)
        |           AS session_seq
        |  FROM g)
        |SELECT user_id, session_seq, count(*) AS n_events,
        |       min(ts) AS t_start, max(ts) AS t_end,
        |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM s
        |GROUP BY user_id, session_seq
        |ORDER BY user_id, session_seq""".stripMargin,
  )

  private val setSort: Map[String, String] = Map(
    "sort_multikey_nulls" ->
      """SELECT p_partkey, nullif(p_brand, 'Brand#3') AS brand_n, p_size, p_retailprice
        |FROM part
        |ORDER BY brand_n DESC NULLS FIRST, p_size ASC, p_partkey ASC""".stripMargin,

    "limit_topk_global" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC
        |LIMIT 20""".stripMargin,

    "set_union_all" ->
      """SELECT * FROM (
        |  SELECT event_id, user_id, event_type, value FROM events WHERE value > 90
        |  UNION ALL
        |  SELECT event_id, user_id, event_type, value FROM events WHERE event_type = 'click')
        |ORDER BY event_id NULLS LAST, user_id NULLS LAST, event_type NULLS LAST,
        |  value NULLS LAST""".stripMargin,

    "set_union_distinct" ->
      """SELECT * FROM (
        |  SELECT event_id, user_id, event_type, value FROM events WHERE value > 90
        |  UNION
        |  SELECT event_id, user_id, event_type, value FROM events WHERE event_type = 'click')
        |ORDER BY event_id NULLS LAST, user_id NULLS LAST, event_type NULLS LAST,
        |  value NULLS LAST""".stripMargin,

    "set_intersect" ->
      """SELECT o_custkey AS custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1996
        |INTERSECT
        |SELECT o_custkey AS custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1997
        |ORDER BY custkey""".stripMargin,

    "set_except" ->
      """SELECT o_custkey AS custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1996
        |EXCEPT
        |SELECT o_custkey AS custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1997
        |ORDER BY custkey""".stripMargin,
  )

  private val llm: Map[String, String] = Map(
    "dedup_exact_hash" ->
      """SELECT sha256(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS text_hash,
        |       min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM documents
        |GROUP BY 1
        |ORDER BY keep_id""".stripMargin,

    "dedup_latest_wins" ->
      """SELECT user_id, event_type, event_id, ts, value
        |FROM (SELECT user_id, event_type, event_id, ts, value,
        |             row_number() OVER (PARTITION BY user_id, event_type
        |                                ORDER BY ts DESC, event_id DESC) AS rn
        |      FROM events)
        |WHERE rn = 1
        |ORDER BY user_id, event_type""".stripMargin,

    "sim_cosine_topk" ->
      """WITH en AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
        |         list_reduce(list_prepend(0.0,
        |           list_transform(list_transform(embedding, x -> CAST(x AS DOUBLE)),
        |                          x -> x * x)), (a, b) -> a + b) AS nrm
        |  FROM embeddings),
        |p AS (SELECT vec_id AS p_id, v AS pv, nrm AS pnrm FROM en WHERE vec_id < 5),
        |pairs AS (
        |  SELECT p.p_id, en.vec_id,
        |         list_reduce(list_prepend(0.0,
        |           list_transform(en.v, (x, i) -> x * p.pv[i])), (a, b) -> a + b)
        |           / (sqrt(en.nrm) * sqrt(p.pnrm)) AS sim
        |  FROM en CROSS JOIN p WHERE en.vec_id <> p.p_id),
        |ranked AS (
        |  SELECT p_id, vec_id, sim,
        |         row_number() OVER (PARTITION BY p_id ORDER BY sim DESC, vec_id) AS rank
        |  FROM pairs)
        |SELECT p_id, rank, vec_id, sim FROM ranked WHERE rank <= 5
        |ORDER BY p_id, rank""".stripMargin,

    "dedup_embedding_cosine" ->
      """WITH en AS (
        |  SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
        |         list_reduce(list_prepend(0.0,
        |           list_transform(list_transform(embedding, x -> CAST(x AS DOUBLE)),
        |                          x -> x * x)), (a, b) -> a + b) AS nrm
        |  FROM embeddings),
        |p AS (
        |  SELECT a.label, a.vec_id AS keep_cand, b.vec_id AS dup_id,
        |         list_reduce(list_prepend(0.0,
        |           list_transform(a.v, (x, i) -> x * b.v[i])), (p, q) -> p + q)
        |           / (sqrt(a.nrm) * sqrt(b.nrm)) AS sim
        |  FROM en a JOIN en b ON a.label = b.label AND a.vec_id < b.vec_id),
        |q AS (
        |  SELECT label, dup_id, keep_cand AS keep_id, sim,
        |         row_number() OVER (PARTITION BY dup_id ORDER BY keep_cand ASC) AS rn
        |  FROM p WHERE sim >= 0.35)
        |SELECT label, dup_id, keep_id, sim FROM q WHERE rn = 1
        |ORDER BY dup_id""".stripMargin,

    // single per-lang window (the oracle doesn't need the distributed
    // bucket decomposition — by construction it computes the same
    // inclusive running sum in the same (h, doc_id) order)
    "sample_token_budget" ->
      """WITH t AS (
        |  SELECT doc_id, lang,
        |         CASE WHEN trim(text) = '' THEN 0
        |              ELSE CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
        |         END AS n_toks,
        |         md5('graft-budget' || '|' || CAST(doc_id AS VARCHAR)) AS h
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, lang, n_toks,
        |         CAST(sum(n_toks) OVER (PARTITION BY lang ORDER BY h, doc_id) AS BIGINT) AS cum_toks
        |  FROM t WHERE n_toks > 0)
        |SELECT doc_id, lang, n_toks, cum_toks
        |FROM c WHERE cum_toks <= 2000
        |ORDER BY lang, cum_toks, doc_id""".stripMargin,

    // ops.Llm.sampleMixtureExact: exact fixed-ratio mixing — the
    // VALUES clause is generated from the SAME Scala constant the
    // Spark plan uses (Llm.MixtureWeights), one source of truth.
    "sample_mixture_exact" ->
      s"""WITH w(lang, w_ppm) AS (VALUES ${
           graft.ops.Llm.MixtureWeights
             .map { case (l, p) => s"('$l', $p)" }.mkString(", ")}),
         |av AS (SELECT lang, count(*) AS avail FROM documents GROUP BY lang),
         |tt AS (SELECT min((avail * 1000000) // w_ppm) AS t_total
         |       FROM av JOIN w USING (lang)),
         |q AS (SELECT lang, (tt.t_total * w_ppm) // 1000000 AS quota FROM w, tt),
         |r AS (SELECT doc_id, lang,
         |        row_number() OVER (PARTITION BY lang
         |          ORDER BY md5('graft-mix' || '|' || CAST(doc_id AS VARCHAR)), doc_id) AS rank
         |      FROM documents)
         |SELECT r.doc_id, r.lang, CAST(r.rank AS BIGINT) AS rank
         |FROM r JOIN q USING (lang)
         |WHERE r.rank <= q.quota
         |ORDER BY lang, rank""".stripMargin,

    // ops.Llm.sampleMixtureEpochs: repeat-factor planning at the
    // fixed document budget — same generated weight VALUES.
    "sample_mixture_epochs" ->
      s"""WITH w(lang, w_ppm) AS (VALUES ${
           graft.ops.Llm.MixtureWeights
             .map { case (l, p) => s"('$l', $p)" }.mkString(", ")}),
         |av AS (SELECT lang, count(*) AS avail FROM documents GROUP BY lang)
         |SELECT av.lang, av.avail,
         |       (w_ppm * ${graft.ops.Llm.MixtureBudgetDocs}) // 1000000 AS quota,
         |       ((w_ppm * ${graft.ops.Llm.MixtureBudgetDocs}) // 1000000) // av.avail AS full_epochs,
         |       ((w_ppm * ${graft.ops.Llm.MixtureBudgetDocs}) // 1000000) % av.avail AS partial_docs,
         |       CAST((w_ppm * ${graft.ops.Llm.MixtureBudgetDocs}) // 1000000 AS DOUBLE)
         |         / CAST(av.avail AS DOUBLE) AS repeat_factor
         |FROM av JOIN w USING (lang)
         |ORDER BY lang""".stripMargin,

    "sample_temperature" ->
      """WITH d AS (SELECT doc_id, lang FROM documents),
        |n AS (SELECT lang, count(*) AS lang_total FROM d GROUP BY lang),
        |t AS (SELECT lang, lang_total,
        |             CAST(floor(least(1.0, 2.0 / sqrt(CAST(lang_total AS DOUBLE)))
        |                  * 1000000) AS BIGINT) AS thr
        |      FROM n)
        |SELECT d.doc_id, d.lang, t.lang_total, t.thr
        |FROM d JOIN t USING (lang)
        |WHERE CAST(('0x' || substr(md5('graft-temp' || '|' ||
        |        CAST(d.doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 1000000 < t.thr
        |ORDER BY doc_id""".stripMargin,

    "sample_temperature_rational" ->
      """WITH d AS (SELECT doc_id, lang FROM documents),
        |n AS (SELECT lang, count(*) AS lang_total FROM d GROUP BY lang),
        |params AS (SELECT * FROM (VALUES (1, 3), (1, 2), (2, 3)) AS p(ap, aq)),
        |thr AS (
        |  SELECT n.lang, n.lang_total, pr.ap, pr.aq, max(g.t) AS thr
        |  FROM n CROSS JOIN params pr
        |  JOIN generate_series(0, 1000000) AS g(t)
        |    ON (CASE WHEN pr.aq = 2 THEN CAST(g.t AS HUGEINT) * g.t
        |             ELSE CAST(g.t AS HUGEINT) * g.t * g.t END)
        |       * (CASE WHEN pr.aq - pr.ap = 1 THEN CAST(n.lang_total AS HUGEINT)
        |               ELSE CAST(n.lang_total AS HUGEINT) * n.lang_total END)
        |       <= (CASE WHEN pr.aq = 2 THEN CAST(2000000 AS HUGEINT) * 2000000
        |               ELSE CAST(2000000 AS HUGEINT) * 2000000 * 2000000 END)
        |  GROUP BY n.lang, n.lang_total, pr.ap, pr.aq)
        |SELECT t.ap AS alpha_p, t.aq AS alpha_q, d.doc_id, d.lang,
        |       t.lang_total, t.thr
        |FROM d JOIN thr t USING (lang)
        |WHERE CAST(('0x' || substr(md5('graft-temp-r' || '|' ||
        |        CAST(d.doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 1000000 < t.thr
        |ORDER BY t.aq, t.ap, d.doc_id""".stripMargin,

    "sample_hash_split" ->
      """SELECT doc_id, lang,
        |       CAST(('0x' || substr(md5('graft-split' || '|' || CAST(doc_id AS VARCHAR)), 1, 8))
        |            AS BIGINT) % 100 AS bucket,
        |       CASE WHEN CAST(('0x' || substr(md5('graft-split' || '|' || CAST(doc_id AS VARCHAR)), 1, 8))
        |                 AS BIGINT) % 100 < 80 THEN 'train'
        |            WHEN CAST(('0x' || substr(md5('graft-split' || '|' || CAST(doc_id AS VARCHAR)), 1, 8))
        |                 AS BIGINT) % 100 < 90 THEN 'valid'
        |            ELSE 'test' END AS split
        |FROM documents
        |ORDER BY doc_id""".stripMargin,

    "sample_stratified_hash" ->
      """WITH b AS (
        |  SELECT doc_id, lang,
        |         CAST(('0x' || substr(md5('graft-sample' || '|' || CAST(doc_id AS VARCHAR)), 1, 8))
        |              AS BIGINT) % 100 AS bucket,
        |         CASE WHEN lang = 'en' THEN 50 WHEN lang = 'zh' THEN 25 ELSE 100 END AS keep_pct
        |  FROM documents)
        |SELECT doc_id, lang, bucket, keep_pct
        |FROM b WHERE bucket < keep_pct
        |ORDER BY doc_id""".stripMargin,

    // k-NN graph: every vector's top-3 same-label neighbors by the
    // same index-sequential cosine fold as sim_cosine_topk
    "sim_knn_graph" ->
      """WITH en AS (
        |  SELECT vec_id, label,
        |         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
        |         list_reduce(list_prepend(0.0,
        |           list_transform(list_transform(embedding, x -> CAST(x AS DOUBLE)),
        |                          x -> x * x)), (a, b) -> a + b) AS nrm
        |  FROM embeddings),
        |pairs AS (
        |  SELECT a.vec_id AS src, b.vec_id AS dst,
        |         list_reduce(list_prepend(0.0,
        |           list_transform(b.v, (x, i) -> x * a.v[i])), (acc, y) -> acc + y)
        |           / (sqrt(a.nrm) * sqrt(b.nrm)) AS sim
        |  FROM en a JOIN en b ON a.label = b.label AND a.vec_id <> b.vec_id),
        |ranked AS (
        |  SELECT src, dst, sim,
        |         row_number() OVER (PARTITION BY src ORDER BY sim DESC, dst) AS rank
        |  FROM pairs)
        |SELECT src, rank, dst, sim FROM ranked WHERE rank <= 3
        |ORDER BY src, rank""".stripMargin,

    "sim_pairwise_threshold" ->
      """WITH en AS (
        |  SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
        |         list_reduce(list_prepend(0.0,
        |           list_transform(list_transform(embedding, x -> CAST(x AS DOUBLE)),
        |                          x -> x * x)), (a, b) -> a + b) AS nrm
        |  FROM embeddings)
        |SELECT label, a_id, b_id, sim FROM (
        |  SELECT a.label, a.vec_id AS a_id, b.vec_id AS b_id,
        |         list_reduce(list_prepend(0.0,
        |           list_transform(a.v, (x, i) -> x * b.v[i])), (p, q) -> p + q)
        |           / (sqrt(a.nrm) * sqrt(b.nrm)) AS sim
        |  FROM en a JOIN en b ON a.label = b.label AND a.vec_id < b.vec_id)
        |WHERE sim > 0.3
        |ORDER BY label, a_id, b_id""".stripMargin,

    "dedup_connected_components" ->
      """WITH RECURSIVE en AS (
        |  SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
        |         list_reduce(list_prepend(0.0,
        |           list_transform(list_transform(embedding, x -> CAST(x AS DOUBLE)),
        |                          x -> x * x)), (a, b) -> a + b) AS nrm
        |  FROM embeddings),
        |pairs AS (
        |  SELECT a_id, b_id FROM (
        |    SELECT a.vec_id AS a_id, b.vec_id AS b_id,
        |           list_reduce(list_prepend(0.0,
        |             list_transform(a.v, (x, i) -> x * b.v[i])), (p, q) -> p + q)
        |             / (sqrt(a.nrm) * sqrt(b.nrm)) AS sim
        |    FROM en a JOIN en b ON a.label = b.label AND a.vec_id < b.vec_id)
        |  WHERE sim > 0.3),
        |edges AS (
        |  SELECT a_id AS u, b_id AS v FROM pairs
        |  UNION ALL
        |  SELECT b_id, a_id FROM pairs),
        |walk(id, reach) AS (
        |  SELECT u, u FROM edges GROUP BY u
        |  UNION
        |  SELECT w.id, e.v FROM walk w JOIN edges e ON w.reach = e.u)
        |SELECT id, min(reach) AS component
        |FROM walk GROUP BY id ORDER BY id""".stripMargin,

    "text_tokenize_stats" ->
      """WITH tok AS (
        |  SELECT lang, unnest(string_split(
        |           lower(regexp_replace(trim(text), '\s+', ' ', 'g')), ' ')) AS token
        |  FROM documents),
        |c AS (SELECT lang, token, count(*) AS n FROM tok
        |      WHERE token NOT IN ('the','a','an','and','or','of','to','in','is','it')
        |        AND token <> ''
        |      GROUP BY 1, 2),
        |r AS (SELECT lang, token, n,
        |             row_number() OVER (PARTITION BY lang ORDER BY n DESC, token) AS rank
        |      FROM c)
        |SELECT lang, rank, token, n FROM r WHERE rank <= 5
        |ORDER BY lang, rank""".stripMargin,

    "text_tfidf_topterms" ->
      """WITH t AS (
        |  SELECT doc_id, unnest(string_split(
        |           lower(regexp_replace(trim(text), '\s+', ' ', 'g')), ' ')) AS term
        |  FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM t WHERE term <> '' GROUP BY 1, 2),
        |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |n AS (SELECT count(*) AS n_docs FROM documents)
        |SELECT doc_id, rank, term, tfidf FROM (
        |  SELECT tf.doc_id, tf.term,
        |         round(tf.tf * ln(CAST(n_docs AS DOUBLE) / CAST(df.df AS DOUBLE)), 6) AS tfidf,
        |         row_number() OVER (PARTITION BY tf.doc_id
        |           ORDER BY round(tf.tf * ln(CAST(n_docs AS DOUBLE) / CAST(df.df AS DOUBLE)), 6) DESC,
        |                    tf.term) AS rank
        |  FROM tf JOIN df USING (term) CROSS JOIN n)
        |WHERE rank <= 3
        |ORDER BY doc_id, rank""".stripMargin,

    "text_lang_partition_stats" ->
      """SELECT lang, source, count(*) AS n_docs,
        |       CAST(SUM(n_chars) AS DOUBLE) / count(*) AS avg_chars,
        |       count(CASE WHEN n_chars < 80 THEN 1 END) AS n_short,
        |       count(CASE WHEN n_chars >= 80 AND n_chars < 100 THEN 1 END) AS n_mid,
        |       count(CASE WHEN n_chars >= 100 THEN 1 END) AS n_long
        |FROM documents
        |GROUP BY lang, source
        |ORDER BY lang, source""".stripMargin,

    "multimodal_join" ->
      """SELECT doc_id, lang, source, n_chars, label,
        |       CAST(len(embedding) AS INT) AS dim, substring(text, 1, 20) AS text_prefix
        |FROM documents JOIN embeddings ON doc_id = vec_id
        |ORDER BY doc_id""".stripMargin,
  )

  private val streaming: Map[String, String] = Map(
    "stream_tumbling_counts" ->
      """SELECT time_bucket(INTERVAL 1 HOUR, ts) AS ws, event_type,
        |       count(*) AS n_events,
        |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY ws, event_type""".stripMargin,

    "stream_sliding_avg" ->
      """WITH expanded AS (
        |  SELECT time_bucket(INTERVAL 15 MINUTE, ts)
        |           - k * (INTERVAL 15 MINUTE) AS ws, value
        |  FROM events CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS k))
        |SELECT ws, count(*) AS n_events,
        |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
        |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_value
        |FROM expanded
        |GROUP BY ws
        |ORDER BY ws""".stripMargin,

    "stream_custom_state" ->
      """SELECT user_id, count(*) AS n_events,
        |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events
        |GROUP BY user_id
        |ORDER BY user_id""".stripMargin,

    "stream_session_windows" ->
      """WITH flagged AS (
        |  SELECT user_id, ts, value,
        |         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
        |                OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |                   > INTERVAL 30 MINUTE
        |              THEN 1 ELSE 0 END AS new_session
        |  FROM events),
        |numbered AS (
        |  SELECT user_id, ts, value,
        |         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
        |                                ROWS UNBOUNDED PRECEDING) AS session_id
        |  FROM flagged)
        |SELECT user_id, min(ts) AS session_start,
        |       max(ts) + INTERVAL 30 MINUTE AS session_end,
        |       count(*) AS n_events,
        |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM numbered
        |GROUP BY user_id, session_id
        |ORDER BY user_id, session_start""".stripMargin,
  )

  private val llm2: Map[String, String] = Map(
    // ops.Llm2.textFeatureHash: the house md5 bucket construction,
    // salt graft-fh, 64 buckets
    "text_feature_hash" ->
      """WITH t AS (
        |  SELECT doc_id,
        |         unnest(string_split(lower(regexp_replace(trim(text), '\s+', ' ', 'g')), ' ')) AS term
        |  FROM documents)
        |SELECT doc_id,
        |       CAST(('0x' || substr(md5('graft-fh' || '|' || term), 1, 8)) AS BIGINT) % 64 AS bucket,
        |       count(*) AS tf
        |FROM t WHERE term <> ''
        |GROUP BY 1, 2
        |ORDER BY doc_id, bucket""".stripMargin,

    "text_lang_id" ->
      """WITH t AS (
        |  SELECT doc_id,
        |         string_split(lower(regexp_replace(trim(text), '\s+', ' ', 'g')), ' ') AS toks,
        |         text
        |  FROM documents),
        |s AS (
        |  SELECT doc_id,
        |    CAST(len(list_filter(toks, x -> x IN ('der','die','und','ist','das','nicht','ein'))) AS INT) AS s_de,
        |    CAST(len(list_filter(toks, x -> x IN ('the','and','of','is','with','that','this'))) AS INT) AS s_en,
        |    CAST(len(list_filter(toks, x -> x IN ('el','la','de','que','y','los','una'))) AS INT) AS s_es,
        |    CAST(len(list_filter(toks, x -> x IN ('le','les','et','est','une','dans','pour'))) AS INT) AS s_fr,
        |    CAST(len(regexp_extract_all(text, '[一-鿿]')) AS INT) AS s_zh
        |  FROM t)
        |SELECT doc_id, s_de, s_en, s_es, s_fr, s_zh,
        |       CASE WHEN s_zh > 0 THEN 'zh'
        |            WHEN greatest(s_de, s_en, s_es, s_fr, s_zh) = 0 THEN 'und'
        |            WHEN s_de = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'de'
        |            WHEN s_en = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'en'
        |            WHEN s_es = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'es'
        |            ELSE 'fr' END AS pred_lang
        |FROM s
        |ORDER BY doc_id""".stripMargin,

    "text_quality_score" ->
      """WITH t AS (
        |  SELECT doc_id, text,
        |         string_split(lower(regexp_replace(trim(text), '\s+', ' ', 'g')), ' ') AS toks
        |  FROM documents),
        |c AS (
        |  SELECT doc_id,
        |         CAST(len(toks) AS INT) AS n_tokens,
        |         CAST(len(list_filter(toks,
        |           x -> x IN ('the','a','an','and','or','of','to','in','is','it'))) AS INT) AS n_stop,
        |         CAST(length(regexp_replace(text, ' ', '', 'g')) AS DOUBLE)
        |           / len(toks) AS avg_token_len,
        |         CAST(len(list_filter(toks,
        |           x -> x IN ('the','a','an','and','or','of','to','in','is','it'))) AS DOUBLE)
        |           / len(toks) AS stop_ratio,
        |         CAST(length(text) - length(regexp_replace(text, '[^a-z0-9 ]', '', 'g')) AS DOUBLE)
        |           / length(text) AS nonalnum_ratio
        |  FROM t)
        |SELECT doc_id, n_tokens, n_stop, avg_token_len, stop_ratio, nonalnum_ratio,
        |       round(least(CAST(n_tokens AS DOUBLE) / 20.0, 1.0) * 0.4
        |             + (1.0 - stop_ratio) * 0.3
        |             + (1.0 - nonalnum_ratio) * 0.3, 6) AS quality
        |FROM c
        |ORDER BY doc_id""".stripMargin,

    "text_token_count" ->
      """SELECT doc_id,
        |       CAST(len(regexp_split_to_array(trim(text), '\s+')) AS INT) AS ws_tokens,
        |       CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]')) AS INT) AS bpe_pieces,
        |       CAST(length(text) AS DOUBLE) / 4.0 AS est_llm_tokens
        |FROM documents
        |ORDER BY doc_id""".stripMargin,

    "text_repetition_stats" ->
      """WITH n AS (
        |  SELECT doc_id,
        |         regexp_split_to_array(lower(regexp_replace(trim(text), '\s+', ' ', 'g')), ' ') AS arr
        |  FROM documents),
        |tok AS (
        |  SELECT doc_id, unnest(arr) AS tok,
        |         unnest(generate_series(1, len(arr))) AS pos
        |  FROM n),
        |bi AS (
        |  SELECT doc_id,
        |         tok || ' ' || lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS bigram,
        |         lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt
        |  FROM tok),
        |bs AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
        |         CAST(count(DISTINCT bigram) AS BIGINT) AS n_distinct_bigrams
        |  FROM bi WHERE nxt IS NOT NULL GROUP BY doc_id),
        |tc AS (
        |  SELECT doc_id, tok, count(*) AS c FROM tok GROUP BY doc_id, tok),
        |ts AS (
        |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
        |         CAST(count(*) AS BIGINT) AS n_distinct_tokens,
        |         CAST(max(c) AS BIGINT) AS max_tok_freq
        |  FROM tc GROUP BY doc_id)
        |SELECT ts.doc_id, n_tokens, n_distinct_tokens, max_tok_freq,
        |       round(1.0 - CAST(n_distinct_bigrams AS DOUBLE) / CAST(n_bigrams AS DOUBLE), 6)
        |         AS dup_bigram_frac
        |FROM ts LEFT JOIN bs ON ts.doc_id = bs.doc_id
        |ORDER BY ts.doc_id""".stripMargin,

    "pack_sequences" ->
      """WITH t AS (
        |  SELECT doc_id,
        |         CASE WHEN trim(text) = '' THEN 0
        |              ELSE CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
        |         END AS n
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, n, CAST(sum(n) OVER (ORDER BY doc_id) AS BIGINT) AS c_end
        |  FROM t WHERE n > 0),
        |s AS (
        |  SELECT doc_id, c_end, c_end - n AS c_start FROM c),
        |p AS (
        |  SELECT doc_id, c_start, c_end,
        |         unnest(generate_series(c_start // 512, (c_end - 1) // 512)) AS pack_id
        |  FROM s)
        |SELECT pack_id, doc_id,
        |       GREATEST(c_start, pack_id * 512) - c_start AS tok_start,
        |       LEAST(c_end, (pack_id + 1) * 512) - GREATEST(c_start, pack_id * 512) AS n_toks
        |FROM p
        |ORDER BY pack_id, doc_id""".stripMargin,

    "text_fingerprint" ->
      """WITH n AS (
        |  SELECT doc_id, lower(regexp_replace(trim(text), '\s+', ' ', 'g')) AS norm
        |  FROM documents)
        |SELECT doc_id,
        |       list_reduce(list_prepend(CAST(0 AS BIGINT),
        |         list_transform(generate_series(1, length(norm)),
        |           i -> CAST(ascii(substring(norm, i, 1)) AS BIGINT))),
        |         (h, c) -> (h * 31 + c) % 1000000007) AS fingerprint,
        |       CAST(length(norm) AS INT) AS n_chars_norm
        |FROM n
        |ORDER BY doc_id""".stripMargin,

    "dedup_ngram_jaccard" ->
      """WITH d AS (
        |  SELECT doc_id, lang,
        |         list_distinct(list_transform(generate_series(1, len(toks) - 1),
        |           i -> toks[i] || ' ' || toks[i + 1])) AS grams
        |  FROM (SELECT doc_id, lang,
        |          string_split(lower(regexp_replace(trim(text), '\s+', ' ', 'g')), ' ') AS toks
        |        FROM documents)
        |  WHERE len(toks) >= 2)
        |SELECT a.lang, a.doc_id AS a_id, b.doc_id AS b_id,
        |       CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
        |         / len(list_distinct(a.grams || b.grams)) AS jaccard
        |FROM d a JOIN d b ON a.lang = b.lang AND a.doc_id < b.doc_id
        |WHERE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
        |        / len(list_distinct(a.grams || b.grams)) >= 0.5
        |ORDER BY a.lang, a_id, b_id""".stripMargin,

    "multimodal_binary_meta" ->
      """SELECT doc_id,
        |       CAST(octet_length(encode(text)) AS INT) AS n_bytes,
        |       md5(text) AS digest
        |FROM documents
        |ORDER BY doc_id""".stripMargin,
  )

  /** Round-6 curation / scale-pattern keys (ops.Curation). The two
    * "scale lever" keys (bloom semi, salted join) deliberately oracle
    * against the PLAIN formulation — the lever must be row-invisible.
    */
  private val curation: Map[String, String] = Map(
    "decontaminate_ngram" ->
      """WITH t AS (
        |  SELECT doc_id,
        |         string_split(lower(regexp_replace(trim(text), '\s+', ' ', 'g')), ' ') AS toks
        |  FROM documents),
        |g AS (
        |  SELECT doc_id,
        |         unnest(list_distinct(list_transform(generate_series(1, len(toks) - 3),
        |           i -> array_to_string(toks[i:i+3], ' ')))) AS gram
        |  FROM t WHERE len(toks) >= 4),
        |ev AS (SELECT DISTINCT gram FROM g WHERE doc_id % 20 = 0)
        |SELECT g.doc_id, count(DISTINCT g.gram) AS n_shared_grams
        |FROM g JOIN ev USING (gram)
        |WHERE g.doc_id % 20 <> 0
        |GROUP BY g.doc_id
        |ORDER BY g.doc_id""".stripMargin,

    "dedup_ngram_containment" ->
      """WITH d AS (
        |  SELECT doc_id, lang,
        |         list_distinct(list_transform(generate_series(1, len(toks) - 1),
        |           i -> toks[i] || ' ' || toks[i + 1])) AS grams
        |  FROM (SELECT doc_id, lang,
        |          string_split(lower(regexp_replace(trim(text), '\s+', ' ', 'g')), ' ') AS toks
        |        FROM documents)
        |  WHERE len(toks) >= 2)
        |SELECT a.lang, a.doc_id AS a_id, b.doc_id AS b_id,
        |       CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
        |         / least(len(a.grams), len(b.grams)) AS containment
        |FROM d a JOIN d b ON a.lang = b.lang AND a.doc_id < b.doc_id
        |WHERE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
        |        / least(len(a.grams), len(b.grams)) >= 0.8
        |ORDER BY a.lang, a_id, b_id""".stripMargin,

    "sample_domain_cap" ->
      """SELECT source, rk, doc_id
        |FROM (SELECT source, doc_id,
        |             row_number() OVER (
        |               PARTITION BY source
        |               ORDER BY md5('graft-domaincap' || '|' || CAST(doc_id AS VARCHAR)),
        |                        doc_id) AS rk
        |      FROM documents)
        |WHERE rk <= 10
        |ORDER BY source, rk""".stripMargin,

    "dim_scd2_history" ->
      """SELECT user_id,
        |       row_number() OVER w AS version,
        |       ts AS valid_from,
        |       lead(ts, 1) OVER w AS valid_to,
        |       value,
        |       lead(ts, 1) OVER w IS NULL AS is_current
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY user_id, version""".stripMargin,

    "join_bloom_semi" ->
      """SELECT l_returnflag, count(*) AS n_items,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |WHERE l_orderkey IN (SELECT o_orderkey FROM orders
        |                     WHERE o_orderpriority = '1-URGENT')
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    "join_skew_salted" ->
      """SELECT o_orderpriority, count(*) AS n_items,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |                 * CAST(1.0 - l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "win_ntile_percent_rank" ->
      """SELECT o_orderkey, o_orderpriority, o_totalprice,
        |       ntile(4) OVER w AS quartile,
        |       percent_rank() OVER w AS pct_rank,
        |       cume_dist() OVER w AS cum_dist
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority
        |             ORDER BY o_totalprice ASC, o_orderkey ASC)
        |ORDER BY o_orderpriority, o_totalprice, o_orderkey""".stripMargin,

    "agg_histogram_bins" ->
      """SELECT bin, CAST(bin * 50000.0 AS DOUBLE) AS bin_lo,
        |       count(*) AS n,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_total
        |FROM (SELECT CAST(floor(o_totalprice / 50000.0) AS INT) AS bin, o_totalprice
        |      FROM orders)
        |GROUP BY bin
        |ORDER BY bin""".stripMargin,

    "agg_mode_median" ->
      """WITH counts AS (
        |  SELECT l_returnflag, l_quantity, count(*) AS c
        |  FROM lineitem GROUP BY 1, 2),
        |md AS (
        |  SELECT l_returnflag, l_quantity AS mode_qty, c AS mode_n
        |  FROM (SELECT counts.*, row_number() OVER (PARTITION BY l_returnflag
        |            ORDER BY c DESC, l_quantity ASC) AS rn FROM counts)
        |  WHERE rn = 1),
        |med AS (
        |  SELECT l_returnflag, round(median(l_quantity), 6) AS median_qty,
        |         count(*) AS n
        |  FROM lineitem GROUP BY 1)
        |SELECT med.l_returnflag, median_qty, mode_qty, mode_n, n
        |FROM med JOIN md USING (l_returnflag)
        |ORDER BY l_returnflag""".stripMargin,

    "text_unigram_logprob" ->
      """WITH tok AS (
        |  SELECT doc_id,
        |         unnest(string_split(lower(regexp_replace(trim(text), '\s+', ' ', 'g')), ' ')) AS tok
        |  FROM documents),
        |tok2 AS (SELECT doc_id, tok FROM tok WHERE tok <> ''),
        |freq AS (SELECT tok, count(*) AS c FROM tok2 GROUP BY tok),
        |total AS (SELECT SUM(c) AS n_total FROM freq)
        |SELECT doc_id, count(*) AS n_toks,
        |       round(CAST(SUM(CAST(round(-ln(CAST(c AS DOUBLE) / CAST(n_total AS DOUBLE)), 6)
        |                          AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6) AS avg_nll
        |FROM tok2 JOIN freq USING (tok) CROSS JOIN total
        |GROUP BY doc_id
        |ORDER BY doc_id""".stripMargin,

    "text_perplexity_bucket" ->
      """WITH tok AS (
        |  SELECT doc_id,
        |         unnest(string_split(lower(regexp_replace(trim(text), '\s+', ' ', 'g')), ' ')) AS tok
        |  FROM documents),
        |tok2 AS (SELECT doc_id, tok FROM tok WHERE tok <> ''),
        |freq AS (SELECT tok, count(*) AS c FROM tok2 GROUP BY tok),
        |total AS (SELECT SUM(c) AS n_total FROM freq),
        |per AS (
        |  SELECT doc_id, count(*) AS n_toks,
        |         round(CAST(SUM(CAST(round(-ln(CAST(c AS DOUBLE) / CAST(n_total AS DOUBLE)), 6)
        |                            AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6) AS avg_nll
        |  FROM tok2 JOIN freq USING (tok) CROSS JOIN total
        |  GROUP BY doc_id)
        |SELECT doc_id, n_toks, avg_nll,
        |       CASE WHEN avg_nll < 3.40 THEN 'head'
        |            WHEN avg_nll < 3.41 THEN 'middle'
        |            ELSE 'tail' END AS ppl_band
        |FROM per
        |ORDER BY doc_id""".stripMargin,

    "sql_recursive_cte" ->
      """WITH RECURSIVE months(m) AS (
        |  SELECT DATE '1995-01-01'
        |  UNION ALL
        |  SELECT CAST(m + INTERVAL 1 MONTH AS DATE) FROM months
        |  WHERE m < DATE '1995-12-01'
        |)
        |SELECT m, count(o_orderkey) AS n_orders
        |FROM months
        |LEFT JOIN orders ON CAST(date_trunc('month', o_orderdate) AS DATE) = m
        |GROUP BY m
        |ORDER BY m""".stripMargin,
  )

  /** Round-6 stats/layout/chunking keys. The zorder16 oracle expression
    * is generated programmatically — the same 32-term bit interleave
    * the Spark expression computes, spelled in portable SQL integer
    * ops.
    */
  private val zorderSqlExpr: String =
    (0 until 16).flatMap { i =>
      Seq(s"((((l_partkey & 65535) >> $i) & 1) << ${2 * i})",
        s"((((l_suppkey & 65535) >> $i) & 1) << ${2 * i + 1})")
    }.mkString(" | ")

  private val statsLayout: Map[String, String] = Map(
    // ops.Stats.statWinsorize: nearest-rank order statistics by
    // explicit integer index (engine-independent, unlike interpolating
    // percentile()), decimal clamp+sum, one double cast at the end
    "stat_winsorize" ->
      """WITH c AS (
        |  SELECT c_mktsegment AS segment,
        |         CAST(c_acctbal AS DECIMAL(18,2)) AS bal, c_custkey
        |  FROM customer),
        |r AS (
        |  SELECT segment, bal,
        |         row_number() OVER (PARTITION BY segment ORDER BY bal, c_custkey) AS rn,
        |         count(*) OVER (PARTITION BY segment) AS n
        |  FROM c),
        |b AS (
        |  SELECT segment, max(n) AS n,
        |         max(CASE WHEN rn = (n - 1) * 5 // 100 + 1 THEN bal END) AS lo,
        |         max(CASE WHEN rn = (n - 1) * 95 // 100 + 1 THEN bal END) AS hi
        |  FROM r GROUP BY segment)
        |SELECT r.segment, b.n,
        |       CAST(b.lo AS DOUBLE) AS lo, CAST(b.hi AS DOUBLE) AS hi,
        |       CAST(SUM(CASE WHEN r.bal < b.lo THEN b.lo
        |                WHEN r.bal > b.hi THEN b.hi ELSE r.bal END) AS DOUBLE) / b.n AS winsor_mean,
        |       count(CASE WHEN r.bal < b.lo THEN 1 END) AS n_clip_lo,
        |       count(CASE WHEN r.bal > b.hi THEN 1 END) AS n_clip_hi
        |FROM r JOIN b USING (segment)
        |GROUP BY r.segment, b.n, b.lo, b.hi
        |ORDER BY r.segment""".stripMargin,
    // decimal-exact base sums -> identical IEEE closed-form both
    // engines (see ops/Stats.scala statLinregGroup)
    "stat_linreg_group" ->
      """WITH base AS (
        |  SELECT l_returnflag,
        |         count(*) AS n,
        |         CAST(sum(CAST(l_quantity AS DECIMAL(18,0))) AS DOUBLE) AS sx,
        |         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
        |         CAST(sum(CAST(l_quantity AS DECIMAL(18,0)) *
        |                  CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy,
        |         CAST(sum(CAST(l_quantity AS DECIMAL(18,0)) *
        |                  CAST(l_quantity AS DECIMAL(18,0))) AS DOUBLE) AS sxx
        |  FROM lineitem GROUP BY l_returnflag),
        |sl AS (
        |  SELECT l_returnflag, n, sx, sy,
        |         (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope
        |  FROM base)
        |SELECT l_returnflag, n, slope,
        |       (sy - slope * sx) / n AS intercept
        |FROM sl ORDER BY l_returnflag""".stripMargin,

    "catalog_column_stats" -> {
      val arms = Seq(
        ("o_orderkey", "o_orderkey"),
        ("o_custkey", "o_custkey"),
        ("o_orderstatus", "o_orderstatus"),
        ("o_orderpriority", "o_orderpriority"),
        ("o_totalprice", "CAST(o_totalprice AS DECIMAL(18,2))"),
        ("o_orderdate", "CAST(o_orderdate AS DATE)"))
        .map { case (n, e) =>
          s"""SELECT '$n' AS column_name, count(*) AS n_rows,
             |       count($e) AS n_nonnull, count(DISTINCT $e) AS n_distinct,
             |       CAST(min($e) AS VARCHAR) AS min_val,
             |       CAST(max($e) AS VARCHAR) AS max_val
             |FROM orders""".stripMargin
        }
      arms.mkString("", "\nUNION ALL\n", "\nORDER BY column_name")
    },

    "layout_zorder_key" ->
      s"""SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
         |       $zorderSqlExpr AS zval
         |FROM lineitem
         |ORDER BY zval NULLS LAST, l_orderkey NULLS LAST, l_linenumber NULLS LAST""".stripMargin,

    // ops.Layout.layoutHilbertKey: the 16 rotate/reflect rounds
    // replayed as the HilbertSql CTE chain — pure nonnegative
    // integer arithmetic, bit-exact vs the codegen loop.
    "layout_hilbert_key" ->
      s"""WITH ${HilbertSql.chain("h",
            "SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, " +
              "l_partkey % 65536 AS x, l_suppkey % 65536 AS y, " +
              "CAST(0 AS BIGINT) AS d FROM lineitem",
            "l_orderkey, l_linenumber, l_partkey, l_suppkey")}
         |SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
         |       CAST(d AS BIGINT) AS hval
         |FROM h0
         |ORDER BY hval NULLS LAST, l_orderkey NULLS LAST, l_linenumber NULLS LAST""".stripMargin,

    "text_chunk_overlap" ->
      """WITH t AS (
        |  SELECT doc_id,
        |         string_split(regexp_replace(trim(text), '\s+', ' ', 'g'), ' ') AS toks
        |  FROM documents WHERE trim(text) <> ''),
        |c AS (
        |  SELECT doc_id, CAST(gs AS INT) AS strt, toks
        |  FROM t, unnest(generate_series(0, CAST(len(toks) AS BIGINT) - 1, 24)) AS g(gs))
        |SELECT doc_id, strt // 24 AS chunk_id,
        |       len(toks[strt + 1 : strt + 32]) AS n_toks,
        |       array_to_string(toks[strt + 1 : strt + 32], ' ') AS chunk_text
        |FROM c
        |ORDER BY doc_id, chunk_id""".stripMargin,
  )

  private val analytics: Map[String, String] = Map(
    "events_attribution" ->
      """WITH e AS (
        |  SELECT user_id, ts, event_id,
        |         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS kind
        |  FROM events WHERE event_type IN ('click', 'purchase')),
        |c AS (
        |  SELECT user_id, ts, event_id, kind,
        |         last_value(CASE WHEN kind = 0 THEN event_id END IGNORE NULLS)
        |           OVER w AS click_id,
        |         last_value(CASE WHEN kind = 0 THEN ts END IGNORE NULLS)
        |           OVER w AS click_ts
        |  FROM e
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, kind, event_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT event_id AS purchase_id, user_id, ts AS purchase_ts,
        |       click_id, click_ts
        |FROM c
        |WHERE kind = 1 AND click_ts IS NOT NULL
        |  AND click_ts >= ts - INTERVAL 7 DAY
        |ORDER BY purchase_id""".stripMargin,

    "agg_weighted_median" ->
      """WITH t AS (
        |  SELECT l_returnflag,
        |         CAST(l_extendedprice AS DECIMAL(18,2)) AS price,
        |         CAST(l_quantity AS DECIMAL(18,2)) AS qty
        |  FROM lineitem),
        |c AS (
        |  SELECT l_returnflag, price,
        |         sum(qty) OVER (PARTITION BY l_returnflag ORDER BY price) AS cum,
        |         sum(qty) OVER (PARTITION BY l_returnflag) AS tot
        |  FROM t)
        |SELECT l_returnflag, CAST(min(price) AS DOUBLE) AS weighted_median
        |FROM c WHERE cum * 2 >= tot
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    "agg_skew_kurtosis" ->
      """WITH s AS (
        |  SELECT event_type, count(*) AS n,
        |         CAST(sum(h) AS DOUBLE) AS s1,
        |         CAST(sum(h*h) AS DOUBLE) AS s2,
        |         CAST(sum(h*h*h) AS DOUBLE) AS s3,
        |         CAST(sum(h*h*h*h) AS DOUBLE) AS s4
        |  FROM (SELECT event_type,
        |               CAST(CAST(value AS DECIMAL(18,2)) * 100 AS HUGEINT) AS h
        |        FROM events)
        |  GROUP BY event_type),
        |m AS (
        |  SELECT event_type, n, s1 / n AS mean,
        |         (s2 - s1 * s1 / n) / n AS m2,
        |         (s3 - 3.0 * (s1 / n) * s2 + 2.0 * (s1 / n) * (s1 / n) * s1) / n AS m3,
        |         (s4 - 4.0 * (s1 / n) * s3 + 6.0 * (s1 / n) * (s1 / n) * s2
        |             - 3.0 * (s1 / n) * (s1 / n) * (s1 / n) * s1) / n AS m4
        |  FROM s)
        |SELECT event_type, n,
        |       round(m3 / (m2 * sqrt(m2)), 6) AS skewness,
        |       round(m4 / (m2 * m2) - 3.0, 6) AS kurtosis_excess
        |FROM m
        |WHERE NOT isnan(m2) AND m2 > 0
        |ORDER BY event_type""".stripMargin,

    "agg_bitmap_distinct" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_users
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,

    "anomaly_mad" ->
      """WITH e AS (
        |  SELECT event_id, event_type, CAST(value AS DECIMAL(18,2)) AS v
        |  FROM events),
        |c AS (
        |  SELECT event_type, v,
        |         sum(1) OVER (PARTITION BY event_type ORDER BY v) AS cum,
        |         count(*) OVER (PARTITION BY event_type) AS tot
        |  FROM e),
        |med AS (
        |  SELECT event_type, min(v) AS med
        |  FROM c WHERE cum * 2 >= tot GROUP BY event_type),
        |d AS (
        |  SELECT e.event_id, e.event_type, e.v, abs(e.v - med.med) AS dev
        |  FROM e JOIN med USING (event_type)),
        |c2 AS (
        |  SELECT event_type, dev,
        |         sum(1) OVER (PARTITION BY event_type ORDER BY dev) AS cum,
        |         count(*) OVER (PARTITION BY event_type) AS tot
        |  FROM d),
        |mad AS (
        |  SELECT event_type, min(dev) AS mad
        |  FROM c2 WHERE cum * 2 >= tot GROUP BY event_type)
        |SELECT d.event_id, d.event_type, CAST(d.v AS DOUBLE) AS value,
        |       round(CAST(d.dev AS DOUBLE) / CAST(mad.mad AS DOUBLE), 4) AS dev_ratio
        |FROM d JOIN mad USING (event_type)
        |WHERE mad.mad > 0
        |  AND CAST(d.dev AS DOUBLE) > 4.4478 * CAST(mad.mad AS DOUBLE)
        |ORDER BY event_id""".stripMargin,

    "sql_lateral_join" ->
      """SELECT c.c_custkey, c.c_mktsegment, t.o_orderkey,
        |       CAST(t.o_totalprice AS DOUBLE) AS price
        |FROM customer c,
        |     LATERAL (SELECT o_orderkey, o_totalprice
        |              FROM orders o
        |              WHERE o.o_custkey = c.c_custkey
        |              ORDER BY o_totalprice DESC, o_orderkey
        |              LIMIT 2) t
        |ORDER BY c_custkey, o_orderkey""".stripMargin,

    "anomaly_zscore" ->
      """WITH s AS (
        |  SELECT event_type, count(*) AS n,
        |         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sv,
        |         CAST(sum(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2)))
        |              AS DOUBLE) AS sv2
        |  FROM events GROUP BY event_type),
        |m AS (
        |  SELECT event_type, sv / n AS mean,
        |         sqrt((sv2 - sv * sv / n) / (n - 1)) AS std
        |  FROM s)
        |SELECT e.event_id, e.event_type, e.value,
        |       round((e.value - m.mean) / m.std, 4) AS z
        |FROM events e JOIN m USING (event_type)
        |WHERE NOT isnan(m.std) AND m.std > 0
        |  AND abs((e.value - m.mean) / m.std) > 3.0
        |ORDER BY event_id""".stripMargin,

    "time_series_interpolate" ->
      """WITH h AS (
        |  SELECT event_type, date_trunc('hour', ts) AS hr,
        |         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS v
        |  FROM events GROUP BY 1, 2),
        |b AS (SELECT event_type, min(hr) AS lo, max(hr) AS hi FROM h GROUP BY 1),
        |sp AS (
        |  SELECT b.event_type, CAST(g.gs AS TIMESTAMP) AS hr
        |  FROM b, unnest(generate_series(b.lo, b.hi, INTERVAL 1 HOUR)) AS g(gs)),
        |j AS (
        |  SELECT sp.event_type, sp.hr, h.v,
        |         last_value(h.v IGNORE NULLS) OVER wp AS pv,
        |         last_value(CASE WHEN h.v IS NOT NULL THEN sp.hr END IGNORE NULLS)
        |           OVER wp AS pt,
        |         first_value(h.v IGNORE NULLS) OVER wn AS nv,
        |         first_value(CASE WHEN h.v IS NOT NULL THEN sp.hr END IGNORE NULLS)
        |           OVER wn AS nt
        |  FROM sp LEFT JOIN h ON sp.event_type = h.event_type AND sp.hr = h.hr
        |  WINDOW wp AS (PARTITION BY sp.event_type ORDER BY sp.hr
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |         wn AS (PARTITION BY sp.event_type ORDER BY sp.hr
        |                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        |SELECT event_type, hr,
        |       round(CASE WHEN v IS NOT NULL THEN v
        |                  ELSE pv + (nv - pv) *
        |                       CAST(epoch(hr) - epoch(pt) AS DOUBLE) /
        |                       CAST(epoch(nt) - epoch(pt) AS DOUBLE) END, 9) AS val,
        |       v IS NULL AS filled
        |FROM j
        |ORDER BY event_type, hr""".stripMargin,

    "join_scd2_pointintime" ->
      """WITH v AS (
        |  SELECT user_id, ts AS valid_from, value,
        |         row_number() OVER w AS version,
        |         lead(ts) OVER w AS valid_to
        |  FROM events WHERE event_id % 10 <> 0
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |p AS (
        |  SELECT event_id AS probe_id, user_id, ts AS probe_ts
        |  FROM events WHERE event_id % 10 = 0)
        |SELECT p.probe_id, p.user_id, p.probe_ts, v.version,
        |       v.value AS dim_value
        |FROM p JOIN v ON p.user_id = v.user_id
        |  AND v.valid_from <= p.probe_ts
        |  AND (v.valid_to IS NULL OR p.probe_ts < v.valid_to)
        |ORDER BY probe_id""".stripMargin,

    "agg_quantiles_bucketed" ->
      """WITH t AS (
        |  SELECT l_returnflag, CAST(l_extendedprice AS DECIMAL(18,2)) AS price
        |  FROM lineitem),
        |c AS (
        |  SELECT l_returnflag, price,
        |         sum(1) OVER (PARTITION BY l_returnflag ORDER BY price) AS cum,
        |         count(*) OVER (PARTITION BY l_returnflag) AS tot
        |  FROM t),
        |qq AS (SELECT unnest([25, 50, 75, 90]) AS q)
        |SELECT c.l_returnflag, qq.q, CAST(min(c.price) AS DOUBLE) AS quantile_val
        |FROM c, qq WHERE c.cum * 100 >= qq.q * c.tot
        |GROUP BY c.l_returnflag, qq.q
        |ORDER BY l_returnflag, q""".stripMargin,

    "dedup_substring_span" ->
      """WITH t AS (
        |  SELECT doc_id, lang,
        |         string_split(regexp_replace(trim(text), '\s+', ' ', 'g'), ' ') AS toks
        |  FROM documents WHERE trim(text) <> ''),
        |g AS (
        |  SELECT doc_id, lang, CAST(u.gs AS INT) AS pos,
        |         array_to_string(toks[CAST(u.gs AS INT) + 1 : CAST(u.gs AS INT) + 3], ' ') AS gram
        |  FROM t, unnest(generate_series(0, CAST(len(toks) AS BIGINT) - 3)) AS u(gs)
        |  WHERE len(toks) >= 3),
        |p AS (
        |  SELECT a.lang, a.doc_id AS a_id, b.doc_id AS b_id,
        |         a.pos AS a_pos, a.pos - b.pos AS diag
        |  FROM g a JOIN g b
        |    ON a.lang = b.lang AND a.gram = b.gram AND a.doc_id < b.doc_id),
        |i AS (
        |  SELECT lang, a_id, b_id, diag, a_pos,
        |         a_pos - row_number() OVER (PARTITION BY a_id, b_id, diag
        |                                    ORDER BY a_pos) AS isl
        |  FROM p),
        |r AS (
        |  SELECT lang, a_id, b_id, diag, min(a_pos) AS a_start, count(*) AS run
        |  FROM i GROUP BY lang, a_id, b_id, diag, isl)
        |SELECT lang, a_id, b_id, a_start, a_start - diag AS b_start,
        |       run + 2 AS span_toks
        |FROM r WHERE run >= 2
        |ORDER BY lang, a_id, b_id, a_start, b_start, span_toks""".stripMargin,

    "dedup_substring_remove" ->
      """WITH t AS (
        |  SELECT doc_id, lang,
        |         string_split(regexp_replace(trim(text), '\s+', ' ', 'g'), ' ') AS toks
        |  FROM documents WHERE trim(text) <> ''),
        |g AS (
        |  SELECT doc_id, lang, CAST(u.gs AS INT) AS pos,
        |         array_to_string(toks[CAST(u.gs AS INT) + 1 : CAST(u.gs AS INT) + 3], ' ') AS gram
        |  FROM t, unnest(generate_series(0, CAST(len(toks) AS BIGINT) - 3)) AS u(gs)
        |  WHERE len(toks) >= 3),
        |p AS (
        |  SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |         a.pos AS a_pos, a.pos - b.pos AS diag
        |  FROM g a JOIN g b
        |    ON a.lang = b.lang AND a.gram = b.gram AND a.doc_id < b.doc_id),
        |i AS (
        |  SELECT a_id, b_id, diag, a_pos,
        |         a_pos - row_number() OVER (PARTITION BY a_id, b_id, diag
        |                                    ORDER BY a_pos) AS isl
        |  FROM p),
        |r AS (
        |  SELECT a_id, b_id, diag, min(a_pos) AS a_start, count(*) AS run
        |  FROM i GROUP BY a_id, b_id, diag, isl),
        |iv AS (
        |  SELECT DISTINCT b_id AS doc_id, CAST(a_start - diag AS INT) AS lo,
        |         CAST(a_start - diag + run + 2 AS INT) AS hi
        |  FROM r WHERE run >= 2),
        |m1 AS (
        |  SELECT doc_id, lo, hi,
        |         max(hi) OVER (PARTITION BY doc_id ORDER BY lo, hi
        |                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_hi
        |  FROM iv),
        |m2 AS (
        |  SELECT doc_id, lo, hi,
        |         sum(CASE WHEN prev_hi IS NULL OR lo > prev_hi THEN 1 ELSE 0 END)
        |           OVER (PARTITION BY doc_id ORDER BY lo, hi
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cut_isl
        |  FROM m1),
        |mg AS (
        |  SELECT doc_id, cut_isl, min(lo) AS lo, max(hi) AS hi
        |  FROM m2 GROUP BY doc_id, cut_isl),
        |cuts AS (
        |  SELECT doc_id, count(*) AS n_spans_cut,
        |         CAST(sum(hi - lo) AS BIGINT) AS toks_removed
        |  FROM mg GROUP BY doc_id),
        |tok AS (
        |  SELECT doc_id, CAST(u.gs AS INT) AS pos, toks[CAST(u.gs AS INT) + 1] AS tok
        |  FROM t, unnest(generate_series(0, CAST(len(toks) AS BIGINT) - 1)) AS u(gs)),
        |kept AS (
        |  SELECT tk.doc_id, tk.pos, tk.tok
        |  FROM tok tk
        |  WHERE NOT EXISTS (SELECT 1 FROM mg
        |                    WHERE mg.doc_id = tk.doc_id
        |                      AND tk.pos >= mg.lo AND tk.pos < mg.hi)),
        |rebuilt AS (
        |  SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS clean_text
        |  FROM kept GROUP BY doc_id)
        |SELECT t.doc_id, t.lang, coalesce(rb.clean_text, '') AS clean_text,
        |       coalesce(c.n_spans_cut, 0) AS n_spans_cut,
        |       coalesce(c.toks_removed, 0) AS toks_removed
        |FROM t
        |LEFT JOIN rebuilt rb ON rb.doc_id = t.doc_id
        |LEFT JOIN cuts c ON c.doc_id = t.doc_id
        |ORDER BY t.doc_id""".stripMargin,

    "text_gopher_rules" ->
      """WITH t AS (
        |  SELECT doc_id,
        |         string_split(regexp_replace(trim(text), '\s+', ' ', 'g'), ' ') AS toks,
        |         length(regexp_replace(trim(text), '\s+', '', 'g')) AS charlen
        |  FROM documents WHERE trim(text) <> ''),
        |m AS (
        |  SELECT doc_id, CAST(len(toks) AS INT) AS n_words,
        |         CAST(charlen AS DOUBLE) / len(toks) AS mean_word_len,
        |         len(list_filter(toks, w -> regexp_matches(w, '[a-z]'))) AS n_alpha,
        |         len(list_intersect(toks,
        |             ['the', 'a', 'of', 'and', 'to', 'in', 'is', 'that'])) AS n_stop
        |  FROM t)
        |SELECT doc_id, n_words, mean_word_len,
        |       n_words >= 15 AS rule_wordcount,
        |       mean_word_len >= 4.0 AND mean_word_len <= 10.0 AS rule_wordlen,
        |       n_alpha * 5 >= n_words * 4 AS rule_alpha,
        |       n_stop >= 2 AS rule_stopwords,
        |       (n_words >= 15 AND mean_word_len >= 4.0 AND mean_word_len <= 10.0
        |        AND n_alpha * 5 >= n_words * 4 AND n_stop >= 2) AS pass
        |FROM m
        |ORDER BY doc_id""".stripMargin,

    "text_bpe_pairs" ->
      """WITH w AS (
        |  SELECT unnest(string_split(regexp_replace(trim(text), '\s+', ' ', 'g'), ' ')) AS w
        |  FROM documents WHERE trim(text) <> ''),
        |p AS (
        |  SELECT substr(w, CAST(u.gs AS INT), 2) AS pair
        |  FROM w, unnest(generate_series(1, CAST(len(w) AS BIGINT) - 1)) AS u(gs)
        |  WHERE len(w) >= 2)
        |SELECT pair, count(*) AS cnt
        |FROM p GROUP BY pair
        |ORDER BY cnt DESC, pair
        |LIMIT 50""".stripMargin,

    "events_path_analysis" ->
      """WITH t AS (
        |  SELECT event_type AS step1,
        |         lead(event_type, 1) OVER w AS step2,
        |         lead(event_type, 2) OVER w AS step3
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT step1, step2, step3, count(*) AS cnt
        |FROM t WHERE step3 IS NOT NULL
        |GROUP BY step1, step2, step3
        |ORDER BY cnt DESC, step1, step2, step3
        |LIMIT 20""".stripMargin,

    "events_markov_transition" ->
      """WITH t AS (
        |  SELECT event_type AS cur_type, lead(event_type, 1) OVER w AS next_type
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |c AS (
        |  SELECT cur_type, next_type, count(*) AS cnt
        |  FROM t WHERE next_type IS NOT NULL
        |  GROUP BY cur_type, next_type)
        |SELECT cur_type, next_type, cnt,
        |       (cnt * 1000000) // CAST(sum(cnt) OVER (PARTITION BY cur_type) AS BIGINT) AS p_ppm
        |FROM c
        |ORDER BY cur_type, next_type""".stripMargin,

    "win_ewma_user" ->
      """SELECT user_id, CAST(len(seq) AS INT) AS n_events,
        |       list_reduce(seq, (e, v) -> 0.25 * v + 0.75 * e) AS ewma
        |FROM (
        |  SELECT user_id, list(value ORDER BY ts, event_id, value) AS seq
        |  FROM events GROUP BY user_id)
        |ORDER BY user_id""".stripMargin,

    "sample_quality_weighted" ->
      """WITH t AS (
        |  SELECT doc_id,
        |         string_split(regexp_replace(trim(text), '\s+', ' ', 'g'), ' ') AS toks,
        |         length(regexp_replace(trim(text), '\s+', '', 'g')) AS charlen
        |  FROM documents WHERE trim(text) <> ''),
        |m AS (
        |  SELECT doc_id, len(toks) AS n,
        |         CAST(charlen AS DOUBLE) / len(toks) AS mwl,
        |         len(list_filter(toks, w -> regexp_matches(w, '[a-z]'))) AS n_alpha,
        |         len(list_intersect(toks,
        |             ['the', 'a', 'of', 'and', 'to', 'in', 'is', 'that'])) AS n_stop
        |  FROM t),
        |q AS (
        |  SELECT doc_id,
        |         CAST(n >= 15 AS INT) + CAST(mwl >= 4.0 AND mwl <= 10.0 AS INT)
        |           + CAST(n_alpha * 5 >= n * 4 AS INT) + CAST(n_stop >= 2 AS INT)
        |           AS rules_passed,
        |         CAST(('0x' || substr(md5('graft-quality' || '|' || CAST(doc_id AS VARCHAR)), 1, 8))
        |              AS BIGINT) % 100 AS bucket
        |  FROM m)
        |SELECT doc_id, rules_passed, bucket
        |FROM q WHERE bucket < rules_passed * 25
        |ORDER BY doc_id""".stripMargin,

    "sim_centroid_label" ->
      """SELECT label, CAST(u.gs AS INT) AS pos,
        |       CAST(sum(CAST(floor(CAST(embedding[CAST(u.gs AS INT) + 1] AS DOUBLE)
        |                           * 1000000) AS BIGINT)) AS DOUBLE)
        |       / CAST(count(*) * 1000000 AS DOUBLE) AS mean_val
        |FROM embeddings,
        |     unnest(generate_series(0, CAST(len(embedding) AS BIGINT) - 1)) AS u(gs)
        |GROUP BY label, pos
        |ORDER BY label, pos""".stripMargin,
  )

  /** Fixed-iteration integer PageRank as chained CTEs — one pr{k} per
    * iteration, generated to mirror graft.ops.Graph.graphPagerank's
    * loop exactly (same scaled-integer arithmetic, so the compare is
    * bit-exact with no rounding mode in play). Chained CTEs rather
    * than WITH RECURSIVE because the recursive term would need a
    * GROUP BY — chaining keeps the oracle on bulletproof SQL.
    */
  private val pagerankSql: String = {
    val base =
      """WITH e0 AS (
        |  SELECT l_partkey AS src,
        |         lead(l_partkey) OVER (PARTITION BY l_orderkey
        |                               ORDER BY l_linenumber, l_partkey) AS dst
        |  FROM lineitem),
        |edges AS (
        |  SELECT DISTINCT src, dst FROM e0
        |  WHERE dst IS NOT NULL AND dst <> src),
        |nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
        |nn AS (SELECT count(*) AS n FROM nodes),
        |outd AS (SELECT src AS node, count(*) AS deg FROM edges GROUP BY src),
        |pr0 AS (SELECT node, 1000000000000 // (SELECT n FROM nn) AS rq FROM nodes)""".stripMargin
    val iters = (0 until 5).map { k =>
      s"""c$k AS (
         |  SELECT e.dst AS node, sum(p.rq // o.deg) AS s
         |  FROM pr$k p JOIN outd o ON p.node = o.node JOIN edges e ON e.src = p.node
         |  GROUP BY e.dst),
         |pr${k + 1} AS (
         |  SELECT n.node,
         |         150000000000 // (SELECT n FROM nn)
         |           + (85 * COALESCE(c.s, 0)) // 100 AS rq
         |  FROM nodes n LEFT JOIN c$k c ON n.node = c.node)""".stripMargin
    }
    base + ",\n" + iters.mkString(",\n") +
      """
        |SELECT node, CAST(rq AS DOUBLE) / 1000000000000 AS rank FROM pr5
        |ORDER BY rq DESC, node LIMIT 20""".stripMargin
  }

  private val analytics2: Map[String, String] = Map(
    "text_readability" ->
      """WITH t AS (
        |  SELECT doc_id,
        |         string_split(regexp_replace(trim(text), '\s+', ' ', 'g'), ' ') AS toks
        |  FROM documents WHERE trim(text) <> ''),
        |m AS (
        |  SELECT doc_id, CAST(len(toks) AS INT) AS n_words,
        |         list_sum(list_transform(toks,
        |           w -> greatest(len(string_split_regex(w, '[aeiou]+')) - 1, 1)))
        |           AS n_syll
        |  FROM t)
        |SELECT doc_id, n_words, CAST(n_syll AS INT) AS n_syll,
        |       CAST(floor((CAST(206.835 AS DOUBLE) - CAST(1.015 AS DOUBLE) * n_words
        |                   - CAST(84.6 AS DOUBLE) * (CAST(n_syll AS DOUBLE) / n_words))
        |                  * 10000)
        |            AS BIGINT) AS score_e4
        |FROM m
        |ORDER BY doc_id""".stripMargin,

    "events_rfm" ->
      """WITH p AS (
        |  SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'),
        |u AS (
        |  SELECT user_id, max(ts) AS last_ts, count(*) AS freq,
        |         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS monetary
        |  FROM p GROUP BY user_id),
        |mx AS (SELECT CAST(max(ts) AS DATE) AS corpus_max FROM p)
        |SELECT u.user_id,
        |       CAST(datediff('day', CAST(u.last_ts AS DATE), mx.corpus_max) AS INT)
        |         AS r_days,
        |       u.freq, u.monetary,
        |       ntile(5) OVER (ORDER BY datediff('day', CAST(u.last_ts AS DATE),
        |                      mx.corpus_max), u.user_id) AS r_quintile,
        |       ntile(5) OVER (ORDER BY u.freq DESC, u.user_id) AS f_quintile,
        |       ntile(5) OVER (ORDER BY u.monetary DESC, u.user_id) AS m_quintile
        |FROM u, mx
        |ORDER BY user_id""".stripMargin,

    "win_topk_with_ties" ->
      """WITH t AS (
        |  SELECT l_returnflag, CAST(l_extendedprice AS DECIMAL(18,2)) AS price
        |  FROM lineitem),
        |r AS (
        |  SELECT l_returnflag, price,
        |         rank() OVER (PARTITION BY l_returnflag ORDER BY price DESC) AS rnk
        |  FROM t)
        |SELECT l_returnflag, rnk, CAST(price AS DOUBLE) AS price
        |FROM r WHERE rnk <= 3
        |ORDER BY l_returnflag, rnk, price""".stripMargin,

    "events_time_to_convert" ->
      """WITH s AS (
        |  SELECT user_id, min(ts) AS signup_ts
        |  FROM events WHERE event_type = 'signup' GROUP BY user_id),
        |p AS (
        |  SELECT e.user_id, s.signup_ts, min(e.ts) AS first_purchase_ts
        |  FROM events e JOIN s USING (user_id)
        |  WHERE e.event_type = 'purchase' AND e.ts >= s.signup_ts
        |  GROUP BY e.user_id, s.signup_ts)
        |SELECT user_id, signup_ts, first_purchase_ts,
        |       CAST(floor(epoch(first_purchase_ts)) AS BIGINT)
        |         - CAST(floor(epoch(signup_ts)) AS BIGINT) AS secs_to_convert
        |FROM p
        |ORDER BY user_id""".stripMargin,
  )

  private val graph: Map[String, String] = Map(
    "graph_pagerank" -> pagerankSql,

    "graph_triangle_count" ->
      """WITH e0 AS (
        |  SELECT l_partkey AS src,
        |         lead(l_partkey) OVER (PARTITION BY l_orderkey
        |                               ORDER BY l_linenumber, l_partkey) AS dst
        |  FROM lineitem),
        |und AS (
        |  SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
        |  FROM e0 WHERE dst IS NOT NULL AND dst <> src),
        |tris AS (
        |  SELECT e1.u, e1.v, e2.v AS w
        |  FROM und e1
        |  JOIN und e2 ON e1.v = e2.u
        |  JOIN und e3 ON e3.u = e1.u AND e3.v = e2.v),
        |corners AS (
        |  SELECT u AS node FROM tris
        |  UNION ALL SELECT v FROM tris
        |  UNION ALL SELECT w FROM tris)
        |SELECT node, count(*) AS n_triangles
        |FROM corners GROUP BY node
        |ORDER BY n_triangles DESC, node
        |LIMIT 20""".stripMargin,

    // 3 synchronous min-label rounds, unrolled (fixed k — no
    // recursion needed, each round is one join + min-agg; self-loops
    // make the min include the node's own label)
    "graph_label_propagation" ->
      """WITH e0 AS (
        |  SELECT l_partkey AS src,
        |         lead(l_partkey) OVER (PARTITION BY l_orderkey
        |                               ORDER BY l_linenumber, l_partkey) AS dst
        |  FROM lineitem),
        |und AS (
        |  SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
        |  FROM e0 WHERE dst IS NOT NULL AND dst <> src),
        |nodes AS (
        |  SELECT DISTINCT u AS node FROM und
        |  UNION SELECT DISTINCT v FROM und),
        |adj AS (
        |  SELECT u AS src, v AS dst FROM und
        |  UNION ALL SELECT v, u FROM und
        |  UNION ALL SELECT node, node FROM nodes),
        |l0 AS (SELECT node, node AS label FROM nodes),
        |l1 AS (SELECT a.dst AS node, min(l.label) AS label
        |       FROM l0 l JOIN adj a ON l.node = a.src GROUP BY a.dst),
        |l2 AS (SELECT a.dst AS node, min(l.label) AS label
        |       FROM l1 l JOIN adj a ON l.node = a.src GROUP BY a.dst),
        |l3 AS (SELECT a.dst AS node, min(l.label) AS label
        |       FROM l2 l JOIN adj a ON l.node = a.src GROUP BY a.dst)
        |SELECT node, label FROM l3 ORDER BY node""".stripMargin,

    // ops.Graph.graphModularityCells: the SAME 3 unrolled min-label
    // rounds, then per-label node/degree/internal-edge cells + m
    "graph_modularity_cells" ->
      """WITH e0 AS (
        |  SELECT l_partkey AS src,
        |         lead(l_partkey) OVER (PARTITION BY l_orderkey
        |                               ORDER BY l_linenumber, l_partkey) AS dst
        |  FROM lineitem),
        |undall AS (
        |  SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
        |  FROM e0 WHERE dst IS NOT NULL AND dst <> src),
        |und AS (
        |  SELECT u, v FROM undall
        |  WHERE CAST(('0x' || substr(md5('graft-modularity' || '|' ||
        |          CAST(u AS VARCHAR) || '|' || CAST(v AS VARCHAR)), 1, 8))
        |        AS BIGINT) % 100 < 10),
        |nodes AS (
        |  SELECT DISTINCT u AS node FROM und
        |  UNION SELECT DISTINCT v FROM und),
        |adj AS (
        |  SELECT u AS src, v AS dst FROM und
        |  UNION ALL SELECT v, u FROM und
        |  UNION ALL SELECT node, node FROM nodes),
        |l0 AS (SELECT node, node AS label FROM nodes),
        |l1 AS (SELECT a.dst AS node, min(l.label) AS label
        |       FROM l0 l JOIN adj a ON l.node = a.src GROUP BY a.dst),
        |l2 AS (SELECT a.dst AS node, min(l.label) AS label
        |       FROM l1 l JOIN adj a ON l.node = a.src GROUP BY a.dst),
        |l3 AS (SELECT a.dst AS node, min(l.label) AS label
        |       FROM l2 l JOIN adj a ON l.node = a.src GROUP BY a.dst),
        |deg AS (
        |  SELECT node, CAST(COUNT(*) AS BIGINT) AS deg FROM (
        |    SELECT u AS node FROM und UNION ALL SELECT v FROM und)
        |  GROUP BY node),
        |node_cells AS (
        |  SELECT l3.label, CAST(COUNT(*) AS BIGINT) AS n_nodes,
        |         CAST(SUM(deg.deg) AS BIGINT) AS deg_sum
        |  FROM l3 JOIN deg ON deg.node = l3.node GROUP BY 1),
        |e_int AS (
        |  SELECT lu.label, CAST(COUNT(*) AS BIGINT) AS e_int
        |  FROM und
        |  JOIN l3 lu ON lu.node = und.u
        |  JOIN l3 lv ON lv.node = und.v
        |  WHERE lu.label = lv.label GROUP BY 1),
        |m AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM und)
        |SELECT nc.label, nc.n_nodes, nc.deg_sum,
        |       COALESCE(e_int.e_int, 0) AS e_int, m.m
        |FROM node_cells nc
        |LEFT JOIN e_int ON e_int.label = nc.label
        |CROSS JOIN m
        |ORDER BY nc.label""".stripMargin,
  )

  private val round8: Map[String, String] = Map(
    // 3 unrolled peel rounds at k=2; result = degree table of the
    // round-3 edge set (fixed rounds, not fixpoint — see Graph.scala)
    "graph_k_core" ->
      """WITH e0p AS (
        |  SELECT l_partkey AS src,
        |         lead(l_partkey) OVER (PARTITION BY l_orderkey
        |                               ORDER BY l_linenumber, l_partkey) AS dst
        |  FROM lineitem),
        |eall AS (
        |  SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
        |  FROM e0p WHERE dst IS NOT NULL AND dst <> src),
        |e0 AS (
        |  SELECT u, v FROM eall
        |  WHERE CAST(('0x' || substr(md5('graft-kcore' || '|' ||
        |          CAST(u AS VARCHAR) || '|' || CAST(v AS VARCHAR)), 1, 8))
        |        AS BIGINT) % 100 < 10),
        |d1 AS (SELECT node, count(*) AS deg FROM (
        |         SELECT u AS node FROM e0 UNION ALL SELECT v FROM e0)
        |       GROUP BY node),
        |s1 AS (SELECT node FROM d1 WHERE deg >= 2),
        |e1 AS (SELECT u, v FROM e0
        |       WHERE u IN (SELECT node FROM s1) AND v IN (SELECT node FROM s1)),
        |d2 AS (SELECT node, count(*) AS deg FROM (
        |         SELECT u AS node FROM e1 UNION ALL SELECT v FROM e1)
        |       GROUP BY node),
        |s2 AS (SELECT node FROM d2 WHERE deg >= 2),
        |e2 AS (SELECT u, v FROM e1
        |       WHERE u IN (SELECT node FROM s2) AND v IN (SELECT node FROM s2)),
        |d3 AS (SELECT node, count(*) AS deg FROM (
        |         SELECT u AS node FROM e2 UNION ALL SELECT v FROM e2)
        |       GROUP BY node),
        |s3 AS (SELECT node FROM d3 WHERE deg >= 2),
        |e3 AS (SELECT u, v FROM e2
        |       WHERE u IN (SELECT node FROM s3) AND v IN (SELECT node FROM s3))
        |SELECT node, count(*) AS deg FROM (
        |  SELECT u AS node FROM e3 UNION ALL SELECT v FROM e3)
        |GROUP BY node ORDER BY node""".stripMargin,

    // ops.Graph.graphKTruss: 2 unrolled k=3 peel rounds (support =
    // common-neighbor count probed against the CURRENT edge set),
    // emitting the round-2 edges with recomputed support.
    "graph_k_truss" ->
      """WITH e0p AS (
        |  SELECT l_partkey AS src,
        |         lead(l_partkey) OVER (PARTITION BY l_orderkey
        |                               ORDER BY l_linenumber, l_partkey) AS dst
        |  FROM lineitem),
        |eall AS (
        |  SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
        |  FROM e0p WHERE dst IS NOT NULL AND dst <> src),
        |e0 AS (
        |  SELECT u, v FROM eall
        |  WHERE CAST(('0x' || substr(md5('graft-ktruss' || '|' ||
        |          CAST(u AS VARCHAR) || '|' || CAST(v AS VARCHAR)), 1, 8))
        |        AS BIGINT) % 100 < 30),
        |a0 AS (SELECT u AS node, v AS nbr FROM e0 UNION ALL SELECT v, u FROM e0),
        |c0 AS (
        |  SELECT x.node AS u, y.node AS v, count(*) AS supp
        |  FROM a0 x JOIN a0 y ON y.nbr = x.nbr AND x.node < y.node
        |  JOIN e0 e ON e.u = x.node AND e.v = y.node
        |  GROUP BY x.node, y.node),
        |e1 AS (
        |  SELECT e0.u, e0.v FROM e0
        |  JOIN c0 ON c0.u = e0.u AND c0.v = e0.v WHERE c0.supp >= 1),
        |a1 AS (SELECT u AS node, v AS nbr FROM e1 UNION ALL SELECT v, u FROM e1),
        |c1 AS (
        |  SELECT x.node AS u, y.node AS v, count(*) AS supp
        |  FROM a1 x JOIN a1 y ON y.nbr = x.nbr AND x.node < y.node
        |  JOIN e1 e ON e.u = x.node AND e.v = y.node
        |  GROUP BY x.node, y.node),
        |e2 AS (
        |  SELECT e1.u, e1.v FROM e1
        |  JOIN c1 ON c1.u = e1.u AND c1.v = e1.v WHERE c1.supp >= 1),
        |a2 AS (SELECT u AS node, v AS nbr FROM e2 UNION ALL SELECT v, u FROM e2),
        |c2 AS (
        |  SELECT x.node AS u, y.node AS v, count(*) AS supp
        |  FROM a2 x JOIN a2 y ON y.nbr = x.nbr AND x.node < y.node
        |  JOIN e2 e ON e.u = x.node AND e.v = y.node
        |  GROUP BY x.node, y.node)
        |SELECT e2.u, e2.v, CAST(COALESCE(c2.supp, 0) AS BIGINT) AS supp
        |FROM e2 LEFT JOIN c2 ON c2.u = e2.u AND c2.v = e2.v
        |ORDER BY e2.u, e2.v""".stripMargin,

    // SCAN structural similarity: Jaccard of endpoint neighborhoods
    // for every EDGE (open neighborhoods, union = deg a + deg b −
    // common); (jaccard DESC, a, b) is total so LIMIT is deterministic
    "graph_jaccard_neighbors" ->
      """WITH e0p AS (
        |  SELECT l_partkey AS src,
        |         lead(l_partkey) OVER (PARTITION BY l_orderkey
        |                               ORDER BY l_linenumber, l_partkey) AS dst
        |  FROM lineitem),
        |und AS (
        |  SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
        |  FROM e0p WHERE dst IS NOT NULL AND dst <> src),
        |adj AS (
        |  SELECT u AS node, v AS nbr FROM und
        |  UNION ALL SELECT v, u FROM und),
        |deg AS (SELECT node, count(*) AS deg FROM adj GROUP BY node),
        |cmn AS (
        |  SELECT x.node AS a, y.node AS b, count(*) AS common
        |  FROM adj x
        |  JOIN adj y ON x.nbr = y.nbr AND x.node < y.node
        |  JOIN und e ON e.u = x.node AND e.v = y.node
        |  GROUP BY x.node, y.node)
        |SELECT c.a, c.b, c.common,
        |       CAST(c.common AS DOUBLE) / (da.deg + db.deg - c.common) AS jaccard
        |FROM cmn c
        |JOIN deg da ON da.node = c.a
        |JOIN deg db ON db.node = c.b
        |ORDER BY jaccard DESC, c.a, c.b
        |LIMIT 20""".stripMargin,

    // market-basket pair lift over order baskets; >=3 support,
    // (lift DESC, a, b) total order makes the LIMIT deterministic
    // ops.Analytics.eventsSeasonalityHourly: dow = (epoch_day+4)%7 —
    // integer arithmetic, not the engines' divergent dayofweek()
    "events_seasonality_hourly" ->
      """WITH e AS (
        |  SELECT event_type,
        |         (datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) + 4) % 7 AS dow,
        |         CAST(hour(ts) AS BIGINT) AS hr
        |  FROM events),
        |a AS (
        |  SELECT event_type, dow, hr, count(*) AS cnt
        |  FROM e GROUP BY 1, 2, 3)
        |SELECT event_type, dow, hr, cnt,
        |       cnt * 1000000 // CAST(SUM(cnt) OVER (PARTITION BY event_type) AS BIGINT) AS share_ppm
        |FROM a
        |ORDER BY event_type, dow, hr""".stripMargin,

    // ops.Quality.dqAuditRules: FK reconciliation via left join on
    // deduped parent keys + combined domain-rule passes
    "dq_audit_rules" ->
      """WITH
        |fk1 AS (
        |  SELECT 'fk_lineitem_orderkey' AS rule, count(*) AS n_checked,
        |         count(CASE WHEN p.k IS NULL THEN 1 END) AS n_violations
        |  FROM lineitem c LEFT JOIN (SELECT DISTINCT o_orderkey AS k FROM orders) p
        |    ON c.l_orderkey = p.k),
        |fk2 AS (
        |  SELECT 'fk_lineitem_partkey', count(*),
        |         count(CASE WHEN p.k IS NULL THEN 1 END)
        |  FROM lineitem c LEFT JOIN (SELECT DISTINCT p_partkey AS k FROM part) p
        |    ON c.l_partkey = p.k),
        |fk3 AS (
        |  SELECT 'fk_orders_custkey', count(*),
        |         count(CASE WHEN p.k IS NULL THEN 1 END)
        |  FROM orders c LEFT JOIN (SELECT DISTINCT c_custkey AS k FROM customer) p
        |    ON c.o_custkey = p.k),
        |fk4 AS (
        |  SELECT 'fk_customer_nationkey', count(*),
        |         count(CASE WHEN p.k IS NULL THEN 1 END)
        |  FROM customer c LEFT JOIN (SELECT DISTINCT n_nationkey AS k FROM nation) p
        |    ON c.c_nationkey = p.k),
        |dli AS (
        |  SELECT count(*) AS n_checked,
        |         count(CASE WHEN l_quantity <= 0 THEN 1 END) AS v0,
        |         count(CASE WHEN l_discount < 0 OR l_discount > 0.5 THEN 1 END) AS v1
        |  FROM lineitem),
        |dor AS (
        |  SELECT count(*) AS n_checked,
        |         count(CASE WHEN o_totalprice <= 0 THEN 1 END) AS v0
        |  FROM orders),
        |ddo AS (
        |  SELECT count(*) AS n_checked,
        |         count(CASE WHEN n_chars <= 0 OR length(trim(text)) = 0 THEN 1 END) AS v0
        |  FROM documents),
        |allrules AS (
        |  SELECT * FROM fk1 UNION ALL SELECT * FROM fk2
        |  UNION ALL SELECT * FROM fk3 UNION ALL SELECT * FROM fk4
        |  UNION ALL SELECT 'dom_lineitem_quantity_pos', n_checked, v0 FROM dli
        |  UNION ALL SELECT 'dom_lineitem_discount_range', n_checked, v1 FROM dli
        |  UNION ALL SELECT 'dom_orders_totalprice_pos', n_checked, v0 FROM dor
        |  UNION ALL SELECT 'dom_documents_nonempty', n_checked, v0 FROM ddo)
        |SELECT rule, n_checked, n_violations,
        |       n_violations * 1000000 // n_checked AS viol_ppm
        |FROM allrules
        |ORDER BY rule""".stripMargin,

    // ops.Analytics.timeSeriesAutocorr: exact int sums; Pearson finish
    // in the pinned IEEE order num / (sqrt(vx) * sqrt(vy))
    "time_series_autocorr" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS cnt
        |  FROM events GROUP BY 1, 2),
        |wide AS (
        |  SELECT event_type, cnt,
        |         lead(cnt, 1) OVER (PARTITION BY event_type ORDER BY day) AS y1,
        |         lead(cnt, 2) OVER (PARTITION BY event_type ORDER BY day) AS y2,
        |         lead(cnt, 3) OVER (PARTITION BY event_type ORDER BY day) AS y3,
        |         lead(cnt, 7) OVER (PARTITION BY event_type ORDER BY day) AS y7
        |  FROM daily),
        |long AS (
        |  SELECT event_type, 1 AS k, cnt, y1 AS y FROM wide WHERE y1 IS NOT NULL
        |  UNION ALL
        |  SELECT event_type, 2, cnt, y2 FROM wide WHERE y2 IS NOT NULL
        |  UNION ALL
        |  SELECT event_type, 3, cnt, y3 FROM wide WHERE y3 IS NOT NULL
        |  UNION ALL
        |  SELECT event_type, 7, cnt, y7 FROM wide WHERE y7 IS NOT NULL),
        |s AS (
        |  SELECT event_type, k, count(*) AS n,
        |         CAST(SUM(cnt) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
        |         CAST(SUM(cnt * y) AS BIGINT) AS sxy,
        |         CAST(SUM(cnt * cnt) AS BIGINT) AS sxx,
        |         CAST(SUM(y * y) AS BIGINT) AS syy
        |  FROM long GROUP BY 1, 2)
        |SELECT event_type, CAST(k AS BIGINT) AS k, n,
        |       CAST(n * sxy - sx * sy AS DOUBLE) /
        |         (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) *
        |          sqrt(CAST(n * syy - sy * sy AS DOUBLE))) AS autocorr
        |FROM s
        |WHERE n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
        |ORDER BY event_type, k""".stripMargin,

    // ops.Analytics.ordersAssociationRules: integer-ppm support and
    // confidences; lift in the documented IEEE op order
    // (DOUBLE(pair) * n / cnt_a / cnt_b) so the bits agree.
    "orders_association_rules" ->
      """WITH basket AS (
        |  SELECT DISTINCT l_orderkey AS okey, p_brand AS brand
        |  FROM lineitem JOIN part ON p_partkey = l_partkey),
        |n AS (SELECT count(DISTINCT l_orderkey) AS n_baskets FROM lineitem),
        |supp AS (SELECT brand, count(*) AS cnt FROM basket GROUP BY brand),
        |pairs AS (
        |  SELECT x.brand AS a, y.brand AS b, count(*) AS pair_cnt
        |  FROM basket x JOIN basket y ON x.okey = y.okey AND x.brand < y.brand
        |  GROUP BY 1, 2)
        |SELECT p.a, p.b, p.pair_cnt, sa.cnt AS cnt_a, sb.cnt AS cnt_b,
        |       p.pair_cnt * 1000000 // n.n_baskets AS support_ppm,
        |       p.pair_cnt * 1000000 // sa.cnt AS conf_ab_ppm,
        |       p.pair_cnt * 1000000 // sb.cnt AS conf_ba_ppm,
        |       CAST(p.pair_cnt AS DOUBLE) * n.n_baskets / sa.cnt / sb.cnt AS lift
        |FROM pairs p
        |JOIN supp sa ON sa.brand = p.a
        |JOIN supp sb ON sb.brand = p.b
        |CROSS JOIN n
        |WHERE p.pair_cnt * 1000000 // n.n_baskets >= 1000
        |ORDER BY p.a, p.b""".stripMargin,

    "orders_market_basket" ->
      """WITH basket AS (
        |  SELECT DISTINCT l_orderkey AS okey, l_partkey AS item FROM lineitem),
        |n AS (SELECT count(DISTINCT okey) AS n_orders FROM basket),
        |supp AS (SELECT item, count(*) AS cnt FROM basket GROUP BY item),
        |pairs AS (
        |  SELECT x.item AS a, y.item AS b, count(*) AS pair_cnt
        |  FROM basket x JOIN basket y ON x.okey = y.okey AND x.item < y.item
        |  GROUP BY x.item, y.item
        |  HAVING count(*) >= 3)
        |SELECT p.a, p.b, p.pair_cnt,
        |       CAST(p.pair_cnt * n.n_orders AS DOUBLE) / (sa.cnt * sb.cnt) AS lift
        |FROM pairs p
        |JOIN supp sa ON sa.item = p.a
        |JOIN supp sb ON sb.item = p.b
        |CROSS JOIN n
        |ORDER BY lift DESC, p.a, p.b
        |LIMIT 20""".stripMargin,

    // gaps-and-islands: day - row_number() is constant within a
    // consecutive run; longest streak per user, earliest on ties
    "win_streak_islands" ->
      """WITH days AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |isl AS (
        |  SELECT user_id, day,
        |         day - CAST(row_number() OVER (PARTITION BY user_id
        |                                       ORDER BY day) AS INT) AS island
        |  FROM days),
        |runs AS (
        |  SELECT user_id, island, count(*) AS streak_len, min(day) AS streak_start
        |  FROM isl GROUP BY user_id, island),
        |best AS (
        |  SELECT user_id, streak_len, streak_start,
        |         row_number() OVER (PARTITION BY user_id
        |                            ORDER BY streak_len DESC, streak_start) AS rn
        |  FROM runs)
        |SELECT user_id, streak_len, streak_start FROM best
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,

    "events_pattern_match" ->
      """WITH e AS (
        |  SELECT user_id, event_id, ts, event_type,
        |         lead(event_type, 1) OVER w AS e2,
        |         lead(event_type, 2) OVER w AS e3,
        |         lead(ts, 2) OVER w AS end_ts
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT user_id, event_id AS start_event_id, ts AS start_ts, end_ts
        |FROM e
        |WHERE event_type = 'view' AND e2 = 'click' AND e3 = 'purchase'
        |ORDER BY user_id, start_event_id""".stripMargin,

    // content-defined chunking: a token opens a chunk iff its md5
    // bucket < 12; identical chunks group corpus-wide on their text
    "dedup_cdc_chunks" ->
      """WITH t AS (
        |  SELECT doc_id,
        |         string_split(regexp_replace(trim(text), '\s+', ' ', 'g'), ' ') AS ts
        |  FROM documents WHERE trim(text) <> ''),
        |toks AS (
        |  SELECT doc_id, CAST(u.i AS BIGINT) - 1 AS pos, ts[CAST(u.i AS INT)] AS tok
        |  FROM t, unnest(generate_series(1, CAST(len(ts) AS BIGINT))) AS u(i)),
        |marked AS (
        |  SELECT doc_id, pos, tok,
        |         CASE WHEN CAST(('0x' || substr(md5('graft-cdc' || '|' || tok), 1, 8))
        |                   AS BIGINT) % 100 < 12 THEN 1 ELSE 0 END AS boundary
        |  FROM toks),
        |cids AS (
        |  SELECT doc_id, pos, tok,
        |         CAST(sum(boundary) OVER (PARTITION BY doc_id ORDER BY pos)
        |              AS BIGINT) AS chunk_id
        |  FROM marked),
        |chunks AS (
        |  SELECT doc_id, chunk_id, string_agg(tok, ' ' ORDER BY pos) AS chunk_text
        |  FROM cids GROUP BY doc_id, chunk_id)
        |SELECT md5(chunk_text) AS chunk_hash,
        |       count(*) AS n_copies,
        |       CAST(min(doc_id * 1000000 + chunk_id) // 1000000 AS BIGINT) AS keep_doc,
        |       CAST(min(doc_id * 1000000 + chunk_id) % 1000000 AS BIGINT) AS keep_chunk
        |FROM chunks
        |GROUP BY chunk_text
        |HAVING count(*) >= 2
        |ORDER BY chunk_hash""".stripMargin,

    "text_ngram_novelty" ->
      """WITH t AS (
        |  SELECT doc_id,
        |         string_split(regexp_replace(trim(text), '\s+', ' ', 'g'), ' ') AS toks
        |  FROM documents WHERE trim(text) <> ''),
        |g AS (
        |  SELECT DISTINCT doc_id,
        |         array_to_string(toks[CAST(u.gs AS INT) + 1 : CAST(u.gs AS INT) + 3], ' ') AS gram
        |  FROM t, unnest(generate_series(0, CAST(len(toks) AS BIGINT) - 3)) AS u(gs)
        |  WHERE len(toks) >= 3),
        |f AS (SELECT gram, min(doc_id) AS first_doc FROM g GROUP BY gram)
        |SELECT g.doc_id,
        |       count(*) AS n_grams,
        |       CAST(sum(CASE WHEN f.first_doc < g.doc_id THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_seen_before,
        |       CAST(count(*) - sum(CASE WHEN f.first_doc < g.doc_id THEN 1 ELSE 0 END)
        |            AS DOUBLE) / count(*) AS novelty
        |FROM g JOIN f USING (gram)
        |GROUP BY g.doc_id
        |ORDER BY g.doc_id""".stripMargin,
  )

  /** Round-9 information-theory family: every logarithm is the
    * generated [[Log2Sql]] integer chain, replaying
    * `graft.functions.NumericExpressions.Log2Fixed` bit for bit —
    * no libm call anywhere in these oracles, so the hash compare is
    * exact by construction (SURVEY §8.r9.5).
    */
  private val infoTheory: Map[String, String] = Map(
    // ops.InfoTheory.eventsPowerLawAlpha: Hill tail-exponent cells —
    // the logarithm is the Log2Sql integer chain over DISTINCT tail
    // counts (plus the cmin=5 anchor), bit-replaying log2_fixed.
    "events_power_law_alpha" ->
      s"""WITH cnts AS (
         |  SELECT event_type, user_id, count(*) AS cnt
         |  FROM events GROUP BY event_type, user_id),
         |${Log2Sql.chain("lg",
            "SELECT DISTINCT cnt AS v FROM cnts WHERE cnt >= 5 " +
              "UNION SELECT CAST(5 AS BIGINT) AS v")},
         |anchor AS (SELECT l20 AS l5 FROM lg WHERE v = 5)
         |SELECT event_type,
         |       count(*) AS n_users,
         |       CAST(SUM(CASE WHEN cnt >= 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_tail,
         |       CAST(5 AS BIGINT) AS cmin,
         |       CAST(COALESCE(SUM(CASE WHEN cnt >= 5 THEN lg.l20 - anchor.l5 END), 0) AS BIGINT) AS sum_log2_fp
         |FROM cnts
         |LEFT JOIN lg ON lg.v = cnts.cnt
         |CROSS JOIN anchor
         |GROUP BY event_type
         |ORDER BY event_type""".stripMargin,

    "text_entropy_exact" ->
      s"""WITH tok AS (
         |  SELECT doc_id,
         |         unnest(string_split(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')), ' ')) AS tok
         |  FROM documents),
         |counts AS (
         |  SELECT doc_id, tok, count(*) AS cnt
         |  FROM tok WHERE tok <> '' GROUP BY doc_id, tok),
         |${Log2Sql.chain("lgc", "SELECT DISTINCT cnt AS v FROM counts")},
         |per_doc AS (
         |  SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_tokens, COUNT(*) AS n_distinct,
         |         CAST(SUM(cnt * lgc.l20) AS BIGINT) AS scl
         |  FROM counts JOIN lgc ON lgc.v = counts.cnt
         |  GROUP BY doc_id),
         |${Log2Sql.chain("lgn", "SELECT DISTINCT n_tokens AS v FROM per_doc")}
         |SELECT doc_id, n_tokens, n_distinct,
         |       CAST(lgn.l20 - (scl // n_tokens) AS DOUBLE) / 1048576.0 AS entropy_bits
         |FROM per_doc JOIN lgn ON lgn.v = per_doc.n_tokens
         |ORDER BY doc_id""".stripMargin,

    // ops.InfoTheory.textBm25Topk: Okapi BM25 with the IDF logarithm
    // on the Log2Sql integer chain and the TF-saturation rational as
    // explicit truncating divisions — the whole score bit-replayed.
    // Query terms and the k1/b ppm constants interpolate from the SAME
    // Scala constants the Spark side uses (one source of truth).
    "text_bm25_topk" ->
      s"""WITH tok AS (
         |  SELECT doc_id,
         |         unnest(string_split(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')), ' ')) AS term
         |  FROM documents),
         |tf AS (
         |  SELECT doc_id, term, count(*) AS tf
         |  FROM tok WHERE term <> '' GROUP BY doc_id, term),
         |dl AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl FROM tf GROUP BY doc_id),
         |corp AS (
         |  SELECT total_tok, n_docs, total_tok * 1000000 // n_docs AS avgdl_u
         |  FROM (SELECT CAST(SUM(tf) AS BIGINT) AS total_tok,
         |               COUNT(DISTINCT doc_id) AS n_docs FROM tf)),
         |q AS (
         |  SELECT tf.doc_id, tf.term, tf.tf, dl.dl
         |  FROM tf JOIN dl USING (doc_id)
         |  WHERE tf.term IN (${graft.ops.InfoTheory.Bm25QueryTerms.map(t => s"'$t'").mkString(", ")})),
         |dft AS (SELECT term, count(*) AS df FROM q GROUP BY term),
         |${Log2Sql.chain("lg",
            "SELECT DISTINCT 2*df+1 AS v FROM dft " +
              "UNION SELECT DISTINCT 2*n_docs+2 AS v FROM corp")},
         |idf AS (
         |  SELECT dft.term, lgn.l20 - lgd.l20 AS idf20, corp.avgdl_u
         |  FROM dft CROSS JOIN corp
         |  JOIN lg lgn ON lgn.v = 2*corp.n_docs+2
         |  JOIN lg lgd ON lgd.v = 2*dft.df+1),
         |scored AS (
         |  SELECT q.doc_id, idf.idf20,
         |         ((q.tf * ${graft.ops.InfoTheory.Bm25K1p1Ppm}) * 1000000)
         |           // (q.tf * 1000000
         |               + ((${graft.ops.InfoTheory.Bm25K1Ppm}
         |                   * (${graft.ops.InfoTheory.Bm25OneMinusBPpm}
         |                      + ((${graft.ops.InfoTheory.Bm25BPpm}
         |                          * (q.dl * 1000000000000 // idf.avgdl_u)) // 1000000)))
         |                  // 1000000)) AS sat_ppm
         |  FROM q JOIN idf USING (term)),
         |sel AS (
         |  SELECT doc_id, count(*) AS n_hit,
         |         CAST(SUM(idf20 * sat_ppm) AS BIGINT) AS bm25_u
         |  FROM scored GROUP BY doc_id
         |  ORDER BY bm25_u DESC, doc_id LIMIT 10)
         |SELECT doc_id, n_hit, bm25_u,
         |       CAST(bm25_u AS DOUBLE) / 1048576.0 / 1000000.0 * 0.6931471805599453 AS bm25
         |FROM sel
         |ORDER BY bm25_u DESC, doc_id""".stripMargin,

    // ops.InfoTheory.textLmDirichletTopk: Dirichlet query-likelihood
    // with every log argument cross-multiplied to an integer and fed
    // through the Log2Sql chain — the whole score bit-replayed, like
    // BM25. Candidate docs (>=1 hit) score ALL query terms (tf = 0
    // contributes the smoothing mass), via the grid left join.
    "text_lm_dirichlet_topk" ->
      s"""WITH tok AS (
         |  SELECT doc_id,
         |         unnest(string_split(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')), ' ')) AS term
         |  FROM documents),
         |tf AS (
         |  SELECT doc_id, term, count(*) AS tf
         |  FROM tok WHERE term <> '' GROUP BY doc_id, term),
         |dl AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl FROM tf GROUP BY doc_id),
         |corp AS (SELECT CAST(SUM(tf) AS BIGINT) AS c_tok FROM tf),
         |qtf AS (
         |  SELECT doc_id, term, tf FROM tf
         |  WHERE term IN (${graft.ops.InfoTheory.Bm25QueryTerms.map(t => s"'$t'").mkString(", ")})),
         |cft AS (SELECT term, CAST(SUM(tf) AS BIGINT) AS cf FROM qtf GROUP BY term),
         |cand AS (SELECT DISTINCT doc_id FROM qtf),
         |grid AS (
         |  SELECT cand.doc_id, cft.term, cft.cf, COALESCE(qtf.tf, 0) AS tf, dl.dl
         |  FROM cand CROSS JOIN cft
         |  LEFT JOIN qtf ON qtf.doc_id = cand.doc_id AND qtf.term = cft.term
         |  JOIN dl ON dl.doc_id = cand.doc_id),
         |${Log2Sql.chain("lg",
            "SELECT DISTINCT grid.tf * corp.c_tok + " +
              s"${graft.ops.InfoTheory.LmMu} * grid.cf AS v FROM grid CROSS JOIN corp " +
              "UNION SELECT DISTINCT corp.c_tok * (dl.dl + " +
              s"${graft.ops.InfoTheory.LmMu}) AS v FROM dl CROSS JOIN corp")},
         |sel AS (
         |  SELECT g.doc_id,
         |         CAST(SUM(CASE WHEN g.tf > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
         |         CAST(SUM(ln.l20) - COUNT(*) * MIN(ld.l20) AS BIGINT) AS lm20
         |  FROM grid g
         |  CROSS JOIN corp
         |  JOIN lg ln ON ln.v = g.tf * corp.c_tok + ${graft.ops.InfoTheory.LmMu} * g.cf
         |  JOIN lg ld ON ld.v = corp.c_tok * (g.dl + ${graft.ops.InfoTheory.LmMu})
         |  GROUP BY g.doc_id
         |  ORDER BY lm20 DESC, doc_id LIMIT 10)
         |SELECT doc_id, n_hit, lm20,
         |       CAST(lm20 AS DOUBLE) / 1048576.0 AS lm_bits
         |FROM sel
         |ORDER BY lm20 DESC, doc_id""".stripMargin,

    // ops.InfoTheory.textPerplexityExact: the entropy pipeline's H₂₀
    // fed through the Exp2Sql replica — log AND exp both bit-replayed.
    "text_perplexity_exact" ->
      s"""WITH tok AS (
         |  SELECT doc_id,
         |         unnest(string_split(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')), ' ')) AS tok
         |  FROM documents),
         |counts AS (
         |  SELECT doc_id, tok, count(*) AS cnt
         |  FROM tok WHERE tok <> '' GROUP BY doc_id, tok),
         |${Log2Sql.chain("lgc", "SELECT DISTINCT cnt AS v FROM counts")},
         |per_doc AS (
         |  SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_tokens, COUNT(*) AS n_distinct,
         |         CAST(SUM(cnt * lgc.l20) AS BIGINT) AS scl
         |  FROM counts JOIN lgc ON lgc.v = counts.cnt
         |  GROUP BY doc_id),
         |${Log2Sql.chain("lgn", "SELECT DISTINCT n_tokens AS v FROM per_doc")},
         |hdoc AS (
         |  SELECT doc_id, n_tokens, n_distinct,
         |         lgn.l20 - (scl // n_tokens) AS h20
         |  FROM per_doc JOIN lgn ON lgn.v = per_doc.n_tokens),
         |${Exp2Sql.chain("ex", "SELECT DISTINCT h20 AS v FROM hdoc")}
         |SELECT doc_id, n_tokens, n_distinct,
         |       CAST(ex.e2 AS DOUBLE) / 1048576.0 AS perplexity
         |FROM hdoc JOIN ex ON ex.v = hdoc.h20
         |ORDER BY doc_id""".stripMargin,

    // ops.InfoTheory.samplePerplexityTemperature: entropy H₂₀ →
    // w₂₀ = exp2(H₂₀ div 2) = √ppl → ppm gate vs w₂₀·10⁶ div wmax.
    "sample_perplexity_temperature" ->
      s"""WITH tok AS (
         |  SELECT doc_id,
         |         unnest(string_split(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')), ' ')) AS tok
         |  FROM documents),
         |counts AS (
         |  SELECT doc_id, tok, count(*) AS cnt
         |  FROM tok WHERE tok <> '' GROUP BY doc_id, tok),
         |${Log2Sql.chain("lgc", "SELECT DISTINCT cnt AS v FROM counts")},
         |per_doc AS (
         |  SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_tokens,
         |         CAST(SUM(cnt * lgc.l20) AS BIGINT) AS scl
         |  FROM counts JOIN lgc ON lgc.v = counts.cnt
         |  GROUP BY doc_id),
         |${Log2Sql.chain("lgn", "SELECT DISTINCT n_tokens AS v FROM per_doc")},
         |hdoc AS (
         |  SELECT doc_id, n_tokens,
         |         (lgn.l20 - (scl // n_tokens)) // 2 AS hh
         |  FROM per_doc JOIN lgn ON lgn.v = per_doc.n_tokens),
         |${Exp2Sql.chain("ex", "SELECT DISTINCT hh AS v FROM hdoc")},
         |w AS (
         |  SELECT doc_id, n_tokens, ex.e2 AS w20
         |  FROM hdoc JOIN ex ON ex.v = hdoc.hh),
         |wm AS (SELECT max(w20) AS wmax20 FROM w)
         |SELECT doc_id, n_tokens, w20,
         |       w20 * 1000000 // wmax20 AS thr
         |FROM w, wm
         |WHERE CAST(('0x' || substr(md5('graft-ppl-temp' || '|' ||
         |        CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 1000000
         |      < w20 * 1000000 // wmax20
         |ORDER BY doc_id""".stripMargin,

    "events_entropy_user" ->
      s"""WITH counts AS (
         |  SELECT user_id, event_type, count(*) AS cnt
         |  FROM events GROUP BY user_id, event_type),
         |${Log2Sql.chain("lgc", "SELECT DISTINCT cnt AS v FROM counts")},
         |per_user AS (
         |  SELECT user_id, CAST(SUM(cnt) AS BIGINT) AS n_events, COUNT(*) AS n_types,
         |         CAST(SUM(cnt * lgc.l20) AS BIGINT) AS scl
         |  FROM counts JOIN lgc ON lgc.v = counts.cnt
         |  GROUP BY user_id),
         |${Log2Sql.chain("lgn", "SELECT DISTINCT n_events AS v FROM per_user")}
         |SELECT user_id, n_events, n_types,
         |       CAST(lgn.l20 - (scl // n_events) AS DOUBLE) / 1048576.0 AS entropy_bits
         |FROM per_user JOIN lgn ON lgn.v = per_user.n_events
         |ORDER BY user_id""".stripMargin,

    "text_zipf_slope" ->
      s"""WITH tok AS (
         |  SELECT lang,
         |         unnest(string_split(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')), ' ')) AS tok
         |  FROM documents),
         |counts AS (
         |  SELECT lang, tok, count(*) AS cnt
         |  FROM tok WHERE tok <> '' GROUP BY lang, tok),
         |ranked AS (
         |  SELECT lang, cnt,
         |         CAST(row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, tok) AS BIGINT) AS rnk
         |  FROM counts),
         |${Log2Sql.chain("lgr", "SELECT DISTINCT rnk AS v FROM ranked")},
         |${Log2Sql.chain("lgf", "SELECT DISTINCT cnt AS v FROM ranked")},
         |pts AS (
         |  SELECT lang, lgr.l20 >> 10 AS x, lgf.l20 >> 10 AS y
         |  FROM ranked
         |  JOIN lgr ON lgr.v = ranked.rnk
         |  JOIN lgf ON lgf.v = ranked.cnt),
         |sums AS (
         |  SELECT lang, COUNT(*) AS n_terms,
         |         SUM(x) AS sx, SUM(y) AS sy,
         |         SUM(x * y) AS sxy, SUM(x * x) AS sxx
         |  FROM pts GROUP BY lang)
         |SELECT lang, n_terms,
         |       CAST(CAST(n_terms AS DECIMAL(12,0)) * CAST(sxy AS DECIMAL(19,0))
         |              - CAST(sx AS DECIMAL(16,0)) * CAST(sy AS DECIMAL(16,0)) AS DOUBLE)
         |         / CAST(CAST(n_terms AS DECIMAL(12,0)) * CAST(sxx AS DECIMAL(19,0))
         |              - CAST(sx AS DECIMAL(16,0)) * CAST(sx AS DECIMAL(16,0)) AS DOUBLE)
         |         AS zipf_slope
         |FROM sums
         |WHERE n_terms >= 2
         |ORDER BY lang""".stripMargin,

    "agg_gini_impurity" ->
      """WITH c AS (
        |  SELECT c_mktsegment, o_orderpriority, count(*) AS c
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY c_mktsegment, o_orderpriority),
        |s AS (
        |  SELECT c_mktsegment, CAST(SUM(c) AS BIGINT) AS n_orders,
        |         COUNT(*) AS n_priorities, CAST(SUM(c * c) AS BIGINT) AS sq
        |  FROM c GROUP BY c_mktsegment)
        |SELECT c_mktsegment, n_orders, n_priorities,
        |       CAST(n_orders * n_orders - sq AS DOUBLE)
        |         / CAST(n_orders * n_orders AS DOUBLE) AS gini_impurity
        |FROM s
        |ORDER BY c_mktsegment""".stripMargin,

    // no integer division anywhere: per-token terms go negative and
    // Spark div (truncate) disagrees with DuckDB // (floor) there —
    // the one emitted double is an exact sum over n·2^20 (see
    // ops.InfoTheory.textKlDivergence). lgg, not lgN: DuckDB
    // identifiers are case-insensitive and lgN would collide with lgn.
    "text_kl_divergence" ->
      s"""WITH tok AS (
         |  SELECT lang,
         |         unnest(string_split(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')), ' ')) AS tok
         |  FROM documents),
         |counts AS (
         |  SELECT lang, tok, count(*) AS c
         |  FROM tok WHERE tok <> '' GROUP BY lang, tok),
         |corpus AS (SELECT tok, CAST(SUM(c) AS BIGINT) AS ctot FROM counts GROUP BY tok),
         |lang_tot AS (SELECT lang, CAST(SUM(c) AS BIGINT) AS n FROM counts GROUP BY lang),
         |grand AS (SELECT CAST(SUM(n) AS BIGINT) AS ntot FROM lang_tot),
         |${Log2Sql.chain("lgc", "SELECT DISTINCT c AS v FROM counts")},
         |${Log2Sql.chain("lgt", "SELECT DISTINCT ctot AS v FROM corpus")},
         |${Log2Sql.chain("lgn", "SELECT DISTINCT n AS v FROM lang_tot")},
         |${Log2Sql.chain("lgg", "SELECT DISTINCT ntot AS v FROM grand")}
         |SELECT counts.lang, lang_tot.n AS n_tokens,
         |       CAST(SUM(c * (lgc.l20 + lgg.l20 - lgn.l20 - lgt.l20)) AS DOUBLE)
         |         / CAST(lang_tot.n * 1048576 AS DOUBLE) AS kl_bits
         |FROM counts
         |JOIN corpus ON corpus.tok = counts.tok
         |JOIN lang_tot ON lang_tot.lang = counts.lang
         |CROSS JOIN grand
         |JOIN lgc ON lgc.v = counts.c
         |JOIN lgt ON lgt.v = corpus.ctot
         |JOIN lgn ON lgn.v = lang_tot.n
         |JOIN lgg ON lgg.v = grand.ntot
         |GROUP BY counts.lang, lang_tot.n
         |ORDER BY counts.lang""".stripMargin,

    // bigram adjacency via ZIPPED parallel unnests of the two
    // index-shifted list_transform projections (DuckDB evaluates
    // same-level unnests in lockstep); len >= 2 mirrors the
    // no-bigram cases (empty text tokenizes to [''], single token)
    "text_cond_entropy_bigram" ->
      s"""WITH tokarr AS (
         |  SELECT lang,
         |         string_split(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')), ' ') AS toks
         |  FROM documents),
         |big AS (
         |  SELECT lang,
         |         unnest(list_transform(generate_series(1, len(toks) - 1), i -> toks[i])) AS prev,
         |         unnest(list_transform(generate_series(1, len(toks) - 1), i -> toks[i + 1])) AS nxt
         |  FROM tokarr WHERE len(toks) >= 2),
         |c2 AS (
         |  SELECT lang, prev, nxt, count(*) AS c2
         |  FROM big GROUP BY lang, prev, nxt),
         |c1 AS (
         |  SELECT lang, prev, CAST(SUM(c2) AS BIGINT) AS c1
         |  FROM c2 GROUP BY lang, prev),
         |ctx AS (SELECT lang, count(*) AS n_contexts FROM c1 GROUP BY lang),
         |${Log2Sql.chain("lgb", "SELECT DISTINCT c2 AS v FROM c2")},
         |${Log2Sql.chain("lgx", "SELECT DISTINCT c1 AS v FROM c1")},
         |agg AS (
         |  SELECT c2.lang, CAST(SUM(c2.c2) AS BIGINT) AS n_bigrams,
         |         CAST(SUM(c2.c2 * (lgx.l20 - lgb.l20)) AS BIGINT) AS num
         |  FROM c2
         |  JOIN c1 ON c1.lang = c2.lang AND c1.prev = c2.prev
         |  JOIN lgb ON lgb.v = c2.c2
         |  JOIN lgx ON lgx.v = c1.c1
         |  GROUP BY c2.lang)
         |SELECT agg.lang, n_bigrams, n_contexts,
         |       CAST(num AS DOUBLE) / CAST(n_bigrams * 1048576 AS DOUBLE)
         |         AS cond_entropy_bits
         |FROM agg JOIN ctx ON ctx.lang = agg.lang
         |ORDER BY agg.lang""".stripMargin,

    // ops.InfoTheory.textPmiCollocations: pmi_20 = L(c·N) − L(cl·cr)
    // on the Log2Sql chain over the two product values
    "text_pmi_collocations" ->
      s"""WITH tokarr AS (
         |  SELECT lang,
         |         string_split(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')), ' ') AS toks
         |  FROM documents),
         |big AS (
         |  SELECT lang,
         |         unnest(list_transform(generate_series(1, len(toks) - 1), i -> toks[i])) AS w1,
         |         unnest(list_transform(generate_series(1, len(toks) - 1), i -> toks[i + 1])) AS w2
         |  FROM tokarr WHERE len(toks) >= 2),
         |c2 AS (
         |  SELECT lang, w1, w2, CAST(count(*) AS BIGINT) AS c_pair
         |  FROM big GROUP BY 1, 2, 3),
         |cl AS (SELECT lang, w1, CAST(SUM(c_pair) AS BIGINT) AS c_left FROM c2 GROUP BY 1, 2),
         |cr AS (SELECT lang, w2, CAST(SUM(c_pair) AS BIGINT) AS c_right FROM c2 GROUP BY 1, 2),
         |nb AS (SELECT lang, CAST(SUM(c_pair) AS BIGINT) AS n_bigrams FROM c2 GROUP BY 1),
         |joined AS (
         |  SELECT c2.lang, c2.w1, c2.w2, c2.c_pair, cl.c_left, cr.c_right, nb.n_bigrams,
         |         c2.c_pair * nb.n_bigrams AS pn, cl.c_left * cr.c_right AS pd
         |  FROM c2
         |  JOIN cl ON cl.lang = c2.lang AND cl.w1 = c2.w1
         |  JOIN cr ON cr.lang = c2.lang AND cr.w2 = c2.w2
         |  JOIN nb ON nb.lang = c2.lang
         |  WHERE c2.c_pair >= 5),
         |${Log2Sql.chain("lgn", "SELECT DISTINCT pn AS v FROM joined")},
         |${Log2Sql.chain("lgd", "SELECT DISTINCT pd AS v FROM joined")},
         |ranked AS (
         |  SELECT joined.*, lgn.l20 - lgd.l20 AS pmi_20,
         |         CAST(row_number() OVER (PARTITION BY joined.lang
         |                ORDER BY lgn.l20 - lgd.l20 DESC, joined.w1, joined.w2) AS BIGINT) AS rank
         |  FROM joined
         |  JOIN lgn ON lgn.v = joined.pn
         |  JOIN lgd ON lgd.v = joined.pd)
         |SELECT lang, rank, w1, w2, c_pair, c_left, c_right, n_bigrams,
         |       CAST(pmi_20 AS BIGINT) AS pmi_20
         |FROM ranked WHERE rank <= 20
         |ORDER BY lang, rank""".stripMargin,

    "graph_adamic_adar" ->
      s"""WITH e0 AS (
         |  SELECT l_partkey AS src,
         |         lead(l_partkey) OVER (PARTITION BY l_orderkey
         |                               ORDER BY l_linenumber, l_partkey) AS dst
         |  FROM lineitem),
         |und AS (
         |  SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
         |  FROM e0 WHERE dst IS NOT NULL AND dst <> src),
         |adj AS (
         |  SELECT u AS node, v AS nbr FROM und
         |  UNION ALL SELECT v, u FROM und),
         |deg AS (
         |  SELECT nbr, count(*) AS deg FROM adj GROUP BY nbr HAVING count(*) >= 2),
         |${Log2Sql.chain("lgd", "SELECT DISTINCT deg AS v FROM deg")},
         |cw AS (
         |  SELECT deg.nbr, 1099511627776 // lgd.l20 AS r
         |  FROM deg JOIN lgd ON lgd.v = deg.deg)
         |SELECT x.node AS a, y.node AS b, count(*) AS common,
         |       CAST(SUM(cw.r) AS DOUBLE) / 1048576.0 AS adamic_adar
         |FROM adj x
         |JOIN cw ON cw.nbr = x.nbr
         |JOIN adj y ON y.nbr = x.nbr AND x.node < y.node
         |JOIN und e ON e.u = x.node AND e.v = y.node
         |GROUP BY x.node, y.node
         |ORDER BY adamic_adar DESC, a, b
         |LIMIT 20""".stripMargin,
  )

  // ops.Bpe: k left-greedy merge rounds (optionally threshold-
  // stopped); the rule is re-derived per round inside the SQL
  // (count DESC, pair lex), so the oracle is fully independent —
  // see BpeSql for the islands formulation of left-greedy
  // application.
  private def bpeOracle(k: Int, minCount: Long): String =
    s"""WITH words AS (
       |  SELECT unnest(string_split(regexp_replace(trim(text), '\\s+', ' ', 'g'), ' ')) AS w
       |  FROM documents WHERE trim(text) <> ''),
       |wc AS MATERIALIZED (SELECT w, count(*) AS cnt FROM words WHERE w <> '' GROUP BY w),
       |s0 AS MATERIALIZED (
       |  SELECT w, CAST(u.i AS BIGINT) - 1 AS pos,
       |         substr(w, CAST(u.i AS INT), 1) AS sym
       |  FROM wc, unnest(generate_series(1, CAST(len(w) AS BIGINT))) AS u(i)),
       |${BpeSql.chain(k, minCount)}
       |SELECT s.w, string_agg(s.sym, ' ' ORDER BY s.pos) AS merged,
       |       count(*) AS n_syms, wc.cnt AS n_occ
       |FROM ${BpeSql.finalTable(k)} s JOIN wc ON wc.w = s.w
       |GROUP BY s.w, wc.cnt
       |ORDER BY s.w""".stripMargin

  private val bpe: Map[String, String] = Map(
    "text_bpe_merge" -> bpeOracle(3, 1L),
    "text_bpe_train" -> bpeOracle(8, 1500L),
    // ops.Bpe.textBpeTokenize: per-doc segmentation stats under the
    // k=8 / minCount=1500 trained tokenizer. Reuses the training
    // chain, then joins the word-OCCURRENCE stream per document.
    "text_bpe_tokenize" ->
      s"""WITH words AS (
         |  SELECT unnest(string_split(regexp_replace(trim(text), '\\s+', ' ', 'g'), ' ')) AS w
         |  FROM documents WHERE trim(text) <> ''),
         |wc AS MATERIALIZED (SELECT w, count(*) AS cnt FROM words WHERE w <> '' GROUP BY w),
         |s0 AS MATERIALIZED (
         |  SELECT w, CAST(u.i AS BIGINT) - 1 AS pos,
         |         substr(w, CAST(u.i AS INT), 1) AS sym
         |  FROM wc, unnest(generate_series(1, CAST(len(w) AS BIGINT))) AS u(i)),
         |${BpeSql.chain(8, 1500L)},
         |model AS MATERIALIZED (
         |  SELECT w, count(*) AS n_syms FROM ${BpeSql.finalTable(8)} GROUP BY w),
         |docw AS (
         |  SELECT doc_id,
         |         unnest(string_split(regexp_replace(trim(text), '\\s+', ' ', 'g'), ' ')) AS w
         |  FROM documents WHERE trim(text) <> '')
         |SELECT doc_id, count(*) AS n_words,
         |       CAST(SUM(model.n_syms) AS BIGINT) AS n_bpe_tokens,
         |       CAST(SUM(len(docw.w)) AS BIGINT) AS n_chars,
         |       CAST(CAST(SUM(len(docw.w)) AS BIGINT) AS DOUBLE)
         |         / CAST(CAST(SUM(model.n_syms) AS BIGINT) AS DOUBLE) AS chars_per_token
         |FROM docw JOIN model ON model.w = docw.w
         |WHERE docw.w <> ''
         |GROUP BY doc_id
         |ORDER BY doc_id""".stripMargin,

    // ops.Bpe.textBpeRules: the merge-rule table under the training
    // parameters — per executed round, the argmax pair + its count.
    "text_bpe_rules" ->
      s"""WITH words AS (
         |  SELECT unnest(string_split(regexp_replace(trim(text), '\\s+', ' ', 'g'), ' ')) AS w
         |  FROM documents WHERE trim(text) <> ''),
         |wc AS MATERIALIZED (SELECT w, count(*) AS cnt FROM words WHERE w <> '' GROUP BY w),
         |s0 AS MATERIALIZED (
         |  SELECT w, CAST(u.i AS BIGINT) - 1 AS pos,
         |         substr(w, CAST(u.i AS INT), 1) AS sym
         |  FROM wc, unnest(generate_series(1, CAST(len(w) AS BIGINT))) AS u(i)),
         |${BpeSql.chain(8, 1500L)}
         |${(0 until 8).map(r =>
             s"SELECT $r AS round, b.pa, b.pb, CAST(bp.pc AS BIGINT) AS pc FROM best$r b " +
               s"JOIN bp$r bp ON bp.pa = b.pa AND bp.pb = b.pb")
             .mkString("", "\nUNION ALL\n", "")}
         |ORDER BY round""".stripMargin,

    // ops.Bpe.textBpeFertility: per-language fertility (tokens/word)
    // and compression (chars/token) of the k=8/minCount=1500 trained
    // tokenizer. The occurrence stream collapses to (lang, w) counts
    // BEFORE joining the model — the Spark side's aggregate-before-
    // join shape, replayed so the weighting is cross-checked too.
    "text_bpe_fertility" ->
      s"""WITH words AS (
         |  SELECT unnest(string_split(regexp_replace(trim(text), '\\s+', ' ', 'g'), ' ')) AS w
         |  FROM documents WHERE trim(text) <> ''),
         |wc AS MATERIALIZED (SELECT w, count(*) AS cnt FROM words WHERE w <> '' GROUP BY w),
         |s0 AS MATERIALIZED (
         |  SELECT w, CAST(u.i AS BIGINT) - 1 AS pos,
         |         substr(w, CAST(u.i AS INT), 1) AS sym
         |  FROM wc, unnest(generate_series(1, CAST(len(w) AS BIGINT))) AS u(i)),
         |${BpeSql.chain(8, 1500L)},
         |model AS MATERIALIZED (
         |  SELECT w, count(*) AS n_syms FROM ${BpeSql.finalTable(8)} GROUP BY w),
         |lw AS (
         |  SELECT lang,
         |         unnest(string_split(regexp_replace(trim(text), '\\s+', ' ', 'g'), ' ')) AS w
         |  FROM documents WHERE trim(text) <> ''),
         |lwc AS (
         |  SELECT lang, w, count(*) AS cnt FROM lw WHERE w <> '' GROUP BY lang, w)
         |SELECT lang,
         |       CAST(SUM(lwc.cnt) AS BIGINT) AS n_words,
         |       CAST(SUM(lwc.cnt * model.n_syms) AS BIGINT) AS n_tokens,
         |       CAST(SUM(lwc.cnt * len(lwc.w)) AS BIGINT) AS n_chars,
         |       CAST(CAST(SUM(lwc.cnt * model.n_syms) AS BIGINT) AS DOUBLE)
         |         / CAST(CAST(SUM(lwc.cnt) AS BIGINT) AS DOUBLE) AS fertility,
         |       CAST(CAST(SUM(lwc.cnt * len(lwc.w)) AS BIGINT) AS DOUBLE)
         |         / CAST(CAST(SUM(lwc.cnt * model.n_syms) AS BIGINT) AS DOUBLE) AS chars_per_token
         |FROM lwc JOIN model ON model.w = lwc.w
         |GROUP BY lang
         |ORDER BY lang""".stripMargin,

    // ops.Bpe.textBpeApply: learn on documents, segment PART NAMES —
    // the training chain derives each best$r, the apply chain
    // (BpeSql.applyChain) replays the merges over the part-name
    // vocabulary without ever re-deriving a rule.
    "text_bpe_apply" ->
      s"""WITH words AS (
         |  SELECT unnest(string_split(regexp_replace(trim(text), '\\s+', ' ', 'g'), ' ')) AS w
         |  FROM documents WHERE trim(text) <> ''),
         |wc AS MATERIALIZED (SELECT w, count(*) AS cnt FROM words WHERE w <> '' GROUP BY w),
         |s0 AS MATERIALIZED (
         |  SELECT w, CAST(u.i AS BIGINT) - 1 AS pos,
         |         substr(w, CAST(u.i AS INT), 1) AS sym
         |  FROM wc, unnest(generate_series(1, CAST(len(w) AS BIGINT))) AS u(i)),
         |${BpeSql.chain(8, 1500L)},
         |pwords AS (
         |  SELECT unnest(string_split(regexp_replace(trim(p_name), '\\s+', ' ', 'g'), ' ')) AS w
         |  FROM part WHERE trim(p_name) <> ''),
         |twc AS MATERIALIZED (SELECT w, count(*) AS cnt FROM pwords WHERE w <> '' GROUP BY w),
         |t0 AS MATERIALIZED (
         |  SELECT w, CAST(u.i AS BIGINT) - 1 AS pos,
         |         substr(w, CAST(u.i AS INT), 1) AS sym
         |  FROM twc, unnest(generate_series(1, CAST(len(w) AS BIGINT))) AS u(i)),
         |${BpeSql.applyChain(8)}
         |SELECT s.w, string_agg(s.sym, ' ' ORDER BY s.pos) AS merged,
         |       count(*) AS n_syms, twc.cnt AS n_occ
         |FROM ${BpeSql.applyFinalTable(8)} s JOIN twc ON twc.w = s.w
         |GROUP BY s.w, twc.cnt
         |ORDER BY s.w""".stripMargin,
  )

  private val bipartite: Map[String, String] = Map(
    // ops.Bipartite: the customer×brand projection and the τ=0.95
    // all-pairs profile similarity join. The oracle is the BRUTE
    // FORCE pairwise form — it never assumes the Δ≤1 deletion-
    // neighborhood completeness bound the Spark side exploits, so a
    // corpus that broke the bound would fail the gate loudly.
    "orders_brand_profile" ->
      """WITH cb AS (
        |  SELECT DISTINCT o_custkey AS c, p_brand AS e
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN part ON l_partkey = p_partkey)
        |SELECT c AS custkey, count(*) AS n_brands,
        |       string_agg(e, ',' ORDER BY e) AS profile
        |FROM cb GROUP BY c
        |ORDER BY custkey""".stripMargin,

    "sim_profile_allpairs" ->
      """WITH cb AS (
        |  SELECT DISTINCT o_custkey AS c, p_brand AS e
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN part ON l_partkey = p_partkey),
        |sz AS (SELECT c, count(*) AS sz FROM cb GROUP BY c),
        |inter AS (
        |  SELECT a.c AS ca, b.c AS cb2, count(*) AS i
        |  FROM cb a JOIN cb b ON a.e = b.e AND a.c < b.c
        |  GROUP BY a.c, b.c)
        |SELECT ca AS a_id, cb2 AS b_id, i AS inter,
        |       sa.sz + sb.sz - i AS uni,
        |       CAST(i AS DOUBLE) / CAST(sa.sz + sb.sz - i AS DOUBLE) AS jaccard
        |FROM inter
        |JOIN sz sa ON sa.c = ca
        |JOIN sz sb ON sb.c = cb2
        |WHERE 20 * i >= 19 * (sa.sz + sb.sz - i)
        |ORDER BY a_id, b_id""".stripMargin,

    // ops.Bipartite.simProfileClusters: transitive closure of the
    // τ=0.95 pair relation. Same brute-force pair set as above (never
    // assumes the deletion-neighborhood bound), then recursive-CTE
    // reachability with min-id labeling — the dedup_connected_
    // components oracle pattern on the profile graph.
    "sim_profile_clusters" ->
      """WITH RECURSIVE cb AS (
        |  SELECT DISTINCT o_custkey AS c, p_brand AS e
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN part ON l_partkey = p_partkey),
        |sz AS (SELECT c, count(*) AS sz FROM cb GROUP BY c),
        |pairs AS (
        |  SELECT ca AS a_id, cb2 AS b_id FROM (
        |    SELECT a.c AS ca, b.c AS cb2, count(*) AS i
        |    FROM cb a JOIN cb b ON a.e = b.e AND a.c < b.c
        |    GROUP BY a.c, b.c) x
        |  JOIN sz sa ON sa.c = ca
        |  JOIN sz sb ON sb.c = cb2
        |  WHERE 20 * i >= 19 * (sa.sz + sb.sz - i)),
        |edges AS (
        |  SELECT a_id AS u, b_id AS v FROM pairs
        |  UNION ALL
        |  SELECT b_id, a_id FROM pairs),
        |walk(id, reach) AS (
        |  SELECT u, u FROM edges GROUP BY u
        |  UNION
        |  SELECT w.id, e.v FROM walk w JOIN edges e ON w.reach = e.u)
        |SELECT id AS custkey, min(reach) AS cluster_id
        |FROM walk GROUP BY id ORDER BY custkey""".stripMargin,

    // ops.Bipartite.dedupClusterHistogram: same reachability closure,
    // rolled up to the size histogram + the singleton mass so the
    // rows partition the whole profiled population
    "dedup_cluster_histogram" ->
      """WITH RECURSIVE cb AS (
        |  SELECT DISTINCT o_custkey AS c, p_brand AS e
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN part ON l_partkey = p_partkey),
        |sz AS (SELECT c, count(*) AS sz FROM cb GROUP BY c),
        |pairs AS (
        |  SELECT ca AS a_id, cb2 AS b_id FROM (
        |    SELECT a.c AS ca, b.c AS cb2, count(*) AS i
        |    FROM cb a JOIN cb b ON a.e = b.e AND a.c < b.c
        |    GROUP BY a.c, b.c) x
        |  JOIN sz sa ON sa.c = ca
        |  JOIN sz sb ON sb.c = cb2
        |  WHERE 20 * i >= 19 * (sa.sz + sb.sz - i)),
        |edges AS (
        |  SELECT a_id AS u, b_id AS v FROM pairs
        |  UNION ALL
        |  SELECT b_id, a_id FROM pairs),
        |walk(id, reach) AS (
        |  SELECT u, u FROM edges GROUP BY u
        |  UNION
        |  SELECT w.id, e.v FROM walk w JOIN edges e ON w.reach = e.u),
        |lab AS (SELECT id, min(reach) AS cid FROM walk GROUP BY id),
        |csz AS (SELECT cid, count(*) AS size FROM lab GROUP BY cid),
        |hist AS (
        |  SELECT size, count(*) AS n_clusters, size * count(*) AS n_customers
        |  FROM csz GROUP BY size),
        |single AS (
        |  SELECT count(*) AS n FROM sz WHERE c NOT IN (SELECT id FROM lab))
        |SELECT size, n_clusters, n_customers FROM hist
        |UNION ALL
        |SELECT CAST(1 AS BIGINT), n, n FROM single WHERE n > 0
        |ORDER BY size""".stripMargin,

    // ops.Bipartite.sampleClusterInverse: representative always kept,
    // members gated at ppm threshold 10^6 // size (house md5 salt
    // graft-cluster-inv)
    "sample_cluster_inverse" ->
      """WITH RECURSIVE cb AS (
        |  SELECT DISTINCT o_custkey AS c, p_brand AS e
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN part ON l_partkey = p_partkey),
        |sz AS (SELECT c, count(*) AS sz FROM cb GROUP BY c),
        |pairs AS (
        |  SELECT ca AS a_id, cb2 AS b_id FROM (
        |    SELECT a.c AS ca, b.c AS cb2, count(*) AS i
        |    FROM cb a JOIN cb b ON a.e = b.e AND a.c < b.c
        |    GROUP BY a.c, b.c) x
        |  JOIN sz sa ON sa.c = ca
        |  JOIN sz sb ON sb.c = cb2
        |  WHERE 20 * i >= 19 * (sa.sz + sb.sz - i)),
        |edges AS (
        |  SELECT a_id AS u, b_id AS v FROM pairs
        |  UNION ALL
        |  SELECT b_id, a_id FROM pairs),
        |walk(id, reach) AS (
        |  SELECT u, u FROM edges GROUP BY u
        |  UNION
        |  SELECT w.id, e.v FROM walk w JOIN edges e ON w.reach = e.u),
        |lab AS (SELECT id, min(reach) AS cid FROM walk GROUP BY id),
        |csz AS (SELECT cid, count(*) AS size FROM lab GROUP BY cid)
        |SELECT l.id AS custkey, l.cid AS cluster_id, c.size,
        |       1000000 // c.size AS thr
        |FROM lab l JOIN csz c ON c.cid = l.cid
        |WHERE l.id = l.cid
        |   OR CAST(('0x' || substr(md5('graft-cluster-inv' || '|' || CAST(l.id AS VARCHAR)), 1, 8))
        |           AS BIGINT) % 1000000 < 1000000 // c.size
        |ORDER BY custkey""".stripMargin,
  )

  // ops.Insights + the round-11 second-session SQL-path key. Same
  // determinism contracts as the Spark side: exact integer cents/ppm,
  // nearest-rank deciles, calendar RANGE frames, and the chi-square
  // floats in the identical pinned three-step IEEE order.
  private val insights: Map[String, String] = Map(
    "sql_tpch_q5" ->
      """SELECT n_name,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |                (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin,

    "orders_pareto_share" ->
      """WITH rev AS (
        |  SELECT c_mktsegment AS segment, o_custkey,
        |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS rev_cents
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY 1, 2),
        |ranked AS (
        |  SELECT segment, o_custkey, rev_cents,
        |         ROW_NUMBER() OVER (PARTITION BY segment
        |                            ORDER BY rev_cents DESC, o_custkey) AS rn,
        |         COUNT(*) OVER (PARTITION BY segment) AS n
        |  FROM rev),
        |g AS (
        |  SELECT segment, (rn - 1) * 10 // n + 1 AS decile,
        |         count(*) AS n_customers,
        |         CAST(sum(rev_cents) AS BIGINT) AS rev_cents
        |  FROM ranked GROUP BY 1, 2)
        |SELECT segment, decile, n_customers, rev_cents,
        |       CAST(SUM(rev_cents) OVER (PARTITION BY segment ORDER BY decile) AS BIGINT)
        |         * 1000000
        |         // CAST(SUM(rev_cents) OVER (PARTITION BY segment) AS BIGINT) AS cum_share_ppm
        |FROM g
        |ORDER BY segment, decile""".stripMargin,

    "events_burst_days" ->
      """WITH daily AS (
        |  SELECT event_type,
        |         CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT) AS epoch_day,
        |         count(*) AS cnt
        |  FROM events GROUP BY 1, 2),
        |w AS (
        |  SELECT event_type, epoch_day, cnt,
        |         CAST(COALESCE(SUM(cnt) OVER tw, 0) AS BIGINT) AS prev7,
        |         CAST(COUNT(*) OVER tw AS BIGINT) AS days7
        |  FROM daily
        |  WINDOW tw AS (PARTITION BY event_type ORDER BY epoch_day
        |                RANGE BETWEEN 7 PRECEDING AND 1 PRECEDING))
        |SELECT event_type, epoch_day, cnt, prev7, days7,
        |       CAST(CASE WHEN days7 >= 4 AND cnt * days7 > 2 * prev7
        |                 THEN 1 ELSE 0 END AS BIGINT) AS is_burst
        |FROM w
        |ORDER BY event_type, epoch_day""".stripMargin,

    // ops.Insights.eventsHhiConcentration: squared-share user
    // concentration cells; hhi = one IEEE division of exact longs.
    "events_hhi_concentration" ->
      """WITH pu AS (
        |  SELECT event_type, user_id, count(*) AS cnt
        |  FROM events GROUP BY 1, 2)
        |SELECT event_type,
        |       count(*) AS n_users,
        |       CAST(sum(cnt) AS BIGINT) AS total,
        |       CAST(sum(cnt * cnt) AS BIGINT) AS sum_sq,
        |       CAST(CAST(sum(cnt * cnt) AS BIGINT) AS DOUBLE)
        |         / CAST(CAST(sum(cnt) AS BIGINT) * CAST(sum(cnt) AS BIGINT) AS DOUBLE) AS hhi
        |FROM pu
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,

    // ops.Insights.eventsSnaiveBacktest: lag-7/lag-1 calendar
    // forecast backtest cells — calendar joins, never row lags.
    "events_snaive_backtest" ->
      """WITH daily AS (
        |  SELECT event_type,
        |         CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT) AS d,
        |         count(*) AS cnt
        |  FROM events GROUP BY 1, 2),
        |j AS (
        |  SELECT a.event_type, a.d, a.cnt, p7.cnt AS prev7, p1.cnt AS prev1
        |  FROM daily a
        |  LEFT JOIN daily p7 ON p7.event_type = a.event_type AND p7.d = a.d - 7
        |  LEFT JOIN daily p1 ON p1.event_type = a.event_type AND p1.d = a.d - 1)
        |SELECT event_type,
        |       CAST(count(CASE WHEN prev7 IS NOT NULL THEN 1 END) AS BIGINT) AS n7,
        |       CAST(sum(CASE WHEN prev7 IS NOT NULL THEN abs(cnt - prev7) END) AS BIGINT) AS sae7,
        |       CAST(sum(CASE WHEN prev7 IS NOT NULL THEN cnt - prev7 END) AS BIGINT) AS bias7,
        |       CAST(max(CASE WHEN prev7 IS NOT NULL THEN abs(cnt - prev7) END) AS BIGINT) AS maxae7,
        |       CAST(count(CASE WHEN prev1 IS NOT NULL THEN 1 END) AS BIGINT) AS n1,
        |       CAST(sum(CASE WHEN prev1 IS NOT NULL THEN abs(cnt - prev1) END) AS BIGINT) AS sae1,
        |       CAST(sum(CASE WHEN prev1 IS NOT NULL THEN cnt - prev1 END) AS BIGINT) AS bias1,
        |       CAST(max(CASE WHEN prev1 IS NOT NULL THEN abs(cnt - prev1) END) AS BIGINT) AS maxae1,
        |       CAST(sum(CASE WHEN prev7 IS NOT NULL THEN cnt END) AS BIGINT) AS sum_actual7
        |FROM j
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,

    // ops.Insights.eventsPeakConcurrency: session-interval sweep;
    // the oracle's STRAIGHT per-day cumulative against the Spark
    // side's day-blocked two-level form is the decomposition proof.
    "events_peak_concurrency" ->
      """WITH g AS (
        |  SELECT user_id, ts, event_id,
        |         CASE WHEN lag(ts) OVER w IS NULL
        |                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
        |              THEN 1 ELSE 0 END AS brk
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (
        |  SELECT user_id, ts,
        |         CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT)
        |           AS session_seq
        |  FROM g),
        |sess AS (
        |  SELECT user_id, session_seq,
        |         CAST(min(epoch_us(ts)) AS BIGINT) AS a,
        |         CAST(max(epoch_us(ts)) AS BIGINT) AS b
        |  FROM s GROUP BY user_id, session_seq),
        |deltas AS (
        |  SELECT us, CAST(SUM(delta) AS BIGINT) AS delta FROM (
        |    SELECT a AS us, 1 AS delta FROM sess
        |    UNION ALL SELECT b + 1, -1 FROM sess)
        |  GROUP BY us),
        |dd AS (SELECT us, delta, us // 86400000000 AS d FROM deltas),
        |pd AS (SELECT d, CAST(SUM(delta) AS BIGINT) AS day_tot FROM dd GROUP BY d),
        |carry AS (
        |  SELECT a.d, CAST(COALESCE(SUM(b.day_tot), 0) AS BIGINT) AS carry_in
        |  FROM pd a LEFT JOIN pd b ON b.d < a.d GROUP BY a.d),
        |cum AS (
        |  SELECT d, us, delta,
        |         CAST(SUM(delta) OVER (PARTITION BY d ORDER BY us) AS BIGINT) AS cum_in
        |  FROM dd)
        |SELECT cum.d, count(*) AS n_bounds,
        |       CAST(MAX(carry.carry_in) AS BIGINT) AS carry_in,
        |       CAST(greatest(MAX(carry.carry_in),
        |                     MAX(carry.carry_in + cum.cum_in)) AS BIGINT) AS peak
        |FROM cum JOIN carry ON carry.d = cum.d
        |GROUP BY cum.d
        |ORDER BY cum.d""".stripMargin,

    // ops.Insights.eventsTheilsenTrend: median pairwise slope per
    // type; selection order (slope_double, dy, dx, d1, d2) is total
    // and cross-engine identical (double of exact longs + int tail).
    "events_theilsen_trend" ->
      """WITH daily AS (
        |  SELECT event_type,
        |         CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT) AS epoch_day,
        |         count(*) AS cnt
        |  FROM events GROUP BY 1, 2),
        |nd AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_days FROM daily GROUP BY 1),
        |pairs AS (
        |  SELECT a.event_type,
        |         CAST(b.cnt - a.cnt AS BIGINT) AS dy,
        |         CAST(b.epoch_day - a.epoch_day AS BIGINT) AS dx,
        |         a.epoch_day AS d1, b.epoch_day AS d2,
        |         CAST(CAST(b.cnt - a.cnt AS BIGINT) AS DOUBLE)
        |           / CAST(b.epoch_day - a.epoch_day AS DOUBLE) AS slope
        |  FROM daily a
        |  JOIN daily b ON b.event_type = a.event_type AND b.epoch_day > a.epoch_day),
        |rk AS (
        |  SELECT *,
        |         row_number() OVER (PARTITION BY event_type
        |                            ORDER BY slope, dy, dx, d1, d2) AS rn,
        |         CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS np
        |  FROM pairs)
        |SELECT rk.event_type, nd.n_days, rk.np AS n_pairs, rk.dy, rk.dx, rk.slope
        |FROM rk JOIN nd ON nd.event_type = rk.event_type
        |WHERE rk.rn = (rk.np + 1) // 2
        |ORDER BY rk.event_type""".stripMargin,

    // ops.Insights.statMannKendall: integer S + tie-corrected
    // 18-scaled variance numerator over the daily rollup
    "stat_mann_kendall" ->
      """WITH daily AS (
        |  SELECT event_type,
        |         CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT) AS epoch_day,
        |         CAST(count(*) AS BIGINT) AS cnt
        |  FROM events GROUP BY 1, 2),
        |s AS (
        |  SELECT a.event_type,
        |         CAST(SUM(CASE WHEN b.cnt > a.cnt THEN 1
        |                       WHEN b.cnt < a.cnt THEN -1 ELSE 0 END) AS BIGINT) AS s_stat,
        |         count(*) AS n_pairs
        |  FROM daily a
        |  JOIN daily b ON b.event_type = a.event_type AND b.epoch_day > a.epoch_day
        |  GROUP BY 1),
        |tie AS (
        |  SELECT event_type,
        |         CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_num,
        |         CAST(SUM(t) AS BIGINT) AS n_days
        |  FROM (SELECT event_type, cnt, CAST(count(*) AS BIGINT) AS t
        |        FROM daily GROUP BY 1, 2)
        |  GROUP BY 1)
        |SELECT s.event_type, tie.n_days, s.n_pairs, s.s_stat, tie.tie_num,
        |       CAST(tie.n_days * (tie.n_days - 1) * (2 * tie.n_days + 5)
        |            - tie.tie_num AS BIGINT) AS var18_num
        |FROM s JOIN tie ON tie.event_type = s.event_type
        |ORDER BY s.event_type""".stripMargin,

    // ops.Insights.eventsShapleyAttribution: exact power-set Shapley
    // over the 4 non-purchase channels, phi emitted x 4! = 24
    "events_shapley_attribution" ->
      """WITH ch0 AS (
        |  SELECT DISTINCT event_type AS t FROM events WHERE event_type <> 'purchase'),
        |channels AS (
        |  SELECT a.t, CAST(count(b.t) AS BIGINT) AS bit
        |  FROM ch0 a LEFT JOIN ch0 b ON b.t < a.t GROUP BY a.t),
        |firstbuy AS (
        |  SELECT user_id, min(ts) AS buy_ts FROM events
        |  WHERE event_type = 'purchase' GROUP BY 1),
        |masks AS (
        |  SELECT e.user_id, CAST(bit_or(1 << CAST(c.bit AS INT)) AS BIGINT) AS mask
        |  FROM events e
        |  JOIN channels c ON c.t = e.event_type
        |  JOIN firstbuy f ON f.user_id = e.user_id
        |  WHERE e.ts < f.buy_ts GROUP BY e.user_id),
        |convmask AS (
        |  SELECT COALESCE(m.mask, 0) AS mask, CAST(count(*) AS BIGINT) AS m
        |  FROM firstbuy f LEFT JOIN masks m ON m.user_id = f.user_id GROUP BY 1),
        |subsets AS (SELECT CAST(range AS BIGINT) AS s FROM range(16)),
        |v AS (
        |  SELECT s, CAST(COALESCE(SUM(m), 0) AS BIGINT) AS v
        |  FROM subsets LEFT JOIN convmask ON (mask & s) = mask GROUP BY s),
        |terms AS (
        |  SELECT c.t AS channel, c.bit,
        |         (CASE bit_count(v1.s) WHEN 0 THEN 6 WHEN 1 THEN 2
        |               WHEN 2 THEN 2 WHEN 3 THEN 6 END) * (v2.v - v1.v) AS term
        |  FROM channels c
        |  JOIN v v1 ON (v1.s & (1 << CAST(c.bit AS INT))) = 0
        |  JOIN v v2 ON v2.s = v1.s + (1 << CAST(c.bit AS INT)))
        |SELECT channel, bit, CAST(SUM(term) AS BIGINT) AS phi_x24
        |FROM terms GROUP BY 1, 2
        |ORDER BY channel""".stripMargin,

    // ops.Insights.ordersPriceElasticity: log-log slope cells on the
    // Log2Sql chain over the distinct cell values (rev and qty)
    "orders_price_elasticity" ->
      s"""WITH cells AS (
         |  SELECT p.p_brand AS brand, strftime(CAST(l_shipdate AS DATE), '%Y-%m') AS month,
         |         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS BIGINT) AS q_units,
         |         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS rev_cents
         |  FROM lineitem JOIN part p ON p.p_partkey = l_partkey
         |  GROUP BY 1, 2),
         |pos AS (SELECT * FROM cells WHERE q_units > 0 AND rev_cents > 0),
         |${Log2Sql.chain("lg",
            "SELECT DISTINCT q_units AS v FROM pos " +
              "UNION SELECT DISTINCT rev_cents AS v FROM pos")},
         |xy AS (
         |  SELECT brand,
         |         (lr.l20 - lq.l20) // 1024 AS x,
         |         lq.l20 // 1024 AS y
         |  FROM pos
         |  JOIN lg lr ON lr.v = pos.rev_cents
         |  JOIN lg lq ON lq.v = pos.q_units),
         |agg AS (
         |  SELECT brand, CAST(count(*) AS BIGINT) AS n_months,
         |         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         |         CAST(SUM(x * y) AS BIGINT) AS sxy, CAST(SUM(x * x) AS BIGINT) AS sxx
         |  FROM xy GROUP BY brand)
         |SELECT brand, n_months,
         |       CAST(n_months * sxy - sx * sy AS BIGINT) AS slope_num,
         |       CAST(n_months * sxx - sx * sx AS BIGINT) AS slope_den
         |FROM agg
         |WHERE n_months * sxx - sx * sx <> 0
         |ORDER BY brand""".stripMargin,

    // ops.Insights.eventsShapleySampled: hash-seeded permutation
    // sampling — both engines derive the IDENTICAL permutation set
    // from md5 ranks, so the Monte Carlo cells are exact integers
    "events_shapley_sampled" ->
      """WITH ch0 AS (
        |  SELECT DISTINCT event_type AS t FROM events WHERE event_type <> 'purchase'),
        |channels AS (
        |  SELECT a.t, CAST(count(b.t) AS BIGINT) AS bit
        |  FROM ch0 a LEFT JOIN ch0 b ON b.t < a.t GROUP BY a.t),
        |firstbuy AS (
        |  SELECT user_id, min(ts) AS buy_ts FROM events
        |  WHERE event_type = 'purchase' GROUP BY 1),
        |masks AS (
        |  SELECT e.user_id, CAST(bit_or(CAST(1 AS BIGINT) << CAST(c.bit AS INT)) AS BIGINT) AS mask
        |  FROM events e
        |  JOIN channels c ON c.t = e.event_type
        |  JOIN firstbuy f ON f.user_id = e.user_id
        |  WHERE e.ts < f.buy_ts GROUP BY e.user_id),
        |convmask AS (
        |  SELECT COALESCE(m.mask, 0) AS mask, CAST(count(*) AS BIGINT) AS m
        |  FROM firstbuy f LEFT JOIN masks m ON m.user_id = f.user_id GROUP BY 1),
        |perms AS (SELECT CAST(range AS BIGINT) AS p FROM range(240)),
        |lattice AS (
        |  SELECT p, t, bit,
        |         md5('graft-shapley-perm' || '|' || CAST(p AS VARCHAR) || '|' || t) AS h
        |  FROM perms CROSS JOIN channels),
        |pref AS (
        |  SELECT p, t, bit,
        |         CAST(bit_or(CAST(1 AS BIGINT) << CAST(bit AS INT)) OVER (
        |           PARTITION BY p ORDER BY h, t
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS pmask
        |  FROM lattice),
        |pref2 AS (
        |  SELECT p, t, bit, pmask,
        |         pmask - (CAST(1 AS BIGINT) << CAST(bit AS INT)) AS prevmask
        |  FROM pref)
        |SELECT t AS channel, bit, CAST(240 AS BIGINT) AS n_perms,
        |       CAST(SUM((CASE WHEN (mask & pmask) = mask THEN m ELSE 0 END)
        |              - (CASE WHEN (mask & prevmask) = mask THEN m ELSE 0 END)) AS BIGINT) AS phi_sum
        |FROM convmask CROSS JOIN pref2
        |GROUP BY 1, 2
        |ORDER BY channel""".stripMargin,

    // ops.Insights.statMutualInfoCells: per-cell exact MI terms on the
    // fixed-point chain over the two integer products
    "stat_mutual_info_cells" -> s"""WITH cells AS (
      |  SELECT c.c_mktsegment AS segment, o_orderpriority AS priority,
      |         CAST(count(*) AS BIGINT) AS c
      |  FROM orders JOIN customer c ON c.c_custkey = o_custkey
      |  GROUP BY 1, 2),
      |rx AS (SELECT segment, CAST(SUM(c) AS BIGINT) AS r FROM cells GROUP BY 1),
      |cy AS (SELECT priority, CAST(SUM(c) AS BIGINT) AS cc FROM cells GROUP BY 1),
      |nt AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM cells),
      |j AS (
      |  SELECT cells.segment, cells.priority, cells.c, rx.r, cy.cc AS c_col, nt.n,
      |         cells.c * nt.n AS pn, rx.r * cy.cc AS pd
      |  FROM cells
      |  JOIN rx ON rx.segment = cells.segment
      |  JOIN cy ON cy.priority = cells.priority
      |  CROSS JOIN nt),
      |${Log2Sql.chain("lgn", "SELECT DISTINCT pn AS v FROM j")},
      |${Log2Sql.chain("lgd", "SELECT DISTINCT pd AS v FROM j")}
      |SELECT j.segment, j.priority, j.c, j.r, j.c_col, j.n,
      |       CAST(j.c * (lgn.l20 - lgd.l20) AS BIGINT) AS term_num
      |FROM j
      |JOIN lgn ON lgn.v = j.pn
      |JOIN lgd ON lgd.v = j.pd
      |ORDER BY j.segment, j.priority""".stripMargin,

    // ops.InfoTheory.textJsDivergence: pair-spine JS with one shared
    // log chain over all needed integer arguments
    "text_js_divergence" -> s"""WITH tok AS (
      |  SELECT lang,
      |         unnest(string_split(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')), ' ')) AS tok
      |  FROM documents),
      |uni AS (
      |  SELECT lang, tok, CAST(count(*) AS BIGINT) AS c
      |  FROM tok WHERE tok <> '' GROUP BY 1, 2),
      |tot AS (SELECT lang, CAST(SUM(c) AS BIGINT) AS n FROM uni GROUP BY 1),
      |pairs AS (
      |  SELECT a.lang AS lang_a, b.lang AS lang_b
      |  FROM tot a CROSS JOIN tot b WHERE a.lang < b.lang),
      |lft AS (
      |  SELECT p.lang_a, p.lang_b, u.tok, u.c AS ca
      |  FROM pairs p JOIN uni u ON u.lang = p.lang_a),
      |rgt AS (
      |  SELECT p.lang_a, p.lang_b, u.tok, u.c AS cb
      |  FROM pairs p JOIN uni u ON u.lang = p.lang_b),
      |merged AS (
      |  SELECT COALESCE(lft.lang_a, rgt.lang_a) AS lang_a,
      |         COALESCE(lft.lang_b, rgt.lang_b) AS lang_b,
      |         COALESCE(lft.ca, 0) AS ca, COALESCE(rgt.cb, 0) AS cb
      |  FROM lft FULL OUTER JOIN rgt
      |    ON rgt.lang_a = lft.lang_a AND rgt.lang_b = lft.lang_b AND rgt.tok = lft.tok),
      |m2 AS (
      |  SELECT merged.*, ta.n AS na, tb.n AS nb,
      |         merged.ca * tb.n + merged.cb * ta.n AS mix
      |  FROM merged
      |  JOIN tot ta ON ta.lang = merged.lang_a
      |  JOIN tot tb ON tb.lang = merged.lang_b),
      |${Log2Sql.chain("lgv",
        "SELECT DISTINCT v FROM (SELECT 2 * ca * nb AS v FROM m2 WHERE ca > 0 " +
        "UNION SELECT 2 * cb * na FROM m2 WHERE cb > 0 UNION SELECT mix FROM m2)")}
      |SELECT lang_a, lang_b, count(*) AS n_types,
      |       CAST(MAX(na) AS BIGINT) AS n_a, CAST(MAX(nb) AS BIGINT) AS n_b,
      |       CAST(SUM(CASE WHEN ca > 0 THEN ca * (la.l20 - lm.l20) ELSE 0 END) AS BIGINT) AS num_a,
      |       CAST(SUM(CASE WHEN cb > 0 THEN cb * (lb.l20 - lm.l20) ELSE 0 END) AS BIGINT) AS num_b,
      |       (CAST(SUM(CASE WHEN ca > 0 THEN ca * (la.l20 - lm.l20) ELSE 0 END) AS DOUBLE)
      |          / CAST(MAX(na) AS DOUBLE)
      |        + CAST(SUM(CASE WHEN cb > 0 THEN cb * (lb.l20 - lm.l20) ELSE 0 END) AS DOUBLE)
      |          / CAST(MAX(nb) AS DOUBLE)) / 2097152.0 AS js_bits
      |FROM m2
      |LEFT JOIN lgv la ON la.v = 2 * ca * nb
      |LEFT JOIN lgv lb ON lb.v = 2 * cb * na
      |JOIN lgv lm ON lm.v = mix
      |GROUP BY lang_a, lang_b
      |ORDER BY lang_a, lang_b""".stripMargin,

    // ops.InfoTheory.textBigramLmPerplexity: JM-smoothed bigram
    // surprisal, chains over the distinct per-TYPE num/den products
    "text_bigram_lm_perplexity" -> s"""WITH tokarr AS (
      |  SELECT doc_id, lang,
      |         string_split(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')), ' ') AS toks
      |  FROM documents),
      |big AS (
      |  SELECT doc_id, lang,
      |         unnest(list_transform(generate_series(1, len(toks) - 1), i -> toks[i])) AS p,
      |         unnest(list_transform(generate_series(1, len(toks) - 1), i -> toks[i + 1])) AS w
      |  FROM tokarr WHERE len(toks) >= 2),
      |c2 AS (SELECT lang, p, w, CAST(count(*) AS BIGINT) AS c2 FROM big GROUP BY 1, 2, 3),
      |c1 AS (SELECT lang, p, CAST(SUM(c2) AS BIGINT) AS c1 FROM c2 GROUP BY 1, 2),
      |cr AS (SELECT lang, w, CAST(SUM(c2) AS BIGINT) AS cr FROM c2 GROUP BY 1, 2),
      |nt AS (SELECT lang, CAST(SUM(c2) AS BIGINT) AS n FROM c2 GROUP BY 1),
      |ty AS (
      |  SELECT c2.lang, c2.p, c2.w,
      |         2 * c1.c1 * nt.n AS pd, c2.c2 * nt.n + cr.cr * c1.c1 AS pn
      |  FROM c2
      |  JOIN c1 ON c1.lang = c2.lang AND c1.p = c2.p
      |  JOIN cr ON cr.lang = c2.lang AND cr.w = c2.w
      |  JOIN nt ON nt.lang = c2.lang),
      |${Log2Sql.chain("lgd", "SELECT DISTINCT pd AS v FROM ty")},
      |${Log2Sql.chain("lgn", "SELECT DISTINCT pn AS v FROM ty")},
      |scored AS (
      |  SELECT big.doc_id, big.lang, lgd.l20 - lgn.l20 AS bits20
      |  FROM big
      |  JOIN ty ON ty.lang = big.lang AND ty.p = big.p AND ty.w = big.w
      |  JOIN lgd ON lgd.v = ty.pd
      |  JOIN lgn ON lgn.v = ty.pn)
      |SELECT doc_id, MIN(lang) AS lang, count(*) AS n_bigrams,
      |       CAST(SUM(bits20) AS BIGINT) AS total_bits20,
      |       CAST(CAST(SUM(bits20) AS BIGINT) AS DOUBLE)
      |         / CAST(count(*) * 1048576 AS DOUBLE) AS bits_per_bigram
      |FROM scored
      |GROUP BY doc_id
      |ORDER BY doc_id""".stripMargin,

    // ops.SetSort.setOpsBag: INTERSECT ALL / EXCEPT ALL multiplicities
    "set_ops_bag" ->
      """WITH y96 AS (
        |  SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1996),
        |y97 AS (
        |  SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1997),
        |inter AS (
        |  SELECT custkey, count(*) AS n_inter
        |  FROM (SELECT custkey FROM y96 INTERSECT ALL SELECT custkey FROM y97)
        |  GROUP BY 1),
        |exc AS (
        |  SELECT custkey, count(*) AS n_exc
        |  FROM (SELECT custkey FROM y96 EXCEPT ALL SELECT custkey FROM y97)
        |  GROUP BY 1)
        |SELECT COALESCE(inter.custkey, exc.custkey) AS custkey,
        |       CAST(COALESCE(n_inter, 0) AS BIGINT) AS n_inter,
        |       CAST(COALESCE(n_exc, 0) AS BIGINT) AS n_exc
        |FROM inter FULL OUTER JOIN exc ON exc.custkey = inter.custkey
        |ORDER BY custkey""".stripMargin,

    // ops.Insights.eventsLifecycleStates: weekly growth accounting
    "events_lifecycle_states" ->
      """WITH presence AS (
        |  SELECT DISTINCT event_type,
        |         user_id,
        |         CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT) // 7 AS wk
        |  FROM events),
        |mx AS (SELECT MAX(wk) AS max_wk FROM presence),
        |st AS (
        |  SELECT event_type, user_id, wk,
        |         LAG(wk) OVER w AS prev, LEAD(wk) OVER w AS nxt
        |  FROM presence
        |  WINDOW w AS (PARTITION BY event_type, user_id ORDER BY wk)),
        |labeled AS (
        |  SELECT event_type, wk,
        |         CASE WHEN prev IS NULL THEN 'new'
        |              WHEN prev = wk - 1 THEN 'retained'
        |              ELSE 'resurrected' END AS state
        |  FROM st
        |  UNION ALL
        |  SELECT event_type, wk + 1, 'churned'
        |  FROM st CROSS JOIN mx
        |  WHERE wk < max_wk AND (nxt IS NULL OR nxt > wk + 1))
        |SELECT event_type, wk,
        |       CAST(SUM(CASE WHEN state = 'new' THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
        |       CAST(SUM(CASE WHEN state = 'retained' THEN 1 ELSE 0 END) AS BIGINT) AS n_retained,
        |       CAST(SUM(CASE WHEN state = 'resurrected' THEN 1 ELSE 0 END) AS BIGINT) AS n_resurrected,
        |       CAST(SUM(CASE WHEN state = 'churned' THEN 1 ELSE 0 END) AS BIGINT) AS n_churned
        |FROM labeled
        |GROUP BY 1, 2
        |ORDER BY event_type, wk""".stripMargin,

    // ops.Windows.winTimeRangeFrame: integer-microsecond RANGE frame
    "win_time_range_frame" ->
      """SELECT event_id, user_id, epoch_us(ts) AS us,
        |       CAST(count(*) OVER w AS BIGINT) AS trailing_n,
        |       CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) OVER w AS BIGINT) AS trailing_cents
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
        |             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,

    // ops.Insights.ordersAbcXyz: integer ppm Pareto cuts x
    // cross-multiplied CV^2 cuts over the corpus month spine
    "orders_abc_xyz" ->
      """WITH rev AS (
        |  SELECT l_partkey,
        |         CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |             * (100 - CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT))) AS BIGINT) AS rev_e4
        |  FROM lineitem GROUP BY 1),
        |tot AS (SELECT CAST(sum(rev_e4) AS BIGINT) AS total FROM rev),
        |abc AS (
        |  SELECT l_partkey, rev_e4,
        |         CAST(SUM(rev_e4) OVER (ORDER BY rev_e4 DESC, l_partkey
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
        |  FROM rev),
        |abc2 AS (
        |  SELECT l_partkey, rev_e4,
        |         CASE WHEN CAST(cum AS HUGEINT) * 1000000 // total <= 800000 THEN 'A'
        |              WHEN CAST(cum AS HUGEINT) * 1000000 // total <= 950000 THEN 'B'
        |              ELSE 'C' END AS abc_class
        |  FROM abc CROSS JOIN tot),
        |monthly AS (
        |  SELECT l_partkey, date_trunc('month', l_shipdate) AS m,
        |         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS mq
        |  FROM lineitem GROUP BY 1, 2),
        |xyz AS (
        |  SELECT l_partkey,
        |         CASE WHEN 4 * (n_months * q2 - s * s) <= s * s THEN 'X'
        |              WHEN n_months * q2 - s * s <= s * s THEN 'Y'
        |              ELSE 'Z' END AS xyz_class
        |  FROM (SELECT l_partkey, CAST(sum(mq) AS BIGINT) AS s,
        |               CAST(sum(mq * mq) AS BIGINT) AS q2,
        |               CAST(count(*) AS BIGINT) AS n_months
        |        FROM monthly GROUP BY 1))
        |SELECT abc_class, xyz_class, count(*) AS n_parts,
        |       CAST(sum(rev_e4) AS BIGINT) AS rev_e4
        |FROM abc2 JOIN xyz USING (l_partkey)
        |GROUP BY 1, 2
        |ORDER BY abc_class, xyz_class""".stripMargin,

    "stat_chi2_cells" ->
      """WITH cells AS (
        |  SELECT c_mktsegment AS segment, c_nationkey AS nationkey, count(*) AS o
        |  FROM customer GROUP BY 1, 2),
        |segs AS (SELECT segment, CAST(sum(o) AS BIGINT) AS row_tot FROM cells GROUP BY 1),
        |nats AS (SELECT nationkey, CAST(sum(o) AS BIGINT) AS col_tot FROM cells GROUP BY 1),
        |t AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM cells),
        |grid AS (
        |  SELECT s.segment, na.nationkey, s.row_tot, na.col_tot,
        |         COALESCE(c.o, 0) AS o
        |  FROM segs s CROSS JOIN nats na
        |  LEFT JOIN cells c ON c.segment = s.segment AND c.nationkey = na.nationkey),
        |ex AS (
        |  SELECT segment, nationkey, o,
        |         CAST(row_tot * col_tot AS DOUBLE) / CAST(n AS DOUBLE) AS e
        |  FROM grid, t)
        |SELECT segment, nationkey, o, e,
        |       (CAST(o AS DOUBLE) - e) * (CAST(o AS DOUBLE) - e) / e AS chi2_contrib
        |FROM ex
        |ORDER BY segment, nationkey""".stripMargin,

    "sample_bottomk_stratified" ->
      """WITH h AS (
        |  SELECT c_mktsegment AS segment, c_custkey,
        |         md5('graft-bottomk' || '|' || CAST(c_custkey AS VARCHAR)) AS h
        |  FROM customer),
        |r AS (
        |  SELECT segment, c_custkey, h,
        |         ROW_NUMBER() OVER (PARTITION BY segment ORDER BY h, c_custkey) AS rk
        |  FROM h)
        |SELECT segment, c_custkey, h, rk
        |FROM r WHERE rk <= 20
        |ORDER BY segment, rk""".stripMargin,

    // ops.Graph.graphBfsLayers: UNION recursion dedups (node, hop)
    // states so the expansion is bounded by 5·|nodes|, and MIN(hop)
    // reproduces the frontier loop's first-discovery semantics
    "graph_bfs_layers" ->
      """WITH RECURSIVE seq AS (
        |  SELECT l_orderkey, l_partkey,
        |         lead(l_partkey) OVER (PARTITION BY l_orderkey
        |                               ORDER BY l_linenumber, l_partkey) AS dst
        |  FROM lineitem),
        |ed0 AS (
        |  SELECT DISTINCT l_partkey AS src, dst FROM seq
        |  WHERE dst IS NOT NULL AND dst <> l_partkey),
        |edges AS (SELECT src, dst FROM ed0 UNION SELECT dst, src FROM ed0),
        |bfs(node, hop) AS (
        |  SELECT DISTINCT src AS node, 0 AS hop FROM edges WHERE src % 97 = 0
        |  UNION
        |  SELECT e.dst, b.hop + 1 FROM bfs b JOIN edges e ON e.src = b.node
        |  WHERE b.hop < 4)
        |SELECT node, CAST(MIN(hop) AS BIGINT) AS hop
        |FROM bfs GROUP BY node
        |ORDER BY node""".stripMargin,

    // ops.Graph.graphHarmonicBounded: per-seed min-hop collapse of the
    // origin-tracking recursive CTE; harmonic as the denominator-6 integer
    "graph_harmonic_bounded" ->
      """WITH RECURSIVE seq AS (
        |  SELECT l_orderkey, l_partkey,
        |         lead(l_partkey) OVER (PARTITION BY l_orderkey
        |                               ORDER BY l_linenumber, l_partkey) AS dst
        |  FROM lineitem),
        |ed0 AS (
        |  SELECT DISTINCT l_partkey AS src, dst FROM seq
        |  WHERE dst IS NOT NULL AND dst <> l_partkey),
        |edges AS (SELECT src, dst FROM ed0 UNION SELECT dst, src FROM ed0),
        |bfs(seed, node, hop) AS (
        |  SELECT DISTINCT src AS seed, src AS node, 0 AS hop
        |  FROM edges WHERE src % 389 = 0
        |  UNION
        |  SELECT b.seed, e.dst, b.hop + 1 FROM bfs b JOIN edges e ON e.src = b.node
        |  WHERE b.hop < 3),
        |md AS (
        |  SELECT seed, node, MIN(hop) AS hop FROM bfs GROUP BY seed, node),
        |hist AS (
        |  SELECT seed,
        |         CAST(SUM(CASE WHEN hop = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |         CAST(SUM(CASE WHEN hop = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
        |         CAST(SUM(CASE WHEN hop = 3 THEN 1 ELSE 0 END) AS BIGINT) AS n3
        |  FROM md WHERE hop >= 1 GROUP BY seed)
        |SELECT seed, n1, n2, n3,
        |       CAST(n1 * 6 + n2 * 3 + n3 * 2 AS BIGINT) AS harmonic_x6
        |FROM hist
        |ORDER BY seed""".stripMargin,

    // ops.Analytics.timeSeriesStlCells: calendar RANGE trend frame,
    // interior-day filter, exact-rational seasonal/residual numerators
    "time_series_stl_cells" ->
      """WITH daily AS (
        |  SELECT event_type,
        |         CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT) AS epoch_day,
        |         CAST(count(*) AS BIGINT) AS cnt
        |  FROM events GROUP BY 1, 2),
        |tr AS (
        |  SELECT event_type, epoch_day, cnt,
        |         CAST(SUM(cnt) OVER w AS BIGINT) AS tsum,
        |         CAST(COUNT(*) OVER w AS BIGINT) AS fdays
        |  FROM daily
        |  WINDOW w AS (PARTITION BY event_type ORDER BY epoch_day
        |               RANGE BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
        |interior AS (
        |  SELECT event_type, epoch_day, cnt, tsum,
        |         epoch_day % 7 AS dow,
        |         7 * cnt - tsum AS det7
        |  FROM tr WHERE fdays = 7),
        |seasonal AS (
        |  SELECT event_type, dow, CAST(SUM(det7) AS BIGINT) AS s_num,
        |         CAST(COUNT(*) AS BIGINT) AS n_dow
        |  FROM interior GROUP BY 1, 2)
        |SELECT i.event_type, i.epoch_day, i.cnt, i.tsum, i.dow,
        |       se.s_num, se.n_dow,
        |       CAST(se.n_dow * i.det7 - se.s_num AS BIGINT) AS r_num
        |FROM interior i
        |JOIN seasonal se ON se.event_type = i.event_type AND se.dow = i.dow
        |ORDER BY i.event_type, i.epoch_day""".stripMargin,

    // ops.Analytics.timeSeriesRollingMedian: exact lower median of the
    // trailing 7-day calendar frame via sorted-list indexing
    "time_series_rolling_median" ->
      """WITH daily AS (
        |  SELECT event_type,
        |         CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT) AS epoch_day,
        |         CAST(count(*) AS BIGINT) AS cnt
        |  FROM events GROUP BY 1, 2),
        |f AS (
        |  SELECT event_type, epoch_day, cnt,
        |         list_sort(list(cnt) OVER w) AS frame
        |  FROM daily
        |  WINDOW w AS (PARTITION BY event_type ORDER BY epoch_day
        |               RANGE BETWEEN 6 PRECEDING AND CURRENT ROW))
        |SELECT event_type, epoch_day, cnt,
        |       CAST(len(frame) AS BIGINT) AS n_frame,
        |       CAST(frame[CAST((len(frame) + 1) // 2 AS INT)] AS BIGINT) AS med7
        |FROM f
        |ORDER BY event_type, epoch_day""".stripMargin,

    // ops.Analytics.eventsAnomalyStl: the STL chain + denominator-aware
    // MAD median + cross-multiplied anomaly gate
    "events_anomaly_stl" ->
      """WITH daily AS (
        |  SELECT event_type,
        |         CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT) AS epoch_day,
        |         CAST(count(*) AS BIGINT) AS cnt
        |  FROM events GROUP BY 1, 2),
        |tr AS (
        |  SELECT event_type, epoch_day, cnt,
        |         CAST(SUM(cnt) OVER w AS BIGINT) AS tsum,
        |         CAST(COUNT(*) OVER w AS BIGINT) AS fdays
        |  FROM daily
        |  WINDOW w AS (PARTITION BY event_type ORDER BY epoch_day
        |               RANGE BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
        |interior AS (
        |  SELECT event_type, epoch_day, cnt, tsum,
        |         epoch_day % 7 AS dow, 7 * cnt - tsum AS det7
        |  FROM tr WHERE fdays = 7),
        |seasonal AS (
        |  SELECT event_type, dow, CAST(SUM(det7) AS BIGINT) AS s_num,
        |         CAST(COUNT(*) AS BIGINT) AS n_dow
        |  FROM interior GROUP BY 1, 2),
        |cells AS (
        |  SELECT i.event_type, i.epoch_day, i.cnt,
        |         CAST(se.n_dow * i.det7 - se.s_num AS BIGINT) AS r_num, se.n_dow
        |  FROM interior i
        |  JOIN seasonal se ON se.event_type = i.event_type AND se.dow = i.dow),
        |ranked AS (
        |  SELECT *,
        |         CAST(ROW_NUMBER() OVER (PARTITION BY event_type
        |             ORDER BY CAST(ABS(r_num) AS DOUBLE) / CAST(n_dow AS DOUBLE),
        |                      epoch_day) AS BIGINT) AS rn,
        |         CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
        |  FROM cells),
        |mad AS (
        |  SELECT event_type, ABS(r_num) AS mad_num, n_dow AS mad_den
        |  FROM ranked WHERE rn = (n + 1) // 2)
        |SELECT c.event_type, c.epoch_day, c.cnt, c.r_num, c.n_dow,
        |       m.mad_num, m.mad_den,
        |       CAST(CASE WHEN ABS(c.r_num) * m.mad_den > 5 * m.mad_num * c.n_dow
        |            THEN 1 ELSE 0 END AS BIGINT) AS is_anomaly
        |FROM cells c JOIN mad m ON m.event_type = c.event_type
        |ORDER BY c.event_type, c.epoch_day""".stripMargin,

    // ops.Insights.statMannWhitney: tie-adjusted doubled ranks
    // (2·avgrank = 2·lo + cnt − 1, pure integer) — RANK gives the tie
    // group's low position, the value-partition COUNT its size
    "stat_mann_whitney" ->
      """WITH c AS (
        |  SELECT c_mktsegment AS segment,
        |         CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS bal_cents
        |  FROM customer),
        |segs AS (SELECT DISTINCT segment FROM c),
        |pairs AS (
        |  SELECT a.segment AS seg_a, b.segment AS seg_b
        |  FROM segs a CROSS JOIN segs b WHERE a.segment < b.segment),
        |m AS (
        |  SELECT p.seg_a, p.seg_b, c.segment, c.bal_cents
        |  FROM pairs p JOIN c ON c.segment = p.seg_a OR c.segment = p.seg_b),
        |r AS (
        |  SELECT seg_a, seg_b, segment,
        |         CAST(RANK() OVER (PARTITION BY seg_a, seg_b
        |                           ORDER BY bal_cents) AS BIGINT) AS lo,
        |         CAST(COUNT(*) OVER (PARTITION BY seg_a, seg_b, bal_cents) AS BIGINT) AS cnt
        |  FROM m),
        |g AS (
        |  SELECT seg_a, seg_b,
        |         CAST(count(CASE WHEN segment = seg_a THEN 1 END) AS BIGINT) AS n_a,
        |         CAST(count(CASE WHEN segment = seg_b THEN 1 END) AS BIGINT) AS n_b,
        |         CAST(sum(CASE WHEN segment = seg_a THEN 2 * lo + cnt - 1 END) AS BIGINT) AS r2_a
        |  FROM r GROUP BY 1, 2)
        |SELECT seg_a, seg_b, n_a, n_b, r2_a,
        |       CAST(r2_a - n_a * (n_a + 1) AS BIGINT) AS u2_a,
        |       CAST(2 * n_a * n_b - (r2_a - n_a * (n_a + 1)) AS BIGINT) AS u2_b
        |FROM g
        |ORDER BY seg_a, seg_b""".stripMargin,

    // ops.Insights.statKsTest: ECDF extrema live on the observed
    // values, so the distinct-value spine scan is complete; argmax
    // tie-break (d_num DESC, value ASC) via rank window in both engines
    "stat_ks_test" ->
      """WITH c AS (
        |  SELECT c_mktsegment AS segment,
        |         CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS bal_cents
        |  FROM customer),
        |segs AS (SELECT DISTINCT segment FROM c),
        |pairs AS (
        |  SELECT a.segment AS seg_a, b.segment AS seg_b
        |  FROM segs a CROSS JOIN segs b WHERE a.segment < b.segment),
        |pv AS (
        |  SELECT p.seg_a, p.seg_b, c.bal_cents,
        |         count(CASE WHEN c.segment = p.seg_a THEN 1 END) AS ca,
        |         count(CASE WHEN c.segment = p.seg_b THEN 1 END) AS cb
        |  FROM pairs p JOIN c ON c.segment = p.seg_a OR c.segment = p.seg_b
        |  GROUP BY 1, 2, 3),
        |sc AS (
        |  SELECT seg_a, seg_b, bal_cents,
        |         CAST(SUM(ca) OVER wc AS BIGINT) AS cum_a,
        |         CAST(SUM(cb) OVER wc AS BIGINT) AS cum_b,
        |         CAST(SUM(ca) OVER wa AS BIGINT) AS n_a,
        |         CAST(SUM(cb) OVER wa AS BIGINT) AS n_b
        |  FROM pv
        |  WINDOW wc AS (PARTITION BY seg_a, seg_b ORDER BY bal_cents
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |         wa AS (PARTITION BY seg_a, seg_b)),
        |d AS (
        |  SELECT seg_a, seg_b, n_a, n_b,
        |         CAST(abs(n_b * cum_a - n_a * cum_b) AS BIGINT) AS d_num,
        |         bal_cents,
        |         row_number() OVER (PARTITION BY seg_a, seg_b
        |           ORDER BY abs(n_b * cum_a - n_a * cum_b) DESC, bal_cents) AS rk
        |  FROM sc)
        |SELECT seg_a, seg_b, n_a, n_b, d_num,
        |       CAST(n_a * n_b AS BIGINT) AS d_den, bal_cents AS ks_at
        |FROM d WHERE rk = 1
        |ORDER BY seg_a, seg_b""".stripMargin,

    // ops.Insights.eventsCusumChangepoint: statistic evaluated on
    // observed days (gap extrema occur at endpoints — scaladoc);
    // argmax ties → earliest day, rank window in both engines
    "events_cusum_changepoint" ->
      """WITH daily AS (
        |  SELECT event_type,
        |         CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT) AS epoch_day,
        |         count(*) AS cnt
        |  FROM events GROUP BY 1, 2),
        |sc AS (
        |  SELECT event_type, epoch_day, cnt,
        |         CAST(SUM(cnt) OVER wc AS BIGINT) AS cum,
        |         CAST(SUM(cnt) OVER wa AS BIGINT) AS total,
        |         MIN(epoch_day) OVER wa AS d0,
        |         MAX(epoch_day) OVER wa AS d1
        |  FROM daily
        |  WINDOW wc AS (PARTITION BY event_type ORDER BY epoch_day
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |         wa AS (PARTITION BY event_type)),
        |d AS (
        |  SELECT event_type, d0, d1, d1 - d0 + 1 AS span, total, epoch_day, cum,
        |         CAST(abs((d1 - d0 + 1) * cum - total * (epoch_day - d0 + 1)) AS BIGINT) AS dev_num,
        |         row_number() OVER (PARTITION BY event_type
        |           ORDER BY abs((d1 - d0 + 1) * cum - total * (epoch_day - d0 + 1)) DESC,
        |                    epoch_day) AS rk
        |  FROM sc)
        |SELECT event_type, d0, d1, CAST(span AS BIGINT) AS span, total,
        |       epoch_day AS cp_day, cum AS cum_at_cp, dev_num
        |FROM d WHERE rk = 1
        |ORDER BY event_type""".stripMargin,

    // ops.Insights.ordersSurvivalKm: integer KM sufficient statistics
    // per (segment cohort, lifetime); n_risk = reverse cumulative
    // membership; churn horizon = 90 days before the corpus max
    "orders_survival_km" ->
      """WITH o AS (
        |  SELECT o_custkey,
        |         CAST(datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS d
        |  FROM orders),
        |pu AS (
        |  SELECT o_custkey, MIN(d) AS d0, MAX(d) AS d1 FROM o GROUP BY 1),
        |hz AS (SELECT MAX(d1) AS dmax FROM pu),
        |life AS (
        |  SELECT c.c_mktsegment AS cohort, pu.d1 - pu.d0 AS t,
        |         CASE WHEN pu.d1 > hz.dmax - 90 THEN 1 ELSE 0 END AS censored
        |  FROM pu JOIN customer c ON c.c_custkey = pu.o_custkey CROSS JOIN hz),
        |spine AS (
        |  SELECT cohort, t,
        |         CAST(SUM(1 - censored) AS BIGINT) AS d_event,
        |         CAST(SUM(censored) AS BIGINT) AS c_censor
        |  FROM life GROUP BY 1, 2)
        |SELECT cohort, t,
        |       CAST(SUM(d_event + c_censor) OVER (PARTITION BY cohort ORDER BY t DESC
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n_risk,
        |       d_event, c_censor
        |FROM spine
        |ORDER BY cohort, t""".stripMargin,

    // ops.Insights.statLogrankCells: integer log-rank cells; the
    // cross-cohort risk-set carry is last_value(IGNORE NULLS) over a
    // t-DESC frame — identical right-continuous step semantics
    "stat_logrank_cells" ->
      """WITH o AS (
        |  SELECT o_custkey,
        |         CAST(datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS d
        |  FROM orders),
        |pu AS (
        |  SELECT o_custkey, MIN(d) AS d0, MAX(d) AS d1 FROM o GROUP BY 1),
        |hz AS (SELECT MAX(d1) AS dmax FROM pu),
        |life AS (
        |  SELECT c.c_mktsegment AS cohort, pu.d1 - pu.d0 AS t,
        |         CASE WHEN pu.d1 > hz.dmax - 90 THEN 1 ELSE 0 END AS censored
        |  FROM pu JOIN customer c ON c.c_custkey = pu.o_custkey CROSS JOIN hz),
        |spine AS (
        |  SELECT cohort, t,
        |         CAST(SUM(1 - censored) AS BIGINT) AS d_event,
        |         CAST(SUM(censored) AS BIGINT) AS c_censor
        |  FROM life GROUP BY 1, 2),
        |km AS (
        |  SELECT cohort, t, d_event,
        |         CAST(SUM(d_event + c_censor) OVER (PARTITION BY cohort ORDER BY t DESC
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n_risk
        |  FROM spine),
        |cohs AS (SELECT DISTINCT cohort FROM km),
        |pairs AS (
        |  SELECT a.cohort AS ca, b.cohort AS cb
        |  FROM cohs a CROSS JOIN cohs b WHERE a.cohort < b.cohort),
        |sa AS (
        |  SELECT p.ca, p.cb, k.t, k.d_event AS d_a0, k.n_risk AS n_a0
        |  FROM pairs p JOIN km k ON k.cohort = p.ca),
        |sb AS (
        |  SELECT p.ca, p.cb, k.t, k.d_event AS d_b0, k.n_risk AS n_b0
        |  FROM pairs p JOIN km k ON k.cohort = p.cb),
        |m AS (
        |  SELECT COALESCE(sa.ca, sb.ca) AS ca, COALESCE(sa.cb, sb.cb) AS cb,
        |         COALESCE(sa.t, sb.t) AS t, d_a0, n_a0, d_b0, n_b0
        |  FROM sa FULL OUTER JOIN sb
        |    ON sa.ca = sb.ca AND sa.cb = sb.cb AND sa.t = sb.t),
        |carried AS (
        |  SELECT ca, cb, t,
        |         COALESCE(last_value(n_a0 IGNORE NULLS) OVER wc, 0) AS n_a,
        |         COALESCE(last_value(n_b0 IGNORE NULLS) OVER wc, 0) AS n_b,
        |         COALESCE(d_a0, 0) AS d_a, COALESCE(d_b0, 0) AS d_b
        |  FROM m
        |  WINDOW wc AS (PARTITION BY ca, cb ORDER BY t DESC
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT ca, cb, t, d_a AS o_a, n_a, n_b,
        |       CAST(n_a * (d_a + d_b) AS BIGINT) AS e_num,
        |       CAST(n_a + n_b AS BIGINT) AS e_den,
        |       CAST((d_a + d_b) * n_a * n_b * (n_a + n_b - d_a - d_b) AS BIGINT) AS v_num,
        |       CAST((n_a + n_b) * (n_a + n_b) * (n_a + n_b - 1) AS BIGINT) AS v_den
        |FROM carried
        |WHERE d_a + d_b > 0
        |ORDER BY ca, cb, t""".stripMargin,

    // ops.Graph.graphDegreeHist: integer-exact log2 bin via binary
    // digit count — length(bin(deg)) - 1 in both engines
    "graph_degree_hist" ->
      """WITH seq AS (
        |  SELECT l_orderkey, l_partkey,
        |         lead(l_partkey) OVER (PARTITION BY l_orderkey
        |                               ORDER BY l_linenumber, l_partkey) AS dst
        |  FROM lineitem),
        |ed0 AS (
        |  SELECT DISTINCT l_partkey AS src, dst FROM seq
        |  WHERE dst IS NOT NULL AND dst <> l_partkey),
        |edges AS (SELECT src, dst FROM ed0 UNION SELECT dst, src FROM ed0),
        |deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS deg FROM edges GROUP BY 1)
        |SELECT CAST(length(bin(deg)) - 1 AS BIGINT) AS bin,
        |       CAST(COUNT(*) AS BIGINT) AS n_nodes,
        |       MIN(deg) AS min_deg, MAX(deg) AS max_deg,
        |       CAST(SUM(deg) AS BIGINT) AS endpoint_mass
        |FROM deg GROUP BY 1
        |ORDER BY bin""".stripMargin,

    // ops.Graph.graphDegreeAssortativity: integer sufficient sums
    // over the canonical edge list with endpoint degrees
    "graph_degree_assortativity" ->
      """WITH seq AS (
        |  SELECT l_orderkey, l_partkey,
        |         lead(l_partkey) OVER (PARTITION BY l_orderkey
        |                               ORDER BY l_linenumber, l_partkey) AS dst
        |  FROM lineitem),
        |ed0 AS (
        |  SELECT DISTINCT l_partkey AS src, dst FROM seq
        |  WHERE dst IS NOT NULL AND dst <> l_partkey),
        |und AS (
        |  SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v FROM ed0),
        |deg AS (
        |  SELECT node, CAST(COUNT(*) AS BIGINT) AS deg
        |  FROM (SELECT u AS node FROM und UNION ALL SELECT v FROM und)
        |  GROUP BY 1),
        |j AS (
        |  SELECT du.deg AS du, dv.deg AS dv
        |  FROM und JOIN deg du ON du.node = und.u
        |           JOIN deg dv ON dv.node = und.v)
        |SELECT CAST(COUNT(*) AS BIGINT) AS m,
        |       CAST(SUM(du * dv) AS BIGINT) AS s_prod,
        |       CAST(SUM(du + dv) AS BIGINT) AS s_sum,
        |       CAST(SUM(du * du + dv * dv) AS BIGINT) AS s_sq
        |FROM j""".stripMargin,

    // ops.Graph.graphClusteringLocal: log2-inverse coefficient bin
    // via the bit-length idiom, integer-exact in both engines;
    // zero-triangle deg≥2 nodes kept by the left join (cbin −1)
    "graph_clustering_local" ->
      """WITH seq AS (
        |  SELECT l_orderkey, l_partkey,
        |         lead(l_partkey) OVER (PARTITION BY l_orderkey
        |                               ORDER BY l_linenumber, l_partkey) AS dst
        |  FROM lineitem),
        |ed0 AS (
        |  SELECT DISTINCT l_partkey AS src, dst FROM seq
        |  WHERE dst IS NOT NULL AND dst <> l_partkey),
        |und AS (
        |  SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v FROM ed0),
        |deg AS (
        |  SELECT node, CAST(COUNT(*) AS BIGINT) AS deg
        |  FROM (SELECT u AS node FROM und UNION ALL SELECT v FROM und)
        |  GROUP BY 1),
        |tris AS (
        |  SELECT e1.u, e1.v, e2.v AS w
        |  FROM und e1
        |  JOIN und e2 ON e1.v = e2.u
        |  JOIN und e3 ON e3.u = e1.u AND e3.v = e2.v),
        |corners AS (
        |  SELECT u AS node FROM tris
        |  UNION ALL SELECT v FROM tris
        |  UNION ALL SELECT w FROM tris),
        |tpn AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS tri FROM corners GROUP BY 1),
        |base AS (
        |  SELECT d.deg, COALESCE(t.tri, 0) AS tri
        |  FROM deg d LEFT JOIN tpn t ON t.node = d.node
        |  WHERE d.deg >= 2)
        |SELECT CASE WHEN tri = 0 THEN CAST(-1 AS BIGINT)
        |            ELSE CAST(length(bin(deg * (deg - 1) // (2 * tri))) - 1 AS BIGINT)
        |       END AS cbin,
        |       CAST(COUNT(*) AS BIGINT) AS n_nodes,
        |       CAST(SUM(tri) AS BIGINT) AS tri_sum,
        |       CAST(SUM(deg * (deg - 1)) AS BIGINT) AS wedge2_sum
        |FROM base GROUP BY 1
        |ORDER BY cbin""".stripMargin,

    // ops.Insights.statKruskalWallis: the oracle ranks the POOLED
    // sample directly (global midranks — fine here, the oracle has no
    // plan gate), which independently cross-checks the engine's
    // pairwise 2R_g = n_g(n_g+1) + Σ u2 decomposition
    "stat_kruskal_wallis" ->
      """WITH c AS (
        |  SELECT c_mktsegment AS segment,
        |         CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS bal_cents
        |  FROM customer),
        |r AS (
        |  SELECT segment,
        |         CAST(RANK() OVER (ORDER BY bal_cents) AS BIGINT) AS lo,
        |         CAST(COUNT(*) OVER (PARTITION BY bal_cents) AS BIGINT) AS cnt
        |  FROM c),
        |g AS (
        |  SELECT segment, CAST(COUNT(*) AS BIGINT) AS n_g,
        |         CAST(SUM(2 * lo + cnt - 1) AS BIGINT) AS r2_g
        |  FROM r GROUP BY 1),
        |ties AS (
        |  SELECT CAST(SUM(t * t * t - t) AS BIGINT) AS tie3_sum,
        |         CAST(SUM(t) AS BIGINT) AS n_total
        |  FROM (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM c GROUP BY bal_cents))
        |SELECT segment, n_g, r2_g, n_total, tie3_sum
        |FROM g CROSS JOIN ties
        |ORDER BY segment""".stripMargin,

    // ops.Insights.statSpearmanCells: doubled midranks on both axes
    // (2·lo + cnt − 1), integer moment sums; customers without orders
    // participate with revenue 0 via the left join
    "stat_spearman_cells" ->
      """WITH rev AS (
        |  SELECT o_custkey,
        |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS rev_cents
        |  FROM orders GROUP BY 1),
        |c AS (
        |  SELECT c_mktsegment AS segment,
        |         CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS bal_cents,
        |         COALESCE(rev.rev_cents, 0) AS rev_cents
        |  FROM customer LEFT JOIN rev ON o_custkey = c_custkey),
        |r AS (
        |  SELECT segment,
        |         2 * CAST(RANK() OVER (PARTITION BY segment ORDER BY bal_cents) AS BIGINT)
        |           + CAST(COUNT(*) OVER (PARTITION BY segment, bal_cents) AS BIGINT) - 1 AS r2x,
        |         2 * CAST(RANK() OVER (PARTITION BY segment ORDER BY rev_cents) AS BIGINT)
        |           + CAST(COUNT(*) OVER (PARTITION BY segment, rev_cents) AS BIGINT) - 1 AS r2y
        |  FROM c)
        |SELECT segment, CAST(COUNT(*) AS BIGINT) AS n,
        |       CAST(SUM(r2x * r2y) AS BIGINT) AS s_xy,
        |       CAST(SUM(r2x * r2x) AS BIGINT) AS s_xx,
        |       CAST(SUM(r2y * r2y) AS BIGINT) AS s_yy
        |FROM r GROUP BY 1
        |ORDER BY segment""".stripMargin,

    // ops.Insights.eventsGiniActivity: sorted-weights Gini as the
    // exact integer rational; same (cnt, user_id) total order and the
    // same 2·Σrn·cnt − (n+1)·total decomposition
    "events_gini_activity" ->
      """WITH pu AS (
        |  SELECT event_type, user_id, CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM events GROUP BY 1, 2),
        |r AS (
        |  SELECT event_type, cnt,
        |         CAST(ROW_NUMBER() OVER (PARTITION BY event_type
        |                                 ORDER BY cnt, user_id) AS BIGINT) AS rn
        |  FROM pu),
        |g AS (
        |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_users,
        |         CAST(SUM(cnt) AS BIGINT) AS total_events,
        |         CAST(SUM(rn * cnt) AS BIGINT) AS s_rc
        |  FROM r GROUP BY 1)
        |SELECT event_type, n_users, total_events,
        |       CAST(2 * s_rc - (n_users + 1) * total_events AS BIGINT) AS g_num,
        |       CAST(n_users * total_events AS BIGINT) AS g_den
        |FROM g
        |ORDER BY event_type""".stripMargin,

    // ops.Insights.eventsTypeOverlap: full pair grid with zero-overlap
    // cells kept (the chi2 full-grid discipline); intersection via
    // per-user local type-pair fan-out, never a set×set join
    "events_type_overlap" ->
      """WITH ut AS (
        |  SELECT DISTINCT user_id, event_type FROM events),
        |types AS (SELECT DISTINCT event_type FROM ut),
        |grid AS (
        |  SELECT a.event_type AS type_a, b.event_type AS type_b
        |  FROM types a CROSS JOIN types b WHERE a.event_type < b.event_type),
        |inter AS (
        |  SELECT x.event_type AS type_a, y.event_type AS type_b,
        |         CAST(COUNT(*) AS BIGINT) AS n_inter
        |  FROM ut x JOIN ut y ON x.user_id = y.user_id
        |  WHERE x.event_type < y.event_type
        |  GROUP BY 1, 2),
        |sizes AS (
        |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM ut GROUP BY 1)
        |SELECT g.type_a, g.type_b, sa.n AS n_a, sb.n AS n_b,
        |       COALESCE(i.n_inter, 0) AS n_inter,
        |       CAST(sa.n + sb.n - COALESCE(i.n_inter, 0) AS BIGINT) AS n_union
        |FROM grid g
        |JOIN sizes sa ON sa.event_type = g.type_a
        |JOIN sizes sb ON sb.event_type = g.type_b
        |LEFT JOIN inter i ON i.type_a = g.type_a AND i.type_b = g.type_b
        |ORDER BY g.type_a, g.type_b""".stripMargin,

    // ops.Llm2.sampleEpochShuffle: md5 shuffle key, byte-identical
    // hex in both engines
    "sample_epoch_shuffle" ->
      """WITH keyed AS (
        |  SELECT e.epoch, d.doc_id,
        |         md5('graft-epoch' || '|' || CAST(e.epoch AS VARCHAR) || '|'
        |             || CAST(d.doc_id AS VARCHAR)) AS shuffle_key
        |  FROM documents d
        |  CROSS JOIN (SELECT CAST(unnest(generate_series(0, 2)) AS BIGINT) AS epoch) e),
        |r AS (
        |  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY epoch
        |            ORDER BY shuffle_key, doc_id) AS BIGINT) AS rn
        |  FROM keyed)
        |SELECT epoch, rn, doc_id, shuffle_key
        |FROM r WHERE rn <= 20
        |ORDER BY epoch, rn""".stripMargin,

    // ops.Insights.ordersFulfillmentLag: lower median + lower p90 at
    // rank (9n+9)//10, the backlog interval model
    "orders_fulfillment_lag" ->
      """WITH cl AS (
        |  SELECT l_orderkey, MAX(CAST(l_shipdate AS DATE)) AS close0
        |  FROM lineitem GROUP BY 1),
        |o AS (
        |  SELECT o_orderpriority AS priority, o_orderkey,
        |         CAST(datediff('day', CAST(o_orderdate AS DATE),
        |              GREATEST(close0, CAST(o_orderdate AS DATE))) AS BIGINT) AS lag_d
        |  FROM orders JOIN cl ON cl.l_orderkey = o_orderkey),
        |r AS (
        |  SELECT priority, lag_d,
        |         CAST(ROW_NUMBER() OVER (PARTITION BY priority
        |                                 ORDER BY lag_d, o_orderkey) AS BIGINT) AS rk,
        |         CAST(COUNT(*) OVER (PARTITION BY priority) AS BIGINT) AS n
        |  FROM o),
        |med AS (SELECT priority, lag_d AS med_lag_days FROM r WHERE rk = (n + 1) // 2),
        |p90 AS (SELECT priority, lag_d AS p90_lag_days FROM r WHERE rk = (9 * n + 9) // 10),
        |a AS (
        |  SELECT priority, CAST(COUNT(*) AS BIGINT) AS n,
        |         CAST(SUM(lag_d) AS BIGINT) AS sum_lag_days,
        |         CAST(MAX(lag_d) AS BIGINT) AS max_lag_days
        |  FROM o GROUP BY 1)
        |SELECT a.priority, a.n, a.sum_lag_days, med.med_lag_days,
        |       p90.p90_lag_days, a.max_lag_days
        |FROM a
        |JOIN med ON med.priority = a.priority
        |JOIN p90 ON p90.priority = a.priority
        |ORDER BY a.priority""".stripMargin,

    // ops.Insights.eventsStickiness: exact distinct over overlapping
    // trailing windows — the range join is exact, so engine-side
    // plan shape (fan-out vs theta) is irrelevant to the result
    "events_stickiness" ->
      """WITH du AS (
        |  SELECT DISTINCT
        |         CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT) AS d,
        |         user_id AS u
        |  FROM events),
        |days AS (SELECT DISTINCT d FROM du),
        |dau AS (SELECT d, CAST(COUNT(*) AS BIGINT) AS dau FROM du GROUP BY 1),
        |mau AS (
        |  SELECT days.d AS spine_d, CAST(COUNT(DISTINCT du.u) AS BIGINT) AS mau30
        |  FROM days JOIN du ON du.d BETWEEN days.d - 29 AND days.d
        |  GROUP BY 1)
        |SELECT dau.d, dau.dau, mau.mau30
        |FROM dau JOIN mau ON mau.spine_d = dau.d
        |ORDER BY dau.d""".stripMargin,

    // ops.Insights.eventsDecayEngagement: w20 = 2^40 // exp2_fixed(h)
    // on whole-day ages about the corpus max timestamp
    "events_decay_engagement" ->
      s"""WITH e AS (
         |  SELECT event_type AS t, user_id AS u, epoch_us(ts) AS us, event_id
         |  FROM events),
         |now_us AS (SELECT MAX(us) AS now_us FROM e),
         |aged AS (
         |  SELECT t, u,
         |         LEAST(((now_us - us) // 86400000000) * 1048576 // 7,
         |               44040192) AS h
         |  FROM e CROSS JOIN now_us),
         |${Exp2Sql.chain("e2s", "SELECT DISTINCT h AS v FROM aged")},
         |scored AS (
         |  SELECT t, u, CAST(COUNT(*) AS BIGINT) AS n_events,
         |         CAST(SUM(1099511627776 // e2s.e2) AS BIGINT) AS score20
         |  FROM aged JOIN e2s ON e2s.v = aged.h
         |  GROUP BY 1, 2),
         |r AS (
         |  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY t
         |            ORDER BY score20 DESC, u) AS BIGINT) AS rn
         |  FROM scored)
         |SELECT t AS event_type, rn, u AS user_id, n_events, score20
         |FROM r WHERE rn <= 10
         |ORDER BY event_type, rn""".stripMargin,

    // ops.Insights.ordersMixDrift: the KL chain on (month, priority)
    // cells — every log argument an integer count
    "orders_mix_drift" ->
      s"""WITH counts AS (
         |  SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS month,
         |         o_orderpriority AS priority, CAST(count(*) AS BIGINT) AS c
         |  FROM orders GROUP BY 1, 2),
         |corpus AS (SELECT priority, CAST(SUM(c) AS BIGINT) AS ctot FROM counts GROUP BY 1),
         |month_tot AS (SELECT month, CAST(SUM(c) AS BIGINT) AS n FROM counts GROUP BY 1),
         |grand AS (SELECT CAST(SUM(n) AS BIGINT) AS ntot FROM month_tot),
         |${Log2Sql.chain("lgc", "SELECT DISTINCT c AS v FROM counts")},
         |${Log2Sql.chain("lgt", "SELECT DISTINCT ctot AS v FROM corpus")},
         |${Log2Sql.chain("lgn", "SELECT DISTINCT n AS v FROM month_tot")},
         |${Log2Sql.chain("lgg", "SELECT DISTINCT ntot AS v FROM grand")}
         |SELECT counts.month, month_tot.n AS n_orders,
         |       CAST(SUM(c * (lgc.l20 + lgg.l20 - lgn.l20 - lgt.l20)) AS DOUBLE)
         |         / CAST(month_tot.n * 1048576 AS DOUBLE) AS kl_bits
         |FROM counts
         |JOIN corpus ON corpus.priority = counts.priority
         |JOIN month_tot ON month_tot.month = counts.month
         |CROSS JOIN grand
         |JOIN lgc ON lgc.v = counts.c
         |JOIN lgt ON lgt.v = corpus.ctot
         |JOIN lgn ON lgn.v = month_tot.n
         |JOIN lgg ON lgg.v = grand.ntot
         |GROUP BY counts.month, month_tot.n
         |ORDER BY counts.month""".stripMargin,

    // ops.Insights.statLeveneCells: runs-test median conventions,
    // HUGEINT sumsq emitted as the exact digit string
    "stat_levene_cells" ->
      """WITH o AS (
        |  SELECT c.c_mktsegment AS segment, o_orderkey,
        |         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
        |  FROM orders JOIN customer c ON c.c_custkey = o_custkey),
        |r AS (
        |  SELECT segment, v,
        |         CAST(ROW_NUMBER() OVER (PARTITION BY segment
        |                                 ORDER BY v, o_orderkey) AS BIGINT) AS rv,
        |         CAST(COUNT(*) OVER (PARTITION BY segment) AS BIGINT) AS n
        |  FROM o),
        |med AS (SELECT segment, v AS med FROM r WHERE rv = (n + 1) // 2),
        |d AS (
        |  SELECT o.segment, ABS(o.v - med.med) AS d, med.med
        |  FROM o JOIN med ON med.segment = o.segment)
        |SELECT segment, CAST(COUNT(*) AS BIGINT) AS n,
        |       CAST(MAX(med) AS BIGINT) AS med_cents,
        |       CAST(SUM(d) AS BIGINT) AS sum_dev_cents,
        |       CAST(SUM(CAST(d AS HUGEINT) * d) AS VARCHAR) AS sumsq_dev_cents
        |FROM d GROUP BY 1
        |ORDER BY segment""".stripMargin,

    // ops.InfoTheory.textHeapsCurve: first-seen doc rank per type +
    // cumulative over the per-lang doc spine; zero-token docs kept
    "text_heaps_curve" ->
      """WITH docs AS (
        |  SELECT doc_id, lang,
        |         CAST(ROW_NUMBER() OVER (PARTITION BY lang ORDER BY doc_id) AS BIGINT) AS seq,
        |         string_split(lower(regexp_replace(trim(text), '\s+', ' ', 'g')), ' ') AS toks
        |  FROM documents),
        |tokf AS (
        |  SELECT lang, seq, unnest(toks) AS tok FROM docs),
        |tokc AS (SELECT * FROM tokf WHERE tok <> ''),
        |dl AS (SELECT lang, seq, CAST(COUNT(*) AS BIGINT) AS dl FROM tokc GROUP BY 1, 2),
        |fs AS (SELECT lang, tok, MIN(seq) AS seq FROM tokc GROUP BY 1, 2),
        |nt AS (SELECT lang, seq, CAST(COUNT(*) AS BIGINT) AS nt FROM fs GROUP BY 1, 2),
        |base AS (
        |  SELECT d.lang, d.seq, COALESCE(dl.dl, 0) AS dl, COALESCE(nt.nt, 0) AS nt
        |  FROM (SELECT lang, seq FROM docs) d
        |  LEFT JOIN dl ON dl.lang = d.lang AND dl.seq = d.seq
        |  LEFT JOIN nt ON nt.lang = d.lang AND nt.seq = d.seq),
        |c AS (
        |  SELECT lang, seq,
        |         CAST(SUM(nt) OVER w AS BIGINT) AS vocab_size,
        |         CAST(SUM(dl) OVER w AS BIGINT) AS token_mass,
        |         CAST(COUNT(*) OVER (PARTITION BY lang) AS BIGINT) AS n_docs
        |  FROM base
        |  WINDOW w AS (PARTITION BY lang ORDER BY seq
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT lang, seq AS k_docs, vocab_size, token_mass, n_docs
        |FROM c
        |WHERE (seq & (seq - 1)) = 0 OR seq = n_docs
        |ORDER BY lang, k_docs""".stripMargin,

    // ops.Insights.statAnovaCells: exact cents moments, sumsq in
    // DECIMAL(38,0) via HUGEINT product (BIGINT v*v would overflow)
    "stat_anova_cells" ->
      """SELECT c.c_mktsegment AS segment,
        |       CAST(COUNT(*) AS BIGINT) AS n,
        |       CAST(SUM(v) AS BIGINT) AS sum_cents,
        |       CAST(SUM(CAST(v AS HUGEINT) * v) AS VARCHAR) AS sumsq_cents
        |FROM (SELECT o_custkey,
        |             CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
        |      FROM orders) o
        |JOIN customer c ON c.c_custkey = o.o_custkey
        |GROUP BY 1
        |ORDER BY segment""".stripMargin,

    // ops.Insights.eventsInterarrival: exact microsecond gaps, lower
    // median at rank (n+1)//2 in (gap, later-event-id) order
    "events_interarrival" ->
      """WITH e AS (
        |  SELECT event_type AS t, user_id AS u, epoch_us(ts) AS us, event_id
        |  FROM events),
        |g AS (
        |  SELECT t, u, event_id,
        |         us - LAG(us) OVER (PARTITION BY t, u ORDER BY us, event_id) AS gap
        |  FROM e),
        |gg AS (SELECT * FROM g WHERE gap IS NOT NULL),
        |r AS (
        |  SELECT t, gap,
        |         CAST(ROW_NUMBER() OVER (PARTITION BY t ORDER BY gap, event_id) AS BIGINT) AS rg,
        |         CAST(COUNT(*) OVER (PARTITION BY t) AS BIGINT) AS n
        |  FROM gg),
        |med AS (SELECT t, gap AS med_gap_us FROM r WHERE rg = (n + 1) // 2),
        |a AS (
        |  SELECT t, CAST(COUNT(DISTINCT u) AS BIGINT) AS n_users,
        |         CAST(COUNT(*) AS BIGINT) AS n_gaps,
        |         CAST(SUM(gap) AS BIGINT) AS sum_gap_us,
        |         CAST(MAX(gap) AS BIGINT) AS max_gap_us
        |  FROM gg GROUP BY 1)
        |SELECT a.t AS event_type, n_users, n_gaps, sum_gap_us,
        |       med.med_gap_us, max_gap_us
        |FROM a JOIN med ON med.t = a.t
        |ORDER BY event_type""".stripMargin,

    // ops.Insights.ordersOpenBacklog: event differencing + straight
    // cumulative (the Spark side's two-level decomposition must agree)
    "orders_open_backlog" ->
      """WITH cl AS (
        |  SELECT l_orderkey, MAX(CAST(l_shipdate AS DATE)) AS close0
        |  FROM lineitem GROUP BY 1),
        |o AS (
        |  SELECT CAST(datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS open_d,
        |         CAST(datediff('day', DATE '1970-01-01',
        |              GREATEST(close0, CAST(o_orderdate AS DATE))) AS BIGINT) AS close_d
        |  FROM orders JOIN cl ON cl.l_orderkey = o_orderkey),
        |op AS (SELECT open_d AS d, CAST(COUNT(*) AS BIGINT) AS opened FROM o GROUP BY 1),
        |clc AS (SELECT close_d AS d, CAST(COUNT(*) AS BIGINT) AS closed FROM o GROUP BY 1),
        |bounds AS (SELECT MIN(open_d) AS lo, MAX(close_d) AS hi FROM o),
        |spine AS (
        |  SELECT CAST(unnest(generate_series(lo, hi)) AS BIGINT) AS d FROM bounds),
        |del AS (
        |  SELECT d, SUM(delta) AS delta FROM (
        |    SELECT d, opened AS delta FROM op
        |    UNION ALL
        |    SELECT d + 1, -closed FROM clc) GROUP BY 1),
        |j AS (
        |  SELECT s.d, COALESCE(op.opened, 0) AS opened,
        |         COALESCE(clc.closed, 0) AS closed,
        |         COALESCE(del.delta, 0) AS delta
        |  FROM spine s
        |  LEFT JOIN op ON op.d = s.d
        |  LEFT JOIN clc ON clc.d = s.d
        |  LEFT JOIN del ON del.d = s.d)
        |SELECT d, CAST(opened AS BIGINT) AS opened, CAST(closed AS BIGINT) AS closed,
        |       CAST(SUM(delta) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING
        |                             AND CURRENT ROW) AS BIGINT) AS backlog
        |FROM j ORDER BY d""".stripMargin,

    // ops.InfoTheory.textKnContinuation: bigram zip extraction (the
    // cond-entropy idiom), left/right type diversity, top-20 per lang
    "text_kn_continuation" ->
      """WITH tokarr AS (
        |  SELECT doc_id, lang,
        |         string_split(lower(regexp_replace(trim(text), '\s+', ' ', 'g')), ' ') AS toks
        |  FROM documents),
        |toks AS (
        |  SELECT lang, unnest(toks) AS tok FROM tokarr),
        |big AS (
        |  SELECT lang,
        |         unnest(list_transform(generate_series(1, len(toks) - 1), i -> toks[i])) AS prev,
        |         unnest(list_transform(generate_series(1, len(toks) - 1), i -> toks[i + 1])) AS tok
        |  FROM tokarr WHERE len(toks) >= 2),
        |uni AS (
        |  SELECT lang, tok, CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM toks WHERE tok <> '' GROUP BY 1, 2),
        |cont AS (
        |  SELECT lang, tok, CAST(COUNT(DISTINCT prev) AS BIGINT) AS cont_types
        |  FROM big GROUP BY 1, 2),
        |fert AS (
        |  SELECT lang, prev AS tok, CAST(COUNT(DISTINCT tok) AS BIGINT) AS fert_types
        |  FROM big GROUP BY 1, 2),
        |bt AS (
        |  SELECT lang, CAST(COUNT(*) AS BIGINT) AS bigram_types
        |  FROM (SELECT DISTINCT lang, prev, tok FROM big) GROUP BY 1),
        |j AS (
        |  SELECT u.lang, u.tok, u.cnt,
        |         COALESCE(c.cont_types, 0) AS cont_types,
        |         COALESCE(f.fert_types, 0) AS fert_types
        |  FROM uni u
        |  LEFT JOIN cont c ON c.lang = u.lang AND c.tok = u.tok
        |  LEFT JOIN fert f ON f.lang = u.lang AND f.tok = u.tok),
        |r AS (
        |  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY lang
        |            ORDER BY cont_types DESC, tok) AS BIGINT) AS rn
        |  FROM j)
        |SELECT r.lang, rn, tok, cnt, cont_types, fert_types, bt.bigram_types
        |FROM r JOIN bt ON bt.lang = r.lang
        |WHERE rn <= 20
        |ORDER BY r.lang, rn""".stripMargin,

    // ops.Relational.sqlTpchQ18: integral-double quantities cast to
    // BIGINT before summing; top-100 tie-broken by o_orderkey
    // ops.Relational.sqlTpchQ1: pricing summary with all money math
    // on exact integer cents / fixed 10^4 & 10^6 product scales.
    "sql_tpch_q1" ->
      """SELECT l_returnflag, l_linestatus,
        |       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        |       CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS sum_base_cents,
        |       CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |                * (100 - CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT))) AS BIGINT) AS sum_disc_e4,
        |       CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |                * (100 - CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT))
        |                * (100 + CAST(CAST(l_tax AS DECIMAL(18,2)) * 100 AS BIGINT))) AS BIGINT) AS sum_charge_e6,
        |       count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    // ops.Relational.sqlTpchQ6: the pushdown showcase; the discount
    // band compares exact integer percents, never float boundaries.
    "sql_tpch_q6" ->
      """SELECT CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |                * CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS revenue_e4,
        |       count(*) AS n_rows
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_discount > 0.045 AND l_discount < 0.075
        |  AND CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT) BETWEEN 5 AND 7
        |  AND l_quantity < 24""".stripMargin,

    // ops.Relational.sqlTpchQ14: promo revenue share — conditional
    // aggregation over the join, integer money, one IEEE division.
    "sql_tpch_q14" ->
      """SELECT CAST(sum(CASE WHEN p_type = 'PROMO'
        |            THEN CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |                 * (100 - CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT))
        |            ELSE 0 END) AS BIGINT) AS promo_e4,
        |       CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |                * (100 - CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT))) AS BIGINT) AS total_e4,
        |       count(*) AS n_rows,
        |       CAST(CAST(sum(CASE WHEN p_type = 'PROMO'
        |                 THEN CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |                      * (100 - CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT))
        |                 ELSE 0 END) AS BIGINT) AS DOUBLE)
        |         / CAST(CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |                     * (100 - CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT))) AS BIGINT) AS DOUBLE)
        |         AS promo_share
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1996-10-01 00:00:00'""".stripMargin,

    // ops.Relational.sqlTpchQ19 (adapted): OR-of-ANDs mixed-side
    // predicate over the equi-join; same integer money discipline.
    "sql_tpch_q19" ->
      """SELECT CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |                * (100 - CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT))) AS BIGINT) AS revenue_e4,
        |       count(*) AS n_rows
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
        |         AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
        |         AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
        |         AND l_quantity BETWEEN 20 AND 30)""".stripMargin,

    "sql_tpch_q18" ->
      """SELECT c_custkey, c_name, o_orderkey,
        |       CAST(o_orderdate AS DATE) AS o_date,
        |       CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS totalprice_cents,
        |       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE o_orderkey IN (
        |  SELECT l_orderkey FROM lineitem
        |  GROUP BY l_orderkey
        |  HAVING sum(CAST(l_quantity AS BIGINT)) > 180)
        |GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
        |ORDER BY totalprice_cents DESC, o_orderkey
        |LIMIT 100""".stripMargin,

    // ops.InfoTheory.textVocabCoverage: power-of-two rank spine via
    // rn & (rn-1) = 0, same (cnt DESC, tok) total order as zipf
    "text_vocab_coverage" ->
      """WITH tok AS (
        |  SELECT lang,
        |         unnest(string_split(lower(regexp_replace(trim(text), '\s+', ' ', 'g')), ' ')) AS tok
        |  FROM documents),
        |counts AS (
        |  SELECT lang, tok, CAST(count(*) AS BIGINT) AS cnt
        |  FROM tok WHERE tok <> '' GROUP BY lang, tok),
        |ranked AS (
        |  SELECT lang, cnt,
        |         CAST(ROW_NUMBER() OVER w AS BIGINT) AS rn,
        |         CAST(SUM(cnt) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_cnt,
        |         CAST(SUM(cnt) OVER (PARTITION BY lang) AS BIGINT) AS total_cnt,
        |         CAST(COUNT(*) OVER (PARTITION BY lang) AS BIGINT) AS vocab_size
        |  FROM counts
        |  WINDOW w AS (PARTITION BY lang ORDER BY cnt DESC, tok))
        |SELECT lang, rn AS k, cum_cnt, total_cnt, vocab_size
        |FROM ranked
        |WHERE (rn & (rn - 1)) = 0 OR rn = vocab_size
        |ORDER BY lang, k""".stripMargin,

    // ops.Insights.ordersBenfordDigits: lexical leading digit of the
    // cents string (exact in both engines), full priority x digit grid
    "orders_benford_digits" ->
      """WITH v AS (
        |  SELECT o_orderpriority AS priority,
        |         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
        |  FROM orders),
        |obs AS (
        |  SELECT priority,
        |         CAST(substr(CAST(v AS VARCHAR), 1, 1) AS BIGINT) AS digit,
        |         CAST(COUNT(*) AS BIGINT) AS o
        |  FROM v GROUP BY 1, 2),
        |prios AS (SELECT DISTINCT priority FROM obs),
        |digits AS (SELECT CAST(range AS BIGINT) AS digit FROM range(1, 10)),
        |tots AS (SELECT priority, CAST(SUM(o) AS BIGINT) AS prio_tot FROM obs GROUP BY 1)
        |SELECT p.priority, d.digit, COALESCE(obs.o, 0) AS o, t.prio_tot
        |FROM prios p CROSS JOIN digits d
        |LEFT JOIN obs ON obs.priority = p.priority AND obs.digit = d.digit
        |JOIN tots t ON t.priority = p.priority
        |ORDER BY p.priority, d.digit""".stripMargin,

    // ops.Relational.sqlTpchQ10: exact decimal product-sum cast once;
    // top-20 tie-broken by c_custkey
    "sql_tpch_q10" ->
      """SELECT c_custkey, c_name,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |                (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |       c_acctbal, c_mktsegment, n_name
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE CAST(o_orderdate AS DATE) >= DATE '1996-10-01'
        |  AND CAST(o_orderdate AS DATE) < DATE '1997-01-01'
        |  AND l_returnflag = 'R'
        |GROUP BY c_custkey, c_name, c_acctbal, c_mktsegment, n_name
        |ORDER BY revenue DESC, c_custkey
        |LIMIT 20""".stripMargin,

    // ops.Insights.ordersRunsTest: lower median at rank (n+1)//2,
    // ties-to-below sign convention, runs = 1 + sign flips along the
    // (date, orderkey) total order — identical in both engines
    "orders_runs_test" ->
      """WITH o AS (
        |  SELECT c.c_mktsegment AS segment, o_orderkey,
        |         CAST(datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS d,
        |         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
        |  FROM orders JOIN customer c ON c.c_custkey = o_custkey),
        |r AS (
        |  SELECT segment, o_orderkey, d, v,
        |         CAST(ROW_NUMBER() OVER (PARTITION BY segment
        |                                 ORDER BY v, o_orderkey) AS BIGINT) AS rv,
        |         CAST(COUNT(*) OVER (PARTITION BY segment) AS BIGINT) AS n
        |  FROM o),
        |med AS (
        |  SELECT segment, v AS med FROM r WHERE rv = (n + 1) // 2),
        |sgn AS (
        |  SELECT o.segment,
        |         CASE WHEN o.v > med.med THEN 1 ELSE 0 END AS sign,
        |         LAG(CASE WHEN o.v > med.med THEN 1 ELSE 0 END)
        |           OVER (PARTITION BY o.segment ORDER BY o.d, o.o_orderkey) AS prev
        |  FROM o JOIN med ON med.segment = o.segment)
        |SELECT segment, CAST(SUM(sign) AS BIGINT) AS n_plus,
        |       CAST(SUM(1 - sign) AS BIGINT) AS n_minus,
        |       CAST(SUM(CASE WHEN prev IS NOT NULL AND prev <> sign THEN 1 ELSE 0 END) + 1 AS BIGINT) AS runs
        |FROM sgn GROUP BY 1
        |ORDER BY segment""".stripMargin,

    // ops.Insights.ordersCohortLtv: integer month age, exact decimal
    // cents, cumulative ramp partitioned by cohort
    "orders_cohort_ltv" ->
      """WITH o AS (
        |  SELECT o_custkey, date_trunc('month', CAST(o_orderdate AS DATE)) AS m,
        |         CAST(o_totalprice AS DECIMAL(18,2)) AS price
        |  FROM orders),
        |fst AS (SELECT o_custkey, MIN(m) AS m0 FROM o GROUP BY 1),
        |pa AS (
        |  SELECT CAST(f.m0 AS VARCHAR) AS cohort,
        |         CAST((year(o.m) - year(f.m0)) * 12
        |              + (month(o.m) - month(f.m0)) AS BIGINT) AS age,
        |         CAST(COUNT(DISTINCT o.o_custkey) AS BIGINT) AS n_active,
        |         CAST(SUM(o.price) * 100 AS BIGINT) AS rev_cents
        |  FROM o JOIN fst f ON f.o_custkey = o.o_custkey
        |  GROUP BY 1, 2),
        |sizes AS (
        |  SELECT CAST(m0 AS VARCHAR) AS cohort,
        |         CAST(COUNT(*) AS BIGINT) AS cohort_size
        |  FROM fst GROUP BY 1)
        |SELECT pa.cohort, age, n_active, rev_cents,
        |       CAST(SUM(rev_cents) OVER (PARTITION BY pa.cohort ORDER BY age
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |         AS cum_rev_cents,
        |       cohort_size
        |FROM pa JOIN sizes ON sizes.cohort = pa.cohort
        |ORDER BY pa.cohort, age""".stripMargin,

    // ops.Insights.ordersTheilDecomposition: every log argument is an
    // INTEGER (x·N forms, never x/mu), replayed bit-exactly on the
    // Log2Sql chain over the distinct argument set
    "orders_theil_decomposition" ->
      s"""WITH rev AS (
         |  SELECT o_custkey,
         |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS x
         |  FROM orders GROUP BY 1),
         |xi AS (
         |  SELECT c.c_mktsegment AS segment, rev.x
         |  FROM rev JOIN customer c ON c.c_custkey = rev.o_custkey),
         |grp AS (
         |  SELECT segment, CAST(COUNT(*) AS BIGINT) AS n_g,
         |         CAST(SUM(x) AS BIGINT) AS x_g
         |  FROM xi GROUP BY 1),
         |gtot AS (
         |  SELECT CAST(SUM(n_g) AS BIGINT) AS n_total,
         |         CAST(SUM(x_g) AS BIGINT) AS x_total
         |  FROM grp),
         |args AS (
         |  SELECT xi.x * grp.n_g AS v FROM xi JOIN grp USING (segment)
         |  UNION SELECT x_g FROM grp
         |  UNION SELECT grp.x_g * gtot.n_total FROM grp CROSS JOIN gtot
         |  UNION SELECT gtot.x_total * grp.n_g FROM grp CROSS JOIN gtot),
         |${graft.oracle.Log2Sql.chain("lg", "SELECT v FROM args")},
         |wn AS (
         |  SELECT xi.segment, CAST(SUM(xi.x * (la.l20 - lb.l20)) AS BIGINT) AS w_num
         |  FROM xi JOIN grp USING (segment)
         |  JOIN lg la ON la.v = xi.x * grp.n_g
         |  JOIN lg lb ON lb.v = grp.x_g
         |  GROUP BY 1)
         |SELECT grp.segment, grp.n_g, grp.x_g, wn.w_num,
         |       CAST(grp.x_g * (lc.l20 - ld.l20) AS BIGINT) AS b_num,
         |       gtot.n_total, gtot.x_total
         |FROM grp JOIN wn ON wn.segment = grp.segment CROSS JOIN gtot
         |JOIN lg lc ON lc.v = grp.x_g * gtot.n_total
         |JOIN lg ld ON ld.v = gtot.x_total * grp.n_g
         |ORDER BY grp.segment""".stripMargin,
  )

  // ops.Embeddings: second-moment and quantization cells. Floats
  // enter through exact transforms (power-of-two fixed point) or
  // verbatim-ordered IEEE ops, so every emitted cell hashes exactly.
  private val embeddings: Map[String, String] = Map(
    // ops.Embeddings.embedGramCells: upper-triangle Gram cells over
    // the 2^14 fixed-point components — the flat (vec, i, qi) form
    // self-joined per vector replays Spark's row-local pair fan-out.
    "embed_gram_cells" ->
      """WITH q AS (
        |  SELECT vec_id,
        |         list_transform(embedding,
        |           x -> CAST(floor(CAST(x AS DOUBLE) * 16384.0) AS BIGINT)) AS q
        |  FROM embeddings),
        |flat AS (
        |  SELECT vec_id, CAST(u.i AS BIGINT) AS i, q[CAST(u.i AS INT)] AS qi
        |  FROM q, unnest(generate_series(1, CAST(len(q) AS BIGINT))) AS u(i))
        |SELECT a.i - 1 AS i, b.i - 1 AS j, count(*) AS n_vecs,
        |       CAST(SUM(a.qi * b.qi) AS BIGINT) AS g
        |FROM flat a
        |JOIN flat b ON b.vec_id = a.vec_id AND b.i >= a.i
        |GROUP BY a.i, b.i
        |ORDER BY i, j""".stripMargin,

    // ops.Embeddings.embedCentroidCells: per-(label, dim) first-
    // moment cells over the same 2^14 fixed-point components.
    "embed_centroid_cells" ->
      """WITH flat AS (
        |  SELECT label, CAST(u.i AS BIGINT) - 1 AS dim,
        |         CAST(floor(CAST(embedding[CAST(u.i AS INT)] AS DOUBLE) * 16384.0) AS BIGINT) AS q
        |  FROM embeddings,
        |       unnest(generate_series(1, CAST(len(embedding) AS BIGINT))) AS u(i))
        |SELECT label, dim, count(*) AS n_vecs, CAST(SUM(q) AS BIGINT) AS s_q
        |FROM flat GROUP BY label, dim
        |ORDER BY label, dim""".stripMargin,

    // ops.Embeddings.embedLabelAffinity: cross-label centroid dot
    // products as digit strings (HUGEINT → VARCHAR; the anova cells'
    // wide-integer portability discipline).
    "embed_label_affinity" ->
      """WITH flat AS (
        |  SELECT label, CAST(u.i AS BIGINT) - 1 AS dim,
        |         CAST(floor(CAST(embedding[CAST(u.i AS INT)] AS DOUBLE) * 16384.0) AS BIGINT) AS q
        |  FROM embeddings,
        |       unnest(generate_series(1, CAST(len(embedding) AS BIGINT))) AS u(i)),
        |cc AS (
        |  SELECT label, dim, count(*) AS n, CAST(SUM(q) AS BIGINT) AS s
        |  FROM flat GROUP BY label, dim)
        |SELECT a.label AS label_a, b.label AS label_b,
        |       CAST(MIN(a.n) AS BIGINT) AS n_a, CAST(MIN(b.n) AS BIGINT) AS n_b,
        |       CAST(SUM(CAST(a.s AS HUGEINT) * CAST(b.s AS HUGEINT)) AS VARCHAR) AS dot_dec
        |FROM cc a
        |JOIN cc b ON b.dim = a.dim AND a.label <= b.label
        |GROUP BY a.label, b.label
        |ORDER BY label_a, label_b""".stripMargin,

    // ops.Embeddings.embedQuantizeInt8: per-label int8 profile; the
    // (x/s)*127 order is parenthesized identically to the Spark
    // expression so the IEEE bits match.
    "embed_quantize_int8" ->
      """WITH flat AS (
        |  SELECT vec_id, label,
        |         CAST(embedding[CAST(u.i AS INT)] AS DOUBLE) AS x
        |  FROM embeddings,
        |       unnest(generate_series(1, CAST(len(embedding) AS BIGINT))) AS u(i)),
        |sc AS (SELECT vec_id, MAX(abs(x)) AS s FROM flat GROUP BY vec_id),
        |qv AS (
        |  SELECT flat.vec_id, flat.label,
        |         CASE WHEN sc.s = 0 THEN 0
        |              ELSE CAST(floor((flat.x / sc.s) * 127.0) AS BIGINT)
        |         END AS qk
        |  FROM flat JOIN sc ON sc.vec_id = flat.vec_id),
        |pv AS (
        |  SELECT vec_id, label,
        |         CAST(SUM(qk * qk) AS BIGINT) AS q2,
        |         CAST(SUM(CASE WHEN qk = 0 THEN 1 ELSE 0 END) AS BIGINT) AS nz,
        |         CAST(SUM(CASE WHEN abs(qk) = 127 THEN 1 ELSE 0 END) AS BIGINT) AS ns
        |  FROM qv GROUP BY vec_id, label),
        |sf AS (
        |  SELECT vec_id, CAST(floor(s * 1048576.0) AS BIGINT) AS sfp FROM sc)
        |SELECT pv.label, count(*) AS n_vecs,
        |       CAST(SUM(pv.nz) AS BIGINT) AS n_zero,
        |       CAST(SUM(pv.ns) AS BIGINT) AS n_sat,
        |       CAST(SUM(pv.q2) AS BIGINT) AS sum_q2,
        |       CAST(SUM(sf.sfp) AS BIGINT) AS sum_scale_fp
        |FROM pv JOIN sf ON sf.vec_id = pv.vec_id
        |GROUP BY pv.label
        |ORDER BY pv.label""".stripMargin,
  )

  // ops.Tpch — the round-12 fifth-session TPC-H completion wave. Same
  // text as the Spark side except every BIGINT sum is re-CAST to
  // BIGINT (DuckDB's sum(BIGINT) returns HUGEINT, which pandas would
  // float) — the q18 discipline.
  private val tpch: Map[String, String] = Map(
    "sql_tpch_q4" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
        |  AND EXISTS (
        |    SELECT 1 FROM lineitem
        |    WHERE l_orderkey = o_orderkey
        |      AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "sql_tpch_q7" ->
      """SELECT supp_nation, cust_nation, l_year,
        |       CAST(sum(disc_e4) AS BIGINT) AS revenue_e4, count(*) AS n_rows
        |FROM (
        |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |         year(l_shipdate) AS l_year,
        |         CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |           * (100 - CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT)) AS disc_e4
        |  FROM supplier
        |  JOIN lineitem ON s_suppkey = l_suppkey
        |  JOIN orders ON o_orderkey = l_orderkey
        |  JOIN customer ON c_custkey = o_custkey
        |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |  WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
        |      OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
        |    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00') shipping
        |GROUP BY supp_nation, cust_nation, l_year
        |ORDER BY supp_nation, cust_nation, l_year""".stripMargin,

    "sql_tpch_q8" ->
      """SELECT o_year,
        |       CAST(sum(CASE WHEN nation = 'NATION_3' THEN disc_e4 ELSE 0 END) AS BIGINT) AS target_e4,
        |       CAST(sum(disc_e4) AS BIGINT) AS total_e4,
        |       CAST(CAST(sum(CASE WHEN nation = 'NATION_3' THEN disc_e4 ELSE 0 END) AS BIGINT) AS DOUBLE)
        |         / CAST(CAST(sum(disc_e4) AS BIGINT) AS DOUBLE) AS mkt_share
        |FROM (
        |  SELECT year(o_orderdate) AS o_year,
        |         CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |           * (100 - CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT)) AS disc_e4,
        |         n2.n_name AS nation
        |  FROM part
        |  JOIN lineitem ON p_partkey = l_partkey
        |  JOIN supplier ON s_suppkey = l_suppkey
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation n1 ON c_nationkey = n1.n_nationkey
        |  JOIN region ON n1.n_regionkey = r_regionkey
        |  JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |  WHERE r_name = 'AMERICA'
        |    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |    AND p_type = 'STANDARD') all_nations
        |GROUP BY o_year
        |ORDER BY o_year""".stripMargin,

    "sql_tpch_q9" ->
      """SELECT nation, o_year, CAST(sum(amount_e4) AS BIGINT) AS sum_profit_e4,
        |       count(*) AS n_rows
        |FROM (
        |  SELECT n_name AS nation, year(o_orderdate) AS o_year,
        |         CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |           * (100 - CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT))
        |           - CAST(l_quantity AS BIGINT)
        |             * CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT) * 80 AS amount_e4
        |  FROM part
        |  JOIN lineitem ON p_partkey = l_partkey
        |  JOIN supplier ON s_suppkey = l_suppkey
        |  JOIN orders ON o_orderkey = l_orderkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  WHERE p_name LIKE '%red%') profit
        |GROUP BY nation, o_year
        |ORDER BY nation, o_year DESC""".stripMargin,

    "sql_tpch_q12" ->
      """SELECT l_linestatus,
        |       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |           THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
        |           THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count,
        |       count(*) AS n_rows
        |FROM orders
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE l_shipdate > o_orderdate + INTERVAL 30 DAY
        |  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY l_linestatus
        |ORDER BY l_linestatus""".stripMargin,

    "sql_tpch_q13" ->
      """SELECT c_count, count(*) AS custdist
        |FROM (
        |  SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
        |  FROM customer
        |  LEFT OUTER JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |  GROUP BY c_custkey) c_orders
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,

    "sql_tpch_q15" ->
      """WITH revenue AS (
        |  SELECT l_suppkey AS supplier_no,
        |         CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |             * (100 - CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT))) AS BIGINT) AS total_e4
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, total_e4
        |FROM supplier
        |JOIN revenue ON s_suppkey = supplier_no
        |WHERE total_e4 = (SELECT max(total_e4) FROM revenue)
        |ORDER BY s_suppkey""".stripMargin,

    "sql_tpch_q17" ->
      """SELECT count(*) AS n_small,
        |       CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS sum_price_cents
        |FROM lineitem
        |JOIN part ON p_partkey = l_partkey
        |WHERE p_brand = 'Brand#3' AND p_size <= 10
        |  AND 5 * CAST(l_quantity AS BIGINT)
        |        * (SELECT count(*) FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
        |      < (SELECT CAST(sum(l_quantity) AS BIGINT) FROM lineitem l2
        |         WHERE l2.l_partkey = p_partkey)""".stripMargin,

    "sql_tpch_q21" ->
      """SELECT s_name, count(*) AS numwait
        |FROM supplier
        |JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
        |JOIN orders ON o_orderkey = l1.l_orderkey
        |WHERE o_orderstatus = 'F'
        |  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
        |  AND EXISTS (
        |    SELECT 1 FROM lineitem l2
        |    WHERE l2.l_orderkey = l1.l_orderkey
        |      AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (
        |    SELECT 1 FROM lineitem l3
        |    WHERE l3.l_orderkey = l1.l_orderkey
        |      AND l3.l_suppkey <> l1.l_suppkey
        |      AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name
        |LIMIT 10""".stripMargin,

    "sql_tpch_q22" ->
      """SELECT c_nationkey AS cntrycode, count(*) AS numcust,
        |       CAST(sum(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS totacctbal_cents
        |FROM customer c
        |WHERE c_nationkey IN (3, 7, 11, 17, 21)
        |  AND CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
        |        * (SELECT count(*) FROM customer c2
        |           WHERE c2.c_acctbal > 0 AND c2.c_nationkey IN (3, 7, 11, 17, 21))
        |      > (SELECT CAST(sum(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT)
        |         FROM customer c2
        |         WHERE c2.c_acctbal > 0 AND c2.c_nationkey IN (3, 7, 11, 17, 21))
        |  AND NOT EXISTS (
        |    SELECT 1 FROM orders
        |    WHERE o_custkey = c_custkey
        |      AND o_orderdate >= TIMESTAMP '1999-08-01 00:00:00')
        |GROUP BY c_nationkey
        |ORDER BY c_nationkey""".stripMargin,
  )

  // ops.Windows.eventsBounceRate: the sessionize chain rolled up to
  // daily session/bounce/duration cells
  private val bounce: Map[String, String] = Map(
    "events_bounce_rate" ->
      """WITH g AS (
        |  SELECT user_id, ts, event_id,
        |         CASE WHEN lag(ts) OVER w IS NULL
        |                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
        |              THEN 1 ELSE 0 END AS brk
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (
        |  SELECT user_id, ts,
        |         CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT)
        |           AS session_seq
        |  FROM g),
        |sess AS (
        |  SELECT user_id, session_seq, CAST(count(*) AS BIGINT) AS n_events,
        |         CAST(min(epoch_us(ts)) AS BIGINT) AS us_start,
        |         CAST(max(epoch_us(ts)) AS BIGINT) AS us_end
        |  FROM s GROUP BY 1, 2)
        |SELECT us_start // 86400000000 AS epoch_day,
        |       count(*) AS n_sessions,
        |       CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_bounce,
        |       CAST(SUM(n_events) AS BIGINT) AS n_events,
        |       CAST(SUM(CASE WHEN n_events > 1 THEN us_end - us_start ELSE 0 END) AS BIGINT)
        |         AS dur_us_multi
        |FROM sess
        |GROUP BY 1
        |ORDER BY epoch_day""".stripMargin,

    // ops.Llm2.statCohensKappa: the confusion rollup reduced to the
    // exact kappa cells + one IEEE division
    "stat_cohens_kappa" ->
      """WITH t AS (
        |  SELECT doc_id, lang,
        |         string_split(lower(regexp_replace(trim(text), '\s+', ' ', 'g')), ' ') AS toks,
        |         text
        |  FROM documents),
        |sc AS (
        |  SELECT doc_id, lang,
        |    CAST(len(list_filter(toks, x -> x IN ('der','die','und','ist','das','nicht','ein'))) AS INT) AS s_de,
        |    CAST(len(list_filter(toks, x -> x IN ('the','and','of','is','with','that','this'))) AS INT) AS s_en,
        |    CAST(len(list_filter(toks, x -> x IN ('el','la','de','que','y','los','una'))) AS INT) AS s_es,
        |    CAST(len(list_filter(toks, x -> x IN ('le','les','et','est','une','dans','pour'))) AS INT) AS s_fr,
        |    CAST(len(regexp_extract_all(text, '[一-鿿]')) AS INT) AS s_zh
        |  FROM t),
        |pred AS (
        |  SELECT lang,
        |         CASE WHEN s_zh > 0 THEN 'zh'
        |              WHEN greatest(s_de, s_en, s_es, s_fr, s_zh) = 0 THEN 'und'
        |              WHEN s_de = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'de'
        |              WHEN s_en = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'en'
        |              WHEN s_es = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'es'
        |              ELSE 'fr' END AS pred_lang
        |  FROM sc),
        |counts AS (SELECT lang, pred_lang, CAST(count(*) AS BIGINT) AS c FROM pred GROUP BY 1, 2),
        |rm AS (SELECT lang AS lbl, CAST(SUM(c) AS BIGINT) AS rmarg FROM counts GROUP BY 1),
        |cm AS (SELECT pred_lang AS lbl, CAST(SUM(c) AS BIGINT) AS cmarg FROM counts GROUP BY 1),
        |pe AS (SELECT CAST(COALESCE(SUM(rmarg * cmarg), 0) AS BIGINT) AS pe_num
        |       FROM rm JOIN cm USING (lbl)),
        |ag AS (SELECT CAST(COALESCE(SUM(c), 0) AS BIGINT) AS agree
        |       FROM counts WHERE lang = pred_lang),
        |nt AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM counts)
        |SELECT n, agree, pe_num,
        |       CAST(agree * n - pe_num AS DOUBLE) / CAST(n * n - pe_num AS DOUBLE) AS kappa
        |FROM nt CROSS JOIN ag CROSS JOIN pe""".stripMargin,
  )

  // ops.Aggregations.aggPercentileCont: PERCENTILE_CONT replayed with
  // the same ppm rank arithmetic — zero floats, exact micro-cents
  private val percentileCont: Map[String, String] = Map(
    "agg_percentile_cont" ->
      """WITH r AS (
        |  SELECT o_orderpriority,
        |         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
        |         CAST(ROW_NUMBER() OVER w AS BIGINT) - 1 AS rn,
        |         LEAD(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) OVER w AS nxt,
        |         CAST(COUNT(*) OVER (PARTITION BY o_orderpriority) AS BIGINT) AS n
        |  FROM orders
        |  WINDOW w AS (PARTITION BY o_orderpriority
        |               ORDER BY CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT),
        |                        o_orderkey)),
        |e AS (
        |  SELECT r.*, p.p_ppm, (n - 1) * p.p_ppm AS h_ppm
        |  FROM r CROSS JOIN (SELECT CAST(unnest([500000, 900000, 990000]) AS BIGINT) AS p_ppm) p)
        |SELECT o_orderpriority, p_ppm,
        |       CAST(cents * (1000000 - h_ppm % 1000000)
        |            + COALESCE(nxt, cents) * (h_ppm % 1000000) AS BIGINT) AS value_micro_cents,
        |       n
        |FROM e WHERE rn = h_ppm // 1000000
        |ORDER BY o_orderpriority, p_ppm""".stripMargin,
  )

  // ops.Llm2.textLangConfusion: the lang-id scorer replayed (same CTEs
  // as text_lang_id) into the full actual x predicted-domain grid
  private val langConfusion: Map[String, String] = Map(
    "text_lang_confusion" ->
      """WITH t AS (
        |  SELECT doc_id, lang,
        |         string_split(lower(regexp_replace(trim(text), '\s+', ' ', 'g')), ' ') AS toks,
        |         text
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, lang,
        |    CAST(len(list_filter(toks, x -> x IN ('der','die','und','ist','das','nicht','ein'))) AS INT) AS s_de,
        |    CAST(len(list_filter(toks, x -> x IN ('the','and','of','is','with','that','this'))) AS INT) AS s_en,
        |    CAST(len(list_filter(toks, x -> x IN ('el','la','de','que','y','los','una'))) AS INT) AS s_es,
        |    CAST(len(list_filter(toks, x -> x IN ('le','les','et','est','une','dans','pour'))) AS INT) AS s_fr,
        |    CAST(len(regexp_extract_all(text, '[一-鿿]')) AS INT) AS s_zh
        |  FROM t),
        |pred AS (
        |  SELECT doc_id, lang,
        |         CASE WHEN s_zh > 0 THEN 'zh'
        |              WHEN greatest(s_de, s_en, s_es, s_fr, s_zh) = 0 THEN 'und'
        |              WHEN s_de = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'de'
        |              WHEN s_en = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'en'
        |              WHEN s_es = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'es'
        |              ELSE 'fr' END AS pred_lang
        |  FROM s),
        |counts AS (
        |  SELECT lang, pred_lang, CAST(count(*) AS BIGINT) AS n
        |  FROM pred GROUP BY 1, 2),
        |actuals AS (SELECT DISTINCT lang FROM documents),
        |domain AS (SELECT unnest(['de','en','es','fr','zh','und']) AS pred_lang),
        |marg AS (SELECT lang, CAST(SUM(n) AS BIGINT) AS n_actual FROM counts GROUP BY 1)
        |SELECT a.lang, d.pred_lang,
        |       CAST(COALESCE(c.n, 0) AS BIGINT) AS n, m.n_actual
        |FROM actuals a
        |CROSS JOIN domain d
        |LEFT JOIN counts c ON c.lang = a.lang AND c.pred_lang = d.pred_lang
        |JOIN marg m ON m.lang = a.lang
        |ORDER BY a.lang, d.pred_lang""".stripMargin,
  )

  // ops.Tpch wave 2 — Q2/Q11/Q16/Q20 adapted over the lineitem-derived
  // part-supplier relation (no partsupp in the fixture). Same BIGINT
  // re-CAST discipline.
  private val tpch2: Map[String, String] = Map(
    "sql_tpch_q2" ->
      """WITH ps AS (
        |  SELECT l_partkey, l_suppkey,
        |         CAST(MIN(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) * 10000
        |             // CAST(l_quantity AS BIGINT)) AS BIGINT) AS unit_e6
        |  FROM lineitem GROUP BY l_partkey, l_suppkey)
        |SELECT CAST(CAST(s_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS acctbal_cents,
        |       s_name, n_name, p_partkey, unit_e6
        |FROM part
        |JOIN ps ON p_partkey = l_partkey
        |JOIN supplier ON s_suppkey = l_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE p_size <= 5 AND p_type = 'STANDARD' AND r_name = 'EUROPE'
        |  AND unit_e6 = (
        |    SELECT MIN(ps2.unit_e6)
        |    FROM ps ps2
        |    JOIN supplier s2 ON s2.s_suppkey = ps2.l_suppkey
        |    JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
        |    JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
        |    WHERE ps2.l_partkey = p_partkey AND r2.r_name = 'EUROPE')
        |ORDER BY acctbal_cents DESC, s_name, p_partkey
        |LIMIT 100""".stripMargin,

    "sql_tpch_q11" ->
      """WITH val AS (
        |  SELECT l_partkey,
        |         CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |             * CAST(l_quantity AS BIGINT)) AS BIGINT) AS v
        |  FROM lineitem
        |  JOIN supplier ON s_suppkey = l_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  WHERE n_name = 'NATION_3'
        |  GROUP BY l_partkey)
        |SELECT l_partkey, v AS value_e2q
        |FROM val
        |WHERE v * 10000 > (SELECT CAST(SUM(v) AS BIGINT) FROM val)
        |ORDER BY value_e2q DESC, l_partkey""".stripMargin,

    "sql_tpch_q16" ->
      """SELECT p_brand, p_type, p_size,
        |       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        |FROM lineitem
        |JOIN part ON p_partkey = l_partkey
        |WHERE p_brand <> 'Brand#5'
        |  AND p_size IN (1, 5, 9, 15, 25, 35, 44, 49)
        |  AND l_suppkey NOT IN (
        |    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,

    "sql_tpch_q20" ->
      """SELECT s_suppkey, s_name
        |FROM supplier
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE n_name = 'NATION_9'
        |  AND s_suppkey IN (
        |    SELECT li.l_suppkey
        |    FROM lineitem li
        |    JOIN part ON p_partkey = li.l_partkey
        |    WHERE p_name LIKE '%red%'
        |      AND li.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |      AND li.l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |    GROUP BY li.l_suppkey, li.l_partkey
        |    HAVING SUM(CAST(li.l_quantity AS BIGINT)) * 2 > (
        |      SELECT SUM(CAST(l2.l_quantity AS BIGINT)) FROM lineitem l2
        |      WHERE l2.l_partkey = li.l_partkey
        |        AND l2.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |        AND l2.l_shipdate < TIMESTAMP '1997-01-01 00:00:00'))
        |ORDER BY s_suppkey""".stripMargin,
  )

  val sql: Map[String, String] =
    relational ++ asof ++ scalarFns ++ aggregations ++ windows ++ setSort ++
      llm ++ streaming ++ llm2 ++ curation ++ statsLayout ++ analytics ++
      analytics2 ++ graph ++ round8 ++ infoTheory ++ bpe ++ bipartite ++
      insights ++ embeddings ++ tpch ++ tpch2 ++ langConfusion ++
      percentileCont ++ bounce
}
