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
        |       CAST(o_totalprice AS DECIMAL(18,2)) AS totalprice_dec,
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

  val sql: Map[String, String] = relational
}
