package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._
import graft.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 has an entry in [[queries]]
  * and (where ANSI-SQL-expressible) a DuckDB oracle in [[oracleSql]].
  * Column names/aliases are kept identical on both sides — the driver's
  * compare sorts columns by name before hashing.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the full backfill feed (scan → broadcast key-store join → envelope). */
  def entry(spark: SparkSession): DataFrame =
    Envelope.unionFeed(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.1–§2.5 reference-parity relational surface
    "backfill_scan"      -> (Relational.backfillScan _),
    "count_keystores"    -> (Relational.countKeystores _),
    "count_per_merchant" -> (Relational.countPerMerchant _),
    "keystore_in_list"   -> (Relational.keystoreInList _),
    "backfill_join"      -> (Relational.backfillJoin _),
    "semi_join"          -> (Relational.semiJoin _),
    "anti_join"          -> (Relational.antiJoin _),
    "pagination_window"  -> (Relational.paginationWindow _),
    "topk_per_group"     -> (Relational.topkPerGroup _),
    "tenant_tag"         -> (Relational.tenantTag _),
    // §2.6 per-row transforms
    "multi_format_ts"    -> (Timestamps.multiFormatParse _),
    "event_envelope"     -> (Envelope.eventEnvelope _),
    "union_feed"         -> (Envelope.unionFeed _),
    "decrypt_two_level"  -> (Crypto.decryptTwoLevel _),
    // aggregation surface
    "pricing_summary"    -> (Aggregates.pricingSummary _),
    "distinct_counts"    -> (Aggregates.distinctCounts _),
    "approx_distinct"    -> (Aggregates.approxDistinct _),
    "window_running"     -> (Aggregates.windowRunning _),
    "rollup_docs"        -> (Aggregates.rollupDocs _),
    "events_window_agg"  -> (Aggregates.eventsWindowAgg _),
  )

  def oracleSql: Map[String, String] = Map(
    "backfill_scan" ->
      """SELECT * FROM orders
         WHERE o_custkey = 42
           AND o_orderdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1999-12-31'
         ORDER BY o_orderkey""",
    "count_keystores" ->
      "SELECT count(*) AS cnt FROM customer",
    "count_per_merchant" ->
      """SELECT o_custkey, count(*) AS order_cnt FROM orders
         WHERE o_orderdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1999-12-31'
         GROUP BY o_custkey ORDER BY o_custkey""",
    "keystore_in_list" ->
      """SELECT c_custkey, c_name, c_nationkey, c_mktsegment FROM customer
         WHERE c_custkey IN (1, 7, 42, 99, 101) ORDER BY c_custkey""",
    "backfill_join" ->
      """SELECT o_orderkey, o_custkey, c_name, c_nationkey, o_totalprice, o_orderdate
         FROM orders JOIN customer ON o_custkey = c_custkey
         ORDER BY o_orderkey""",
    "semi_join" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE c_custkey IN (SELECT o_custkey FROM orders) ORDER BY c_custkey""",
    "anti_join" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE c_custkey NOT IN (SELECT o_custkey FROM orders) ORDER BY c_custkey""",
    "pagination_window" ->
      """SELECT rn, o_orderkey, o_custkey, o_orderstatus FROM (
           SELECT row_number() OVER (ORDER BY o_orderkey) AS rn,
                  o_orderkey, o_custkey, o_orderstatus FROM orders)
         WHERE rn BETWEEN 201 AND 300 ORDER BY rn""",
    "topk_per_group" ->
      """SELECT o_custkey, rk, o_orderkey, o_totalprice FROM (
           SELECT o_custkey, o_orderkey, o_totalprice,
                  row_number() OVER (PARTITION BY o_custkey
                    ORDER BY o_totalprice DESC, o_orderkey) AS rk
           FROM orders)
         WHERE rk <= 3 ORDER BY o_custkey, rk""",
    "tenant_tag" ->
      """SELECT event_id, 'public' AS tenant, 'payment_intent' AS entity,
                event_type, user_id
         FROM events ORDER BY event_id""",
    "multi_format_ts" ->
      """SELECT event_id,
         CASE WHEN event_id % 3 = 0 THEN strftime(ts, '%Y-%m-%d %H:%M:%S.%f')
              WHEN event_id % 3 = 1 THEN strftime(date_trunc('second', ts), '%Y-%m-%d %H:%M:%S')
              ELSE strftime(ts, '%Y-%m-%d') END AS raw,
         coalesce(
           try_strptime(CASE WHEN event_id % 3 = 0 THEN strftime(ts, '%Y-%m-%d %H:%M:%S.%f')
                WHEN event_id % 3 = 1 THEN strftime(date_trunc('second', ts), '%Y-%m-%d %H:%M:%S')
                ELSE strftime(ts, '%Y-%m-%d') END, '%Y-%m-%d %H:%M:%S.%f'),
           try_strptime(CASE WHEN event_id % 3 = 0 THEN strftime(ts, '%Y-%m-%d %H:%M:%S.%f')
                WHEN event_id % 3 = 1 THEN strftime(date_trunc('second', ts), '%Y-%m-%d %H:%M:%S')
                ELSE strftime(ts, '%Y-%m-%d') END, '%Y-%m-%d %H:%M:%S'),
           try_strptime(CASE WHEN event_id % 3 = 0 THEN strftime(ts, '%Y-%m-%d %H:%M:%S.%f')
                WHEN event_id % 3 = 1 THEN strftime(date_trunc('second', ts), '%Y-%m-%d %H:%M:%S')
                ELSE strftime(ts, '%Y-%m-%d') END, '%Y-%m-%d')) AS parsed_ts
         FROM events ORDER BY event_id""",
    "event_envelope" ->
      """SELECT 'orders' AS entity, CAST(o_orderkey AS VARCHAR) AS key,
                'public' AS tenant,
                '{"order_id":' || o_orderkey ||
                ',"merchant_id":' || o_custkey ||
                ',"status":"' || o_orderstatus ||
                '","amount":"' || printf('%.2f', o_totalprice) ||
                '","created_at":"' || strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') ||
                '"}' AS value
         FROM orders ORDER BY o_orderkey""",
    "union_feed" ->
      """SELECT * FROM (
           SELECT 'orders' AS entity, CAST(o_orderkey AS VARCHAR) AS key,
                  'public' AS tenant,
                  '{"order_id":' || o_orderkey ||
                  ',"merchant_id":' || o_custkey ||
                  ',"status":"' || o_orderstatus ||
                  '","amount":"' || printf('%.2f', o_totalprice) ||
                  '","created_at":"' || strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') ||
                  '"}' AS value
           FROM orders
           UNION ALL
           SELECT 'lineitem', l_orderkey || '_' || l_linenumber, 'public',
                  '{"order_id":' || l_orderkey ||
                  ',"line_no":' || l_linenumber ||
                  ',"return_flag":"' || l_returnflag ||
                  '","line_status":"' || l_linestatus ||
                  '","quantity":"' || printf('%.2f', l_quantity) || '"}'
           FROM lineitem)
         ORDER BY entity, key""",
    "decrypt_two_level" ->
      """SELECT o_orderkey, o_custkey AS merchant_id, o_orderpriority AS priority
         FROM orders ORDER BY o_orderkey""",
    "pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
                CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
                CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
                CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                         (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
                CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                         (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) *
                         (CAST(1 AS DECIMAL(18,2)) + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
                CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
                count(*) AS count_order
         FROM lineitem
         WHERE l_shipdate <= TIMESTAMP '1998-09-02'
         GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",
    "distinct_counts" ->
      """SELECT count(DISTINCT o_custkey) AS n_merchants,
                count(DISTINCT o_orderstatus) AS n_statuses,
                count(*) AS n_rows
         FROM orders""",
    "window_running" ->
      """SELECT user_id, event_id, ts, value,
                CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
                  PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
                  AS running_value
         FROM events ORDER BY user_id, event_id""",
    "rollup_docs" ->
      """SELECT lang, source, count(*) AS n_docs,
                CAST(SUM(CAST(n_chars AS DECIMAL(18,2))) AS DOUBLE) AS sum_chars
         FROM documents
         GROUP BY ROLLUP (lang, source)
         ORDER BY lang ASC NULLS FIRST, source ASC NULLS FIRST""",
    "events_window_agg" ->
      """SELECT time_bucket(INTERVAL '1 hour', ts) AS ws, event_type,
                count(*) AS n,
                CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         FROM events GROUP BY 1, 2 ORDER BY ws, event_type""",
  )
}
