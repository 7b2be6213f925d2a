package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.SmartCast
import graft.operators.Sketches

/** The reference's relational query surface (SURVEY §2-D, reference db/check.py,
  * routes/status.py, cli.py) re-expressed over the driver's TPC-H-ish test
  * tables. Each query keeps the *shape* of the reference operator — join kinds,
  * window frames, conditional aggregation, merge/upsert, retention — while the
  * inputs come from /root/testdata (TESTDATA.md).
  *
  * Scale notes are inline: every aggregate is a partial+final hash agg, small
  * dimensions are broadcast, and nothing materializes on the driver.
  */
object RelationalQueries {

  import NamedQuery.{rowsOnly, sql}

  def all: Map[String, NamedQuery] = Map(

    // D3 (db/check.py:86-98): dynamic group-by + count + top-k. Hash agg with
    // map-side partials; top-k via TakeOrderedAndProject (no full sort).
    "d03_aggregate_topk" -> sql(
      (s, dir) =>
        Tables.events(s, dir)
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"))
          .orderBy(desc("n"), col("event_type"))
          .limit(20),
      """SELECT event_type, count(*) AS n FROM events
        |GROUP BY event_type ORDER BY n DESC, event_type LIMIT 20""".stripMargin),

    // D1 (db/check.py:55-69): filtered multi-way join. region/nation are tiny →
    // broadcast hash joins, zero shuffle of the big side.
    "d01_join_filter" -> sql(
      (s, dir) => {
        val region = Tables.region(s, dir).filter(col("r_name") === "EUROPE")
        Tables.customer(s, dir)
          .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
          .groupBy("n_name")
          .agg(count(lit(1)).as("n_customers"), round(sum("c_acctbal"), 2).as("sum_acctbal"))
          .orderBy("n_name")
      },
      """SELECT n_name, count(*) AS n_customers, round(sum(c_acctbal), 2) AS sum_acctbal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'EUROPE'
        |GROUP BY n_name ORDER BY n_name""".stripMargin),

    // D4 (routes/status.py:10-71): conditional aggregation + COALESCE grouping.
    "d04_status_agg" -> sql(
      (s, dir) =>
        Tables.orders(s, dir)
          .groupBy(coalesce(col("o_orderstatus"), lit("NULL")).as("status"))
          .agg(
            count(lit(1)).as("n"),
            round(sum(when(col("o_totalprice") > 100000, col("o_totalprice")).otherwise(0.0)), 2)
              .as("big_total"))
          .orderBy("status"),
      """SELECT coalesce(o_orderstatus, 'NULL') AS status, count(*) AS n,
        |  round(sum(CASE WHEN o_totalprice > 100000 THEN o_totalprice ELSE 0 END), 2) AS big_total
        |FROM orders GROUP BY 1 ORDER BY status""".stripMargin),

    // D5 (routes/status.py:79-140): per-group counts + global percentage.
    // Scale: the global total is a 1-row broadcast cross-join, NOT a
    // Window.partitionBy() (which would funnel everything to one partition).
    "d05_stats_pct" -> sql(
      (s, dir) => {
        val byStatus = Tables.orders(s, dir)
          .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
        val total = byStatus.agg(sum("n").as("total"))
        byStatus.crossJoin(broadcast(total))
          .select(
            col("o_orderstatus"), col("n"),
            round(col("n") * lit(100.0) / col("total"), 2).as("pct"))
          .orderBy("o_orderstatus")
      },
      """WITH s AS (SELECT o_orderstatus, count(*) AS n FROM orders GROUP BY 1)
        |SELECT o_orderstatus, n, round(n * 100.0 / (SELECT sum(n) FROM s), 2) AS pct
        |FROM s ORDER BY o_orderstatus""".stripMargin),

    // D6 (analysis/resource.py:232-247): last-2-per-key window. Partitioned by
    // key → scales: one shuffle on user_id, no global sort. Tie-broken by
    // event_id; Spark timestamps are µs so the oracle orders on epoch_us too.
    "d06_last2_window" -> sql(
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy(desc("ts"), desc("event_id"))
        Tables.events(s, dir)
          .withColumn("rn", row_number().over(w).cast("long"))
          .filter(col("rn") <= 2)
          .select("user_id", "event_id", "rn")
          .orderBy("user_id", "rn")
      },
      """SELECT user_id, event_id, rn FROM (
        |  SELECT user_id, event_id,
        |    row_number() OVER (PARTITION BY user_id ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
        |  FROM events) t
        |WHERE rn <= 2 ORDER BY user_id, rn""".stripMargin),

    // D2 (db/check.py:71-84): full per-key history, newest first.
    "d02_ordered_history" -> sql(
      (s, dir) =>
        Tables.events(s, dir)
          .filter(col("user_id") === 5)
          .select(col("event_id"), col("event_type"), col("value"))
          .orderBy(desc("ts"), desc("event_id")),
      """SELECT event_id, event_type, value FROM events WHERE user_id = 5
        |ORDER BY epoch_us(ts) DESC, event_id DESC""".stripMargin),

    // Beyond-reference freebie (SURVEY §2 "available free in Spark"):
    // hierarchical ROLLUP totals. NULLS FIRST pinned on both sides.
    "d16_rollup" -> sql(
      (s, dir) =>
        Tables.orders(s, dir)
          .rollup("o_orderstatus", "o_orderpriority")
          .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"))
          .orderBy(asc_nulls_first("o_orderstatus"), asc_nulls_first("o_orderpriority")),
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        |  round(sum(o_totalprice), 2) AS total
        |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin),

    // Beyond-reference freebie: explicit GROUPING SETS — the general form
    // behind rollup/cube, chosen sets only (status totals + priority totals
    // + grand total, no cross product).
    "d19_grouping_sets" -> sql(
      (s, dir) =>
        Tables.orders(s, dir)
          .groupingSets(
            Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority")), Seq.empty),
            col("o_orderstatus"), col("o_orderpriority"))
          .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"))
          .orderBy(asc_nulls_first("o_orderstatus"), asc_nulls_first("o_orderpriority")),
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        |  round(sum(o_totalprice), 2) AS total
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin),

    // Beyond-reference freebie: full CUBE over two dimensions.
    "d17_cube" -> sql(
      (s, dir) =>
        Tables.events(s, dir)
          .cube("event_type", "user_id")
          .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total"))
          .orderBy(asc_nulls_first("event_type"), asc_nulls_first("user_id")),
      """SELECT event_type, user_id, count(*) AS n, round(sum("value"), 2) AS total
        |FROM events GROUP BY CUBE (event_type, user_id)
        |ORDER BY event_type NULLS FIRST, user_id NULLS FIRST""".stripMargin),

    // D7 (crawl/helpers.py:66-139): per-key sliding/tumbling window counts
    // (domain backoff). Tumbling 1h window == epoch-aligned date_trunc.
    "d07_backoff_window" -> sql(
      (s, dir) =>
        Tables.events(s, dir)
          .groupBy(col("user_id"), window(col("ts"), "1 hour"))
          .agg(count(lit(1)).as("n"))
          .select(col("user_id"), unix_timestamp(col("window.start")).as("hour_start"), col("n"))
          .orderBy("user_id", "hour_start"),
      """SELECT user_id, CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_start, count(*) AS n
        |FROM events GROUP BY 1, 2 ORDER BY user_id, hour_start""".stripMargin),

    // D9/C7 (cli.py:297-306): purge scan = anti-join (customers w/o orders).
    // left_anti avoids materializing the join payload; AQE can broadcast the
    // built side when the key set is small.
    "d09_anti_join" -> sql(
      (s, dir) => {
        val recent = Tables.orders(s, dir)
          .filter(col("o_orderdate") >= lit("1998-01-01").cast("timestamp"))
        Tables.customer(s, dir)
          .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
          .select("c_custkey", "c_name")
          .orderBy("c_custkey")
      },
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderdate >= TIMESTAMP '1998-01-01')
        |ORDER BY c_custkey""".stripMargin),

    // D10/D11 (db/resource.py:43-53, cli.py:88-116): upsert/merge without Delta:
    // full-outer join on the key, updates win via coalesce. At 100 TB this runs
    // partitioned-by-key so only touched partitions rewrite.
    "d10_upsert_merge" -> sql(
      (s, dir) => {
        val o = Tables.orders(s, dir)
        val existing = o.filter(col("o_orderdate") < lit("1995-01-01").cast("timestamp"))
          .select(col("o_orderkey"), col("o_totalprice"))
        val updates = o.filter(col("o_orderstatus") === "O")
          .select(col("o_orderkey").as("u_orderkey"),
            (col("o_totalprice") + 1000.0).as("newprice"))
        existing.join(updates, col("o_orderkey") === col("u_orderkey"), "full_outer")
          .select(
            coalesce(col("o_orderkey"), col("u_orderkey")).as("o_orderkey"),
            coalesce(col("newprice"), col("o_totalprice")).as("totalprice"))
          .orderBy("o_orderkey")
      },
      """SELECT coalesce(e.o_orderkey, u.u_orderkey) AS o_orderkey,
        |  coalesce(u.newprice, e.o_totalprice) AS totalprice
        |FROM (SELECT o_orderkey, o_totalprice FROM orders
        |      WHERE o_orderdate < TIMESTAMP '1995-01-01') e
        |FULL OUTER JOIN (SELECT o_orderkey AS u_orderkey, o_totalprice + 1000.0 AS newprice
        |      FROM orders WHERE o_orderstatus = 'O') u
        |ON e.o_orderkey = u.u_orderkey
        |ORDER BY o_orderkey""".stripMargin),

    // D11 (cli.py:88 + db/resource.py:43-53): catalog-wide soft delete, then
    // resurrection by upsert — `load_catalog` marks every row deleted=true
    // and the following batch upsert flips the rows it still carries back to
    // live. Expressed as one pass: a row is live iff the incoming batch
    // (customers with 1998+ orders) still references it; counts per nation.
    // The MetaStore.softDeleteAll + upsert path implements the same flags on
    // storage; this query is the oracle-checkable core of that state machine.
    "d11_soft_delete" -> sql(
      (s, dir) => {
        val updates = Tables.orders(s, dir)
          .filter(col("o_orderdate") >= lit("1998-01-01").cast("timestamp"))
          .select(col("o_custkey")).distinct()
        Tables.customer(s, dir)
          .join(updates, col("c_custkey") === col("o_custkey"), "left_outer")
          .withColumn("deleted", col("o_custkey").isNull)
          .groupBy("c_nationkey")
          .agg(
            count(when(col("deleted"), 1)).as("n_deleted"),
            count(when(!col("deleted"), 1)).as("n_live"))
          .orderBy("c_nationkey")
      },
      """WITH u AS (SELECT DISTINCT o_custkey FROM orders
        |           WHERE o_orderdate >= TIMESTAMP '1998-01-01')
        |SELECT c_nationkey,
        |  count(*) FILTER (WHERE u.o_custkey IS NULL) AS n_deleted,
        |  count(*) FILTER (WHERE u.o_custkey IS NOT NULL) AS n_live
        |FROM customer c LEFT JOIN u ON c_custkey = u.o_custkey
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin),

    // D15 (utils/db.py:6-36): index introspection — tables_index stores each
    // parsed table's indexes as a JSON map {"column": "index"}
    // (GraftApi.indexesJson); the introspection op parses the map back into
    // (table, column, type) rows. The JSON build + key-enumeration round-trip
    // runs on BOTH sides (to_json/from_json here, json_keys/json_extract in
    // the oracle), so a quoting or key-order bug surfaces as a row diff.
    "d15_index_introspection" -> sql(
      (s, dir) => {
        val ti = Tables.events(s, dir)
          .groupBy("event_type").agg(count(lit(1)).as("n_rows"))
          .withColumn("indexes", to_json(map(
            lit("__id"), lit("index"),
            concat(lit("col_"), col("event_type")), lit("index"))))
        ti.select(col("event_type").as("parsing_table"), col("n_rows"),
            explode(from_json(col("indexes"),
              org.apache.spark.sql.types.MapType(
                org.apache.spark.sql.types.StringType,
                org.apache.spark.sql.types.StringType))))
          .select(col("parsing_table"), col("key").as("index_col"),
            col("value").as("index_type"), col("n_rows"))
          .orderBy("parsing_table", "index_col")
      },
      """WITH ti AS (
        |  SELECT event_type AS parsing_table, CAST(count(*) AS BIGINT) AS n_rows,
        |    '{"__id": "index", "col_' || event_type || '": "index"}' AS indexes
        |  FROM events GROUP BY 1),
        |ks AS (
        |  SELECT parsing_table, n_rows, indexes,
        |    unnest(json_keys(indexes)) AS index_col
        |  FROM ti)
        |SELECT parsing_table, index_col,
        |  json_extract_string(indexes, '$."' || index_col || '"') AS index_type, n_rows
        |FROM ks ORDER BY parsing_table, index_col""".stripMargin),

    // D12 (migrations 20230606): keep-latest-per-key dedup. The oracle keeps
    // the reference's row_number form; the Spark side runs the SKEW-SAFE
    // two-phase max_by variant (Skew.saltedKeepLatest) — same answer, but a
    // hot key (template domain, bot user) spreads over 8 salt groups in the
    // partial phase instead of landing on one window task. SkewSpec proves
    // answer-equality on a 10:1-skewed fixture and pins the salted plan.
    "d12_dedup_rownum" -> sql(
      (s, dir) =>
        graft.operators.Skew.saltedKeepLatest(
          Tables.lineitem(s, dir)
            .select("l_orderkey", "l_linenumber", "l_quantity"),
          "l_orderkey", Seq("l_linenumber", "l_quantity"), salts = 8)
          .orderBy("l_orderkey"),
      """SELECT l_orderkey, l_linenumber, l_quantity FROM (
        |  SELECT l_orderkey, l_linenumber, l_quantity,
        |    row_number() OVER (PARTITION BY l_orderkey ORDER BY l_linenumber DESC, l_quantity DESC) AS rn
        |  FROM lineitem) t
        |WHERE rn = 1 ORDER BY l_orderkey""".stripMargin),

    // D13 (test_analysis_csv_exceptions.py:52): count(*) OVER (). Kept for
    // parity; the empty-frame window is inherently single-partition, so only
    // use on small/aggregated inputs (part = dimension table).
    "d13_count_over" -> sql(
      (s, dir) =>
        Tables.part(s, dir)
          .select(col("p_partkey"), col("p_brand"),
            count(lit(1)).over(Window.partitionBy()).as("total"))
          .orderBy("p_partkey"),
      """SELECT p_partkey, p_brand, count(*) OVER () AS total
        |FROM part ORDER BY p_partkey""".stripMargin),

    // D14 (cli.py:271-283): retention split — kept vs purged counts in one pass.
    "d14_retention_counts" -> sql(
      (s, dir) => {
        val cutoff = lit("2024-07-01").cast("timestamp")
        Tables.events(s, dir).agg(
          count(when(col("ts") >= cutoff, 1)).as("kept"),
          count(when(col("ts") < cutoff, 1)).as("purged"))
      },
      """SELECT count(*) FILTER (WHERE ts >= TIMESTAMP '2024-07-01') AS kept,
        |  count(*) FILTER (WHERE ts < TIMESTAMP '2024-07-01') AS purged
        |FROM events""".stripMargin),

    // D8 (crawl/select_batch.py:54): deterministic sampling — hash-based so the
    // oracle agrees (rand() would not); md5 is identical in both engines.
    "d08_hash_sample" -> sql(
      (s, dir) =>
        Tables.orders(s, dir)
          .filter(substring(md5(col("o_orderkey").cast("string")), 1, 1) === "a")
          .select("o_orderkey", "o_orderstatus")
          .orderBy("o_orderkey"),
      """SELECT o_orderkey, o_orderstatus FROM orders
        |WHERE substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) = 'a'
        |ORDER BY o_orderkey""".stripMargin),

    // D18 — csv_sample (cli.py:189-219): latest-check join, LIKE exclusions,
    // a size cap CAST from a JSON header field, and two independently
    // sampled halves ("ours" vs remote) unioned. ORDER BY RANDOM() becomes
    // ORDER BY md5(id) so the oracle agrees — same deterministic-sampling
    // trick as d08; each half's limit runs as TakeOrdered, no full sort.
    "d18_csv_sample" -> sql(
      (s, dir) => {
        val ev = Tables.events(s, dir)
        // catalog.last_check = checks.id analog: each user's latest event
        val lastIds = ev.groupBy("user_id").agg(max("event_id").as("event_id"))
          .select("event_id")
        val checks = ev.join(broadcast(lastIds), Seq("event_id"))
          .select(col("event_id"), col("user_id"), col("event_type"),
            get_json_object(col("props"), "$.k").cast("long").as("content_length"))
          .where(col("content_length") <= 80)
        val sampleKey = md5(col("event_id").cast("string"))
        // remote half: excluded patterns + not "our" domain
        val remote = checks
          .where(col("event_type") =!= "click" && !col("event_type").like("%view%"))
          .orderBy(sampleKey, col("event_id")).limit(10)
        // "static.data.gouv.fr" half
        val static = checks.where(col("event_type") === "click")
          .orderBy(sampleKey, col("event_id")).limit(10)
        remote.unionByName(static)
          .select("event_id", "user_id", "event_type", "content_length")
          .orderBy("event_id")
      },
      """WITH last AS (SELECT max(event_id) AS event_id FROM events GROUP BY user_id),
        |checks AS (
        |  SELECT e.event_id, e.user_id, e.event_type,
        |    CAST(json_extract_string(e.props, '$.k') AS BIGINT) AS content_length
        |  FROM events e JOIN last USING (event_id)
        |  WHERE CAST(json_extract_string(e.props, '$.k') AS BIGINT) <= 80),
        |remote AS (
        |  SELECT * FROM checks
        |  WHERE event_type <> 'click' AND event_type NOT LIKE '%view%'
        |  ORDER BY md5(CAST(event_id AS VARCHAR)), event_id LIMIT 10),
        |static AS (
        |  SELECT * FROM checks WHERE event_type = 'click'
        |  ORDER BY md5(CAST(event_id AS VARCHAR)), event_id LIMIT 10)
        |SELECT event_id, user_id, event_type, content_length
        |FROM (SELECT * FROM remote UNION ALL SELECT * FROM static) u
        |ORDER BY event_id""".stripMargin),

    // B1 (analysis/csv.py:202-219): smart_cast float semantics incl. French
    // "1 020,20" style — dirty strings built deterministically from data.
    "b01_smart_cast_double" -> sql(
      (s, dir) => {
        val dirty = concat(
          col("l_partkey").cast("string"), lit(" "),
          col("l_suppkey").cast("string"), lit(","),
          col("l_linenumber").cast("string"))
        Tables.lineitem(s, dir)
          .select(col("l_orderkey"), col("l_linenumber"),
            SmartCast.toDouble(dirty).as("val"))
          .orderBy("l_orderkey", "l_linenumber")
      },
      """SELECT l_orderkey, l_linenumber,
        |  TRY_CAST(replace(replace(
        |    CAST(l_partkey AS VARCHAR) || ' ' || CAST(l_suppkey AS VARCHAR) || ',' ||
        |    CAST(l_linenumber AS VARCHAR), ' ', ''), ',', '.') AS DOUBLE) AS val
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin),

    // B2 (str2bool): truthy/falsy vocabulary, case-insensitive, else NULL.
    "b02_smart_cast_bool" -> sql(
      (s, dir) => {
        val m = col("l_linenumber") % 5
        val raw = when(m === 0, "true").when(m === 1, "NO")
          .when(m === 2, "On").when(m === 3, "0").otherwise("maybe")
        Tables.lineitem(s, dir)
          .select(col("l_orderkey"), col("l_linenumber"),
            SmartCast.toBooleanCol(raw).as("b"))
          .orderBy("l_orderkey", "l_linenumber")
      },
      """SELECT l_orderkey, l_linenumber,
        |  CASE WHEN lower(raw) IN ('true','yes','1','t','y','on') THEN TRUE
        |       WHEN lower(raw) IN ('false','no','0','f','n','off') THEN FALSE
        |       ELSE NULL END AS b
        |FROM (SELECT l_orderkey, l_linenumber,
        |        CASE l_linenumber % 5 WHEN 0 THEN 'true' WHEN 1 THEN 'NO'
        |             WHEN 2 THEN 'On' WHEN 3 THEN '0' ELSE 'maybe' END AS raw
        |      FROM lineitem) t
        |ORDER BY l_orderkey, l_linenumber""".stripMargin),

    // B3 (analysis/helpers.py:13-27): date parsing through the format table.
    "b03_smart_cast_date" -> sql(
      (s, dir) =>
        Tables.orders(s, dir)
          .select(col("o_orderkey"),
            date_format(
              SmartCast.toDateCol(date_format(col("o_orderdate"), "dd/MM/yyyy")),
              "yyyy-MM-dd").as("d"))
          .orderBy("o_orderkey"),
      """SELECT o_orderkey,
        |  strftime(strptime(strftime(o_orderdate, '%d/%m/%Y'), '%d/%m/%Y'), '%Y-%m-%d') AS d
        |FROM orders ORDER BY o_orderkey""".stripMargin),

    // B4 (analysis/helpers.py:8-10 + JSONB queries): JSON extraction over the
    // events.props payload, aggregated — get_json_object stays in codegen.
    "b04_json_extract" -> sql(
      (s, dir) =>
        Tables.events(s, dir)
          .select(col("event_type"),
            get_json_object(col("props"), "$.k").cast("long").as("k"))
          .groupBy("event_type")
          .agg(sum("k").as("sum_k"), count(lit(1)).as("n"))
          .orderBy("event_type"),
      """SELECT event_type, CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  count(*) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin),

    // Beyond-reference: gap-based sessionization (30-min idle gap) — the
    // event-analytics op the reference's ordered-history queries stop short
    // of. One keyed shuffle; lag + running-sum windows share the same sort.
    // The oracle replays the exact window arithmetic in epoch microseconds.
    "d20_sessionize" -> sql(
      (s, dir) =>
        graft.operators.Sessionize.sessionSummary(
          Tables.events(s, dir), "user_id", "ts", "event_id",
          gapMicros = 30L * 60 * 1000000)
          .orderBy("user_id", "session_idx"),
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
        |l AS (
        |  SELECT user_id, event_id, us,
        |    CASE WHEN lag(us) OVER w IS NULL OR us - lag(us) OVER w > 1800000000
        |         THEN 1 ELSE 0 END AS is_new
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
        |s AS (
        |  SELECT user_id, us,
        |    sum(is_new) OVER (PARTITION BY user_id ORDER BY us, event_id
        |      ROWS UNBOUNDED PRECEDING) AS session_idx
        |  FROM l)
        |SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
        |  count(*) AS n_events, min(us) AS start_us, max(us) AS end_us,
        |  max(us) - min(us) AS duration_us
        |FROM s GROUP BY 1, 2 ORDER BY user_id, session_idx""".stripMargin),

    // Beyond-reference: as-of join — each click picks the user's latest
    // purchase at-or-before it. Spark side is the tagged-union construction
    // (TemporalJoins.asofJoin): one exchange per side, no range condition
    // near a join operator. The oracle states the semantics directly as a
    // correlated latest-row subquery (DuckDB decorrelates it).
    "d21_asof_join" -> sql(
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val clicks = ev.where(col("event_type") === "click")
          .select("event_id", "user_id", "ts")
        val purchases = ev.where(col("event_type") === "purchase")
          .select(col("user_id"), col("ts").as("p_ts"),
            col("event_id").as("p_event_id"), round(col("value"), 2).as("p_value"))
        graft.operators.TemporalJoins.asofJoin(
          clicks, purchases, "user_id", "ts", "p_ts", "p_event_id",
          valueCols = Seq("p_event_id", "p_value"))
          .select("event_id", "user_id", "p_event_id", "p_value")
          .orderBy("event_id")
      },
      """SELECT l.event_id, l.user_id,
        |  (SELECT r.event_id FROM events r
        |   WHERE r.user_id = l.user_id AND r.event_type = 'purchase' AND r.ts <= l.ts
        |   ORDER BY r.ts DESC, r.event_id DESC LIMIT 1) AS p_event_id,
        |  (SELECT round(r."value", 2) FROM events r
        |   WHERE r.user_id = l.user_id AND r.event_type = 'purchase' AND r.ts <= l.ts
        |   ORDER BY r.ts DESC, r.event_id DESC LIMIT 1) AS p_value
        |FROM events l WHERE l.event_type = 'click'
        |ORDER BY l.event_id""".stripMargin),

    // Nearest-direction as-of join (pandas merge_asof direction='nearest'):
    // each click matched to the purchase minimizing |gap| within a 2-hour
    // tolerance, ties resolving backward. Same single-exchange union+window
    // plan as d21 — the forward candidate rides a second in-partition sort,
    // never a second shuffle. Oracle: correlated min-|gap| subquery with
    // the identical tie ORDER BY.
    "d34_asof_nearest" -> sql(
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val clicks = ev.where(col("event_type") === "click")
          .select("event_id", "user_id", "ts")
        val purchases = ev.where(col("event_type") === "purchase")
          .select(col("user_id"), col("ts").as("p_ts"),
            col("event_id").as("p_event_id"), round(col("value"), 2).as("p_value"))
        graft.operators.TemporalJoins.asofJoin(
          clicks, purchases, "user_id", "ts", "p_ts", "p_event_id",
          valueCols = Seq("p_event_id", "p_value"),
          direction = "nearest", toleranceMicros = 7200000000L)
          .select("event_id", "user_id", "p_event_id", "p_value")
          .orderBy("event_id")
      },
      """SELECT l.event_id, l.user_id,
        |  (SELECT r.event_id FROM events r
        |   WHERE r.user_id = l.user_id AND r.event_type = 'purchase'
        |     AND abs(epoch_us(r.ts) - epoch_us(l.ts)) <= 7200000000
        |   ORDER BY abs(epoch_us(r.ts) - epoch_us(l.ts)),
        |     CASE WHEN r.ts <= l.ts THEN 0 ELSE 1 END,
        |     CASE WHEN r.ts <= l.ts THEN -r.event_id ELSE r.event_id END
        |   LIMIT 1) AS p_event_id,
        |  (SELECT round(r."value", 2) FROM events r
        |   WHERE r.user_id = l.user_id AND r.event_type = 'purchase'
        |     AND abs(epoch_us(r.ts) - epoch_us(l.ts)) <= 7200000000
        |   ORDER BY abs(epoch_us(r.ts) - epoch_us(l.ts)),
        |     CASE WHEN r.ts <= l.ts THEN 0 ELSE 1 END,
        |     CASE WHEN r.ts <= l.ts THEN -r.event_id ELSE r.event_id END
        |   LIMIT 1) AS p_value
        |FROM events l WHERE l.event_type = 'click'
        |ORDER BY l.event_id""".stripMargin),

    // Beyond-reference: session aggregation via Spark's BUILT-IN
    // session_window (the declarative counterpart of d20's custom
    // gaps-and-islands sessionizer — SURVEY §2 custom-operator preference
    // (a): compose built-ins when they express the semantics). The same
    // single user-keyed exchange as d20; the session end extends 30 min
    // past the last event by definition, which the oracle replays as
    // max(ts) + interval.
    "d36_session_window" -> sql(
      (s, dir) => {
        def rnd2(c: org.apache.spark.sql.Column) =
          floor(c * lit(100.0) + lit(0.5)) / lit(100.0)
        Tables.events(s, dir)
          .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
          .agg(count(lit(1)).as("n_events"), rnd2(sum(col("value"))).as("sum_value"))
          .select(col("user_id"),
            expr("unix_micros(sw.start)").as("session_start_us"),
            expr("unix_micros(sw.end)").as("session_end_us"),
            col("n_events"), col("sum_value"))
          .orderBy("user_id", "session_start_us")
      },
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) AS us, "value",
        |    CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts)) >= 1800000000 THEN 1 ELSE 0 END AS brk
        |  FROM events),
        |g AS (
        |  SELECT user_id, us, "value",
        |    sum(brk) OVER (PARTITION BY user_id ORDER BY us
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM e)
        |SELECT user_id, min(us) AS session_start_us,
        |  max(us) + 1800000000 AS session_end_us,
        |  count(*) AS n_events,
        |  floor(sum("value") * 100 + 0.5) / 100 AS sum_value
        |FROM g GROUP BY user_id, sid
        |ORDER BY user_id, session_start_us""".stripMargin),

    // Beyond-reference: per-type inter-arrival statistics — the behavioral
    // cadence summary (how long since the user's previous action, by the
    // action that follows). One lag() per user — a single keyed exchange —
    // then a per-type aggregation. The mean stays on exact integer µs
    // (long-summed on both engines) and converts to seconds only at the
    // rounded output, so aggregation order cannot move it.
    "d35_interarrival" -> sql(
      (s, dir) => {
        val w = Window.partitionBy("user_id")
          .orderBy(unix_micros(col("ts")), col("event_id"))
        Tables.events(s, dir)
          .withColumn("__gap",
            unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w))
          .where(col("__gap").isNotNull)
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            round(avg(col("__gap")) / 1000000.0, 4).as("avg_gap_s"),
            round(expr("percentile(__gap, 0.5)") / 1000000.0, 4).as("p50_gap_s"),
            round(max(col("__gap")) / 1000000.0, 4).as("max_gap_s"))
          .orderBy("event_type")
      },
      """WITH e AS (
        |  SELECT event_type,
        |    epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts), event_id) AS gap
        |  FROM events)
        |SELECT event_type, count(*) AS n,
        |  round(avg(gap) / 1000000.0, 4) AS avg_gap_s,
        |  round(quantile_cont(gap, 0.5) / 1000000.0, 4) AS p50_gap_s,
        |  round(max(gap) / 1000000.0, 4) AS max_gap_s
        |FROM e WHERE gap IS NOT NULL
        |GROUP BY event_type ORDER BY event_type""".stripMargin),

    // Beyond-reference: point-in-interval (range) join — events classified
    // into overlapping value tiers built from the nation table. Spark side
    // bucketizes the intervals so the match is a broadcast EQUI-join with a
    // residual BETWEEN, never a BroadcastNestedLoop over the fact side; the
    // oracle is the plain BETWEEN join.
    "d22_range_join" -> sql(
      (s, dir) => {
        val intervals = Tables.nation(s, dir).select(
          col("n_name").as("tier"),
          (col("n_nationkey") * 19.0).as("lo"),
          (col("n_nationkey") * 19.0 + 25.0).as("hi"))
        val points = Tables.events(s, dir).select(col("event_id"), col("value"))
        graft.operators.TemporalJoins.pointInIntervalJoin(
          points, intervals, "value", "lo", "hi", bucketWidth = 20.0)
          .groupBy("tier")
          .agg(count(lit(1)).as("n_points"), round(sum("value"), 2).as("sum_value"))
          .orderBy("tier")
      },
      """WITH iv AS (
        |  SELECT n_name AS tier, n_nationkey * 19.0 AS lo,
        |    n_nationkey * 19.0 + 25.0 AS hi
        |  FROM nation)
        |SELECT tier, count(*) AS n_points, round(sum("value"), 2) AS sum_value
        |FROM events JOIN iv ON "value" >= lo AND "value" <= hi
        |GROUP BY tier ORDER BY tier""".stripMargin),

    // Beyond-reference: exact interpolated percentiles per group. Both
    // engines use the same linear-interpolation definition (Spark
    // `percentile`, DuckDB `quantile_cont`); rounded to 4 decimals so the
    // interpolation arithmetic's last ulp cannot flip the hash. Scale note:
    // exact percentile buffers each group's values — at 100 TB swap in
    // approx_percentile (t-digest, mergeable partials); this query pins the
    // exact semantics the approximation is judged against.
    "d23_percentiles" -> sql(
      (s, dir) =>
        Tables.events(s, dir)
          .groupBy("event_type")
          .agg(
            round(expr("percentile(value, 0.5)"), 4).as("p50"),
            round(expr("percentile(value, 0.9)"), 4).as("p90"),
            round(expr("percentile(value, 0.99)"), 4).as("p99"))
          .orderBy("event_type"),
      """SELECT event_type,
        |  round(quantile_cont("value", 0.5), 4) AS p50,
        |  round(quantile_cont("value", 0.9), 4) AS p90,
        |  round(quantile_cont("value", 0.99), 4) AS p99
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin),

    // Beyond-reference: PIVOT with an explicit value list (dynamic pivot
    // needs a driver-side distinct pass — the fixed list keeps the plan
    // fully declarative: one hash aggregation, columns not rows).
    // Spark pivot yields NULL for empty cells where DuckDB's FILTER
    // counts 0 — na.fill pins the same contract on both sides.
    "d24_pivot" -> sql(
      (s, dir) =>
        Tables.events(s, dir)
          .groupBy("user_id")
          .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
          .agg(count(lit(1)))
          .na.fill(0L)
          .orderBy("user_id"),
      """SELECT user_id,
        |  count(*) FILTER (WHERE event_type = 'click') AS click,
        |  count(*) FILTER (WHERE event_type = 'error') AS error,
        |  count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
        |  count(*) FILTER (WHERE event_type = 'signup') AS signup,
        |  count(*) FILTER (WHERE event_type = 'view') AS "view"
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin),

    // Beyond-reference: bounded-frame window — 4-event moving average per
    // user. ROWS frames (not RANGE) so both engines see identical frame
    // membership under the (ts, event_id) total order.
    "d25_moving_avg" -> sql(
      (s, dir) => {
        val w = Window.partitionBy("user_id")
          .orderBy(unix_micros(col("ts")), col("event_id"))
          .rowsBetween(-3, Window.currentRow)
        Tables.events(s, dir)
          .select(col("event_id"), col("user_id"),
            round(avg("value").over(w), 4).as("mavg"))
          .orderBy("event_id")
      },
      """SELECT event_id, user_id,
        |  round(avg("value") OVER (PARTITION BY user_id
        |    ORDER BY epoch_us(ts), event_id
        |    ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 4) AS mavg
        |FROM events ORDER BY event_id""".stripMargin),

    // Exponentially-weighted moving average per user — the recursive
    // cousin of d25's windowed mean (ewma_t = α·x_t + (1−α)·ewma_{t−1},
    // seeded with the first value). Inherently sequential PER KEY: the
    // fold runs over each user's time-sorted event list (per-key
    // cardinality bounded — the same contract as any keyed window), and
    // both engines execute the identical left fold, so the values replay
    // bit-for-bit. The output rounding is the explicit floor(x·10⁴+0.5)/10⁴
    // — the same IEEE op sequence in either engine — NOT round(x, 4):
    // 2-decimal inputs make fold values land exactly on x.xxxx5, where
    // Spark's round (on the binary double) and DuckDB's (on the shortest
    // decimal representation) disagree. Oracle = recursive CTE.
    "d29_ewma" -> sql(
      (s, dir) => {
        val evs = array_sort(collect_list(struct(
          unix_micros(col("ts")).as("tsu"), col("event_id"), col("value"))))
        val fold = aggregate(col("evs"),
          array().cast("array<double>"),
          (acc, e) => concat(acc, array(
            when(size(acc) === 0, e.getField("value"))
              .otherwise(lit(0.25) * e.getField("value") +
                lit(0.75) * element_at(acc, -1)))))
        Tables.events(s, dir)
          .groupBy("user_id")
          .agg(evs.as("evs"))
          .select(col("user_id"), posexplode(arrays_zip(col("evs"), fold.as("ew"))))
          .select(col("user_id"), (col("pos") + 1).cast("long").as("seq"),
            col("col.evs.event_id").as("event_id"),
            (floor(col("col.ew") * lit(10000.0) + lit(0.5)) / lit(10000.0)).as("ewma"))
          .orderBy("user_id", "seq")
      },
      """WITH g AS (
        |  SELECT user_id,
        |    list(struct_pack(event_id := event_id, v := "value") ORDER BY epoch_us(ts), event_id) AS evs
        |  FROM events GROUP BY user_id),
        |r AS (
        |  WITH RECURSIVE rec AS (
        |    SELECT user_id, 1 AS seq, evs[1].v AS ewma FROM g
        |    UNION ALL
        |    SELECT rec.user_id, rec.seq + 1,
        |      0.25 * g.evs[rec.seq + 1].v + 0.75 * rec.ewma
        |    FROM rec JOIN g USING (user_id) WHERE rec.seq < len(g.evs))
        |  SELECT * FROM rec)
        |SELECT g.user_id, CAST(r.seq AS BIGINT) AS seq,
        |  g.evs[r.seq].event_id AS event_id,
        |  floor(r.ewma * 10000.0 + 0.5) / 10000.0 AS ewma
        |FROM r JOIN g USING (user_id)
        |ORDER BY user_id, seq""".stripMargin),

    // Beyond-reference: strictly-ORDERED conversion funnel with a 24 h
    // per-stage deadline (view → click within 24 h → purchase within 24 h
    // of the click) — the deadline is what makes the funnel discriminate:
    // an unbounded ordered funnel saturates on any active user. Each stage
    // is the user's first qualifying event after the previous stage — three
    // chained conditional window minima that all collapse onto ONE
    // user-keyed exchange (the stage columns are partition constants).
    // Counts and conversion rates are exact integer/rational arithmetic.
    "d30_event_funnel" -> sql(
      (s, dir) => {
        val deadline = 86400000000L // 24 h in µs
        val byUser = Window.partitionBy("user_id")
        def rnd4(c: org.apache.spark.sql.Column) =
          floor(c * lit(10000.0) + lit(0.5)) / lit(10000.0)
        val staged = Tables.events(s, dir)
          .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
          .withColumn("__v",
            min(when(col("event_type") === "view", col("us"))).over(byUser))
          .withColumn("__c",
            min(when(col("event_type") === "click" && col("us") > col("__v") &&
              col("us") <= col("__v") + lit(deadline), col("us")))
              .over(byUser))
          .withColumn("__p",
            min(when(col("event_type") === "purchase" && col("us") > col("__c") &&
              col("us") <= col("__c") + lit(deadline), col("us")))
              .over(byUser))
        staged
          .select("user_id", "__v", "__c", "__p").distinct()
          .agg(
            count(lit(1)).as("n_users"),
            sum(when(col("__v").isNotNull, 1L).otherwise(0L)).as("n_view"),
            sum(when(col("__c").isNotNull, 1L).otherwise(0L)).as("n_click"),
            sum(when(col("__p").isNotNull, 1L).otherwise(0L)).as("n_purchase"))
          .select(col("n_users"), col("n_view"), col("n_click"), col("n_purchase"),
            rnd4(col("n_click") / col("n_view")).as("view_to_click"),
            rnd4(col("n_purchase") / col("n_click")).as("click_to_purchase"))
      },
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
        |v AS (
        |  SELECT user_id, min(CASE WHEN event_type = 'view' THEN us END) AS v
        |  FROM e GROUP BY user_id),
        |c AS (
        |  SELECT e.user_id, min(us) AS c
        |  FROM e JOIN v USING (user_id)
        |  WHERE event_type = 'click' AND us > v AND us <= v + 86400000000
        |  GROUP BY e.user_id),
        |p AS (
        |  SELECT e.user_id, min(us) AS p
        |  FROM e JOIN c USING (user_id)
        |  WHERE event_type = 'purchase' AND us > c AND us <= c + 86400000000
        |  GROUP BY e.user_id),
        |f AS (
        |  SELECT count(*) AS n_users,
        |    count(v.v) AS n_view,
        |    count(c.c) AS n_click,
        |    count(p.p) AS n_purchase
        |  FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id))
        |SELECT n_users, n_view, n_click, n_purchase,
        |  floor(CAST(n_click AS DOUBLE) / n_view * 10000 + 0.5) / 10000 AS view_to_click,
        |  floor(CAST(n_purchase AS DOUBLE) / n_click * 10000 + 0.5) / 10000
        |    AS click_to_purchase
        |FROM f ORDER BY n_users""".stripMargin),

    // Beyond-reference: weekly retention cohorts — users grouped by
    // first-seen epoch week, counted in each later week they return
    // (the classic retention triangle). Weeks are INTEGER epoch-µs
    // divisions, not calendar functions, so bucket boundaries cannot
    // drift between engines. Two user-keyed aggregations + one on the
    // (cohort, offset) grid.
    "d31_retention_cohorts" -> sql(
      (s, dir) => {
        val weeks = Tables.events(s, dir)
          .select(col("user_id"),
            expr("unix_micros(ts) div 604800000000").as("wk"))
          .distinct()
        val cohorts = weeks.groupBy("user_id").agg(min(col("wk")).as("cohort_week"))
        weeks.join(cohorts, Seq("user_id"))
          .groupBy(col("cohort_week"), (col("wk") - col("cohort_week")).as("week_offset"))
          .agg(count(lit(1)).as("n_users"))
          .orderBy("cohort_week", "week_offset")
      },
      """WITH w AS (
        |  SELECT DISTINCT user_id, epoch_us(ts) // 604800000000 AS wk FROM events),
        |c AS (SELECT user_id, min(wk) AS cw FROM w GROUP BY 1)
        |SELECT c.cw AS cohort_week, w.wk - c.cw AS week_offset, count(*) AS n_users
        |FROM w JOIN c USING (user_id)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),

    // Beyond-reference: trailing-7-day distinct actives (rolling DAU/WAU).
    // Windowed DISTINCT counting has no incremental window form — the
    // standard exact recipe is a bounded fan-out: each (user, day) activity
    // row covers the 7 window-days it contributes to, then one distinct
    // aggregation per window-day. Days are integer epoch divisions; the
    // fan-out factor is the window length, never data-dependent.
    "d32_rolling_actives" -> sql(
      (s, dir) => {
        val days = Tables.events(s, dir)
          .select(col("user_id"), expr("unix_micros(ts) div 86400000000").as("day"))
          .distinct()
        val bounds = days.agg(max(col("day")).as("__max"))
        val daily = days.groupBy("day").agg(count(lit(1)).as("dau"))
        val rolling = days
          .select(col("user_id"), explode(sequence(col("day"), col("day") + 6)).as("wd"))
          .crossJoin(broadcast(bounds))
          .where(col("wd") <= col("__max"))
          .select(col("user_id"), col("wd")).distinct()
          .groupBy(col("wd").as("day"))
          .agg(count(lit(1)).as("dau_7d"))
        rolling
          .join(daily, Seq("day"), "left")
          .select(col("day"), coalesce(col("dau"), lit(0L)).as("dau"), col("dau_7d"))
          .orderBy("day")
      },
      """WITH dd AS (
        |  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day FROM events),
        |mx AS (SELECT max(day) AS m FROM dd),
        |win AS (
        |  SELECT DISTINCT user_id, day + g.o AS wd
        |  FROM dd CROSS JOIN generate_series(0, 6) g(o), mx
        |  WHERE day + g.o <= m),
        |d7 AS (SELECT wd AS day, count(*) AS dau_7d FROM win GROUP BY 1),
        |d1 AS (SELECT day, count(*) AS dau FROM dd GROUP BY 1)
        |SELECT d7.day, coalesce(d1.dau, CAST(0 AS BIGINT)) AS dau, d7.dau_7d
        |FROM d7 LEFT JOIN d1 USING (day) ORDER BY d7.day""".stripMargin),

    // Beyond-reference: first-order Markov transition matrix over each
    // user's event sequence — (from_type → to_type) counts and row-
    // normalized probabilities, the behavioral-model summary behind
    // next-event prediction and anomaly scoring. One lead() window per
    // user (a single keyed exchange) + a transition-grid aggregation;
    // probabilities are exact rational arithmetic.
    "d33_event_transitions" -> sql(
      (s, dir) => {
        val w = Window.partitionBy("user_id")
          .orderBy(unix_micros(col("ts")), col("event_id"))
        def rnd4(c: org.apache.spark.sql.Column) =
          floor(c * lit(10000.0) + lit(0.5)) / lit(10000.0)
        Tables.events(s, dir)
          .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
          .withColumn("__next", lead(col("event_type"), 1).over(w))
          .where(col("__next").isNotNull)
          .groupBy(col("event_type").as("from_type"), col("__next").as("to_type"))
          .agg(count(lit(1)).as("n"))
          .withColumn("prob", rnd4(col("n") /
            sum(col("n")).over(Window.partitionBy("from_type"))))
          .orderBy("from_type", "to_type")
      },
      """WITH e AS (
        |  SELECT event_type,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts), event_id) AS next_type
        |  FROM events),
        |t AS (
        |  SELECT event_type AS from_type, next_type AS to_type, count(*) AS n
        |  FROM e WHERE next_type IS NOT NULL GROUP BY 1, 2)
        |SELECT from_type, to_type, n,
        |  floor(CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY from_type)
        |    * 10000 + 0.5) / 10000 AS prob
        |FROM t ORDER BY from_type, to_type""".stripMargin),

    // Beyond-reference (SURVEY §2-D's "free in Spark" list): INTERSECT /
    // EXCEPT set operations — customers ordering in both halves of 1997 vs
    // only the first half. Both engines give DISTINCT set semantics; each
    // compiles to one aggregation-style shuffle per set op (no sort).
    "d26_set_ops" -> sql(
      (s, dir) => {
        val o = Tables.orders(s, dir)
        def custsIn(from: String, until: String) = o
          .where(col("o_orderdate") >= lit(from).cast("timestamp") &&
            col("o_orderdate") < lit(until).cast("timestamp"))
          .select("o_custkey")
        val h1 = custsIn("1997-01-01", "1997-07-01")
        val h2 = custsIn("1997-07-01", "1998-01-01")
        h1.intersect(h2).withColumn("segment", lit("both_halves"))
          .unionByName(h1.except(h2).withColumn("segment", lit("h1_only")))
          .orderBy("segment", "o_custkey")
      },
      """WITH h1 AS (SELECT o_custkey FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1997-07-01'),
        |h2 AS (SELECT o_custkey FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1997-07-01' AND o_orderdate < TIMESTAMP '1998-01-01')
        |SELECT o_custkey, 'both_halves' AS segment FROM (SELECT * FROM h1 INTERSECT SELECT * FROM h2)
        |UNION ALL
        |SELECT o_custkey, 'h1_only' AS segment FROM (SELECT * FROM h1 EXCEPT SELECT * FROM h2)
        |ORDER BY segment, o_custkey""".stripMargin),

    // Beyond-reference: second-moment aggregates — correlation, sample
    // covariance and stddev between price and quantity per return flag.
    // Both engines use the same textbook definitions; 4-decimal rounding
    // absorbs summation-order ulps (values are O(1)-scaled ratios).
    "d27_corr_covar" -> sql(
      (s, dir) =>
        Tables.lineitem(s, dir)
          .groupBy("l_returnflag")
          .agg(
            round(corr(col("l_extendedprice"), col("l_quantity")), 4).as("price_qty_corr"),
            round(covar_samp(col("l_extendedprice"), col("l_quantity")), 2).as("price_qty_cov"),
            round(stddev_samp(col("l_quantity")), 4).as("qty_sd"),
            count(lit(1)).as("n"))
          .orderBy("l_returnflag"),
      """SELECT l_returnflag,
        |  round(corr(l_extendedprice, l_quantity), 4) AS price_qty_corr,
        |  round(covar_samp(l_extendedprice, l_quantity), 2) AS price_qty_cov,
        |  round(stddev_samp(l_quantity), 4) AS qty_sd,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),

    // A5/C6 (analysis/csv.py:153, profile stored whole in tables_index at
    // :398-408; asserted at tests/test_analysis/test_analysis_csv.py:84-86):
    // the per-column profile — min/max/avg/std, missing count, distinct
    // count, top values — is the reference's aggregation workhorse, run on
    // every ingested file. This entry drives the ONE-SCAN profiler
    // (OnePassProfiler, the custom Aggregator) over a documents projection
    // and oracle-checks every stat: the tracking capacity exceeds the
    // columns' cardinalities, so distinct counts and top-k are EXACT (the
    // profiler's no-eviction guarantee), with (count DESC, value ASC)
    // tie-breaks replayed verbatim in SQL. nullif() synthesizes missing
    // values so nb_missing is exercised. The profile result is
    // metadata-sized by construction (one row per column), so the
    // driver-side createDataFrame is the intended shape, not a collect
    // smell. avg/std round to 6 decimals to absorb summation-order ulps.
    "d28_column_profile" -> sql(
      (s, dir) => {
        import s.implicits._
        val src = Tables.documents(s, dir).select(
          expr("nullif(lang, 'de')").as("lang_gap"),
          col("source"),
          col("n_chars"))
        val prof = graft.detect.OnePassProfiler.profile(
          src, topK = 5, trackCapacity = 1 << 16)
        def r6(x: Double) = math.round(x * 1e6) / 1e6
        prof.toSeq.sortBy(_._1).map { case (name, p) =>
          (name, p.nbMissingValues, p.nbDistinct,
            p.min, p.max, p.mean.map(r6), p.std.map(r6),
            p.tops.map { case (v, n) => s"$v:$n" }.mkString("|"))
        }.toDF("col_name", "n_missing", "n_distinct",
          "min_v", "max_v", "avg_v", "std_v", "top_values")
      },
      """WITH src AS (
        |  SELECT nullif(lang, 'de') AS lang_gap, source, n_chars FROM documents),
        |stats AS (
        |  SELECT 'lang_gap' AS col_name,
        |    count(*) FILTER (WHERE lang_gap IS NULL) AS n_missing,
        |    count(DISTINCT lang_gap) AS n_distinct,
        |    NULL::DOUBLE AS min_v, NULL::DOUBLE AS max_v,
        |    NULL::DOUBLE AS avg_v, NULL::DOUBLE AS std_v
        |  FROM src
        |  UNION ALL
        |  SELECT 'source', count(*) FILTER (WHERE source IS NULL),
        |    count(DISTINCT source), NULL, NULL, NULL, NULL FROM src
        |  UNION ALL
        |  SELECT 'n_chars', count(*) FILTER (WHERE n_chars IS NULL),
        |    count(DISTINCT n_chars), min(n_chars)::DOUBLE, max(n_chars)::DOUBLE,
        |    round(avg(n_chars), 6), round(stddev_samp(n_chars), 6) FROM src),
        |vals AS (
        |  SELECT 'lang_gap' AS col_name, lang_gap AS v, count(*) AS c
        |  FROM src WHERE lang_gap IS NOT NULL GROUP BY 2
        |  UNION ALL
        |  SELECT 'source', source, count(*) FROM src
        |  WHERE source IS NOT NULL GROUP BY 2
        |  UNION ALL
        |  SELECT 'n_chars', n_chars::VARCHAR, count(*) FROM src
        |  WHERE n_chars IS NOT NULL GROUP BY 2),
        |ranked AS (
        |  SELECT col_name, v, c,
        |    row_number() OVER (PARTITION BY col_name ORDER BY c DESC, v) AS rk
        |  FROM vals),
        |tops AS (
        |  SELECT col_name, string_agg(v || ':' || c, '|' ORDER BY c DESC, v) AS top_values
        |  FROM ranked WHERE rk <= 5 GROUP BY col_name)
        |SELECT s.col_name AS col_name, n_missing, n_distinct, min_v, max_v,
        |  avg_v, std_v, top_values
        |FROM stats s JOIN tops t ON s.col_name = t.col_name
        |ORDER BY s.col_name""".stripMargin),

    // Beyond-reference: gaps-and-islands consecutive-day streaks — the
    // classic activity-streak query (date minus dense row_number is
    // constant within a run of consecutive days). The raw event stream
    // collapses to user×day rows in the FIRST aggregation (map-side
    // combining), so every later exchange moves 12-byte rows; the window
    // and both follow-up aggregations are keyed on user_id prefixes.
    "d37_streaks" -> sql(
      (s, dir) => {
        val days = Tables.events(s, dir)
          .groupBy(col("user_id"), to_date(col("ts")).as("d"))
          .agg(count(lit(1)).as("__n"))
          .select("user_id", "d")
        val w = Window.partitionBy("user_id").orderBy("d")
        val runs = days
          .withColumn("__g", date_sub(col("d"), row_number().over(w)))
          .groupBy("user_id", "__g")
          .agg(count(lit(1)).as("len"))
        runs.groupBy("user_id")
          .agg(max(col("len")).as("longest_streak"),
            count(lit(1)).as("n_streaks"),
            sum(col("len")).as("n_active_days"))
          .orderBy("user_id")
      },
      """WITH days AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
        |g AS (
        |  SELECT user_id, d,
        |    d - CAST(row_number() OVER (PARTITION BY user_id ORDER BY d) AS INT) AS grp
        |  FROM days),
        |s AS (SELECT user_id, grp, count(*) AS len FROM g GROUP BY 1, 2)
        |SELECT user_id, max(len) AS longest_streak,
        |  count(*) AS n_streaks,
        |  CAST(sum(len) AS BIGINT) AS n_active_days
        |FROM s GROUP BY user_id ORDER BY user_id""".stripMargin),

    // Beyond-reference: robust outlier detection via median absolute
    // deviation (Hampel's 3-MAD rule). Three passes over events, each a
    // map-side-combining agg keyed on event_type, with the tiny per-type
    // stats broadcast back — never a shuffle of the fact side. Exact
    // `percentile` keeps the oracle bit-exact (both engines interpolate
    // lower + (upper-lower)·frac on binary64); the 100 TB path swaps in
    // approx_percentile, traded deliberately for oracle precision here.
    "d38_mad_outliers" -> sql(
      (s, dir) => {
        val ev = Tables.events(s, dir).select("event_type", "value")
        val med = ev.groupBy("event_type")
          .agg(expr("percentile(value, 0.5)").as("__med"))
        val withMed = ev.join(broadcast(med), Seq("event_type"))
        val mad = withMed.groupBy("event_type")
          .agg(expr("percentile(abs(value - __med), 0.5)").as("__mad"),
            first(col("__med")).as("__med2"))
        def rnd4(c: org.apache.spark.sql.Column) =
          floor(c * lit(10000.0) + lit(0.5)) / lit(10000.0)
        ev.join(broadcast(mad), Seq("event_type"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            rnd4(first(col("__med2"))).as("med"),
            rnd4(first(col("__mad"))).as("mad"),
            count(when(abs(col("value") - col("__med2")) > col("__mad") * 3.0, 1))
              .as("n_outliers"))
          .orderBy("event_type")
      },
      """WITH med AS (
        |  SELECT event_type, quantile_cont("value", 0.5) AS m FROM events GROUP BY 1),
        |mad AS (
        |  SELECT e.event_type, quantile_cont(abs(e."value" - m), 0.5) AS md, any_value(m) AS m2
        |  FROM events e JOIN med USING (event_type) GROUP BY 1)
        |SELECT e.event_type, count(*) AS n,
        |  floor(any_value(m2) * 10000 + 0.5) / 10000 AS med,
        |  floor(any_value(md) * 10000 + 0.5) / 10000 AS mad,
        |  count(*) FILTER (WHERE abs(e."value" - m2) > md * 3.0) AS n_outliers
        |FROM events e JOIN mad USING (event_type)
        |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin),

    // Beyond-reference: week-over-week trend report — the classic
    // period-comparison pattern (one keyed exchange for the weekly
    // rollup, then a lag window over the tiny type×week frame). The pct
    // change divides exact long sums only at the rounded output, and
    // weeks are integer epoch divisions of epoch-µs, so bucket boundaries
    // cannot disagree between engines.
    "d39_wow_change" -> sql(
      (s, dir) => {
        def rnd4(c: org.apache.spark.sql.Column) =
          floor(c * lit(10000.0) + lit(0.5)) / lit(10000.0)
        val weekly = Tables.events(s, dir)
          .groupBy(col("event_type"),
            floor(unix_micros(col("ts")) / lit(604800000000L)).cast("long").as("week"))
          .agg(count(lit(1)).as("n_events"),
            rnd4(sum(col("value"))).as("sum_value"))
        val w = Window.partitionBy("event_type").orderBy("week")
        weekly
          .withColumn("__pn", lag(col("n_events"), 1).over(w))
          .select(col("event_type"), col("week"), col("n_events"), col("sum_value"),
            when(col("__pn").isNotNull && col("__pn") =!= 0,
              rnd4((col("n_events") - col("__pn")).cast("double") / col("__pn")))
              .as("wow_events_pct"))
          .orderBy("event_type", "week")
      },
      """WITH weekly AS (
        |  SELECT event_type,
        |    CAST(floor(epoch_us(ts) / 604800000000) AS BIGINT) AS week,
        |    count(*) AS n_events,
        |    floor(sum("value") * 10000 + 0.5) / 10000 AS sum_value
        |  FROM events GROUP BY 1, 2),
        |lagged AS (
        |  SELECT event_type, week, n_events, sum_value,
        |    lag(n_events) OVER (PARTITION BY event_type ORDER BY week) AS pn
        |  FROM weekly)
        |SELECT event_type, week, n_events, sum_value,
        |  CASE WHEN pn IS NOT NULL AND pn <> 0
        |    THEN floor((n_events - pn)::DOUBLE / pn * 10000 + 0.5) / 10000 END
        |    AS wow_events_pct
        |FROM lagged ORDER BY event_type, week""".stripMargin),

    // d38's bounded-state twin: the same median/MAD/Hampel report on the
    // graft_hist fixed-grid sketch (nBins+2 longs per group) instead of
    // exact percentile's per-group value buffer — the form that streams
    // (StreamingMad) and that a 100 TB job would run. Grid [0, 512) in
    // 256 cells → w = 2.0 exactly representable, so every cell
    // representative, deviation and walk replays bit-for-bit in DuckDB;
    // the oracle rebuilds the histogram by integer arithmetic and walks
    // the same two weighted medians with window cumsums.
    "d40_mad_sketch" -> sql(
      (s, dir) =>
        Sketches.gridMadReport(
          Tables.events(s, dir).select("event_type", "value"),
          "value", "event_type", lo = 0.0, hi = 512.0, nBins = 256)
          .orderBy("event_type"),
      """WITH cells AS (
        |  SELECT event_type,
        |    CASE WHEN "value" < 0.0 THEN 0
        |         WHEN "value" >= 512.0 THEN 257
        |         ELSE LEAST(1 + CAST(floor(("value" - 0.0) / 2.0) AS INT), 256)
        |    END AS idx,
        |    count(*) AS cnt
        |  FROM events GROUP BY 1, 2),
        |reps AS (
        |  SELECT event_type, idx, cnt,
        |    CASE WHEN idx = 0 THEN 0.0 WHEN idx = 257 THEN 512.0
        |         ELSE 0.0 + (CAST(idx AS DOUBLE) - 0.5) * 2.0 END AS rep
        |  FROM cells),
        |n AS (SELECT event_type, sum(cnt) AS n, (sum(cnt) + 1) // 2 AS rnk
        |  FROM reps GROUP BY 1),
        |med AS (
        |  SELECT event_type, min(rep) AS med FROM (
        |    SELECT r.event_type, r.rep, n.rnk,
        |      sum(r.cnt) OVER (PARTITION BY r.event_type ORDER BY r.idx) AS cum
        |    FROM reps r JOIN n USING (event_type))
        |  WHERE cum >= rnk GROUP BY 1),
        |dev AS (
        |  SELECT r.event_type, abs(r.rep - m.med) AS dev, r.cnt, n.rnk
        |  FROM reps r JOIN med m USING (event_type) JOIN n USING (event_type)),
        |mad AS (
        |  SELECT event_type, min(dev) AS mad FROM (
        |    SELECT event_type, dev, rnk,
        |      sum(cnt) OVER (PARTITION BY event_type ORDER BY dev) AS cum
        |    FROM dev)
        |  WHERE cum >= rnk GROUP BY 1),
        |outl AS (
        |  SELECT d.event_type,
        |    sum(CASE WHEN d.dev > 3.0 * mad.mad THEN d.cnt ELSE 0 END) AS n_out
        |  FROM dev d JOIN mad USING (event_type) GROUP BY 1)
        |SELECT n.event_type, CAST(n.n AS BIGINT) AS n,
        |  floor(med.med * 10000 + 0.5) / 10000 AS med_est,
        |  floor(mad.mad * 10000 + 0.5) / 10000 AS mad_est,
        |  CAST(outl.n_out AS BIGINT) AS n_outliers_est
        |FROM n JOIN med USING (event_type) JOIN mad USING (event_type)
        |  JOIN outl USING (event_type)
        |ORDER BY n.event_type""".stripMargin)
  )
}
