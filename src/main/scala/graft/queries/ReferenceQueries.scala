package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables
import graft.ops.{DedupLatest, FactRebuild, Merge, TableOps}

/** Driver-checkable queries covering the reference's relational surface
  * (SURVEY.md §2). Each entry has a DuckDB oracle with identical column
  * names and deterministic ordering.
  *
  * Coverage: q1_agg A1/A2/A3+P1+O1 · s5_insert_append S5 · s6_fact_rebuild
  * S6+J1+A1-A3+O1 · s7_truncate S7 · p2_select_star P2 · p4_null_residual
  * P4+J2 · p5_filter_in P5 · p6_in_subquery P6+J5 · p7_update_rewrite P7 ·
  * j3_merge_upsert J3+A-MERGE · j4_merge_composite J4+A-MERGE ·
  * j11_merge_delete A-MERGE DELETE branch · s9_delete DELETE FROM ·
  * w1_dedup_latest W1+P3+O3 · f3_cast_coercion F3 · o2_sort_desc O2.
  * (S1-S4, F1/F2/F4-F7, ST1-ST6 are non-SQL surfaces — exercised by the
  * ScalaTest suites and the orchestrator e2e test.)
  *
  * Determinism notes (these queries are hash-compared against DuckDB):
  *  - money aggregates cast RAW columns to decimal BEFORE any arithmetic
  *    (exact, order-independent; a double *product* cast to decimal rounds
  *    differently in Spark vs DuckDB), then cast to double for output;
  *  - events.ts has nanosecond precision which Spark truncates to micros
  *    on read — timestamps are compared as epoch-micros bigints
  *    (unix_micros ⟷ DuckDB epoch_us);
  *  - every result ends in a total ORDER BY over a unique key prefix.
  */
object ReferenceQueries {

  private def moneySum(c: Column): Column =
    sum(c.cast(DecimalType(20, 2))).cast("double")
  private def dec(c: Column): Column = c.cast(DecimalType(20, 2))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // A1/A2/A3 + P1 + O1: hash GROUP BY with count(1) + decimal sums,
    // ordered insert-select (order-end-to-end-pipeline-script.sql:191-212).
    "q1_agg" -> { (s, dir) =>
      // loadSpread: the single-row-group fact file otherwise caps the
      // scan+decimal-partial-agg map stage at one task (measured 1.23×,
      // OPTIMIZATION_r20.md "scan parallelism floor")
      val li = Tables.loadSpread(s, dir, "lineitem")
      li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          count(lit(1)).as("order_count"),
          moneySum(col("l_quantity")).as("sum_qty"),
          moneySum(col("l_extendedprice")).as("sum_price"),
          sum(dec(col("l_extendedprice")) * (dec(lit(1)) - dec(col("l_discount"))))
            .cast("double").as("sum_disc_price"),
          moneySum(col("l_discount")).as("sum_discount"),
          moneySum(col("l_tax")).as("sum_tax"),
          (moneySum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
          sum(dec(col("l_extendedprice")) * dec(col("l_discount")))
            .cast("double").as("sum_revenue_lost"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    // S6 + J1 + A1-A3 + O1: the reference's star-schema fact rebuild
    // (order-...sql:179-212) — fact side joined to broadcast dims, GROUP BY
    // 3 keys, count + money sums, ordered overwrite.
    "s6_fact_rebuild" -> { (s, dir) =>
      // loadSpread on the FACT side only (dims broadcast): parallelizes
      // the scan→3×broadcast-probe→decimal-partial-agg map stage
      // (measured 1.44×); see Tables.loadSpread
      val li = Tables.loadSpread(s, dir, "lineitem")
      val o = Tables.load(s, dir, "orders")
      val c = Tables.load(s, dir, "customer")
      val p = Tables.load(s, dir, "part")
      val fact = li.join(o, col("l_orderkey") === col("o_orderkey"))
      // group on the native date (compact, comparable key) and format to
      // string AFTER aggregation — one format per group, not per input
      // row; 'yyyy-MM-dd' lexical order == chronological so the ORDER BY
      // is unchanged
      FactRebuild.rebuild(
        fact,
        dims = Seq(
          (c, col("o_custkey") === col("c_custkey"), true),
          (p, col("l_partkey") === col("p_partkey"), true)),
        groupCols = Seq(col("o_orderdate"), col("c_mktsegment"), col("p_brand")),
        aggs = Seq(
          count(lit(1)).as("order_count"),
          moneySum(col("l_quantity")).as("sum_qty"),
          moneySum(col("l_extendedprice")).as("sum_price"),
          sum(dec(col("l_extendedprice")) * (dec(lit(1)) - dec(col("l_discount"))))
            .cast("double").as("sum_disc_price"),
          sum(dec(col("l_extendedprice")) * (dec(lit(1)) - dec(col("l_discount")))
              * (dec(lit(1)) + dec(col("l_tax"))))
            .cast("double").as("sum_charge")),
        orderCols = Seq(col("o_orderdate"), col("c_mktsegment"), col("p_brand")))
        .select(date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
          col("c_mktsegment"), col("p_brand"), col("order_count"), col("sum_qty"),
          col("sum_price"), col("sum_disc_price"), col("sum_charge"))
    },

    // P2: SELECT * passthrough (customer-...sql:212-216).
    "p2_select_star" -> { (s, dir) =>
      Tables.load(s, dir, "region").orderBy("r_regionkey")
    },

    // P4 + J2: inner join with an IS NULL residual on a (derived) nullable
    // dim column (order-...sql:205-207 `di.end_date is null`).
    "p4_null_residual" -> { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
      val p = Tables.load(s, dir, "part")
        .withColumn("discontinued", when(col("p_size") > 45, lit("y")))
      li.join(broadcast(p),
          col("l_partkey") === col("p_partkey") && col("discontinued").isNull)
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n_lines"), moneySum(col("l_quantity")).as("sum_qty"))
        .orderBy("p_brand")
    },

    // P5: IN (list) filter (customer-...sql:199).
    "p5_filter_in" -> { (s, dir) =>
      Tables.load(s, dir, "orders")
        .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .select("o_orderkey", "o_custkey", "o_orderpriority")
        .orderBy("o_orderkey")
    },

    // P6 + J5: IN (subquery) → left-semi join (order-...sql:365-371).
    "p6_in_subquery" -> { (s, dir) =>
      val c = Tables.load(s, dir, "customer")
      val o = Tables.load(s, dir, "orders").filter(col("o_totalprice") > 300000.0)
      c.join(o.select("o_custkey"), col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    },

    // P7: point UPDATE with WHERE as a conditional projection
    // (order-...sql:377-387).
    "p7_update_rewrite" -> { (s, dir) =>
      TableOps.update(
        Tables.load(s, dir, "orders"),
        col("o_orderstatus") === "F",
        Map("o_orderpriority" -> lit("0-REVIEWED")))
        .select("o_orderkey", "o_orderstatus", "o_orderpriority")
        .orderBy("o_orderkey")
    },

    // J3 + A-MERGE: single-key MERGE upsert (customer-...sql:77-114) —
    // matched rows take source values, source-only rows are inserted,
    // target-only rows pass through.
    "j3_merge_upsert" -> { (s, dir) =>
      val p = Tables.load(s, dir, "part")
      val target = p.filter(col("p_partkey") % 2 === 0)
        .select(col("p_partkey").as("item_id"), col("p_name").as("item_desc"),
          col("p_retailprice").as("price"))
      val source = p.filter(col("p_partkey") % 3 === 0)
        .select(col("p_partkey").as("item_id"), upper(col("p_name")).as("item_desc"),
          (col("p_retailprice") * 2).as("price"))
      Merge.upsert(target, source, Seq("item_id")).orderBy("item_id")
    },

    // J4 + A-MERGE: composite 4-column-key MERGE (order-...sql:112-116).
    "j4_merge_composite" -> { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
          "l_quantity", "l_extendedprice")
      val keys = Seq("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
      val target = li.filter(col("l_orderkey") % 2 === 0)
      val source = li.filter(col("l_orderkey") % 3 === 0)
        .withColumn("l_quantity", col("l_quantity") + 100)
      Merge.upsert(target, source, keys).orderBy(keys.map(col): _*)
    },

    // W1 + P3 + O3: row_number latest-wins dedup (item-...sql:72-75).
    "w1_dedup_latest" -> { (s, dir) =>
      val ev = Tables.events(s, dir)
        .withColumn("ts_us", unix_micros(col("ts")))
      DedupLatest.latestBy(ev, "user_id", "ts_us", "event_id")
        .select("user_id", "event_id", "event_type", "value", "ts_us")
        .orderBy("user_id")
    },

    // F3: varchar→typed implicit-coercion casts (customer-...sql:142-165).
    "f3_cast_coercion" -> { (s, dir) =>
      Tables.loadSpread(s, dir, "lineitem") // per-row cast chain ≫ scan; see loadSpread
        .select(
          col("l_orderkey"), col("l_linenumber"),
          col("l_quantity").cast("string").cast(DecimalType(12, 2)).cast("double")
            .as("qty_roundtrip"),
          col("l_orderkey").cast("string").as("orderkey_str"),
          date_format(col("l_shipdate").cast("date"), "yyyy-MM-dd").as("ship_date_str"))
        .orderBy("l_orderkey", "l_linenumber")
    },

    // O2: ORDER BY ... DESC monitoring query (customer-...sql:201).
    "o2_sort_desc" -> { (s, dir) =>
      Tables.events(s, dir)
        .select(col("event_id"), col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("ts_us"))
        .orderBy(col("ts_us").desc, col("event_id").desc)
    },

    // S5: INSERT INTO ... SELECT append (order-...sql:306-339).
    "s5_insert_append" -> { (s, dir) =>
      val n = Tables.load(s, dir, "nation")
      val extra = n.select((col("n_nationkey") + 100).as("n_nationkey"),
        concat(col("n_name"), lit("_NEW")).as("n_name"), col("n_regionkey"))
      TableOps.append(n, extra).orderBy("n_nationkey")
    },

    // S7: TRUNCATE — empty contents, schema preserved (customer-...sql:172).
    "s7_truncate" -> { (s, dir) =>
      TableOps.truncate(Tables.load(s, dir, "nation"))
    },

    // S9: DELETE FROM ... WHERE — row removal with SQL null semantics
    // (Snowflake DELETE, named by the reference acceptance note
    // item-...sql:220; store-level path is bucket-pruned, TableStore.delete).
    "s9_delete" -> { (s, dir) =>
      val o = Tables.load(s, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      TableOps.delete(o, col("o_orderstatus") === "O" && col("o_totalprice") > 150000.0)
        .orderBy("o_orderkey")
    },

    // S10: search-optimized point lookup — the docs table written ONCE
    // through the durable store with `lookup = doc_id` (per-file blooms
    // in the stats sidecar), then probed by equality/IN through the
    // transparent SidecarPrune tier. Interval stats can't prune a
    // hash-bucketed id (every file spans ~the full range); the per-file
    // bloom cuts the probe to the holding files — Snowflake's search
    // optimization service, as a sidecar tier (reference monitoring
    // lookups, e.g. order-end-to-end-pipeline-script.sql:257-261 read
    // single keys back). Correctness gate: the probed rows must equal
    // DuckDB's on the raw parquet.
    "s11_point_lookup" -> { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("source"), col("lang"),
          length(col("text")).cast("long").as("text_len"))
      val key = s"$dir|${graft.store.Artifacts.dataFingerprint(s,
        s"$dir/documents.parquet")}|so1"
      val t = graft.store.Artifacts.table(s, "docs_so", key,
        keys = Seq("doc_id"), lookup = Seq("doc_id"))(docs)
      val bounds = t.agg(min("doc_id"), max("doc_id")).head()
      val (mn, mx) = (bounds.getLong(0), bounds.getLong(1))
      t.filter(col("doc_id").isin(mn, (mn + mx) / 2, mx))
        .orderBy("doc_id")
    },

    // J13: dynamic join-key file pruning, SPAN-fallback path — the fact
    // (orders through the durable store) joins a build side whose
    // distinct-key count EXCEEDS the 10k IN-list budget at sf0.01
    // (14,743 lineitem orderkeys), so [[graft.store.JoinKeyPrune]]
    // degrades to its [min, max] span probe at plan time. No literal
    // predicate ever touches the fact; the correctness gate pins the
    // span-probed plan's rows to DuckDB on the raw parquet. (At
    // sf0.001 the same query exercises the exact IN-list probe —
    // ~1.5k keys — so both probe kinds ride the oracle ladder.)
    // The plan builds on its OWN session (newSession: same context,
    // artifact root, and builder confs; private SQLConf) with the
    // probe's 32 MiB benefit gate opened, so the span path stays
    // oracle-checked at test sf without leaking the gate override
    // into the caller's session.
    "j13_join_span" -> { (s0, dir) =>
      val s = s0.newSession()
      // newSession() copies builder confs but NOT runtime-set ones: a
      // caller that pointed the artifact root at a durable location via
      // the documented `spark.graft.artifactDir` conf must not have this
      // query silently fall back to the JVM temp root.
      s0.conf.getOption("spark.graft.artifactDir")
        .foreach(s.conf.set("spark.graft.artifactDir", _))
      s.conf.set(graft.store.JoinKeyPrune.MinFactBytesConf, "0")
      val orders = Tables.load(s, dir, "orders")
        .select("o_orderkey", "o_orderdate", "o_totalprice")
      val key = s"$dir|${graft.store.Artifacts.dataFingerprint(s,
        s"$dir/orders.parquet")}|js1"
      val fact = graft.store.Artifacts.table(s, "orders_js", key,
        keys = Seq("o_orderkey"))(orders)
      val dim = Tables.load(s, dir, "lineitem").select(col("l_orderkey")).distinct()
      fact.join(dim, col("o_orderkey") === col("l_orderkey"))
        .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("order_month"))
        .agg(count(lit(1)).as("orders_cnt"),
          moneySum(col("o_totalprice")).as("total_price"))
        .orderBy("order_month")
    },

    // J11 + A-MERGE: MERGE with a WHEN MATCHED AND cond THEN DELETE branch
    // (Snowflake semantics; matched rows above the price cut are dropped,
    // the rest update, source-only rows insert).
    "j11_merge_delete" -> { (s, dir) =>
      val p = Tables.load(s, dir, "part")
      val target = p.filter(col("p_partkey") % 2 === 0)
        .select(col("p_partkey").as("item_id"), col("p_name").as("item_desc"),
          col("p_retailprice").as("price"))
      val source = p.filter(col("p_partkey") % 3 === 0)
        .select(col("p_partkey").as("item_id"), upper(col("p_name")).as("item_desc"),
          (col("p_retailprice") * 2).as("price"))
      Merge.upsert(target, source, Seq("item_id"),
          whenMatchedDelete = Some(Merge.src("price") > 1900.0))
        .orderBy("item_id")
    },

    // TPC-H Q3 shape (shipping priority): revenue of orders placed
    // before the cutoff whose lines ship after it, for one market
    // segment — the classic filter-pushdown + semi-join + top-k
    // pattern. The customer side is a pure FILTER (no output column),
    // so it cuts in as a broadcast LEFT-SEMI on o_custkey; both date
    // filters push to the scans; the top-10 is a bounded TakeOrdered,
    // never a global sort. Ties in the double revenue break on
    // l_orderkey (same decimal-sum-then-cast on both engines, so the
    // ordering agrees bit-for-bit).
    "h3_shipping_priority" -> { (s, dir) =>
      val cutoff = lit("1998-06-01").cast("timestamp")
      val c = Tables.load(s, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
      val o = Tables.load(s, dir, "orders")
        .filter(col("o_orderdate") < cutoff)
        .join(broadcast(c), col("o_custkey") === col("c_custkey"), "left_semi")
      val li = Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") > cutoff)
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(sum(dec(col("l_extendedprice")) * (dec(lit(1)) - dec(col("l_discount"))))
          .cast("double").as("revenue"))
        .select(col("l_orderkey"),
          col("revenue"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
          col("o_orderpriority"))
        .orderBy(desc("revenue"), asc("l_orderkey"))
        .limit(10)
    },

    // TPC-H Q5 shape (local-supplier volume): revenue per nation for
    // orders whose customer AND line supplier sit in the same nation of
    // one region, within a date year — the classic 6-table join. Plan
    // discipline: region→nation→supplier are broadcast dims, customer
    // joins the order side on custkey, the lineitem⋈supplier nation
    // must MATCH the customer nation (the co-location constraint), and
    // the final agg is 5-ish rows.
    "h5_region_volume" -> { (s, dir) =>
      val lo = lit("1997-01-01").cast("timestamp")
      val hi = lit("1998-01-01").cast("timestamp")
      val r = Tables.load(s, dir, "region").filter(col("r_name") === "ASIA")
      val n = Tables.load(s, dir, "nation")
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .select("n_nationkey", "n_name")
      val sup = Tables.load(s, dir, "supplier")
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("s_nationkey"), col("n_name"))
      val c = Tables.load(s, dir, "customer").select("c_custkey", "c_nationkey")
      val o = Tables.load(s, dir, "orders")
        .filter(col("o_orderdate") >= lo && col("o_orderdate") < hi)
        .select("o_orderkey", "o_custkey")
      val li = Tables.load(s, dir, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
      li.join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey")
          && col("c_nationkey") === col("s_nationkey"))
        .groupBy(col("n_name"))
        .agg(sum(dec(col("l_extendedprice")) * (dec(lit(1)) - dec(col("l_discount"))))
          .cast("double").as("revenue"))
        .orderBy(desc("revenue"), asc("n_name"))
    },

    // TPC-H Q17 shape (small-quantity revenue): lines whose quantity is
    // under 20% of their part's average — the classic CORRELATED
    // subquery, decorrelated the scale-right way: restrict lineitem to
    // the brand's parts FIRST (broadcast semi join), aggregate the
    // per-part average over that restricted set once, and join it back
    // on the part key — the subquery never re-executes per row and the
    // avg never computes for parts the filter will drop.
    "h17_small_qty_revenue" -> { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
      val p = Tables.load(s, dir, "part")
        .filter(col("p_brand") === "Brand#4").select("p_partkey")
      val liP = li.join(broadcast(p), col("l_partkey") === col("p_partkey"),
        "left_semi")
      val avgQ = liP.groupBy(col("l_partkey").as("ap"))
        .agg((sum(dec(col("l_quantity"))).cast("double") / count(lit(1)))
          .as("avg_qty"))
      liP.join(avgQ, col("l_partkey") === col("ap"))
        .filter(col("l_quantity").cast("double") < lit(0.2) * col("avg_qty"))
        .agg((sum(dec(col("l_extendedprice"))).cast("double") / 7.0)
          .as("avg_yearly"))
    },

    // TPC-H Q18 shape (large-volume orders): orders whose total line
    // quantity clears a threshold, with their customer — aggregate-as-
    // filter (HAVING) first, so only the ~10% qualifying order keys
    // ever join the orders/customer sides; bounded top-20 output.
    "h18_large_orders" -> { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
      val big = li.groupBy("l_orderkey")
        .agg(moneySum(col("l_quantity")).as("sum_qty"))
        .filter(col("sum_qty") > 150.0)
      val o = Tables.load(s, dir, "orders")
      val c = Tables.load(s, dir, "customer")
      o.join(big, col("o_orderkey") === col("l_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
          col("o_totalprice"), col("sum_qty"))
        .orderBy(desc("o_totalprice"), asc("o_orderkey"))
        .limit(20)
    }
  )

  val oracles: Map[String, String] = Map(
    "h17_small_qty_revenue" ->
      """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(20,2))) AS DOUBLE) / 7.0 AS avg_yearly
        |FROM lineitem
        |JOIN (SELECT l_partkey AS ap,
        |        CAST(sum(CAST(l_quantity AS DECIMAL(20,2))) AS DOUBLE) / count(1) AS avg_qty
        |      FROM lineitem
        |      WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_brand = 'Brand#4')
        |      GROUP BY 1) a ON l_partkey = a.ap
        |WHERE CAST(l_quantity AS DOUBLE) < 0.2 * avg_qty""".stripMargin,

    "h18_large_orders" ->
      """WITH big AS (SELECT l_orderkey,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(20,2))) AS DOUBLE) AS sum_qty
        |  FROM lineitem GROUP BY 1 HAVING sum_qty > 150.0)
        |SELECT c_name, c_custkey, o_orderkey,
        |  strftime(o_orderdate, '%Y-%m-%d') AS order_date, o_totalprice, sum_qty
        |FROM orders
        |JOIN big ON o_orderkey = big.l_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin,

    "h3_shipping_priority" ->
      """SELECT l_orderkey,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(20,2)) * (CAST(1 AS DECIMAL(20,2)) - CAST(l_discount AS DECIMAL(20,2)))) AS DOUBLE) AS revenue,
        |  strftime(o_orderdate, '%Y-%m-%d') AS order_date,
        |  o_orderpriority
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
        |  AND o_orderdate < TIMESTAMP '1998-06-01'
        |  AND l_shipdate > TIMESTAMP '1998-06-01'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,

    "h5_region_volume" ->
      """SELECT n_name,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(20,2)) * (CAST(1 AS DECIMAL(20,2)) - CAST(l_discount AS DECIMAL(20,2)))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1997-01-01'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin,

    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  count(1) AS order_count,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(20,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(20,2))) AS DOUBLE) AS sum_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(20,2)) * (CAST(1 AS DECIMAL(20,2)) - CAST(l_discount AS DECIMAL(20,2)))) AS DOUBLE) AS sum_disc_price,
        |  CAST(sum(CAST(l_discount AS DECIMAL(20,2))) AS DOUBLE) AS sum_discount,
        |  CAST(sum(CAST(l_tax AS DECIMAL(20,2))) AS DOUBLE) AS sum_tax,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(20,2))) AS DOUBLE) / count(1) AS avg_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(20,2)) * CAST(l_discount AS DECIMAL(20,2))) AS DOUBLE) AS sum_revenue_lost
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "s6_fact_rebuild" ->
      """SELECT strftime(o_orderdate, '%Y-%m-%d') AS order_date, c_mktsegment, p_brand,
        |  count(1) AS order_count,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(20,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(20,2))) AS DOUBLE) AS sum_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(20,2)) * (CAST(1 AS DECIMAL(20,2)) - CAST(l_discount AS DECIMAL(20,2)))) AS DOUBLE) AS sum_disc_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(20,2)) * (CAST(1 AS DECIMAL(20,2)) - CAST(l_discount AS DECIMAL(20,2))) * (CAST(1 AS DECIMAL(20,2)) + CAST(l_tax AS DECIMAL(20,2)))) AS DOUBLE) AS sum_charge
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN part ON l_partkey = p_partkey
        |GROUP BY 1, 2, 3
        |ORDER BY 1, 2, 3""".stripMargin,

    "p2_select_star" ->
      "SELECT * FROM region ORDER BY r_regionkey",

    "p4_null_residual" ->
      """SELECT p_brand, count(1) AS n_lines,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(20,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem JOIN part
        |  ON l_partkey = p_partkey AND (CASE WHEN p_size > 45 THEN 'y' END) IS NULL
        |GROUP BY p_brand
        |ORDER BY p_brand""".stripMargin,

    "p5_filter_in" ->
      """SELECT o_orderkey, o_custkey, o_orderpriority FROM orders
        |WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
        |ORDER BY o_orderkey""".stripMargin,

    "p6_in_subquery" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 300000.0)
        |ORDER BY c_custkey""".stripMargin,

    "p7_update_rewrite" ->
      """SELECT o_orderkey, o_orderstatus,
        |  CASE WHEN o_orderstatus = 'F' THEN '0-REVIEWED' ELSE o_orderpriority END AS o_orderpriority
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "j3_merge_upsert" ->
      """WITH t AS (SELECT p_partkey AS item_id, p_name AS item_desc, p_retailprice AS price
        |           FROM part WHERE p_partkey % 2 = 0),
        |     s AS (SELECT p_partkey AS item_id, upper(p_name) AS item_desc, p_retailprice * 2 AS price
        |           FROM part WHERE p_partkey % 3 = 0)
        |SELECT coalesce(t.item_id, s.item_id) AS item_id,
        |  CASE WHEN s.item_id IS NOT NULL THEN s.item_desc ELSE t.item_desc END AS item_desc,
        |  CASE WHEN s.item_id IS NOT NULL THEN s.price ELSE t.price END AS price
        |FROM t FULL OUTER JOIN s ON t.item_id = s.item_id
        |ORDER BY item_id""".stripMargin,

    "j4_merge_composite" ->
      """WITH li AS (SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity, l_extendedprice FROM lineitem),
        |     t AS (SELECT * FROM li WHERE l_orderkey % 2 = 0),
        |     s AS (SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity + 100 AS l_quantity, l_extendedprice FROM li WHERE l_orderkey % 3 = 0)
        |SELECT coalesce(t.l_orderkey, s.l_orderkey) AS l_orderkey,
        |  coalesce(t.l_linenumber, s.l_linenumber) AS l_linenumber,
        |  coalesce(t.l_partkey, s.l_partkey) AS l_partkey,
        |  coalesce(t.l_suppkey, s.l_suppkey) AS l_suppkey,
        |  CASE WHEN s.l_orderkey IS NOT NULL THEN s.l_quantity ELSE t.l_quantity END AS l_quantity,
        |  CASE WHEN s.l_orderkey IS NOT NULL THEN s.l_extendedprice ELSE t.l_extendedprice END AS l_extendedprice
        |FROM t FULL OUTER JOIN s
        |  ON t.l_orderkey = s.l_orderkey AND t.l_linenumber = s.l_linenumber
        | AND t.l_partkey = s.l_partkey AND t.l_suppkey = s.l_suppkey
        |ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey""".stripMargin,

    "w1_dedup_latest" ->
      """SELECT user_id, event_id, event_type, value, epoch_us(ts) AS ts_us
        |FROM events
        |QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY epoch_us(ts) DESC, event_id DESC) = 1
        |ORDER BY user_id""".stripMargin,

    "f3_cast_coercion" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(CAST(CAST(l_quantity AS VARCHAR) AS DECIMAL(12,2)) AS DOUBLE) AS qty_roundtrip,
        |  CAST(l_orderkey AS VARCHAR) AS orderkey_str,
        |  strftime(CAST(l_shipdate AS DATE), '%Y-%m-%d') AS ship_date_str
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "o2_sort_desc" ->
      """SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us
        |FROM events
        |ORDER BY ts_us DESC, event_id DESC""".stripMargin,

    "s5_insert_append" ->
      """SELECT * FROM (
        |  SELECT * FROM nation
        |  UNION ALL
        |  SELECT n_nationkey + 100, n_name || '_NEW', n_regionkey FROM nation
        |) ORDER BY n_nationkey""".stripMargin,

    "s7_truncate" ->
      "SELECT * FROM nation WHERE false",

    "s9_delete" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM orders
        |WHERE NOT coalesce(o_orderstatus = 'O' AND o_totalprice > 150000.0, false)
        |ORDER BY o_orderkey""".stripMargin,

    "s11_point_lookup" ->
      """WITH b AS (SELECT min(doc_id) AS mn, max(doc_id) AS mx FROM documents)
        |SELECT doc_id, source, lang, length(text) AS text_len
        |FROM documents, b
        |WHERE doc_id IN (b.mn, (b.mn + b.mx) // 2, b.mx)
        |ORDER BY doc_id""".stripMargin,

    "j13_join_span" ->
      """SELECT strftime(o_orderdate, '%Y-%m') AS order_month,
        |  count(1) AS orders_cnt,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(20,2))) AS DOUBLE) AS total_price
        |FROM orders
        |WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "j11_merge_delete" ->
      """WITH t AS (SELECT p_partkey AS item_id, p_name AS item_desc, p_retailprice AS price
        |           FROM part WHERE p_partkey % 2 = 0),
        |     s AS (SELECT p_partkey AS item_id, upper(p_name) AS item_desc, p_retailprice * 2 AS price
        |           FROM part WHERE p_partkey % 3 = 0)
        |SELECT * FROM (
        |  SELECT t.* FROM t WHERE item_id NOT IN (SELECT item_id FROM s)
        |  UNION ALL
        |  SELECT s.* FROM s JOIN t USING (item_id)
        |  WHERE NOT coalesce(s.price > 1900.0, false)
        |  UNION ALL
        |  SELECT s.* FROM s WHERE item_id NOT IN (SELECT item_id FROM t)
        |) ORDER BY item_id""".stripMargin
  )
}
