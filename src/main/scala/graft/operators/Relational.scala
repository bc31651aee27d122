package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Relational extension surface (SURVEY.md §2.2): joins, aggregations,
  * grouping sets, set ops, top-k, JSON extraction — all Catalyst built-ins
  * so partial aggregation, join-strategy selection, predicate pushdown and
  * column pruning come for free.
  *
  * Scale notes (100 TB design):
  *  - dimension tables (customer/supplier/nation/region) are broadcast
  *    explicitly — the fact-side scan never shuffles for those joins;
  *  - fact-fact joins (lineitem⋈orders) shuffle on the join key once; at
  *    cluster scale the intended layout is bucketing both facts on orderkey
  *    (see [[graft.operators.Ingest]]) which removes that shuffle too;
  *  - aggregations are partial+final hash aggregates (map-side combine);
  *  - top-k is TakeOrderedAndProject (per-partition heap, no global sort).
  */
object Relational {

  /** Exact order-independent double aggregation (engine-parity safe). */
  def exactSum(c: Column): Column = sum(c.cast("decimal(18,2)")).cast("double")

  /** TPC-H Q1-style pricing summary over lineitem: multi-aggregate hash
    * aggregation with partial aggregation pushdown. */
  def pricingSummary(lineitem: DataFrame, shipBefore: String): DataFrame =
    lineitem
      .filter(col("l_shipdate") <= lit(shipBefore).cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        exactSum(col("l_quantity")).as("sum_qty"),
        exactSum(col("l_extendedprice")).as("sum_base_price"),
        sum(col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
          .cast("double").as("sum_disc_price"),
        (exactSum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
        count(lit(1)).as("count_order"))

  /** Deterministic MODE: the most frequent order priority per status.
    * Spark's built-in `mode()` breaks frequency ties arbitrarily, so this
    * uses the portable two-level formulation — count per (group, value),
    * then rank by (count DESC, value ASC) — which every engine reproduces
    * exactly. Two hash aggregations + one small window; the first
    * aggregation collapses map-side, so the shuffle carries one row per
    * distinct (group, value). */
  def modeOrderPriority(orders: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_orderstatus"))
      .orderBy(col("n").desc, col("o_orderpriority"))
    orders
      .groupBy(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("o_orderstatus"), col("o_orderpriority").as("mode_priority"),
        col("n").as("n_orders"))
  }

  /** Groupwise top-k: the k highest-price orders per market segment — a
    * partitioned ranking window + filter. Unlike a global ORDER BY LIMIT,
    * this shuffles once on the group key and each partition keeps only its
    * own top rows; the deterministic (price, orderkey) total order makes the
    * selection engine-portable. */
  def topKPerSegment(orders: DataFrame, customer: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    orders
      // customer is scale-variant (~15 GB at SF1000): no forced broadcast
      // hint — Catalyst/AQE picks BHJ from size stats at bench scale and
      // degrades to SMJ instead of OOMing the driver at 100×
      .join(customer.select(col("c_custkey"), col("c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col("c_mktsegment"), col("rk"), col("o_orderkey"), col("o_totalprice"))
  }

  /** Theta (non-equi, keyless) join: customers banded by account balance
    * against a derived 2000-wide band table. No equi key exists, so the only
    * correct plan is a nested-loop join — made scale-safe by BROADCASTING
    * the tiny band side (BroadcastNestedLoopJoin: the big side streams once,
    * never shuffles). The band table derives from region (5 rows) to stay a
    * real table scan rather than a literal VALUES. */
  def thetaBandCounts(customer: DataFrame, region: DataFrame): DataFrame = {
    val bands = region.select(
      col("r_regionkey").cast("long").as("band"),
      (col("r_regionkey") * lit(2000.0)).as("lo"),
      ((col("r_regionkey") + 1) * lit(2000.0)).as("hi"))
    customer
      .join(broadcast(bands),
        col("c_acctbal") >= col("lo") && col("c_acctbal") < col("hi"),
        "inner")
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n_customers"),
        exactSum(col("c_acctbal")).as("sum_bal"))
  }

  /** Dim-join enrich: orders ⋈ customer, revenue per market segment. The
    * dim side broadcasts when size stats allow (no shuffle of the fact
    * table) and degrades gracefully when it doesn't fit. */
  def segmentRevenue(orders: DataFrame, customer: DataFrame): DataFrame =
    orders
      // scale-variant dim: size-based broadcast selection, not a forced hint
      .join(customer, orders("o_custkey") === customer("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(
        exactSum(col("o_totalprice")).as("revenue"),
        count(lit(1)).as("n_orders"))

  /** TPC-H Q5-style star join: lineitem ⋈ orders shuffles once on orderkey;
    * the dims join broadcast-side. Only the fixed-size dims (nation 25 rows,
    * region 5) carry explicit hints — customer/supplier GROW with scale
    * factor (~15 GB / ~2 GB at SF1000), so their joins are left to
    * size-based selection: AQE broadcasts them at bench scale and falls
    * back to shuffled joins at 100× instead of OOMing the driver. Revenue
    * per nation for one region. */
  def regionNationRevenue(
      lineitem: DataFrame, orders: DataFrame, customer: DataFrame,
      supplier: DataFrame, nation: DataFrame, region: DataFrame,
      regionName: String): DataFrame =
    lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(supplier,
        col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === lit(regionName))
      .groupBy(col("n_name"))
      .agg(
        sum(col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
          .cast("double").as("revenue"),
        count(lit(1)).as("n_lineitems"))

  /** Left-semi join (EXISTS): customers that placed at least one order,
    * counted per market segment. */
  def customersWithOrders(customer: DataFrame, orders: DataFrame): DataFrame =
    customer
      .join(orders, customer("c_custkey") === orders("o_custkey"), "left_semi")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"))

  /** Left-anti join (NOT EXISTS): customers with no orders in the given
    * status (filter pushed below the join → smaller build side). */
  def customersWithoutOrders(customer: DataFrame, orders: DataFrame,
      status: String): DataFrame =
    customer
      .join(orders.filter(col("o_orderstatus") === lit(status)),
        customer("c_custkey") === orders("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))

  /** ROLLUP over (returnflag, linestatus): hierarchical grouping sets. */
  def rollupQty(lineitem: DataFrame): DataFrame =
    lineitem
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(exactSum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n_rows"))

  /** CUBE over (orderstatus, orderpriority): full grouping sets. */
  def cubeOrders(orders: DataFrame): DataFrame =
    orders
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(exactSum(col("o_totalprice")).as("sum_price"), count(lit(1)).as("n_orders"))

  /** Set difference: custkeys present in customer but absent from orders of
    * the given status. */
  def exceptCustkeys(customer: DataFrame, orders: DataFrame,
      status: String): DataFrame =
    customer.select(col("c_custkey").as("custkey"))
      .except(orders.filter(col("o_orderstatus") === lit(status))
        .select(col("o_custkey").as("custkey")))

  /** Set intersection: custkeys present in both customer and orders. */
  def intersectCustkeys(customer: DataFrame, orders: DataFrame): DataFrame =
    customer.select(col("c_custkey").as("custkey"))
      .intersect(orders.select(col("o_custkey").as("custkey")))

  /** Top-k orders by total price (TakeOrderedAndProject; orderkey tiebreak). */
  def topkOrders(orders: DataFrame, k: Int): DataFrame =
    orders
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(k)

  /** JSON extraction from the events `props` column (`{"k": <int>}`):
    * get_json_object is codegen'd; grouped to a compact distribution. */
  def jsonKeyDistribution(events: DataFrame): DataFrame =
    events
      .select(get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy((col("k") % lit(10L)).as("k_mod"))
      .agg(count(lit(1)).as("n"), min(col("k")).as("min_k"), max(col("k")).as("max_k"))

  /** Typed JSON parsing (`from_json` with an explicit schema — the planned
    * path for ingesting the events `props` payload as real columns). */
  def jsonStructStats(events: DataFrame): DataFrame =
    events
      .select(col("event_type"),
        from_json(col("props"),
          org.apache.spark.sql.types.StructType.fromDDL("k INT"))
          .getField("k").cast("long").as("k"))
      .groupBy(col("event_type"))
      .agg(count(col("k")).as("n_with_k"), min(col("k")).as("min_k"),
        max(col("k")).as("max_k"), sum(col("k")).as("sum_k"))

  /** Distinct aggregation: exact distinct-user count per event type
    * (two-phase distinct aggregate; the HLL `approx_count_distinct` variant
    * is exercised in tests, not oracled — sketch internals differ across
    * engines by construction). */
  def distinctUsers(events: DataFrame): DataFrame =
    events.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_users"), count(lit(1)).as("n_events"))

  /** Moment statistics with exact DECIMAL accumulation: mean and sample
    * variance from (Σx, Σx²) — fixed-order double arithmetic at the end, so
    * engine-identical (built-in stddev uses Welford and is not). */
  def statsAgg(events: DataFrame): DataFrame = {
    val dec = col("value").cast("decimal(18,2)")
    events.groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(dec).cast("double").as("sum_v"),
        sum(dec * dec).cast("double").as("sum_vv"))
      .select(
        col("event_type"), col("n"),
        (col("sum_v") / col("n")).as("mean_v"),
        ((col("sum_vv") - col("sum_v") * col("sum_v") / col("n")) / (col("n") - 1))
          .as("var_v"))
  }

  /** Exact sample covariance and Pearson correlation from DECIMAL moment
    * sums (Σx, Σy, Σxy, Σx², Σy²) — the built-ins (corr/covar_samp) stream
    * in row order and drift across engines; this formulation is a fixed
    * chain of double ops over exact sums → engine-identical. */
  def corrStats(lineitem: DataFrame): DataFrame = {
    val x = col("l_quantity").cast("decimal(18,2)")
    val y = col("l_extendedprice").cast("decimal(18,2)")
    lineitem.groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        sum(x).cast("double").as("sx"),
        sum(y).cast("double").as("sy"),
        sum(x * y).cast("double").as("sxy"),
        sum(x * x).cast("double").as("sxx"),
        sum(y * y).cast("double").as("syy"))
      .select(
        col("l_returnflag"), col("n"),
        ((col("sxy") - col("sx") * col("sy") / col("n")) / (col("n") - 1)).as("cov_samp"),
        ((col("n") * col("sxy") - col("sx") * col("sy")) /
          (sqrt(col("n") * col("sxx") - col("sx") * col("sx")) *
            sqrt(col("n") * col("syy") - col("sy") * col("sy")))).as("pearson_r"))
  }

  /** Calendar bucketing: events per (ISO-ish day-of-week, hour-of-day). */
  def datePartsAgg(events: DataFrame): DataFrame =
    events.groupBy(
        dayofweek(col("ts")).cast("long").as("dow"),
        hour(col("ts")).cast("long").as("hod"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))

  /** String scalar-function surface over documents: case/substring/replace/
    * edit distance — all codegen'd built-ins with cross-engine semantics. */
  def stringFuncs(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      upper(substring(col("text"), 1, 12)).as("head_upper"),
      // SQL replace(): replaces ALL occurrences in both engines (DuckDB's
      // regexp_replace only does the first match without 'g' — avoided)
      length(expr("replace(text, ' ', '')")).cast("long").as("n_nonspace"),
      levenshtein(col("lang"), col("source")).cast("long").as("lev_lang_source"),
      element_at(split(col("text"), " "), 1).as("first_token"),
      reverse(element_at(split(col("text"), " "), -1)).as("last_token_rev"))

  /** UNION ALL + re-aggregation across two filtered subsets. */
  def unionTagged(events: DataFrame): DataFrame = {
    val hi = events.filter(col("value") >= 100.0)
      .select(lit("high").as("tag"), col("value"))
    val lo = events.filter(col("value") < 100.0)
      .select(lit("low").as("tag"), col("value"))
    hi.unionByName(lo)
      .groupBy(col("tag"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
  }

  /** Pivot: per-user event-type counts as columns (explicit value list →
    * stable schema; equivalent to conditional aggregation). */
  def pivotCounts(events: DataFrame): DataFrame =
    events.groupBy(col("user_id"))
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .count()
      .na.fill(0L)

  /** Fixed-width histogram of `value` (bucket = floor(value / width)). */
  def histogram(events: DataFrame, width: Double): DataFrame =
    events.groupBy(floor(col("value") / lit(width)).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n"))

  /** Explicit GROUPING SETS ((returnflag, linestatus), (returnflag), ()) with
    * grouping_id — the general form behind rollup/cube. */
  def groupingSetsQty(lineitem: DataFrame): DataFrame =
    lineitem
      .groupingSets(
        Seq(Seq(col("l_returnflag"), col("l_linestatus")), Seq(col("l_returnflag")), Seq()),
        col("l_returnflag"), col("l_linestatus"))
      .agg(grouping_id().as("gid"),
        exactSum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n_rows"))

  /** Exact positional median (no interpolation — engine-portable): the value
    * at row ⌈n/2⌉ under a TOTAL order (value, event_id) per group. */
  def medianByType(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("event_type")).orderBy(col("value"), col("event_id"))
    events
      .select(col("event_type"), col("value"), col("event_id"))
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("event_type"))))
      // `/` is double division in Spark — truncate back to ⌈n/2⌉ (floor of
      // (n+1)/2), matching the oracle's integer `//`
      .filter(col("rn") === ((col("n") + 1) / 2).cast("long"))
      .select(col("event_type"), col("value").as("median_value"), col("n").as("n_rows"))
  }

  /** Trimmed mean per event type — the robust location estimate between
    * the median (50% trim) and the mean (0%): the exact decimal mean of
    * the rows whose RANK lies strictly above the loPct position and at or
    * below the hiPct position (the shared integer quantile-position
    * convention over the (value, event_id) total order). Rank-based
    * trimming needs no value thresholds, so the kept row SET is integer-
    * defined and engine-exact; the sum is decimal, the single division
    * double. One ranking window + one hash aggregation. */
  def trimmedMeanByType(events: DataFrame, loPct: Int = 5,
      hiPct: Int = 95): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(0 <= loPct && loPct < hiPct && hiPct <= 100, s"bad band [$loPct, $hiPct]")
    val w = Window.partitionBy(col("event_type")).orderBy(col("value"), col("event_id"))
    events
      .select(col("event_type"), col("value"), col("event_id"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("event_type"))))
      .filter(col("rn") > expr(s"(n * $loPct + 99) div 100") &&
        col("rn") <= expr(s"(n * $hiPct + 99) div 100"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_kept"),
        (sum(col("value").cast("decimal(18,2)")).cast("double") /
          count(lit(1))).as("trimmed_mean"))
  }

  /** TPC-H Q3 shape (shipping priority): revenue of not-yet-shipped
    * lineitems for one market segment's pre-cutoff orders, top 10 orders by
    * revenue. Fact-fact join shuffles once on the orderkey; the filtered
    * customer dim joins by size-based broadcast; both date filters push to
    * the scans. Exact decimal revenue; (revenue DESC, orderkey) total order
    * before the limit. */
  def shippingPriority(customer: DataFrame, orders: DataFrame,
      lineitem: DataFrame, segment: String, cutoff: String): DataFrame = {
    val cutoffTs = lit(cutoff).cast("timestamp")
    orders.filter(col("o_orderdate") < cutoffTs)
      .join(customer.filter(col("c_mktsegment") === lit(segment)),
        col("o_custkey") === col("c_custkey"))
      .join(lineitem.filter(col("l_shipdate") > cutoffTs),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("l_orderkey"),
        TimeSeries.tsUs(col("o_orderdate")).as("o_orderdate_us"))
      .agg(sum(col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** TPC-H Q6 shape (forecast revenue change): one filtered scan, one
    * global sum of price×discount — entirely pushed predicates + a single
    * partial/final aggregation, no join, no shuffle beyond the 1-row
    * merge. */
  def forecastRevenue(lineitem: DataFrame, year: Int,
      discLo: Double, discHi: Double, qtyCap: Double): DataFrame =
    lineitem
      .filter(org.apache.spark.sql.functions.year(col("l_shipdate")) === year &&
        col("l_discount").between(discLo, discHi) &&
        col("l_quantity") < qtyCap)
      .agg(sum(col("l_extendedprice").cast("decimal(18,2)") *
          col("l_discount").cast("decimal(18,2)"))
        .cast("double").as("revenue"))

  /** TPC-H Q14 shape (promotion effect): share of one month's revenue that
    * came from promo parts — a part-dim join (size-based broadcast) plus
    * one aggregation with a conditional numerator; the final percentage is
    * a single double division over exact decimal sums. */
  def promoRevenueShare(lineitem: DataFrame, part: DataFrame,
      monthStart: String, monthEnd: String): DataFrame = {
    val rev = col("l_extendedprice").cast("decimal(18,2)") *
      (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)"))
    lineitem
      .filter(col("l_shipdate") >= lit(monthStart).cast("timestamp") &&
        col("l_shipdate") < lit(monthEnd).cast("timestamp"))
      .join(part, col("l_partkey") === col("p_partkey"))
      .agg(
        sum(when(col("p_type") === "PROMO", rev)
          .otherwise(lit(0).cast("decimal(18,2)"))).cast("double").as("promo_rev"),
        sum(rev).cast("double").as("total_rev"))
      .select(
        (lit(100.0) * col("promo_rev") / col("total_rev")).as("promo_pct"),
        col("promo_rev"), col("total_rev"))
  }

  /** TPC-H Q10 shape (returned-item reporting): revenue lost to returns per
    * customer over a quarter, top 20 customers. One fact-fact shuffle on
    * the orderkey; customer/nation join by size-based selection; exact
    * decimal revenue; total order before the limit. */
  def returnedItemRevenue(customer: DataFrame, orders: DataFrame,
      lineitem: DataFrame, nation: DataFrame,
      qStart: String, qEnd: String): DataFrame =
    orders
      .filter(col("o_orderdate") >= lit(qStart).cast("timestamp") &&
        col("o_orderdate") < lit(qEnd).cast("timestamp"))
      .join(lineitem.filter(col("l_returnflag") === "R"),
        col("o_orderkey") === col("l_orderkey"))
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
      .agg(sum(col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)

  /** TPC-H Q18 shape (large-volume customers): orders whose total quantity
    * exceeds a threshold, with their customer. The HAVING runs on the
    * grouped fact FIRST (one shuffle on orderkey, map-side partials), so
    * only qualifying orders reach the customer join. */
  def largeVolumeCustomers(customer: DataFrame, orders: DataFrame,
      lineitem: DataFrame, minQty: Double): DataFrame =
    lineitem
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("total_qty"))
      .filter(col("total_qty") > minQty)
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(customer, col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        TimeSeries.tsUs(col("o_orderdate")).as("o_orderdate_us"),
        col("o_totalprice"), col("total_qty"))

  /** TPC-H Q21 SHAPE (adapted to this schema — no receipt/commit dates in
    * the synthetic lineitem, so "waiting" becomes "returned"): suppliers
    * who were the ONLY supplier with returned items in a finished
    * multi-supplier order. The double correlated subquery (EXISTS another
    * supplier, NOT EXISTS another flagged supplier) becomes a left-semi
    * plus a left-anti on (orderkey, suppkey≠) — both shuffle on
    * l_orderkey, co-partitioned with the fact join; the supplier dim join
    * is AQE size-based (scale-variant side, no forced broadcast). */
  def loneFlaggedSuppliers(supplier: DataFrame, orders: DataFrame,
      lineitem: DataFrame, k: Int): DataFrame = {
    val flagged = lineitem.filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"), col("l_suppkey"))
    val othersOfAny = lineitem.select(
      col("l_orderkey").as("o2_orderkey"), col("l_suppkey").as("o2_suppkey"))
    val othersFlagged = flagged.select(
      col("l_orderkey").as("o3_orderkey"), col("l_suppkey").as("o3_suppkey"))
    flagged
      .join(othersOfAny,
        col("l_orderkey") === col("o2_orderkey") &&
          col("l_suppkey") =!= col("o2_suppkey"), "left_semi")
      .join(othersFlagged,
        col("l_orderkey") === col("o3_orderkey") &&
          col("l_suppkey") =!= col("o3_suppkey"), "left_anti")
      .join(orders.filter(col("o_orderstatus") === "F"),
        col("l_orderkey") === col("o_orderkey"))
      .join(supplier, col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_name")).agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(k)
  }

  /** Data-profiling surface: per requested column, row/non-null/distinct
    * counts and min/max (rendered as strings AFTER the typed min/max, so
    * numeric columns compare numerically). ONE aggregation pass over the
    * table computes every column's metrics (no per-column rescan); the
    * single result row is then unpivoted with a literal-keyed map explode.
    * The profiling staple of a training-data pipeline: nulls, cardinality,
    * and range drift checks before a corpus lands. */
  def profileColumns(df: DataFrame, colNames: Seq[String]): DataFrame = {
    // a repeated name would produce duplicate keys in the literal map below
    // (throws under the default spark.sql.mapKeyDedupPolicy=EXCEPTION) —
    // profiling a column twice is the same profile, so dedupe at entry
    val cols = colNames.distinct
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__nn_$c"),
        countDistinct(col(c)).as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__mn_$c"),
        max(col(c)).cast("string").as(s"__mx_$c"))
    }
    df.agg(count(lit(1)).as("__n"), aggs: _*)
      .select(col("__n").as("n_rows"),
        explode(map(cols.flatMap(c => Seq(
          lit(c),
          struct(col(s"__nn_$c").as("n_nonnull"), col(s"__nd_$c").as("n_distinct"),
            col(s"__mn_$c").as("min_str"), col(s"__mx_$c").as("max_str")))): _*))
          .as(Seq("col_name", "m")))
      .select(col("col_name"), col("n_rows"), col("m.n_nonnull").as("n_nonnull"),
        col("m.n_distinct").as("n_distinct"), col("m.min_str"), col("m.max_str"))
  }

  /** Interval union (merge-overlaps) per key: collapse possibly-overlapping
    * [start, end] intervals into disjoint covering intervals — the classic
    * running-max sweep: a new group starts exactly when an interval's start
    * exceeds the max end seen so far. One partitioned window pass + one
    * aggregation; deterministic under the (start, end) order (equal rows
    * can't flip the group boundary). Distinct from gap-sessionization:
    * this merges by OVERLAP, not by inter-event gaps. */
  def mergeIntervals(intervals: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("key")).orderBy(col("start_us"), col("end_us"))
    val prevMax = max(col("end_us"))
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    intervals
      .withColumn("new_grp",
        when(prevMax.isNull || col("start_us") > prevMax, 1L).otherwise(0L))
      .withColumn("grp",
        sum(col("new_grp")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("key"), col("grp"))
      .agg(min(col("start_us")).as("interval_start_us"),
        max(col("end_us")).as("interval_end_us"),
        count(lit(1)).as("n_merged"))
      .select(col("key"), col("interval_start_us"), col("interval_end_us"), col("n_merged"))
  }

  /** Exact positional multi-quantiles (p50/p90/p99) per series — the
    * observability staple. One ranking window over a deterministic total
    * order, then conditional selection at the ceil(q·n) positions computed
    * in INTEGER arithmetic ((n·q + 99) div 100 — no double rounding to
    * disagree on). approx_percentile is the sketch alternative; this is the
    * exact, engine-portable form. */
  def quantilesByType(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("event_type")).orderBy(col("value"), col("event_id"))
    def pos(q: Int): Column = expr(s"(n * $q + 99) div 100")
    events
      .select(col("event_type"), col("value"), col("event_id"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("event_type"))))
      .groupBy(col("event_type"))
      .agg(
        max(col("n")).as("n"),
        max(when(col("rn") === pos(50), col("value"))).as("p50"),
        max(when(col("rn") === pos(90), col("value"))).as("p90"),
        max(when(col("rn") === pos(99), col("value"))).as("p99"))
  }

  /** Ranking-function surface: rank / dense_rank / percent_rank /
    * cume_dist / ntile over a deterministic total order, WITHOUT a global
    * window. A partition-less `Window.orderBy` sorts the whole table in ONE
    * task — the classic 100 TB stage-killer (Spark even warns "No Partition
    * Defined"). Because the sort key (price DESC, orderkey) is a UNIQUE
    * total order, rank = dense_rank = row_number and every ranking function
    * is pure arithmetic in (rn, n):
    *   prank = (rn-1)/(n-1), cdist = rn/n, ntile via the standard
    *   first-(n mod k)-buckets-get-one-extra formula.
    * So: TakeOrderedAndProject keeps only the top-N candidates (top-k per
    * partition, then merge — no global sort), the row count is one scalar
    * aggregate, and a window runs only over the N retained rows. Output is
    * IDENTICAL to the window formulation — the unchanged q_order_ranks
    * oracle is the proof. */
  def orderRanks(orders: DataFrame, topN: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // exact integer ceil-division via the shared DECIMAL floor-div helper
    // (a plain double `/` would mis-divide once n exceeds 2^53)
    def ceilDiv(a: Column, d: Column): Column =
      graft.model.floorDivCol(a + d - 1L, d)
    val nRow = orders.agg(count(lit(1)).as("n"))
    val top = orders
      .select(col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(topN)
    // this window spans only the topN retained rows — bounded, not 100 TB
    val w = Window.orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val k = 4L
    top
      .withColumn("rn", row_number().over(w).cast("long"))
      .crossJoin(broadcast(nRow)) // single scalar row
      .select(
        col("o_orderkey"), col("o_totalprice"),
        col("rn").as("rnk"),
        col("rn").as("drnk"),
        when(col("n") === 1L, lit(0.0))
          .otherwise((col("rn") - 1).cast("double") / (col("n") - 1).cast("double"))
          .as("prank"),
        (col("rn").cast("double") / col("n").cast("double")).as("cdist"), {
          val b = expr(s"n div $k")
          val r = col("n") % k
          val firstSpan = r * (b + 1)
          when(col("rn") <= firstSpan, ceilDiv(col("rn"), b + 1))
            .otherwise(r + ceilDiv(col("rn") - firstSpan, b))
            .cast("long").as("tile")
        })
  }

  /** Analytic window values: first/last/nth event per type under a total
    * order, evaluated with an unbounded frame. */
  def firstLastWindow(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    events
      .select(col("event_type"), col("ts"), col("event_id"), col("value"))
      .withColumn("first_id", first(col("event_id")).over(w))
      .withColumn("last_id", last(col("event_id")).over(w))
      .withColumn("third_value", nth_value(col("value"), 3).over(w))
      .groupBy(col("event_type"))
      .agg(max(col("first_id")).as("first_id"), max(col("last_id")).as("last_id"),
        max(col("third_value")).as("third_value"))
  }

  /** TPC-H Q4 SHAPE (order priority checking; adapted — the synthetic
    * lineitem has no commit/receipt dates, so "late delivery" becomes
    * "has a returned line"): orders placed in a quarter with at least one
    * returned lineitem, counted per priority. The EXISTS subquery is a
    * left-semi join — shuffles both sides on the orderkey once, never
    * duplicates orders with many matching lines. */
  def orderPriorityCheck(orders: DataFrame, lineitem: DataFrame,
      qStart: String, qEnd: String): DataFrame =
    orders
      .filter(col("o_orderdate") >= lit(qStart).cast("timestamp") &&
        col("o_orderdate") < lit(qEnd).cast("timestamp"))
      .join(lineitem.filter(col("l_returnflag") === "R"),
        col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))

  /** TPC-H Q7 shape (volume shipping between two nations): revenue on
    * lanes where the customer sits in one of the two nations and the
    * supplier in the other, per (cust nation, supp nation, ship year).
    * One fact-fact shuffle on the orderkey; customer/supplier joins are
    * AQE size-based (scale-variant dims, no forced broadcast); the tiny
    * nation dim IS broadcast, twice, under disambiguating aliases. */
  def nationVolumeShipping(lineitem: DataFrame, orders: DataFrame,
      customer: DataFrame, supplier: DataFrame, nation: DataFrame,
      nationA: String, nationB: String): DataFrame = {
    val custNation = nation.select(col("n_nationkey").as("cn_key"),
      col("n_name").as("cust_nation"))
    val suppNation = nation.select(col("n_nationkey").as("sn_key"),
      col("n_name").as("supp_nation"))
    lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(supplier, col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(custNation), col("c_nationkey") === col("cn_key"))
      .join(broadcast(suppNation), col("s_nationkey") === col("sn_key"))
      .filter(
        (col("cust_nation") === nationA && col("supp_nation") === nationB) ||
          (col("cust_nation") === nationB && col("supp_nation") === nationA))
      .groupBy(col("cust_nation"), col("supp_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(sum(col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
        .cast("double").as("revenue"))
      .orderBy(col("cust_nation"), col("supp_nation"), col("l_year"))
  }

  /** TPC-H Q8 shape (national market share): for each ship year, the
    * share of revenue billed to one region's customers that came from one
    * nation's suppliers. One fact-fact shuffle on the orderkey;
    * customer/supplier joins AQE size-based; the two nation legs and the
    * region leg broadcast under disambiguating aliases. Numerator and
    * denominator accumulate as exact decimals; the share is one double
    * division at the end. */
  def nationMarketShare(lineitem: DataFrame, orders: DataFrame,
      customer: DataFrame, supplier: DataFrame, nation: DataFrame,
      region: DataFrame, suppNation: String, regionName: String): DataFrame = {
    val custSide = nation.join(region, col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === regionName)
      .select(col("n_nationkey").as("cn_key"))
    val suppSide = nation.select(col("n_nationkey").as("sn_key"),
      col("n_name").as("supp_nation"))
    val rev = col("l_extendedprice").cast("decimal(18,2)") *
      (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)"))
    lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(broadcast(custSide), col("c_nationkey") === col("cn_key"), "left_semi")
      .join(supplier, col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(suppSide), col("s_nationkey") === col("sn_key"))
      .groupBy(year(col("l_shipdate")).as("l_year"))
      .agg(
        sum(when(col("supp_nation") === suppNation, rev)
          .otherwise(lit(0).cast("decimal(18,2)"))).cast("double").as("nation_rev"),
        sum(rev).cast("double").as("total_rev"))
      .select(col("l_year"),
        (col("nation_rev") / col("total_rev")).as("mkt_share"),
        col("nation_rev"), col("total_rev"))
      .orderBy(col("l_year"))
  }

  /** TPC-H Q12 SHAPE (shipping-mode priority mix; adapted — no l_shipmode
    * in the synthetic schema, so the grouping key is l_linestatus): per
    * line status, how many lines of a ship-year belong to critical
    * (URGENT/HIGH) vs other orders. One shuffle on the orderkey; the
    * priority split is a pair of conditional counts in one aggregation. */
  def lineStatusPriorityMix(lineitem: DataFrame, orders: DataFrame,
      shipYear: Int): DataFrame = {
    val isHigh = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    lineitem.filter(year(col("l_shipdate")) === shipYear)
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_linestatus"))
      .agg(
        sum(when(isHigh, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(isHigh, 0L).otherwise(1L)).as("low_line_count"))
      .orderBy(col("l_linestatus"))
  }

  /** TPC-H Q13 shape (customer order-count distribution): left-outer join
    * customer→orders (minus one excluded priority class), count orders per
    * customer — 0 for order-less customers, kept by the outer join — then
    * histogram the counts. Two shuffles (custkey, then the tiny count
    * domain); `count(o_orderkey)` counts non-null only, so the outer-join
    * null rows land in bucket 0 exactly like the SQL COUNT semantics. */
  def customerOrderDistribution(customer: DataFrame, orders: DataFrame,
      excludedPriority: String): DataFrame =
    customer
      .join(orders.filter(col("o_orderpriority") =!= excludedPriority),
        col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)

  /** TPC-H Q15 shape (top supplier): per-supplier revenue over a quarter,
    * then the supplier(s) achieving the maximum. The max is a 1-row
    * aggregate broadcast back against the (already supplier-sized) revenue
    * table; the tie comparison happens on the EXACT decimal sums — the
    * double cast is applied only to the final output column, so FP
    * rounding can never manufacture or hide a tie. */
  def topSupplierRevenue(lineitem: DataFrame, supplier: DataFrame,
      qStart: String, qEnd: String): DataFrame = {
    val rev = lineitem
      .filter(col("l_shipdate") >= lit(qStart).cast("timestamp") &&
        col("l_shipdate") < lit(qEnd).cast("timestamp"))
      .groupBy(col("l_suppkey"))
      .agg(sum(col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
        .as("rev_dec"))
    val mx = rev.agg(max(col("rev_dec")).as("mx_dec"))
    rev.join(broadcast(mx), col("rev_dec") === col("mx_dec"))
      .join(supplier, col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        col("rev_dec").cast("double").as("total_revenue"))
      .orderBy(col("s_suppkey"))
  }

  /** TPC-H Q17 shape (small-quantity-order revenue; adapted — brand only,
    * the synthetic part has no container): average yearly revenue lost if
    * small orders (below 20% of the part's mean quantity) stopped. The
    * correlated AVG subquery becomes one groupBy over the brand-restricted
    * lines; the 20%-of-mean predicate is rearranged to
    * `5 · qty · n < Σqty` so it evaluates in EXACT decimal arithmetic —
    * no division, no FP threshold ambiguity on either engine. */
  def smallQuantityRevenue(lineitem: DataFrame, part: DataFrame,
      brand: String): DataFrame = {
    val brandLines = lineitem.join(
      part.filter(col("p_brand") === brand).select(col("p_partkey")),
      col("l_partkey") === col("p_partkey"), "left_semi")
    val perPart = brandLines.groupBy(col("l_partkey").as("ap_partkey"))
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("sum_qty"),
        count(lit(1)).as("n_qty"))
    brandLines
      .join(perPart, col("l_partkey") === col("ap_partkey"))
      .filter(col("l_quantity").cast("decimal(18,2)") * lit(5) * col("n_qty") <
        col("sum_qty"))
      .agg((sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double") /
        lit(7.0)).as("avg_yearly"))
  }

  /** TPC-H Q19 shape (discounted revenue, OR-of-ANDs over part
    * attributes): three (brand, size band, quantity band) disjuncts over
    * the part join. The single OR predicate stays one codegen'd filter
    * stage; part is joined AQE size-based and the disjunction's shared
    * `p_size >= 1` style bounds still prune at the scan. */
  def bracketedRevenue(lineitem: DataFrame, part: DataFrame): DataFrame =
    lineitem
      .join(part, col("l_partkey") === col("p_partkey"))
      .filter(
        (col("p_brand") === "Brand#11" && col("p_size").between(1, 5) &&
          col("l_quantity").between(1, 11)) ||
          (col("p_brand") === "Brand#12" && col("p_size").between(1, 10) &&
            col("l_quantity").between(10, 20)) ||
          (col("p_brand") === "Brand#13" && col("p_size").between(1, 15) &&
            col("l_quantity").between(20, 30)))
      .agg(sum(col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
        .cast("double").as("revenue"))

  /** TPC-H Q5 SHAPE (local supplier volume): revenue from lineitems whose
    * CUSTOMER and SUPPLIER share a nation inside one region, per nation,
    * for a one-year order window. The c_nationkey = s_nationkey equality
    * rides the supplier join (no extra shuffle); the nation⋈region dim
    * is fixed-size and broadcast; the date filter prunes orders before
    * the fact join. */
  def localSupplierVolume(lineitem: DataFrame, orders: DataFrame,
      customer: DataFrame, supplier: DataFrame, nation: DataFrame,
      region: DataFrame, regionName: String, startDate: String,
      endDate: String): DataFrame = {
    val rev = col("l_extendedprice").cast("decimal(18,2)") *
      (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)"))
    val dims = nation.join(region, col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === regionName)
      .select(col("n_nationkey"), col("n_name"))
    lineitem
      .join(orders.filter(
          col("o_orderdate") >= lit(startDate).cast("timestamp") &&
            col("o_orderdate") < lit(endDate).cast("timestamp")),
        col("l_orderkey") === col("o_orderkey"))
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(supplier, col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(dims), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(sum(rev).cast("double").as("revenue"),
        count(lit(1)).as("n_lineitems"))
  }

  /** TPC-H Q9 SHAPE (product-type profit; adapted — the synthetic schema
    * has no partsupp, so profit omits the supplycost term): revenue from
    * one part type's lineitems, grouped by the SUPPLIER's nation and the
    * order year. The part filter collapses to a left-semi join (partkey
    * is unique) sized by AQE — part is scale-variant, so no forced
    * broadcast; nation broadcasts. */
  def productTypeProfit(lineitem: DataFrame, orders: DataFrame,
      supplier: DataFrame, nation: DataFrame, part: DataFrame,
      pType: String): DataFrame = {
    val rev = col("l_extendedprice").cast("decimal(18,2)") *
      (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)"))
    lineitem
      .join(part.filter(col("p_type") === pType).select(col("p_partkey")),
        col("l_partkey") === col("p_partkey"), "left_semi")
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(supplier, col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).as("o_year"))
      .agg(sum(rev).cast("double").as("sum_profit"),
        count(lit(1)).as("n_lineitems"))
  }

  /** TPC-H Q22 SHAPE (global sales opportunity; adapted — no phone column,
    * so the country-code prefix becomes a nation-key subset): well-funded
    * customers (balance above the mean POSITIVE balance) in selected
    * nations who never ordered, totalled per nation. The scalar AVG
    * subquery is a 1-row broadcast; the above-average predicate is
    * rearranged to `bal · n > Σbal` so it compares in EXACT decimal
    * arithmetic; the NOT EXISTS is a left-anti shuffle on custkey. */
  def idleRichCustomers(customer: DataFrame, orders: DataFrame,
      nation: DataFrame, nationKeys: Seq[Int]): DataFrame = {
    val posStats = customer.filter(col("c_acctbal") > 0)
      .agg(sum(col("c_acctbal").cast("decimal(18,2)")).as("sum_bal"),
        count(lit(1)).as("n_bal"))
    customer
      .filter(col("c_nationkey").isin(nationKeys: _*))
      .crossJoin(broadcast(posStats))
      .filter(col("c_acctbal").cast("decimal(18,2)") * col("n_bal") > col("sum_bal"))
      .join(orders, col("c_custkey") === col("o_custkey"), "left_anti")
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("numcust"),
        sum(col("c_acctbal").cast("decimal(18,2)")).cast("double").as("totacctbal"))
      .orderBy(col("n_name"))
  }

  /** Year-over-year monthly revenue growth — the reporting staple. The
    * monthly frame self-equi-joins on (year − 1, month) rather than a
    * lag(12) ROWS offset, which silently pairs wrong months when any
    * month is missing. Revenue and the YoY delta stay exact decimal; the
    * ratio is the one double at the output boundary. Missing prior year
    * → NULL prev/delta/ratio (reported, not dropped).
    *
    * Scale: one lineitem scan + hash agg; the monthly frame is
    * years×12-sized, so the self-join never matters. */
  def yoyGrowth(lineitem: DataFrame): DataFrame = {
    val rev = col("l_extendedprice").cast("decimal(18,2)") *
      (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)"))
    val monthly = lineitem
      .groupBy(year(col("l_shipdate")).as("yr"),
        month(col("l_shipdate")).as("mo"))
      .agg(sum(rev).as("rev"))
    val prior = monthly.select((col("yr") + 1).as("yr"), col("mo"),
      col("rev").as("prev_rev"))
    monthly.join(prior, Seq("yr", "mo"), "left")
      .select(col("yr"), col("mo"),
        col("rev").cast("double").as("revenue"),
        col("prev_rev").cast("double").as("prev_revenue"),
        (col("rev") - col("prev_rev")).cast("double").as("yoy_delta"),
        (col("rev").cast("double") / col("prev_rev").cast("double"))
          .as("yoy_ratio"))
  }

  /** TPC-H Q2 SHAPE (minimum-cost supplier; adapted — the dataset has no
    * partsupp table, so the catalog cost of a (part, supplier) pair is the
    * MINIMUM l_extendedprice observed across their trade history — an exact
    * decimal, no division): for parts of one size and type, every supplier
    * in the region that achieves the per-part minimum cost. Q2's correlated
    * min-cost subquery becomes a node-sized (partkey → min) aggregate
    * joined back by equality — ties keep ALL achieving suppliers, exactly
    * the reference semantics.
    *
    * Scale: part and supplier×nation×region prune to broadcast-sized dims,
    * so the lineitem scan never shuffles before the (partkey, suppkey)
    * aggregation; the per-part min is a second node-sized hash aggregate.
    * Output order (s_acctbal DESC, n_name, s_name, p_partkey) is total
    * because s_name determines the supplier and (p_partkey, suppkey) is
    * unique per row. */
  def minCostSupplier(lineitem: DataFrame, part: DataFrame,
      supplier: DataFrame, nation: DataFrame, region: DataFrame,
      size: Int, pType: String, regionName: String, k: Int): DataFrame = {
    val parts = part
      .filter(col("p_size") === size && col("p_type") === pType)
      .select(col("p_partkey"), col("p_brand"))
    val regionSupp = supplier
      .join(broadcast(nation
        .join(broadcast(region.filter(col("r_name") === regionName)
          .select(col("r_regionkey"))),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"), col("n_name"))
    val cost = lineitem
      .join(broadcast(parts.select(col("p_partkey"))),
        col("l_partkey") === col("p_partkey"), "left_semi")
      .join(broadcast(regionSupp.select(col("s_suppkey"))),
        col("l_suppkey") === col("s_suppkey"), "left_semi")
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(min(col("l_extendedprice").cast("decimal(18,2)")).as("cost"))
    val minCost = cost.groupBy(col("l_partkey"))
      .agg(min(col("cost")).as("min_cost"))
    cost.join(minCost, Seq("l_partkey"))
      .filter(col("cost") === col("min_cost"))
      .join(broadcast(regionSupp), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"),
        col("l_partkey").as("p_partkey"), col("p_brand"),
        col("cost").cast("double").as("supply_cost"))
      .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"),
        col("p_partkey"))
      .limit(k)
  }

  /** TPC-H Q11 SHAPE (important stock value; adapted — part "value" is the
    * discounted revenue its nation-local suppliers shipped, partsupp's
    * supplycost·availqty stand-in): parts whose value exceeds `perMille`
    * thousandths of the total. Revenue is carried as INTEGER cent·basis-
    * point units (extprice_cents × (10000 − discount_bp)) summed in
    * DECIMAL(38,0) — exact, associative, and the HAVING compare
    * `value · 1000 > total` stays in integer decimal on both engines (no
    * fraction, no double drift).
    *
    * Scale: the nation's suppliers broadcast as a semi-join filter, so
    * lineitem shuffles once on partkey (map-side partials); the grand
    * total is a 1-row broadcast back onto the node-sized per-part frame. */
  def importantPartValue(lineitem: DataFrame, supplier: DataFrame,
      nation: DataFrame, nationName: String, perMille: Int,
      k: Int): DataFrame = {
    val cents = (col("l_extendedprice").cast("decimal(18,2)") * 100)
      .cast("long")
    val bp = lit(10000L) -
      (col("l_discount").cast("decimal(6,4)") * 10000).cast("long")
    val natSupp = supplier
      .join(broadcast(nation.filter(col("n_name") === nationName)
        .select(col("n_nationkey"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"))
    val perPart = lineitem
      .join(broadcast(natSupp), col("l_suppkey") === col("s_suppkey"),
        "left_semi")
      .groupBy(col("l_partkey"))
      .agg(sum((cents * bp).cast("decimal(38,0)")).as("val_units"))
    val total = perPart.agg(sum(col("val_units")).as("total_units"))
    perPart.crossJoin(broadcast(total))
      .filter(col("val_units") * perMille > col("total_units"))
      .select(col("l_partkey").as("p_partkey"),
        (col("val_units").cast("double") / 1e6).as("part_value"))
      .orderBy(col("part_value").desc, col("p_partkey"))
      .limit(k)
  }

  /** TPC-H Q16 SHAPE (supplier count by part attributes; adapted — the
    * part-supplier relation is the DISTINCT (l_partkey, l_suppkey) trade
    * history, and the "customer complaints" supplier exclusion becomes the
    * negative-account-balance set): how many distinct suppliers can source
    * each surviving (brand, type, size) combination.
    *
    * Scale: the distinct pair set is the one fact shuffle (hash on the
    * pair, map-side partial distinct); parts and the exclusion set
    * broadcast; the count-distinct re-shuffles only the node-sized pair
    * frame on the 3-attribute key. */
  def supplierCountByPartAttrs(lineitem: DataFrame, part: DataFrame,
      supplier: DataFrame, brandExcl: String, typeExcl: String,
      sizes: Seq[Int], k: Int): DataFrame = {
    val parts = part
      .filter(col("p_brand") =!= brandExcl && col("p_type") =!= typeExcl &&
        col("p_size").isin(sizes.map(Int.box): _*))
      .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))
    val excluded = supplier.filter(col("s_acctbal") < 0)
      .select(col("s_suppkey"))
    lineitem.select(col("l_partkey"), col("l_suppkey")).distinct()
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .join(broadcast(excluded), col("l_suppkey") === col("s_suppkey"),
        "left_anti")
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
        col("p_size"))
      .limit(k)
  }

  /** TPC-H Q20 SHAPE (excess-volume shippers; adapted — without partsupp
    * availability the "excess stock" predicate becomes a shipped-quantity
    * threshold): suppliers whose total shipped quantity of `namePrefix`
    * parts during `year` exceeds `qtyThreshold`, with their nation
    * attached. Preserves Q20's nested-semi-join shape: parts prune
    * lineitem, the aggregate prunes supplier.
    *
    * Scale: the part prefix set broadcasts; the year filter is a pushed
    * timestamp range on the scan; one suppkey-keyed aggregation
    * (supplier-sized output) then semi-prunes the supplier dim. */
  def excessShippers(lineitem: DataFrame, part: DataFrame,
      supplier: DataFrame, nation: DataFrame, namePrefix: String,
      yr: Int, qtyThreshold: Int): DataFrame = {
    val heavy = lineitem
      .filter(col("l_shipdate") >= lit(s"$yr-01-01").cast("timestamp") &&
        col("l_shipdate") < lit(s"${yr + 1}-01-01").cast("timestamp"))
      .join(broadcast(part.filter(col("p_name").startsWith(namePrefix))
        .select(col("p_partkey"))),
        col("l_partkey") === col("p_partkey"), "left_semi")
      .groupBy(col("l_suppkey"))
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("qty"))
      .filter(col("qty") > qtyThreshold)
    supplier
      .join(heavy, col("s_suppkey") === col("l_suppkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_name"),
        col("qty").cast("double").as("shipped_qty"))
      .orderBy(col("s_name"))
  }

  /** Skew-safe two-phase aggregation (salting pattern): spray hot keys over
    * `salt` sub-keys for the partial phase, then merge. Results identical to
    * the direct aggregation — exercised as the at-scale plan for skewed
    * group-bys (a handful of event types over billions of rows). */
  def saltedSumByType(events: DataFrame, salt: Int): DataFrame =
    events
      .withColumn("__salt", pmod(col("event_id"), lit(salt.toLong)))
      .groupBy(col("event_type"), col("__salt"))
      .agg(sum(col("value").cast("decimal(18,2)")).as("partial_sum"),
        count(lit(1)).as("partial_n"))
      .groupBy(col("event_type"))
      .agg(sum(col("partial_sum")).cast("double").as("sum_value"),
        sum(col("partial_n")).as("n"))

  /** Warehouse reconciliation audit: recompute each order's total from
    * its lineitems as the exact DECIMAL
    * Σ extendedprice·(1−discount)·(1+tax) and compare to the declared
    * o_totalprice, summarized per order status — the dbt-style "does
    * the rollup match the fact table" test, bounded output. Orders with
    * NO lineitems reconcile against 0 (visible as mismatches, not
    * dropped — hence the left join). All sums are exact decimals; the
    * tolerance compare (|diff| > 0.01) happens on the exact value. One
    * fact-fact shuffle on orderkey (bucketing removes it at scale) then
    * a |statuses|-row aggregate. */
  def auditOrderTotals(orders: DataFrame, lineitem: DataFrame): DataFrame = {
    val recomputed = lineitem
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_extendedprice").cast("decimal(18,2)")
          * (lit(1).cast("decimal(4,2)") - col("l_discount").cast("decimal(4,2)"))
          * (lit(1).cast("decimal(4,2)") + col("l_tax").cast("decimal(4,2)")))
        .cast("decimal(24,6)").as("recomputed"))
    orders
      .join(recomputed, col("o_orderkey") === col("l_orderkey"), "left")
      .select(col("o_orderstatus"),
        col("o_totalprice").cast("decimal(18,2)").as("declared"),
        coalesce(col("recomputed"), lit(0).cast("decimal(24,6)"))
          .as("recomputed"))
      .withColumn("diff", col("recomputed") - col("declared"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        sum(when(abs(col("diff")) > 0.01, 1L).otherwise(0L)).as("n_mismatch"),
        max(abs(col("diff"))).cast("double").as("max_abs_diff"),
        sum(col("declared")).cast("double").as("sum_declared"),
        sum(col("recomputed")).cast("double").as("sum_recomputed"))
  }

  /** Referential-integrity audit across the star schema's FK edges: for
    * each child→parent edge, the child row count and the orphan count
    * (child keys with no parent — left ANTI join, never a fan-out).
    * Dimension parents broadcast; the two fact-sized edges shuffle on
    * the key once. Output is |edges| rows. */
  def auditForeignKeys(lineitem: DataFrame, orders: DataFrame,
      customer: DataFrame, supplier: DataFrame, part: DataFrame,
      nation: DataFrame, region: DataFrame): DataFrame = {
    def edge(name: String, child: DataFrame, childKey: String,
        parent: DataFrame, parentKey: String): DataFrame = {
      val orphans = child.join(parent,
        col(childKey) === col(parentKey), "left_anti")
      child.agg(count(lit(1)).as("n_child"))
        .crossJoin(broadcast(orphans.agg(count(lit(1)).as("n_orphan"))))
        .select(lit(name).as("fk_edge"), col("n_child"), col("n_orphan"))
    }
    Seq(
      edge("lineitem->orders", lineitem, "l_orderkey", orders, "o_orderkey"),
      edge("lineitem->part", lineitem, "l_partkey", part, "p_partkey"),
      edge("lineitem->supplier", lineitem, "l_suppkey", supplier, "s_suppkey"),
      edge("orders->customer", orders, "o_custkey", customer, "c_custkey"),
      edge("customer->nation", customer, "c_nationkey", nation, "n_nationkey"),
      edge("supplier->nation", supplier, "s_nationkey", nation, "n_nationkey"),
      edge("nation->region", nation, "n_regionkey", region, "r_regionkey"))
      .reduce(_ unionByName _)
  }
}
