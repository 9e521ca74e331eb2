package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Q.{events, t}

/** Classic OLAP aggregation surface beyond the reference (engine
  * baseline per SURVEY §2.5 note): distinct aggregation, rollup
  * grouping sets, pivot, full ranking-window family.
  */
object OlapQueries {

  val qs: Seq[Q] = Seq(

    // ---- distinct aggregation ----
    Q("q42_count_distinct",
      """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_parts, COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      t(s, d, "lineitem").groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("n_parts"), count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"))
    },

    // ---- rollup grouping sets ----
    Q("q43_rollup",
      """SELECT l_returnflag, l_linestatus, SUM(l_quantity) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin) { (s, d) =>
      t(s, d, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity")).as("sum_qty"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },

    // ---- pivot (conditional aggregation) ----
    Q("q44_pivot",
      """SELECT user_id,
        | COUNT(*) FILTER (WHERE event_type = 'click') AS click,
        | COUNT(*) FILTER (WHERE event_type = 'view') AS view,
        | COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
        | COUNT(*) FILTER (WHERE event_type = 'signup') AS signup,
        | COUNT(*) FILTER (WHERE event_type = 'error') AS error
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, d) =>
      events(s, d).groupBy(col("user_id"))
        .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy(col("user_id"))
    },

    // ---- distributed global position == single-sort row_number ----
    Q("q51_global_position",
      """SELECT doc_id, n_chars,
        | CAST(row_number() OVER (ORDER BY n_chars, doc_id) - 1 AS BIGINT) AS pos
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      graft.ops.GlobalOrder.withGlobalPosition(
          t(s, d, "documents").select(col("doc_id"), col("n_chars")),
          Seq(col("n_chars"), col("doc_id")))
        .select(col("doc_id"), col("n_chars"), col("pos"))
        .orderBy(col("doc_id"))
    },

    // ---- int8 embedding quantization (scalar reductions for parity) ----
    Q("q52_quantize",
      """WITH v AS (SELECT vec_id, embedding,
        |  list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS m
        | FROM embeddings),
        |q AS (SELECT vec_id, m,
        |  list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) / m * 127) AS BIGINT)) AS qv
        | FROM v WHERE m > 0)
        |SELECT vec_id, CAST(list_sum(qv) AS BIGINT) AS q_sum,
        | CAST(list_min(qv) AS BIGINT) AS q_min, CAST(list_max(qv) AS BIGINT) AS q_max,
        | round(m, 6) AS scale6
        |FROM q ORDER BY vec_id""".stripMargin) { (s, d) =>
      import graft.vector.Quantize
      val emb = t(s, d, "embeddings")
        .withColumn("m", Quantize.scaleOf(col("embedding")))
        .filter(col("m") > 0)
        .withColumn("qv", Quantize.quantize(col("embedding"), col("m")))
      emb.select(col("vec_id"),
          aggregate(col("qv"), lit(0L), (acc, x) => acc + x).as("q_sum"),
          array_min(col("qv")).as("q_min"),
          array_max(col("qv")).as("q_max"),
          round(col("m"), 6).as("scale6"))
        .orderBy(col("vec_id"))
    },

    // ---- tolerance range join (banded equi-join formulation) ----
    Q("q57_range_join",
      """WITH c AS (SELECT user_id, event_id, CAST(epoch_ms(ts) AS BIGINT) AS ms
        |  FROM events WHERE event_type = 'click'),
        |b AS (SELECT user_id, event_id, CAST(epoch_ms(ts) AS BIGINT) AS ms
        |  FROM events WHERE event_type = 'purchase')
        |SELECT c.user_id, c.event_id AS click_id, b.event_id AS buy_id,
        | c.ms - b.ms AS dt_ms
        |FROM c JOIN b ON c.user_id = b.user_id AND abs(c.ms - b.ms) <= 600000
        |ORDER BY c.user_id, click_id, buy_id""".stripMargin) { (s, d) =>
      val ev = events(s, d)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("click_id"),
          col("ts_ms").as("c_ms"))
      val buys = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("buy_id"),
          col("ts_ms").as("b_ms"))
      graft.ops.RangeJoin.withinTolerance(clicks, buys, Seq("user_id"),
          "c_ms", "b_ms", 600000L)
        .select(col("user_id"), col("click_id"), col("buy_id"),
          (col("c_ms") - col("b_ms")).as("dt_ms"))
        .orderBy(col("user_id"), col("click_id"), col("buy_id"))
    },

    // ---- as-of join: latest purchase value as of each click ----
    Q("q47_asof_join",
      """WITH clicks AS (SELECT user_id, event_id, CAST(epoch_ms(ts) AS BIGINT) AS ms
        |  FROM events WHERE event_type = 'click'),
        |buys AS (SELECT user_id, CAST(epoch_ms(ts) AS BIGINT) AS ms, MAX(value) AS value
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
        |SELECT c.user_id, c.event_id, b.value AS last_purchase
        |FROM clicks c ASOF LEFT JOIN buys b
        |  ON c.user_id = b.user_id AND c.ms >= b.ms
        |ORDER BY c.user_id, c.event_id""".stripMargin) { (s, d) =>
      val ev = events(s, d)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id"), col("ts_ms"))
      val buys = ev.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), col("ts_ms"))
        .agg(max(col("value")).as("last_purchase"))
      graft.ops.AsOf.asofBackward(clicks, buys, Seq("user_id"),
          "ts_ms", "ts_ms", Seq("last_purchase"))
        .select(col("user_id"), col("event_id"), col("last_purchase"))
        .orderBy(col("user_id"), col("event_id"))
    },

    // ---- cube grouping sets ----
    Q("q48_cube",
      """SELECT l_returnflag, l_linestatus, SUM(l_quantity) AS sum_qty, COUNT(*) AS n
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin) { (s, d) =>
      t(s, d, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },

    // ---- exact percentiles (linear interpolation, both engines) ----
    Q("q46_percentile",
      """SELECT l_returnflag,
        | round(quantile_cont(l_quantity, 0.5), 6) AS med_qty,
        | round(quantile_cont(l_quantity, 0.95), 6) AS p95_qty,
        | MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      t(s, d, "lineitem").groupBy(col("l_returnflag"))
        .agg(round(expr("percentile(l_quantity, 0.5)"), 6).as("med_qty"),
          round(expr("percentile(l_quantity, 0.95)"), 6).as("p95_qty"),
          min(col("l_quantity")).as("min_qty"),
          max(col("l_quantity")).as("max_qty"))
        .orderBy(col("l_returnflag"))
    },

    // ---- top-N per group (windowed limit) ----
    Q("q54_topn_per_group",
      """SELECT l_returnflag, l_orderkey, l_quantity FROM (
        | SELECT l_returnflag, l_orderkey, l_quantity,
        |  row_number() OVER (PARTITION BY l_returnflag
        |                     ORDER BY l_quantity DESC, l_orderkey, l_linenumber) AS rn
        | FROM lineitem) WHERE rn <= 5
        |ORDER BY l_returnflag, rn""".stripMargin) { (s, d) =>
      val w = Window.partitionBy(col("l_returnflag"))
        .orderBy(desc("l_quantity"), col("l_orderkey"), col("l_linenumber"))
      t(s, d, "lineitem")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 5)
        .orderBy(col("l_returnflag"), col("rn"))
        .select(col("l_returnflag"), col("l_orderkey"), col("l_quantity"))
    },

    // ---- statistical aggregates (rounded: Welford order-variance) ----
    Q("q55_stats",
      """SELECT l_returnflag,
        | round(stddev_samp(l_quantity), 6) AS sd_qty,
        | round(var_samp(l_quantity), 6) AS var_qty,
        | round(corr(l_quantity, l_discount), 6) + 0.0 AS corr_qd,
        | round(covar_samp(l_quantity, l_discount), 6) + 0.0 AS cov_qd
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      // corr/cov straddle zero → `+ 0.0` signed-zero normalization on
      // both engines (r19 audit); sd/var are non-negative by identity
      t(s, d, "lineitem").groupBy(col("l_returnflag"))
        .agg(round(stddev_samp(col("l_quantity")), 6).as("sd_qty"),
          round(var_samp(col("l_quantity")), 6).as("var_qty"),
          graft.expr.Functions.roundZ(
            corr(col("l_quantity"), col("l_discount")), 6).as("corr_qd"),
          graft.expr.Functions.roundZ(
            covar_samp(col("l_quantity"), col("l_discount")), 6).as("cov_qd"))
        .orderBy(col("l_returnflag"))
    },

    // ---- date arithmetic (dow aligned: Spark 1=Sun → 0=Sun) ----
    Q("q56_date_math",
      """SELECT o_orderkey,
        | CAST(date_diff('day', DATE '1995-01-01', o_orderdate) AS BIGINT) AS days_since,
        | CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS yr,
        | CAST(EXTRACT(month FROM o_orderdate) AS BIGINT) AS mo,
        | CAST(EXTRACT(dow FROM o_orderdate) AS BIGINT) AS dow,
        | strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS due_day
        |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      t(s, d, "orders").select(col("o_orderkey"),
          datediff(col("o_orderdate").cast("date"),
            lit("1995-01-01").cast("date")).cast("long").as("days_since"),
          year(col("o_orderdate")).cast("long").as("yr"),
          month(col("o_orderdate")).cast("long").as("mo"),
          (dayofweek(col("o_orderdate")) - 1).cast("long").as("dow"),
          date_format(date_add(col("o_orderdate").cast("date"), 30),
            "yyyy-MM-dd").as("due_day"))
        .orderBy(col("o_orderkey"))
    },

    // ---- ranking-window family + running sum ----
    Q("q45_window_family",
      """SELECT event_id, user_id,
        | rank() OVER w AS rnk, dense_rank() OVER w AS drnk, ntile(4) OVER w AS quartile,
        | lag(event_id) OVER w AS prev_id, lead(event_id) OVER w AS next_id,
        | CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (PARTITION BY user_id ORDER BY event_id
        |      ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_value
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
        |ORDER BY user_id, event_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      events(s, d).select(col("event_id"), col("user_id"),
          rank().over(w).cast("long").as("rnk"),
          dense_rank().over(w).cast("long").as("drnk"),
          ntile(4).over(w).cast("long").as("quartile"),
          lag(col("event_id"), 1).over(w).as("prev_id"),
          lead(col("event_id"), 1).over(w).as("next_id"),
          sum(col("value").cast("decimal(18,2)")).over(run)
            .cast("double").as("running_value"))
        .orderBy(col("user_id"), col("event_id"))
    },

    // ---- six-table star join (the TPC-H Q5 shape) ----
    // Per-nation revenue from intra-region trade in one year: the
    // classic snowflake — lineitem (fact) joins orders on the order
    // key (the one big shuffle pair); supplier and customer are
    // plain equi-joins so AQE broadcasts them at demo scale and
    // shuffles on the key at web scale (they grow with SF — only
    // nation and region are true broadcast dims); the c_nationkey =
    // s_nationkey constraint rides the customer join. The date gate
    // filters orders BEFORE any join. Money goes through DECIMAL
    // before DOUBLE (the q01/q34 discipline).
    Q("q103_region_revenue",
      """SELECT n.n_name,
        | CAST(SUM(CAST(l.l_extendedprice * (1.0 - l.l_discount)
        |   AS DECIMAL(20,4))) AS DOUBLE) AS revenue,
        | CAST(COUNT(*) AS BIGINT) AS n_items
        |FROM lineitem l
        | JOIN orders o ON l.l_orderkey = o.o_orderkey
        | JOIN supplier s ON l.l_suppkey = s.s_suppkey
        | JOIN customer c ON o.o_custkey = c.c_custkey
        |   AND c.c_nationkey = s.s_nationkey
        | JOIN nation n ON s.s_nationkey = n.n_nationkey
        | JOIN region r ON n.n_regionkey = r.r_regionkey
        |WHERE r.r_name = 'ASIA'
        | AND o.o_orderdate >= TIMESTAMP '1996-01-01'
        | AND o.o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY n.n_name ORDER BY revenue DESC, n.n_name""".stripMargin) { (s, d) =>
      val li = t(s, d, "lineitem")
      val o = t(s, d, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      val c = t(s, d, "customer")
      val su = t(s, d, "supplier")
      val n = t(s, d, "nation")
      val r = t(s, d, "region")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(su, li("l_suppkey") === su("s_suppkey"))
        .join(c, o("o_custkey") === c("c_custkey") &&
          c("c_nationkey") === su("s_nationkey"))
        .join(broadcast(n), su("s_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .filter(r("r_name") === "ASIA")
        .groupBy(n("n_name"))
        .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .cast("decimal(20,4)")).cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(desc("revenue"), col("n_name"))
    },
  )
}
