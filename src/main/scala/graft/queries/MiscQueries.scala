package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.Dedup
import Q.{events, t}

/** Set ops / window positions / counters / limits / time windows /
  * sessionization / merge (SURVEY §2.5-2.7, §2.9).
  */
object MiscQueries {

  val qs: Seq[Q] = Seq(

    // ---- T1: heterogeneous union by name ----
    Q("q28_union_hetero",
      """SELECT * FROM (SELECT doc_id AS id, source, text AS content FROM documents WHERE doc_id % 2 = 0)
        |UNION ALL BY NAME (SELECT doc_id AS id, lang FROM documents WHERE doc_id % 2 = 1)
        |ORDER BY id""".stripMargin) { (s, d) =>
      val docs = t(s, d, "documents")
      val a = docs.filter(col("doc_id") % 2 === 0)
        .select(col("doc_id").as("id"), col("source"), col("text").as("content"))
      val b = docs.filter(col("doc_id") % 2 === 1)
        .select(col("doc_id").as("id"), col("lang"))
      a.unionByName(b, allowMissingColumns = true).orderBy(col("id"))
    },

    // ---- corpus snapshot diff (CDC delta report) ----
    // "Previous" snapshot is derived in-query: every 7th doc absent
    // (→ added today), every 11th doc's text stale (→ changed), plus
    // offset-id extras (→ removed); everything else unchanged. The op
    // compares 16-hex content fingerprints, so the full-outer join
    // shuffles fingerprints, not bodies.
    Q("q84_snapshot_diff",
      """WITH prev AS (
        | SELECT doc_id,
        |   CASE WHEN doc_id % 11 = 0 THEN text || ' v1' ELSE text END AS text
        | FROM documents WHERE doc_id % 7 <> 0
        | UNION ALL
        | SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 13 = 0),
        |p AS (SELECT doc_id, substr(sha256(text), 1, 16) AS pf FROM prev),
        |c AS (SELECT doc_id, substr(sha256(text), 1, 16) AS cf FROM documents)
        |SELECT coalesce(p.doc_id, c.doc_id) AS doc_id,
        | CASE WHEN pf IS NULL THEN 'added'
        |      WHEN cf IS NULL THEN 'removed'
        |      WHEN pf <> cf THEN 'changed' ELSE 'unchanged' END AS status
        |FROM p FULL JOIN c ON p.doc_id = c.doc_id
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      val docs = t(s, d, "documents")
      val prev = docs.filter(col("doc_id") % 7 =!= 0)
        .select(col("doc_id"),
          when(col("doc_id") % 11 === 0, concat(col("text"), lit(" v1")))
            .otherwise(col("text")).as("text"))
        .unionByName(docs.filter(col("doc_id") % 13 === 0)
          .select((col("doc_id") + 1000000).as("doc_id"), col("text")))
      graft.ops.Snapshot.snapshotDiff(prev, docs.select(col("doc_id"), col("text")),
          "doc_id", col("text"))
        .orderBy(col("doc_id"))
    },

    // ---- W2/T2: first row per group ----
    Q("q29_first_per_group",
      """SELECT user_id, event_id, event_type, value FROM (
        | SELECT user_id, event_id, event_type, value,
        |  row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
        | FROM events) WHERE rn = 1
        |ORDER BY user_id""".stripMargin) { (s, d) =>
      Dedup.firstPerKey(events(s, d), Seq("user_id"), col("event_id"))
        .select(col("user_id"), col("event_id"), col("event_type"), col("value"))
        .orderBy(col("user_id"))
    },

    // ---- P11: drop-first-row slice (rollup removal) ----
    Q("q30_drop_first",
      """SELECT user_id, COUNT(*) AS n_rest, MIN(event_id) AS first_kept FROM (
        | SELECT user_id, event_id,
        |  row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
        | FROM events) WHERE rn > 1
        |GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      events(s, d).withColumn("rn", row_number().over(w))
        .filter(col("rn") > 1)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_rest"), min(col("event_id")).as("first_kept"))
        .orderBy(col("user_id"))
    },

    // ---- A5: distinct key set ----
    Q("q31_distinct",
      "SELECT DISTINCT event_type FROM events ORDER BY event_type") { (s, d) =>
      events(s, d).select(col("event_type")).distinct().orderBy(col("event_type"))
    },

    // ---- A6: counters / stats ----
    Q("q32_counters",
      """SELECT event_type, COUNT(*) AS n,
        | CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, d) =>
      events(s, d).groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("total"))
        .orderBy(col("event_type"))
    },

    // ---- T3: limit pushdown ----
    Q("q33_limit",
      "SELECT o_orderkey FROM orders ORDER BY o_orderkey LIMIT 1000") { (s, d) =>
      t(s, d, "orders").select(col("o_orderkey")).orderBy(col("o_orderkey")).limit(1000)
    },

    // ---- headline 3-way join + agg + top-k ----
    Q("q34_topk_revenue",
      """SELECT o.o_orderkey, c.c_name,
        | CAST(SUM(CAST(l.l_extendedprice * (1.0 - l.l_discount) AS DECIMAL(20,4))) AS DOUBLE) AS revenue
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        | JOIN customer c ON o.o_custkey = c.c_custkey
        |GROUP BY o.o_orderkey, c.c_name
        |ORDER BY revenue DESC, o.o_orderkey LIMIT 10""".stripMargin) { (s, d) =>
      val li = t(s, d, "lineitem")
      val o = t(s, d, "orders")
      val c = t(s, d, "customer")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy(o("o_orderkey"), c("c_name"))
        .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(20,4)")).cast("double").as("revenue"))
        .orderBy(desc("revenue"), col("o_orderkey")).limit(10)
    },

    // ---- §2.9: tumbling event-time window (streaming-equivalent batch) ----
    Q("q35_tumbling_window",
      """SELECT CAST(epoch_ms(date_trunc('hour', ts)) AS BIGINT) AS hour_ms, event_type,
        | COUNT(*) AS n, CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
      events(s, d)
        .withColumn("tstamp", timestamp_millis(col("ts_ms")))
        .groupBy(window(col("tstamp"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
        .select(unix_millis(col("window.start")).as("hour_ms"), col("event_type"),
          col("n"), col("sum_value"))
        .orderBy(col("hour_ms"), col("event_type"))
    },

    // ---- §2.9 generalization: gap-based sessionization ----
    Q("q36_sessionize",
      """WITH e AS (SELECT user_id, event_id, CAST(epoch_ms(ts) AS BIGINT) AS ms FROM events),
        |s AS (SELECT user_id, event_id, ms,
        |  CASE WHEN lag(ms) OVER (PARTITION BY user_id ORDER BY ms, event_id) IS NULL
        |        OR ms - lag(ms) OVER (PARTITION BY user_id ORDER BY ms, event_id) > 1800000
        |       THEN 1 ELSE 0 END AS new_s
        | FROM e),
        |t AS (SELECT user_id, ms,
        |  CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY ms, event_id
        |                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        | FROM s)
        |SELECT user_id, session_id, COUNT(*) AS n, MIN(ms) AS start_ms, MAX(ms) AS end_ms
        |FROM t GROUP BY user_id, session_id ORDER BY user_id, session_id""".stripMargin) { (s, d) =>
      graft.ops.Sessionize.byGap(events(s, d), "user_id", "ts_ms", "event_id",
        gapMs = 1800000)
    },

    // ---- §2.9, NTZ-native: hourly window computed DIRECTLY on the
    // events.ts column — no ts_ms detour ----
    // The testdata has shipped events.ts as timestamp[us] (surfacing
    // as TIMESTAMP_NTZ) since the r10 regeneration, but every other
    // time query routes through the Q.events ts_ms adapter, so the
    // native type was exercised only by the loader cast. Here the
    // grouping/trunc/min/max all run on the NTZ column itself; both
    // sides emit formatted strings (micros on min/max) because a
    // parquet-NTZ vs DuckDB-TIMESTAMP value compare would test the
    // physical type plumbing, not the computation.
    Q("q136_ntz_native",
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_str,
        | event_type, COUNT(*) AS n,
        | strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS first_ts,
        | strftime(max(ts), '%Y-%m-%d %H:%M:%S.%f') AS last_ts
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
      val df = t(s, d, "events")
      // same type dispatch discipline as Q.events: compute natively on
      // whatever the parquet ships, normalized to NTZ wall-clock
      val tsNtz = df.schema("ts").dataType match {
        case TimestampNTZType => col("ts")
        // session TZ is UTC (GraftSession) → wall-clock-identical cast
        case TimestampType    => col("ts").cast("timestamp_ntz")
        case LongType         =>
          expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)")
        case other => throw new IllegalStateException(
          s"events.ts has unsupported type $other")
      }
      df.withColumn("__ts", tsNtz)
        .groupBy(date_trunc("hour", col("__ts")).as("hr"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          date_format(min(col("__ts")), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("first_ts"),
          date_format(max(col("__ts")), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("last_ts"))
        .select(date_format(col("hr"), "yyyy-MM-dd HH:mm:ss").as("hour_str"),
          col("event_type"), col("n"), col("first_ts"), col("last_ts"))
        .orderBy(col("hour_str"), col("event_type"))
    },

    // ---- V2/K4: MERGE-by-id upsert semantics ----
    Q("q37_merge_upsert",
      """WITH state AS (SELECT doc_id, 'old' AS ver FROM documents WHERE doc_id % 3 = 0),
        |upd AS (SELECT doc_id, 'new' AS ver FROM documents WHERE doc_id % 2 = 0)
        |SELECT doc_id, ver FROM upd
        |UNION ALL
        |SELECT s.doc_id, s.ver FROM state s
        | WHERE NOT EXISTS (SELECT 1 FROM upd u WHERE u.doc_id = s.doc_id)
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      val docs = t(s, d, "documents")
      val state = docs.filter(col("doc_id") % 3 === 0)
        .select(col("doc_id"), lit("old").as("ver"))
      val updates = docs.filter(col("doc_id") % 2 === 0)
        .select(col("doc_id"), lit("new").as("ver"))
      Dedup.mergeById(state, updates, Seq("doc_id")).orderBy(col("doc_id"))
    },
  )
}
