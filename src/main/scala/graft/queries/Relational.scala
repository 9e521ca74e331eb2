package graft.queries

import org.apache.spark.sql.functions._
import graft.expr.Functions._
import graft.ops.{Chunking, Dedup, Joins, Relevance}
import Q.t

/** Core relational surface: aggregation, filters/projections (P1-P11),
  * joins (J1-J6), chunking window (W1+A1+A4). Each query exercises the
  * library operator and carries its DuckDB oracle.
  *
  * Float discipline for oracle parity: money aggregates go through
  * DECIMAL (exact, order-independent) and only then to DOUBLE;
  * integral-valued doubles (l_quantity) sum exactly in any order.
  */
object Relational {

  val qs: Seq[Q] = Seq(

    // ---- headline aggregation (TPC-H Q1 shape; SURVEY §2.5 machinery) ----
    Q("q01_agg_pricing",
      """SELECT l_returnflag, l_linestatus, SUM(l_quantity) AS sum_qty,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        | CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(20,4))) AS DOUBLE) AS sum_disc_price,
        | SUM(l_quantity) / COUNT(*) AS avg_qty, COUNT(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
      t(s, d, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_base_price"),
          sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast("decimal(20,4)"))
            .cast("double").as("sum_disc_price"),
          (sum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },

    // ---- P1-P7 + F10: projection, null/length filters, preview ----
    Q("q02_filter_project",
      """SELECT doc_id, source,
        | CASE WHEN length(text) > 200 THEN substr(text,1,200) || '...' ELSE text END AS content_preview,
        | n_chars
        |FROM documents
        |WHERE length(trim(text)) >= 2 AND n_chars >= 100 AND lang IS NOT NULL
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      t(s, d, "documents")
        .filter(length(trim(col("text"))) >= 2 && col("n_chars") >= 100 &&
          col("lang").isNotNull)
        .select(col("doc_id"), col("source"),
          preview(col("text")).as("content_preview"), col("n_chars"))
        .orderBy(col("doc_id"))
    },

    // ---- §7.3 minimum slice: F8 + J4 anti join + P7 + P8 + F10 ----
    Q("q03_crawler_slice",
      """WITH d AS (SELECT *, substr(sha256(text),1,16) AS id FROM documents),
        |seen AS (SELECT id FROM d WHERE doc_id % 10 = 0)
        |SELECT id, source,
        | CASE WHEN length(text) > 200 THEN substr(text,1,200) || '...' ELSE text END AS content_preview
        |FROM d
        |WHERE id NOT IN (SELECT id FROM seen) AND length(text) >= 100
        | AND (contains(lower(text),'spark') OR contains(lower(text),'stream') OR contains(lower(text),'vector'))
        |ORDER BY id""".stripMargin) { (s, d) =>
      // `seen` derives from `docs`, so docs("id")/seen("id") resolve to
      // ONE attribute — Spark's self-join disambiguation happened to
      // pick the right sides but warned "trivially true equals
      // predicate". Alias both sides so the predicate is structurally
      // unambiguous (AntiJoinSelfLineageSpec pins distinct exprIds).
      val docs = t(s, d, "documents").withColumn("id", sha16(col("text")))
        .as("fresh")
      val seen = docs.filter(col("doc_id") % 10 === 0).select(col("id"))
        .as("seen")
      Dedup.antiJoinSeen(docs, seen, col("fresh.id"), col("seen.id"))
        .filter(length(col("text")) >= 100 &&
          Relevance.anyKeyword(col("text"), Seq("spark", "stream", "vector")))
        .select(col("id"), col("source"), preview(col("text")).as("content_preview"))
        .orderBy(col("id"))
    },

    // ---- J1: carry-forward left join ----
    Q("q04_carry_forward",
      """SELECT d.doc_id, d.source, o.box_link
        |FROM documents d LEFT JOIN
        | (SELECT doc_id, substr(sha256(text),1,8) AS box_link FROM documents WHERE doc_id % 3 = 0) o
        | ON d.doc_id = o.doc_id
        |ORDER BY d.doc_id""".stripMargin) { (s, d) =>
      val fresh = t(s, d, "documents").select(col("doc_id"), col("source"))
      val previous = t(s, d, "documents").filter(col("doc_id") % 3 === 0)
        .select(col("doc_id"), substring(sha2(col("text"), 256), 1, 8).as("box_link"))
      Joins.carryForward(fresh, previous, "doc_id", "box_link")
        .orderBy(col("doc_id"))
    },

    // ---- J2: coalesce left join ----
    Q("q05_coalesce_link",
      """SELECT c.c_custkey,
        | coalesce(CASE WHEN c.c_custkey % 7 = 0 THEN 'seg:' || c.c_mktsegment END,
        |          'nation:' || n.n_name) AS link
        |FROM customer c LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
        |ORDER BY c.c_custkey""".stripMargin) { (s, d) =>
      val base = t(s, d, "customer")
      val lookup = t(s, d, "nation")
        .select(col("n_nationkey").as("c_nationkey"),
          concat(lit("nation:"), col("n_name")).as("looked_up"))
      Joins.coalesceJoin(base, lookup, Seq("c_nationkey"),
          when(col("c_custkey") % 7 === 0, concat(lit("seg:"), col("c_mktsegment"))),
          col("looked_up"), "link")
        .select(col("c_custkey"), col("link"))
        .orderBy(col("c_custkey"))
    },

    // ---- J3: substring-theta join normalized to derived-key equi-join ----
    Q("q06_derived_key_join",
      """WITH urls AS (SELECT doc_id,
        |   'https://cdn.example/' || source || '/' || CAST(doc_id AS VARCHAR) || '.mp4' AS video
        | FROM documents),
        |listing AS (SELECT CAST(doc_id AS VARCHAR) || '.mp4' AS name FROM documents WHERE doc_id % 2 = 0)
        |SELECT u.doc_id, l.name
        |FROM urls u JOIN listing l ON regexp_extract(u.video, '([^/]+)$', 1) = l.name
        |ORDER BY u.doc_id""".stripMargin) { (s, d) =>
      val urls = t(s, d, "documents").select(col("doc_id"),
        concat(lit("https://cdn.example/"), col("source"), lit("/"),
          col("doc_id").cast("string"), lit(".mp4")).as("video"))
      val listing = t(s, d, "documents").filter(col("doc_id") % 2 === 0)
        .select(concat(col("doc_id").cast("string"), lit(".mp4")).as("name"))
      Joins.derivedKeyJoin(urls, listing, "video", "name")
        .select(col("doc_id"), col("name"))
        .orderBy(col("doc_id"))
    },

    // ---- J6: semi join guard ----
    Q("q07_semi_join",
      """SELECT o_orderkey FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_quantity >= 45)
        |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      val prereqs = t(s, d, "lineitem").filter(col("l_quantity") >= 45)
        .select(col("l_orderkey").as("o_orderkey"))
      Dedup.withPrerequisite(t(s, d, "orders"), prereqs, Seq("o_orderkey"))
        .select(col("o_orderkey"))
        .orderBy(col("o_orderkey"))
    },

    // ---- J5: incremental work-list anti join ----
    Q("q08_anti_join_worklist",
      """SELECT o_orderkey FROM orders
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem
        |                  WHERE l_orderkey = o_orderkey
        |                    AND l_shipdate > TIMESTAMP '1997-06-01 00:00:00')
        |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      val done = t(s, d, "lineitem")
        .filter(col("l_shipdate") > lit("1997-06-01 00:00:00").cast("timestamp"))
        .select(col("l_orderkey").as("o_orderkey"))
      Dedup.pendingWork(t(s, d, "orders"), done, Seq("o_orderkey"))
        .select(col("o_orderkey"))
        .orderBy(col("o_orderkey"))
    },

    // ---- W1 + A1 + A4 flagship: chunked ordered concat with the
    // reference's bounds-vs-text quirk (SURVEY §7.5.6) ----
    Q("q09_chunk_summarize",
      """WITH c AS (SELECT *,
        |  CAST(floor((row_number() OVER (PARTITION BY user_id ORDER BY event_id) - 1) / 100) AS BIGINT) AS chunk_id
        | FROM events)
        |SELECT user_id, chunk_id,
        | coalesce(string_agg(event_type, ' ' ORDER BY event_id) FILTER (WHERE value < 100), '') AS chunk_text,
        | min(event_id) AS start_id, max(event_id) AS end_id, COUNT(*) AS n
        |FROM c GROUP BY user_id, chunk_id
        |ORDER BY user_id, chunk_id""".stripMargin) { (s, d) =>
      Chunking.chunkAggregate(t(s, d, "events"), "user_id", "event_id",
          "event_type", col("value") < 100, size = 100)
        .orderBy(col("user_id"), col("chunk_id"))
    },

    // ---- A2: two-level rollup concat ----
    Q("q10_rollup_concat",
      """WITH c AS (SELECT *,
        |  CAST(floor((row_number() OVER (PARTITION BY user_id ORDER BY event_id) - 1) / 100) AS BIGINT) AS chunk_id
        | FROM events),
        |ch AS (SELECT user_id, chunk_id,
        |  coalesce(string_agg(event_type, ' ' ORDER BY event_id) FILTER (WHERE value < 100), '') AS chunk_text,
        |  min(event_id) AS start_id, max(event_id) AS end_id, COUNT(*) AS n
        | FROM c GROUP BY user_id, chunk_id)
        |SELECT user_id, string_agg(chunk_text, chr(10) ORDER BY chunk_id) AS rollup_text,
        | min(start_id) AS start_id, max(end_id) AS end_id
        |FROM ch GROUP BY user_id
        |ORDER BY user_id""".stripMargin) { (s, d) =>
      val chunks = Chunking.chunkAggregate(t(s, d, "events"), "user_id",
        "event_id", "event_type", col("value") < 100, size = 100)
      Chunking.rollup(chunks, "user_id").orderBy(col("user_id"))
    },

    // ---- T4: deterministic first-per-key dedup ----
    Q("q11_dedup_first",
      """SELECT user_id, event_type, event_id FROM (
        | SELECT user_id, event_type, event_id,
        |  row_number() OVER (PARTITION BY user_id, event_type ORDER BY event_id) AS rn
        | FROM events) WHERE rn = 1
        |ORDER BY user_id, event_type""".stripMargin) { (s, d) =>
      Dedup.firstPerKey(t(s, d, "events"), Seq("user_id", "event_type"), col("event_id"))
        .select(col("user_id"), col("event_type"), col("event_id"))
        .orderBy(col("user_id"), col("event_type"))
    },

    // ---- exact content dedup (hash groupBy) ----
    Q("q12_dedup_exact",
      """SELECT substr(sha256(text),1,16) AS content_hash, min(doc_id) AS keeper, COUNT(*) AS n_copies
        |FROM documents GROUP BY 1 ORDER BY content_hash""".stripMargin) { (s, d) =>
      Dedup.exactDedup(t(s, d, "documents"), col("text"), col("doc_id"))
        .orderBy(col("content_hash"))
    },
  )
}
