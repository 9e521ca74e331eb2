package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-wide repeated-LINE removal — the line-granularity dedup
  * stage between whole-document dedup (exact/LSH) and within-document
  * repetition gates: C4 drops lines occurring ≥3 times in the corpus,
  * RefinedWeb and Dolma scrub repeated boilerplate lines (nav bars,
  * cookie banners, footers) the document-level passes cannot see
  * because every HOSTING document is unique.
  *
  * Scale shape:
  *  - lines explode with their position; the global count groups by
  *    an 8-byte `xxhash64` of the line, never the line text, with
  *    map-side combine — the count exchange carries (hash, count)
  *    pairs at distinct-line cardinality;
  *  - the kill set (hashes with count ≥ minRepeat) is the BOILERPLATE
  *    population — orders smaller than the line population — so the
  *    lines⋈kill-set anti join is AQE-broadcastable in the common
  *    case and a hash-keyed shuffle in the worst case (line text
  *    stays with its row either way);
  *  - the rebuild is the one text-bearing shuffle: surviving lines
  *    group by doc id and re-join in position order via
  *    `sort_array(collect_list(struct(pos, line)))` — same rows the
  *    input held, minus boilerplate.
  * 64-bit hash collision mass at corpus scale follows the sha16/F8
  * birthday argument (~N²/2⁶⁵) — a collision deletes a unique line
  * early, the same failure class every hash-keyed dedup here accepts.
  *
  * Documents whose every line is boilerplate survive as empty text
  * (the left join back to the input) — dropping them is a separate
  * policy decision (`TextAnalysis` gates), not this op's.
  */
object LineDedup {

  /** Remove every line occurring ≥ `minRepeat` times corpus-wide
    * (C4's rule is minRepeat=3; boilerplate scrubs use 2). Returns
    * (id, cleaned text, keepCols*); line order within each doc is
    * preserved. `keepCols` names metadata columns of `df` (source,
    * lang, url, …) carried through to the output — they ride the
    * SAME final id-keyed join the doc-retention contract already
    * pays, so a caller with metadata doesn't need a second join
    * against the input. */
  def removeRepeatedLines(df: DataFrame, id: String, text: Column,
      minRepeat: Long = 2, sep: String = "\n",
      keepCols: Seq[String] = Nil): DataFrame = {
    require(minRepeat >= 2, s"removeRepeatedLines: minRepeat=$minRepeat")
    val lines = df
      .select(col(id), posexplode(split(text, java.util.regex.Pattern.quote(sep)))
        .as(Seq("__pos", "__line")))
    val kill = lines
      .groupBy(xxhash64(col("__line")).as("__h"))
      .agg(count(lit(1)).as("__c"))
      .filter(col("__c") >= minRepeat)
      .select(col("__h"))
    val kept = lines
      .join(kill, xxhash64(col("__line")) === col("__h"), "left_anti")
    val rebuilt = kept
      .groupBy(col(id))
      .agg(array_join(transform(
          sort_array(collect_list(struct(col("__pos"), col("__line")))),
          s => s.getField("__line")), sep).as("__rebuilt"))
    df.select(col(id) +: keepCols.map(col): _*)
      .join(rebuilt, Seq(id), "left")
      .select(col(id) +: coalesce(col("__rebuilt"), lit("")).as("text")
        +: keepCols.map(col): _*)
  }

  /** WITHIN-document line dedup: keep each line's first occurrence in
    * its own document, preserving order — the complement of
    * `removeRepeatedLines` (which needs corpus-wide counts): repeated
    * nav blocks, double-pasted paragraphs and chat-log echoes collapse
    * per document with no global state at all.
    *
    * Scale: the dedup groups by (doc, line-hash) — a hash-keyed
    * shuffle carrying each line once (`first` over the group is
    * deterministic: all members are byte-equal modulo 64-bit
    * collision); the rebuild is the same positional collect_list as
    * `removeRepeatedLines`. Two row-linear shuffles, no corpus-wide
    * relation anywhere.
    *
    * Doc-retention contract (same as `removeRepeatedLines`): EVERY
    * input doc survives — a NULL-text doc (posexplode of null yields
    * no rows) comes back as empty text via the left join, not as a
    * silently dropped row. `keepCols` as in `removeRepeatedLines`. */
  def dedupLinesWithinDoc(df: DataFrame, id: String, text: Column,
      sep: String = "\n", keepCols: Seq[String] = Nil): DataFrame = {
    val lines = df
      .select(col(id), posexplode(split(text, java.util.regex.Pattern.quote(sep)))
        .as(Seq("__pos", "__line")))
    val firsts = lines
      .groupBy(col(id), xxhash64(col("__line")).as("__h"))
      .agg(min(col("__pos")).as("__pos"), first(col("__line")).as("__line"))
    val rebuilt = firsts
      .groupBy(col(id))
      .agg(array_join(transform(
          sort_array(collect_list(struct(col("__pos"), col("__line")))),
          s => s.getField("__line")), sep).as("__rebuilt"))
    df.select(col(id) +: keepCols.map(col): _*)
      .join(rebuilt, Seq(id), "left")
      .select(col(id) +: coalesce(col("__rebuilt"), lit("")).as("text")
        +: keepCols.map(col): _*)
  }

  /** The boilerplate lines themselves: (line, n_occurrences, n_docs)
    * for every line at or over `minRepeat` — the review list a corpus
    * owner eyeballs before letting the removal run. Text reaches the
    * exchange only for lines already known repeated (count rides the
    * hash; the text join is against the small kill population). */
  def repeatedLinesReport(df: DataFrame, id: String, text: Column,
      minRepeat: Long = 2, sep: String = "\n"): DataFrame = {
    val lines = df
      .select(col(id), posexplode(split(text, java.util.regex.Pattern.quote(sep)))
        .as(Seq("__pos", "__line")))
    val counts = lines
      .groupBy(xxhash64(col("__line")).as("__h"))
      .agg(count(lit(1)).as("n_occurrences"))
      .filter(col("n_occurrences") >= minRepeat)
    lines
      .select(col(id), col("__line"), xxhash64(col("__line")).as("__h"))
      .join(counts, Seq("__h"))
      .groupBy(col("__line").as("line"), col("n_occurrences"))
      .agg(countDistinct(col(id)).as("n_docs"))
      .select(col("line"), col("n_occurrences"), col("n_docs"))
  }
}
