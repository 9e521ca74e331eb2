package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (backward) join — the event-time enrichment operator ("value
  * of X as of this row's timestamp"). Spark has no native ASOF JOIN;
  * the scalable formulation is union + last-ignoring-nulls over an
  * ordered window: ONE shuffle on the key, no per-row range probe, no
  * equality-range explosion. Beats both broadcast-UDF lookups (driver
  * state) and inequality theta joins (BNLJ) at 100 TB.
  */
object AsOf {

  /** For each left row, attach `payload` from the latest right row with
    * `rightOrd <= leftOrd` in the same `key` group (inclusive, matching
    * DuckDB/standard ASOF semantics). Right rows should be unique per
    * (key, ord) — pre-aggregate if not, or ties resolve arbitrarily.
    */
  def asofBackward(left: DataFrame, right: DataFrame, key: Seq[String],
      leftOrd: String, rightOrd: String, payload: Seq[String]): DataFrame = {
    require(payload.nonEmpty, "asof join needs at least one payload column")
    val collisions = payload.toSet.intersect(left.columns.toSet)
    require(collisions.isEmpty,
      s"payload columns already exist on the left side: $collisions")
    val l2 = left
      .withColumn("__ord", col(leftOrd))
      .withColumn("__tag", lit(1))
    // payloads travel as ONE struct per right row: last() then picks a
    // whole row atomically (never mixes columns from different right
    // rows) and a null payload VALUE inside the latest row is
    // preserved — matching DuckDB/standard ASOF semantics.
    // Null-key right rows are dropped: SQL join equality never matches
    // NULL, but Window.partitionBy groups NULLs together — without the
    // filter a null-key left row would wrongly pick them up. Same for a
    // null ORDER value: `rightOrd <= leftOrd` is NULL-never-true in
    // standard ASOF, but asc nulls-first ordering would sort such rows
    // to the window start where every left row could inherit them.
    val r2 = right
      .filter((key.map(col(_).isNotNull) :+ col(rightOrd).isNotNull).reduce(_ && _))
      .select(
        key.map(col) ++ Seq(col(rightOrd).as("__ord"), lit(0).as("__tag"),
          struct(payload.map(col): _*).as("__p")): _*)
    val unioned = l2.unionByName(r2, allowMissingColumns = true)
    // right rows (__tag 0) sort before left rows at equal ord → a right
    // row AT the left timestamp is visible to it (inclusive bound)
    val w = Window.partitionBy(key.map(col): _*)
      .orderBy(col("__ord"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = unioned
      .withColumn("__last", last(col("__p"), ignoreNulls = true).over(w))
    val result = filled.filter(col("__tag") === 1)
    val expanded = payload.foldLeft(result) { (df, p) =>
      df.withColumn(p, col("__last").getField(p))
    }
    expanded.drop("__p", "__last", "__ord", "__tag")
  }
}
