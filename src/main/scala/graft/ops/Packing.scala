package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Sequence packing for LLM training: assign documents to fixed
  * token-budget packs by contiguous order (the concat-and-chunk
  * construction — documents are laid end to end in a deterministic
  * global order and cut every `budget` tokens; a document belongs to
  * the pack where its first token lands).
  *
  * The naive formulation is `SUM(tokens) OVER (ORDER BY …)` with no
  * partition key — a single-task global window, THE scale trap
  * (SURVEY §7.5.1). The scalable construction is a two-phase
  * distributed prefix sum over range-partitioned data: per-partition
  * token totals (numPartitions longs) come to the driver, their
  * running sum becomes each partition's offset, and a second pass adds
  * local prefix + offset. Both passes reuse the same range-partition
  * shuffle (two jobs over one RDD lineage), like GlobalOrder.
  */
object Packing {

  /** Append `pack_id` (0-based) and the exclusive running token count
    * `prefix_tokens` by `orderKeys`. `tokens` must be a non-negative
    * integral column. Oversized documents (tokens > budget) are
    * assigned to the pack where they start — splitting them is a
    * downstream tokenizer concern. */
  def packByTokenBudget(df: DataFrame, orderKeys: Seq[Column],
      tokens: Column, budget: Long): DataFrame = {
    require(budget > 0, "token budget must be positive")
    val spark = df.sparkSession
    val withTok = df.withColumn("__tok", tokens.cast(LongType))
    val parted = withTok.repartitionByRange(orderKeys: _*)
      .sortWithinPartitions(orderKeys: _*)
    val tokIdx = parted.schema.fieldIndex("__tok")
    val rows = parted.rdd
    // phase 1: per-partition totals (bounded: one long per partition)
    val partSums = rows.mapPartitionsWithIndex { (i, it) =>
      var s = 0L
      it.foreach { r =>
        require(!r.isNullAt(tokIdx),
          "packByTokenBudget: null token count (null text upstream?) — " +
            "fill or filter before packing")
        val t = r.getLong(tokIdx)
        require(t >= 0, s"packByTokenBudget: negative token count $t")
        s += t
      }
      Iterator((i, s))
    }.collect().sortBy(_._1).map(_._2)
    val offsets = partSums.scanLeft(0L)(_ + _)
    // phase 2: local prefix + partition offset → global exclusive prefix
    val schema = parted.schema
      .add("prefix_tokens", LongType, nullable = false)
      .add("pack_id", LongType, nullable = false)
    val packed = rows.mapPartitionsWithIndex { (i, it) =>
      var cum = offsets(i)
      it.map { r =>
        val pre = cum
        cum += r.getLong(tokIdx)
        Row.fromSeq(r.toSeq :+ pre :+ (pre / budget))
      }
    }
    spark.createDataFrame(packed, schema).drop("__tok")
  }
}
