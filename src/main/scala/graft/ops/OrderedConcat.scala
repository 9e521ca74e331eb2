package graft.ops

import scala.collection.mutable.ArrayBuffer
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** A1 as a typed `Aggregator` (SURVEY §2.11): order-preserving concat
  * keyed by an explicit order column. This is the promotion path from
  * the `sort_array ∘ collect_list` composite used by the oracle
  * queries — same semantics, but the buffer is a primitive pair list
  * merged per-partition (map-side partial aggregation), so very large
  * groups avoid building Catalyst array structs before sorting.
  *
  * Usage: `functions.udaf(new OrderedConcat(" "))` applied to
  * `(order, text)` columns.
  */
final case class OrderedText(o: Long, t: String)

final class OrderedConcat(sep: String)
    extends Aggregator[OrderedText, ArrayBuffer[(Long, String)], String] {

  override def zero: ArrayBuffer[(Long, String)] = ArrayBuffer.empty

  override def reduce(b: ArrayBuffer[(Long, String)], a: OrderedText)
      : ArrayBuffer[(Long, String)] = {
    if (a.t != null) b += ((a.o, a.t))
    b
  }

  override def merge(b1: ArrayBuffer[(Long, String)],
      b2: ArrayBuffer[(Long, String)]): ArrayBuffer[(Long, String)] =
    b1 ++= b2

  override def finish(b: ArrayBuffer[(Long, String)]): String = {
    // tie-break by text: buffer order is partition-merge order (non-
    // deterministic), and sort_array(struct(o,t)) — the composite this
    // must equal — breaks order ties by the text field. Catalyst
    // compares strings as UTF8String (UTF-8 binary order), which
    // diverges from Java's UTF-16 code-unit order for supplementary
    // characters — so ties compare UTF-8 bytes, not String.compareTo.
    // one UTF8String conversion per element (not per comparison)
    val keyed = b.map(x =>
      (x._1, org.apache.spark.unsafe.types.UTF8String.fromString(x._2), x._2))
    val sorted = keyed.sortWith { (x, y) =>
      if (x._1 != y._1) x._1 < y._1 else x._2.compareTo(y._2) < 0
    }
    val sb = new StringBuilder
    var i = 0
    while (i < sorted.length) {
      if (i > 0) sb.append(sep)
      sb.append(sorted(i)._3)
      i += 1
    }
    sb.toString
  }

  override def bufferEncoder: Encoder[ArrayBuffer[(Long, String)]] =
    Encoders.kryo[ArrayBuffer[(Long, String)]]

  override def outputEncoder: Encoder[String] = Encoders.STRING
}
