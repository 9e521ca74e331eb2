package graft.expr

import org.apache.spark.unsafe.types.UTF8String

/** The ONE Spark-exact tokenization every fused text kernel shares:
  * `split(lower(trim(text)), "\\s+")` — UTF8String lower (locale-
  * immune simple case map), ASCII-space-only trim, Java-regex split
  * with limit −1 (empty edge tokens KEPT; a blank string is [""]).
  * Previously copy-pasted across MinHashSig / SimHashFp /
  * HashedNgramFeatures / GopherStats / RepetitionStats; the
  * bit-equality-with-Spark contract their property pins rely on now
  * has a single definition site.
  */
private[expr] object Tok {
  def sparkTokens(v: UTF8String): Array[String] =
    v.toLowerCase.trim().toString.split("\\s+", -1)
}
