package graft

/** Shared naive BPE reference for BpeSpec and PropertySpec — a
  * separator-string representation deliberately unlike the engine's
  * token-array kernel (merging is a split/scan/rejoin over a 
  * marker, recounted from scratch each step). Code-POINT initial
  * split (via codePoints, a different mechanism than the engine's
  * charCount walk) so supplementary-char parity is cross-checked too.
  */
object NaiveBpe {
  val SEP = ''

  private def cpSplit(w: String): Seq[String] =
    w.codePoints().toArray.toSeq.map(cp => new String(Character.toChars(cp)))

  /** UTF-8 binary order, independently derived (byte-array compare). */
  private def utf8Lt(a: String, b: String): Boolean = {
    val x = a.getBytes("UTF-8"); val y = b.getBytes("UTF-8")
    var i = 0
    while (i < x.length && i < y.length) {
      val c = (x(i) & 0xFF) - (y(i) & 0xFF)
      if (c != 0) return c < 0
      i += 1
    }
    x.length < y.length
  }

  def applyOne(s: String, l: String, r: String): String = {
    val toks = s.split(SEP)
    val b = Seq.newBuilder[String]
    var i = 0
    while (i < toks.length) {
      if (i + 1 < toks.length && toks(i) == l && toks(i + 1) == r) {
        b += l + r; i += 2
      } else { b += toks(i); i += 1 }
    }
    b.result().mkString(SEP.toString)
  }

  def train(hist: Seq[(String, Long)], n: Int): Seq[(String, String, Long)] = {
    var state = hist.map { case (w, c) => (cpSplit(w).mkString(SEP.toString), c) }
    val out = Seq.newBuilder[(String, String, Long)]
    var k = 0
    var stop = false
    while (k < n && !stop) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      state.foreach { case (s, c) =>
        s.split(SEP).sliding(2).foreach {
          case Array(a, b) => counts((a, b)) = counts.getOrElse((a, b), 0L) + c
          case _           =>
        }
      }
      if (counts.isEmpty) stop = true
      else {
        var best: ((String, String), Long) = null
        counts.foreach { case e @ ((l, r), c) =>
          if (best == null) best = e
          else {
            val ((bl, br), bc) = best
            if (c > bc || (c == bc &&
                (utf8Lt(l, bl) || (l == bl && utf8Lt(r, br))))) best = e
          }
        }
        val ((l, r), c) = best
        out += ((l, r, c))
        state = state.map { case (s, c2) => (applyOne(s, l, r), c2) }
        k += 1
      }
    }
    out.result()
  }

  def tokenize(w: String, merges: Seq[(String, String)]): Seq[String] = {
    var s = cpSplit(w).mkString(SEP.toString)
    merges.foreach { case (l, r) => s = applyOne(s, l, r) }
    if (s.isEmpty) Seq.empty else s.split(SEP).toSeq
  }
}
