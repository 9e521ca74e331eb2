package graft.expr

/** Thread-local SHA-256 instance for per-row hot paths. A
  * `MessageDigest.getInstance` is a JCA provider lookup plus an
  * allocation — fine per partition, wasteful per ROW of a 100 TB scan
  * (the MinHash kernel and the multimodal feature UDF both hash every
  * row). `MessageDigest` is stateful and not thread-safe, so the memo
  * is per thread; `reset()` before handing it out makes each use
  * independent. */
private[graft] object Sha {
  private val tl = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("SHA-256")
  }

  /** A reset, ready-to-use digest owned by the calling thread. */
  def sha256(): java.security.MessageDigest = {
    val d = tl.get()
    d.reset()
    d
  }
}
