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

  /** A reset, ready-to-use digest owned by the calling thread.
    *
    * CONTRACT — the instance is SHARED per thread, not per call site:
    * complete each `update()`…`digest()` sequence before any other
    * code on this thread may call `sha256()` again. Holding the
    * returned instance across another `sha256()` call interleaves two
    * digests on one object and fails SILENTLY (both hashes wrong, no
    * error). If a computation must hold a digest across foreign
    * calls, allocate its own via `MessageDigest.getInstance`. */
  def sha256(): java.security.MessageDigest = {
    val d = tl.get()
    d.reset()
    d
  }
}
