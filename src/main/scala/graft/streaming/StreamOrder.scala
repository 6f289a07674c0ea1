package graft.streaming

/** The (ms, event_id) total-order merge shared by the buffered-state
  * streaming operators ([[StreamTwa]] / [[StreamIslands]] /
  * [[StreamPaths]]): linear merge of two runs sorted by (_1, _2). ONE
  * comparator spelling — the deterministic total order the batch/stream
  * parity proofs depend on cannot de-synchronize across operators
  * (code-review r11: three hand-maintained copies had identical
  * tie-break-sensitive bodies).
  */
private[streaming] object StreamOrder {
  def merge[A](a: IndexedSeq[(Long, Long, A)],
      b: IndexedSeq[(Long, Long, A)]): IndexedSeq[(Long, Long, A)] = {
    val out = Vector.newBuilder[(Long, Long, A)]
    out.sizeHint(a.size + b.size)
    var i = 0; var j = 0
    while (i < a.size && j < b.size) {
      val x = a(i); val y = b(j)
      if (x._1 < y._1 || (x._1 == y._1 && x._2 <= y._2)) { out += x; i += 1 }
      else { out += y; j += 1 }
    }
    while (i < a.size) { out += a(i); i += 1 }
    while (j < b.size) { out += b(j); j += 1 }
    out.result()
  }

  /** The (ms, event_id, ROLE) three-key variant [[StreamTwaSharded]]'s
    * boundary stitch needs: a single-observation hour emits the same
    * (ms, event_id) under both boundary roles, and the f,l alternation
    * depends on the role ordering that tie. Kept HERE, not inline — the
    * comparator-drift hazard this object exists for applies to every
    * copy, however many keys it compares. */
  def merge3[A](a: IndexedSeq[(Long, Long, Long, A)],
      b: IndexedSeq[(Long, Long, Long, A)]): IndexedSeq[(Long, Long, Long, A)] = {
    val out = Vector.newBuilder[(Long, Long, Long, A)]
    out.sizeHint(a.size + b.size)
    var i = 0; var j = 0
    while (i < a.size && j < b.size) {
      val x = a(i); val y = b(j)
      val le = x._1 < y._1 || (x._1 == y._1 &&
        (x._2 < y._2 || (x._2 == y._2 && x._3 <= y._3)))
      if (le) { out += x; i += 1 } else { out += y; j += 1 }
    }
    while (i < a.size) { out += a(i); i += 1 }
    while (j < b.size) { out += b(j); j += 1 }
    out.result()
  }
}
