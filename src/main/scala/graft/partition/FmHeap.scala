package graft.partition

/** Primitive max-heap over (priority: Long, node: Int): highest priority first,
  * ties to the smaller node id — the exact total order of the
  * `mutable.PriorityQueue[(Long, Int)](Ordering.by(x => (x._1, -x._2)))` it
  * replaces in the driver FM hot loops (optimization r06). The order is TOTAL, so
  * the heap implementation cannot change which element dequeues next, only how
  * fast: parallel primitive arrays remove the per-entry tuple allocation, Long
  * boxing and megamorphic Ordering dispatch of the Scala collection.
  */
private[partition] final class FmHeap(initialCapacity: Int = 64) {
  private var pri = new Array[Long](math.max(4, initialCapacity))
  private var nd = new Array[Int](math.max(4, initialCapacity))
  private var n = 0

  def size: Int = n
  def isEmpty: Boolean = n == 0
  def nonEmpty: Boolean = n != 0
  def headPri: Long = pri(0)
  def headNode: Int = nd(0)

  /** true when (p1, u1) ranks strictly higher than (p2, u2). */
  @inline private def higher(p1: Long, u1: Int, p2: Long, u2: Int): Boolean =
    p1 > p2 || (p1 == p2 && u1 < u2)

  def enqueue(p: Long, u: Int): Unit = {
    if (n == pri.length) {
      pri = java.util.Arrays.copyOf(pri, n * 2)
      nd = java.util.Arrays.copyOf(nd, n * 2)
    }
    var i = n
    n += 1
    while (i > 0 && higher(p, u, pri((i - 1) / 2), nd((i - 1) / 2))) {
      pri(i) = pri((i - 1) / 2); nd(i) = nd((i - 1) / 2)
      i = (i - 1) / 2
    }
    pri(i) = p; nd(i) = u
  }

  /** Remove the head (callers read headPri/headNode first). */
  def dequeue(): Unit = {
    n -= 1
    val p = pri(n); val u = nd(n)
    if (n == 0) return
    var i = 0
    var c = 1
    while (c < n) {
      if (c + 1 < n && higher(pri(c + 1), nd(c + 1), pri(c), nd(c))) c += 1
      if (higher(pri(c), nd(c), p, u)) {
        pri(i) = pri(c); nd(i) = nd(c)
        i = c
        c = 2 * i + 1
      } else c = n
    }
    pri(i) = p; nd(i) = u
  }
}
