package graft.operators

/** Per-partition heavy-hitter candidate generation (Metwally et al.'s
  * SpaceSaving, the stream-summary variant): a fixed-capacity counter map
  * — on overflow the minimum-count entry is evicted and the new key
  * inherits its count + 1.
  *
  * Guarantee used by ap_topk: within a partition of n_p rows every key
  * whose true count exceeds n_p/cap survives in the summary; a key with
  * GLOBAL count > N/cap therefore exceeds n_p/cap in at least one
  * partition (pigeonhole over Σ n_p = N) and appears in that partition's
  * candidate set. So the union of per-partition candidates contains every
  * ≥ 1/cap-frequency heavy hitter while staying O(partitions · cap) —
  * never the full key dictionary, which for a billion-key column is the
  * unbounded thing a sketch path must not collect.
  */
object SpaceSaving extends Serializable {
  def candidates(iter: Iterator[String], cap: Int): Iterator[String] = {
    val counts = scala.collection.mutable.HashMap[String, Long]()
    iter.foreach { k =>
      counts.get(k) match {
        case Some(c) => counts(k) = c + 1L
        case None =>
          if (counts.size < cap) counts(k) = 1L
          else {
            // O(cap) eviction per miss; cap is small (64) by construction
            val (minK, minC) = counts.minBy(_._2)
            counts.remove(minK)
            counts(k) = minC + 1L
          }
      }
    }
    counts.keysIterator
  }
}
