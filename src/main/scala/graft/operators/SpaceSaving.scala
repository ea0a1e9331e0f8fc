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
  * key of frequency > 1/cap while staying O(partitions · cap) — never the
  * full key dictionary, which for a billion-key column is the unbounded
  * thing a sketch path must not collect.
  *
  * PRECONDITION for exact top-k recovery: the k-th most frequent key must
  * have frequency > 1/cap. With more than cap near-uniform keys the
  * true top-k tail can fall below 1/cap and be evicted in EVERY
  * partition, silently dropping true members from the candidate set.
  * Size `cap` from the expected skew (callers that want top-k under an
  * assumed Zipf-ish law should pass cap = headroom·k, not a constant):
  * under Zipf(s=1) over V keys, f_k ≈ 1/(k·ln V), so cap ≳ k·ln V
  * suffices — cap = 50·k covers V up to ~5e21. The summary is heap-free
  * because cap stays small; eviction is O(cap) per miss.
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
