package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** Shared join-shape decisions. */
object Ops {

  /** Equi-join `big` with `small` on `key`, broadcasting the small side
    * iff its MEASURED row count fits a 64 MB hint budget — the
    * vocabulary/cohort-table decision shared by tfidfTop,
    * unigramSurprisal and eventsRetention. The small side is persisted
    * through [[graft.Caches]] first so the size probe doesn't
    * re-aggregate its lineage (and release stays scoped). AQE does not
    * reliably convert these joins on its own — the 5k-row unigram
    * table was measured sort-merge-joining 160M token rows — and an
    * UNCONDITIONAL broadcast hint is the opposite failure (an
    * unbounded build side OOMs the driver at scale), so the operator
    * decides from the actual count and degrades to a shuffle join. */
  def joinBroadcastIfFits(big: DataFrame, small: DataFrame, key: String,
                          bytesPerRow: Long): DataFrame = {
    val cached = graft.Caches.persist(small)
    if (cached.count() * bytesPerRow < 64L * 1024 * 1024)
      big.join(broadcast(cached), key)
    else big.join(cached, key)
  }
}
