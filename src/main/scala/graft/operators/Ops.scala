package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** Shared join-shape decisions. */
object Ops {

  /** "Fits on every executor" budget — same order as Spark's
    * autoBroadcastJoinThreshold ceiling. */
  val DefaultBroadcastBudget: Long = 64L * 1024 * 1024

  /** Join `big` with `small` on `key` (equi, or `joinType` semi/anti),
    * broadcasting the small side iff its MEASURED size fits
    * `budgetBytes` — the vocabulary/cohort-table decision shared by
    * tfidfTop, unigramSurprisal, eventsRetention, dedupIncremental and
    * decontaminate. The small side is persisted through
    * [[graft.Caches]] and materialized, and the decision reads the
    * InMemoryRelation's ACTUAL cached byte size — not a per-call
    * bytes-per-row guess (the estimate that drifted from reality is
    * exactly the failure mode this helper exists to avoid). AQE does
    * not reliably convert these joins on its own — a 5k-row unigram
    * table was measured sort-merge-joining 160M token rows — and an
    * UNCONDITIONAL broadcast hint is the opposite failure (an unbounded
    * build side OOMs the driver at scale), so the operator decides from
    * the measurement and degrades to a shuffle join.
    *
    * RELEASE OBLIGATION: the persisted small side lives until
    * [[graft.Caches.release]] — a long-lived session interleaving many
    * corpora should release between pipelines (Verify/Bench/tools do;
    * library callers own the same contract). */
  def joinBroadcastIfFits(big: DataFrame, small: DataFrame, key: String,
                          budgetBytes: Long = DefaultBroadcastBudget,
                          joinType: String = "inner"): DataFrame = {
    val cached = graft.Caches.persist(small)
    cached.count() // materialize so the stats below are measured, not estimated
    // fresh Dataset over the same plan → its optimizer pass resolves the
    // now-populated cache, so stats are the InMemoryRelation's real size
    val bytes = cached.select("*").queryExecution.optimizedPlan.stats.sizeInBytes
    if (bytes < budgetBytes) big.join(broadcast(cached), Seq(key), joinType)
    else big.join(cached, Seq(key), joinType)
  }
}
