package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Token-budget ADMISSION — the streaming twin of
  * `Documents.tokenBudgetMix` (`Documents.scala`, the batch operator
  * behind `corpus_token_budget`): a training mix is specified in
  * TOKENS per source, and an ingest stream must stop admitting a
  * source once its budget is spent — WITHOUT seeing the whole corpus
  * first.
  *
  * Semantics mirror the batch twin exactly: documents are admitted as
  * a strict PREFIX of the per-source order — a document is kept iff
  * the source's running token total, including this document, fits
  * the budget; the first overflow CLOSES the source permanently (the
  * batch twin's `cum_tokens <= budget` filter over a monotone running
  * sum is the same close-on-overflow prefix, since every document has
  * at least one token). A doc is dropped, never split — packing, not
  * admission, owns splitting.
  *
  * Order contract (same as the decayed-scores twin): within a
  * micro-batch, rows are processed in the batch twin's content-keyed
  * (md5(text), doc_id) order; across micro-batches, arrival order IS
  * the order — equality with the batch twin holds when the stream
  * replays in content-keyed order, and under arbitrary arrival the
  * operator still enforces the budget invariant (Σ admitted tokens ≤
  * budget per source), which is the property production cares about.
  *
  * Scale shape: state per source is TWO numbers (running total +
  * closed flag) — thousands of sources cost kilobytes of state; one
  * shuffle keyed by source, exactly the batch twin's partitioning.
  * NoTimeout is deliberate: a budget is a permanent property of the
  * mix, not a window — state must survive arbitrarily long gaps
  * between a source's batches. */
object BudgetIngest {

  case class Doc(doc_id: Long, source: String, text: String)
  case class Admitted(doc_id: Long, source: String,
                      n_tokens: Long, cum_tokens: Long)
  case class BudgetState(cum: Long, closed: Boolean)

  /** Whitespace token count, matching the batch twin's
    * `size(split(text, " "))` — Spark SQL split keeps trailing empty
    * strings (limit −1), unlike Java's default `String.split`. */
  private def nTokens(text: String): Long = text.split(" ", -1).length.toLong

  private def md5hex(s: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  def admitWithBudget(docs: Dataset[Doc], srcBudget: Long): Dataset[Admitted] = {
    import docs.sparkSession.implicits._
    docs.groupByKey(_.source)
      .flatMapGroupsWithState[BudgetState, Admitted](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (source: String, batch: Iterator[Doc], state: GroupState[BudgetState]) =>
          var st = state.getOption.getOrElse(BudgetState(0L, closed = false))
          // the batch twin's content-keyed order within the micro-batch
          val ordered = batch.toSeq.sortBy(d => (md5hex(d.text), d.doc_id))
          val out = ordered.flatMap { d =>
            if (st.closed) None
            else {
              val n = nTokens(d.text)
              if (st.cum + n <= srcBudget) {
                st = BudgetState(st.cum + n, closed = false)
                Some(Admitted(d.doc_id, source, n, st.cum))
              } else {
                // first overflow closes the source: the batch twin's
                // prefix filter admits nothing after the running sum
                // crosses the budget, and neither do we
                st = st.copy(closed = true)
                None
              }
            }
          }
          state.update(st)
          out.iterator
      }
  }
}
