package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Incremental shard-manifest maintenance — the streaming twin of
  * `Documents.shardManifest` (the batch operator behind
  * `corpus_shard_manifest`): a corpus release's integrity manifest
  * (per-shard doc count, token count, content checksum) kept CURRENT
  * as documents arrive, instead of re-sweeping the corpus per release.
  *
  * The batch twin's checksum is a bit_xor of each doc's 60-bit
  * md5(text) prefix — xor commutes and associates, and count/sum are
  * plain monoid merges, so the standing manifest is batch-equivalent
  * under ARBITRARY arrival order and ANY micro-batch slicing: after
  * the stream has seen exactly the corpus, the manifest IS
  * `shardManifest(corpus)`, row for row. That is a strictly stronger
  * contract than the ordered-replay twins (BudgetIngest, decayed
  * scores) — no order clause needed, which is exactly why the xor
  * checksum was chosen batch-side.
  *
  * Hash parity with the batch twin, column for column:
  * shard routing = first 15 hex chars of md5(doc_id as string) parsed
  * base-16 mod nShards (`conv(substring(md5(..), 1, 15), 16, 10)`);
  * content hash = same 15-hex-prefix recipe over the text; token
  * count = `size(split(text, " "))` (split keeps trailing empties).
  *
  * Scale shape: state per shard is THREE longs — a 16-shard manifest
  * costs 384 bytes of state at any corpus size; one shuffle keyed by
  * shard_id, map-side pre-aggregation of each micro-batch done by the
  * per-group fold. NoTimeout: a manifest is a permanent release
  * artifact, not a window. */
object ManifestIngest {

  case class Doc(doc_id: Long, text: String)
  case class Manifest(shard_id: Long, n_docs: Long, n_tokens: Long,
                      checksum: Long)
  case class ManifestState(nDocs: Long, nTokens: Long, checksum: Long)

  private def md5hex(s: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  /** 60-bit md5 prefix, the batch twin's
    * `conv(substring(md5(x), 1, 15), 16, 10)::long`. */
  private def h60(s: String): Long =
    java.lang.Long.parseLong(md5hex(s).substring(0, 15), 16)

  private def nTokens(text: String): Long = text.split(" ", -1).length.toLong

  def shardOf(docId: Long, nShards: Int): Long = h60(docId.toString) % nShards

  /** One manifest row per shard per micro-batch that touched it, each
    * reflecting ALL documents seen so far (Update output: the memory
    * sink / downstream store keeps the latest row per shard). */
  def maintainManifest(docs: Dataset[Doc], nShards: Int = 16): Dataset[Manifest] = {
    import docs.sparkSession.implicits._
    docs.groupByKey(d => shardOf(d.doc_id, nShards))
      .mapGroupsWithState[ManifestState, Manifest](GroupStateTimeout.NoTimeout()) {
        (shard: Long, batch: Iterator[Doc], state: GroupState[ManifestState]) =>
          var st = state.getOption.getOrElse(ManifestState(0L, 0L, 0L))
          batch.foreach { d =>
            st = ManifestState(st.nDocs + 1L, st.nTokens + nTokens(d.text),
              st.checksum ^ h60(d.text))
          }
          state.update(st)
          Manifest(shard, st.nDocs, st.nTokens, st.checksum)
      }
  }
}
