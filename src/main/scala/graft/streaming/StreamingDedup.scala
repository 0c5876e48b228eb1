package graft.streaming

import graft.pipeline.Text
import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor,
  TTLConfig, TimeMode, TimerValues}

/** STREAMING MinHash-LSH near-dup detection — the streaming twin of
  * [[graft.pipeline.Dedup.incrementalLshCandidates]]: documents arrive on
  * a stream, and candidate pairs are emitted the moment the LATER member
  * of a pair arrives. The band-key → member-ids state inside
  * `transformWithState` IS the stored band-key index, maintained
  * incrementally by the state store instead of a nightly batch append.
  *
  * The piece that makes this streamable: a document's MinHash signature
  * is a PER-ROW expression — `min` over the doc's own shingle hashes
  * (duplicates can't change a min, so it equals the batch aggregate over
  * distinct shingles row for row) — so the stream needs NO shuffle or
  * aggregation before the single stateful operator. Signatures, band
  * keys, and the explode are all stateless column work; the only state
  * is one bounded id-list per occupied band bucket.
  *
  * Scale shape: state is partitioned by band key (high cardinality);
  * per-bucket membership is capped by `maxBucketSize` — the same skew
  * guard as the batch path (a hot bucket stops emitting and stops
  * growing instead of going O(n²); batch drops oversized buckets
  * whole, the stream stops at the cap — both bound cost, the stream
  * keeps the first `cap` members' recall). RocksDB state store required
  * (see [[StatefulOps.withRocksDbStateStore]]); state is disk-bounded.
  *
  * A pair sharing several band buckets is emitted once per shared
  * bucket — `.dropDuplicates` downstream (or a keyed sink) absorbs the
  * multiplicity, exactly like the batch path's `.distinct()`.
  */
object StreamingDedup {

  /** One (band bucket, document) membership row. */
  final case class BandRow(band_key: String, doc_id: Long)

  /** A near-dup candidate pair, `id1 < id2`. */
  final case class CandPair(id1: Long, id2: Long)

  /** Stateless per-row banding: `(band_key, doc_id)` rows for a streaming
    * (or batch) document relation. Signature hash `i` of a shingle is the
    * same 60-bit md5 long as [[graft.pipeline.Dedup.minhashSignatures]];
    * the shingle array and the signature array are let-bound
    * ([[Text.bindArray]]) so each evaluates once per row, not once per
    * hash / once per band. Documents too short to shingle (< n words)
    * carry no signal and are dropped, matching the batch explode.
    */
  def bandKeyRows(docs: DataFrame, idCol: String = "doc_id",
                  textCol: String = "text", n: Int = 3, numHashes: Int = 8,
                  rowsPerBand: Int = 2): Dataset[BandRow] = {
    import docs.sparkSession.implicits._
    bandKeyExplode(docs, idCol, textCol, n, numHashes, rowsPerBand, Nil)
      .as[BandRow]
  }

  /** The shared stateless banding projection behind [[bandKeyRows]] and
    * [[candidatesCdc]]: `(band_key, doc_id, extra...)` — `extra` columns
    * (e.g. a CDC delete flag) ride the same explode, never a join.
    */
  private def bandKeyExplode(docs: DataFrame, idCol: String, textCol: String,
                             n: Int, numHashes: Int, rowsPerBand: Int,
                             extra: Seq[org.apache.spark.sql.Column]): DataFrame = {
    require(rowsPerBand >= 1 && numHashes % rowsPerBand == 0,
      s"rowsPerBand=$rowsPerBand must divide numHashes=$numHashes")
    val numBands = numHashes / rowsPerBand
    val keys = Text.bindArray(Text.shingles(col(textCol), n)) { shs =>
      Text.bindArray(array((0 until numHashes).map(i =>
        array_min(transform(shs, s =>
          conv(substring(md5(concat(lit(s"$i|"), s)), 1, 15), 16, 10)
            .cast("long")))): _*)) { ms =>
        array((0 until numBands).map { b =>
          concat_ws("|",
            lit(b.toString) +: (0 until rowsPerBand).map(r =>
              element_at(ms, b * rowsPerBand + r + 1).cast("string")): _*)
        }: _*)
      }
    }
    docs.filter(size(Text.shingles(col(textCol), n)) > 0)
      .select(explode(keys).as("band_key") +:
        col(idCol).cast("long").as("doc_id") +: extra: _*)
  }

  /** Band-bucket membership state + pair emission. Re-delivered ids are
    * idempotent (already-member ids emit nothing and are not re-added).
    */
  private final class BandIndexProcessor(maxBucketSize: Int)
      extends StatefulProcessor[String, BandRow, CandPair] {
    @transient private var members: ListState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      members = getHandle.getListState[Long]("members",
        Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(key: String, rows: Iterator[BandRow],
                                 timerValues: TimerValues): Iterator[CandPair] = {
      val existing = scala.collection.mutable.ArrayBuffer.empty[Long]
      val it = members.get()
      while (it.hasNext) existing += it.next()
      val known = scala.collection.mutable.HashSet.from(existing)
      val added = scala.collection.mutable.ArrayBuffer.empty[Long]
      val out = scala.collection.mutable.ArrayBuffer.empty[CandPair]
      rows.foreach { r =>
        val id = r.doc_id
        if (!known.contains(id) && existing.size < maxBucketSize) {
          existing.foreach { e =>
            out += CandPair(math.min(e, id), math.max(e, id))
          }
          existing += id
          known += id
          added += id
        }
      }
      if (added.nonEmpty) members.appendList(added.toArray)
      out.iterator
    }
  }

  /** Candidate pairs over a streaming document relation: [[bandKeyRows]]
    * → group by band key → [[BandIndexProcessor]]. Append-mode changelog
    * of pairs, each emitted when its later member arrives.
    */
  def candidates(docs: DataFrame, idCol: String = "doc_id",
                 textCol: String = "text", n: Int = 3, numHashes: Int = 8,
                 rowsPerBand: Int = 2,
                 maxBucketSize: Int = 10000): Dataset[CandPair] = {
    import docs.sparkSession.implicits._
    bandKeyRows(docs, idCol, textCol, n, numHashes, rowsPerBand)
      .groupByKey(_.band_key)
      .transformWithState(new BandIndexProcessor(maxBucketSize),
        TimeMode.None(), OutputMode.Append())
  }

  /** One CDC operation against the live band index: an upsert or a
    * tombstone for `doc_id` in band bucket `band_key`, ordered within a
    * microbatch by `seq` (a caller-supplied source offset; 0 when the
    * caller has none).
    */
  final case class IndexOp(band_key: String, doc_id: Long, delete: Boolean,
                           seq: Long)

  /** [[BandIndexProcessor]] with DELETE support — the streaming twin of
    * [[graft.pipeline.Dedup.lshIndexAfterChanges]]: a tombstone removes
    * the id from its buckets, so the erased document stops influencing
    * every LATER candidate (the GDPR/takedown property the spec pins);
    * already-emitted pairs are history — an append changelog does not
    * retract, downstream consumers join candidates against the current
    * corpus exactly as the batch pipeline does. A delete also reopens
    * capped buckets (membership drops below the cap again). Deletes of
    * unknown ids are no-ops.
    *
    * WITHIN-BATCH ORDER is enforced, not assumed: `transformWithState`
    * gives no arrival-order guarantee for one key's rows inside a
    * microbatch (shuffle order — ADVICE r10 #1), so ops are sorted by
    * `(seq, adds-before-deletes, doc_id)` before applying. With a real
    * source offset in `seq`, that IS arrival order. Without one (all
    * seq equal), the tie rule puts every delete after every add, so a
    * same-batch add+tombstone of one doc deterministically resolves to
    * ERASED — the conservative direction: deletes-first would let an
    * add re-insert a doc whose tombstone arrived later in the same
    * batch. The sort buffers one (band, batch) op group — bounded by
    * the microbatch, never the index.
    */
  private final class BandIndexCdcProcessor(maxBucketSize: Int)
      extends StatefulProcessor[String, IndexOp, CandPair] {
    @transient private var members: ListState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      members = getHandle.getListState[Long]("members",
        Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(key: String, rows: Iterator[IndexOp],
                                 timerValues: TimerValues): Iterator[CandPair] = {
      val existing = scala.collection.mutable.ArrayBuffer.empty[Long]
      val it = members.get()
      while (it.hasNext) existing += it.next()
      val known = scala.collection.mutable.HashSet.from(existing)
      val out = scala.collection.mutable.ArrayBuffer.empty[CandPair]
      var mutated = false
      val ordered = rows.toArray.sortBy(op =>
        (op.seq, if (op.delete) 1 else 0, op.doc_id))
      ordered.foreach { op =>
        if (op.delete) {
          if (known.remove(op.doc_id)) {
            val i = existing.indexOf(op.doc_id)
            existing.remove(i)
            mutated = true
          }
        } else if (!known.contains(op.doc_id) && existing.size < maxBucketSize) {
          existing.foreach { e =>
            out += CandPair(math.min(e, op.doc_id), math.max(e, op.doc_id))
          }
          existing += op.doc_id
          known += op.doc_id
          mutated = true
        }
      }
      if (mutated) {
        if (existing.isEmpty) members.clear()
        else members.put(existing.toArray)
      }
      out.iterator
    }
  }

  /** CDC candidate stream: documents arrive as upserts OR tombstones
    * (`deleteCol` boolean; a tombstone carries the document's text — the
    * CDC before-image — so its band keys are recomputed statelessly,
    * exactly like an add: an id-only delete would need a reverse
    * doc→buckets index, a second stateful operator this design avoids).
    * Output is the same append-mode candidate changelog as
    * [[candidates]]; erased documents never appear in pairs emitted
    * after their tombstone.
    *
    * `seqCol` (a monotonically increasing source offset — Kafka offset,
    * CDC LSN) fixes the WITHIN-batch order of ops: without it, rows of
    * one band key arrive in shuffle order and an add + tombstone of the
    * same doc in one microbatch would resolve non-deterministically
    * (ADVICE r10 #1) — the processor then applies the deterministic
    * adds-before-deletes tie rule instead (same-batch add+delete of a
    * doc ⇒ erased). Pass the offset whenever the source has one.
    */
  def candidatesCdc(ops: DataFrame, idCol: String = "doc_id",
                    textCol: String = "text", deleteCol: String = "is_delete",
                    n: Int = 3, numHashes: Int = 8, rowsPerBand: Int = 2,
                    maxBucketSize: Int = 10000,
                    seqCol: Option[String] = None): Dataset[CandPair] = {
    // the flag (and offset) ride the SAME stateless projection as the
    // band keys — a join back onto the op stream would be a
    // stream-stream join (watermark machinery for a per-row attribute)
    import ops.sparkSession.implicits._
    val seq = seqCol.map(c => col(c).cast("long")).getOrElse(lit(0L)).as("seq")
    bandKeyExplode(ops, idCol, textCol, n, numHashes, rowsPerBand,
        extra = Seq(col(deleteCol).cast("boolean").as("delete"), seq))
      .as[IndexOp]
      .groupByKey(_.band_key)
      .transformWithState(new BandIndexCdcProcessor(maxBucketSize),
        TimeMode.None(), OutputMode.Append())
  }
}
