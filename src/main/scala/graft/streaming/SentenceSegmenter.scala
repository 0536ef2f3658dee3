package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** ST2/ST3 — stateful incremental sentence segmentation over a token
  * stream (ref streaming_tts_service.py:25-69): per session, buffer
  * incoming chunks and emit a sentence whenever a terminal char
  * (`.!?。！？\n`) completes one; the unterminated remainder stays in
  * state. The partial-flush heuristic additionally surfaces a buffer
  * ending in `, ` / `; ` / `: ` / ` - ` or ≥20 trimmed chars.
  *
  * Scale design: state is keyed by session_id (one small string
  * buffer per key) via `flatMapGroupsWithState` — exactly the keyed
  * state + watermark shape the reference's single global buffer
  * cannot scale to. The pure core ([[feed]]) is shared by the
  * streaming op and the batch/test path.
  */
object SentenceSegmenter {

  final case class TokenChunk(session_id: String, seq: Long, chunk: String)
  final case class Sentence(session_id: String, idx: Int, sentence: String,
                            isFinal: Boolean, isPartial: Boolean = false)

  private val endings = "[.!?。！？\n]".toCharArray.mkString // membership test chars
  private def isEnding(c: Char): Boolean = ".!?。！？\n".indexOf(c) >= 0

  /** Pure incremental step: (buffer + chunk) → (complete sentences,
    * new buffer). Mirrors extract_complete_sentences exactly: scan for
    * the earliest terminal char, emit the trimmed prefix through it,
    * repeat; remainder (no terminal) is the new buffer. */
  def feed(buffer: String, chunk: String): (Seq[String], String) = {
    val text = buffer + chunk
    val out = Seq.newBuilder[String]
    var pos = 0
    var i = 0
    var found = true
    while (found) {
      found = false
      var j = pos
      while (j < text.length && !isEnding(text.charAt(j))) j += 1
      if (j < text.length) {
        val s = text.substring(pos, j + 1).trim
        if (s.nonEmpty) out += s
        pos = j + 1
        found = true
      }
      i += 1
    }
    (out.result(), text.substring(pos))
  }

  /** ST3 partial-flush heuristic (ref :56-69). */
  def shouldFlushPartial(partial: String): Boolean =
    Seq(", ", "; ", ": ", " - ").exists(partial.endsWith) ||
      partial.trim.length >= 20

  /** ST3 step: after a chunk's complete sentences, flush the buffer as
    * a partial when the heuristic fires (the reference then CLEARS the
    * buffer — ref :153-172). Returns (sentences, partialOpt, buffer). */
  def feedWithPartial(buffer: String, chunk: String): (Seq[String], Option[String], String) = {
    val (sentences, buf) = feed(buffer, chunk)
    if (buf.nonEmpty && shouldFlushPartial(buf)) (sentences, Some(buf.trim), "")
    else (sentences, None, buf)
  }

  /** Batch/test reference path: run the segmenter over an ordered
    * chunk sequence, returning every emitted sentence plus the final
    * remainder (isFinal = true) if non-empty. */
  def segmentAll(chunks: Seq[String]): Seq[String] = {
    val (sentences, rest) = chunks.foldLeft((Vector.empty[String], "")) {
      case ((acc, buf), c) =>
        val (emitted, nb) = feed(buf, c)
        (acc ++ emitted, nb)
    }
    if (rest.trim.nonEmpty) sentences :+ rest.trim else sentences
  }

  /** Default per-key buffer bound (chars). A session that never sends
    * a terminal char would otherwise grow its state without limit —
    * at 100 TB the state store is sized by (#live sessions ×
    * max buffer), and ONE adversarial session must not blow it. 8 KiB
    * is ~40× the longest sentence the reference's TTS path ever
    * buffers; an overflowing buffer force-flushes as a partial and
    * clears, so per-key state is O(maxBufferChars) always. */
  val DefaultMaxBufferChars = 8192

  /** The per-group state step, pure and unit-testable: given the
    * group's chunks (may be empty on a timeout wake-up), the prior
    * state and the timeout flag, returns (emitted sentences, next
    * state) where `None` means REMOVE the key's state.
    *  - timeout → flush the remainder as a final sentence, drop the
    *    key (abandoned-session GC: state for a dead session costs
    *    store memory forever otherwise);
    *  - buffer overflow (> maxBufferChars after a chunk) → emit the
    *    buffer as a partial and clear it — the state-size bound. */
  private[streaming] def handleGroup(sid: String, chunks: Seq[TokenChunk],
                                     prior: Option[(String, Int)],
                                     hasTimedOut: Boolean,
                                     emitPartials: Boolean,
                                     maxBufferChars: Int = DefaultMaxBufferChars)
      : (Seq[Sentence], Option[(String, Int)]) = {
    if (hasTimedOut) {
      val (buf, n) = prior.getOrElse(("", 0))
      val out = if (buf.trim.nonEmpty)
        Seq(Sentence(sid, n, buf.trim, isFinal = true)) else Seq.empty
      (out, None)
    } else {
      var (buf, n) = prior.getOrElse(("", 0))
      val out = Seq.newBuilder[Sentence]
      chunks.sortBy(_.seq).foreach { c =>
        if (emitPartials) {
          val (emitted, partial, nb) = feedWithPartial(buf, c.chunk)
          emitted.foreach { s => out += Sentence(sid, n, s, isFinal = false); n += 1 }
          partial.foreach { p =>
            out += Sentence(sid, n, p, isFinal = false, isPartial = true); n += 1
          }
          buf = nb
        } else {
          val (emitted, nb) = feed(buf, c.chunk)
          emitted.foreach { s => out += Sentence(sid, n, s, isFinal = false); n += 1 }
          buf = nb
        }
        if (buf.length > maxBufferChars) {
          // overflow force-flush: the state-size bound always clears
          // the buffer, but only emits a row when there is visible
          // text — a whitespace-only oversized buffer must not
          // produce an empty Sentence
          if (buf.trim.nonEmpty) {
            out += Sentence(sid, n, buf.trim, isFinal = false, isPartial = true)
            n += 1
          }
          buf = ""
        }
      }
      (out.result(), Some((buf, n)))
    }
  }

  /** Structured Streaming operator: per-session segmentation with
    * keyed state. Chunks within a micro-batch are applied in `seq`
    * order. With `timeout` set, a processing-time timeout flushes the
    * remainder as a final partial and DROPS the key's state — the
    * abandoned-session GC that bounds live state to
    * (#active sessions × maxBufferChars); the default NoTimeout keeps
    * state for the stream's lifetime (note: a timeout also makes the
    * query schedule wake-up batches, so `processAllAvailable` never
    * settles — the TTL spec drives batches explicitly).
    *
    * Contract note on `emitPartials = false`: the overflow
    * force-flush (buffer > maxBufferChars) still emits
    * `isPartial = true` rows — the state bound takes precedence over
    * the no-partials preference, because the only alternatives are
    * dropping text or unbounded state. Consumers that opt out of
    * partials must still tolerate (or filter) `isPartial` rows if
    * they feed sentence-free input longer than `maxBufferChars`. */
  def segmentStream(chunks: Dataset[TokenChunk],
                    timeout: Option[String] = None,
                    emitPartials: Boolean = false,
                    maxBufferChars: Int = DefaultMaxBufferChars): Dataset[Sentence] = {
    import chunks.sparkSession.implicits._
    val conf = if (timeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout
               else GroupStateTimeout.NoTimeout
    chunks.groupByKey(_.session_id)
      .flatMapGroupsWithState[(String, Int), Sentence](OutputMode.Append, conf) {
        case (sid, it, state: GroupState[(String, Int)]) =>
          val (out, next) = handleGroup(sid, it.toSeq, state.getOption,
            state.hasTimedOut, emitPartials, maxBufferChars)
          next match {
            case Some(st) =>
              state.update(st)
              timeout.foreach(state.setTimeoutDuration)
            case None => state.remove()
          }
          out.iterator
      }
  }
}
