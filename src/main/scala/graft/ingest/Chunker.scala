package graft.ingest

import scala.collection.mutable.ArrayBuffer

/** Recursive character chunker with separator priority, matching the
  * reference's splitter semantics (RecursiveCharacterTextSplitter with
  * custom separators, chunk_size 700 / overlap 120 — ref
  * enhanced_internal_db_service.py:591-600, config
  * config/backend_config.yaml:56-63):
  *
  *  - pick the first separator present in the text; split keeping the
  *    separator attached to the start of the following piece;
  *  - pieces shorter than `chunkSize` are greedily merged back together
  *    (with sliding-back overlap of up to `overlap` chars); longer
  *    pieces recurse on the remaining separators;
  *  - an unbreakable run longer than `chunkSize` (no separator left)
  *    is emitted oversized rather than cut mid-rune.
  *
  * Pure JVM function — exposed to DataFrames via [[Ingest.chunkUdf]].
  * Parity with the reference is asserted on fixture texts (SURVEY
  * §7.4), not byte-for-byte on arbitrary input.
  */
object Chunker {

  /** Reference separator priority (enhanced_internal_db_service.py:596). */
  val defaultSeparators: Seq[String] =
    Seq("\n\n", "\n", "。", ". ", ".", "? ", "?", "! ", "!", " ")

  def split(text: String, chunkSize: Int, overlap: Int,
            separators: Seq[String] = defaultSeparators): Seq[String] = {
    require(chunkSize > 0 && overlap >= 0 && overlap < chunkSize)
    if (text == null || text.isEmpty) Seq.empty
    else splitRec(text, separators, chunkSize, overlap).filter(_.nonEmpty)
  }

  /** Split `text` on `sep`, attaching the separator to the start of
    * the following piece ("\na\nb" → ["", "\na", "\nb"] minus empties). */
  private def splitKeeping(text: String, sep: String): Seq[String] = {
    val out = ArrayBuffer.empty[String]
    var start = 0
    var idx = text.indexOf(sep, sep.length.max(1)) // never split at pos 0
    while (idx >= 0) {
      out += text.substring(start, idx)
      start = idx
      idx = text.indexOf(sep, idx + sep.length)
    }
    out += text.substring(start)
    out.toSeq.filter(_.nonEmpty)
  }

  private def splitRec(text: String, seps: Seq[String], chunkSize: Int,
                       overlap: Int): Seq[String] = {
    if (text.length <= chunkSize) return Seq(text.trim)
    val sepIdx = seps.indexWhere(s => text.contains(s))
    if (sepIdx < 0) return Seq(text.trim) // unbreakable: emit oversized
    val sep = seps(sepIdx)
    val rest = seps.drop(sepIdx + 1)
    val pieces = splitKeeping(text, sep)

    val chunks = ArrayBuffer.empty[String]
    val goods = ArrayBuffer.empty[String]
    def flushGoods(): Unit = if (goods.nonEmpty) {
      chunks ++= mergePieces(goods.toSeq, chunkSize, overlap)
      goods.clear()
    }
    pieces.foreach { p =>
      if (p.length < chunkSize) goods += p
      else { flushGoods(); chunks ++= splitRec(p, rest, chunkSize, overlap) }
    }
    flushGoods()
    chunks.toSeq
  }

  /** Greedy merge of consecutive small pieces into ≤chunkSize chunks,
    * sliding back to keep ≤overlap trailing chars between chunks. */
  private def mergePieces(pieces: Seq[String], chunkSize: Int,
                          overlap: Int): Seq[String] = {
    val docs = ArrayBuffer.empty[String]
    val cur = ArrayBuffer.empty[String]
    var total = 0
    pieces.foreach { p =>
      if (total + p.length > chunkSize && cur.nonEmpty) {
        val doc = cur.mkString.trim
        if (doc.nonEmpty) docs += doc
        while (total > overlap || (total + p.length > chunkSize && total > 0)) {
          total -= cur.head.length
          cur.remove(0)
        }
      }
      cur += p
      total += p.length
    }
    val doc = cur.mkString.trim
    if (doc.nonEmpty) docs += doc
    docs.toSeq
  }
}
