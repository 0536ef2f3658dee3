package graft.search

import java.text.Normalizer

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.nfkc
import graft.functions.VectorFunctions.cosineFast
import graft.ingest.HashEmbedder
import graft.operators.VectorSearch

/** The flagship vector-QA read path (SURVEY §3.1, ref
  * enhanced_internal_db_service.py:634-816) as one composable Spark
  * pipeline: fetch_k k-NN → IP score normalization → margin+floor cut
  * → strong-anchor filter (P9) → per-title cap + round-robin diversify
  * → marker assignment → marked-context assembly (A14).
  *
  * Scale: the k-NN is a pruned scan + TakeOrderedAndProject (top
  * fetch_k, merge on driver); everything after operates on ≤ fetch_k
  * rows. The index DataFrame is partitioned by save_name, so the
  * save-name filter is partition pruning, not a scan.
  */
object SearchPipeline {

  final case class Anchors(strong: Set[String], weak: Set[String])

  private val weakKo = Set("무엇", "무엇인가", "뭐야", "뭔가", "정의", "설명",
    "설명하라", "설명해", "역할", "개요", "특징", "장점", "한계", "의미",
    "소개", "예시", "예", "비교")
  private val weakEn = Set("what", "define", "definition", "explain", "role",
    "overview", "feature", "pros", "cons")
  private val wordRe = "[가-힣a-z0-9][가-힣a-z0-9\\-_/]+".r

  private def nfkcLower(s: String): String =
    Normalizer.normalize(s, Normalizer.Form.NFKC).toLowerCase

  /** Strong/weak anchor extraction from the query (ref :729-755):
    * NFKC-normalized ≥2-char tokens minus interrogative stop-terms,
    * plus the reference's domain synonym expansions. Driver-side pure
    * function — the query string is a scalar. */
  def anchorsFromQuery(q: String): Anchors = {
    val words = wordRe.findAllIn(q.toLowerCase).map(w => nfkcLower(w).trim)
      .filter(_.length >= 2).toSet
    var strong = words -- weakKo -- weakEn
    val weak = words & (weakKo ++ weakEn)
    val n = nfkcLower(q)
    if ("\\brag\\b".r.findFirstIn(n).isDefined)
      strong ++= Set("rag", "retrieval augmented generation", "리트리벌 증강 생성", "리트리벌")
    if (n.contains("faiss")) strong += "faiss"
    if (n.contains("self-attention") || n.contains("self attention"))
      strong ++= Set("self-attention", "self attention", "셀프어텐션", "셀프 어텐션", "자기주의", "자기-주의")
    if (n.contains("attention")) strong ++= Set("attention", "어텐션", "주의")
    Anchors(strong, weak)
  }

  /** P9 strong-anchor predicate: NFKC-lowered content (with the
    * "passage:" marker blanked) or title must contain ≥1 strong
    * anchor. Ref: :757-763.
    *
    * One UDF pass per row: ASCII text (the overwhelming case on this
    * corpus) takes a zero-allocation case-insensitive scan — NFKC is
    * the identity there and ASCII lowercasing is per-char, so the scan
    * equals the normalize→lower→contains composition exactly; anything
    * non-ASCII falls back to that literal composition. The earlier
    * column formulation rebuilt the document three times
    * (regexp_replace, nfkc, lower) per row — 12× DuckDB at the 100×
    * point (r6 audit). */
  def strongAnchorPredicate(content: Column, title: Column,
                            strong: Set[String]): Column =
    if (strong.isEmpty) lit(false)
    else {
      val anchors = strong.toSeq.sorted
      val u = udf((c: String, t: String) =>
        anchorHit(c, anchors, blankPassage = true) ||
          anchorHit(if (t == null) "" else t, anchors, blankPassage = false))
      u(content, title)
    }

  /** Does NFKC(lower(s)) (with "passage:" optionally blanked) contain
    * any anchor? Anchors are pre-lowered; see
    * [[strongAnchorPredicate]] for the fast-path argument. */
  private def anchorHit(s0: String, anchors: Seq[String],
                        blankPassage: Boolean): Boolean = {
    if (s0 == null) return false
    val s = if (blankPassage && s0.indexOf("passage:") >= 0)
      s0.replace("passage:", " ") else s0
    var ascii = true
    var i = 0
    while (ascii && i < s.length) { if (s.charAt(i) >= 0x80) ascii = false; i += 1 }
    if (ascii) {
      anchors.exists(a => asciiContainsIgnoreCase(s, a))
    } else {
      val n = Normalizer.normalize(s, Normalizer.Form.NFKC).toLowerCase
      anchors.exists(n.contains(_))
    }
  }

  /** Case-insensitive substring scan, valid when `s` is pure ASCII and
    * `needle` is pre-lowered ASCII. */
  private def asciiContainsIgnoreCase(s: String, needle: String): Boolean = {
    val n = needle.length
    if (n == 0) return true
    val last = s.length - n
    var i = 0
    while (i <= last) {
      var j = 0
      var ok = true
      while (ok && j < n) {
        var c = s.charAt(i + j)
        if (c >= 'A' && c <= 'Z') c = (c + 32).toChar
        if (c != needle.charAt(j)) ok = false else j += 1
      }
      if (ok) return true
      i += 1
    }
    false
  }

  /** Full retrieval: returns the kept (≤ topK) chunks with normalized
    * scores and S1.. markers, ordered as the reference's round-robin
    * emits them. Config defaults mirror backend_config.yaml
    * (margin 0.12, sim_floor 0.35, per_title_cap 3, fetch ×4). */
  def search(index: DataFrame, question: String, topK: Int = 5,
             margin: Double = 0.12, simFloor: Double = 0.35,
             perTitleCap: Int = 3, fetchMultiplier: Int = 4,
             dim: Int = HashEmbedder.DefaultDim): DataFrame = {
    val fetchK = math.max(topK * fetchMultiplier, topK + 5)
    val qvec = HashEmbedder.embed("query: " + question.trim, dim)
    val top = index
      .select(col("chunk_id"), col("doc_id"), col("title"), col("oo"),
        col("content"), col("metadata"),
        cosineFast(col("embedding"), lit(qvec)).as("score"))
      .orderBy(desc("score"), col("chunk_id"))
      .limit(fetchK)
    val normalized = VectorSearch.normalizeScoresIP(top)
    val cut = VectorSearch.marginFilter(normalized, margin, simFloor)
    val anchors = anchorsFromQuery(question)
    val anchored =
      if (anchors.strong.isEmpty) cut
      else cut.filter(strongAnchorPredicate(col("content"), col("title"), anchors.strong))
    val groupKey = lower(nfkc(coalesce(
      when(length(col("title")) > 0, col("title")), col("oo"), lit("unknown"))))
    val kept = VectorSearch.diversify(
      anchored.withColumn("_g", groupKey), col("_g"), col("chunk_id"),
      perTitleCap, topK).drop("_g")
    // markers come from the diversify rank itself — an explicit column,
    // deterministic on any partitioning (physical row ids are not)
    kept.withColumn("marker", concat(lit("S"), col("div_rank")))
      .drop("div_rank")
  }

  /** Marked-context assembly (ref :796-809): 900-char snippets inside
    * a total char budget, `《S{i}》 [id=..] [title=..] [OO=..]
    * score=…` headers. Driver-side fold over ≤ topK rows. */
  def markedContext(kept: Seq[(String, String, String, String, Double, String)],
                    maxContextChars: Int = 1800): String = {
    val buf = scala.collection.mutable.ArrayBuffer("<CONTEXT>")
    var total = 0
    kept.zipWithIndex.foreach { case ((_, id, title, oo, score, text), i) =>
      val remain = math.max(maxContextChars - total, 0)
      if (remain > 0) {
        val snippet = text.take(math.min(900, remain)) +
          (if (text.length > 900) "…" else "")
        total += snippet.length
        buf += f"《S${i + 1}》 [id=$id] [title=$title] [OO=$oo] score=$score%.4f%n$snippet%n"
      }
    }
    buf += "</CONTEXT>"
    buf.mkString("\n")
  }

  /** Answer post-processing as the reference applies it to generated
    * text (ref :835-850 → :852-909): Korean cleanup, then the
    * topic-prefix guarantee. The generation itself is an external
    * model behind this boundary. */
  def postprocessAnswer(answer: String, topic: String): String =
    graft.functions.TextFunctions.ensureTopicPrefix(
      graft.functions.TextFunctions.cleanKoreanOutput(answer), topic)

  /** Source manifest rows (ref :673-679). */
  def sources(kept: DataFrame): DataFrame =
    kept.select(col("marker"),
      element_at(col("metadata"), "id").as("id"),
      col("title"), col("oo"), round(col("score"), 4).as("score"))
}
