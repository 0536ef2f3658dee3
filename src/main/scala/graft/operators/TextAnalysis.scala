package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Text-analysis operators for a training-data pipeline (north-star
  * requirement): language-ID heuristic, quality scoring, token stats,
  * fingerprinting. All row-local scalars — linear scale-out, no
  * shuffles beyond the caller's aggregations. */
object TextAnalysis {

  /** Per-language stopword lists for the n-gram/stopword langid
    * heuristic (the 5 langs present in the testdata corpus). */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "is", "a", "in", "that"),
    "fr" -> Seq("le", "la", "les", "et", "de", "un", "une", "est"),
    "es" -> Seq("el", "la", "los", "y", "de", "que", "es", "una"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "nicht", "mit"),
    "zh" -> Seq("的", "是", "了", "在", "和", "有", "我", "不"))

  /** Count of whole-word stopword hits (incl. repeats) for one
    * language. r19: a codegen in-place byte scan
    * ([[graft.plans.TextScan.stopwordHits]]) — the r18 UDF form paid a
    * full UTF8String→String decode + toLowerCase copy + split array
    * per row, which WAS lang_stopwords' 6.2×/4.8 s wall at the 17 GB
    * point. [[stopwordHitsUdf]] keeps the old pipeline as the
    * reference semantics; TextScanSpec fuzz-pins the two equal. */
  def stopwordHits(text: Column, lang: String): Column =
    // coalesce preserves the UDF's null contract (null text → 0 hits)
    coalesce(graft.plans.TextScan.stopwordCount(text, stopwords(lang)), lit(0))

  /** The original compiled-UDF stopword counter, kept verbatim as the
    * spec's reference semantics for [[stopwordHits]]. */
  def stopwordHitsUdf(lang: String): org.apache.spark.sql.expressions.UserDefinedFunction = {
    val set = stopwords(lang).toSet
    udf((s: String) =>
      if (s == null) 0
      else {
        val toks = s.toLowerCase(java.util.Locale.ROOT).split("\\s+")
        var hits = 0
        var i = 0
        while (i < toks.length) { if (set.contains(toks(i))) hits += 1; i += 1 }
        hits
      })
  }

  /** Language-ID heuristic: argmax over per-language stopword hit
    * counts; 'und' when nothing matches; ties break to the
    * lexicographically larger code (array_max-on-struct semantics,
    * kept for output stability). One compiled pass — the HOF
    * formulation re-split the text once per language after
    * project-collapse (21 s → sub-second on the sf0.1 corpus). */
  private[graft] val langIdUdf = {
    val table: Map[String, Seq[String]] = stopwords
    udf((text: String) => {
      if (text == null) "und"
      else {
        val toks = text.toLowerCase.split("\\s+")
        var bestLang = "und"
        var bestHits = 0
        table.toSeq.sortBy(_._1).foreach { case (lang, sw) =>
          val set = sw.toSet
          var hits = 0
          var i = 0
          while (i < toks.length) { if (set.contains(toks(i))) hits += 1; i += 1 }
          if (hits > bestHits || (hits == bestHits && hits > 0 && lang > bestLang)) {
            bestHits = hits; bestLang = lang
          }
        }
        bestLang
      }
    })
  }

  /** r20 (guide §4): ONE in-place token pass with a combined
    * (token → language bitmask) lookup instead of the UDF's per-doc
    * text lower+split plus five set passes with per-doc set
    * construction. [[langIdUdf]] stays as the reference semantics
    * (TfidfKernelSpec fuzz-pins the two equal, including the
    * lex-larger tie rule and the null→'und' contract). */
  def langId(text: Column): Column =
    coalesce(graft.plans.Tfidf.langIdCol(text, stopwords), lit("und"))

  /** Quality signals (length / punctuation / stopword / digit ratios)
    * — the standard cheap pre-training text filters. */
  def punctRatio(text: Column): Column =
    size(regexp_extract_all(text, lit("[\\p{Punct}]"), lit(0))).cast("double") /
      greatest(length(text).cast("double"), lit(1.0))

  def digitRatio(text: Column): Column =
    size(regexp_extract_all(text, lit("[0-9]"), lit(0))).cast("double") /
      greatest(length(text).cast("double"), lit(1.0))

  def meanWordLength(text: Column): Column = {
    val toks = filter(split(text, "\\s+"), t => length(t) > 0)
    when(size(toks) === 0, 0.0).otherwise(
      aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") /
        size(toks).cast("double"))
  }

  def stopwordRatio(text: Column, lang: String = "en"): Column = {
    val toks = filter(split(lower(text), "\\s+"), t => length(t) > 0)
    val sw = array(stopwords(lang).map(lit): _*)
    when(size(toks) === 0, 0.0).otherwise(
      size(filter(toks, t => array_contains(sw, t))).cast("double") /
        size(toks).cast("double"))
  }

  /** Composite quality score in [0,1]: rewards sentence-like length
    * and stopword presence, penalizes punct/digit noise. Weights are
    * engine policy (no reference counterpart). Single compiled pass
    * over the text — the HOF composition re-tokenized per metric. */
  private val enStops = stopwords("en").toSet
  private val qualityUdf = udf((s: String) => {
    if (s == null || s.isEmpty) 0.0
    else {
      val len = s.length
      var punct = 0; var digit = 0
      var i = 0
      while (i < len) {
        val c = s.charAt(i)
        if (c >= '0' && c <= '9') digit += 1
        else if (c < 128 && !Character.isLetterOrDigit(c) && !Character.isWhitespace(c)) punct += 1
        i += 1
      }
      val toks = s.toLowerCase.split("\\s+").filter(_.nonEmpty)
      val swRatio = if (toks.isEmpty) 0.0
        else toks.count(enStops.contains).toDouble / toks.length
      val lenScore = math.min(len / 400.0, 1.0)
      val sw = math.min(swRatio * 4.0, 1.0)
      val noise = math.max(0.0,
        1.0 - punct.toDouble / len * 5.0 - digit.toDouble / len * 2.0)
      math.round((lenScore * 0.3 + sw * 0.3 + noise * 0.4) * 1e6) / 1e6
    }
  })
  def qualityScore(text: Column): Column = qualityUdf(text)

  /** The linear quality-probe's stopword set (a deliberately tiny
    * 8-token probe, distinct from [[enStops]] which feeds the teacher
    * rule — the probe must learn from RAW signals, not the rule's own
    * vocabulary). */
  private val probeStops = Set("the", "and", "of", "to", "is", "a", "in", "that")

  /** ONE compiled pass computing every signal the rule-distillation
    * quality classifier needs — the five raw probe features AND the
    * teacher [[qualityScore]] — bit-identical to the previous
    * per-signal formulation (4 regexp_replace passes + split + two
    * interpreted array-filter HOFs + the teacher's own tokenize:
    * ~7 traversals and several allocations per document, 5.2 s at the
    * 100× point for quality_classifier). Char-scan counts reproduce
    * the regex classes exactly: punct_re = the ASCII printable ranges
    * `[!-/:-@\[-`{-~]`, digits `[0-9]`, whitespace = Java `\s`
    * (space, TAB..CR — [[isWs]]); the teacher's noise term keeps its
    * OWN punct definition (ASCII non-alnum non-ws INCLUDING control
    * chars), so both counters run in the same scan. Token boundaries
    * and lowercasing match `lower(text) split \s+` (whitespace is
    * case-stable). Returns a positional tuple (janino struct-codegen
    * caveat, see repetitionUdf): _1 lenScore, _2 stopRatio,
    * _3 punctRatio, _4 digitRatio, _5 meanWordLen, _6 teacher score;
    * null text → null (ridge drops null-feature rows, unchanged). */
  private val qualitySignalsUdf = udf((s: String) => {
    if (s == null) null
    else if (s.isEmpty) (0.0, 0.0, 0.0, 0.0, 0.0, 0.0)
    else {
      val len = s.length
      var digit = 0; var punctRe = 0; var punctQ = 0; var ws = 0
      var i = 0
      while (i < len) {
        val c = s.charAt(i)
        if (c >= '0' && c <= '9') digit += 1
        else if (c < 128 && !Character.isLetterOrDigit(c) &&
          !Character.isWhitespace(c)) punctQ += 1
        if ((c >= '!' && c <= '/') || (c >= ':' && c <= '@') ||
            (c >= '[' && c <= '`') || (c >= '{' && c <= '~')) punctRe += 1
        if (isWs(c)) ws += 1
        i += 1
      }
      var nToks = 0; var stopProbe = 0; var stopEn = 0
      i = 0
      while (i < len) {
        while (i < len && isWs(s.charAt(i))) i += 1
        if (i < len) {
          val start = i
          while (i < len && !isWs(s.charAt(i))) i += 1
          nToks += 1
          val tok = s.substring(start, i).toLowerCase
          if (probeStops.contains(tok)) stopProbe += 1
          if (enStops.contains(tok)) stopEn += 1
        }
      }
      val lenD = len.toDouble
      val nT = math.max(nToks, 1).toDouble
      val lenScore = math.min(lenD / 400.0, 1.0)
      val quality = {
        val swRatio = if (nToks == 0) 0.0 else stopEn.toDouble / nToks
        val sw = math.min(swRatio * 4.0, 1.0)
        val noise = math.max(0.0,
          1.0 - punctQ.toDouble / len * 5.0 - digit.toDouble / len * 2.0)
        math.round((lenScore * 0.3 + sw * 0.3 + noise * 0.4) * 1e6) / 1e6
      }
      (lenScore, stopProbe.toDouble / nT, punctRe.toDouble / math.max(lenD, 1.0),
        digit.toDouble / math.max(lenD, 1.0), (lenD - ws) / nT, quality)
    }
  })

  def qualitySignals(text: Column): Column = qualitySignalsUdf(text)

  /** Gopher-style repetition metrics for boilerplate filtering:
    * distinct-token ratio, the most-frequent-2-gram's share of all
    * 2-grams, and the fraction of 2-/3-gram occurrences whose gram
    * repeats within the document. High dup/top fractions flag
    * machine-generated or boilerplate text a training mix should
    * drop (Rae et al. 2021, "Scaling Language Models", §A1.1 —
    * public Gopher filtering rules). One compiled pass builds every
    * n-gram table — row-local, embarrassingly parallel, no shuffle;
    * the explode+window formulation would shuffle each doc's grams.
    *
    * Returns a plain tuple for the same reason as bm25Profile: a
    * nested case class makes whole-stage codegen emit a call janino
    * cannot compile, silently dropping the stage to interpreted mode
    * (seen in the round-5 verify log); [[repetition]] restores the
    * field names with a positional struct cast. */
  private val repetitionUdf = udf((text: String) => {
    if (text == null) (0L, 0.0, 0.0, 0.0, 0.0)
    else {
      val toks = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
      val n = toks.length
      // (top occurrence count, occurrences of repeated grams, total grams)
      def gramStats(k: Int): (Int, Int, Int) = {
        val total = math.max(n - k + 1, 0)
        val m = new java.util.HashMap[String, Int]()
        var i = 0
        while (i < total) {
          val sb = new java.lang.StringBuilder(toks(i))
          var j = 1
          while (j < k) { sb.append(' ').append(toks(i + j)); j += 1 }
          m.merge(sb.toString, 1, Integer.sum _)
          i += 1
        }
        var top = 0; var dup = 0
        m.values.forEach { c =>
          if (c > top) top = c
          if (c > 1) dup += c
        }
        (top, dup, total)
      }
      val (top2, dup2, n2) = gramStats(2)
      val (_, dup3, n3) = gramStats(3)
      val distinct = {
        val set = new java.util.HashSet[String]()
        toks.foreach(set.add)
        set.size
      }
      (n.toLong,
        if (n == 0) 0.0 else distinct.toDouble / n,
        if (n2 == 0) 0.0 else top2.toDouble / n2,
        if (n2 == 0) 0.0 else dup2.toDouble / n2,
        if (n3 == 0) 0.0 else dup3.toDouble / n3)
    }
  })

  /** Struct of repetition metrics; see `repetitionUdf`. The cast is
    * positional, so it only renames _1.._5 — one UDF evaluation. */
  def repetition(text: Column): Column =
    repetitionUdf(text).cast(
      "struct<n_tokens:bigint,distinct_ratio:double,top2_frac:double," +
        "dup2_frac:double,dup3_frac:double>")

  /** Keep-predicate from the repetition metrics (Gopher-ish policy
    * thresholds: drop if the top 2-gram covers >20% of 2-grams or
    * >50% of 3-gram occurrences repeat). */
  def repetitionKeep(rep: Column): Column =
    rep.getField("top2_frac") <= 0.2 && rep.getField("dup3_frac") <= 0.5

  /** Per-document term-frequency pairs in ONE compiled pass: tokenize
    * once, count in a local hash map, emit distinct (token, tf). The
    * corpus-wide formulation (explode every token occurrence, then
    * groupBy(doc, tok)) shuffles one row per token OCCURRENCE and
    * re-tokenizes per consumer; this projection shuffles nothing and
    * is the single corpus scan every tf-derived stat hangs off. */
  /** Java-`\s` whitespace (ASCII-only, matching the regex the
    * tokenizer replaced): space or TAB..CR. */
  @inline private def isWs(c: Char): Boolean =
    c == ' ' || (c >= '\t' && c <= '\r')

  private[operators] def tfProfile(text: String): Array[(String, Long)] = {
    // single char scan, no regex, no intermediate token array — the
    // same rewrite that took the PII scanner from 6.3× to 2.1× DuckDB.
    // Token stream is identical to `text.toLowerCase.split("\\s+")`
    // (whitespace chars are case-stable, so lowering per token after
    // splitting sees the same boundaries the old code saw after
    // lowering the whole text). Measured 1.8× faster at the 100×
    // point (0.42 s vs 0.76 s for the tokenize pass).
    if (text == null) Array.empty[(String, Long)]
    else {
      val m = scala.collection.mutable.HashMap.empty[String, Long]
      val n = text.length
      var i = 0
      while (i < n) {
        while (i < n && isWs(text.charAt(i))) i += 1
        if (i < n) {
          val start = i
          while (i < n && !isWs(text.charAt(i))) i += 1
          val tok = text.substring(start, i).toLowerCase
          m.update(tok, m.getOrElse(tok, 0L) + 1L)
        }
      }
      m.toArray
    }
  }

  private val tfPairsUdf = udf(tfProfile _)

  /** Profile column for dev benchmarking (ProfileAdhoc). */
  private[graft] def tfPairsCol(text: Column): Column = tfPairsUdf(text)

  /** Vocabulary fold over per-doc tf profiles as a typed Aggregator:
    * ONE corpus pass builds the full (token → Σtf) or (token → df)
    * map with NO pair explode, no wide shuffle (per-partition map
    * buffers, single-partition merge) and no `limit(...).collect()` —
    * CollectLimit's incremental scale-up re-ran the whole agg in up
    * to 4 sequential jobs (measured ~1.0 s for a 0.5 s pass at the
    * 100× point). The vocab bound is enforced INSIDE reduce/merge, so
    * an open vocabulary fails loudly in the executor before any
    * oversized buffer is built or shipped — strictly earlier (and
    * cheaper) than the old post-collect `require`.
    *
    * Buffer is an immutable Map: per-token update is O(log n) HAMT —
    * fine to the enforced bound; the merge ships ≤ one vocab-sized
    * buffer per partition. */
  private final class VocabFold(maxVocab: Int, weighted: Boolean)
      extends Aggregator[String, Map[String, Long], Map[String, Long]] {
    private def bounded(m: Map[String, Long]): Map[String, Long] = {
      require(m.size <= maxVocab,
        s"vocabulary exceeds maxVocab=$maxVocab; " +
          "use the distributed (join/window) form for open vocabularies")
      m
    }
    override def zero: Map[String, Long] = Map.empty
    override def reduce(b: Map[String, Long], text: String): Map[String, Long] = {
      // fold the profile straight off the text — no intermediate
      // profile-array encode/decode between tokenizer and aggregate
      val prof = tfProfile(text)
      var acc = b
      var i = 0
      while (i < prof.length) {
        val (tok, tf) = prof(i)
        acc = acc.updated(tok, acc.getOrElse(tok, 0L) + (if (weighted) tf else 1L))
        i += 1
      }
      bounded(acc)
    }
    override def merge(x: Map[String, Long],
                       y: Map[String, Long]): Map[String, Long] =
      bounded(y.foldLeft(x) { case (acc, (tok, c)) =>
        acc.updated(tok, acc.getOrElse(tok, 0L) + c)
      })
    override def finish(r: Map[String, Long]): Map[String, Long] = r
    override def bufferEncoder: Encoder[Map[String, Long]] =
      ExpressionEncoder[Map[String, Long]]()
    override def outputEncoder: Encoder[Map[String, Long]] =
      ExpressionEncoder[Map[String, Long]]()
  }

  /** Vocab fold as a bare aggregate column (dev profiling only —
    * ProfileAdhoc prices the fold stage of the row-local tf-idf). */
  private[graft] def vocabFoldCol(text: Column, maxVocab: Int,
                                  weighted: Boolean): Column =
    udaf(new VocabFold(maxVocab, weighted), Encoders.STRING)(text)

  /** [[vocabFoldCol]] over the r20 kernel fold (the committed path). */
  private[graft] def vocabKernelCol(text: Column, maxVocab: Int,
                                    weighted: Boolean): Column =
    udaf(new VocabKernelFold(maxVocab, weighted), Encoders.STRING)(text)

  /** Open-addressing (lowered token → count) accumulator for
    * [[VocabKernelFold]] — the r20 per-token-allocation fix (guide
    * §4): the [[VocabFold]] immutable-Map buffer paid substring +
    * toLowerCase + boxing + a HAMT `updated` PER TOKEN OCCURRENCE
    * (~250 M allocations over the x1000 corpus, most of the fold's
    * 3.2 s). Here a token allocates ONCE per distinct token per
    * partition (its stored lowered key); every later occurrence
    * hashes and compares fold-on-the-fly with zero allocation.
    * Distinct-per-doc counting (df mode) uses a per-slot doc stamp
    * instead of a per-doc set. Tokenizer and lowering parity with
    * [[tfProfile]]: same ASCII `\s` delimiting; ASCII chars fold in
    * place, non-ASCII tokens fall back to
    * `String.toLowerCase(Locale.ROOT)` (the TextScan house
    * contract; TfidfKernelSpec fuzz-pins fold == VocabFold). */
  private[operators] final class VocabAcc(var maxVocab: Int,
                                          var weighted: Boolean)
      extends Serializable {
    var keys: Array[String] = new Array[String](128)
    var vals: Array[Long] = new Array[Long](128)
    var stamps: Array[Int] = new Array[Int](128)
    var size: Int = 0
    var doc: Int = 0

    @inline private def isWs(c: Char): Boolean =
      c == ' ' || (c >= '\t' && c <= '\r')
    @inline private def foldC(c: Char): Char =
      if (c >= 'A' && c <= 'Z') (c + 32).toChar else c

    private def hashKey(k: String): Int = {
      var h = -2128831035
      var i = 0
      while (i < k.length) { h = (h ^ k.charAt(i)) * 16777619; i += 1 }
      h & 0x7fffffff
    }
    private def hashFolded(t: String, start: Int, end: Int): Int = {
      var h = -2128831035
      var i = start
      while (i < end) { h = (h ^ foldC(t.charAt(i))) * 16777619; i += 1 }
      h & 0x7fffffff
    }

    private def grow(): Unit = {
      val ok = keys; val ov = vals; val os = stamps
      keys = new Array[String](ok.length << 1)
      vals = new Array[Long](ok.length << 1)
      stamps = new Array[Int](ok.length << 1)
      var e = 0
      while (e < ok.length) {
        if (ok(e) != null) {
          val mask = keys.length - 1
          var i = hashKey(ok(e)) & mask
          while (keys(i) != null) i = (i + 1) & mask
          keys(i) = ok(e); vals(i) = ov(e); stamps(i) = os(e)
        }
        e += 1
      }
    }

    private def bound(): Unit =
      require(size <= maxVocab,
        s"vocabulary exceeds maxVocab=$maxVocab; " +
          "use the distributed (join/window) form for open vocabularies")

    /** Add `delta` for a stored lowered key (merge path / fallback). */
    def addKey(k: String, delta: Long, distinctThisDoc: Boolean): Unit = {
      if ((size + 1) * 2 > keys.length) grow()
      val mask = keys.length - 1
      var i = hashKey(k) & mask
      while (keys(i) != null) {
        if (keys(i) == k) {
          if (distinctThisDoc) {
            if (stamps(i) != doc) { vals(i) += delta; stamps(i) = doc }
          } else vals(i) += delta
          return
        }
        i = (i + 1) & mask
      }
      keys(i) = k; vals(i) = delta; stamps(i) = doc
      size += 1
      bound()
    }

    /** Zero-allocation hit path for an ASCII token of `t`. */
    private def addAsciiRange(t: String, start: Int, end: Int,
                              distinctThisDoc: Boolean): Unit = {
      if ((size + 1) * 2 > keys.length) grow()
      val mask = keys.length - 1
      val len = end - start
      var i = hashFolded(t, start, end) & mask
      while (keys(i) != null) {
        val k = keys(i)
        if (k.length == len) {
          var j = 0
          var eq = true
          while (eq && j < len) {
            if (k.charAt(j) != foldC(t.charAt(start + j))) eq = false
            j += 1
          }
          if (eq) {
            if (distinctThisDoc) {
              if (stamps(i) != doc) { vals(i) += 1L; stamps(i) = doc }
            } else vals(i) += 1L
            return
          }
        }
        i = (i + 1) & mask
      }
      // first sighting: materialize the folded key once
      val a = new Array[Char](len)
      var j = 0
      while (j < len) { a(j) = foldC(t.charAt(start + j)); j += 1 }
      keys(i) = new String(a); vals(i) = 1L; stamps(i) = doc
      size += 1
      bound()
    }

    /** Fold one document's text. */
    def foldText(t: String): Unit = {
      doc += 1
      val distinct = !weighted
      val n = t.length
      var i = 0
      while (i < n) {
        while (i < n && isWs(t.charAt(i))) i += 1
        if (i < n) {
          val start = i
          var ascii = true
          while (i < n && !isWs(t.charAt(i))) {
            if (t.charAt(i) >= 0x80) ascii = false
            i += 1
          }
          if (ascii) addAsciiRange(t, start, i, distinct)
          else addKey(t.substring(start, i)
            .toLowerCase(java.util.Locale.ROOT), 1L, distinct)
        }
      }
    }

    def mergeFrom(o: VocabAcc): Unit = {
      // counts are final per-partition — stamps no longer matter
      doc += 1
      var e = 0
      while (e < o.keys.length) {
        if (o.keys(e) != null) addKey(o.keys(e), o.vals(e),
          distinctThisDoc = false)
        e += 1
      }
    }

    def toMap: Map[String, Long] = {
      val b = Map.newBuilder[String, Long]
      var e = 0
      while (e < keys.length) {
        if (keys(e) != null) b += keys(e) -> vals(e)
        e += 1
      }
      b.result()
    }
  }

  /** [[VocabFold]] semantics over the [[VocabAcc]] kernel buffer —
    * same loud maxVocab bound, same (token → df | Σtf) result; the
    * buffer serializes via kryo only at partial-merge boundaries. */
  private final class VocabKernelFold(maxVocab: Int, weighted: Boolean)
      extends Aggregator[String, VocabAcc, Map[String, Long]] {
    override def zero: VocabAcc = new VocabAcc(maxVocab, weighted)
    override def reduce(b: VocabAcc, text: String): VocabAcc = {
      if (text != null) b.foldText(text)
      b
    }
    override def merge(x: VocabAcc, y: VocabAcc): VocabAcc = {
      x.mergeFrom(y)
      x
    }
    override def finish(r: VocabAcc): Map[String, Long] = r.toMap
    override def bufferEncoder: Encoder[VocabAcc] = Encoders.kryo[VocabAcc]
    override def outputEncoder: Encoder[Map[String, Long]] =
      ExpressionEncoder[Map[String, Long]]()
  }

  /** One-job driver-side vocab map: token → Σtf (`weighted`) or
    * token → document frequency (profiles hold distinct tokens).
    * r20: kernel fold ([[VocabAcc]]); [[VocabFold]] stays as the
    * spec-pinned reference form. */
  private def vocabMap(docs: DataFrame, textCol: String, maxVocab: Int,
                       weighted: Boolean): Map[String, Long] = {
    val fold = udaf(new VocabKernelFold(maxVocab, weighted), Encoders.STRING)
    try docs.select(fold(col(textCol)).as("vocab"))
      .head.getMap[String, Long](0).toMap
    catch { case e: Throwable =>
      // surface the in-executor bound violation as the same loud
      // IllegalArgumentException the old post-collect require threw
      throw Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(8)
        .collectFirst { case i: IllegalArgumentException => i }.getOrElse(e)
    }
  }

  /** (doc, tok, tf) rows from a single checkpointed corpus scan. */
  private def tfPairs(docs: DataFrame, idCol: String, textCol: String)
      : (DataFrame, DataFrame) = {
    val prof = docs
      .select(col(idCol), tfPairsUdf(col(textCol)).as("tfs"))
      .localCheckpoint() // corpus text is scanned + tokenized exactly once
    val pairs = prof.select(col(idCol), explode(col("tfs")).as("kv"))
      .select(col(idCol), col("kv._1").as("tok"), col("kv._2").as("tf"))
    (prof, pairs)
  }

  /** Corpus-unigram LM score: average natural-log probability of a
    * document's tokens under the corpus's own unigram distribution —
    * the classic cheap LM quality filter (docs far below the corpus
    * mean read as noise; far above as boilerplate). One corpus scan
    * builds the per-doc tf profile ([[tfPairs]]); the unigram vocab is
    * a small agg over distinct (doc,tok) pairs whose Σ also yields the
    * normalizer (no second corpus scan — the round-4 audit flagged the
    * old `toks.count()` re-tokenize); scoring joins the BROADCAST
    * vocab (a unigram table is tiny next to its corpus), tf-weighted
    * so per-doc rows stay distinct-token-sized. No smoothing: the
    * vocab is built from the same corpus, so OOV is impossible. */
  def corpusLmScore(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val (_, pairs) = tfPairs(docs, idCol, textCol)
    val vocab = pairs.groupBy("tok").agg(sum("tf").as("cnt")).localCheckpoint()
    // the normalizer Σcnt is a driver scalar off the (tiny, already
    // materialized) vocab — a one-row DataFrame would fold back in as
    // a nested-loop join, which the plan sweep bans
    val total = vocab.agg(coalesce(sum("cnt"), lit(0L))).head.getLong(0)
    pairs.join(broadcast(vocab), "tok")
      .groupBy(col(idCol))
      .agg(sum("tf").as("n_tokens"),
        (sum(col("tf") * log(col("cnt") / lit(total.toDouble))) / sum("tf"))
          .as("avg_logp"))
  }

  /** Top-k corpus keywords per document by tf-idf (raw term count ×
    * ln(N/df)), tie-broken by term for determinism. Shape at scale:
    * tf is computed row-locally in one compiled pass ([[tfPairs]]) so
    * the only wide exchange is the per-doc rank window over DISTINCT
    * (doc, term) pairs — never one row per token occurrence; df is a
    * small agg that BROADCASTS back (a document-frequency table is
    * vocabulary-sized, tiny next to the corpus). N is a driver-side
    * scalar off the checkpointed profile, like lm_score's normalizer. */
  def tfidfTopTerms(docs: DataFrame, idCol: String, textCol: String,
                    k: Int): DataFrame = {
    val (prof, pairs) = tfPairs(docs, idCol, textCol)
    val n = prof.count()
    val dfreq = pairs.groupBy("tok").agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("tfidf").desc, col("tok"))
    pairs.join(broadcast(dfreq), "tok")
      .withColumn("tfidf", col("tf") * log(lit(n.toDouble) / col("df")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
  }

  /** [[tfidfTopTerms]] with the per-doc top-k computed ROW-LOCALLY:
    * the df table rides the closure as a map and each document ranks
    * its own (already row-local) tf entries — no (doc,term) explode
    * into a join, no rank-window exchange; the only shuffle left is
    * the map-side-combined |vocab|-group df aggregate. Identical
    * output to the window form (spec-diffed): same IEEE arithmetic
    * (tf.toDouble * ln(n/df), the window form's exact op sequence)
    * and the same (tfidf desc, term asc) tie-break.
    *
    * Use when the vocabulary is driver/broadcast-bounded — the SAME
    * assumption [[tfidfTopTerms]]'s `broadcast(dfreq)` already makes —
    * enforced here by `maxVocab` (fails loudly rather than silently
    * collecting an unbounded vocab; for open vocabularies use the
    * window form, whose df table can stay distributed by dropping the
    * broadcast hint).
    *
    * REQUIRES a deterministic input: `docs` is scanned twice (df fold,
    * then scoring) with no materialization between — a source that
    * yields different rows per scan (`sample()`, `limit()` over an
    * unordered input, an unstable upstream shuffle) can surface a
    * token at scoring time that the vocab pass never saw. That case
    * fails loudly (below) instead of a bare NoSuchElementException;
    * for such inputs use [[tfidfTopTerms]], whose checkpointed
    * profile is scanned once. */
  def tfidfTopTermsRowLocal(docs: DataFrame, idCol: String, textCol: String,
                            k: Int, maxVocab: Int = 1 << 20): DataFrame = {
    // two direct corpus passes (df fold, then scoring) instead of
    // one checkpointed pass: materializing 10⁵⁺ per-doc profile
    // arrays through block storage measured SLOWER at the 100× point
    // than simply tokenizing twice with the scanner tokenizer
    // (localCheckpoint added 0.7-2 s; a tokenize pass costs 0.4 s).
    // The window form keeps its checkpoint — it fans the profile out
    // to more consumers. The df table comes from [[vocabMap]]'s
    // bounded one-job fold (loud in-executor maxVocab guard).
    val n = docs.count() // = profile count: null text still yields a profile row
    val dfMap = vocabMap(docs, textCol, maxVocab, weighted = false)
    val nD = n.toDouble
    // r20 (guide §4): the fused tokenize+score+rank runs as the
    // in-place codegen kernel (plans/TfidfExpressions.scala) instead
    // of a scalar UDF — no UTF8String→String decode of the corpus, no
    // per-occurrence substring/toLowerCase/boxing, the df table probes
    // by folded bytes. Bit-identity preserved (same StrictMath.log op
    // sequence per token, same (score desc, token asc) total order);
    // TfidfKernelSpec fuzz-pins kernel == the UDF form this replaces,
    // and the tfProfile-based UDF stays below as the spec reference.
    docs.select(col(idCol),
        explode(graft.plans.Tfidf.topKCol(col(textCol),
          new graft.plans.TokenDfMap(dfMap), nD, k)).as("t"))
      .select(col(idCol), col("t._2").as("tok"), col("t._3").as("tf"),
        col("t._4").as("tfidf"), col("t._1").as("rnk"))
  }

  /** The scalar-UDF top-k scorer the r20 kernel replaced — kept as
    * the executable reference semantics (TfidfKernelSpec pins the
    * kernel against it on fuzzed corpora). */
  private[graft] def tfidfTopKUdfReference(dfMap: Map[String, Long],
                                           nD: Double, k: Int) =
    udf((text: String) => {
      val scored = tfProfile(text).toSeq.map { case (tok, tf) =>
        val df = dfMap.getOrElse(tok, throw new IllegalStateException(
          s"tfidfTopTermsRowLocal: token '$tok' absent from the vocab pass — " +
            "the input must be deterministic across scans (sample()/limit()/" +
            "unstable shuffle break this); use the join form tfidfTopTerms"))
        (tok, tf, tf * java.lang.StrictMath.log(nD / df))
      }.sortWith { case ((ta, _, sa), (tb, _, sb)) =>
        if (sa != sb) sa > sb else ta < tb
      }
      scored.take(k).zipWithIndex.map { case ((tok, tf, s), i) =>
        (i + 1, tok, tf, s)
      }
    })

  /** [[corpusLmScore]] with the scoring computed ROW-LOCALLY: the
    * unigram log-probs ride the closure as a map (vocab-bounded,
    * loudly guarded like [[tfidfTopTermsRowLocal]]) and each document
    * folds its own tf profile — no pair explode into a join, no
    * per-doc groupBy shuffle. Two direct corpus passes total (vocab
    * build, then scoring). Output matches the join form EXACTLY
    * (spec-diffed, doubles included): both accumulate
    * Σ tf·ln(cnt/total) / Σ tf over the same profile in the same
    * order, with ln through StrictMath like Catalyst's Log. Documents
    * with an empty profile (null/empty text) are absent from both.
    * Use the join form for open vocabularies.
    *
    * REQUIRES a deterministic input (same contract as
    * [[tfidfTopTermsRowLocal]]): two direct scans with no
    * materialization between — a token the vocab pass never saw fails
    * loudly at scoring time; use [[corpusLmScore]] for inputs that
    * vary across scans. */
  def corpusLmScoreRowLocal(docs: DataFrame, idCol: String, textCol: String,
                            maxVocab: Int = 1 << 20): DataFrame = {
    val vocab = vocabMap(docs, textCol, maxVocab, weighted = true)
    val total = vocab.valuesIterator.sum.toDouble
    val logpBits = vocab.map { case (tok, cnt) =>
      (tok, java.lang.Double.doubleToRawLongBits(
        java.lang.StrictMath.log(cnt / total)))
    }
    // r20 (guide §4): the fused tokenize+score runs as the in-place
    // codegen kernel (plans/TfidfExpressions.scala) — no
    // UTF8String→String decode, no per-occurrence substring/
    // toLowerCase/boxing. n_tokens is exact; the Σ tf·ln(p)
    // accumulates over distinct tokens in table order where the UDF
    // used scala-HashMap order — both arbitrary; the sums agree to
    // reassociation ulps and the DECLARED contract (the lm_score
    // query, the DuckDB oracle, LmScoreSpec) compares at round(·, 4).
    // The UDF form stays below as the executable reference.
    // empty-doc drop BEFORE the scorer: filtering on r._1 > 0 after
    // would push `lm_score(text)._1 > 0` below the projection and
    // evaluate the kernel twice per row (§4.4 — seen live in the
    // plan). hasToken(text) > 0 ⟺ n_tokens > 0 by construction
    // (a token is a maximal non-ws byte run), null text drops either
    // way.
    docs.filter(graft.plans.Tfidf.hasTokenCol(col(textCol)))
      .select(col(idCol),
        graft.plans.Tfidf.lmScoreCol(col(textCol),
          new graft.plans.TokenDfMap(logpBits)).as("r"))
      .select(col(idCol), col("r._1").as("n_tokens"), col("r._2").as("avg_logp"))
  }

  /** The scalar-UDF LM scorer the r20 kernel replaced — kept as the
    * executable reference semantics (TfidfKernelSpec pins the kernel
    * against it: n_tokens exact, avg_logp to reassociation ulps and
    * equal after the query's round-4). */
  private[graft] def lmScoreUdfReference(logp: Map[String, Double]) =
    udf((text: String) => {
      val prof = tfProfile(text)
      var n = 0L
      var s = 0.0
      var i = 0
      while (i < prof.length) {
        val (tok, tf) = prof(i)
        n += tf
        s += tf * logp.getOrElse(tok, throw new IllegalStateException(
          s"corpusLmScoreRowLocal: token '$tok' absent from the vocab pass — " +
            "the input must be deterministic across scans (sample()/limit()/" +
            "unstable shuffle break this); use the join form corpusLmScore"))
        i += 1
      }
      (n, s / n)
    })

  /** One compiled pass per document: doc length + per-query-term
    * counts. A HOF formulation (size(filter(ts, ...)) per term) would
    * re-tokenize per lambda after project-collapse — the measured
    * 20-70× hazard documented in README. Returns a plain tuple
    * (struct<_1,_2>): the earlier nested case class made whole-stage
    * codegen emit a call to its private accessor, which janino cannot
    * compile — the stage silently fell back to interpreted mode
    * (round-4 audit). */
  private def bm25ProfileUdf(terms: Seq[String]) = {
    val idx = terms.zipWithIndex.toMap
    udf((text: String) => {
      val tf = new Array[Long](idx.size)
      var dl = 0L
      if (text != null)
        text.toLowerCase.split("\\s+").foreach { t =>
          if (t.nonEmpty) {
            dl += 1
            idx.get(t) match { case Some(i) => tf(i) += 1; case None => }
          }
        }
      (dl, tf)
    })
  }

  /** BM25-ranked keyword retrieval (Robertson/Sparck Jones; the
    * textbook k1/b form) — the lexical half of a RAG retriever next to
    * the vector half in VectorSearch (ref rag_service.py:208-241
    * retrieves by embedding only; BM25 is the standard hybrid
    * complement).
    *
    * Scale shape: NO wide shuffle at all. One compiled UDF pass
    * projects each doc to (id, dl, tf[terms]); that narrow profile is
    * localCheckpoint'd once so the corpus is scanned ONCE; corpus
    * stats (N, Σdl, per-term df) come from a single partial-agg
    * `.head` — the same driver-scalar discipline as lm_score's
    * normalizer (a one-row DataFrame would fold back in as a
    * nested-loop join). Scoring is then pure column arithmetic with
    * idf inlined as literals, and top-k is TakeOrderedAndProject.
    *
    * Returns docs with at least one query term, scored in `bm25`
    * (raw double — callers round for presentation). */
  def bm25Rank(docs: DataFrame, idCol: String, textCol: String,
               terms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val prof = docs
      .select(col(idCol), bm25ProfileUdf(terms)(col(textCol)).as("p"))
      .select(col(idCol) +: col("p._1").as("dl") +:
        terms.indices.map(i => col("p._2")(i).as(s"tf_$i")): _*)
      .localCheckpoint()
    val stats = prof.agg(
      count(lit(1)).as("n"),
      coalesce(sum(col("dl")), lit(0L)).as("tot") +:
        terms.indices.map(i =>
          sum(when(col(s"tf_$i") > 0, 1L).otherwise(0L)).as(s"df_$i")): _*).head
    val n = stats.getLong(0)
    val avgdl = if (n == 0) 1.0 else stats.getLong(1).toDouble / n
    val score = terms.indices.map { i =>
      val df = stats.getLong(2 + i).toDouble
      val idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
      lit(idf) * col(s"tf_$i") * (k1 + 1.0) /
        (col(s"tf_$i") + lit(k1) * (lit(1.0 - b) + lit(b / avgdl) * col("dl")))
    }.reduce(_ + _)
    prof.filter(terms.indices.map(i => col(s"tf_$i") > 0).reduce(_ || _))
      .select(col(idCol), col("dl"), score.as("bm25"))
  }

  /** Per-document stat projection used by the corpus-stats queries. */
  def docStats(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("n_tokens", tokenCount(col(textCol)))
      .withColumn("n_subwords", subwordCount(col(textCol)))
      .withColumn("mean_word_len", meanWordLength(col(textCol)))
      .withColumn("punct_ratio", punctRatio(col(textCol)))
}
