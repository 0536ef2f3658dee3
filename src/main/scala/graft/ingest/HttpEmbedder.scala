package graft.ingest

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.time.Duration

import com.fasterxml.jackson.databind.ObjectMapper

/** [[Embedder]] backed by a remote embedding service over HTTP — the
  * production counterpart of [[HashEmbedder]] (ref
  * embedding_handler.py:41-55 fronts BAAI/bge-m3 the same way: a
  * batched `encode(texts) -> vectors` call behind a service boundary).
  *
  * Wire shape is the de-facto standard batch-embedding contract (HF
  * text-embeddings-inference and compatible servers):
  * request `{"inputs": ["...", ...]}`, response `[[f, ...], ...]` —
  * one vector per input, in order (the order guarantee is the
  * [[Embedder.embedBatch]] contract, asserted per batch).
  *
  * Scale shape: the instance is broadcast with the task closure; the
  * HTTP client is per-EXECUTOR (`@transient lazy`), so a 1000-executor
  * embedding job opens 1000 connections, not one per row, and each
  * call amortizes the round trip over [[batchSize]] texts
  * ([[Embedder.embedColumn]] hands over grouped batches). Transient
  * failures retry with exponential backoff; a batch that still fails
  * fails the TASK (Spark's retry, then the job) — silently zero-filled
  * vectors would poison an index.
  *
  * @param endpoint  full URL of the batch-embed route
  * @param dim       the model's output dimensionality (validated on
  *                  every vector — a dim drift means a model swap and
  *                  must fail loudly, not mix spaces in one index)
  */
final class HttpEmbedder(endpoint: String, override val dim: Int,
                         override val batchSize: Int = 64,
                         timeout: Duration = Duration.ofSeconds(60),
                         maxRetries: Int = 3) extends Embedder {

  // per-executor, not serialized: HttpClient holds sockets/threads
  @transient private lazy val client: HttpClient =
    HttpClient.newBuilder().connectTimeout(timeout).build()
  @transient private lazy val mapper = new ObjectMapper()

  /** Batch embed with poisoned-row isolation. A deterministic
    * failure on a 64-text batch ("HTTP 400", "65 vectors for 64
    * texts") is useless at 100 TB — which of the 64 rows needs
    * quarantining? On a bisectable failure the batch descends by
    * probing BOTH halves at each level: the failure is followed into
    * whichever half reproduces it, until it pins to one row, and the
    * thrown error names that row (offset in the batch + a text
    * preview) plus the root cause.
    *
    * Bisectable = row-shaped causes (400/413/422-style contract
    * rejections, malformed/partial response, dim drift) and
    * retry-exhausted status-bearing 5xx (a server that crashes on one
    * input — oversize text, encoder OOM — answers 5xx
    * deterministically). NOT bisected, ever:
    *  - batch-level statuses — 401/403 (auth), 404/405/410 (bad
    *    endpoint), 407, 431, 501, and retry-exhausted 429 (rate
    *    limit): nothing about row content causes these, and for 429
    *    bisection would multiply load on an already-throttling
    *    service;
    *  - connect-level failures (refused, DNS, timeout reaching the
    *    host): the service is down for every row;
    *  - failures that reproduce with the SAME HTTP status on BOTH
    *    halves of a probe — that is positive evidence the failure
    *    does not follow any single row, so the descent stops with a
    *    batch-wide diagnosis instead of blaming the leftmost row.
    * "Poisoned row isolated" is only ever claimed with evidence: a
    * row-shaped cause, or a 5xx that reproduces on this row while
    * its sibling slice succeeds. Worst-case isolation cost is
    * ~2·log₂(batch) probes; a batch-wide failure costs 2 probes.
    *
    * Retries re-send the byte-identical request body (built once per
    * slice), so a mid-sequence failure after earlier successful
    * batches re-embeds nothing and re-poses the same question —
    * idempotent against any honest embedding service (asserted in
    * HttpEmbedderSpec). */
  override def embedBatch(texts: Seq[String]): Seq[Array[Float]] = {
    try sendBatch(texts)
    catch {
      case e: InterruptedException => throw e
      case scala.util.control.NonFatal(e) => descend(texts, 0, e, siblingOk = false)
    }
  }

  /** Row-shaped cause: plausibly attributable to one row's content. */
  private def rowShaped(e: Throwable): Boolean = e match {
    case h: HttpEmbedder.HttpStatusException => h.status / 100 == 4
    case _: IllegalArgumentException => true // malformed/partial/dim
    case _ => false
  }

  /** Worth descending into: row-shaped, or a status-bearing 5xx that
    * survived retries (connect-level outages carry no status). */
  private def bisectable(e: Throwable): Boolean =
    rowShaped(e) || HttpEmbedder.statusOf(e).exists(_ / 100 == 5)

  /** Follow an observed failure `cause` on `texts` (whose request has
    * ALREADY been sent and failed — never re-sent here) down to a
    * single row, heal it if it was transient, or diagnose it as
    * batch-wide. `siblingOk` = the slice's sibling succeeded, i.e.
    * the failure demonstrably follows this slice's content. */
  private def descend(texts: Seq[String], offset: Int, cause: Throwable,
                      siblingOk: Boolean): Seq[Array[Float]] = {
    if (texts.length == 1) {
      if (rowShaped(cause) || (siblingOk && bisectable(cause)))
        throw new IllegalStateException(
          s"poisoned row isolated at batch offset $offset " +
            s"(text: \"${texts.head.take(80)}\"): ${cause.getMessage}", cause)
      throw cause // no row-shaped evidence: report the service failure as-is
    }
    if (!bisectable(cause)) throw cause
    val mid = texts.length / 2
    val (lt, rt) = (texts.take(mid), texts.drop(mid))
    val lr = scala.util.Try(sendBatch(lt))
    val rr = scala.util.Try(sendBatch(rt))
    (lr, rr) match {
      case (scala.util.Success(l), scala.util.Success(r)) => l ++ r // transient, healed
      case (scala.util.Failure(le), scala.util.Failure(re))
          if HttpEmbedder.statusOf(le).isDefined &&
            HttpEmbedder.statusOf(le) == HttpEmbedder.statusOf(re) =>
        throw new HttpEmbedder.BatchFailedException(
          s"batch-wide failure: both halves of ${texts.length} texts fail " +
            s"identically (HTTP ${HttpEmbedder.statusOf(le).get}) — the cause " +
            s"is the service or the request shape, not any single row: " +
            s"${le.getMessage}", cause)
      case (scala.util.Failure(le), scala.util.Success(r)) =>
        descend(lt, offset, le, siblingOk = true) ++ r
      case (scala.util.Success(l), scala.util.Failure(re)) =>
        l ++ descend(rt, offset + mid, re, siblingOk = true)
      case (scala.util.Failure(le), scala.util.Failure(_)) =>
        // halves fail for different reasons — pursue the first
        descend(lt, offset, le, siblingOk = false)
    }
  }

  private def sendBatch(texts: Seq[String]): Seq[Array[Float]] = {
    val body = {
      val root = mapper.createObjectNode()
      val arr = root.putArray("inputs")
      texts.foreach(arr.add)
      mapper.writeValueAsString(root)
    }
    val req = HttpRequest.newBuilder(URI.create(endpoint))
      .timeout(timeout)
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(body, StandardCharsets.UTF_8))
      .build()

    var attempt = 0
    var lastErr: Throwable = null
    while (attempt <= maxRetries) {
      try {
        val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
        val status = resp.statusCode()
        if (status / 100 == 2) {
          return parse(resp.body(), texts.length)
        }
        if (HttpEmbedder.batchTerminal(status))
          // auth/endpoint/config failure: no row caused it, retrying
          // re-sends the same doomed credentials/URL, and bisection
          // would blame an innocent row — fail the batch NOW
          throw new HttpEmbedder.BatchFailedException(
            s"embedding service rejected the batch at the service level: " +
              s"HTTP $status ${resp.body().take(200)}", null)
        if (status / 100 == 4 && status != 429)
          // row-shaped contract rejection (400/413/422…) — retrying
          // re-sends the same bad request; only 5xx/429 are transient
          throw new HttpEmbedder.HttpStatusException(status,
            s"embedding service rejected batch: HTTP $status ${resp.body().take(200)}")
        lastErr = new HttpEmbedder.HttpStatusException(status, s"HTTP $status")
      } catch {
        // contract violations (4xx, wrong dim, malformed body) are not
        // transient — retrying re-sends the same doomed request
        case e: HttpEmbedder.BatchFailedException => throw e
        case e: HttpEmbedder.HttpStatusException => throw e
        case e: IllegalArgumentException => throw e
        // task cancellation must propagate NOW, not after the backoff
        // sleeps (Spark interrupts the task thread to kill it)
        case e: InterruptedException =>
          Thread.currentThread().interrupt(); throw e
        // fatal JVM errors (OOM, linkage) are never transient
        case scala.util.control.NonFatal(e) => lastErr = e
      }
      attempt += 1
      if (attempt <= maxRetries)
        Thread.sleep(math.min(8000L, 250L << attempt)) // 500ms, 1s, 2s…
    }
    lastErr match {
      // retry-exhausted rate limit is a service-level condition:
      // bisecting it would multiply requests against a throttling
      // service (~2·log₂(batch) probes, each with full retry budget)
      case h: HttpEmbedder.HttpStatusException if h.status == 429 =>
        throw new HttpEmbedder.BatchFailedException(
          s"embedding service is rate-limiting (HTTP 429 after " +
            s"${maxRetries + 1} attempts) — back off at the job level, " +
            s"no row caused this", h)
      case _ =>
        throw new java.io.IOException(
          s"embedding batch failed after ${maxRetries + 1} attempts", lastErr)
    }
  }

  private def parse(json: String, expected: Int): Seq[Array[Float]] = {
    // Jackson parse errors are IOExceptions — without the rewrap a
    // 200-with-garbage body would look TRANSIENT and burn the retry
    // budget on a deterministic contract violation
    val root = try mapper.readTree(json) catch {
      case e: com.fasterxml.jackson.core.JacksonException =>
        throw new IllegalArgumentException(
          s"embedding response is not valid JSON: ${json.take(200)}", e)
    }
    // accept both the bare-array shape and {"embeddings": [...]}
    val arr = if (root.isArray) root else root.get("embeddings")
    require(arr != null && arr.isArray,
      s"embedding response is not a vector array: ${json.take(200)}")
    require(arr.size() == expected,
      s"embedding service returned ${arr.size()} vectors for $expected texts")
    (0 until arr.size()).map { i =>
      val v = arr.get(i)
      require(v.size() == dim,
        s"vector $i has dim ${v.size()}, expected $dim — model/index mismatch")
      val out = new Array[Float](dim)
      var j = 0
      while (j < dim) { out(j) = v.get(j).floatValue(); j += 1 }
      out
    }
  }
}

object HttpEmbedder {

  /** Non-2xx response whose status survived retry policy — carries the
    * status so failure classification is code-based, not string-parsed. */
  final class HttpStatusException(val status: Int, msg: String)
    extends RuntimeException(msg)

  /** Terminal batch-level failure: caused by the service, credentials,
    * endpoint, or request shape — NOT by any row's content. Never
    * bisected; never reported as a poisoned row. */
  final class BatchFailedException(msg: String, cause: Throwable)
    extends RuntimeException(msg, cause)

  /** Statuses where the failure is categorically about the service or
    * client config, never about one row: auth (401/403/407), endpoint
    * (404/405/410/501), header overflow (431). 429 joins this set only
    * after retries exhaust (see sendBatch) — it IS transient. */
  private[ingest] def batchTerminal(status: Int): Boolean = status match {
    case 401 | 403 | 404 | 405 | 407 | 410 | 431 | 501 => true
    case _ => false
  }

  /** The HTTP status carried anywhere in the cause chain, if any. */
  private[ingest] def statusOf(e: Throwable): Option[Int] = {
    var c = e
    var depth = 0
    while (c != null && depth < 16) {
      c match {
        case h: HttpStatusException => return Some(h.status)
        case _ =>
      }
      c = if (c.getCause eq c) null else c.getCause
      depth += 1
    }
    None
  }
}
