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
    * quarantining? On a terminal ROW-ADDRESSABLE failure the batch
    * bisects: each half retries independently, recursing until the
    * failure pins to one row, and the thrown error names that row
    * (offset in the batch + a text preview) plus the root cause.
    *
    * Row-addressable = 4xx, malformed/partial response, dim drift,
    * and retry-exhausted 5xx (a server that crashes on one input —
    * oversize text, encoder OOM — answers 5xx deterministically).
    * Connect-level failures (refused, DNS, timeout reaching the
    * host) are NOT bisected: the service is down for every row, and
    * halving would just double the outage cost. Worst-case isolation
    * cost is ~2·log₂(batch) extra requests along the leftmost
    * failing path — scheduler noise next to re-embedding a task.
    *
    * Retries re-send the byte-identical request body (built once per
    * slice), so a mid-sequence failure after earlier successful
    * batches re-embeds nothing and re-poses the same question —
    * idempotent against any honest embedding service (asserted in
    * HttpEmbedderSpec). */
  override def embedBatch(texts: Seq[String]): Seq[Array[Float]] =
    embedSlice(texts, 0)

  private def rowAddressable(e: Throwable): Boolean = e match {
    case _: IllegalStateException => true    // 4xx contract rejection
    case _: IllegalArgumentException => true // malformed/partial/dim
    case io: java.io.IOException =>          // exhausted retries: only
      Option(io.getCause).exists {           // status-bearing 5xx, not
        case c: java.io.IOException =>       // connect-level outage
          Option(c.getMessage).exists(_.startsWith("HTTP "))
        case _ => false
      }
    case _ => false
  }

  private def embedSlice(texts: Seq[String], offset: Int): Seq[Array[Float]] = {
    try sendBatch(texts)
    catch {
      case e: Throwable if rowAddressable(e) && texts.length > 1 =>
        val mid = texts.length / 2
        embedSlice(texts.take(mid), offset) ++
          embedSlice(texts.drop(mid), offset + mid)
      case e: Throwable if rowAddressable(e) =>
        throw new IllegalStateException(
          s"poisoned row isolated at batch offset $offset " +
            s"(text: \"${texts.head.take(80)}\"): ${e.getMessage}", e)
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
        if (resp.statusCode() / 100 == 2) {
          return parse(resp.body(), texts.length)
        }
        // 4xx is a contract bug — retrying re-sends the same bad
        // request; only 5xx/timeouts are transient
        if (resp.statusCode() / 100 == 4)
          throw new IllegalStateException(
            s"embedding service rejected batch: HTTP ${resp.statusCode()} ${resp.body().take(200)}")
        lastErr = new java.io.IOException(s"HTTP ${resp.statusCode()}")
      } catch {
        // contract violations (4xx, wrong dim, malformed body) are not
        // transient — retrying re-sends the same doomed request
        case e: IllegalStateException => throw e
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
    throw new java.io.IOException(
      s"embedding batch failed after ${maxRetries + 1} attempts", lastErr)
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
