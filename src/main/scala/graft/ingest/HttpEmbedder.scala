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

  override def embedBatch(texts: Seq[String]): Seq[Array[Float]] = {
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
    val root = mapper.readTree(json)
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
