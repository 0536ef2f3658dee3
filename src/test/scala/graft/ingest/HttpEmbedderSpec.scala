package graft.ingest

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicInteger

import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.BeforeAndAfterAll

import graft.SparkSpec

/** [[HttpEmbedder]] against a local in-JVM embedding service that
  * computes [[HashEmbedder]] vectors server-side — proving the HTTP
  * backend is a drop-in for the hash stub through the same
  * [[Embedder]] boundary (batching, ordering, dim validation, retry). */
class HttpEmbedderSpec extends SparkSpec with BeforeAndAfterAll {
  import spark.implicits._

  private val mapper = new ObjectMapper()
  private var server: HttpServer = _
  private val requests = new AtomicInteger(0)
  private val failFirst = new AtomicInteger(0) // N leading 500s, then serve
  private val capturedBodies =
    new java.util.concurrent.ConcurrentLinkedQueue[String]()

  private def port: Int = server.getAddress.getPort
  private def url(path: String) = s"http://127.0.0.1:$port$path"

  override def beforeAll(): Unit = {
    super.beforeAll()
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/embed", (ex: HttpExchange) => {
      requests.incrementAndGet()
      if (failFirst.getAndUpdate(n => math.max(0, n - 1)) > 0) {
        ex.sendResponseHeaders(503, -1); ex.close()
      } else {
        val req = mapper.readTree(ex.getRequestBody)
        val inputs = req.get("inputs")
        val out = mapper.createArrayNode()
        (0 until inputs.size()).foreach { i =>
          val vec = out.addArray()
          HashEmbedder.embed(inputs.get(i).asText(), 16).foreach(vec.add)
        }
        val body = mapper.writeValueAsBytes(out)
        ex.getResponseHeaders.add("Content-Type", "application/json")
        ex.sendResponseHeaders(200, body.length)
        ex.getResponseBody.write(body)
        ex.close()
      }
    })
    // poison routes: reject any batch CONTAINING a poisoned text —
    // /poison400 with a contract 4xx, /poison500 with a crash-style
    // 5xx (the encoder-OOM-on-oversize-input shape); healthy batches
    // serve hash vectors
    def poisonRoute(status: Int): HttpExchange => Unit = (ex: HttpExchange) => {
      requests.incrementAndGet()
      val req = mapper.readTree(ex.getRequestBody)
      val inputs = req.get("inputs")
      val poisoned = (0 until inputs.size())
        .exists(i => inputs.get(i).asText().contains("POISON"))
      if (poisoned) { ex.sendResponseHeaders(status, -1); ex.close() }
      else {
        val out = mapper.createArrayNode()
        (0 until inputs.size()).foreach { i =>
          val vec = out.addArray()
          HashEmbedder.embed(inputs.get(i).asText(), 16).foreach(vec.add)
        }
        val body = mapper.writeValueAsBytes(out)
        ex.sendResponseHeaders(200, body.length)
        ex.getResponseBody.write(body)
        ex.close()
      }
    }
    server.createContext("/poison400", poisonRoute(400)(_))
    server.createContext("/poison500", poisonRoute(500)(_))
    // garbage route: 200 with a non-JSON body
    server.createContext("/garbage", (ex: HttpExchange) => {
      val body = "oops not json".getBytes(StandardCharsets.UTF_8)
      ex.sendResponseHeaders(200, body.length)
      ex.getResponseBody.write(body)
      ex.close()
    })
    // partial route: 200 but always one vector short
    server.createContext("/partial", (ex: HttpExchange) => {
      val req = mapper.readTree(ex.getRequestBody)
      val n = math.max(0, req.get("inputs").size() - 1)
      val out = mapper.createArrayNode()
      (0 until n).foreach { _ =>
        val vec = out.addArray(); (1 to 16).foreach(j => vec.add(j.toFloat))
      }
      val body = mapper.writeValueAsBytes(out)
      ex.sendResponseHeaders(200, body.length)
      ex.getResponseBody.write(body)
      ex.close()
    })
    // body-capture route: records every request body, then serves
    // hash vectors (for the retry-idempotence assertion); first
    // failFirst requests 503
    server.createContext("/capture", (ex: HttpExchange) => {
      val raw = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
      capturedBodies.add(raw)
      if (failFirst.getAndUpdate(n => math.max(0, n - 1)) > 0) {
        ex.sendResponseHeaders(503, -1); ex.close()
      } else {
        val req = mapper.readTree(raw)
        val inputs = req.get("inputs")
        val out = mapper.createArrayNode()
        (0 until inputs.size()).foreach { i =>
          val vec = out.addArray()
          HashEmbedder.embed(inputs.get(i).asText(), 16).foreach(vec.add)
        }
        val body = mapper.writeValueAsBytes(out)
        ex.sendResponseHeaders(200, body.length)
        ex.getResponseBody.write(body)
        ex.close()
      }
    })
    // status routes: always answer the given status, counting requests
    def statusRoute(status: Int): HttpExchange => Unit = (ex: HttpExchange) => {
      requests.incrementAndGet()
      ex.getRequestBody.readAllBytes()
      ex.sendResponseHeaders(status, -1); ex.close()
    }
    server.createContext("/always401", statusRoute(401)(_))
    server.createContext("/always429", statusRoute(429)(_))
    server.createContext("/always503", statusRoute(503)(_))
    // wrong-dim route: serves 4-float vectors whatever the request
    server.createContext("/baddim", (ex: HttpExchange) => {
      val req = mapper.readTree(ex.getRequestBody)
      val out = mapper.createArrayNode()
      (0 until req.get("inputs").size()).foreach { _ =>
        val vec = out.addArray(); (1 to 4).foreach(j => vec.add(j.toFloat))
      }
      val body = mapper.writeValueAsBytes(out)
      ex.sendResponseHeaders(200, body.length)
      ex.getResponseBody.write(body)
      ex.close()
    })
    server.start()
  }

  override def afterAll(): Unit = {
    if (server != null) server.stop(0)
    super.afterAll()
  }

  test("embedColumn over HTTP equals the hash stub through the same trait") {
    val docs = (1 to 10).map(i => (i.toLong, s"doc number $i about topic ${i % 3}"))
      .toDF("id", "text").repartition(2)
    val http = new HttpEmbedder(url("/embed"), dim = 16, batchSize = 4)
    val got = http.embedColumn(docs, "text", "emb")
      .select($"id", $"emb").as[(Long, Seq[Float])].collect().toMap
    val want = docs.select($"id", HashEmbedder.embedCol($"text", 16).as("emb"))
      .as[(Long, Seq[Float])].collect().toMap
    assert(got == want)
  }

  test("batches are amortized: 10 texts at batchSize=4 is 3 HTTP calls") {
    requests.set(0)
    val http = new HttpEmbedder(url("/embed"), dim = 16, batchSize = 4)
    val vecs = Seq("a", "b", "c", "d", "e", "f", "g", "h", "i", "j")
      .grouped(4).flatMap(http.embedBatch).toSeq
    assert(vecs.length == 10)
    assert(requests.get() == 3)
  }

  test("transient 5xx retries and succeeds") {
    failFirst.set(2)
    val http = new HttpEmbedder(url("/embed"), dim = 16, batchSize = 4)
    val vecs = http.embedBatch(Seq("retry me"))
    assert(vecs.head.toSeq == HashEmbedder.embed("retry me", 16).toSeq)
  }

  test("a dim mismatch fails loudly, never mixes vector spaces") {
    val http = new HttpEmbedder(url("/baddim"), dim = 16, batchSize = 4)
    // singleton batch → the isolation wrapper IS the loud failure
    val e = intercept[IllegalStateException](http.embedBatch(Seq("x")))
    assert(e.getMessage.contains("dim"))
  }

  test("a dead endpoint exhausts retries with a clear error") {
    val http = new HttpEmbedder(s"http://127.0.0.1:1/embed", dim = 16,
      batchSize = 4, maxRetries = 1)
    intercept[java.io.IOException](http.embedBatch(Seq("x")))
  }

  test("mid-batch 4xx: bisect isolates the poisoned ROW, not just the batch") {
    requests.set(0)
    val http = new HttpEmbedder(url("/poison400"), dim = 16, batchSize = 8)
    val texts = Seq("a", "b", "c", "d", "e POISON pill", "f", "g", "h")
    val e = intercept[IllegalStateException](http.embedBatch(texts))
    assert(e.getMessage.contains("poisoned row isolated at batch offset 4"),
      e.getMessage)
    assert(e.getMessage.contains("e POISON pill"), e.getMessage)
    assert(e.getMessage.contains("400"), e.getMessage)
    // isolation cost is logarithmic, not linear: the failing path is
    // batch → halves → ... → singleton, plus the healthy siblings
    assert(requests.get() <= 2 * 4 + 1, s"bisect sent ${requests.get()} requests")
  }

  test("mid-batch 5xx (crash-on-input): retries exhaust, then bisect names the row") {
    val http = new HttpEmbedder(url("/poison500"), dim = 16, batchSize = 8,
      maxRetries = 0) // deterministic crash — keep the test fast
    val texts = Seq("a", "b", "POISON oversize doc", "d")
    val e = intercept[IllegalStateException](http.embedBatch(texts))
    assert(e.getMessage.contains("poisoned row isolated at batch offset 2"),
      e.getMessage)
    assert(e.getMessage.contains("POISON oversize doc"), e.getMessage)
  }

  test("malformed and partial responses fail loudly with a row diagnostic") {
    // non-JSON body: every slice fails the same way; the diagnostic
    // still lands on a concrete row with the root cause attached
    val garbage = new HttpEmbedder(url("/garbage"), dim = 16, batchSize = 4)
    val e1 = intercept[IllegalStateException](garbage.embedBatch(Seq("x", "y")))
    assert(e1.getMessage.contains("poisoned row isolated"), e1.getMessage)

    // one-vector-short response: the count mismatch must never be
    // silently zipped/truncated — it isolates and names the cause
    val partial = new HttpEmbedder(url("/partial"), dim = 16, batchSize = 4)
    val e2 = intercept[IllegalStateException](partial.embedBatch(Seq("x", "y")))
    assert(e2.getMessage.contains("vectors for"), e2.getMessage)
  }

  test("401 auth failure is batch-level: one request, no bisection, no row blamed") {
    requests.set(0)
    val http = new HttpEmbedder(url("/always401"), dim = 16, batchSize = 8)
    val e = intercept[HttpEmbedder.BatchFailedException](
      http.embedBatch(Seq("a", "b", "c", "d", "e", "f", "g", "h")))
    assert(e.getMessage.contains("401"), e.getMessage)
    assert(!e.getMessage.contains("poisoned row"), e.getMessage)
    // auth failures must not probe halves — that would hammer the
    // service with doomed requests and end up blaming row 0
    assert(requests.get() == 1, s"sent ${requests.get()} requests for a 401")
  }

  test("429 rate limit: retried with backoff, then batch-level — never bisected") {
    requests.set(0)
    val http = new HttpEmbedder(url("/always429"), dim = 16, batchSize = 8,
      maxRetries = 1)
    val e = intercept[HttpEmbedder.BatchFailedException](
      http.embedBatch(Seq("a", "b", "c", "d")))
    assert(e.getMessage.contains("rate-limiting"), e.getMessage)
    // exactly the retry budget (2 attempts), zero bisection probes —
    // bisecting a throttling service would amplify the load it is
    // already shedding
    assert(requests.get() == 2, s"sent ${requests.get()} requests for 429s")
  }

  test("batch-wide 5xx: both halves fail identically -> batch-level, row 0 not blamed") {
    requests.set(0)
    val http = new HttpEmbedder(url("/always503"), dim = 16, batchSize = 8,
      maxRetries = 0)
    val e = intercept[HttpEmbedder.BatchFailedException](
      http.embedBatch(Seq("a", "b", "c", "d", "e", "f", "g", "h")))
    assert(e.getMessage.contains("batch-wide"), e.getMessage)
    assert(e.getMessage.contains("503"), e.getMessage)
    assert(!e.getMessage.contains("poisoned row"), e.getMessage)
    // full batch + one probe per half, then stop — not a walk to row 0
    assert(requests.get() == 3, s"sent ${requests.get()} requests")
  }

  test("retry idempotence: the identical body is re-sent and yields identical vectors") {
    capturedBodies.clear()
    failFirst.set(2)
    val http = new HttpEmbedder(url("/capture"), dim = 16, batchSize = 4)
    val got = http.embedBatch(Seq("same", "question"))
    // three sends (two 503s + the success), byte-identical bodies —
    // a mid-sequence failure re-poses the same question, it never
    // drifts the request
    val bodies = capturedBodies.toArray(Array.empty[String])
    assert(bodies.length == 3, s"expected 3 sends, saw ${bodies.length}")
    assert(bodies.distinct.length == 1, "retry bodies differ")
    assert(got.head.toSeq == HashEmbedder.embed("same", 16).toSeq)
    assert(got(1).toSeq == HashEmbedder.embed("question", 16).toSeq)
  }
}
