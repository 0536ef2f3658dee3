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
    val e = intercept[IllegalArgumentException](http.embedBatch(Seq("x")))
    assert(e.getMessage.contains("dim"))
  }

  test("a dead endpoint exhausts retries with a clear error") {
    val http = new HttpEmbedder(s"http://127.0.0.1:1/embed", dim = 16,
      batchSize = 4, maxRetries = 1)
    intercept[java.io.IOException](http.embedBatch(Seq("x")))
  }
}
