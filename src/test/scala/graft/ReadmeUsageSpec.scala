package graft

import org.apache.spark.sql.functions._

/** Compiles and runs the README "Library usage" examples VERBATIM —
  * the README section and this spec must stay in sync (the examples'
  * bodies are copied character-for-character, minus the surrounding
  * test scaffolding), so a facade signature change that would break a
  * README reader breaks the build first. */
class ReadmeUsageSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("README example 1: ingest a table into a chunked vector index, then search it") {
    // --- README: ingest + search ---
    import graft.ingest.Ingest
    import graft.search.SearchPipeline

    val docs = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("source").as("title"), col("text"))
    val schema = Ingest.inferSchema(docs.columns.toSeq) // finds id/title/text cols
    val index = Ingest.buildIndex(docs, schema, saveName = "kb", dim = 256)
    val hits = SearchPipeline.search(index, "climate research data", topK = 5, dim = 256)
    // hits: (save_name, chunk_id, doc_id, ..., content, score, marker "S1"..)
    // --- end README ---
    assert(index.columns.contains("embedding"))
    val rows = hits.collect()
    assert(rows.length <= 5)
    assert(hits.columns.contains("marker"))
  }

  test("README example 2: near-duplicate detection and dedup clusters") {
    // --- README: dedup ---
    import graft.operators.Dedup

    val docs = Tables.load(spark, dir, "documents").select("doc_id", "text")
    val pairs = Dedup.minhashNearDups(docs, idCol = "doc_id", textCol = "text",
      shingleN = 3, numHashes = 16, bands = 4, threshold = 0.7)
    // pairs: (idA, idB, jaccard) — candidates from LSH buckets only,
    // exact Jaccard verified, never all-pairs
    val clusters = Dedup.connectedComponents(
      pairs.select(col("idA").as("src"), col("idB").as("dst")))
    // clusters: (id, label) — keep min(id) per label to dedup
    // --- end README ---
    val labeled = clusters.collect()
    assert(labeled.forall(_.size == 2))
    // every endpoint of every pair is labeled
    val ids = pairs.select(col("idA")).union(pairs.select(col("idB")))
      .distinct().count()
    assert(labeled.length.toLong == ids)
  }

  test("README example 3: resample, spine, gap-limited interpolation") {
    // --- README: time series ---
    import graft.operators.TimeSeriesOps

    val events = Tables.load(spark, dir, "events").filter(col("user_id") < 20)
    val daily = TimeSeriesOps.dailyResample(
      events, Seq(col("user_id")), col("ts"), col("value"))
    val spine = TimeSeriesOps.toDailySpine(daily, Seq("user_id"), "day", "avg_value")
    val filled = TimeSeriesOps.interpolateGapLimited(
      spine, Seq("user_id"), "day", "avg_value", maxGap = 14)
    // filled: every (user_id, day) in each user's range, nulls filled
    // by time-weighted interpolation when a valid value is <= 14 days
    // away on either side — pandas interpolate(method='time',
    // limit_direction='both') parity, thousands of series per shuffle
    // --- end README ---
    assert(filled.columns.toSeq == Seq("user_id", "day", "avg_value"))
    val gaps = spine.filter(col("avg_value").isNull).count()
    val remaining = filled.filter(col("avg_value").isNull).count()
    assert(remaining <= gaps)
  }

  test("README example 4: stateful streaming sentence segmentation") {
    // --- README: streaming ---
    import graft.streaming.SentenceSegmenter
    import graft.streaming.SentenceSegmenter.TokenChunk
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val source = MemoryStream[TokenChunk] // any Dataset[TokenChunk] stream works
    val sentences = SentenceSegmenter.segmentStream(source.toDS())
    val q = sentences.writeStream.format("memory").queryName("readme_sentences")
      .outputMode("append").start()
    source.addData(TokenChunk("s1", 0, "Hello wor"), TokenChunk("s1", 1, "ld. Next"))
    q.processAllAvailable(); q.stop()
    // table readme_sentences: ("s1", 0, "Hello world.", isFinal=false, …);
    // "Next" stays buffered in the per-session keyed state — pass
    // timeout = Some("30 seconds") to flush and GC abandoned sessions
    // --- end README ---
    val got = spark.table("readme_sentences")
      .select("sentence").as[String].collect().toSeq
    assert(got == Seq("Hello world."))
  }
}
