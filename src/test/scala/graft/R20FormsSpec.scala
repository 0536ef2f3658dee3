package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{Multimodal, TimeSeriesOps}

/** Pins the r20 optimization-round query rewrites to the exact forms
  * they replaced, on the real sf0.001 tables (the committed registry
  * entry vs the pre-r20 form, row-for-row including order):
  *  - sessionize: one-window boundary form == lag+cumsum two-window
  *    form;
  *  - url_canonical: url-level two-stage aggregate == direct
  *    groupBy(canonical) + count_distinct(url);
  *  - a8_interpolate: single-select fused neighbor window == the
  *    withColumn chain (3 WindowExecs) it replaced;
  *  - multimodal_decode: expression-based decode == the mapPartitions
  *    Row-encoder decode over the stub.
  */
class R20FormsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def rows(df: org.apache.spark.sql.DataFrame) = df.collect().toSeq

  test("sessionize: boundary form equals two-window form") {
    val got = rows(SparkEntry.queries("sessionize")(spark, dir))
    val byUser = Window.partitionBy("user_id").orderBy("tsu")
    val gapUs = lit(30L * 60 * 1000000)
    val old = rows(Tables.load(spark, dir, "events")
      .filter(col("user_id") < 10)
      .select(col("user_id"), unix_micros(col("ts")).as("tsu"))
      .withColumn("new_sess",
        when(col("tsu") - lag("tsu", 1).over(byUser) > gapUs, 1L)
          .otherwise(0L))
      .withColumn("sess_id", sum("new_sess").over(byUser))
      .groupBy(col("user_id"), col("sess_id"))
      .agg(count(lit(1)).as("n_events"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"),
        sum("n_events").cast("bigint").as("total_events"),
        max("n_events").as("max_session_events"))
      .coalesce(1).sortWithinPartitions("user_id"))
    assert(got.nonEmpty && got == old)
  }

  test("url_canonical: url-level two-stage agg equals direct canonical agg") {
    val got = rows(SparkEntry.queries("url_canonical")(spark, dir))
    // the old form, reconstructed over the same synthesized url column
    val hosts = array(lit("News.Example.COM"), lit("blog.example.org"),
      lit("Docs.Example.IO"), lit("wiki.example.edu"),
      lit("Shop.Example.CO"))
    val raw = Tables.load(spark, dir, "documents").select(col("doc_id"),
      concat(
        when(col("doc_id") % 2 === 0, lit("HTTPS://")).otherwise(lit("https://")),
        when(col("doc_id") % 3 === 0, lit("WWW.")).otherwise(lit("")),
        element_at(hosts, (col("doc_id") % 5).cast("int") + 1),
        lit("/doc/"), (col("doc_id") % 40).cast("string"),
        when(col("doc_id") % 7 === 0, lit("/")).otherwise(lit("")),
        when(col("doc_id") % 2 === 0, lit("?utm_source=feed&utm_campaign=sync"))
          .otherwise(lit("")),
        when(col("doc_id") % 5 === 0, concat(lit("&gclid=g"), col("doc_id")))
          .otherwise(lit("")),
        when(col("doc_id") % 3 === 1, concat(lit("#sec"), (col("doc_id") % 4).cast("string")))
          .otherwise(lit(""))).as("url"))
    val old = rows(raw
      .select(col("url"),
        graft.plans.UrlCanonical.canonicalCol(col("url")).as("canonical"))
      .groupBy("canonical")
      .agg(count(lit(1)).as("n_docs"), count_distinct(col("url")).as("n_raw"))
      .coalesce(1).sortWithinPartitions("canonical"))
    assert(got.nonEmpty && got == old)
  }

  test("a8_interpolate: fused neighbor window equals the withColumn chain") {
    val got = rows(SparkEntry.queries("a8_interpolate")(spark, dir))
    val daily = Tables.load(spark, dir, "events")
      .filter(col("event_type") === "purchase" && col("user_id") < 20)
      .groupBy(col("user_id"), TimeSeriesOps.utcDay(col("ts")).as("day"))
      .agg(count(lit(1)).cast("double").as("v"))
    val spine = TimeSeriesOps.toDailySpine(daily, Seq("user_id"), "day", "v")
    val byKey = Window.partitionBy(col("user_id")).orderBy(col("day"))
    val before = byKey.rowsBetween(Window.unboundedPreceding, 0)
    val after = byKey.rowsBetween(0, Window.unboundedFollowing)
    val v = col("v")
    val maxGap = 3
    val withNeighbors = spine
      .withColumn("_pv", last(v, ignoreNulls = true).over(before))
      .withColumn("_pd", last(when(v.isNotNull, col("day")),
        ignoreNulls = true).over(before))
      .withColumn("_nv", first(v, ignoreNulls = true).over(after))
      .withColumn("_nd", first(when(v.isNotNull, col("day")),
        ignoreNulls = true).over(after))
    val dL = datediff(col("day"), col("_pd"))
    val dR = datediff(col("_nd"), col("day"))
    val inReach = (col("_pd").isNotNull && dL <= maxGap) ||
      (col("_nd").isNotNull && dR <= maxGap)
    val interp = col("_pv") +
      (col("_nv") - col("_pv")) * dL.cast("double") /
        datediff(col("_nd"), col("_pd")).cast("double")
    val filled = when(v.isNotNull, v)
      .when(!inReach, lit(null))
      .when(col("_pd").isNotNull && col("_nd").isNotNull, interp)
      .when(col("_nd").isNotNull, col("_nv"))
      .when(col("_pd").isNotNull, col("_pv"))
    val old = rows(withNeighbors.withColumn("v", filled)
      .select(col("user_id"), col("day"), round(col("v"), 4).as("v"))
      .coalesce(1).sortWithinPartitions("user_id", "day"))
    assert(got.nonEmpty && got == old)
  }

  test("date_parts: trunc-month grouping equals (year, month) grouping") {
    val got = rows(SparkEntry.queries("date_parts")(spark, dir))
    val old = rows(Tables.load(spark, dir, "lineitem")
      .groupBy(year(col("l_shipdate")).cast("bigint").as("y"),
        month(col("l_shipdate")).cast("bigint").as("m"))
      .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("qty"))
      .coalesce(1).sortWithinPartitions("y", "m"))
    assert(got.nonEmpty && got == old)
  }

  test("multimodal decode: expression form equals the mapPartitions stub") {
    // the query's own asset frame at sf0.001, decoded both ways
    val assets = Tables.loadParallel(spark, dir, "documents")
      .select(col("doc_id").as("asset_id"),
        when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio").otherwise("video")
          .as("media_type"),
        concat(lit("mem://"), col("doc_id")).as("uri"),
        encode(col("text"), "UTF-8").as("bytes"),
        map(lit("src"), col("source")).as("meta"))
    val got = Multimodal.decode(assets)
      .select(col("asset_id"), col("decoded.width"), col("decoded.height"),
        col("decoded.duration_s"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getDouble(3)))
      .toSeq.sortBy(_._1)
    val old = assets.select(col("asset_id"), col("bytes")).collect()
      .map { r =>
        val (w, h, d) = Multimodal.decodeStub(r.getAs[Array[Byte]]("bytes"))
        (r.getLong(0), w, h, d)
      }.toSeq.sortBy(_._1)
    assert(got.nonEmpty && got == old)
  }
}
