package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.format.converter.ParquetMetadataConverter
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Root-causes the r15 x1000 lineitem scan-floor collapse (223 MB/s,
  * 18.8× DuckDB; a zero-column `count(*)` at 38 s isolated) by
  * measuring the SAME 600 M-row table in four physical layouts
  * (scripts/gen_layouts.py):
  *
  *   - per-layout: footer row-group count, serialized footer bytes,
  *     and the wall of ONE direct `ParquetFileReader` footer parse —
  *     the unit of work Spark repeats once per input split while
  *     DuckDB pays it once per file;
  *   - per-layout: `count(*)` (zero columns — isolates metadata cost
  *     from decode) and the scan_floor 2-column aggregate, min-of-2
  *     after a warm pass, at the session's 32 MB maxPartitionBytes;
  *   - on the adversarial layout only: a maxPartitionBytes sweep
  *     (32/128/512 MB) over `count(*)` — if the wall scales with the
  *     split count at fixed data, the cost is per-split metadata, not
  *     decode.
  *
  * Emits ONE JSON line (and writes it to SPARK_GRAFT_SCANFLOOR_OUT if
  * set) so the evidence lands in a committed artifact.
  *
  * Run: `SPARK_GRAFT_LAYOUTS_DIR=/tmp/layouts sbt -batch "runMain graft.ProfileScanFloor"`.
  */
object ProfileScanFloor {

  private def footerStats(dir: String): (Int, Long, Long, Double, Int) = {
    // (totalRowGroups, totalFooterBytes, totalDataBytes, oneFooterParseSec, filesCount)
    val p = Paths.get(dir, "lineitem.parquet")
    val files =
      if (Files.isDirectory(p)) {
        val st = Files.list(p)
        try st.iterator().asScala.filter(_.toString.endsWith(".parquet")).toSeq.sortBy(_.toString)
        finally st.close()
      } else Seq(p)
    val conf = new Configuration()
    var groups = 0
    var footerBytes = 0L
    files.foreach { f =>
      val len = Files.size(f)
      // footer length lives in the 8 trailing bytes: 4-byte little-endian
      // length + "PAR1" magic
      val ch = Files.newByteChannel(f)
      try {
        val buf = java.nio.ByteBuffer.allocate(8).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        ch.position(len - 8); ch.read(buf); buf.flip()
        footerBytes += buf.getInt().toLong
      } finally ch.close()
      val in = HadoopInputFile.fromPath(new Path(f.toUri), conf)
      val r = ParquetFileReader.open(in,
        org.apache.parquet.ParquetReadOptions.builder()
          .withMetadataFilter(ParquetMetadataConverter.NO_FILTER).build())
      try groups += r.getFooter.getBlocks.size()
      finally r.close()
    }
    // time ONE full-footer parse of the FIRST file (the per-split unit)
    val f0 = HadoopInputFile.fromPath(new Path(files.head.toUri), conf)
    def parseOnce: Double = {
      val t0 = System.nanoTime()
      val r = ParquetFileReader.open(f0,
        org.apache.parquet.ParquetReadOptions.builder()
          .withMetadataFilter(ParquetMetadataConverter.NO_FILTER).build())
      try r.getFooter.getBlocks.size()
      finally r.close()
      (System.nanoTime() - t0) / 1e9
    }
    parseOnce // JIT/page-cache warm
    val w = (1 to 3).map(_ => parseOnce).min
    (groups, footerBytes, files.map(Files.size).sum, w, files.size)
  }

  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_LAYOUTS_DIR", "/tmp/layouts")
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.range(100000).agg(sum("id")).collect() // JIT warm

    def timed2(mk: => DataFrame): Double = {
      def once = {
        val t0 = System.nanoTime()
        mk.write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      once // warm (page cache + codegen)
      (1 to 2).map(_ => once).min
    }

    val layouts = Seq("rg20k_1file", "rg122k_1file", "rg122k_multi", "rg20k_multi")
      .filter(l => Files.exists(Paths.get(base, l)))

    val perLayout = layouts.map { l =>
      val dir = s"$base/$l"
      val (groups, fBytes, dataBytes, footerSec, nFiles) = footerStats(dir)
      def df = spark.read.parquet(s"$dir/lineitem.parquet")
      val cnt = timed2(df.groupBy().count())
      val agg = timed2(df.agg(sum("l_extendedprice"), avg("l_quantity"), count(lit(1))))
      val mb = dataBytes / 1e6
      System.err.println(f"[scanfloor] $l%-14s files=$nFiles groups=$groups footer=${fBytes / 1e6}%.1fMB parse1=$footerSec%.3fs count=$cnt%.2fs agg2col=$agg%.2fs (${mb / agg}%.0f MB/s)")
      s""""$l":{"files":$nFiles,"row_groups":$groups,"footer_mb":${"%.2f".format(fBytes / 1e6)},"data_mb":${"%.0f".format(mb)},"footer_parse1_s":${"%.3f".format(footerSec)},"count_star_s":${"%.2f".format(cnt)},"agg_2col_s":${"%.2f".format(agg)},"agg_mb_per_s":${"%.0f".format(mb / agg)}}"""
    }

    // maxPartitionBytes sweep on the adversarial layout: same bytes,
    // same groups — only the SPLIT COUNT changes. Footer-per-split
    // cost predicts wall ∝ splits; decode cost predicts a flat line.
    val sweep = if (!layouts.contains("rg20k_1file")) "" else {
      val dir = s"$base/rg20k_1file"
      val walls = Seq(32L, 128L, 512L).map { mbSz =>
        spark.conf.set("spark.sql.files.maxPartitionBytes", mbSz * 1024 * 1024)
        val w = timed2(spark.read.parquet(s"$dir/lineitem.parquet").groupBy().count())
        System.err.println(f"[scanfloor] sweep maxPartitionBytes=${mbSz}MB count=$w%.2fs")
        s""""${mbSz}mb":${"%.2f".format(w)}"""
      }
      spark.conf.set("spark.sql.files.maxPartitionBytes", 32L * 1024 * 1024)
      s""","max_partition_bytes_sweep_count_star":{${walls.mkString(",")}}"""
    }

    val json =
      s"""{"metric":"scanfloor_layout_ab","table":"lineitem_x1000","layouts":{${perLayout.mkString(",")}}$sweep}"""
    println(json)
    sys.env.get("SPARK_GRAFT_SCANFLOOR_OUT").foreach { out =>
      Files.write(Paths.get(out), json.getBytes("UTF-8"))
    }
    spark.stop()
  }
}
