package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Property test: `Relational.bitmapSemiJoin` must equal the plain
  * broadcast left-semi join on RANDOMIZED key spaces — negative keys,
  * duplicate keys, null fact keys, keys straddling zero, and spans
  * chosen to exercise BOTH the bitset fast path and the sparse
  * hash-set path (LongSetContains, including the Long-overflow span
  * guard and the 0-key sentinel carried out-of-band). Seeded
  * generation keeps failures reproducible. */
class BitmapSemiJoinPropertySpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(42)

  private def check(factKeys: Seq[Option[Long]], keys: Seq[Long],
                    label: String): Unit = {
    val fact = factKeys.zipWithIndex.map { case (k, i) => (k, s"r$i") }
      .toDF("k", "p")
    val dim = keys.toDF("kk")
    val viaBitmap = Relational.bitmapSemiJoin(fact, dim, "k", "kk")
      .select("p").as[String].collect().toSet
    val viaJoin = fact.join(broadcast(dim), fact("k") === dim("kk"), "left_semi")
      .select("p").as[String].collect().toSet
    assert(viaBitmap == viaJoin,
      s"$label: bitmap=${viaBitmap.size} join=${viaJoin.size} " +
        s"diff=${(viaBitmap diff viaJoin) ++ (viaJoin diff viaBitmap)}")
  }

  test("random dense key spaces straddling zero (bitset path)") {
    (1 to 8).foreach { round =>
      val keys = Seq.fill(40)(rnd.nextLong() % 500) // dupes + negatives
      val factKeys = Seq.fill(300)(
        if (rnd.nextInt(20) == 0) None else Some(rnd.nextLong() % 600))
      check(factKeys, keys, s"dense round $round")
    }
  }

  test("sparse key spaces take the hash-set path, including Long-overflow spans") {
    // span > maxBitmapBytes*8 → LongSetContains; mn<0 with mx near
    // MaxValue makes (mx-mn) overflow Long — the BigInt guard must
    // route these to the set, never allocate
    val cases = Seq(
      Seq(Long.MinValue + 10, Long.MaxValue - 10),
      Seq(-5L, Long.MaxValue - 3),
      Seq(Long.MinValue + 1, -7L, 0L, 3L))
    cases.zipWithIndex.foreach { case (keys, i) =>
      val factKeys = (keys.map(Some(_)) ++
        Seq.fill(50)(Some(rnd.nextLong())) :+ None).reverse
      check(factKeys, keys, s"sparse case $i")
    }
  }

  test("random wide sparse key sets (hash-set path, many keys, 0 included)") {
    (1 to 4).foreach { round =>
      // full-width random longs → span always overflows the bitmap
      // budget; 0L planted so the out-of-band zero sentinel is hit
      val keys = (Seq.fill(200)(rnd.nextLong()) :+ 0L).distinct
      val factKeys =
        Seq.fill(400)(if (rnd.nextInt(10) == 0) None
          else if (rnd.nextInt(3) == 0) Some(keys(rnd.nextInt(keys.length)))
          else Some(rnd.nextLong())) :+ Some(0L)
      check(factKeys, keys, s"wide sparse round $round")
    }
  }

  test("single-key and all-matching edges") {
    check(Seq(Some(7L), Some(7L), Some(8L), None), Seq(7L), "single key")
    check(Seq(Some(1L), Some(2L), Some(3L)), Seq(1L, 2L, 3L), "all match")
    check(Seq(Some(Long.MinValue), Some(Long.MaxValue)),
      Seq(Long.MinValue), "min-value key")
  }
}
