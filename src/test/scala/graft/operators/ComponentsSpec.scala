package graft.operators

import graft.SparkSpec

class ComponentsSpec extends SparkSpec {
  import spark.implicits._

  // every fixture runs BOTH physical paths — the driver union-find
  // (default bound) and the distributed label-propagation loop
  // (forced with driverSafeEdges = -1) — and asserts they agree:
  // the two implementations share one contract
  private def cc(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val df = edges.toDF("src", "dst")
    val local = Dedup.connectedComponents(df)
      .as[(Long, Long)].collect().toMap
    val dist = Dedup.connectedComponents(df, driverSafeEdges = -1L)
      .as[(Long, Long)].collect().toMap
    assert(local == dist,
      s"union-find and label-propagation disagree: $local vs $dist")
    local
  }

  test("chain propagates the min label across its full diameter") {
    // 1-2-3-...-8 takes multiple propagation rounds to converge
    val labels = cc((1L to 7L).map(i => (i, i + 1)))
    assert(labels == (1L to 8L).map(_ -> 1L).toMap)
  }

  test("separate components keep separate canonical labels") {
    val labels = cc(Seq((10L, 11L), (11L, 12L), (20L, 21L), (31L, 30L)))
    assert(labels(12L) == 10L && labels(21L) == 20L && labels(31L) == 30L)
    assert(labels.values.toSet == Set(10L, 20L, 30L))
  }

  test("cycles and triangles converge to the component min") {
    val labels = cc(Seq((5L, 6L), (6L, 7L), (7L, 5L), (7L, 2L)))
    assert(labels.values.toSet == Set(2L))
  }

  test("empty edge set yields an empty labeling") {
    assert(cc(Seq.empty).isEmpty)
  }
}
