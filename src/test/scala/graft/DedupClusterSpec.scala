package graft

import graft.ops.DedupOps

/** Label-propagation clustering invariants on synthetic graphs:
  * correctness on shapes the LSH corpus can't produce (long paths,
  * multiple components), graph-sized — not hardcoded — parallelism,
  * and loud failure instead of a silently-wrong assignment when the
  * round bound is exceeded (the r2 ADVICE items on DedupOps).
  */
class DedupClusterSpec extends SparkTestBase {

  import spark.implicits._

  test("path graph with diameter beyond 10 rounds converges correctly") {
    // 0-1-2-...-30: min-label 0 needs 30 propagation rounds — the old
    // fixed 10-round loop would have returned a wrong assignment here
    val pairs = (0L until 30L).map(i => (i, i + 1)).toDF("a_id", "b_id")
    val got = DedupOps.clusterPairs(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size === 31)
    assert(got.values.toSet === Set(0L))
  }

  test("multiple components keep distinct min-label representatives") {
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L), (21L, 22L))
      .toDF("a_id", "b_id")
    val got = DedupOps.clusterPairs(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("iteration parallelism is sized to the graph, not hardcoded to 1") {
    // the sizing formula scales with the measured edge count...
    assert(DedupOps.clusterPartitions(100L, 1000000L) === 1)
    assert(DedupOps.clusterPartitions(200L, 16L) === 12)
    assert(DedupOps.clusterPartitions(2000000000L, DedupOps.ClusterEdgesPerPartition) === 2000)
    // ...and a multi-partition iteration produces the identical
    // assignment as the single-partition one (100 star edges at 16
    // edges/partition -> 12-partition edge table inside the loop)
    val pairs = (1L until 101L).map(i => (0L, i)).toDF("a_id", "b_id")
    val a = DedupOps.clusterPairs(pairs, edgesPerPartition = 16L).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = DedupOps.clusterPairs(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a === b)
    assert(a.size === 101 && a.values.toSet === Set(0L))
  }
}
