package graft

import org.scalatest.funsuite.AnyFunSuite

/** The cluster-conf derivation: shuffle partitions sized by whichever of
  * task waves and shuffle-partition bytes demands more. */
class GraftSessionSpec extends AnyFunSuite {

  test("small input: partition count driven by core waves") {
    val conf = GraftSession.clusterConf(totalCores = 1000, inputBytes = 10L << 30)
    assert(conf("spark.sql.shuffle.partitions") == "2000")
  }

  test("100 TB input: partition count driven by spill-safe partition size") {
    val conf = GraftSession.clusterConf(totalCores = 1000, inputBytes = 100L << 40)
    val n = conf("spark.sql.shuffle.partitions").toLong
    // 100 TiB / 200 MiB = 524288 partitions — each holds ~200 MiB
    assert(n == (100L << 40) / GraftSession.targetShufflePartitionBytes)
    assert(n > 2000)
  }

  test("conf enables the adaptive and CBO machinery the operators rely on") {
    val conf = GraftSession.clusterConf(32, 1L << 30)
    assert(conf("spark.sql.adaptive.skewJoin.enabled") == "true")
    assert(conf("spark.sql.cbo.enabled") == "true")
    assert(conf("spark.sql.autoBroadcastJoinThreshold").toLong == 64L * 1024 * 1024)
  }
}
