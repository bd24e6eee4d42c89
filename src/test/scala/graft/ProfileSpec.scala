package graft

import org.scalatest.funsuite.AnyFunSuite

/** Deployment profiles are runnable config: the knob set is closed
  * (both profiles pin the same conf keys), sizing scales coherently
  * local → cluster, and the harness session actually carries the
  * Local32 values.
  */
class ProfileSpec extends AnyFunSuite {

  test("both profiles pin the same conf keys; only sizing differs") {
    val l = GraftSession.confs(GraftSession.Local32)
    val c = GraftSession.confs(GraftSession.Cluster1000)
    assert(l.keySet == c.keySet)
    // posture confs identical; sizing confs differ
    val sizing = Set("spark.sql.shuffle.partitions",
      "spark.sql.autoBroadcastJoinThreshold", "spark.sql.files.maxPartitionBytes")
    assert(l.view.filterKeys(!sizing(_)).toMap == c.view.filterKeys(!sizing(_)).toMap)
    sizing.foreach(k => assert(l(k) != c(k), k))
  }

  test("cluster profile scales every sizing knob up from local") {
    val l = GraftSession.Local32; val c = GraftSession.Cluster1000
    assert(c.shufflePartitions > l.shufflePartitions)
    assert(c.broadcastBytes >= l.broadcastBytes)
    assert(c.maxPartitionBytes > l.maxPartitionBytes)
    assert(c.lakeBuckets > l.lakeBuckets)
    assert(c.salts > l.salts)
    assert(c.hotBucketThreshold > l.hotBucketThreshold)
    assert(c.ivfCellFloor >= l.ivfCellFloor)
    // shuffle partitions ≈ 2× the 1000-executor × 4-core fleet
    assert(c.shufflePartitions == 8192)
  }

  test("the harness session carries the Local32 confs") {
    val sp = TestSpark.spark
    assert(sp.conf.get("spark.sql.session.timeZone") == "UTC")
    assert(sp.conf.get("spark.sql.adaptive.enabled") == "true")
    assert(sp.conf.get("spark.sql.autoBroadcastJoinThreshold") ==
      GraftSession.Local32.broadcastBytes.toString)
  }
}
