// Incremental cluster-state advance vs from-scratch connected
// components, at corpus scale: the daily question is "a batch of B new
// near-dup edges arrived against a lake whose dup graph has E edges —
// relabel". A non-incremental pipeline re-runs CC over all E+B edges
// (every round shuffles the full edge set); clusterStateAdvance runs
// CC over ≤ B contracted edges plus two broadcast joins across one
// scan of the persisted assignment. Graph shape mirrors a real dedup
// graph: bulk shallow clusters (near-dup groups of ~4) plus one deep
// templated-drift chain (what forces the star escalation and makes
// from-scratch genuinely expensive).
//
//   sbt 'runMain graft.tools.ClusterStateProbe [nodes] [batchEdges] [chainN]'
package graft.tools

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.operators.Dedup

object ClusterStateProbe {
  def main(args: Array[String]): Unit = {
    val nNodes = if (args.nonEmpty) args(0).toLong else 20000000L
    val nBatch = if (args.length > 1) args(1).toLong else 100000L
    val chainN = if (args.length > 2) args(2).toLong else 100000L
    val spark = GraftSession.local(32, "cluster-state-probe")
    spark.sparkContext.setLogLevel("WARN")

    // state graph: clusters of 4 (j -> base of its aligned 4-block)
    // over [0, nNodes), plus a drift chain through [nNodes, nNodes+chainN)
    val shallow = spark.range(nNodes).filter(pmod(col("id"), lit(4)) =!= 0)
      .select(col("id").as("id_a"), (col("id") - pmod(col("id"), lit(4))).as("id_b"))
    val chain = spark.range(nNodes, nNodes + chainN - 1)
      .select(col("id").as("id_a"), (col("id") + 1).as("id_b"))
    val stateEdges = shallow.unionByName(chain)

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    // bootstrap once and persist the assignment like a state table
    val compDir = "/tmp/graft_cluster_state_probe"
    timed("bootstrap_cc_write") {
      Dedup.connectedComponentsAuto(stateEdges)
        .write.mode(SaveMode.Overwrite).parquet(compDir)
    }
    val comp = spark.read.parquet(compDir)
    println(s"PROBE state_nodes ${comp.count()} state_edges ${stateEdges.count()}")

    // batch: one third new-node attachments (fresh ids pairing into
    // existing clusters), one third cross-cluster merges, one third
    // new-only pairs — deterministic, no Random
    val third = nBatch / 3
    val attach = spark.range(third).select(
      (col("id") * 4 % nNodes).as("id_a"), (col("id") + 2 * nNodes).as("id_b"))
    val merge = spark.range(third).select(
      (col("id") * 8 % nNodes).as("id_a"), ((col("id") * 8 + 4) % nNodes).as("id_b"))
    val fresh = spark.range(third).select(
      (col("id") * 2 + 3 * nNodes).as("id_a"), (col("id") * 2 + 1 + 3 * nNodes).as("id_b"))
    val batch = attach.unionByName(merge).unionByName(fresh)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"PROBE batch_edges ${batch.count()}")

    val incr = timed("incremental_advance") {
      val out = Dedup.clusterStateAdvance(comp, batch)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      out.count(); out
    }
    val scratch = timed("from_scratch_cc") {
      val out = Dedup.connectedComponentsAuto(stateEdges.unionByName(batch))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      out.count(); out
    }
    val diff = timed("exactness_check") {
      incr.exceptAll(scratch).count() + scratch.exceptAll(incr).count()
    }
    println(s"PROBE identical ${diff == 0L} (symmetric diff $diff rows)")
    spark.stop()
  }
}
