package graft.tools

import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.operators.Dedup

/** Propagation vs star-contraction connected components, on the two
  * graph shapes that decide which to use:
  *  - the SHALLOW near-dup graph (LSH pairs over the planted-copies
  *    corpus — diameter 2-3): propagation's 1-join rounds should win;
  *  - a DEEP drift chain (path graph): propagation needs one round per
  *    hop (its 25-round default cannot even converge), star contraction
  *    needs O(log n) rounds.
  * `runMain graft.tools.CcProbe [sfDir] [chainN]`
  */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/tmp/graft_sf1"
    val chainN = if (args.length > 1) args(1).toLong else 200000L
    val spark = GraftSession.local(32, "cc-probe")
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val d = spark.read.parquet(s"$sfDir/documents.parquet").select(col("doc_id"), col("text"))
    val corpus = d.unionByName(d.filter(pmod(col("doc_id"), lit(10)) === 0)
        .select((col("doc_id") + 10000).as("doc_id"), col("text")))
      .unionByName(d.filter(pmod(col("doc_id"), lit(7)) === 0)
        .select((col("doc_id") + 20000).as("doc_id"),
          concat(col("text"), lit(" graft extra marker")).as("text")))
    val pairs = Dedup.minHashLshPairs(corpus, col("doc_id"), col("text"), 3, 4, 4, 0.5)
      .select(col("id_a"), col("id_b")).persist()
    println(s"PROBE shallow_edges ${pairs.count()}")

    def time(label: String)(f: => Long): Unit = {
      val runs = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"PROBE $label%-24s ${runs.map(_._1).min}%.2f s rows=${runs.head._2}")
    }

    time("propagation_shallow")(Dedup.connectedComponents(pairs).count())
    time("star_shallow")(Dedup.connectedComponentsStar(pairs).count())

    val chain = spark.range(chainN - 1)
      .select(col("id").as("id_a"), (col("id") + 1).as("id_b")).persist()
    println(s"PROBE chain_edges ${chain.count()}")
    val (lbl, rounds) = Dedup.ccStarWithRounds(chain, maxRounds = 40)
    val t0 = System.nanoTime()
    val (lbl2, rounds2) = Dedup.ccStarWithRounds(chain, maxRounds = 40)
    val starT = (System.nanoTime() - t0) / 1e9
    val allMin = lbl2.filter(col("cluster_id") === 0).count()
    println(f"PROBE star_chain $starT%.2f s rounds=$rounds2 correct=${allMin == chainN}")
    // propagation at its default cap: pays maxRounds full rounds and
    // STILL cannot converge on a deep chain (one hop per round)
    val t1 = System.nanoTime()
    val p = Dedup.connectedComponents(chain, maxRounds = 25)
    val pMin = p.filter(col("cluster_id") === 0).count()
    val propT = (System.nanoTime() - t1) / 1e9
    println(f"PROBE propagation_chain $propT%.2f s labeled_to_min=$pMin/$chainN (unconverged expected)")
    spark.stop()
  }
}
