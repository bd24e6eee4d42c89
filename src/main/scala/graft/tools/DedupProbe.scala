// Stage-level timing probe for the LSH dedup pipelines at sf0.1.
//   sbt 'runMain graft.tools.DedupProbe [sfDir]'
package graft.tools

import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.operators.Dedup
import graft.sources.Tables

object DedupProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = GraftSession.local(32, "dedup-probe")
    val d = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val corpus = d.unionByName(d.filter(pmod(col("doc_id"), lit(10)) === 0)
        .select((col("doc_id") + 10000).as("doc_id"), col("text")))
      .unionByName(d.filter(pmod(col("doc_id"), lit(7)) === 0)
        .select((col("doc_id") + 20000).as("doc_id"),
          concat(col("text"), lit(" graft extra marker")).as("text")))
    corpus.persist(); corpus.count()

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    // minhash stages
    val ngr = corpus.select(col("doc_id"), explode(Dedup.hashedNgrams(corpus, col("text"), 3)).as("ng"))
      .persist()
    t("ngr materialize")(ngr.count())
    val mins = (0 until 16).map(s => min(Dedup.minHashPerm(col("ng"), s)).as(s"m$s"))
    val sigs = ngr.groupBy(col("doc_id")).agg(mins.head, mins.tail: _*).persist()
    t("signatures")(sigs.count())
    val banded = sigs.select(col("doc_id"),
        explode(array((0 until 4).map(b => struct(lit(b).as("band"),
          concat_ws(",", (b * 4 until (b + 1) * 4).map(i => col(s"m$i").cast("string")): _*).as("bh"))): _*)).as("bk"))
      .select(col("doc_id"), col("bk.band"), col("bk.bh")).persist()
    t("banding")(banded.count())
    val cand = banded.select(col("doc_id").as("id_a"), col("band"), col("bh"))
      .join(banded.select(col("doc_id").as("id_b"), col("band"), col("bh")), Seq("band", "bh"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).distinct().persist()
    val nc = t("candidate join")(cand.count())
    println(s"[probe] candidates = $nc")
    val inter = cand
      .join(ngr.select(col("doc_id").as("id_a"), col("ng")), Seq("id_a"))
      .join(ngr.select(col("doc_id").as("id_b"), col("ng")), Seq("id_b", "ng"))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("inter"))
    t("verify join")(inter.count())
    t("full minHashLshPairs")(
      Dedup.minHashLshPairs(corpus, col("doc_id"), col("text"), 3, 4, 4, 0.5).count())
    t("full simHashPairs")(
      Dedup.simHashPairs(corpus, col("doc_id"), col("text"), 7).count())
    t("full ngramJaccardPairs")(
      Dedup.ngramJaccardPairs(corpus, col("doc_id"), col("text"), 3, 20, 0.5).count())
    // simhash stages
    val sh = Dedup.simHashDf(corpus, col("doc_id"), col("text")).persist()
    t("simhash signatures")(sh.count())
    spark.stop()
  }
}
