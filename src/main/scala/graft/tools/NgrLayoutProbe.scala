package graft.tools

import org.apache.spark.sql.functions._
import graft.operators.DupState

/** Paired measurement of the DupState `ngr` layouts (VERDICT r14 #2):
  * the advance's broadcast-filtered bands/ngr scan is the dup
  * subsystem's only corpus-growth term, and the exploded (doc_id, ng)
  * layout carries ~200 rows/doc through it. The probe bootstraps the
  * SAME corpus twice — once per layout (the initImpl/advanceImpl
  * toggles, same code path otherwise) — then times load → advance →
  * saveDelta against each chain, min-of-2 per layout, and checks the
  * two advanced assignments are identical. Corpus = documents ×
  * factor (the DupStateProbe replica layout, constant batch size);
  * run at two factors for the growth slope. Args:
  * [sfDir] [factors=4,10].
  */
object NgrLayoutProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factors = args.lift(1).getOrElse("4,10").split(",").map(_.trim.toInt).toSeq
    val spark = graft.GraftSession.local(32, "ngr-layout-probe")
    spark.sparkContext.setLogLevel("WARN")
    def fmt(v: Double) = String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))

    val d0 = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val n0 = d0.count()

    val rows = factors.flatMap { factor =>
      // replica offset 1e8: the sf1 replica's OWN doc_ids already span
      // ~[0, 1e7) (SfxGen uses 1e6 strides), so the DupStateProbe 1e6
      // stride would COLLIDE replica ids and merge unrelated docs —
      // duplicate doc_ids break the one-doc-one-id contract and every
      // count derived from it (caught by this probe's first run)
      val corpus = (0 until factor).map { r =>
        d0.select((col("doc_id") + lit(r * 100000000L)).as("doc_id"),
          concat(lit(s"r$r "), col("text")).as("text"))
      }.reduce(_ unionByName _)
      val r0 = corpus.filter(col("doc_id") < 100000000L)
      val batch = r0.filter(pmod(col("doc_id"), lit(10)) === 0)
        .select((col("doc_id") + 10000000000L).as("doc_id"), col("text"))
        .unionByName(r0.filter(pmod(col("doc_id"), lit(7)) === 0)
          .select((col("doc_id") + 20000000000L).as("doc_id"),
            concat(col("text"), lit(" graft extra marker")).as("text")))

      val out = Seq(true -> "array", false -> "exploded").map { case (arr, tag) =>
        val dir = s"file:///tmp/graft_ngr_layout_${tag}_$factor"
        val fs = new org.apache.hadoop.fs.Path(dir)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(dir), true)
        val tB = System.nanoTime()
        DupState.save(DupState.initImpl(corpus, col("doc_id"), col("text"),
          3, 4, 4, 0.5, 0, arrayNgr = arr), dir, 0L)
        val boot = (System.nanoTime() - tB) / 1e9
        // min-of-2 advances (idempotent rewrite of v=1 — the replay contract)
        val walls = (1 to 2).map { _ =>
          val t0 = System.nanoTime()
          val st = DupState.load(spark, dir, upTo = 0L)._2
          DupState.saveDelta(DupState.advanceImpl(st, batch, col("doc_id"), col("text"),
            3, 4, 4, 0.5, 0, arrayNgr = arr), dir, 1L)
          (System.nanoTime() - t0) / 1e9
        }
        val ngrRows = spark.read.parquet(s"$dir/v=0/ngr").count()
        (tag, boot, walls.min, ngrRows, dir)
      }
      // exactness: both layouts' advanced assignments must be identical
      val comps = out.map { case (_, _, _, _, dir) =>
        DupState.load(spark, dir, upTo = 1L)._2.comp }
      val diff = comps(0).exceptAll(comps(1)).count() +
        comps(1).exceptAll(comps(0)).count()
      out.map { case (tag, boot, adv, ngrRows, _) =>
        s"""{"factor":$factor,"docs":${n0 * factor},"layout":"$tag",""" +
          s""""ngr_base_rows":$ngrRows,"bootstrap_sec":${fmt(boot)},""" +
          s""""advance_min2_sec":${fmt(adv)},"parity_diff":$diff}"""
      }
    }
    println(s"""{"probe":"ngr_layout","sf":"$sfDir","rows":[${rows.mkString(",")}]}""")
    spark.stop()
  }
}
