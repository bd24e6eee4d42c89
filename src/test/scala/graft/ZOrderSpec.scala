package graft

import org.apache.spark.sql.functions._
import graft.sources.{Lake, Tables}

/** Morton-key correctness and the actual pruning payoff of the
  * Z-ordered layout: files whose parquet min/max stats overlap a
  * two-dimensional range predicate, Z-order vs arrival order.
  */
class ZOrderSpec extends SparkSpecBase {

  private def refMorton(a: Long, b: Long, bits: Int): Long =
    (0 until bits).map { i =>
      (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))
    }.reduce(_ | _)

  test("mortonKey equals the bit-interleave reference") {
    val sp = spark
    import sp.implicits._
    val rnd = new scala.util.Random(7)
    val pts = Seq.fill(200)((rnd.nextInt(1 << 14).toLong, rnd.nextInt(1 << 14).toLong))
    val got = pts.toDF("a", "b")
      .select(col("a"), col("b"), Lake.mortonKey(col("a"), col("b"), 14).as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (a, b, z) => assert(z == refMorton(a, b, 14), s"($a, $b)") }
  }

  test("z-ordered layout prunes more files than arrival order under a 2-D range predicate") {
    // sf0.01 for enough rows to fill 16 files meaningfully
    val e = Tables.events(spark, "/root/testdata/sf0.01").drop("ts_ns")
    val zPath = "/tmp/graft_zorder_spec/z"
    val aPath = "/tmp/graft_zorder_spec/arrival"
    Lake.writeZOrdered(e, zPath, col("user_id"), floor(col("value")).cast("long"), 14, 16)
    e.repartition(16).write.mode("overwrite").parquet(aPath)

    // a file can be SKIPPED iff its [min,max] envelope misses the
    // predicate on either dimension — exactly what parquet row-group
    // stats give the reader
    def overlapping(path: String): (Int, Int) = {
      val files = new java.io.File(path).listFiles()
        .filter(f => f.getName.endsWith(".parquet")).map(_.getAbsolutePath)
      val hit = files.count { f =>
        val r = spark.read.parquet(f)
          .agg(min(col("user_id")), max(col("user_id")), max(col("value")))
          .head()
        val (lo, hi, vmax) = (r.getLong(0), r.getLong(1), r.getDouble(2))
        hi >= 4L && lo <= 11L && vmax >= 50.0
      }
      (hit, files.length)
    }
    val (zHit, zTot) = overlapping(zPath)
    val (aHit, aTot) = overlapping(aPath)
    // arrival order scatters every user across every file -> no
    // pruning; z-order confines the user range to a few files
    assert(aHit == aTot, s"arrival layout unexpectedly prunable: $aHit/$aTot")
    assert(zHit < zTot / 2, s"z-order pruned too little: $zHit/$zTot files overlap")
    // and the q109 result itself is layout-independent
    val viaZ = spark.read.parquet(zPath)
      .filter(col("user_id").between(4, 11) && col("value") >= 50.0).count()
    val direct = e.filter(col("user_id").between(4, 11) && col("value") >= 50.0).count()
    assert(viaZ == direct)
  }
}
