package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity
import graft.sources.Tables

/** Gates the auto-calibrated multi-table LSH knobs (VERDICT r5 #4):
  * lshMultiKnobs derives (nBits, nTables) from a corpus count via the
  * RecallProbe-measured rule, and the derived configuration must hold
  * recall@10 ≥ 0.7 at BOTH gate scales — 2k real vectors (sf0.1) and
  * the 20k sf1 replica — so the q78 contract is no longer a literal
  * calibrated for one corpus size.
  */
class AnnAutoSpec extends SparkSpecBase {

  /** The 20k-vector replica the sf1 gates run on. Generated on demand
    * (seconds — embeddings only) instead of `assume`-canceling when
    * SfxGen was never run in the session: a spec-gated SURVEY recall
    * contract must not silently skip on a fresh checkout (VERDICT r12
    * #3). Idempotent across suites in the JVM and across sessions —
    * SfxGen's replica is deterministic, so an existing file is the
    * same data.
    */
  private lazy val sf1Dir: String = {
    val out = "/tmp/graft_sf1"
    val base = "/root/testdata/sf0.1"
    // Validate a pre-existing replica before trusting it (ADVICE r13):
    // SfxGen's base/out/factor are CLI-overridable, so the fixed shared
    // path may hold a replica of the wrong factor/base or a partial
    // write — count is parquet-footer metadata, so the check is cheap.
    val expected = spark.read.parquet(s"$base/embeddings.parquet").count() * 10
    def rows: Option[Long] =
      try Some(spark.read.parquet(s"$out/embeddings.parquet").count())
      catch { case _: Throwable => None }
    if (!rows.contains(expected)) {
      graft.tools.SfxGen.replicateEmbeddings(spark, base, out, 10)
      assert(rows.contains(expected), s"sf1 replica at $out has ${rows.orNull} rows, expected $expected")
    }
    out
  }

  private def recallAuto(sfPath: String): (Double, (Int, Int)) = {
    val e = Tables.embeddings(spark, sfPath)
    val queries = e.filter(pmod(col("vec_id"), lit(97)) === 0)
    val truth = Similarity.cosineTopK(queries, e, 10)
      .select(col("qid"), col("vec_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = Similarity.cosineTopKLshMultiAuto(queries, e, 10)
      .select(col("qid"), col("vec_id")).collect()
    val hits = got.count(r => truth((r.getLong(0), r.getLong(1))))
    (hits.toDouble / truth.size, Similarity.lshMultiKnobs(e.count()))
  }

  test("knob rule: floor-log2 bucket sizing, table budget capped at 12") {
    assert(Similarity.lshMultiKnobs(2000) == (4, 12))
    assert(Similarity.lshMultiKnobs(20000) == (7, 8))
    assert(Similarity.lshMultiKnobs(2000000) == (13, 4))
    // degenerate corpus sizes still produce a legal configuration
    val (b0, t0) = Similarity.lshMultiKnobs(0)
    assert(b0 >= 2 && t0 >= 3 && b0 * t0 <= 62)
    val (b9, t9) = Similarity.lshMultiKnobs(Long.MaxValue)
    assert(b9 == 16 && b9 * t9 <= 62)
  }

  test("auto knobs hold recall@10 >= 0.7 at 2k vectors (sf0.1)") {
    val (recall, knobs) = recallAuto("/root/testdata/sf0.1")
    assert(knobs == (4, 12))
    assert(recall >= 0.7, s"recall@10 $recall < 0.7 with auto knobs $knobs")
  }

  test("auto knobs hold recall@10 >= 0.7 at the sf1 vector count (20k replica)") {
    val (recall, knobs) = recallAuto(sf1Dir)
    assert(knobs == (7, 8))
    assert(recall >= 0.7, s"recall@10 $recall < 0.7 with auto knobs $knobs")
  }

  // --- √N IVF cell sizing (ivfCentroidEvery / cosineTopKIvfAuto) ---

  private def ivfRecall(sfPath: String, every: Option[Int]): Double = {
    val e = Tables.embeddings(spark, sfPath)
    val q = e.filter(pmod(col("vec_id"), lit(97)) === 0)
    val truth = Similarity.cosineTopK(q, e, 5)
      .select(col("qid"), col("vec_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = every
      .map(ev => Similarity.cosineTopKIvf(q, e, 5, ev, 4, 2))
      .getOrElse(Similarity.cosineTopKIvfAuto(q, e, 5))
      .select(col("qid"), col("vec_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    got.intersect(truth).size.toDouble / truth.size
  }

  test("ivf knob rule: largest pow2 <= sqrt(n), floored at 16") {
    assert(Similarity.ivfCentroidEvery(2000) == 32)
    assert(Similarity.ivfCentroidEvery(20000) == 128)
    assert(Similarity.ivfCentroidEvery(2000000) == 1024)
    assert(Similarity.ivfCentroidEvery(100) == 16) // floor
    assert(Similarity.ivfCentroidEvery(0) == 16)   // degenerate
  }

  test("auto IVF spacing holds recall@5 at 2k vectors (sf0.1)") {
    // at 2k the rule lands on the pinned contract spacing (32) — the
    // deterministic recall is the IvfRecallSpec value
    assert(ivfRecall("/root/testdata/sf0.1", None) >= 0.4)
  }

  test("auto IVF spacing beats pinned-32 recall at the sf1 vector count (20k replica)") {
    val auto = ivfRecall(sf1Dir, None)
    val pinned = ivfRecall(sf1Dir, Some(32))
    // measured 0.871 vs 0.649 (IvfAutoProbe): √N cells are fewer and
    // bigger, so 4 probes cover a larger corpus fraction AND the
    // assignment pass is ~4× cheaper — deterministic, not sampled
    assert(auto >= 0.8, s"auto recall@5 $auto < 0.8")
    assert(auto > pinned, s"auto $auto did not beat pinned-32 $pinned")
  }
}
