package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity
import graft.sources.Tables

/** Gates the matryoshka two-stage ANN: on embeddings with
  * front-loaded mass (the per-dimension decay the catalog entry
  * plants — MRL-trained models produce this distribution), the
  * 16-of-64-dim shortlist must recall nearly all of brute-force
  * top-3. On the RAW isotropic table the premise fails by design
  * (measured 0.11) — that contrast is the point of the contract.
  */
class MrlAnnSpec extends SparkSpecBase {

  test("prefix shortlist + exact re-rank recalls brute top-3 on front-loaded embeddings") {
    val e = Tables.embeddings(spark, "/root/testdata/sf0.1").select(col("vec_id"),
      zip_with(col("embedding"), sequence(lit(1), lit(64)),
        (x, i) => (x.cast("double") / (lit(1.0) + (i - 1).cast("double") * 0.25)).cast("float"))
        .as("embedding"))
    val queries = e.filter(pmod(col("vec_id"), lit(97)) === 0)
    val truth = Similarity.cosineTopK(queries, e, 3)
      .select(col("qid"), col("vec_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = Similarity.cosineTopKMrl(queries, e, 3, 16, 12)
      .select(col("qid"), col("vec_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (truth & got).size.toDouble / truth.size
    assert(truth.nonEmpty && recall >= 0.9, s"recall $recall")
  }
}
