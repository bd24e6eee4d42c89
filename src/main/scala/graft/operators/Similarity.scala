package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor operators over an embedding column
  * (array<float>), SURVEY.md §2C.
  *
  * Determinism: all dot products fold left in array order with a
  * double accumulator, so results are bit-identical to DuckDB's
  * list_reduce fold — no rounding fudge needed for the oracle.
  */
object Similarity {

  /** Sequential-fold dot product of two array<float> columns, in double. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  /** Sequential-fold squared L2 norm. */
  def normSq(a: Column): Column =
    aggregate(transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def cosine(a: Column, b: Column, normSqA: Column, normSqB: Column): Column =
    dot(a, b) / sqrt(normSqA * normSqB)

  /** Native CosineSim kernel when GraftExtensions is installed (bit-
    * identical result, whole-stage codegen), else the HOF formulation.
    */
  private def cosineExpr(spark: org.apache.spark.sql.SparkSession, a: Column, b: Column,
      normSqA: Column, normSqB: Column): Column =
    if (spark.sessionState.functionRegistry.functionExists(graft.functions.CosineSim.identifier))
      call_function("graft_cosine", a, b)
    else cosine(a, b, normSqA, normSqB)

  /** Brute-force cosine top-k: every query (small set, broadcast) against
    * every candidate — the exact baseline. One scan of the candidate
    * table; per-query ranking via window (partition count = |queries|,
    * so rank shuffle is tiny — candidate scan dominates).
    */
  def cosineTopK(queries: DataFrame, candidates: DataFrame, k: Int): DataFrame = {
    val q = broadcast(queries.select(col("vec_id").as("qid"), col("embedding").as("qe"))
      .withColumn("qn2", normSq(col("qe"))))
    val c = candidates.select(col("vec_id"), col("embedding").as("ce"))
      .withColumn("cn2", normSq(col("ce")))
    val scored = c.crossJoin(q)
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("cos", cosineExpr(candidates.sparkSession, col("qe"), col("ce"), col("qn2"), col("cn2")))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("vec_id"), col("cos"))
  }

  /** Random-hyperplane signature: bit j = sign of dot(embedding, h_j),
    * where h_j components are deterministic pseudo-random in [-0.5,0.5)
    * from an LCG mix of (j, dim-index) — plain 64-bit integer
    * arithmetic, so the identical planes are reproducible on any
    * cluster AND in the DuckDB oracle (no rows-only check). The dot
    * folds left in array order like every other float reduction here.
    */
  def rhSignature(emb: Column, nBits: Int): Column =
    aggregate(
      sequence(lit(0), lit(nBits - 1)),
      lit(0L),
      (acc, j) => acc + when(
        aggregate(zip_with(emb, sequence(lit(0), size(emb) - 1),
          (x, d) => x.cast("double") *
            ((((j * 64 + d) * 1103515245L + 12345L) % 2147483647L % 1000L).cast("double") / 1000.0 - 0.5)),
          lit(0.0), (s, x) => s + x) > 0,
        call_function("shiftleft", lit(1L), j.cast("int"))).otherwise(0L))

  /** Native RhSig kernel when GraftExtensions is installed (bit-
    * identical, whole-stage codegen), else the HOF formulation above.
    */
  def rhSignatureExpr(spark: org.apache.spark.sql.SparkSession, emb: Column, nBits: Int): Column =
    if (spark.sessionState.functionRegistry.functionExists(graft.functions.RhSig.identifier))
      call_function("graft_rhsig", emb, lit(nBits))
    else rhSignature(emb, nBits)

  /** Embedding-cosine near-duplicate pairs (brief §2C): candidates
    * share an nBits random-hyperplane bucket (portable signature — see
    * rhSignature), then exact cosine >= minCos within buckets. Returns
    * (id_a, id_b, cos). The bucket join bounds the pair count by
    * Σ bucket² — never all-pairs; at 100 TB the signature is computed
    * at ingest and the lake bucketed by it, making this a co-located
    * join. Skewed buckets (mass near one hyperplane cell) → salt the
    * sig key, same recipe as the LSH band join (Skew.saltedJoin).
    */
  def cosineNearDupPairs(df: DataFrame, id: Column, emb: Column,
      minCos: Double, nBits: Int = 8): DataFrame = {
    val v = df.select(id.as("vid"), emb.as("ve"))
      .withColumn("n2", normSq(col("ve")))
      .withColumn("sig", rhSignatureExpr(df.sparkSession, col("ve"), nBits))
    val a = v.select(col("vid").as("id_a"), col("ve").as("ea"), col("n2").as("na"), col("sig"))
    val b = v.select(col("vid").as("id_b"), col("ve").as("eb"), col("n2").as("nb"), col("sig"))
    a.join(b, Seq("sig"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos", cosineExpr(df.sparkSession, col("ea"), col("eb"), col("na"), col("nb")))
      .filter(col("cos") >= minCos)
      .select(col("id_a"), col("id_b"), col("cos"))
  }

  /** IVF-style ANN (scale path #2): a deterministic coarse quantizer —
    * centroids are the vectors whose id ≡ 0 (mod centroidEvery) — maps
    * every vector to its nearest centroid cell (broadcast argmin);
    * queries probe their nProbe nearest cells and re-rank exactly
    * within them. At 100 TB the cell id becomes a storage partition
    * key, turning query-time into a pruned scan of nProbe cells.
    * (A k-means quantizer would train centroids; the assignment /
    * probe / re-rank dataflow — the Spark-side part — is identical.)
    */
  def cosineTopKIvf(queries: DataFrame, candidates: DataFrame, k: Int,
      centroidEvery: Int = 32, nProbe: Int = 4): DataFrame = {
    val cents = broadcast(candidates
      .filter(pmod(col("vec_id"), lit(centroidEvery)) === 0)
      .select(col("vec_id").as("cent_id"), col("embedding").as("cent")))
    def assign(df: DataFrame, idCol: String, embCol: String, keep: Int): DataFrame = {
      val scored = df.crossJoin(cents)
        .withColumn("cd", cosineExpr(df.sparkSession, col(embCol), col("cent"),
          normSq(col(embCol)), normSq(col("cent"))))
      val w = Window.partitionBy(col(idCol)).orderBy(col("cd").desc, col("cent_id").asc)
      scored.withColumn("__rn", row_number().over(w)).filter(col("__rn") <= keep)
        .drop("cd", "cent", "__rn")
    }
    val assigned = assign(candidates.select(col("vec_id"), col("embedding").as("ce")), "vec_id", "ce", 1)
      .withColumn("cn2", normSq(col("ce")))
    val probes = assign(queries.select(col("vec_id").as("qid"), col("embedding").as("qe")), "qid", "qe", nProbe)
      .withColumn("qn2", normSq(col("qe")))
    val scored = assigned.join(broadcast(probes), Seq("cent_id"))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("cos", cosineExpr(candidates.sparkSession, col("qe"), col("ce"), col("qn2"), col("cn2")))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("vec_id"), col("cos"))
  }

  /** LSH-bucketed ANN (scale path): candidates share a 16-bit
    * random-hyperplane signature bucket; exact cosine re-rank within
    * buckets. Recall < 1 by design; bucket size bounds the join.
    */
  def cosineTopKLsh(queries: DataFrame, candidates: DataFrame, k: Int, nBits: Int = 16): DataFrame = {
    val q = broadcast(queries.select(col("vec_id").as("qid"), col("embedding").as("qe"))
      .withColumn("qn2", normSq(col("qe")))
      .withColumn("sig", rhSignatureExpr(queries.sparkSession, col("qe"), nBits)))
    val c = candidates.select(col("vec_id"), col("embedding").as("ce"))
      .withColumn("cn2", normSq(col("ce")))
      .withColumn("sig", rhSignatureExpr(candidates.sparkSession, col("ce"), nBits))
    val scored = c.join(q, Seq("sig"))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("cos", cosineExpr(candidates.sparkSession, col("qe"), col("ce"), col("qn2"), col("cn2")))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("vec_id"), col("cos"))
  }
}
