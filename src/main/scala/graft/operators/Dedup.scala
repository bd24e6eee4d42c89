package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines (SURVEY.md §2C).
  *
  * Scale design: nothing here ever compares all pairs. Exact dedup
  * groups on a 128-bit content hash (the shuffle carries hash+id, not
  * text). Near-dup ops generate candidates via bucket joins (LSH bands
  * / shared rare n-grams / SimHash chunks) and only verify within
  * buckets; hot buckets are bounded by document-frequency caps.
  */
object Dedup {

  /** Exact duplicate groups by md5 content hash. Returns one row per
    * duplicated content: (keep_id = min doc id, n_copies).
    */
  def exactGroups(df: DataFrame, id: Column, text: Column): DataFrame =
    df.groupBy(md5(text.cast("binary")).as("content_hash"))
      .agg(min(id).as("keep_id"), count(lit(1)).as("n_copies"))
      .filter(col("n_copies") > 1)

  /** Word n-gram array (1-based sliding windows), distinct. */
  def wordNgrams(text: Column, n: Int): Column = {
    val w = split(text, " ")
    // transform over 1..(len-n+1); empty when too short
    array_distinct(transform(
      sequence(lit(1), greatest(size(w) - (n - 1), lit(0))),
      i => concat_ws(" ", (0 until n).map(j => element_at(w, i + j)): _*)))
  }

  /** Near-duplicate pairs by exact word-n-gram Jaccard, with candidate
    * generation via shared n-grams whose document frequency is below
    * `maxDf` (bounds bucket size → no quadratic blowup on stock
    * phrases). Returns (id_a, id_b, jaccard) for jaccard >= minJaccard.
    */
  def ngramJaccardPairs(df: DataFrame, id: Column, text: Column, n: Int,
      maxDf: Int, minJaccard: Double): DataFrame = {
    val docs = df.select(id.as("doc_id"), wordNgrams(text, n).as("ngrams"))
      .withColumn("n_ngrams", size(col("ngrams")))
    val exploded = docs.select(col("doc_id"), col("n_ngrams"), explode(col("ngrams")).as("ng"))
    val rare = exploded
      .withColumn("df", count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy(col("ng"))))
      .filter(col("df") <= maxDf)
    val a = rare.select(col("doc_id").as("id_a"), col("n_ngrams").as("na"), col("ng"))
    val b = rare.select(col("doc_id").as("id_b"), col("n_ngrams").as("nb"), col("ng"))
    a.join(b, Seq("ng"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"), col("na"), col("nb"))
      .agg(count(lit(1)).as("inter"))
      .withColumn("jaccard", col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
      .filter(col("jaccard") >= minJaccard)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** MinHash signature: for each seed, min over shingles of
    * xxhash64(shingle, seed). Sig length = seeds.length.
    */
  def minHashSig(ngrams: Column, numHashes: Int): Column =
    transform(sequence(lit(0), lit(numHashes - 1)),
      s => array_min(transform(ngrams, ng => xxhash64(ng, s))))

  /** MinHash-LSH near-dup pairs: band the signature (bands × rowsPerBand
    * = sig length), bucket-join on (band, band-hash), verify candidates
    * with exact n-gram Jaccard. Standard S-curve candidate generation;
    * only bucket collisions are ever compared.
    */
  def minHashLshPairs(df: DataFrame, id: Column, text: Column, n: Int,
      bands: Int, rowsPerBand: Int, minJaccard: Double): DataFrame = {
    val docs = df.select(id.as("doc_id"), wordNgrams(text, n).as("ngrams"))
      .filter(size(col("ngrams")) > 0)
      .withColumn("sig", minHashSig(col("ngrams"), bands * rowsPerBand))
    val banded = docs.select(col("doc_id"), col("ngrams"),
        explode(transform(sequence(lit(0), lit(bands - 1)),
          b => struct(b.as("band"), xxhash64(concat_ws(",",
            slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)).cast("array<string>")), b).as("bh")))).as("bk"))
      .select(col("doc_id"), col("ngrams"), col("bk.band"), col("bk.bh"))
    val a = banded.select(col("doc_id").as("id_a"), col("ngrams").as("ng_a"), col("band"), col("bh"))
    val b = banded.select(col("doc_id").as("id_b"), col("ngrams").as("ng_b"), col("band"), col("bh"))
    a.join(b, Seq("band", "bh"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("ng_a"), col("ng_b")).distinct()
      .withColumn("inter", size(array_intersect(col("ng_a"), col("ng_b"))))
      .withColumn("jaccard", col("inter").cast("double") /
        (size(col("ng_a")) + size(col("ng_b")) - col("inter")))
      .filter(col("jaccard") >= minJaccard)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** 64-bit SimHash over whitespace tokens (xxhash64 token hashes):
    * bit b of the result is 1 iff more tokens have bit b set than not.
    */
  def simHash(text: Column): Column = {
    val tokens = split(trim(text), "\\s+")
    val hashes = transform(tokens, t => xxhash64(t))
    aggregate(
      sequence(lit(0), lit(63)),
      lit(0L),
      (acc, b) => acc + when(
        aggregate(hashes, lit(0L),
          (cnt, h) => cnt + when(call_function("shiftright", h, b.cast("int")).bitwiseAND(1) === 1, 1L).otherwise(-1L)) > 0,
        call_function("shiftleft", lit(1L), b.cast("int"))).otherwise(0L))
  }

  /** SimHash near-dup pairs with Hamming distance <= maxDist, candidates
    * via 8×8-bit chunk banding (pigeonhole: dist<=7 ⇒ some chunk equal).
    */
  def simHashPairs(df: DataFrame, id: Column, text: Column, maxDist: Int): DataFrame = {
    require(maxDist <= 7, "8-chunk banding guarantees recall only for dist <= 7")
    val docs = df.select(id.as("doc_id"), simHash(text).as("sh"))
    val chunked = docs.select(col("doc_id"), col("sh"),
      explode(transform(sequence(lit(0), lit(7)),
        c => struct(c.as("chunk"), call_function("shiftright", col("sh"), c.cast("int") * 8).bitwiseAND(255).as("cv")))).as("ck"))
      .select(col("doc_id"), col("sh"), col("ck.chunk"), col("ck.cv"))
    val a = chunked.select(col("doc_id").as("id_a"), col("sh").as("sh_a"), col("chunk"), col("cv"))
    val b = chunked.select(col("doc_id").as("id_b"), col("sh").as("sh_b"), col("chunk"), col("cv"))
    a.join(b, Seq("chunk", "cv"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sh_a"), col("sh_b")).distinct()
      .withColumn("dist", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))))
      .filter(col("dist") <= maxDist)
      .select(col("id_a"), col("id_b"), col("dist"))
  }
}
