package graft.tools

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.sources.Tables

/** Measures what bucket-co-locating the persisted ingest state buys
  * the advance's batch×state join family (VERDICT r13 #1: the
  * residual super-linear cost of the composed advance is the
  * keepers/ng3/ng8 anti-join scans — PLANS.md called the state
  * "bucket-colocatable at a real lake" without demonstrating it).
  *
  * State = 8-gram first-doc table of the first three id-quartiles of
  * documents (the largest table in the family); batch = the fourth
  * quartile's. Three join shapes, each timed warm min-of-2 against
  * (a) the plain-parquet state dir (today's loadStates read) and
  * (b) the same rows as a bucketed+sorted catalog table re-registered
  * over the same files (the proposed layout):
  *
  *   anti  — batch-first table LEFT ANTI state (the delta computation
  *           and novelty shapes);
  *   lj    — batch owners LEFT JOIN state(ng, first_doc) (the q106
  *           self-rep owner resolution shape);
  *   chain — batch LEFT ANTI delta2 ANTI delta1 ANTI base (the delta-
  *           chain read path: per-layer joins so the bucketed base
  *           stays exchange-free) vs batch ANTI (base ∪ d1 ∪ d2)
  *           (today's unioned read).
  *
  * Also times the state WRITE both ways (the rebase-cost side of the
  * trade) and reports the state-side Exchange count from the executed
  * plans — the thing bucketing exists to delete. Args: [sfDir].
  */
object StateBucketProbe {

  def registerBucketed(spark: SparkSession, name: String, path: String,
      key: String, buckets: Int): DataFrame = {
    val ddl = spark.read.parquet(path).schema.toDDL
    spark.sql(s"DROP TABLE IF EXISTS $name")
    spark.sql(s"CREATE TABLE $name ($ddl) USING PARQUET " +
      s"CLUSTERED BY ($key) SORTED BY ($key) INTO $buckets BUCKETS LOCATION '$path'")
    spark.table(name)
  }

  def writeBucketed(df: DataFrame, spark: SparkSession, name: String, path: String,
      key: String, buckets: Int): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    // pre-repartition on the bucket key so each task holds exactly one
    // bucket (same murmur3 % B) -> one file per bucket -> the reader
    // can trust the SORTED BY metadata and skip its own sort
    df.repartition(buckets, col(key))
      .write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key).sortBy(key)
      .option("path", path).format("parquet").saveAsTable(name)
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf10")
    val s = graft.GraftSession.local()
    s.sparkContext.setLogLevel("WARN")
    val buckets = 32

    val d = Tables.documents(s, dir).select(col("doc_id"), col("text"))
    val bounds = d.stat.approxQuantile("doc_id", Array(0.75), 0.001).map(_.toLong)
    val root = java.nio.file.Files.createTempDirectory("graft_bucketprobe").toString
    // materialize inputs once so the timings below measure the JOINS,
    // not the ngram derivation
    Dedup.ngramFirstDocs(d.filter(col("doc_id") <= bounds(0)), col("doc_id"), col("text"), 8)
      .write.mode(SaveMode.Overwrite).parquet(s"$root/state_src")
    Dedup.ngramFirstDocs(d.filter(col("doc_id") > bounds(0)), col("doc_id"), col("text"), 8)
      .write.mode(SaveMode.Overwrite).parquet(s"$root/batch")
    val stateSrc = s.read.parquet(s"$root/state_src")
    val batch = s.read.parquet(s"$root/batch")
    val (nState, nBatch) = (stateSrc.count(), batch.count())

    def fmt(v: Double) = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def m2(f: => Unit): Double = (1 to 2).map { _ =>
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }.min
    def exchanges(df: DataFrame): Int = {
      df.agg(count(lit(1))).collect()
      "Exchange".r.findAllIn(
        df.agg(count(lit(1))).queryExecution.executedPlan.toString).length
    }

    val out = scala.collection.mutable.ArrayBuffer.empty[String]

    // ---- write cost (the rebase side of the trade)
    out += s""""write_plain":${fmt(m2 {
      stateSrc.write.mode(SaveMode.Overwrite).parquet(s"$root/state_plain") })}"""
    out += s""""write_bucketed":${fmt(m2 {
      writeBucketed(stateSrc, s, "gsb_state", s"$root/state_bucketed", "ng", buckets) })}"""
    val plain = s.read.parquet(s"$root/state_plain")
    val bucketed = registerBucketed(s, "gsb_state_r", s"$root/state_bucketed", "ng", buckets)

    // ---- anti shape (delta computation / novelty)
    def anti(st: DataFrame) = batch.join(st.select(col("ng")), Seq("ng"), "left_anti")
    out += s""""anti_plain":${fmt(m2 { anti(plain).agg(count(lit(1))).collect() })}"""
    out += s""""anti_bucketed":${fmt(m2 { anti(bucketed).agg(count(lit(1))).collect() })}"""
    out += s""""anti_plain_exch":${exchanges(anti(plain))}"""
    out += s""""anti_bucketed_exch":${exchanges(anti(bucketed))}"""

    // ---- left-join shape (self-rep owner resolution)
    def lj(st: DataFrame) = batch
      .join(st.select(col("ng"), col("first_doc").as("state_first")), Seq("ng"), "left")
      .select(col("ng"), least(col("first_doc"), coalesce(col("state_first"), col("first_doc"))).as("owner"))
    out += s""""lj_plain":${fmt(m2 { lj(plain).agg(count(lit(1)), min(col("owner"))).collect() })}"""
    out += s""""lj_bucketed":${fmt(m2 { lj(bucketed).agg(count(lit(1)), min(col("owner"))).collect() })}"""

    // ---- chained delta layers: base + two batch-sized deltas
    val d1 = batch.filter(pmod(col("ng"), lit(2)) === 0)
    val d2 = batch.filter(pmod(col("ng"), lit(2)) =!= 0)
    d1.write.mode(SaveMode.Overwrite).parquet(s"$root/d1")
    d2.write.mode(SaveMode.Overwrite).parquet(s"$root/d2")
    val (l1, l2) = (s.read.parquet(s"$root/d1"), s.read.parquet(s"$root/d2"))
    // probe batch for the chain = first half of the batch re-keyed so it
    // overlaps the deltas partially (keys *3 stay coprime-ish with the split)
    val pb = batch.select((col("ng") * 3 % 4611686018427387847L).as("ng"), col("first_doc"))
    def chainPlain() = pb.join(
      plain.select(col("ng")).unionByName(l1.select(col("ng"))).unionByName(l2.select(col("ng"))),
      Seq("ng"), "left_anti")
    def chainBucketed() = Seq(l2, l1).foldLeft(pb)((acc, dd) =>
        acc.join(dd.select(col("ng")), Seq("ng"), "left_anti"))
      .join(bucketed.select(col("ng")), Seq("ng"), "left_anti")
    out += s""""chain_plain":${fmt(m2 { chainPlain().agg(count(lit(1))).collect() })}"""
    out += s""""chain_bucketed":${fmt(m2 { chainBucketed().agg(count(lit(1))).collect() })}"""
    // base-join-FIRST variant: the base anti shrinks the probe batch to
    // its novel keys before the (cheap) delta joins
    def chainBucketed2() = Seq(l2, l1).foldLeft(
        pb.join(bucketed.select(col("ng")), Seq("ng"), "left_anti"))((acc, dd) =>
      acc.join(dd.select(col("ng")), Seq("ng"), "left_anti"))
    out += s""""chain_bucketed_basefirst":${fmt(m2 { chainBucketed2().agg(count(lit(1))).collect() })}"""
    if (sys.env.contains("GRAFT_PROBE_EXPLAIN")) {
      val c = chainBucketed(); c.agg(count(lit(1))).collect()
      // scalastyle:off println
      println("=== chainBucketed plan ===")
      println(c.queryExecution.executedPlan.toString.take(6000))
      // scalastyle:on println
    }

    println(s"""{"probe":"state_bucket","sf":"$dir","n_state":$nState,"n_batch":$nBatch,"buckets":$buckets,${out.mkString(",")}}""")
    s.stop()
  }
}
