package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Date-partitioned parquet lake — the Spark-native replacement for the
  * reference's `weather_data/<date>/<file>.parquet` folder scheme
  * (crates/oracle/src/file_access.rs:96-130, s3_storage.rs:256-349).
  *
  * Where the reference prunes by parsing dates out of *filenames*, here
  * the date is a real partition column, so time-range predicates become
  * Catalyst partition pruning — the scan never opens out-of-range
  * files, which is what makes point-in-time queries feasible at 100 TB
  * (a day of a 3-year lake ≈ 0.1 % of files touched).
  *
  * The lake is append-only snapshots (immutable data model, like the
  * reference); schema evolution is read-time `mergeSchema` +
  * `ensureColumns` (≡ DuckDB `union_by_name` + NULL defaults,
  * weather_data.rs:198-211).
  */
object Lake {

  /** Write a snapshot partitioned by the given date expression. */
  def write(df: DataFrame, path: String, dateCol: org.apache.spark.sql.Column,
      mode: SaveMode = SaveMode.Overwrite): Unit =
    df.withColumn("p_date", dateCol.cast("date"))
      .write.mode(mode).partitionBy("p_date").parquet(path)

  /** Read with partition pruning for [start, end] (inclusive dates,
    * ISO strings). The p_date predicate prunes directories before any
    * file is opened.
    */
  def readRange(spark: SparkSession, path: String, start: String, end: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(path)
      .filter(col("p_date") >= lit(start).cast("date") && col("p_date") <= lit(end).cast("date"))

  /** Morton (Z-order) interleave of the low `bits` bits of two long
    * dimensions: bit i of `a` lands at position 2i, bit i of `b` at
    * 2i+1. Pure shift/and/or Column arithmetic — codegen'd, no UDF.
    * Nearby (a, b) points get nearby keys, so range-sorting on the key
    * clusters BOTH dimensions at once.
    */
  def mortonKey(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column,
      bits: Int = 16): org.apache.spark.sql.Column = {
    require(bits >= 1 && bits <= 31, "morton bits must be in [1, 31]")
    (0 until bits).map { i =>
      shiftleft(shiftright(a.cast("long"), i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(b.cast("long"), i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** Z-order-clustered parquet write: range-partition on the Morton
    * key of two filter dimensions, sort within partitions, drop the
    * key. Every file then covers a compact rectangle-ish region of
    * the (a, b) plane, so parquet min/max stats let a scan with a
    * range predicate on EITHER dimension skip most files/row-groups —
    * the multi-dimensional analog of [[write]]'s date pruning, and
    * the layout a 100 TB lake wants for its two hottest filter
    * columns. Data values are untouched — layout only.
    */
  def writeZOrdered(df: DataFrame, path: String,
      a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column,
      bits: Int = 16, files: Int = 16): Unit =
    df.withColumn("__zkey", mortonKey(a, b, bits))
      .repartitionByRange(files, col("__zkey"))
      .sortWithinPartitions(col("__zkey"))
      .drop("__zkey")
      .write.mode(SaveMode.Overwrite).parquet(path)

  /** Write a snapshot as a bucketed table: co-locates rows by key so
    * joins/aggregations on that key between same-bucketed tables are
    * exchange-free (the cluster-scale answer to the reference's
    * per-station access pattern). Bucketed output requires the table
    * catalog (`saveAsTable`).
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int,
      path: Option[String] = None): Unit = {
    // guard the string-interpolated DROP below (and the rm target name)
    require(table.matches("[A-Za-z_][A-Za-z0-9_]*"),
      s"writeBucketed table must be a plain identifier, got '$table'")
    // idempotent across sessions: a fresh in-memory catalog does not
    // know the table, but its files survive — Overwrite alone then
    // fails with LOCATION_ALREADY_EXISTS. Drop both.
    df.sparkSession.sql(s"DROP TABLE IF EXISTS $table")
    val loc = path.getOrElse {
      val wh = new java.net.URI(df.sparkSession.conf.get("spark.sql.warehouse.dir"))
      new java.io.File(if (wh.getScheme == null) wh.toString else wh.getPath, table).toString
    }
    // refuse to recursively delete anything that does not look like a
    // previous bucketed-table output (a mistyped path/warehouse dir
    // must not silently wipe an arbitrary tree). Walks through the
    // Hadoop FileSystem API — like compactPartition — so the check is
    // real on HDFS/S3 URIs too, not just local paths (a java.io.File
    // walk silently sees nothing behind a scheme'd URI, which would
    // turn the safety check into a no-op exactly where the stakes are
    // highest).
    val locPath = new org.apache.hadoop.fs.Path(loc)
    val fs = locPath.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
    val ok = "(part-.*|_SUCCESS|\\..*\\.crc|_temporary)".r
    def looksLikeTableOutput(p: org.apache.hadoop.fs.Path): Boolean =
      fs.listStatus(p).forall { st =>
        (st.isDirectory && looksLikeTableOutput(st.getPath)) ||
          ok.pattern.matcher(st.getPath.getName).matches
      }
    if (fs.exists(locPath)) {
      require(fs.getFileStatus(locPath).isDirectory && looksLikeTableOutput(locPath),
        s"writeBucketed refusing to delete '$loc': not a previous bucketed-table output")
      fs.delete(locPath, true)
    }
    val w = df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet")
    path.fold(w)(p => w.option("path", p)).saveAsTable(table)
  }

  /** Compact one date partition to `files` output files (snapshot
    * appends accumulate small files; compaction rewrites one partition
    * dir in place — the immutable-lake maintenance op).
    */
  def compactPartition(spark: SparkSession, path: String, date: String, files: Int = 1): Unit = {
    val part = s"$path/p_date=$date"
    val df = spark.read.parquet(part).repartition(files)
    val tmp = s"$part.__compact_tmp"
    df.write.mode(SaveMode.Overwrite).parquet(tmp)
    val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(part),
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(part), true)
    fs.rename(new org.apache.hadoop.fs.Path(tmp), new org.apache.hadoop.fs.Path(part))
  }

  /** Guarantee the given columns exist (NULL of the given type when a
    * snapshot predates the column) — the reference's NULL-default
    * UNION ALL BY NAME trick, as a reusable reader shim.
    */
  def ensureColumns(df: DataFrame, cols: Map[String, String]): DataFrame =
    cols.foldLeft(df) { case (d, (name, typ)) =>
      if (d.columns.contains(name)) d else d.withColumn(name, lit(null).cast(typ))
    }
}
