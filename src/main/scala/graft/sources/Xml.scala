package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** XML snapshot ingest — the daemon's transform step
  * (crates/daemon/src/domains/observations/xml_observation.rs,
  * forecasts/xml_forecast.rs) parses NOAA XML into typed rows before
  * writing parquet. Re-expressed with Spark's native `from_xml` so the
  * parse runs distributed inside the scan stage, not in a single
  * fetcher process.
  */
object Xml {

  /** Schema of one observation record (xml_observation.rs fields). */
  val observationSchema: StructType = StructType(Seq(
    StructField("station_id", StringType),
    StructField("latitude", DoubleType),
    StructField("longitude", DoubleType),
    StructField("generated_at", StringType),
    StructField("temperature_value", DoubleType),
    StructField("dewpoint_value", DoubleType),
    StructField("wind_speed", LongType),
    StructField("wind_direction", LongType),
    StructField("precip_in", DoubleType),
    StructField("wx_string", StringType)))

  /** Parse an XML observation document column into a typed struct. */
  def parseObservation(xml: Column): Column =
    from_xml(xml, observationSchema)

  /** Parse a DataFrame of raw XML snapshot strings into observation
    * rows (the daemon's per-fetch transform, distributed).
    */
  def observations(raw: DataFrame, xmlCol: String): DataFrame =
    raw.withColumn("obs", parseObservation(col(xmlCol)))
      .select(col("obs.*"))

  /** Render rows as XML observation documents (round-trip/test aid,
    * and the inverse transform for interop with the reference's feed).
    */
  def toObservationXml(df: DataFrame): DataFrame =
    df.select(to_xml(struct(df.columns.toIndexedSeq.map(col): _*)).as("xml"))

  /** DWML forecast document schema (xml_forecast.rs Dwml/Data): a
    * location, shared time-layouts (layout-key + parallel start/end
    * time lists), and parameter series that reference a layout by key.
    */
  private val pointSchema = StructType(Seq(
    StructField("_latitude", DoubleType),
    StructField("_longitude", DoubleType)))
  private val locationSchema = StructType(Seq(
    StructField("location-key", StringType),
    StructField("point", pointSchema)))
  private val timeLayoutSchema = StructType(Seq(
    StructField("layout-key", StringType),
    StructField("start-valid-time", ArrayType(StringType)),
    StructField("end-valid-time", ArrayType(StringType))))
  private val seriesSchema = StructType(Seq(
    StructField("_type", StringType),
    StructField("_time-layout", StringType),
    StructField("value", ArrayType(DoubleType))))
  val dwmlSchema: StructType = StructType(Seq(
    StructField("data", StructType(Seq(
      StructField("location", locationSchema),
      StructField("time-layout", ArrayType(timeLayoutSchema)),
      StructField("parameters", StructType(Seq(
        StructField("temperature", ArrayType(seriesSchema))))))))))

  /** DWML time-layout expansion (xml_forecast.rs:115 to_time_ranges +
    * download_forecast.rs Forecast assembly): parameter values carry no
    * timestamps — the i-th value of a series belongs to the i-th
    * (start, end) window of the time-layout the series references by
    * key. Spark-native: posexplode the value lists and the zipped
    * time lists, then join on (layout key, position). Distributed over
    * documents; no per-document driver loop.
    *
    * Returns (station_id, series_type, begin_time, end_time, value).
    */
  def dwmlForecasts(raw: DataFrame, xmlCol: String): DataFrame = {
    val parsed = raw.withColumn("d", from_xml(col(xmlCol), dwmlSchema))
      .select(col("d.data.location.`location-key`").as("station_id"),
        col("d.data.`time-layout`").as("layouts"),
        col("d.data.parameters.temperature").as("series"))
    val windows = parsed
      .select(col("station_id"), explode(col("layouts")).as("lay"))
      .select(col("station_id"), col("lay.`layout-key`").as("layout_key"),
        posexplode(arrays_zip(col("lay.`start-valid-time`"), col("lay.`end-valid-time`"))))
      .select(col("station_id"), col("layout_key"), col("pos"),
        col("col.`start-valid-time`").as("begin_time"),
        col("col.`end-valid-time`").as("end_time"))
    val values = parsed
      .select(col("station_id"), explode(col("series")).as("s"))
      .select(col("station_id"), col("s.`_type`").as("series_type"),
        col("s.`_time-layout`").as("layout_key"),
        posexplode(col("s.value")))
      .select(col("station_id"), col("series_type"), col("layout_key"), col("pos"),
        col("col").as("value"))
    values.join(windows, Seq("station_id", "layout_key", "pos"))
      .select(col("station_id"), col("series_type"), col("begin_time"),
        col("end_time"), col("value"))
  }
}
