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
    df.select(to_xml(struct(df.columns.map(col): _*)).as("xml"))
}
