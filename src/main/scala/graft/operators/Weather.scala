package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level weather computations from the reference, re-expressed
  * as codegen-friendly Spark column expressions (no UDFs).
  */
object Weather {

  /** Magnus-formula relative humidity from temperature and dewpoint
    * (°C), rounded to a BIGINT percent — mirrors
    * weather_data.rs:540-546. Integer rounding absorbs any last-ulp
    * libm/JVM exp() divergence.
    *
    * try_divide, not `/` (the r15 ANSI division sweep): a corrupt
    * sensor row at exactly −243.04 °C zeroes an inner denominator, and
    * one a hair above it underflows the outer exp() to +0.0 — under
    * ANSI either row kills the whole job at lake scale. try_divide is
    * bit-identical double division on the physical domain and NULL on
    * the garbage row, exactly what the DuckDB oracle's division by
    * zero yields.
    */
  def magnusHumidity(tempC: Column, dewpointC: Column): Column =
    round(try_divide(
      lit(100.0) * exp(try_divide(lit(17.625) * dewpointC, lit(243.04) + dewpointC)),
      exp(try_divide(lit(17.625) * tempC, lit(243.04) + tempC)))).cast("bigint")

  /** Celsius → Fahrenheit (convert_temperature, weather_data.rs:54-60).
    * Expression shape `v * 9 / 5 + 32` kept identical to the oracle
    * SQL so IEEE evaluation matches bit-for-bit.
    */
  def cToF(c: Column): Column = c * 9 / 5 + 32

  /** Fahrenheit → Celsius. */
  def fToC(f: Column): Column = (f - 32) * 5 / 9

  /** METAR-style precipitation classification
    * (weather_data.rs:514-529): regex over the present-weather string
    * with a temperature-heuristic fallback.
    */
  def classifyPrecip(wxString: Column, tempC: Column): Column =
    when(wxString.isNotNull && wxString =!= "",
      when(wxString.rlike("(^|\\s)(SN|BLSN|DRSN)(\\s|$)"), "snow")
        .when(wxString.rlike("(^|\\s)(FZRA|FZDZ|PL|GR|GS|IC)(\\s|$)"), "ice")
        .otherwise("rain"))
      .when(tempC.isNotNull && tempC <= 2.0, "snow")
      .otherwise("rain")

  /** Range-guarded aggregate input (the FILTER(WHERE ...) pattern of
    * weather_data.rs:365-373): value when within [lo, hi], else NULL
    * so it is skipped by the aggregate.
    */
  def guarded(v: Column, lo: Double, hi: Double): Column =
    when(v.isNotNull && v >= lo && v <= hi, v)
}
