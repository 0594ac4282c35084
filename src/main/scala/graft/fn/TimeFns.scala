package graft.fn

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Time conversions between HYCOM's hour-offset epoch and timestamps.
  *
  * The reference keys everything on integer hours since 2000-01-01T00Z
  * (`hurrtimeconv`, trackplot_hycom.py:150-156; inverse `ymdh`,
  * trackplot_hycom.py:45-50). All arithmetic here is pure Catalyst
  * built-ins (codegen'd), UTC throughout.
  */
object TimeFns {

  /** Seconds since Unix epoch of 2000-01-01T00:00:00Z. */
  val Epoch2000Sec: Long = 946684800L

  /** F1 `hurrtimeconv`: parse a `yyyyMMddHH` string into integer hours
    * since 2000-01-01T00Z (trackplot_hycom.py:150-156).
    */
  def hurrTimeConv(ymdhStr: Column): Column =
    hoursSince2000(to_timestamp(ymdhStr, "yyyyMMddHH"))

  /** Timestamp → integer hours since 2000-01-01T00Z. Floor semantics
    * (Python-2 int division in the reference); the double cast routes
    * TIMESTAMP_NTZ → TIMESTAMP (session UTC) → epoch seconds.
    */
  def hoursSince2000(ts: Column): Column =
    floor((ts.cast("timestamp").cast("long") - lit(Epoch2000Sec)) / 3600L).cast("long")

  /** F2 `ymdh` inverse: hour offset → `yyyyMMddHH` string
    * (trackplot_hycom.py:45-50).
    */
  def ymdh(hours: Column): Column =
    date_format(hoursToTimestamp(hours), "yyyyMMddHH")

  /** Hour offset → TimestampType. */
  def hoursToTimestamp(hours: Column): Column =
    timestamp_seconds(lit(Epoch2000Sec) + hours.cast("long") * 3600L)

  /** Scala-side F1 for literals/tests: "2016081718" → 145770. */
  def hurrTimeConvScala(s: String): Long = {
    val fmt = java.time.format.DateTimeFormatter.ofPattern("yyyyMMddHH")
    val dt = java.time.LocalDateTime.parse(s.trim, fmt)
    (dt.toEpochSecond(java.time.ZoneOffset.UTC) - Epoch2000Sec) / 3600L
  }

  /** Scala-side F2 inverse for literals/tests. */
  def ymdhScala(hours: Long): String = {
    val inst = java.time.Instant.ofEpochSecond(Epoch2000Sec + hours * 3600L)
    java.time.format.DateTimeFormatter.ofPattern("yyyyMMddHH")
      .withZone(java.time.ZoneOffset.UTC).format(inst)
  }
}
