package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Timestamp / key-derivation layer (reference §2.7 F3-F6). All pure
  * expressions; every "errors=coerce" becomes a try_-function or non-ANSI
  * cast returning null, matching pandas' NaT semantics.
  */
object TimeParse {

  /** F3 coercing timestamp parse (`pd.to_datetime(errors="coerce")`,
    * reference `load_311.py:37-47`). Null on unparseable input.
    */
  def parseTs(c: Column): Column = try_to_timestamp(c)

  /** F3 with an explicit pattern. */
  def parseTs(c: Column, fmt: String): Column = try_to_timestamp(c, lit(fmt))

  /** F4 date key YYYYMMDD as long, null-safe (reference `load_311.py:50-52`). */
  def dateKey(ts: Column): Column = date_format(ts, "yyyyMMdd").cast("long")

  /** F5 time key HHMM00 as long — minute precision, seconds zeroed
    * (reference `load_311.py:53-55`, `load_parking.py:114-118`).
    */
  def timeKey(ts: Column): Column =
    (hour(ts) * 10000 + minute(ts) * 100).cast("long")

  /** F6 AM/PM violation-time parser (reference `load_parking.py:87-113`).
    * Accepts `"0853P"`, `"8:53A"`, `"12:05PM"`; trims/uppercases; requires a
    * trailing A/P (optionally AM/PM); inserts a colon into bare 3-4 digit
    * forms; yields HHMM00 long key, null on any failure. Composed from
    * built-in expressions (regexp + conditionals) rather than a UDF so the
    * DuckDB oracle can mirror it term-for-term.
    */
  def parseAmPmKey(raw: Column): Column = {
    val s = upper(trim(raw))
    // core digits/colon part + meridiem suffix
    val core = regexp_extract(s, "^([0-9:]+)(A|P)M?$", 1)
    val mer  = regexp_extract(s, "^([0-9:]+)(A|P)M?$", 2)
    // "853" -> "8:53", "0853" -> "08:53"; already-colon forms pass through
    val withColon = when(core.rlike("^[0-9]{3,4}$"),
        concat(core.substr(lit(1), length(core) - 2), lit(":"),
               core.substr(length(core) - 1, lit(2))))
      .otherwise(core)
    val hh = split(withColon, ":").getItem(0).cast("int")
    val mm = split(withColon, ":").getItem(1).cast("int")
    val valid = (mer === "A" || mer === "P") &&
      withColon.rlike("^[0-9]{1,2}:[0-9]{2}$") &&
      hh.between(1, 12) && mm.between(0, 59)
    val hh24 = when(mer === "A", when(hh === 12, 0).otherwise(hh))
      .otherwise(when(hh === 12, 12).otherwise(hh + 12))
    when(valid, (hh24 * 10000 + mm * 100).cast("long"))
  }
}
