package graft.time

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Record-time extraction: the prioritized field chain of the reference
  * (util/TimeUtil.kt:26-57) expressed as one `coalesce` Column —
  * evaluated per row inside codegen, no driver involvement.
  *
  * Priority: value.time (double epoch-s) → key.timeStart (double) →
  * key.start (long epoch-ms) → value.dateTime (ISO string) → value.date
  * (ISO local date) → value.timeReceived → value.timeCompleted → null.
  * Field-name matching is case-insensitive (path/RecordPathFactory.kt:143-146).
  *
  * Internal representation: Double epoch-seconds (fractional part kept),
  * matching the reference's CSV round-trip format
  * (format/CsvAvroConverterFactory.kt:107-115).
  */
object TimeExtract {

  private case class Candidate(path: Seq[String], convert: (Column, DataType) => Column)

  private def epochSecondsNumeric(c: Column, dt: DataType): Column = dt match {
    case DoubleType | FloatType => c.cast(DoubleType)
    case IntegerType | LongType => c.cast(DoubleType) // already seconds
    case TimestampType          => c.cast(DoubleType)
    case _                      => lit(null).cast(DoubleType)
  }

  private def epochMillis(c: Column, dt: DataType): Column = dt match {
    case LongType | IntegerType => c.cast(DoubleType) / 1000.0
    case _                      => lit(null).cast(DoubleType)
  }

  private def isoDateTime(c: Column, dt: DataType): Column = dt match {
    case StringType =>
      // trailing 'Z' → instant; otherwise local date-time interpreted in UTC
      // (util/TimeUtil.kt:144-152). Session TZ is UTC so to_timestamp covers both.
      to_timestamp(regexp_replace(c, "Z$", "")).cast(DoubleType)
    case TimestampType => c.cast(DoubleType)
    case _             => lit(null).cast(DoubleType)
  }

  private def isoDate(c: Column, dt: DataType): Column = dt match {
    case StringType | DateType => to_date(c).cast(TimestampType).cast(DoubleType)
    case _                     => lit(null).cast(DoubleType)
  }

  private val chain: Seq[Candidate] = Seq(
    Candidate(Seq("value", "time"), epochSecondsNumeric),
    Candidate(Seq("key", "timeStart"), epochSecondsNumeric),
    Candidate(Seq("key", "start"), epochMillis),
    Candidate(Seq("value", "dateTime"), isoDateTime),
    Candidate(Seq("value", "date"), isoDate),
    Candidate(Seq("value", "timeReceived"), epochSecondsNumeric),
    Candidate(Seq("value", "timeCompleted"), epochSecondsNumeric))

  /** Case-insensitive schema lookup: actual field names along `path`, or None. */
  private def resolve(schema: StructType, path: Seq[String]): Option[(Seq[String], DataType)] = {
    def step(dt: DataType, rest: Seq[String], acc: Seq[String]): Option[(Seq[String], DataType)] =
      rest match {
        case Seq() => Some((acc, dt))
        case head +: tail =>
          dt match {
            case st: StructType =>
              st.fields.find(_.name.equalsIgnoreCase(head))
                .flatMap(f => step(f.dataType, tail, acc :+ f.name))
            case _ => None
          }
      }
    step(schema, path, Nil)
  }

  private def quoted(path: Seq[String]): Column =
    col(path.map(graft.model.Flatten.quote).mkString("."))

  /** Epoch-seconds Double column for a record schema, or null literal when no
    * candidate field exists.
    */
  def timeColumn(schema: StructType): Column = {
    val candidates = chain.flatMap { cand =>
      resolve(schema, cand.path).map { case (actual, dt) => cand.convert(quoted(actual), dt) }
    }
    if (candidates.isEmpty) lit(null).cast(DoubleType)
    else coalesce(candidates: _*)
  }

  /** UTC time-bin string from epoch-seconds; `unknown-time` when null —
    * or non-finite / out of timestamp range (path/FixedPathFormatterPlugin
    * .kt:26-35; the reference THROWS on NaN time — `BigDecimal(NaN)` in
    * TimeUtil.toInstant — failing the whole topic, so the unknown-time
    * fallback here is strictly more robust with no golden divergence).
    * Default bin = hourly. The trailing coalesce catches any residual
    * null from `date_format`, so a path built from this bin can never
    * collapse to NULL.
    */
  def timeBin(epochSec: Column, format: String = "yyyyMMdd_HH00"): Column = {
    val invalid = epochSec.isNull || isnan(epochSec.cast(DoubleType)) ||
      abs(epochSec.cast(DoubleType)) > lit(2.0e11) // ≈ year 8307, timestamp-safe
    when(invalid, lit("unknown-time"))
      .otherwise(coalesce(date_format(timestamp_seconds(epochSec), format),
        lit("unknown-time")))
  }
}
