package graft

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The driver has regenerated events.parquet with different physical `ts`
  * types across rounds (long nanos via nanosAsLong, TIMESTAMP_NTZ micros,
  * plain TIMESTAMP); [[Tables.normalizeEventsTs]] must map every form to
  * the same microsecond TimestampType values or event queries break
  * silently on the next regeneration.
  */
class TablesSpec extends SparkSpec {

  private val wantMicros = 1700000000123456L // 2023-11-14T22:13:20.123456Z

  private def micros(df: org.apache.spark.sql.DataFrame): Seq[Long] = {
    val out = Tables.normalizeEventsTs(df)
    assert(out.schema("ts").dataType === TimestampType)
    out.select(unix_micros(col("ts"))).collect().map(_.getLong(0)).toSeq
  }

  test("long nanos truncate to micros") {
    val df = spark.createDataFrame(
      java.util.List.of(Row(java.lang.Long.valueOf(wantMicros * 1000 + 789))),
      StructType(Seq(StructField("ts", LongType))))
    assert(micros(df) === Seq(wantMicros))
  }

  test("TIMESTAMP_NTZ casts value-identically under the UTC session") {
    val df = spark.range(1).select(
      timestamp_micros(lit(wantMicros)).cast(TimestampNTZType).as("ts"))
    assert(micros(df) === Seq(wantMicros))
  }

  test("TimestampType passes through unchanged") {
    val df = spark.range(1).select(timestamp_micros(lit(wantMicros)).as("ts"))
    assert(micros(df) === Seq(wantMicros))
  }

  test("the live testdata loads as microsecond TimestampType") {
    val ev = Tables.load(spark, sf, "events")
    assert(ev.schema("ts").dataType === TimestampType)
    assert(ev.limit(1).count() === 1)
  }
}
