package graft.model

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FlattenSpec extends SparkSpec {
  import spark.implicits._

  test("struct flatten: dot names in schema field order") {
    val df = Seq((1, "a", 2.0)).toDF("x", "y", "z")
      .select(struct(col("x"), struct(col("y"), col("z")).as("inner")).as("key"), col("z"))
    val flat = Flatten.flatten(df)
    assert(flat.columns.toSeq == Seq("key.x", "key.inner.y", "key.inner.z", "z"))
    val row = flat.collect()(0)
    assert(row.getInt(0) == 1 && row.getString(1) == "a")
  }

  test("headerFingerprint stable for same header, distinct for different") {
    val df1 = Seq((1, "a")).toDF("x", "y")
    val df2 = Seq((2, "b")).toDF("x", "y")
    val df3 = Seq((1, "a")).toDF("x", "w")
    assert(Flatten.headerFingerprint(df1.schema) == Flatten.headerFingerprint(df2.schema))
    assert(Flatten.headerFingerprint(df1.schema) != Flatten.headerFingerprint(df3.schema))
  }

  test("flattenDynamic: maps become per-key columns, arrays positional") {
    val df = Seq(
      (1, Map("a" -> 1, "b" -> 2), Seq("p", "q")),
      (2, Map("b" -> 3), Seq("r"))).toDF("id", "m", "arr")
    val flat = Flatten.flattenDynamic(df)
    assert(flat.columns.toSeq == Seq("id", "m.a", "m.b", "arr.0", "arr.1"))
    val rows = flat.orderBy("id").collect()
    assert(rows(0).getInt(rows(0).fieldIndex("m.a")) == 1)
    assert(rows(1).isNullAt(rows(1).fieldIndex("m.a")))
    assert(rows(1).getString(rows(1).fieldIndex("arr.0")) == "r")
    assert(rows(1).isNullAt(rows(1).fieldIndex("arr.1")))
  }
}
