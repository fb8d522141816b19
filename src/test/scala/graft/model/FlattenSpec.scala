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

  test("flattenDynamic recurses: array<struct> -> a.0.b leaves, CSV-writable") {
    // expanded elements that are still structs must keep flattening (the
    // reference's converter recurses through RECORD/MAP/ARRAY alike);
    // struct-typed output columns would throw on CSV write
    val df = Seq(
      (1, Seq((10, "x"), (20, "y"))),
      (2, Seq((30, "z")))).toDF("id", "a")
      .selectExpr("id", "transform(a, e -> named_struct('b', e._1, 'c', e._2)) AS a")
    val flat = Flatten.flattenDynamic(df)
    assert(flat.columns.toSeq == Seq("id", "a.0.b", "a.0.c", "a.1.b", "a.1.c"),
      flat.columns.toSeq.toString)
    assert(flat.schema.fields.forall(f => !f.dataType.isInstanceOf[
      org.apache.spark.sql.types.StructType]))
    val rows = flat.orderBy("id").collect()
    assert(rows(0).getInt(rows(0).fieldIndex("a.1.b")) == 20)
    assert(rows(1).isNullAt(rows(1).fieldIndex("a.1.b")))
    // map<string, struct> too
    val dm = Seq((1, Map("k" -> (7, "v")))).toDF("id", "m")
      .selectExpr("id", "transform_values(m, (k, e) -> named_struct('b', e._1, 'c', e._2)) AS m")
    val fm = Flatten.flattenDynamic(dm)
    assert(fm.columns.toSeq == Seq("id", "m.k.b", "m.k.c"))
    assert(fm.collect()(0).getInt(1) == 7)
  }
}
