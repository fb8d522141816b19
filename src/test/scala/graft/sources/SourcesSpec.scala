package graft.sources

import java.io.File
import java.nio.file.Files

import org.apache.avro.Schema
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.hadoop.fs.{FileSystem, Path => HPath}

import graft.SparkSpec

class SourcesSpec extends SparkSpec {

  private def fs: FileSystem =
    new HPath("/tmp").getFileSystem(spark.sparkContext.hadoopConfiguration)

  test("AvroRead resolves evolved writer schemas against the topic reader schema") {
    val v1 = new Schema.Parser().parse(
      """{"type":"record","name":"R","fields":[
        |{"name":"value","type":{"type":"record","name":"V","fields":[
        |  {"name":"time","type":"double"}]}}]}""".stripMargin)
    val v2 = new Schema.Parser().parse(
      """{"type":"record","name":"R","fields":[
        |{"name":"value","type":{"type":"record","name":"V","fields":[
        |  {"name":"time","type":"double"},
        |  {"name":"label","type":["null","string"],"default":null}]}}]}""".stripMargin)
    val dir = Files.createTempDirectory("graft-evo").resolve("t/partition=0")
    Files.createDirectories(dir)
    def write(schema: Schema, name: String, put: GenericData.Record => Unit): Unit = {
      val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
      w.create(schema, new File(dir.toFile, name))
      val v = new GenericData.Record(schema.getField("value").schema)
      put(v)
      val r = new GenericData.Record(schema)
      r.put("value", v)
      w.append(r); w.close()
    }
    // reader schema comes from the newest slice (greatest filename) = v2
    write(v1, "t+0+0000000000.avro", v => v.put("time", 2.0))
    write(v2, "t+0+0000000001.avro", v => { v.put("time", 1.0); v.put("label", "x") })
    val df = AvroRead.read(spark,
      Seq(dir.resolve("t+0+0000000000.avro"), dir.resolve("t+0+0000000001.avro")).map(_.toString))
    val rows = df.select("value.time", "value.label").orderBy("time").collect()
    assert(rows.map(_.getDouble(0)).toSeq == Seq(1.0, 2.0))
    assert(rows(0).getString(1) == "x")
    assert(rows(1).isNullAt(1)) // v1 file resolved with default null
  }

  test("reader schema is order-independent: old writer in lexicographically-last file keeps evolved fields") {
    val v1 = new Schema.Parser().parse(
      """{"type":"record","name":"R","fields":[
        |{"name":"value","type":{"type":"record","name":"V","fields":[
        |  {"name":"time","type":"double"}]}}]}""".stripMargin)
    val v2 = new Schema.Parser().parse(
      """{"type":"record","name":"R","fields":[
        |{"name":"time2","type":"double"}],"aliases":[]}""".stripMargin)
    // real scenario: partition numbers are not zero-padded, so t+9+… sorts
    // AFTER t+10+… and the old writer schema would win a lexicographic pick
    val v2full = new Schema.Parser().parse(
      """{"type":"record","name":"R","fields":[
        |{"name":"value","type":{"type":"record","name":"V","fields":[
        |  {"name":"time","type":"double"},
        |  {"name":"label","type":["null","string"],"default":null}]}}]}""".stripMargin)
    val dir = Files.createTempDirectory("graft-evo2").resolve("t/partition=9")
    Files.createDirectories(dir)
    def write(schema: Schema, name: String, put: GenericData.Record => Unit): Unit = {
      val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
      w.create(schema, new File(dir.toFile, name))
      val v = new GenericData.Record(schema.getField("value").schema)
      put(v)
      val r = new GenericData.Record(schema)
      r.put("value", v)
      w.append(r); w.close()
    }
    write(v2full, "t+10+0000000000.avro", v => { v.put("time", 1.0); v.put("label", "x") })
    write(v1, "t+9+0000000000.avro", v => v.put("time", 2.0))
    assert("t+9+0000000000.avro" > "t+10+0000000000.avro") // the trap
    val df = AvroRead.read(spark,
      Seq(dir.resolve("t+9+0000000000.avro"), dir.resolve("t+10+0000000000.avro")).map(_.toString))
    val rows = df.select("value.time", "value.label").orderBy("time").collect()
    assert(rows.map(_.getDouble(0)).toSeq == Seq(1.0, 2.0))
    assert(rows(0).getString(1) == "x") // evolved field survives the merge
    assert(rows(1).isNullAt(1))
    assert(v2 != null) // silence unused fixture
  }

  test("V2 byte-range slices: split read ≡ whole-file read, exact file-global __pos, skip ranges across slices") {
    val schema = new Schema.Parser().parse(
      """{"type":"record","name":"R","fields":[{"name":"x","type":"long"}]}""")
    val dir = Files.createTempDirectory("graft-split").resolve("t/partition=0")
    Files.createDirectories(dir)
    val f = new File(dir.toFile, "t+0+0000000000.avro")
    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
    w.setSyncInterval(64) // tiny blocks → many sync boundaries to split on
    w.create(schema, f)
    (0L until 5000L).foreach { i =>
      val r = new GenericData.Record(schema)
      r.put("x", i)
      w.append(r)
    }
    w.close()
    def collectPairs(df: org.apache.spark.sql.DataFrame) =
      df.select("x", AvroRead.PosCol).collect()
        .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._2).toSeq

    val whole = AvroRead.read(spark, Seq(f.getPath), splitBytes = 0)
    val split = AvroRead.read(spark, Seq(f.getPath), splitBytes = 4096)
    assert(split.rdd.getNumPartitions > 1, "file did not split")
    val wp = collectPairs(whole)
    val sp = collectPairs(split)
    assert(wp.size == 5000 && wp.map(_._2) == (0L until 5000L))
    assert(sp == wp, "split read diverged from whole-file read")

    // a skip range spanning many slice boundaries still excludes exactly
    // its positions (the ledger/P10 contract)
    val skipped = AvroRead.read(spark, Seq(f.getPath),
      skipPositions = Map(f.getName -> Seq((100L, 2499L))), splitBytes = 4096)
    val got = collectPairs(skipped).map(_._2)
    assert(got == ((0L until 100L) ++ (2500L until 5000L)))
  }

  test("multi-branch union resolves the runtime branch into ONE stringified column (§7.4.4)") {
    // reference: CsvAvroDataConverter.kt:64-67 — a non-[null,T] union renders
    // as the resolved branch's string form in a single output column
    val schema = new Schema.Parser().parse(
      """{"type":"record","name":"R","fields":[
        |{"name":"value","type":{"type":"record","name":"V","fields":[
        |  {"name":"time","type":"double"},
        |  {"name":"u","type":["null","long","string","boolean"],"default":null}]}}]}""".stripMargin)
    val dir = Files.createTempDirectory("graft-union").resolve("t/partition=0")
    Files.createDirectories(dir)
    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, new File(dir.toFile, "t+0+0000000000.avro"))
    def rec(time: Double, u: Any): GenericRecord = {
      val v = new GenericData.Record(schema.getField("value").schema)
      v.put("time", time); v.put("u", u)
      val r = new GenericData.Record(schema)
      r.put("value", v); r
    }
    w.append(rec(1.0, null))
    w.append(rec(2.0, java.lang.Long.valueOf(42L)))
    w.append(rec(3.0, new org.apache.avro.util.Utf8("x")))
    w.append(rec(4.0, java.lang.Boolean.TRUE))
    w.close()
    val df = AvroRead.read(spark, Seq(dir.resolve("t+0+0000000000.avro").toString))
    assert(df.schema("value").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
      .apply("u").dataType == org.apache.spark.sql.types.StringType)
    val rows = df.select("value.time", "value.u").orderBy("time").collect()
    assert(rows(0).isNullAt(1))
    assert(rows(1).getString(1) == "42")
    assert(rows(2).getString(1) == "x")
    assert(rows(3).getString(1) == "true")
  }

  test("multi-branch union in unionMode=typed keeps branch types as member<i> struct fields (P3 typed)") {
    import org.apache.spark.sql.types.{BooleanType, LongType, StringType, StructType}
    val schema = new Schema.Parser().parse(
      """{"type":"record","name":"R","fields":[
        |{"name":"value","type":{"type":"record","name":"V","fields":[
        |  {"name":"time","type":"double"},
        |  {"name":"u","type":["null","long","string","boolean"],"default":null}]}}]}""".stripMargin)
    val dir = Files.createTempDirectory("graft-union-typed").resolve("t/partition=0")
    Files.createDirectories(dir)
    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, new File(dir.toFile, "t+0+0000000000.avro"))
    def rec(time: Double, u: Any): GenericRecord = {
      val v = new GenericData.Record(schema.getField("value").schema)
      v.put("time", time); v.put("u", u)
      val r = new GenericData.Record(schema)
      r.put("value", v); r
    }
    w.append(rec(1.0, null))
    w.append(rec(2.0, java.lang.Long.valueOf(42L)))
    w.append(rec(3.0, new org.apache.avro.util.Utf8("x")))
    w.append(rec(4.0, java.lang.Boolean.TRUE))
    w.close()
    val file = dir.resolve("t+0+0000000000.avro").toString
    val df = AvroRead.read(spark, Seq(file), unionMode = "typed")
    val uType = df.schema("value").dataType.asInstanceOf[StructType]
      .apply("u").dataType.asInstanceOf[StructType]
    assert(uType.fieldNames.toSeq == Seq("member0", "member1", "member2"))
    assert(uType("member0").dataType == LongType)
    assert(uType("member1").dataType == StringType)
    assert(uType("member2").dataType == BooleanType)
    val rows = df.select("value.time", "value.u.member0", "value.u.member1", "value.u.member2")
      .orderBy("time").collect()
    assert(rows(0).isNullAt(1) && rows(0).isNullAt(2) && rows(0).isNullAt(3))
    assert(rows(1).getLong(1) == 42L && rows(1).isNullAt(2) && rows(1).isNullAt(3))
    assert(rows(2).isNullAt(1) && rows(2).getString(2) == "x" && rows(2).isNullAt(3))
    assert(rows(3).isNullAt(1) && rows(3).isNullAt(2) && rows(3).getBoolean(3))
    // pruning a subset of branch members keeps member-name → branch mapping
    // (names, not positions, select the branch)
    val pruned = AvroRead.read(spark, Seq(file), unionMode = "typed")
      .select("value.time", "value.u.member2").orderBy("time").collect()
    assert(pruned(3).getBoolean(1) && pruned(1).isNullAt(1))
    // string mode on the same file is unchanged (both modes coexist)
    val str = AvroRead.read(spark, Seq(file))
    assert(str.schema("value").dataType.asInstanceOf[StructType]
      .apply("u").dataType == StringType)
    // an unknown mode fails fast
    intercept[Exception] {
      AvroRead.read(spark, Seq(file), unionMode = "bogus").collect()
    }
  }

  test("SchemaMerge: missing fields become nullable-with-default; merge is field-complete both ways") {
    val a = new Schema.Parser().parse(
      """{"type":"record","name":"R","fields":[
        |{"name":"x","type":"long"},{"name":"only_a","type":"string"}]}""".stripMargin)
    val b = new Schema.Parser().parse(
      """{"type":"record","name":"R","fields":[
        |{"name":"x","type":"long"},{"name":"only_b","type":"int"}]}""".stripMargin)
    for (m <- Seq(SchemaMerge.merge(a, b), SchemaMerge.merge(b, a))) {
      import scala.jdk.CollectionConverters._
      val names = m.getFields.asScala.map(_.name).toSet
      assert(names == Set("x", "only_a", "only_b"))
      // one-sided fields are nullable with a null default so every writer resolves
      for (n <- Seq("only_a", "only_b")) {
        val f = m.getField(n)
        assert(f.hasDefaultValue, s"$n needs a default")
        assert(f.schema.getType == Schema.Type.UNION &&
          f.schema.getTypes.get(0).getType == Schema.Type.NULL)
      }
    }
  }

  test("SchemaMerge: distinctly-NAMED enum/fixed union branches both survive; same-name enums union symbols") {
    import scala.jdk.CollectionConverters._
    // legal Avro: a union may hold several named enums — merging by type
    // alone would drop one and fail resolution for its producer's files
    val a = new Schema.Parser().parse(
      """{"type":"record","name":"R","fields":[
        |{"name":"x","type":["null",{"type":"enum","name":"Color","symbols":["RED"]}]}]}""".stripMargin)
    val b = new Schema.Parser().parse(
      """{"type":"record","name":"R","fields":[
        |{"name":"x","type":["null",{"type":"enum","name":"Size","symbols":["BIG"]}]}]}""".stripMargin)
    val m = SchemaMerge.merge(a, b)
    val branchNames = m.getField("x").schema.getTypes.asScala
      .filter(_.getType == Schema.Type.ENUM).map(_.getName).toSet
    assert(branchNames == Set("Color", "Size"), s"named branch dropped: $branchNames")
    // same-name enum with evolved symbols: merged reader carries the union
    val c = new Schema.Parser().parse(
      """{"type":"record","name":"R","fields":[
        |{"name":"x","type":["null",{"type":"enum","name":"Color","symbols":["RED","BLUE"]}]}]}""".stripMargin)
    val m2 = SchemaMerge.merge(a, c)
    val colors = m2.getField("x").schema.getTypes.asScala
      .find(_.getType == Schema.Type.ENUM).get.getEnumSymbols.asScala.toSeq
    assert(colors == Seq("RED", "BLUE"), s"evolved symbols lost: $colors")
  }

  test("StorageIndex: marker-based incremental sync; new dirs on the empty cadence; full sync reflects deletes") {
    val root = Files.createTempDirectory("graft-idx")
    val dir = root.resolve("topicA/partition=0")
    Files.createDirectories(dir)
    Files.write(dir.resolve("topicA+0+0000000000.avro"), Array[Byte](1))
    val idx = new StorageIndex(fs, root.toString,
      fullSyncIntervalMs = 1000000L, emptyDirSyncIntervalMs = 1000L)
    val t0 = 1000000L
    assert(idx.topics(t0).keySet == Set("topicA"))
    assert(idx.syncs == 1)
    // new file in a KNOWN dir: found by the startAfter-marker merge, not a full re-list
    Files.write(dir.resolve("topicA+0+0000000001.avro"), Array[Byte](1))
    assert(idx.topics(t0 + 10).apply("topicA").size == 2)
    assert(idx.syncs == 1 && idx.incrementalSyncs == 1)
    // a NEW topic directory stays invisible until the empty-dir cadence expires
    val dirB = root.resolve("topicB/partition=0")
    Files.createDirectories(dirB)
    Files.write(dirB.resolve("topicB+0+0000000000.avro"), Array[Byte](1))
    assert(idx.topics(t0 + 20).keySet == Set("topicA"))
    assert(idx.topics(t0 + 2000).keySet == Set("topicA", "topicB")) // rescanEmpty tick
    assert(idx.syncs == 1)
    // deletions are add-only-invisible until the full-sync cadence
    Files.delete(dir.resolve("topicA+0+0000000001.avro"))
    assert(idx.topics(t0 + 2010).apply("topicA").size == 2) // stale merged view
    assert(idx.topics(t0 + 1000001L).apply("topicA").size == 1) // full re-list
    assert(idx.syncs == 2)
    // explicit invalidation → full re-list immediately
    idx.invalidate()
    idx.topics(t0 + 1000002L)
    assert(idx.syncs == 3)
  }

  test("AvroPrune: decode schema drops unrequested fields, bails on shared/recursive names") {
    import graft.sources.v2.AvroPrune
    import org.apache.spark.sql.types._
    val schema = new Schema.Parser().parse(
      """{"type":"record","name":"R","fields":[
        |{"name":"key","type":{"type":"record","name":"K","fields":[
        |  {"name":"userId","type":"string"},{"name":"sourceId","type":"string"}]}},
        |{"name":"value","type":{"type":"record","name":"V","fields":[
        |  {"name":"time","type":"double"},
        |  {"name":"payload","type":{"type":"array","items":"double"}}]}}]}""".stripMargin)
    val want = StructType(Seq(
      StructField("key", StructType(Seq(StructField("userId", StringType)))),
      StructField("value", StructType(Seq(StructField("time", DoubleType))))))
    val pruned = AvroPrune.prune(schema, want)
    assert(pruned.getField("key").schema.getField("sourceId") == null, "sourceId not pruned")
    assert(pruned.getField("value").schema.getField("payload") == null, "payload not pruned")
    assert(pruned.getField("value").schema.getField("time") != null)
    // shared named type (K used twice): pruning could emit two conflicting
    // definitions of one name — must bail to the full schema
    val shared = new Schema.Parser().parse(
      """{"type":"record","name":"R2","fields":[
        |{"name":"a","type":{"type":"record","name":"K","fields":[
        |  {"name":"x","type":"string"},{"name":"y","type":"string"}]}},
        |{"name":"b","type":"K"}]}""".stripMargin)
    val wantShared = StructType(Seq(
      StructField("a", StructType(Seq(StructField("x", StringType))))))
    assert(AvroPrune.prune(shared, wantShared) eq shared, "shared-name tree must not prune")
  }

  test("decode-side pruning returns identical values to the full read (large unread payload)") {
    import org.apache.avro.file.DataFileWriter
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    val schema = new Schema.Parser().parse(
      """{"type":"record","name":"R","fields":[
        |{"name":"key","type":{"type":"record","name":"K","fields":[
        |  {"name":"userId","type":"string"}]}},
        |{"name":"value","type":{"type":"record","name":"V","fields":[
        |  {"name":"time","type":"double"},
        |  {"name":"payload","type":{"type":"array","items":"double"}}]}}]}""".stripMargin)
    val dir = Files.createTempDirectory("graft-prune").resolve("t/partition=0")
    Files.createDirectories(dir)
    val f = dir.resolve("t+0+0000000000+0000000009.avro").toFile
    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, f)
    (0 until 10).foreach { i =>
      val k = new GenericData.Record(schema.getField("key").schema)
      k.put("userId", s"u$i")
      val v = new GenericData.Record(schema.getField("value").schema)
      v.put("time", 1.6e9 + i)
      v.put("payload", java.util.Arrays.asList((0 until 256).map(d => Double.box(d * 0.5 + i)): _*))
      val r = new GenericData.Record(schema)
      r.put("key", k); r.put("value", v)
      w.append(r)
    }
    w.close()
    val full = AvroRead.read(spark, Seq(f.toString))
      .select("key.userId", "value.time").collect()
      .map(r => (r.getString(0), r.getDouble(1))).sortBy(_._1)
    // narrow projection: the payload array must be SKIPPED in the decode,
    // and values must match the full read exactly
    val pruned = AvroRead.read(spark, Seq(f.toString))
      .select(org.apache.spark.sql.functions.col("key.userId"),
        org.apache.spark.sql.functions.col("value.time"))
    val prunedRows = pruned.collect().map(r => (r.getString(0), r.getDouble(1))).sortBy(_._1)
    assert(prunedRows.toSeq == full.toSeq)
    assert(prunedRows.length == 10)
  }

  test("StorageIndex: UNPADDED offset digit rollover stays visible to incremental sync") {
    // lexicographically "t+0+1000.avro" < "t+0+999.avro", so a raw-name
    // startAfter marker would hide every post-rollover file until the next
    // full re-list (an hour of invisible data on the default cadence)
    val root = Files.createTempDirectory("graft-idx-pad")
    val dir = root.resolve("topicA/partition=0")
    Files.createDirectories(dir)
    Files.write(dir.resolve("topicA+0+999.avro"), Array[Byte](1))
    val idx = new StorageIndex(fs, root.toString,
      fullSyncIntervalMs = 1000000L, emptyDirSyncIntervalMs = 1000000L)
    val t0 = 1000000L
    assert(idx.topics(t0).apply("topicA").size == 1)
    Files.write(dir.resolve("topicA+0+1000.avro"), Array[Byte](1))
    val names = idx.topics(t0 + 10).apply("topicA")
      .map(_.getPath.getName).toSet
    assert(idx.syncs == 1, "must be the marker merge, not a full re-list")
    assert(names == Set("topicA+0+999.avro", "topicA+0+1000.avro"),
      s"rollover file invisible to incremental sync: $names")
  }
}
