package graft.sources

import java.io.File
import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.file.DataFileReader
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericFixed, GenericRecord}
import org.apache.avro.util.Utf8
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Distributed Avro container-file scan built directly on the Avro Java
  * library (no spark-avro connector in this environment) — the S1 operator
  * (reference: util/GenericRecordReader.kt:11-42).
  *
  * Planning happens on the driver (schema read from one file header);
  * record decoding runs on executors, one task per group of files, streaming
  * — the same per-file parallelism a Kafka-connector output tree offers at
  * cluster scale (files are the natural split unit; Avro blocks could
  * subdivide further for huge files).
  *
  * Appends two provenance columns used for offset accounting and
  * order-preserving dedup: `__file` (file name) and `__pos` (record index
  * within the file).
  */
object AvroRead {

  val FileCol = "__file"
  val PosCol = "__pos"

  /** Avro → Spark type mapping (§1.2 of SURVEY.md). Multi-branch non-null
    * unions render as strings by default (the reference resolves the
    * runtime branch and stringifies into one CSV column,
    * format/CsvAvroDataConverter.kt:64-67); with `typedUnions` they map to
    * a struct of one nullable `member<i>` field per non-null branch
    * (exactly one set per record — the resolved branch), preserving branch
    * types for downstream relational work.
    */
  def sparkType(s: Schema): DataType = sparkType(s, typedUnions = false)

  def sparkType(s: Schema, typedUnions: Boolean): DataType = s.getType match {
    case Schema.Type.RECORD =>
      StructType(s.getFields.asScala.toSeq.map(f =>
        StructField(f.name, sparkType(f.schema, typedUnions), nullable = true)))
    case Schema.Type.ENUM | Schema.Type.STRING => StringType
    case Schema.Type.BYTES | Schema.Type.FIXED => BinaryType
    case Schema.Type.INT => IntegerType
    case Schema.Type.LONG => LongType
    case Schema.Type.FLOAT => FloatType
    case Schema.Type.DOUBLE => DoubleType
    case Schema.Type.BOOLEAN => BooleanType
    case Schema.Type.NULL => NullType
    case Schema.Type.MAP => MapType(StringType, sparkType(s.getValueType, typedUnions))
    case Schema.Type.ARRAY => ArrayType(sparkType(s.getElementType, typedUnions))
    case Schema.Type.UNION =>
      val nonNull = s.getTypes.asScala.filter(_.getType != Schema.Type.NULL)
      if (nonNull.size == 1) sparkType(nonNull.head, typedUnions)
      else if (typedUnions)
        StructType(nonNull.toSeq.zipWithIndex.map { case (b, i) =>
          StructField(s"member$i", sparkType(b, typedUnions), nullable = true)
        })
      else StringType
  }

  /** Avro datum → Spark external row value, following [[sparkType]]. */
  def convert(datum: Any, s: Schema): Any = {
    if (datum == null) return null
    s.getType match {
      case Schema.Type.RECORD =>
        val rec = datum.asInstanceOf[GenericRecord]
        Row.fromSeq(s.getFields.asScala.toSeq.map(f => convert(rec.get(f.pos()), f.schema)))
      case Schema.Type.ENUM => datum.toString
      case Schema.Type.STRING => datum match {
        case u: Utf8 => u.toString
        case other => other.toString
      }
      case Schema.Type.BYTES =>
        val bb = datum.asInstanceOf[java.nio.ByteBuffer]
        val out = new Array[Byte](bb.remaining())
        bb.duplicate().get(out)
        out
      case Schema.Type.FIXED => datum.asInstanceOf[GenericFixed].bytes().clone()
      case Schema.Type.INT | Schema.Type.LONG | Schema.Type.FLOAT |
           Schema.Type.DOUBLE | Schema.Type.BOOLEAN => datum
      case Schema.Type.NULL => null
      case Schema.Type.MAP =>
        datum.asInstanceOf[java.util.Map[Any, Any]].asScala.map { case (k, v) =>
          k.toString -> convert(v, s.getValueType)
        }.toMap
      case Schema.Type.ARRAY =>
        datum.asInstanceOf[java.util.Collection[Any]].asScala.toSeq
          .map(convert(_, s.getElementType))
      case Schema.Type.UNION =>
        val nonNull = s.getTypes.asScala.filter(_.getType != Schema.Type.NULL)
        if (nonNull.size == 1) convert(datum, nonNull.head)
        else {
          // runtime-branch resolution, stringified (CsvAvroDataConverter.kt:64-67)
          val idx = GenericData.get().resolveUnion(s, datum)
          val branch = s.getTypes.get(idx)
          if (branch.getType == Schema.Type.NULL) null
          else String.valueOf(convert(datum, branch))
        }
    }
  }

  /** Filesystem-relevant Hadoop settings to ship to tasks (S3A/ABFS
    * endpoints and credentials set by [[graft.jobs.ConfigLoader]] live on
    * the session's hadoopConfiguration, which is not serializable itself).
    */
  private[graft] def fsConfEntries(spark: SparkSession): Map[String, String] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val it = conf.iterator()
    val b = Map.newBuilder[String, String]
    while (it.hasNext) {
      val e = it.next()
      if (e.getKey.startsWith("fs.") || e.getKey.startsWith("hadoop.security"))
        b += e.getKey -> e.getValue
    }
    b.result()
  }

  private def toConf(entries: Map[String, String]): org.apache.hadoop.conf.Configuration = {
    val c = new org.apache.hadoop.conf.Configuration()
    entries.foreach { case (k, v) => c.set(k, v) }
    c
  }

  private def open(path: String, conf: org.apache.hadoop.conf.Configuration): DataFileReader[GenericRecord] = {
    val in = new org.apache.avro.mapred.FsInput(
      new org.apache.hadoop.fs.Path(path), conf)
    DataFileReader.openReader(in, new GenericDatumReader[GenericRecord]())
      .asInstanceOf[DataFileReader[GenericRecord]]
  }

  /** Read the writer schema from a container file header (driver-side; any
    * Hadoop filesystem).
    */
  def readSchema(path: String,
      conf: org.apache.hadoop.conf.Configuration = new org.apache.hadoop.conf.Configuration()): Schema = {
    val r = open(path, conf)
    try r.getSchema finally r.close()
  }

  /** The topic reader schema: the merge of every distinct writer schema in
    * the batch ([[SchemaMerge]]), so fields added (or dropped) by schema
    * evolution are present no matter which file carries which version —
    * filename order is NOT a schema-recency order (partition numbers are
    * unpadded, so `events+9+…` sorts after `events+10+…`). Files written
    * before a field existed resolve through Avro defaults. Header reads are
    * driver-side and parallel (a container header is a few KB).
    */
  def topicReaderSchema(spark: SparkSession, files: Seq[String]): Schema = {
    val conf = toConf(fsConfEntries(spark))
    val schemas: Seq[Schema] =
      if (files.size == 1) Seq(readSchema(files.head, conf))
      else {
        import scala.concurrent.{Await, ExecutionContext, Future}
        import scala.concurrent.duration.Duration
        val pool = java.util.concurrent.Executors.newFixedThreadPool(math.min(16, files.size))
        implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
        try Await.result(
          Future.sequence(files.map(f => Future(readSchema(f, conf)))), Duration.Inf)
        finally pool.shutdown()
      }
    schemas.distinct.reduce(SchemaMerge.merge)
  }

  /** Distributed read of `files` (all sharing one topic reader schema)
    * into a DataFrame with `__file`/`__pos` provenance columns, via the
    * [[graft.sources.v2.GraftAvroSource]] DataSource V2 connector:
    * `InternalRow` production (no external-Row encoder pass) and column
    * pruning pushed into the Avro decode. Callers filter zero-length files
    * (P11 guard) from the listing. Works against any Hadoop filesystem via
    * avro-mapred's `FsInput`, with the session's fs.* configuration
    * propagated to tasks.
    */
  def read(spark: SparkSession, files: Seq[String],
      readerSchema: Option[Schema] = None,
      skipPositions: Map[String, Seq[(Long, Long)]] = Map.empty,
      // files above this size split into byte-range slices on Avro sync
      // boundaries (a huge container file otherwise pins one task for its
      // whole decode); 0 disables splitting
      splitBytes: Long = 256L << 20,
      // "string" (reference CSV rendering) | "typed" (struct-of-branch
      // member<i> columns for multi-branch non-null unions)
      unionMode: String = "string"): DataFrame = {
    require(files.nonEmpty, "no avro files to read")
    val schema = readerSchema.getOrElse(topicReaderSchema(spark, files))
    val rd = spark.read.format("graft-avro")
      .option("files", files.mkString("\n"))
      .option("readerSchema", schema.toString)
      .option("splitBytes", splitBytes.toString)
      .option("unionMode", unionMode)
    (if (skipPositions.isEmpty) rd
     else rd.option("skipPositions", v2.GraftAvroSource.encodeSkip(skipPositions)))
      .load()
  }
}
