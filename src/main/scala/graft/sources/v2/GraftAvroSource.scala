package graft.sources.v2

import java.util

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.file.DataFileReader
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericFixed, GenericRecord}
import org.apache.avro.util.Utf8
import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.AvroRead

/** DataSource V2 connector for the Kafka-connector Avro container layout
  * (`topic+partition+from[+to].avro` trees) — the S1 scan re-expressed as a
  * first-class Spark source:
  *
  *  - produces `InternalRow` directly (no external-Row encoder pass);
  *  - column pruning pushes into the Avro DECODE: fields absent from the
  *    required schema are skipped recursively, so a cleaner pass that needs
  *    only `(value.time, key.userId)` never materializes payload arrays;
  *  - one input partition per file group — the layout's natural split;
  *  - appends `__file`/`__pos` provenance when (and only when) requested.
  *
  * Usage (the `AvroRead.read` front-end builds these options):
  * {{{
  *   spark.read.format("graft-avro")
  *     .option("files", paths.mkString("\n"))
  *     .option("readerSchema", avroSchema.toString)
  *     .load()
  * }}}
  */
class GraftAvroSource extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {

  override def shortName(): String = "graft-avro"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftAvroSource.fullSchema(GraftAvroSource.readerSchema(options),
      GraftAvroSource.typedUnions(options))

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new GraftAvroTable(schema, new CaseInsensitiveStringMap(properties))
}

private[graft] object GraftAvroSource {
  val FilesOption = "files"
  val SchemaOption = "readerschema"
  val SkipOption = "skippositions"
  /** Files larger than this many bytes split into byte-range slices along
    * Avro sync boundaries (0/absent = no splitting). Slice readers keep the
    * file-global `__pos` exact by skimming the block HEADERS before their
    * range (count + seek per block — no record decode).
    */
  val SplitBytesOption = "splitbytes"
  /** `unionMode=typed` maps multi-branch non-null unions to a struct of
    * nullable `member<i>` branch columns instead of the default
    * stringified-resolved-branch rendering (P3 typed mode).
    */
  val UnionModeOption = "unionmode"

  def typedUnions(options: CaseInsensitiveStringMap): Boolean =
    Option(options.get(UnionModeOption)).map(_.toLowerCase(java.util.Locale.ROOT)) match {
      case None | Some("string") => false
      case Some("typed") => true
      case Some(other) =>
        throw new IllegalArgumentException(
          s"$UnionModeOption must be 'string' or 'typed', got '$other'")
    }

  /** `basename \t start-end[,start-end…]` per line — record POSITIONS
    * (0-based within the file, inclusive) the reader must not emit (P10 at
    * record granularity). Ranges must be sorted and non-overlapping (the
    * ledger's `covered` produces exactly that).
    */
  def encodeSkip(skip: Map[String, Seq[(Long, Long)]]): String =
    skip.iterator.map { case (name, rs) =>
      name + "\t" + rs.map { case (s, e) => s"$s-$e" }.mkString(",")
    }.mkString("\n")

  def decodeSkip(encoded: String): Map[String, Array[(Long, Long)]] =
    if (encoded == null || encoded.isEmpty) Map.empty
    else encoded.split('\n').iterator.filter(_.nonEmpty).map { line =>
      val tab = line.indexOf('\t')
      val ranges = line.substring(tab + 1).split(',').map { r =>
        val dash = r.indexOf('-')
        (r.substring(0, dash).toLong, r.substring(dash + 1).toLong)
      }
      line.substring(0, tab) -> ranges
    }.toMap

  def readerSchema(options: CaseInsensitiveStringMap): Schema = {
    val json = options.get(SchemaOption)
    require(json != null, s"graft-avro requires the '$SchemaOption' option")
    new Schema.Parser().parse(json)
  }

  def files(options: CaseInsensitiveStringMap): Seq[String] = {
    val v = options.get(FilesOption)
    require(v != null && v.nonEmpty, s"graft-avro requires the '$FilesOption' option")
    v.split('\n').toSeq.filter(_.nonEmpty)
  }

  def fullSchema(reader: Schema, typedUnions: Boolean = false): StructType = {
    val data = AvroRead.sparkType(reader, typedUnions).asInstanceOf[StructType]
    StructType(data.fields.toSeq :+
      StructField(AvroRead.FileCol, StringType, nullable = false) :+
      StructField(AvroRead.PosCol, LongType, nullable = false))
  }

  /** fs.* / security entries of a Configuration as a serializable map. */
  def confEntries(conf: Configuration): Map[String, String] = {
    val it = conf.iterator()
    val b = Map.newBuilder[String, String]
    while (it.hasNext) {
      val e = it.next()
      if (e.getKey.startsWith("fs.") || e.getKey.startsWith("hadoop.security"))
        b += e.getKey -> e.getValue
    }
    b.result()
  }
}

private[v2] class GraftAvroTable(tableSchema: StructType, options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String = "graft-avro"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(caseInsensitiveOptions: CaseInsensitiveStringMap): ScanBuilder =
    new GraftAvroScanBuilder(tableSchema, options)
}

private[v2] class GraftAvroScanBuilder(fullSchema: StructType, options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = fullSchema
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new GraftAvroScan(required, options)
}

private[v2] class GraftAvroScan(required: StructType, options: CaseInsensitiveStringMap)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-avro [${required.fieldNames.mkString(", ")}]"

  override def planInputPartitions(): Array[InputPartition] = {
    val files = GraftAvroSource.files(options)
    val spark = org.apache.spark.sql.SparkSession.active
    val parallelism = spark.sparkContext.defaultParallelism
    val splitBytes = Option(options.get(GraftAvroSource.SplitBytesOption))
      .map(_.toLong).filter(_ > 0)
    // whole-file slices by default; files above the split threshold fan out
    // into byte ranges cut at Avro sync boundaries by the reader (a 10 GB
    // container file otherwise pins one task for its whole decode)
    val slices: Seq[FileSlice] = splitBytes match {
      case None => files.map(FileSlice(_, 0L, Long.MaxValue))
      case Some(target) =>
        val conf = spark.sparkContext.hadoopConfiguration
        // driver-side stats are latency-bound (one RPC per file) — overlap
        // them for large listings
        def statAll(fs: Seq[String]): Seq[(String, Long)] =
          if (fs.size < 64)
            fs.map { f =>
              val p = new org.apache.hadoop.fs.Path(f)
              f -> p.getFileSystem(conf).getFileStatus(p).getLen
            }
          else {
            import scala.concurrent.{Await, ExecutionContext, Future}
            import scala.concurrent.duration.Duration
            val pool = java.util.concurrent.Executors.newFixedThreadPool(32)
            implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
            try Await.result(Future.sequence(fs.map(f => Future {
              val p = new org.apache.hadoop.fs.Path(f)
              f -> p.getFileSystem(conf).getFileStatus(p).getLen
            })), Duration.Inf)
            finally pool.shutdown()
          }
        statAll(files).flatMap { case (f, len) =>
          if (len <= target) Seq(FileSlice(f, 0L, Long.MaxValue))
          else (0L until len by target).map(s => FileSlice(f, s, math.min(s + target, len)))
        }
    }
    val groups = math.min(slices.size, math.max(1, parallelism))
    // round-robin grouping: neighboring slices (same file / topic partition)
    // spread across tasks, balancing offsets-per-task for append-heavy layouts
    slices.zipWithIndex.groupBy(_._2 % groups).values
      .map(g => GraftAvroPartition(g.map(_._1)))
      .toArray[InputPartition]
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val conf = org.apache.spark.sql.SparkSession.active
      .sparkContext.hadoopConfiguration
    GraftAvroReaderFactory(
      GraftAvroSource.readerSchema(options).toString,
      required.json,
      GraftAvroSource.confEntries(conf),
      Option(options.get(GraftAvroSource.SkipOption)).getOrElse(""))
  }
}

/** Decode-side pruning: restrict the reader schema to the REQUIRED
  * Catalyst shape so Avro's resolving decoder SKIPS the bytes of
  * unrequested writer fields instead of materializing them — a scan
  * selecting (key.userId, value.time) from records with large payload
  * arrays never allocates the payloads. Conservative by construction:
  *
  *  - prunes records (through nullable `[null, X]` unions, arrays, maps)
  *    only where the Catalyst type is the matching shape; multi-branch
  *    unions and stringified branches keep their full schema;
  *  - bails out to the FULL reader schema when any named type (record/
  *    enum/fixed) appears more than once in the tree — two prune sites
  *    could then emit conflicting definitions of one name — or when the
  *    tree is recursive, or when shapes fail to align.
  */
private[sources] object AvroPrune {
  import scala.jdk.CollectionConverters._

  private def namesUnique(root: Schema): Boolean = {
    val counts = scala.collection.mutable.Map.empty[String, Int]
    val visiting = scala.collection.mutable.Set.empty[String]
    var recursive = false
    def walk(s: Schema): Unit = s.getType match {
      case Schema.Type.RECORD =>
        counts(s.getFullName) = counts.getOrElse(s.getFullName, 0) + 1
        if (!visiting.add(s.getFullName)) { recursive = true }
        else {
          s.getFields.asScala.foreach(f => walk(f.schema))
          visiting.remove(s.getFullName)
        }
      case Schema.Type.UNION => s.getTypes.asScala.foreach(walk)
      case Schema.Type.ARRAY => walk(s.getElementType)
      case Schema.Type.MAP => walk(s.getValueType)
      case Schema.Type.ENUM | Schema.Type.FIXED =>
        counts(s.getFullName) = counts.getOrElse(s.getFullName, 0) + 1
      case _ => ()
    }
    walk(root)
    !recursive && counts.values.forall(_ <= 1)
  }

  def prune(avro: Schema, dt: StructType): Schema = {
    if (!namesUnique(avro)) return avro
    def go(a: Schema, d: DataType): Schema = (a.getType, d) match {
      case (Schema.Type.RECORD, st: StructType) =>
        val kept = st.fields.toSeq.map { f =>
          val af = a.getField(f.name)
          if (af == null) throw new IllegalStateException(s"field ${f.name} not in ${a.getFullName}")
          new Schema.Field(af.name, go(af.schema, f.dataType), af.doc, af.defaultVal())
        }
        Schema.createRecord(a.getName, a.getDoc, a.getNamespace, a.isError, kept.asJava)
      case (Schema.Type.UNION, _) =>
        val bs = a.getTypes.asScala.toSeq
        if (bs.size == 2 && bs.exists(_.getType == Schema.Type.NULL)) {
          val nn = bs.find(_.getType != Schema.Type.NULL).get
          val p = go(nn, d)
          if (p eq nn) a
          else Schema.createUnion(Seq(Schema.create(Schema.Type.NULL), p).asJava)
        } else a // multi-branch: decoded/stringified whole, keep all branches
      case (Schema.Type.ARRAY, at: ArrayType) =>
        val p = go(a.getElementType, at.elementType)
        if (p eq a.getElementType) a else Schema.createArray(p)
      case (Schema.Type.MAP, mt: MapType) =>
        val p = go(a.getValueType, mt.valueType)
        if (p eq a.getValueType) a else Schema.createMap(p)
      case _ => a
    }
    try go(avro, dt) catch { case _: Exception => avro }
  }
}

/** One byte range of one container file: blocks whose sync boundary falls
  * in `[start, end)` belong to this slice (the standard Hadoop split
  * contract — every block to exactly one slice). `(0, Long.MaxValue)` is
  * the whole file.
  */
private[v2] final case class FileSlice(path: String, start: Long, end: Long)

private[v2] final case class GraftAvroPartition(slices: Seq[FileSlice]) extends InputPartition

private[v2] final case class GraftAvroReaderFactory(
    readerSchemaJson: String, requiredJson: String,
    confEntries: Map[String, String], skipEncoded: String) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new GraftAvroPartitionReader(
      partition.asInstanceOf[GraftAvroPartition].slices,
      readerSchemaJson, requiredJson, confEntries, skipEncoded)
}

/** Streams the partition's file slices through one Avro reader at a time,
  * decoding ONLY the required fields into Catalyst values. Positions listed
  * in the skip map are not emitted: a skip range that spans a whole Avro
  * block skips the block WITHOUT decoding it (`nextBlock`), so incremental
  * re-reads of a partially-extracted file cost block-header I/O, not
  * decode CPU; partial blocks fall back to decode-and-discard into a
  * reused record (no per-skip allocation). Emitted `__pos` values are the
  * original file positions either way.
  *
  * Byte-range slices: a slice owns the blocks whose sync boundary falls in
  * `[start, end)`. A mid-file slice first SKIMS the block headers before
  * its range (`getBlockCount` + `nextBlock` — a count and a seek per
  * block, no record decode) so `__pos` stays the exact file-global record
  * index the ledger and order-preserving dedup rely on.
  */
private[v2] class GraftAvroPartitionReader(
    slices: Seq[FileSlice], readerSchemaJson: String, requiredJson: String,
    confEntries: Map[String, String], skipEncoded: String) extends PartitionReader[InternalRow] {

  private val readerSchema = new Schema.Parser().parse(readerSchemaJson)
  private val required = DataType.fromJson(requiredJson).asInstanceOf[StructType]
  private val conf = {
    val c = new Configuration()
    confEntries.foreach { case (k, v) => c.set(k, v) }
    c
  }

  private val wantFile = required.fieldNames.contains(AvroRead.FileCol)
  private val wantPos = required.fieldNames.contains(AvroRead.PosCol)
  // decode against the PRUNED reader schema (AvroPrune): Avro's resolving
  // decoder then SKIPS unrequested writer fields' bytes instead of
  // materializing them — column pruning reaches the decode itself
  private val decodeSchema: Schema = AvroPrune.prune(readerSchema,
    StructType(required.fields.filterNot(f =>
      f.name == AvroRead.FileCol || f.name == AvroRead.PosCol)))
  // data fields in required order, resolved to DECODE-schema positions;
  // the required DataType travels with each field so NESTED pruning prunes
  // the conversion too (a required struct may carry fewer fields than avro has)
  private val dataFields: Array[(Int, Schema, DataType, Int)] = {
    required.fields.zipWithIndex.collect {
      case (f, out) if f.name != AvroRead.FileCol && f.name != AvroRead.PosCol =>
        val avroField = decodeSchema.getField(f.name)
        require(avroField != null, s"field ${f.name} missing from reader schema")
        (avroField.pos(), avroField.schema(), f.dataType, out)
    }
  }
  private val fileSlot = required.fieldNames.indexOf(AvroRead.FileCol)
  private val posSlot = required.fieldNames.indexOf(AvroRead.PosCol)
  private val width = required.fields.length

  private val skipMap = GraftAvroSource.decodeSkip(skipEncoded)

  private var sliceIdx = -1
  private var reader: DataFileReader[GenericRecord] = _
  private var fname: UTF8String = _
  private var pos = 0L
  private var sliceEnd = Long.MaxValue
  private var current: InternalRow = _
  private var skipRanges: Array[(Long, Long)] = Array.empty
  private var skipIdx = 0
  // block accounting for decode-free whole-block skip: refreshed whenever
  // the previous block is exhausted (hasNext() loads the next header)
  private var blockTotal = -1L
  private var consumedInBlock = 0L
  private var reuse: GenericRecord = _

  private def openNext(): Boolean = {
    if (reader != null) { reader.close(); reader = null }
    sliceIdx += 1
    if (sliceIdx >= slices.size) return false
    val slice = slices(sliceIdx)
    val in = new org.apache.avro.mapred.FsInput(new org.apache.hadoop.fs.Path(slice.path), conf)
    reader = DataFileReader.openReader(in,
      new GenericDatumReader[GenericRecord](null, decodeSchema))
      .asInstanceOf[DataFileReader[GenericRecord]]
    val base = new org.apache.hadoop.fs.Path(slice.path).getName
    fname = UTF8String.fromString(base)
    pos = 0L
    sliceEnd = slice.end
    skipRanges = skipMap.getOrElse(base, Array.empty)
    skipIdx = 0
    blockTotal = -1L
    consumedInBlock = 0L
    // mid-file slice: skim (count + seek) the blocks owned by earlier
    // slices so `pos` is the exact file-global record index on arrival
    if (slice.start > 0) {
      while (reader.hasNext && !reader.pastSync(slice.start)) {
        pos += reader.getBlockCount
        reader.nextBlock()
      }
    }
    true
  }

  /** At a block boundary, a loaded header past the slice end means every
    * remaining block belongs to a later slice. (Only meaningful between
    * blocks: blockStart moves at block boundaries.)
    */
  private def sliceExhausted: Boolean =
    sliceEnd != Long.MaxValue &&
      (blockTotal < 0 || consumedInBlock == blockTotal) && reader.pastSync(sliceEnd)

  override def next(): Boolean = {
    while (true) {
      while (reader == null || !reader.hasNext || sliceExhausted) {
        if (!openNext()) return false
      }
      if (blockTotal < 0 || consumedInBlock == blockTotal) {
        blockTotal = reader.getBlockCount // hasNext() has loaded the header
        consumedInBlock = 0L
      }
      while (skipIdx < skipRanges.length && skipRanges(skipIdx)._2 < pos) skipIdx += 1
      if (skipIdx < skipRanges.length && pos >= skipRanges(skipIdx)._1) {
        // inside a skip range
        if (consumedInBlock == 0L && blockTotal > 0L &&
            pos + blockTotal - 1 <= skipRanges(skipIdx)._2) {
          // whole block inside the range → skip without decoding
          try {
            reader.nextBlock()
            pos += blockTotal
            consumedInBlock = blockTotal
          } catch { case _: IllegalStateException => // not at block start
            reuse = reader.next(reuse); pos += 1; consumedInBlock += 1
          }
        } else {
          reuse = reader.next(reuse); pos += 1; consumedInBlock += 1
        }
      } else {
        val rec = reader.next()
        consumedInBlock += 1
        val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(width)
        var i = 0
        while (i < dataFields.length) {
          val (avroPos, avroSchema, dt, out) = dataFields(i)
          row.update(out, GraftAvroPartitionReader.convert(rec.get(avroPos), avroSchema, dt))
          i += 1
        }
        if (wantFile) row.update(fileSlot, fname)
        if (wantPos) row.update(posSlot, pos)
        pos += 1
        current = row
        return true
      }
    }
    false // unreachable
  }

  override def get(): InternalRow = current
  override def close(): Unit = if (reader != null) { reader.close(); reader = null }
}

private[v2] object GraftAvroPartitionReader {

  /** Avro datum → Catalyst value following the REQUIRED data type, so
    * nested pruning prunes the decode (mirrors [[AvroRead.sparkType]]'s
    * type mapping).
    */
  def convert(datum: Any, s: Schema, dt: DataType): Any = {
    if (datum == null) return null
    s.getType match {
      case Schema.Type.RECORD =>
        val rec = datum.asInstanceOf[GenericRecord]
        val st = dt.asInstanceOf[StructType]
        val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(st.fields.length)
        var i = 0
        while (i < st.fields.length) {
          val f = st.fields(i)
          val avroField = s.getField(f.name)
          require(avroField != null, s"field ${f.name} missing from avro record ${s.getName}")
          row.update(i, convert(rec.get(avroField.pos()), avroField.schema, f.dataType))
          i += 1
        }
        row
      case Schema.Type.ENUM => UTF8String.fromString(datum.toString)
      case Schema.Type.STRING => datum match {
        case u: Utf8 => UTF8String.fromBytes(u.getBytes.clone(), 0, u.getByteLength)
        case other => UTF8String.fromString(other.toString)
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
        val vt = dt.asInstanceOf[MapType].valueType
        val m = datum.asInstanceOf[java.util.Map[Any, Any]]
        val keys = new Array[Any](m.size)
        val vals = new Array[Any](m.size)
        var i = 0
        val it = m.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          keys(i) = UTF8String.fromString(e.getKey.toString)
          vals(i) = convert(e.getValue, s.getValueType, vt)
          i += 1
        }
        new ArrayBasedMapData(new GenericArrayData(keys), new GenericArrayData(vals))
      case Schema.Type.ARRAY =>
        val et = dt.asInstanceOf[ArrayType].elementType
        val c = datum.asInstanceOf[java.util.Collection[Any]]
        val out = new Array[Any](c.size)
        var i = 0
        val it = c.iterator()
        while (it.hasNext) { out(i) = convert(it.next(), s.getElementType, et); i += 1 }
        new GenericArrayData(out)
      case Schema.Type.UNION =>
        val nonNull = s.getTypes.asScala.filter(_.getType != Schema.Type.NULL)
        if (nonNull.size == 1) convert(datum, nonNull.head, dt)
        else {
          val idx = GenericData.get().resolveUnion(s, datum)
          val branch = s.getTypes.get(idx)
          if (branch.getType == Schema.Type.NULL) null
          else dt match {
            // typed mode (unionMode=typed): struct of nullable member<i>
            // branch columns; only the resolved branch is set. The member
            // index comes from the field NAME so nested pruning may drop
            // branches without shifting the others.
            case st: StructType =>
              val memberIdx = nonNull.indexOf(branch)
              val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(st.fields.length)
              var i = 0
              while (i < st.fields.length) {
                val f = st.fields(i)
                if (f.name == s"member$memberIdx")
                  row.update(i, convert(datum, branch, f.dataType))
                else row.update(i, null)
                i += 1
              }
              row
            // default: runtime-branch resolution, stringified
            // (CsvAvroDataConverter.kt:64-67)
            case _ =>
              UTF8String.fromString(String.valueOf(AvroRead.convert(datum, branch)))
          }
        }
    }
  }
}
