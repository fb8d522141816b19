package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.avro.{JsonProperties, Schema}

/** Merge the distinct writer schemas of a topic batch into one reader
  * schema, so schema evolution across files never drops fields regardless
  * of which file happens to carry the newest schema (the reference decodes
  * each record against its own writer schema and splits differing headers
  * into attempt files — format/RecordConverterFactory.kt:36-53,
  * worker/RestructureWorker.kt:163-183; our single-reader design instead
  * widens the reader to the union of all writers).
  *
  * Rules:
  *  - records: fields unioned — left order first, right-only fields
  *    appended; a field absent on one side becomes nullable with a `null`
  *    default so files written before the field existed still resolve
  *    through standard Avro schema resolution;
  *  - unions: branch sets merged (same-type branches merged recursively);
  *  - maps/arrays: value/element schemas merged;
  *  - anything else equal passes through; genuinely incompatible leaves
  *    keep the left side (the CSV renderer stringifies every leaf anyway).
  */
object SchemaMerge {

  def merge(a: Schema, b: Schema): Schema =
    if (a == b) a
    else (a.getType, b.getType) match {
      case (Schema.Type.RECORD, Schema.Type.RECORD) => mergeRecords(a, b)
      case (Schema.Type.UNION, _) | (_, Schema.Type.UNION) => mergeUnions(a, b)
      case (Schema.Type.ENUM, Schema.Type.ENUM) if a.getFullName == b.getFullName =>
        // evolved symbol sets union (a's order first): a reader enum
        // missing a writer's symbol fails Avro resolution, so the merged
        // reader must carry every producer's symbols
        val symbols = (a.getEnumSymbols.asScala ++ b.getEnumSymbols.asScala).distinct
        if (symbols.size == a.getEnumSymbols.size) a
        else {
          // carry the Avro 1.9+ enum default through the rebuild: dropping
          // it would make resolution against a future writer symbol outside
          // the merged set FAIL where the original reader would have
          // coerced to the default
          val enumDefault = Option(a.getEnumDefault).orElse(Option(b.getEnumDefault)).orNull
          Schema.createEnum(a.getName, a.getDoc, a.getNamespace, symbols.asJava, enumDefault)
        }
      case (Schema.Type.MAP, Schema.Type.MAP) =>
        Schema.createMap(merge(a.getValueType, b.getValueType))
      case (Schema.Type.ARRAY, Schema.Type.ARRAY) =>
        Schema.createArray(merge(a.getElementType, b.getElementType))
      case _ => a
    }

  private def branches(s: Schema): Seq[Schema] =
    if (s.getType == Schema.Type.UNION) s.getTypes.asScala.toSeq else Seq(s)

  // Avro permits SEVERAL named branches of one kind in a union
  // (union[enum A, enum B] is legal) distinguished by full name, so NAMED
  // types (record/enum/fixed) must match on full name — matching enum by
  // type alone would collapse `enum Size` into `enum Color`, drop Size
  // from the merged reader union, and fail schema resolution for every
  // file of the Size-writing producer
  private val namedTypes: Set[Schema.Type] =
    Set(Schema.Type.RECORD, Schema.Type.ENUM, Schema.Type.FIXED)

  private def mergeUnions(a: Schema, b: Schema): Schema = {
    val merged = scala.collection.mutable.ArrayBuffer.from(branches(a))
    branches(b).foreach { bb =>
      val i = merged.indexWhere(ab => ab.getType == bb.getType &&
        (!namedTypes(ab.getType) || ab.getFullName == bb.getFullName))
      if (i < 0) merged += bb
      else merged(i) = merge(merged(i), bb)
    }
    if (merged.size == 1) merged.head else Schema.createUnion(merged.asJava)
  }

  /** `s` as a union with `null` FIRST (Avro requires the default's type to
    * match the first branch, and the added default is `null`).
    */
  private def nullable(s: Schema): Schema =
    if (s.getType == Schema.Type.NULL) s
    else if (s.getType == Schema.Type.UNION) {
      val bs = branches(s)
      if (bs.exists(_.getType == Schema.Type.NULL)) {
        if (bs.head.getType == Schema.Type.NULL) s
        else Schema.createUnion(
          (bs.filter(_.getType == Schema.Type.NULL) ++ bs.filterNot(_.getType == Schema.Type.NULL)).asJava)
      } else Schema.createUnion((Schema.create(Schema.Type.NULL) +: bs).asJava)
    } else Schema.createUnion(Seq(Schema.create(Schema.Type.NULL), s).asJava)

  /** Copy a field (Avro forbids reusing a Field in a new record). When the
    * field is missing from some writer in the batch (`forceDefault`) and
    * has no default of its own, it is made nullable with a `null` default.
    */
  private def copyField(f: Schema.Field, schema: Schema, forceDefault: Boolean): Schema.Field =
    if (!forceDefault || f.hasDefaultValue)
      new Schema.Field(f.name, schema, f.doc, f.defaultVal())
    else
      new Schema.Field(f.name, nullable(schema), f.doc, JsonProperties.NULL_VALUE)

  private def mergeRecords(a: Schema, b: Schema): Schema = {
    val bByName = b.getFields.asScala.map(f => f.name -> f).toMap
    val aNames = a.getFields.asScala.map(_.name).toSet
    val fields = a.getFields.asScala.toSeq.map { fa =>
      bByName.get(fa.name) match {
        case Some(fb) => copyField(fa, merge(fa.schema, fb.schema), forceDefault = false)
        case None => copyField(fa, fa.schema, forceDefault = true)
      }
    } ++ b.getFields.asScala.toSeq.collect {
      case fb if !aNames(fb.name) => copyField(fb, fb.schema, forceDefault = true)
    }
    val rec = Schema.createRecord(a.getName, a.getDoc, a.getNamespace, a.isError)
    rec.setFields(fields.asJava)
    rec
  }
}
