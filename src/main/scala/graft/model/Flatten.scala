package graft.model

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Recursive struct flattening to dot-joined column names, in schema field
  * order — the Spark-native equivalent of the reference's depth-first CSV
  * flattener (reference: format/CsvAvroDataConverter.kt:20-83, header
  * derivation format/RecordConverterFactory.kt:111-164).
  *
  * The whole transform is a single `select`, so Catalyst prunes unreferenced
  * leaves at the parquet/avro scan — unlike the reference, which always
  * materializes full records.
  */
object Flatten {

  /** Backtick-quote one column-name component (shared: `DynamicShape` and
    * the jobs build the same escaping — one definition, not copies).
    */
  private[graft] def quote(name: String): String = "`" + name.replace("`", "``") + "`"

  /** Dotted leaf names with their types, depth-first schema order. */
  def leafPaths(schema: StructType, sep: String = "."): Seq[(String, DataType)] = {
    def walk(st: StructType, path: Seq[String]): Seq[(String, DataType)] =
      st.fields.toSeq.flatMap { f =>
        val p = path :+ f.name
        f.dataType match {
          case s: StructType => walk(s, p)
          case dt => Seq(p.mkString(sep) -> dt)
        }
      }
    walk(schema, Nil)
  }

  /** Column expression for one dotted leaf path (components quoted).
    * Splits on the FULL separator string — `split(sep.head)` would mangle
    * any multi-character separator into per-char splits.
    */
  def leafColumn(dotted: String, sep: String = "."): Column =
    col(dotted.split(java.util.regex.Pattern.quote(sep)).map(quote).mkString("."))

  /** Leaf columns of `schema` in depth-first schema order; structs recurse,
    * everything else (incl. map/array) is a leaf.
    */
  def leafColumns(schema: StructType, sep: String = "."): Seq[Column] = {
    def walk(st: StructType, path: Seq[String]): Seq[Column] =
      st.fields.toSeq.flatMap { f =>
        val p = path :+ f.name
        f.dataType match {
          case s: StructType => walk(s, p)
          case _ => Seq(col(p.map(quote).mkString(".")).as(p.mkString(sep)))
        }
      }
    walk(schema, Nil)
  }

  /** Flatten all nested structs of `df` into dot-named top-level columns. */
  def flatten(df: DataFrame, sep: String = "."): DataFrame =
    df.select(leafColumns(df.schema, sep): _*)

  /** Flattened-header fingerprint — identifies the output schema of a row
    * group, the analog of the reference's header-match/attempt mechanism
    * (worker/FileCacheStore.kt:59-129). Same header list ⇒ same fingerprint.
    */
  def headerFingerprint(schema: StructType, sep: String = "."): String = {
    def names(st: StructType, path: Seq[String]): Seq[String] =
      st.fields.toSeq.flatMap { f =>
        val p = path :+ f.name
        f.dataType match {
          case s: StructType => names(s, p)
          case _ => Seq(p.mkString(sep))
        }
      }
    java.util.UUID
      .nameUUIDFromBytes(names(schema, Nil).mkString("|").getBytes("UTF-8"))
      .toString
  }

  /** Data-dependent flatten of map/array columns into positional columns —
    * maps become `prefix.key` per distinct key observed, arrays become
    * `prefix.0 … prefix.(maxLen-1)`, RECURSIVELY until only scalars remain
    * (`array<struct<b>>` → `a.0.b`, like the reference's depth-first
    * converter, format/CsvAvroDataConverter.kt:52-63).
    *
    * Key discovery dedups BEFORE collection (explode → distinct per map
    * field): a `collect_list` of every row's key array would concatenate
    * O(rows × keys-per-row) elements into one aggregation buffer before
    * deduping — an OOM at corpus scale. Array arities stay one scalar
    * aggregation. (The production dynamic-topic WRITE path does not go
    * through here — `DynamicShape` fingerprints shapes per row — this is
    * the standalone analysis utility.)
    */
  def flattenDynamic(df: DataFrame, sep: String = "."): DataFrame = {
    // structs first: dotted leaves, with maps/arrays surfacing as leaves
    val flat = flatten(df, sep)
    val mapFields = flat.schema.fields.collect {
      case StructField(n, MapType(StringType, _, _), _, _) => n
    }
    val arrFields = flat.schema.fields.collect {
      case StructField(n, ArrayType(_, _), _, _) => n
    }
    if (mapFields.isEmpty && arrFields.isEmpty) return flat

    val mapKeys: Map[String, Seq[String]] = mapFields.toSeq.map { n =>
      n -> flat.select(explode(map_keys(col(quote(n)))).as("__k"))
        .distinct().collect().map(_.getString(0)).toSeq.sorted
    }.toMap
    val arrLens: Map[String, Int] =
      if (arrFields.isEmpty) Map.empty
      else {
        val aggs = arrFields.toSeq.map(n => max(size(col(quote(n)))).as(s"__len_$n"))
        val row = flat.agg(aggs.head, aggs.tail: _*).collect()(0)
        arrFields.toSeq.map { n =>
          val i = row.fieldIndex(s"__len_$n")
          // max(size(...)) is null when the array is null in every row
          n -> (if (row.isNullAt(i)) 0 else math.max(0, row.getInt(i)))
        }.toMap
      }

    val cols = flat.schema.fields.toSeq.flatMap { f =>
      val q = col(quote(f.name))
      f.dataType match {
        case MapType(StringType, _, _) =>
          // try_element_at → NULL on absent key (ANSI-safe)
          mapKeys(f.name).map(k => try_element_at(q, lit(k)).as(s"${f.name}$sep$k"))
        case ArrayType(_, _) =>
          // get() is 0-based and NULL-tolerant beyond the array length
          (0 until arrLens(f.name)).map(i => get(q, lit(i)).as(s"${f.name}$sep$i"))
        case _ => Seq(q)
      }
    }
    // expanded elements may themselves be structs/maps/arrays
    // (array<struct> → struct-typed `a.0` columns): recurse to scalars —
    // depth strictly decreases each pass, so this terminates
    flattenDynamic(flat.select(cols: _*), sep)
  }
}
