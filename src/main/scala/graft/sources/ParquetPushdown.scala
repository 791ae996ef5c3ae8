package graft.sources

import org.apache.parquet.filter2.predicate.{FilterApi, FilterPredicate}
import org.apache.parquet.io.api.Binary
import org.apache.spark.sql.catalyst.util.DateTimeUtils
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._

/** Translates the connector's pushed-down V1 filters into parquet
  * `FilterPredicate`s so the vectorized reader skips ROW GROUPS (and, via
  * parquet's column indexes, pages) whose footer stats / dictionaries
  * cannot match — the missing level between the engine's manifest-granular
  * pruning and full file decode. At 100 TB a `ts` slice that survives
  * manifest pruning (the file's day overlaps the bound) still decodes the
  * whole file today; with the predicate in the reader conf, parquet's own
  * `RowGroupFilter` (stats + dictionary + bloom, all default-on in
  * `HadoopReadOptions`) drops the non-matching groups before any data page
  * is read. Files are sorted `(conv_id, turn_idx)` within a bucket, so
  * conv_id chunk stats are tight and a point lookup decodes ~one row group
  * per surviving file instead of the file.
  *
  * Safety rules:
  *  - translation is a NECESSARY condition, never exact — Spark re-checks
  *    every row (all filters stay residual), so dropping an untranslatable
  *    conjunct is safe, but an `Or`/`In` translates only if BOTH/ALL
  *    branches do (a partial disjunction would skip matching groups);
  *  - only columns of the table's CREATION schema (version 1 + the sink
  *    lineage columns) are referenced: add-only evolution means later
  *    columns are missing from older files, and parquet's
  *    schema-compatibility validation rejects predicates over absent
  *    columns; v1 columns exist in every file by construction;
  *  - `IsNull`/`IsNotNull`/`Not` and string prefix/suffix ops are left
  *    residual-only (null-count semantics and custom predicates buy little
  *    once stats cover the comparisons);
  *  - timestamps compare as INT64 micros — the engine's writers pin
  *    `TIMESTAMP_MICROS` (see `VectorizedFileReader`), and
  *    [[PrunePredicate.micros]]-style conversion keeps literal and column
  *    in the same unit.
  */
object ParquetPushdown {
  private sealed trait CmpOp
  private case object EQ extends CmpOp
  private case object GT extends CmpOp
  private case object GE extends CmpOp
  private case object LT extends CmpOp
  private case object LE extends CmpOp

  /** AND of every translatable filter; None when nothing translates. */
  def build(filters: Seq[Filter], fileSchema: StructType): Option[FilterPredicate] =
    filters.flatMap(convert(_, fileSchema)).reduceOption(FilterApi.and)

  def convertible(f: Filter, fileSchema: StructType): Boolean =
    convert(f, fileSchema).isDefined

  private def convert(f: Filter, s: StructType): Option[FilterPredicate] = f match {
    case EqualTo(a, v) => leaf(s, a, v, EQ)
    case EqualNullSafe(a, v) if v != null => leaf(s, a, v, EQ)
    case GreaterThan(a, v) => leaf(s, a, v, GT)
    case GreaterThanOrEqual(a, v) => leaf(s, a, v, GE)
    case LessThan(a, v) => leaf(s, a, v, LT)
    case LessThanOrEqual(a, v) => leaf(s, a, v, LE)
    case In(a, vs) if vs.nonEmpty =>
      // all-or-nothing: a disjunction missing one untranslatable value
      // would wrongly skip groups containing that value
      val parts = vs.toSeq.map(v => leaf(s, a, v, EQ))
      if (parts.forall(_.isDefined)) parts.flatten.reduceOption(FilterApi.or)
      else None
    case And(l, r) =>
      // partial is fine for a conjunction: any subset is still necessary
      (convert(l, s), convert(r, s)) match {
        case (Some(a), Some(b)) => Some(FilterApi.and(a, b))
        case (a, b) => a.orElse(b)
      }
    case Or(l, r) =>
      for (a <- convert(l, s); b <- convert(r, s)) yield FilterApi.or(a, b)
    case _ => None
  }

  private def leaf(s: StructType, name: String, value: Any, op: CmpOp): Option[FilterPredicate] = {
    if (value == null) return None
    s.fields.find(_.name == name).map(_.dataType).flatMap {
      case LongType => value match {
        case l: java.lang.Long => Some(cmpLong(name, l, op))
        case i: java.lang.Integer => Some(cmpLong(name, i.longValue(), op))
        case _ => None
      }
      case IntegerType => value match {
        case i: java.lang.Integer => Some(cmpInt(name, i, op))
        case _ => None
      }
      case StringType => value match {
        case str: String => Some(cmpBinary(name, Binary.fromString(str), op))
        case _ => None
      }
      case TimestampType => micros(value).map(m => cmpLong(name, m, op))
      case DoubleType => value match {
        case d: java.lang.Double => Some(cmpDouble(name, d, op))
        case _ => None
      }
      case BooleanType if op == EQ => value match {
        case b: java.lang.Boolean =>
          Some(FilterApi.eq(FilterApi.booleanColumn(name), b))
        case _ => None
      }
      case _ => None
    }
  }

  private def micros(v: Any): Option[java.lang.Long] = v match {
    case t: java.sql.Timestamp => Some(DateTimeUtils.fromJavaTimestamp(t))
    case i: java.time.Instant => Some(DateTimeUtils.instantToMicros(i))
    case _ => None
  }

  private def cmpLong(name: String, v: java.lang.Long, op: CmpOp): FilterPredicate = {
    val c = FilterApi.longColumn(name)
    op match {
      case EQ => FilterApi.eq(c, v)
      case GT => FilterApi.gt(c, v)
      case GE => FilterApi.gtEq(c, v)
      case LT => FilterApi.lt(c, v)
      case LE => FilterApi.ltEq(c, v)
    }
  }

  private def cmpInt(name: String, v: java.lang.Integer, op: CmpOp): FilterPredicate = {
    val c = FilterApi.intColumn(name)
    op match {
      case EQ => FilterApi.eq(c, v)
      case GT => FilterApi.gt(c, v)
      case GE => FilterApi.gtEq(c, v)
      case LT => FilterApi.lt(c, v)
      case LE => FilterApi.ltEq(c, v)
    }
  }

  private def cmpDouble(name: String, v: java.lang.Double, op: CmpOp): FilterPredicate = {
    val c = FilterApi.doubleColumn(name)
    op match {
      case EQ => FilterApi.eq(c, v)
      case GT => FilterApi.gt(c, v)
      case GE => FilterApi.gtEq(c, v)
      case LT => FilterApi.lt(c, v)
      case LE => FilterApi.ltEq(c, v)
    }
  }

  private def cmpBinary(name: String, v: Binary, op: CmpOp): FilterPredicate = {
    val c = FilterApi.binaryColumn(name)
    op match {
      case EQ => FilterApi.eq(c, v)
      case GT => FilterApi.gt(c, v)
      case GE => FilterApi.gtEq(c, v)
      case LT => FilterApi.lt(c, v)
      case LE => FilterApi.ltEq(c, v)
    }
  }
}
