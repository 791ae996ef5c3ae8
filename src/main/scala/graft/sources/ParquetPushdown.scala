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
  *    [[PrunePredicate.micros]] conversion keeps literal and column in the
  *    same unit (shared definition).
  *
  * Why not Spark's internal `ParquetFilters`: its constructor wants the
  * per-file parquet `MessageType` plus a datetime rebase spec resolved per
  * file — state this connector's shared-conf vectorized reader
  * deliberately avoids re-deriving (one conf, many files). This object is
  * the small closed subset the engine needs (6 leaf types, necessary-only
  * semantics), kept apart so reader wiring stays file-agnostic.
  */
object ParquetPushdown {
  private sealed trait CmpOp
  private case object EQ extends CmpOp
  private case object GT extends CmpOp
  private case object GE extends CmpOp
  private case object LT extends CmpOp
  private case object LE extends CmpOp

  /** Above this many IN values, the eq-or-chain degrades to a min/max
    * range predicate (see the `In` case). */
  private[sources] val InChainThreshold = 64

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
      // would wrongly skip groups containing that value.
      // Above the threshold an eq-or-chain is a liability, not an
      // optimization: parquet's predicate visitors recurse per Or node
      // (a 100k-value runtime-join IN-list would build a 100k-deep tree —
      // StackOverflowError territory — and cost O(n) per row group), so
      // large lists degrade to the [min, max] RANGE, still a necessary
      // condition (same shape Spark's ParquetFilters uses past its
      // inFilterThreshold). The exact membership check stays at the
      // manifest level (PrunePredicate set conjunction) and in the
      // residual row filter.
      if (vs.length <= InChainThreshold) {
        val parts = vs.toSeq.map(v => leaf(s, a, v, EQ))
        if (parts.forall(_.isDefined)) parts.flatten.reduceOption(FilterApi.or)
        else None
      } else inRange(s, a, vs)
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

  private def micros(v: Any): Option[java.lang.Long] =
    PrunePredicate.micros(v).map(java.lang.Long.valueOf)

  /** `[min, max]` range for an oversized IN — a necessary condition over
    * the same footer stats the eq-chain would consult, at O(1) predicate
    * size. All-or-nothing per the Or safety rule: one unconvertible value
    * kills the whole predicate, because that value could sort outside the
    * min/max of the convertible subset and the range would wrongly skip
    * its row groups. */
  private def inRange(s: StructType, name: String, vs: Array[Any]): Option[FilterPredicate] = {
    def numeric[T](conv: Any => Option[T])(implicit ord: Ordering[T])
        : Option[(T, T)] = {
      val converted = vs.toSeq.map(conv)
      if (converted.exists(_.isEmpty)) None
      else {
        val xs = converted.flatten
        Some((xs.min, xs.max))
      }
    }
    s.fields.find(_.name == name).map(_.dataType).flatMap {
      case LongType => numeric {
        case l: java.lang.Long => Some(l.longValue())
        case i: java.lang.Integer => Some(i.longValue())
        case _ => None
      }.map { case (mn, mx) =>
        FilterApi.and(cmpLong(name, mn, GE), cmpLong(name, mx, LE))
      }
      case IntegerType => numeric {
        case i: java.lang.Integer => Some(i.intValue())
        case _ => None
      }.map { case (mn, mx) =>
        FilterApi.and(cmpInt(name, mn, GE), cmpInt(name, mx, LE))
      }
      case TimestampType => numeric(v => micros(v).map(_.longValue()))
        .map { case (mn, mx) =>
          FilterApi.and(cmpLong(name, mn, GE), cmpLong(name, mx, LE))
        }
      case DoubleType => numeric {
        case d: java.lang.Double => Some(d.doubleValue())
        case _ => None
      }.map { case (mn, mx) =>
        FilterApi.and(cmpDouble(name, mn, GE), cmpDouble(name, mx, LE))
      }
      case StringType =>
        // parquet orders UTF8 binary stats unsigned-lexicographically on
        // bytes — NOT Java String order (UTF-16 code units diverge above
        // the BMP) — so min/max must be picked under the bytes comparator
        val bins = vs.toSeq.map {
          case str: String => Some(Binary.fromString(str))
          case _ => None
        }
        if (bins.exists(_.isEmpty)) None
        else {
          implicit val byteOrd: Ordering[Binary] = new Ordering[Binary] {
            def compare(a: Binary, b: Binary): Int =
              java.util.Arrays.compareUnsigned(a.getBytes, b.getBytes)
          }
          val xs = bins.flatten
          Some(FilterApi.and(
            cmpBinary(name, xs.min, GE), cmpBinary(name, xs.max, LE)))
        }
      case _ => None
    }
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
