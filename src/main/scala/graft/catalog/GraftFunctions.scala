package graft.catalog

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType, StructType}
import org.apache.spark.unsafe.hash.Murmur3_x86_32
import org.apache.spark.unsafe.types.UTF8String

/** The catalog's `bucket` V2 function — the missing piece that turns the
  * table's physical conv_id hash-bucket layout into partitioning Spark can
  * REASON about. The scan reports
  * `KeyGroupedPartitioning(bucket(N, conv_id))`; resolving that transform
  * requires the table's catalog to serve a function named `bucket`
  * (Spark's `V2ExpressionUtils` looks it up by name), and Spark then knows
  * every row of one conv_id lives in exactly one input partition:
  *  - `groupBy("conv_id")` / window-by-conv aggregations run with NO
  *    Exchange (the map-side is already clustered);
  *  - equi-joins of two graft tables on conv_id run storage-partitioned
  *    (no shuffle on either side) — at 10^12 turns the shuffle IS the job,
  *    so this is the single biggest scan-side win the connector can offer.
  *
  * The hash MUST be bit-identical to what the writer's
  * `repartition(n, col("conv_id"))` produced ([[graft.table.IcebergLite
  * .stageAndPublish]]): Spark's `HashPartitioning` = Murmur3 seed 42 over
  * the UTF-8 bytes, pmod into n. [[graft.table.IcebergLite.bucketOf]]
  * computes the same thing by evaluating the catalyst expression;
  * `GraftFunctionsSpec` pins the parity property.
  */
object GraftFunctions {

  /** pmod(murmur3_42(utf8 bytes), n) — the exact `HashPartitioning` route.
    * A null conv_id leaves the seed untouched (Murmur3Hash semantics), so
    * nulls land in bucket pmod(42, n), same as the writer. */
  def bucket(numBuckets: Int, conv: UTF8String): Int = {
    val h =
      if (conv == null) 42
      else Murmur3_x86_32.hashUnsafeBytes(
        conv.getBaseObject, conv.getBaseOffset, conv.numBytes(), 42)
    ((h % numBuckets) + numBuckets) % numBuckets
  }

  object BucketUnbound extends UnboundFunction {
    override def name(): String = "bucket"
    override def description(): String =
      "bucket(numBuckets int, conv_id string) -> int: the conv_id hash " +
        "bucket (Murmur3 seed 42, pmod) IcebergLite routes rows by"

    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.length == 2 &&
          inputType(0).dataType == IntegerType &&
          inputType(1).dataType == StringType,
        s"graft bucket expects (int numBuckets, string conv_id); got " +
          inputType.map(_.dataType.simpleString).mkString("(", ", ", ")"))
      BucketBound
    }
  }

  object BucketBound extends ScalarFunction[Integer] {
    override def inputTypes(): Array[DataType] = Array(IntegerType, StringType)
    override def resultType(): DataType = IntegerType
    override def name(): String = "bucket"
    // canonical identity for storage-partitioned-join compatibility checks:
    // two scans report the same function iff this string matches
    override def canonicalName(): String = "graft.bucket(int,string)"
    override def isResultNullable: Boolean = false

    /** Magic-method fast path: Spark codegens a direct `invoke` call
      * instead of boxing through [[produceResult]]. */
    def invoke(numBuckets: Int, conv: UTF8String): Int = bucket(numBuckets, conv)

    override def produceResult(input: InternalRow): Integer =
      bucket(input.getInt(0),
        if (input.isNullAt(1)) null else input.getUTF8String(1))
  }
}
