package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic bucket assignment for bucketed connector tables: rows
  * route to `hash(first key column) mod N` at write time, the file's
  * bucket id lands in the sidecar, and the scan reports the matching
  * `bucket(N, key)` KeyGroupedPartitioning — so two graft tables bucketed
  * the same way join with NO shuffle (Spark storage-partitioned join, the
  * same contract Iceberg's bucket transform implements).
  *
  * The hash is over the key's canonical rendered text ([[LineCodec]]
  * render), which makes the write-side (external values) and the V2
  * function (catalyst values) provably consistent — both normalize to the
  * same string before hashing.
  *
  * Reference analogue: per-table Partition/PartitionCt driving planner
  * fan-out (dataux planner/sql_master.go:78-97); Spark-side the partition
  * count is a physical property the optimizer exploits instead of a
  * manual fan-out.
  */
object GraftBucket {

  /** Key types bucketing supports (hash must be stable across engines). */
  def supported(dt: DataType): Boolean = dt match {
    case LongType | IntegerType | StringType => true
    case _ => false
  }

  /** External (scala) value → bucket id in [0, n). Nulls go to bucket 0. */
  def of(v: Any, n: Int): Int =
    if (v == null) 0
    else math.floorMod(
      scala.util.hashing.MurmurHash3.stringHash(LineCodec.render(v)), n)

  /** Catalyst value → bucket id (same normalization as [[of]]). */
  def ofCatalyst(v: Any, n: Int): Int = v match {
    case u: UTF8String => of(u.toString, n)
    case other => of(other, n)
  }
}

/** V2 `bucket` function exposed by the graft catalog so Catalyst can
  * resolve the scan-reported `bucket(N, key)` transform and prove two
  * scans co-partitioned (V2ScanPartitioning resolves transforms through
  * the table catalog's FunctionCatalog). */
class GraftBucketUnbound extends UnboundFunction {
  override def name(): String = "bucket"
  override def description(): String =
    "bucket(n, key): graft bucket id of a key value (n buckets)"
  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 2,
      s"bucket expects (numBuckets, key), got ${inputType.catalogString}")
    val kt = inputType.fields(1).dataType
    require(GraftBucket.supported(kt), s"bucket key type unsupported: $kt")
    new GraftBucketBound(kt)
  }
}

class GraftBucketBound(keyType: DataType) extends ScalarFunction[Integer] {
  override def inputTypes(): Array[DataType] = Array(IntegerType, keyType)
  override def resultType(): DataType = IntegerType
  override def name(): String = "bucket"
  // SPJ compatibility compares transforms by canonical name: one name per
  // algorithm, shared by every key type (the hash normalizes through text)
  override def canonicalName(): String = "graft.bucket"
  override def isResultNullable: Boolean = false
  override def isDeterministic: Boolean = true
  override def produceResult(input: InternalRow): Integer = {
    val n = input.getInt(0)
    val v = if (input.isNullAt(1)) null else keyType match {
      case LongType => java.lang.Long.valueOf(input.getLong(1))
      case IntegerType => java.lang.Integer.valueOf(input.getInt(1))
      case StringType => input.getUTF8String(1)
      case other => throw new IllegalStateException(s"unsupported key type $other")
    }
    GraftBucket.ofCatalyst(v, n)
  }
}
