package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering: interleave the bits of two sort keys so
  * that range-bucketing the single z value yields buckets that are TIGHT
  * in BOTH dimensions — the multi-dimensional data-skipping layout
  * (Delta/Iceberg `OPTIMIZE ZORDER BY`, the thing a single-key sort
  * cannot give you: sorting by x alone leaves every bucket spanning the
  * full y range, so predicates on y skip nothing).
  *
  * At 100 TB the workflow is: compute z, `repartitionByRange` on it,
  * write with per-file min/max stats; a scan with predicates on either
  * key then prunes ~√buckets instead of reading everything. Here the
  * bucket-stats frame IS that min/max skipping index, computed
  * relationally so the oracle can verify the interleave bit-for-bit
  * (shift/and/or arithmetic is engine-neutral on int64).
  *
  * The interleave is a fixed chain of `bits` shift-mask-or terms per
  * dimension — pure codegen'd column arithmetic, no UDF, no shuffle
  * until the stats aggregate.
  */
object ZOrder {

  /** Morton code of the low `bits` bits of x and y: bit i of x lands at
    * position 2i, bit i of y at 2i+1. Inputs must be non-negative. */
  def zValue(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits out of range: $bits")
    (0 until bits).map { i =>
      val xb = shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i)
      val yb = shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1)
      xb.bitwiseOR(yb)
    }.reduce(_.bitwiseOR(_))
  }

  /** The skipping index of a z-range-bucketed layout: per-bucket row
    * count and min/max of BOTH keys. `buckets` must be a power of two ≤
    * 4^bits; bucket = z >> (2·bits − log2(buckets)), i.e. contiguous
    * z-ranges = aligned 2-D tiles. */
  def bucketStats(df: DataFrame, x: String, y: String,
                  bits: Int, buckets: Int): DataFrame = {
    require(buckets >= 1 && (buckets & (buckets - 1)) == 0,
      s"buckets not a power of two: $buckets")
    val log2b = 31 - Integer.numberOfLeadingZeros(buckets)
    require(log2b <= 2 * bits, s"more buckets ($buckets) than z values")
    val z = zValue(col(x).cast("long"), col(y).cast("long"), bits)
    df.withColumn("bucket", shiftright(z, 2 * bits - log2b))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"),
        min(col(x)).as(s"min_$x"), max(col(x)).as(s"max_$x"),
        min(col(y)).as(s"min_$y"), max(col(y)).as(s"max_$y"))
  }
}
