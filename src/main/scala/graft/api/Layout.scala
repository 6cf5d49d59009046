package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-LAYOUT keys — the write-side clustering a 100 TB table needs so
  * the read side can prune.
  *
  * Z-order (Morton 1966; the technique behind Delta/Hudi `OPTIMIZE
  * ZORDER BY`, public): interleave the bits of two dimensions into one
  * key, so range-partitioning (and in-file sorting) on that ONE key
  * keeps rows that are close in EITHER dimension physically together —
  * parquet row-group min/max stats then prune scans filtered on either
  * column, not just the leading sort key. Pure exact long bit
  * arithmetic (the classic magic-number spread), codegen'd end to end
  * and reproducible in any engine — the declared key's DuckDB oracle
  * recomputes every z-value bit-for-bit. */
object Layout {

  /** Spread the low 16 bits of `x` to the even bit positions of a
    * 32-bit value (classic Morton magic numbers, long arithmetic). */
  private def spread16(x: Column): Column = {
    val m = x.bitwiseAND(lit(0xFFFFL))
    val a = m.bitwiseOR(shiftleft(m, 8)).bitwiseAND(lit(0x00FF00FFL))
    val b = a.bitwiseOR(shiftleft(a, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val c = b.bitwiseOR(shiftleft(b, 2)).bitwiseAND(lit(0x33333333L))
    c.bitwiseOR(shiftleft(c, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Morton / Z-order key of two dimensions' low 16 bits (`a` on
    * even bit positions, `b` on odd). Callers quantize wider domains to
    * 16 bits first (`% 65536`, or a range-scaled bucket). */
  def zorder16(a: Column, b: Column): Column =
    spread16(a).bitwiseOR(shiftleft(spread16(b), 1))

  /** Cluster `df` for write: z-key the two dimensions, range-partition
    * on the key into `parts` files-worth of tasks and sort within each —
    * exactly the shape `write.parquet` preserves, so row-group stats on
    * BOTH dimensions stay narrow. Returns the frame with `z` appended,
    * clustered. */
  def clusterZOrder(df: DataFrame, dimA: Column, dimB: Column,
      parts: Int = 64): DataFrame = {
    val keyed = df.withColumn("z", zorder16(dimA, dimB))
    keyed.repartitionByRange(parts, col("z")).sortWithinPartitions("z")
  }
}
