package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton space-filling-curve) data layout — the multi-column
  * clustering trick behind Delta `OPTIMIZE ZORDER BY` and Iceberg's
  * sort-order z-order: interleave the bits of several columns into one
  * scalar, then range-cluster the data on that scalar. Rows close in the
  * z-value are close in EVERY interleaved dimension, so each output file's
  * per-column min/max footer stats become tight rectangles and a selective
  * predicate on ANY of the columns prunes most files — where a plain sort
  * clusters only its leading column and leaves the others spread across
  * every file (classic reference: Morton 1966; Orenstein & Merrett 1984).
  *
  * Everything here composes codegen'd built-ins (shifts, masks, ORs) — no
  * UDF, no custom expression — so the z-value computation rides inside
  * WholeStageCodegen and pushes through any plan. The bit-by-bit
  * construction is `bits` terms per column; at the practical 8-21 bits per
  * column that is a few dozen integer ops per row, unrolled by codegen.
  *
  * At 100 TB the win is at READ time: z-cluster once at write
  * (`cluster` = one range shuffle, same cost as the sort the pipeline
  * already does), then every box/point query over the interleaved columns
  * reads a tiny fraction of files via ordinary parquet min/max pruning —
  * no index structure to maintain.
  */
object ZOrder {

  /** Maximum total interleaved width: results stay in a positive Long. */
  private val MaxTotalBits = 62

  /** Interleave the low `bits` bits of each column (Long-typed, must be
    * non-negative after masking) into one Long: bit `i` of column `j`
    * lands at position `i * n + j`, so column 0 owns the least-significant
    * interleaved slot. Pure built-in bitwise ops — codegen'd end-to-end. */
  def interleave(cols: Seq[Column], bits: Int): Column = {
    require(cols.nonEmpty, "interleave: at least one column")
    require(bits >= 1 && cols.size * bits <= MaxTotalBits,
      s"interleave: need 1 <= bits and cols*bits <= $MaxTotalBits")
    val n = cols.size
    val terms = for {
      (c, j) <- cols.zipWithIndex
      i <- 0 until bits
    } yield shiftleft(shiftright(c.cast("long"), i).bitwiseAND(lit(1L)), i * n + j)
    terms.reduce(_.bitwiseOR(_))
  }

  /** Scale a value with known inclusive bounds onto the `bits`-wide integer
    * grid: floor((x − min) · (2^bits − 1) / (max − min)). The Long product
    * is exact (overflow-guarded); the division is IEEE double division +
    * floor, which every engine evaluates bit-identically — the oracle
    * reproduces the same expression in SQL. Values are clamped into
    * [min, max] first so stray outliers cannot corrupt the interleave. */
  def boundedRank(c: Column, min: Long, max: Long, bits: Int): Column = {
    require(max > min, "boundedRank: max > min")
    require(bits >= 1 && bits <= 31, "boundedRank: bits in [1,31]")
    val scale = (1L << bits) - 1
    // BigInt on EACH side before subtracting (r17 review: BigInt(max -
    // min) let the Long subtraction itself wrap for ranges wider than
    // Long.MaxValue, so the guard passed spuriously and the wrapped span
    // was baked into the division — silent rank degeneration, or an ANSI
    // ArithmeticException, the exact failures the guard exists to stop)
    require((BigInt(max) - BigInt(min)) * scale < BigInt(Long.MaxValue),
      "boundedRank: range * 2^bits overflows Long")
    val clamped = greatest(least(c.cast("long"), lit(max)), lit(min))
    floor((clamped - lit(min)) * lit(scale) / lit(max - min)).cast("long")
  }

  /** z-value for columns with explicit (min, max) bounds: each column is
    * [[boundedRank]]-scaled to `bits` bits, then interleaved. */
  def zValue(cols: Seq[(Column, Long, Long)], bits: Int): Column =
    interleave(cols.map { case (c, lo, hi) => boundedRank(c, lo, hi, bits) }, bits)

  /** Re-layout a DataFrame clustered by a z-value: one range shuffle on
    * the z scalar plus an in-partition sort, so each output partition (=
    * output file on write) covers a contiguous z-interval — a compact
    * hyper-rectangle in every interleaved dimension. Write the result
    * with an ordinary `.write.parquet(...)`; file/row-group min-max
    * stats do the pruning from then on. */
  def cluster(df: DataFrame, z: Column, numPartitions: Int): DataFrame = {
    require(numPartitions >= 1, "cluster: numPartitions >= 1")
    df.repartitionByRange(numPartitions, z).sortWithinPartitions(z)
  }

  /** [[cluster]] on bounded columns in one call. */
  def clusterBy(df: DataFrame, cols: Seq[(String, Long, Long)], bits: Int,
      numPartitions: Int): DataFrame =
    cluster(df, zValue(cols.map { case (n, lo, hi) =>
      (col("`" + n.replace("`", "``") + "`"), lo, hi) }, bits), numPartitions)
}
