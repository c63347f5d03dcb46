package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data-layout clustering (Z-order / Morton curve):
  * interleave the low bits of several integer dimensions into one sort
  * key so that rows close in EVERY dimension land close in the file
  * order. Written out with this clustering, parquet row-group min/max
  * statistics prune selective predicates on ANY of the interleaved
  * dimensions — the single-column-sort layout only prunes its own
  * leading column.
  *
  * This is the layout story for the 100 TB tier: a fact table
  * Z-ordered on (customer, date) answers both per-customer and
  * per-date scans from a fraction of its row groups. The z-value is a
  * pure per-row bit expression (codegen'd, no shuffle); the clustered
  * WRITE costs one range repartition — the same exchange any sorted
  * write pays.
  */
object Layout {

  /** Morton z-value of `dims` (each already mapped to a non-negative
    * int domain by the caller): bit `i` of dimension `j` lands at
    * interleaved position `i * dims.length + j`. `bits` low bits per
    * dimension are used; values ≥ 2^bits saturate (clamped) so outliers
    * degrade locality instead of corrupting the curve. */
  def zValue(dims: Seq[Column], bits: Int = 16): Column = {
    require(dims.nonEmpty && bits * dims.length <= 63,
      s"${dims.length} dims x $bits bits must fit a signed long")
    val cap = (1L << bits) - 1
    val clamped = dims.map(d => least(greatest(d.cast("long"), lit(0L)), lit(cap)))
    val terms = for {
      (d, j) <- clamped.zipWithIndex
      i <- 0 until bits
    } yield shiftleft(shiftright(d, i).bitwiseAND(lit(1L)), i * dims.length + j)
    terms.reduce(_ + _)
  }

  /** Repartition-by-range + sort on the z-value: the write-side
    * clustering operator. Partition count controls output file count;
    * range boundaries come from Spark's reservoir sampling of the
    * z-values, so file sizes stay balanced even on skewed dimension
    * distributions. */
  def clusterByZ(df: DataFrame, dims: Seq[Column], bits: Int = 16,
                 partitions: Int = 0): DataFrame = {
    val keyed = df.withColumn("__z", zValue(dims, bits))
    val ranged =
      if (partitions > 0) keyed.repartitionByRange(partitions, col("__z"))
      else keyed.repartitionByRange(col("__z"))
    ranged.sortWithinPartitions(col("__z")).drop("__z")
  }

  /** The DuckDB-portable SQL rendition of [[zValue]] over column
    * expressions `dims` — the oracle twin (a sum of disjoint shifted
    * bits; `+` and `|` are equivalent here). Kept next to the Scala so
    * the two renditions evolve together. */
  def zValueSql(dims: Seq[String], bits: Int = 16): String = {
    val cap = (1L << bits) - 1
    val terms = for {
      (d, j) <- dims.zipWithIndex
      clamped = s"least(greatest(CAST($d AS BIGINT), 0), $cap)"
      i <- 0 until bits
    } yield s"((($clamped >> $i) & 1) << ${i * dims.length + j})"
    terms.mkString("(", " + ", ")")
  }
}
