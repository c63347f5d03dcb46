package graft.plans

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Small-file compaction for curated parquet tiers — the maintenance
  * operator every streaming ingest needs at scale: micro-batches land
  * many small files (one per trigger × partition), and at 100 TB the
  * file-listing + footer overhead of millions of kilobyte files
  * dominates scan cost long before the bytes do.
  *
  * Compaction reads the fragmented directory once, rewrites it into
  * `ceil(bytes / targetBytes)` files, and publishes through
  * [[Catalog.ctasOverwrite]]'s versioned view-flip — concurrent
  * readers keep the old fragmented version until the atomic flip, and
  * the version GC reclaims it afterwards. Idempotent: re-running on a
  * compacted tier is a cheap no-op rewrite of the same file count.
  */
object Compaction {

  /** before/after accounting the caller can alert on. */
  final case class Report(beforeFiles: Int, beforeBytes: Long, afterFiles: Int)

  /** Total size and count of data files under `dir` (recursive,
    * excluding _SUCCESS/_metadata markers and hidden files). */
  def measure(spark: SparkSession, dir: String): (Int, Long) = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(p, true)
    var files = 0
    var bytes = 0L
    while (it.hasNext) {
      val s = it.next()
      val n = s.getPath.getName
      if (!n.startsWith("_") && !n.startsWith(".")) { files += 1; bytes += s.getLen }
    }
    (files, bytes)
  }

  /** Compact the parquet data under `dir` into ~`targetBytes` files and
    * publish as table `name` (versioned view-flip). The repartition is
    * round-robin — compaction balances file SIZES; ordering guarantees
    * belong to the layout operator ([[graft.operators.Layout]]), which
    * composes: `compactClustered` below keeps a z-order/sort layout
    * through the rewrite. */
  def compact(spark: SparkSession, dir: String, name: String,
              targetBytes: Long = 128L << 20): Report = {
    val (files, bytes) = measure(spark, dir)
    val n = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    Catalog.ctasOverwrite(spark.read.parquet(dir).repartition(n), name)
    Report(files, bytes, n)
  }

  /** Compaction that preserves (or installs) a clustered layout: the
    * rewrite range-partitions and sorts on `sortCols` instead of
    * round-robin, so row-group min/max pruning on those columns
    * survives the file-count change. */
  def compactClustered(spark: SparkSession, dir: String, name: String,
                       sortCols: Seq[String], targetBytes: Long = 128L << 20): Report = {
    import org.apache.spark.sql.functions.col
    val (files, bytes) = measure(spark, dir)
    val n = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    val cols = sortCols.map(col)
    Catalog.ctasOverwrite(
      spark.read.parquet(dir).repartitionByRange(n, cols: _*).sortWithinPartitions(cols: _*),
      name)
    Report(files, bytes, n)
  }
}
