package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.JsonIngest
import graft.streaming.StreamIngest

/** Scratch phase profiler (not part of the library surface). */
object ProfileScratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label%-34s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val ev = Tables.load(spark, sfDir, "events")
      .select(col("event_id"), col("ts"), col("event_type"), col("user_id"))
    ev.count()

    for ((parts, rep) <- Seq((32, 1), (32, 2), (8, 1), (8, 2), (4, 1))) {
      println(s"== stream ssj, shufflePartitions=$parts rep $rep ==")
      val tmp = Files.createTempDirectory("prof_ssj").toString
      val cp = Files.createTempDirectory("prof_ssj_cp").toString
      val subset = ev.filter(col("event_id") % 2 === 0)
        .select(col("event_id").cast("string").as("event_id"), col("ts").as("event_timestamp"),
          col("event_type"), col("user_id").cast("string").as("user_id"))
      timed("landing write")(subset.coalesce(2).write
        .mode("overwrite")
        .option("compression", "gzip")
        .option("timestampNTZFormat", JsonIngest.TsFormat)
        .json(tmp))
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      try {
        val src = StreamIngest.stream(spark, tmp)
        val views = src.filter(col("event_type") === "view")
        val purchases = src.filter(col("event_type") === "purchase")
        val q = StreamIngest.intervalJoin(views, purchases, keyCol = "user_id",
            within = "6 HOUR", leftPrefix = "v_", rightPrefix = "p_")
          .select(col("v_event_id").cast("long").as("view_id"),
            col("p_event_id").cast("long").as("purchase_id"),
            col("v_user_id").cast("long").as("user_id"))
          .writeStream.format("memory").queryName(s"prof_ssj_${parts}_$rep")
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .option("checkpointLocation", cp)
          .start()
        timed("drain")(require(q.awaitTermination(300000)))
        println(s"[profile] batches=${q.recentProgress.length} rows=${spark.table(s"prof_ssj_${parts}_$rep").count()}")
        q.recentProgress.foreach(p =>
          println(f"[profile]   batch=${p.batchId} durationMs=${p.durationMs}"))
      } finally spark.conf.set("spark.sql.shuffle.partitions", 32)
    }
    spark.stop()
  }
}
