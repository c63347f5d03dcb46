package graft.streaming

import java.nio.file.Files

import scala.collection.mutable

import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.functions.{count => cnt, lit, max => mx, sum => sm, when => whn}

import graft.SparkSpec
import graft.sources.{EventGenerator, PartitionedJsonSink}

class StatefulSpec extends SparkSpec {
  import spark.implicits._

  test("flatMapGroupsWithState keeps running per-user counts across micro-batches") {
    val root = Files.createTempDirectory("graft_state").toString
    val cp = Files.createTempDirectory("graft_statecp").toString
    val batch1 = EventGenerator.events(spark, 120, seed = 21, startEpochSeconds = 1735689600L)
    PartitionedJsonSink.write(batch1, root)

    // (memory sink can't recover from a checkpoint; foreachBatch can)
    val emissions = mutable.ArrayBuffer.empty[UserCounts]
    def drain(): Unit = {
      // expireIdle=false: with pending processing-time timers the
      // AvailableNow drain never self-terminates (the old
      // awaitTermination(120000) here silently sipped the FULL 2
      // minutes per drain)
      val q = StreamIngest.runningUserCounts(StreamIngest.stream(spark, root), expireIdle = false)
        .writeStream.outputMode("append")
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", cp)
        .foreachBatch { (df: org.apache.spark.sql.Dataset[UserCounts], _: Long) =>
          emissions.synchronized { emissions ++= df.collect() }
          ()
        }
        .start()
      assert(q.awaitTermination(120000), "runningUserCounts drain timed out")
    }
    drain()

    // latest emission per user == that user's batch totals
    val got = emissions.groupBy(_.user_id)
      .map { case (u, es) => u -> (es.map(_.eventCount).max, es.map(_.purchaseCount).max) }
    val expected = batch1.groupBy("user_id")
      .agg(cnt(lit(1)).as("n"), sm(whn($"event_type" === "purchase", 1L).otherwise(0L)).as("p"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == expected)

    // second batch: state carries over — counts accumulate, not reset
    PartitionedJsonSink.write(
      EventGenerator.events(spark, 80, seed = 22, startEpochSeconds = 1735689600L + 3600), root)
    drain()
    val total = emissions.groupBy(_.user_id).map(_._2.map(_.eventCount).max).sum
    assert(total == 200L, s"state did not accumulate: $total")
  }
}
