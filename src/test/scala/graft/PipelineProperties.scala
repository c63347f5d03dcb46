package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.operators.EventOps
import graft.sources.{EventGenerator, JsonIngest}

/** Generator-driven properties over the reference semantics
  * (SURVEY §5 "property-based"): each property runs the real operators
  * on seeded synthetic batches of varying shape.
  */
class PipelineProperties extends Properties("pipeline") {

  // Spark jobs per case — keep the case count modest.
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = SparkSpec.session

  private val genBatch = for {
    n <- Gen.choose(1L, 300L)
    seed <- Gen.choose(0L, 10000L)
  } yield EventGenerator.events(spark, n, seed)

  property("summary event_counts partition the raw batch") = Prop.forAll(genBatch) { batch =>
    val n = batch.count()
    val summary = EventOps.dailySummary(batch.withColumnRenamed("event_timestamp", "ts"))
    summary.agg(sum("event_count")).head().getLong(0) == n
  }

  property("summary min/max bound every group's events") = Prop.forAll(genBatch) { batch =>
    EventOps.dailySummary(batch.withColumnRenamed("event_timestamp", "ts"))
      .filter(col("first_event") > col("last_event") ||
        to_date(col("first_event")) =!= col("event_date"))
      .count() == 0L
  }

  property("dedup insert is idempotent: load∘load = load") = Prop.forAll(genBatch) { batch =>
    val staging = batch.select(col("event_id"), col("user_id"))
    val target = staging.limit(0)
    val loaded = EventOps.dedupInsert(staging, target)
    val after = target.unionByName(loaded)
    EventOps.dedupInsert(staging, after).count() == 0L
  }

  property("wire roundtrip is the identity on the envelope") = Prop.forAll(genBatch) { batch =>
    val back = JsonIngest.decode(EventGenerator.jsonLines(batch))
    batch.exceptAll(back).count() == 0L && back.exceptAll(batch).count() == 0L
  }

  property("purchase view is a subset with only purchases") = Prop.forAll(genBatch) { batch =>
    val renamed = batch.select(
      monotonically_increasing_id().as("event_id_n"), col("event_id"),
      col("event_timestamp").as("ts"), col("user_id"), col("event_type"),
      lit(1.0).as("value"), lit("""{"k":1}""").as("props"))
      .drop("event_id_n")
    val view = EventOps.userEvents(renamed)
    view.filter(col("event_type") =!= "purchase").count() == 0L &&
      view.count() == renamed.filter(col("event_type") === "purchase").count()
  }
}
