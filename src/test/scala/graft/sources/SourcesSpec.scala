package graft.sources

import java.nio.file.Files
import java.time.LocalDateTime

import org.apache.spark.sql.functions._

import graft.SparkSpec

class EventGeneratorSpec extends SparkSpec {
  import spark.implicits._

  test("generator is deterministic and respects the producer's domains") {
    val a = EventGenerator.events(spark, 200).collect()
    val b = EventGenerator.events(spark, 200).collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)

    val df = EventGenerator.events(spark, 200)
    assert(df.select("event_type").distinct().collect().map(_.getString(0)).toSet
      .subsetOf(EventGenerator.EventTypes.toSet))
    assert(df.filter(!$"user_id".rlike("^user_([1-9][0-9]{0,2}|1000)$")).count() == 0)
    assert(df.filter($"data.price".isNull || $"data.product_id".isNull).count() == 0)
    // uuid4 shape: 8-4-4-4-12 hex
    assert(df.filter(!$"event_id".rlike("^[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}$")).count() == 0)
  }

  test("different seeds give different streams") {
    val a = EventGenerator.events(spark, 50, seed = 1).select("event_id").collect().map(_.getString(0))
    val b = EventGenerator.events(spark, 50, seed = 2).select("event_id").collect().map(_.getString(0))
    assert(a.toSet.intersect(b.toSet).isEmpty)
  }

  test("jsonLines -> decode roundtrips the envelope with microsecond timestamps") {
    val src = EventGenerator.events(spark, 100)
    val back = JsonIngest.decode(EventGenerator.jsonLines(src))
    // same names/types (nullability legitimately differs after a parse,
    // incl. inside nested structs — compare the type shape only)
    assert(back.schema.fields.map(f => (f.name, f.dataType.simpleString)).toSeq ==
      src.schema.fields.map(f => (f.name, f.dataType.simpleString)).toSeq)
    val diff = src.exceptAll(back).count() + back.exceptAll(src).count()
    assert(diff == 0L)
  }
}

class JsonIngestSpec extends SparkSpec {
  import spark.implicits._

  test("PERMISSIVE read quarantines malformed lines in raw_data (ON_ERROR=CONTINUE)") {
    val dir = Files.createTempDirectory("graft_json").toString
    val good = EventGenerator.jsonLines(EventGenerator.events(spark, 10))
      .as[String].collect()
    val lines = good.take(5) ++ Seq("{not valid json", "") ++ good.drop(5)
    Files.write(java.nio.file.Paths.get(s"$dir/part-000.json"),
      lines.mkString("\n").getBytes)

    val staged = JsonIngest.readJson(spark, dir, globGz = false)
    assert(staged.filter($"event_id".isNotNull).count() == 10L)
    assert(JsonIngest.corruptCount(staged) == 1L) // blank lines are skipped, not corrupt
    // Spark disallows queries whose pruned scan touches ONLY the corrupt
    // column — keep another column in the projection
    val corrupt = staged.filter($"raw_data".isNotNull)
      .select("raw_data", "event_id").head().getString(0)
    assert(corrupt == "{not valid json")
  }

  test("open envelope: undeclared keys survive in raw_payload and stay queryable") {
    val dir = Files.createTempDirectory("graft_open_env").toString
    // a VALID record carrying keys the staging schema never declared
    val line = """{"event_id":"e-1","event_timestamp":"2026-01-01T00:00:00.000000",""" +
      """"event_type":"view","user_id":"user_1","session_id":"sess-42","ab_test":"variant-b"}"""
    Files.write(java.nio.file.Paths.get(s"$dir/part-000.json"), line.getBytes)

    val staged = JsonIngest.readJson(spark, dir, globGz = false)
    val row = staged.select($"event_id", $"raw_data",
      get_json_object($"raw_payload", "$.session_id").as("session_id"),
      get_json_object($"raw_payload", "$.ab_test").as("ab_test")).head()
    assert(row.getAs[String]("event_id") == "e-1") // parsed normally
    assert(row.getAs[String]("raw_data") == null)  // NOT corrupt
    assert(row.getAs[String]("session_id") == "sess-42")
    assert(row.getAs[String]("ab_test") == "variant-b")
  }

  test("partitionAvailable sees .gz files only") {
    val dir = Files.createTempDirectory("graft_avail").toString
    assert(!JsonIngest.partitionAvailable(spark, dir))
    Files.write(java.nio.file.Paths.get(s"$dir/x.json"), "{}".getBytes)
    assert(!JsonIngest.partitionAvailable(spark, dir))
    Files.write(java.nio.file.Paths.get(s"$dir/x.json.gz"), Array[Byte](0x1f, 0x8b.toByte))
    assert(JsonIngest.partitionAvailable(spark, dir, ".gz"))
  }
}

class PartitionedJsonSinkSpec extends SparkSpec {
  import spark.implicits._

  test("writes the Firehose hour layout and reads back partition-scoped") {
    val root = Files.createTempDirectory("graft_land").toString
    // 2 hours of events: 3600 s apart starting on an hour boundary
    val ev = EventGenerator.events(spark, 120, startEpochSeconds = 1735689600L) // 00:00..00:01:59... spans 1 hour? 120 rows = 2 min
    val twoHours = ev.unionAll(
      EventGenerator.events(spark, 60, seed = 7, startEpochSeconds = 1735689600L + 3600))
    PartitionedJsonSink.write(twoHours, root)

    val h0 = PartitionedJsonSink.hourPath(root, LocalDateTime.of(2025, 1, 1, 0, 0))
    val h1 = PartitionedJsonSink.hourPath(root, LocalDateTime.of(2025, 1, 1, 1, 0))
    assert(JsonIngest.partitionAvailable(spark, h0))
    assert(JsonIngest.partitionAvailable(spark, h1))
    assert(JsonIngest.readJson(spark, h0).count() == 120L)
    assert(JsonIngest.readJson(spark, h1).count() == 60L)
  }

  test("partition values are zero-padded to match the reference template") {
    val p = PartitionedJsonSink.hourPath("/r", LocalDateTime.of(2026, 3, 5, 7, 0))
    assert(p == "/r/year=2026/month=03/day=05/hour=07")
  }
}
