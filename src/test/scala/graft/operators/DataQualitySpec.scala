package graft.operators

import graft.SparkSpec

class DataQualitySpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(
    (Some(1L), Some("purchase"), Some(7L)),
    (Some(1L), Some("view"), Some(8L)),      // dup key 1
    (Some(2L), None, Some(9L)),              // incomplete: null type
    (Some(3L), Some("click"), None),         // incomplete: null user
    (None, Some("view"), Some(5L))           // incomplete: null id
  ).toDF("event_id", "event_type", "user_id")

  test("duplicateKeys finds keys with count > 1") {
    val dups = DataQuality.duplicateKeys(df).collect()
    assert(dups.length == 1)
    assert(dups.head.getAs[Long]("event_id") == 1L)
    assert(dups.head.getAs[Long]("dup_count") == 2L)
    assert(DataQuality.duplicateCount(df) == 1L)
  }

  test("incompleteRows flags any-null rows over the required set") {
    assert(DataQuality.incompleteCount(df, Seq("event_id", "event_type", "user_id")) == 3L)
    assert(DataQuality.incompleteCount(df, Seq("event_id")) == 1L)
  }

  test("gate throws on violation with both counts in the message") {
    val e = intercept[IllegalArgumentException] {
      DataQuality.gate(df, "event_id", Seq("event_id", "event_type", "user_id"))
    }
    assert(e.getMessage.contains("duplicates=1"))
    assert(e.getMessage.contains("incomplete=3"))
  }

  test("gate passes on clean data and returns the report") {
    val clean = Seq((1L, "view", 7L), (2L, "click", 8L)).toDF("event_id", "event_type", "user_id")
    val r = DataQuality.gate(clean, "event_id", Seq("event_id", "event_type", "user_id"))
    assert(r.ok && r.duplicateCount == 0L && r.incompleteCount == 0L)
  }
}
