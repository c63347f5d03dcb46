package graft.functions

import org.scalatest.funsuite.AnyFunSuite

class GraftConfigSpec extends AnyFunSuite {

  private val yaml =
    """aws:
      |  region: us-east-1  # comment
      |  kinesis:
      |    stream_name: data-stream
      |    shard_count: 1
      |snowflake:
      |  warehouse: compute_wh
      |airflow:
      |  schedule_interval: "0 * * * *"  # Hourly
      |""".stripMargin.linesIterator.toSeq

  test("parses nested sections into dotted keys") {
    val c = GraftConfig.parse(yaml)
    assert(c("aws.region") == "us-east-1")
    assert(c("aws.kinesis.stream_name") == "data-stream")
    assert(c("aws.kinesis.shard_count") == "1")
    assert(c("snowflake.warehouse") == "compute_wh")
  }

  test("strips comments outside quotes, keeps # inside quotes") {
    val c = GraftConfig.parse(yaml)
    assert(c("airflow.schedule_interval") == "0 * * * *")
  }

  test("a bare # inside a value is data, not a comment (YAML rules)") {
    val c = GraftConfig.parse(Seq(
      "auth:",
      "  password: pa#ss  # real comment",
      "  url: http://h/page#frag",
      "  note: it's #1"))
    assert(c("auth.password") == "pa#ss")
    assert(c("auth.url") == "http://h/page#frag")
    assert(c("auth.note") == "it's") // ' #1' is whitespace-preceded -> comment
  }

  test("missing key: get is None, apply throws") {
    val c = GraftConfig.parse(yaml)
    assert(c.get("nope").isEmpty)
    intercept[NoSuchElementException](c("nope"))
    assert(c.getOrElse("nope", "x") == "x")
  }

  test("load reads a config file from disk") {
    val p = java.nio.file.Files.createTempFile("graft_cfg", ".yaml")
    java.nio.file.Files.writeString(p, "aws:\n  region: eu-west-1\n")
    assert(GraftConfig.load(p.toString)("aws.region") == "eu-west-1")
  }

  test("secret resolution prefers env over config") {
    val c = GraftConfig.parse(Seq("snowflake:", "  password: from_file"))
    assert(c.secret("snowflake.password", Map.empty).contains("from_file"))
    assert(c.secret("snowflake.password", Map("SNOWFLAKE_PASSWORD" -> "from_env"))
      .contains("from_env"))
  }
}
