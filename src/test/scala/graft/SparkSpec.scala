package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared test base: one session for the whole forked test JVM, built
  * on GraftSession so test behavior can't drift from Verify/Bench.
  * Shuffle partitions are dropped to 4 — test fixtures are tiny and a
  * 32-partition shuffle is pure scheduling overhead there.
  */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.session
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = GraftSession.builder("local[4]", "graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      // fresh warehouse per test JVM: a managed-table DIRECTORY from a
      // previous run outlives the in-memory catalog and would make
      // CREATE TABLE fail with LOCATION_ALREADY_EXISTS
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_warehouse").toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
