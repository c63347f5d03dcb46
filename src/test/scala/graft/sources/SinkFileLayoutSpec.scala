package graft.sources

import java.nio.file.Files

import graft.SparkSpec

class SinkFileLayoutSpec extends SparkSpec {

  test("one writer file per hour partition; maxRecordsPerFile splits oversized hours") {
    val root = Files.createTempDirectory("graft_layout").toString
    // 3 hours of events, heavily over-partitioned input (16 tasks)
    val ev = EventGenerator.events(spark, 3 * 3600, startEpochSeconds = 1735689600L)
      .repartition(16)
    PartitionedJsonSink.write(ev, root)
    def gzFiles = Files.walk(java.nio.file.Paths.get(root)).iterator()
    var perDir = Map.empty[String, Int].withDefaultValue(0)
    gzFiles.forEachRemaining { p =>
      if (p.toString.endsWith(".gz")) perDir += (p.getParent.toString -> (perDir(p.getParent.toString) + 1))
    }
    assert(perDir.size == 3, s"expected 3 hour dirs: ${perDir.keys}")
    assert(perDir.values.forall(_ == 1), s"multiple files per hour: $perDir")

    // small cap → the same hour splits into several bounded files
    val root2 = Files.createTempDirectory("graft_layout2").toString
    PartitionedJsonSink.write(EventGenerator.events(spark, 3600, startEpochSeconds = 1735689600L),
      root2, maxRecordsPerFile = 1000L)
    var n = 0
    Files.walk(java.nio.file.Paths.get(root2)).iterator()
      .forEachRemaining(p => if (p.toString.endsWith(".gz")) n += 1)
    assert(n >= 4, s"expected >=4 capped files, got $n")
  }
}
