package graft

import org.apache.spark.sql.functions._

/** Timing check of the containment path at the 10x-clone scale-smoke
  * shape, at the smoke's threshold and the gate's. Test-scope tool:
  *   sbt "Test/runMain graft.ContainmentProf"
  */
object ContainmentProf {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs0 = Tables.load(spark, "/root/testdata/sf0.1", "documents").select("doc_id", "text")
    val docs = (0 until 10).map(i =>
      docs0.select((col("doc_id") + lit(i * 1000000L)).as("doc_id"), col("text")))
      .reduce(_ unionByName _).localCheckpoint(true)
    def t(name: String)(body: => Long): Unit = {
      val t0 = System.nanoTime(); val r = body
      println(f"[prof] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s, $r rows")
    }
    t("containment_t099_50k") {
      operators.TextDedup.containmentPairs(docs, threshold = 0.99).count()
    }
    t("containment_t05_50k") {
      operators.TextDedup.containmentPairs(docs, threshold = 0.5).count()
    }
    spark.stop()
  }
}
