package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole test run (per-suite sessions would
  * dominate runtime). Mirrors the Verify/Bench session config. */
object SparkFixture {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sf0001 = "/root/testdata/sf0.001"
  val sf001 = "/root/testdata/sf0.01"
  val sf01 = "/root/testdata/sf0.1"

  /** Temp dir recursively deleted at JVM exit — File.deleteOnExit on a
    * non-empty directory silently leaves it behind, so every spec fixture
    * dir goes through this instead of bare createTempDirectory. */
  def tempDir(prefix: String): java.io.File = {
    val dir = java.nio.file.Files.createTempDirectory(prefix).toFile
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def del(f: java.io.File): Unit = {
        val cs = f.listFiles(); if (cs != null) cs.foreach(del); f.delete(); ()
      }
      del(dir)
    }))
    dir
  }
}
