package graft

import java.nio.file.{Files, Paths, StandardOpenOption}
import java.security.MessageDigest
import org.scalatest.funsuite.AnyFunSuite

/** Golden-hash regression (SURVEY §5.2.2): every declared query's sf0.001
  * result is hashed and compared against the checked-in snapshot. Catches
  * silent value drift between rounds that the (already-run) oracle gate
  * would only catch at submission time.
  *
  * Regenerate after an INTENTIONAL semantics change:
  *   GRAFT_GOLDEN_UPDATE=true sbt "testOnly graft.GoldenSpec"
  * (env var, not -D: tests run in a forked JVM)
  */
class GoldenSpec extends AnyFunSuite {
  private val spark = SparkFixture.spark
  private val goldenPath = Paths.get("src/test/resources/golden_sf0001.tsv")
  private val update = sys.env.get("GRAFT_GOLDEN_UPDATE").contains("true")

  private def hashOf(name: String): String = {
    val rows = SparkEntry.queries(name)(spark, SparkFixture.sf0001)
      .collect().map(_.toString)
    val md = MessageDigest.getInstance("MD5")
    rows.foreach(r => md.update(r.getBytes("UTF-8")))
    s"${rows.length}:${md.digest().map("%02x".format(_)).mkString}"
  }

  if (update) {
    test("regenerate golden hashes") {
      val lines = SparkEntry.queries.keys.toSeq.sorted
        .map(k => s"$k\t${hashOf(k)}")
      Files.createDirectories(goldenPath.getParent)
      Files.write(goldenPath, String.join("\n", lines: _*).getBytes,
        StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
      succeed
    }
  } else {
    val golden: Map[String, String] =
      if (Files.exists(goldenPath))
        Files.readAllLines(goldenPath).toArray(Array.empty[String])
          .filter(_.trim.nonEmpty) // robust to trailing-newline edits
          .map(_.split("\t", 2)).map(a => a(0) -> a(1)).toMap
      else Map.empty

    test("golden snapshot exists and matches the declared key set") {
      assert(golden.nonEmpty, "run with GRAFT_GOLDEN_UPDATE=true once")
      val missing = SparkEntry.queries.keySet -- golden.keySet
      assert(missing.isEmpty,
        s"no golden hash for: $missing — regenerate with " +
          "GRAFT_GOLDEN_UPDATE=true")
      val stale = golden.keySet -- SparkEntry.queries.keySet
      assert(stale.isEmpty,
        s"golden entries for removed/renamed keys: $stale — regenerate " +
          "with GRAFT_GOLDEN_UPDATE=true")
    }

    golden.keys.toSeq.sorted.foreach { k =>
      if (SparkEntry.queries.contains(k))
        test(s"golden: $k unchanged") {
          assert(hashOf(k) == golden(k),
            s"$k output drifted from the golden snapshot — if intentional, " +
              "regenerate with GRAFT_GOLDEN_UPDATE=true")
        }
    }
  }
}
