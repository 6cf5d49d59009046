package graft

import org.scalatest.funsuite.AnyFunSuite

/** Surface-wide physical-plan audit: EVERY declared query key is planned
  * at sf0.001 and screened for the one plan shape that is categorically
  * fatal at 100 TB — an unbounded `CartesianProduct`. PlanSpec pins the
  * *intended* plan of individual keys; this sweep guarantees no key —
  * present or future — ships a quadratic pair space by accident. A new
  * operator whose join degenerates (e.g. a lost equi-key after a refactor)
  * fails here with its name, not in production.
  *
  * Keys in `boundedCartesian` are the audited exceptions: each is a
  * cartesian over frames bounded BY CONSTRUCTION (documented per key), so
  * the product is O(model²), never O(corpus²). The sweep still asserts
  * every OTHER key is cartesian-free, and that the allowlist doesn't rot:
  * an allowlisted key whose plan no longer contains a cartesian must be
  * removed (it would silently shadow a future regression).
  */
class PlanSweepSpec extends AnyFunSuite {
  private val spark = SparkFixture.spark

  /** key → why its cartesian is bounded (reviewed, not waived). */
  private val boundedCartesian: Map[String, String] = Map.empty

  test("no declared query plans an unbounded CartesianProduct " +
      s"(${SparkEntry.queries.size} keys swept)") {
    val offenders = scala.collection.mutable.ListBuffer.empty[String]
    val staleAllow = scala.collection.mutable.ListBuffer.empty[String]
    SparkEntry.queries.keys.toSeq.sorted.foreach { k =>
      val p = SparkEntry.queries(k)(spark, SparkFixture.sf0001)
        .queryExecution.executedPlan.toString
      val hasCartesian = p.contains("CartesianProduct")
      if (boundedCartesian.contains(k)) {
        if (!hasCartesian) staleAllow += k
      } else if (hasCartesian) offenders += k
      // iterative ops persist localCheckpoint generations during plan
      // construction — drain per key, the Verify/Bench discipline
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    assert(offenders.isEmpty,
      s"unbounded CartesianProduct in: ${offenders.mkString(", ")} — " +
        "restore the equi-join key, or (only with a boundedness proof) " +
        "add to boundedCartesian with the argument")
    assert(staleAllow.isEmpty,
      s"allowlisted keys no longer plan a cartesian: " +
        s"${staleAllow.mkString(", ")} — remove them from boundedCartesian")
  }
}
