package graft

import org.scalatest.funsuite.AnyFunSuite

/** Property-style checks (SURVEY §5.2.4) of the determinism rules and
  * scalar invariants the oracle pairings rely on — seeded sampling,
  * driver-side only (no Spark jobs), runs in milliseconds. */
class PropertiesSpec extends AnyFunSuite {
  private val rnd = new scala.util.Random(42)
  private def money(): Double =
    math.rint((rnd.nextDouble() - 0.5) * 2e7 * 100) / 100

  test("decimal money sums are order-free (the §7.2.2 rule)") {
    (1 to 200).foreach { _ =>
      val xs = List.fill(50)(money())
      val a = xs.map(BigDecimal(_)).sum
      val b = rnd.shuffle(xs).map(BigDecimal(_)).sum
      assert(a == b)
    }
  }

  test("double sums are NOT order-free — why §7.2.2 exists at all") {
    val xs = List(1e16, 1.1, -1e16, 2.2)
    assert(xs.sum != xs.reverse.sum)
  }

  test("floor ≤ x ≤ ceil, differing by exactly one unless integral") {
    (1 to 1000).foreach { _ =>
      val x = money()
      val f = math.floor(x); val c = math.ceil(x)
      assert(f <= x && x <= c)
      assert(if (f == c) x == f else c - f == 1.0)
    }
  }

  test("isodow pairing: Spark weekday()+1 equals java.time's ISO value") {
    // the actual §7.2.6 pairing rule, checked against an independent
    // implementation (java.time is ISO: Monday=1) on sampled dates
    val spark = SparkFixture.spark
    import spark.implicits._
    val epochs = List.fill(50)(math.abs(rnd.nextLong()) % 4102444800L)
    val fromSpark = epochs.toDF("es")
      .selectExpr("es", "weekday(timestamp_seconds(es)) + 1 AS isodow")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    epochs.foreach { es =>
      val expected = java.time.LocalDateTime
        .ofEpochSecond(es, 0, java.time.ZoneOffset.UTC)
        .getDayOfWeek.getValue
      assert(fromSpark(es) == expected,
        s"epoch $es: spark ${fromSpark(es)} vs java.time $expected")
    }
  }

  test("space-split/concat inverse on space-free tokens") {
    (1 to 500).foreach { _ =>
      val toks = List.fill(1 + rnd.nextInt(20))(
        List.fill(1 + rnd.nextInt(8))(('a' + rnd.nextInt(26)).toChar)
          .mkString)
      assert(toks.mkString(" ").split(" ").toList == toks)
    }
  }

  test("jaccard via sizes equals set-based jaccard") {
    (1 to 500).foreach { _ =>
      val a = List.fill(rnd.nextInt(30))(rnd.nextInt(40)).toSet
      val b = List.fill(1 + rnd.nextInt(30))(rnd.nextInt(40)).toSet
      val inter = a.intersect(b).size.toDouble
      val bySizes = inter / (a.size + b.size - inter)
      val direct = inter / a.union(b).size
      assert(bySizes == direct)
    }
  }

  test("Hamilton quotas (temperatureSample's arithmetic): exact fill " +
      "absent saturation, never over min(budget, corpus), caps respected") {
    // pure-Scala mirror of the √n-share → floor → largest-remainder →
    // per-group cap chain, on random group configurations
    (1 to 500).foreach { _ =>
      val sizes = List.fill(1 + rnd.nextInt(8))(1L + rnd.nextInt(5000))
      val n = sizes.sum
      val budget = 1 + rnd.nextInt(8000)
      val sq = sizes.map(s =>
        BigDecimal(java.math.BigDecimal.valueOf(math.sqrt(s.toDouble)))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP))
      val tot = sq.sum
      val share = sq.map(q => q.toDouble / tot.toDouble * budget)
      val base = share.map(math.floor(_).toLong)
      val leftover = budget - base.sum
      assert(leftover >= 0 && leftover <= sizes.length,
        s"leftover $leftover out of [0, ${sizes.length}]")
      val order = share.zip(base).map { case (s, b) => s - b }
        .zipWithIndex.sortBy { case (rem, i) => (-rem, i) }
        .map(_._2).zipWithIndex.toMap
      val take = sizes.indices.map { i =>
        math.min(base(i) + (if (order(i) < leftover) 1L else 0L), sizes(i))
      }
      take.zip(sizes).foreach { case (t, s) =>
        assert(t >= 0 && t <= s, s"take $t out of [0, $s]") }
      val saturated = sizes.indices.exists(i =>
        base(i) + (if (order(i) < leftover) 1L else 0L) > sizes(i))
      assert(take.sum <= math.min(budget.toLong, n),
        s"over-fill: ${take.sum} > min($budget, $n)")
      if (!saturated)
        assert(take.sum == math.min(budget.toLong, n),
          s"under-fill without saturation: ${take.sum} != " +
            s"min($budget, $n) (sizes=$sizes)")
    }
  }
}
