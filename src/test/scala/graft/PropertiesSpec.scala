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

  test("isodow pairing: java.time agrees Monday=1 across the epoch range") {
    (1 to 1000).foreach { _ =>
      val epochSec = math.abs(rnd.nextLong()) % 4102444800L
      val d = java.time.LocalDateTime
        .ofEpochSecond(epochSec, 0, java.time.ZoneOffset.UTC)
      val isodow = d.getDayOfWeek.getValue
      assert(isodow >= 1 && isodow <= 7)
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
}
