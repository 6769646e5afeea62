package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** The open-addressing buffer under QDigestAgg: model equivalence
  * against a reference map through heavy growth, collision chains,
  * and clear-reuse.
  */
class LongLongCountMapSpec extends AnyFunSuite {

  test("model equivalence under random addTo across growth boundaries") {
    val rnd = new scala.util.Random(5)
    val m = new LongLongCountMap(16) // tiny start: force many growths
    val ref = scala.collection.mutable.Map.empty[Long, Long]
    (1 to 50000).foreach { _ =>
      val k = 1L + rnd.nextInt(20000)
      val d = 1L + rnd.nextInt(5)
      m.addTo(k, d)
      ref(k) = ref.getOrElse(k, 0L) + d
    }
    assert(m.size == ref.size)
    ref.foreach { case (k, v) => assert(m.get(k) == v, s"key $k") }
    assert(m.get(999999999L) == 0L, "absent key reads 0")
    var seen = 0
    var sum = 0L
    m.foreachEntry((k, v) => { seen += 1; sum += v; assert(ref(k) == v) })
    assert(seen == ref.size && sum == ref.values.sum)
  }

  test("adjacent keys (worst probe clustering) stay correct") {
    val m = new LongLongCountMap(16)
    // q-digest's real key pattern: dense consecutive leaf ids
    (1L to 10000L).foreach(k => m.addTo(k, k))
    (1L to 10000L).foreach(k => assert(m.get(k) == k))
    assert(m.size == 10000)
  }

  test("clear keeps capacity and the map is reusable") {
    val m = new LongLongCountMap(16)
    (1L to 5000L).foreach(m.addTo(_, 1L))
    m.clear()
    assert(m.size == 0)
    assert(m.get(17L) == 0L)
    (1L to 100L).foreach(m.addTo(_, 2L))
    assert(m.size == 100 && m.get(42L) == 2L)
  }
}
