package graft.jsonb

import org.scalatest.funsuite.AnyFunSuite

/** Property tests over the jsonb value algebra — the invariants every
  * operator in the engine leans on (ordering totality for ORDER BY /
  * btree parity, parse/render roundtrip for the canonical string
  * representation, arithmetic consistency). Seeded generators keep
  * runs deterministic.
  */
class JsonbPropertySpec extends AnyFunSuite {

  private def gen(rnd: java.util.Random, depth: Int): JValue = {
    val pick = if (depth <= 0) rnd.nextInt(4) else rnd.nextInt(6)
    pick match {
      case 0 => JNull
      case 1 => JBool(rnd.nextBoolean())
      case 2 =>
        // numbers across scales, incl. negative and high-precision
        val unscaled = rnd.nextLong() % 1000000000L
        val scale = rnd.nextInt(6)
        JNum(java.math.BigDecimal.valueOf(unscaled, scale))
      case 3 =>
        val chars = "ab\"\\\n\tzü0. "
        val n = rnd.nextInt(8)
        JStr((0 until n).map(_ => chars.charAt(rnd.nextInt(chars.length))).mkString)
      case 4 =>
        JArr((0 until rnd.nextInt(4)).map(_ => gen(rnd, depth - 1)).toVector)
      case _ =>
        Jsonb.mkObj((0 until rnd.nextInt(4)).map(i =>
          s"k${rnd.nextInt(5)}" -> gen(rnd, depth - 1)))
    }
  }

  test("parse(render(v)) == v (canonical roundtrip)") {
    val rnd = new java.util.Random(1)
    (1 to 3000).foreach { _ =>
      val v = gen(rnd, 3)
      val r = v.render
      assert(Jsonb.compare(Jsonb.parse(r), v) == 0, r)
      // canonical: a second roundtrip renders identically
      assert(Jsonb.parse(r).render == r, r)
    }
  }

  test("compare is a total order: antisymmetric and transitive") {
    val rnd = new java.util.Random(2)
    val vals = (1 to 60).map(_ => gen(rnd, 2))
    for (a <- vals; b <- vals) {
      val ab = Jsonb.compare(a, b); val ba = Jsonb.compare(b, a)
      assert(Integer.signum(ab) == -Integer.signum(ba), s"${a.render} vs ${b.render}")
    }
    for (a <- vals; b <- vals; c <- vals) {
      if (Jsonb.compare(a, b) <= 0 && Jsonb.compare(b, c) <= 0)
        assert(Jsonb.compare(a, c) <= 0,
          s"${a.render} <= ${b.render} <= ${c.render}")
    }
  }

  test("memcomparable sort key: unsigned byte order equals Jsonb.compare") {
    def unsignedCmp(a: Array[Byte], b: Array[Byte]): Int = {
      var i = 0
      while (i < a.length && i < b.length) {
        val d = (a(i) & 0xff) - (b(i) & 0xff)
        if (d != 0) return Integer.signum(d)
        i += 1
      }
      Integer.signum(a.length - b.length)
    }
    def key(v: JValue): Array[Byte] =
      graft.expr.JsonbSortKeyRT.sortKey(
        org.apache.spark.unsafe.types.UTF8String.fromString(v.render))
    val rnd = new java.util.Random(6)
    val vals = (1 to 120).map(_ => gen(rnd, 3))
    val keys = vals.map(key)
    for (i <- vals.indices; j <- vals.indices) {
      val want = Integer.signum(Jsonb.compare(vals(i), vals(j)))
      val got = unsignedCmp(keys(i), keys(j))
      assert(got == want,
        s"${vals(i).render} vs ${vals(j).render}: key $got compare $want")
    }
    // the cases per-column keys could not express: count-first containers
    val fewPairs = Jsonb.parse("""{"z": 1}""")
    val morePairs = Jsonb.parse("""{"a": 1, "b": 2}""")
    assert(unsignedCmp(key(fewPairs), key(morePairs)) < 0) // 1 pair < 2 pairs
    val shortArr = Jsonb.parse("[9]")
    val longArr = Jsonb.parse("[1, 2]")
    assert(unsignedCmp(key(shortArr), key(longArr)) < 0)
    // high-precision numerics beyond double resolution stay ordered
    val n1 = Jsonb.parse("100000000000000000000.00000001")
    val n2 = Jsonb.parse("100000000000000000000.00000002")
    assert(unsignedCmp(key(n1), key(n2)) < 0)
  }

  test("number arithmetic: (a+b)-b == a under jsonb equality") {
    val rnd = new java.util.Random(3)
    (1 to 2000).foreach { _ =>
      val a = JNum(java.math.BigDecimal.valueOf(rnd.nextLong() % 100000000L, rnd.nextInt(4)))
      val b = JNum(java.math.BigDecimal.valueOf(rnd.nextLong() % 100000000L, rnd.nextInt(4)))
      val back = Jsonb.sub(Jsonb.add(a, b), b)
      assert(Jsonb.compare(back, a) == 0, s"${a.render} + ${b.render}")
    }
  }

  test("containment: every value contains itself; object contains each single pair") {
    val rnd = new java.util.Random(4)
    (1 to 1500).foreach { _ =>
      val v = gen(rnd, 2)
      assert(Jsonb.contains(v, v), v.render)
      v match {
        case JObj(fields) => fields.foreach { case (k, fv) =>
          assert(Jsonb.contains(v, Jsonb.mkObj(Seq(k -> fv))), v.render)
        }
        case _ => ()
      }
    }
  }

  test("object concat: right operand wins, keys sorted canonically") {
    val rnd = new java.util.Random(5)
    (1 to 1500).foreach { _ =>
      val a = gen(rnd, 1); val b = gen(rnd, 1)
      (a, b) match {
        case (ao: JObj, bo: JObj) =>
          // object merge as the || / SET += runtime performs it
          val m = Jsonb.mkObj(ao.fields ++ bo.fields)
          bo.fields.foreach { case (k, v) =>
            assert(Jsonb.compare(m.get(k).get, v) == 0)
          }
          // canonical key order is preserved by construction
          assert(Jsonb.parse(m.render).render == m.render)
        case _ => ()
      }
    }
  }
}
