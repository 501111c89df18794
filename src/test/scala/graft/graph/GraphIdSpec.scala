package graft.graph

import org.scalatest.funsuite.AnyFunSuite

/** graphid semantics ported from the reference's graphid.sql
  * regression test: constructor/parse bounds, text round-trip, and the
  * property that packed-long order IS (labid, locid) graphid order —
  * the reason id columns can stay plain LongType.
  */
class GraphIdSpec extends AnyFunSuite {

  test("constructor bounds (graphid.sql:7-12)") {
    intercept[IllegalArgumentException](GraphId.pack(-1, 0))
    intercept[IllegalArgumentException](GraphId.pack(0, -1))
    assert(GraphId.show(GraphId.pack(0, 0)) == "0.0")
    assert(GraphId.show(GraphId.pack(65535, 281474976710655L)) ==
      "65535.281474976710655")
    intercept[IllegalArgumentException](GraphId.pack(65535, 281474976710656L))
    intercept[IllegalArgumentException](GraphId.pack(65536, 281474976710655L))
  }

  test("text form parse/render (graphid.sql:16-26)") {
    intercept[IllegalArgumentException](GraphId.parse("-1.0"))
    intercept[IllegalArgumentException](GraphId.parse("0.-1"))
    assert(GraphId.parse("0.0") == 0L)
    assert(GraphId.parse("65535.281474976710655") == -1L) // all bits set
    intercept[IllegalArgumentException](GraphId.parse("65535.281474976710656"))
    intercept[IllegalArgumentException](GraphId.parse("65536.281474976710655"))
    assert(GraphId.show(GraphId.parse("12345.123")) == "12345.123")
  }

  test("ordering: comparisons on the text values of graphid.sql:32-46") {
    // the reference's GRAPHID_TBL ordering scenario: 12345.1 < 12345.12
    // < 12345.123 < 12345.1234 < 12346.123 (labid first, then locid)
    val vals = Seq("0.0", "12345.1", "12345.12", "12345.123",
      "12345.1234", "12346.123", "65535.281474976710655")
      .map(GraphId.parse)
    val pivot = GraphId.parse("12345.123")
    def showAll(xs: Seq[Long]) = xs.map(GraphId.show)
    assert(showAll(vals.filter(_ == pivot)) == Seq("12345.123"))
    assert(showAll(vals.filter(_ != pivot)).size == 6)
    // unsigned comparison semantics: 65535.* has the top bit set
    assert(showAll(vals.filter(v => java.lang.Long.compareUnsigned(v, pivot) > 0))
      == Seq("12345.1234", "12346.123", "65535.281474976710655"))
    assert(showAll(vals.filter(v => java.lang.Long.compareUnsigned(v, pivot) < 0))
      == Seq("0.0", "12345.1", "12345.12"))
  }

  test("property: packed order = (labid, locid) lexicographic order") {
    val rnd = new java.util.Random(42)
    (1 to 2000).foreach { _ =>
      val (l1, c1) = (rnd.nextInt(0x8000), // signed-safe range
        (rnd.nextLong() & GraphId.LocidMax))
      val (l2, c2) = (rnd.nextInt(0x8000), (rnd.nextLong() & GraphId.LocidMax))
      val cmp = java.lang.Long.compare(GraphId.pack(l1, c1), GraphId.pack(l2, c2))
      val expect = if (l1 != l2) Integer.compare(l1, l2)
        else java.lang.Long.compare(c1, c2)
      assert(Integer.signum(cmp) == Integer.signum(expect), s"$l1.$c1 vs $l2.$c2")
    }
  }

  test("round-trip: labid/locid extraction inverts pack") {
    val rnd = new java.util.Random(7)
    (1 to 2000).foreach { _ =>
      val lab = rnd.nextInt(0x10000)
      val loc = rnd.nextLong() & GraphId.LocidMax
      val id = GraphId.pack(lab, loc)
      assert(GraphId.labid(id) == lab && GraphId.locid(id) == loc)
    }
  }
}
