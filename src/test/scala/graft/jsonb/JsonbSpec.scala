package graft.jsonb

import org.scalatest.funsuite.AnyFunSuite

/** Golden semantics ported from the reference's pg_regress expectations
  * (src/test/regress/expected/cypher_expr.out) — values, not code.
  */
class JsonbSpec extends AnyFunSuite {
  private def j(s: String): JValue = Jsonb.parse(s)
  private def r(v: JValue): String = v.render

  // --- unicode escape surrogates (json_encoding.out:49-68) ---
  test("surrogate pairs combine; orphans and misorders error; \\u0000 errors") {
    // valid pair decodes to the supplementary character
    assert(j("\"\\ud83d\\ude04\"") == JStr(
      new String(Character.toChars(0x1F604))))
    // two high surrogates in a row
    val e1 = intercept[IllegalArgumentException](j("\"\\ud83d\\ud83d\""))
    assert(e1.getMessage.contains(
      "Unicode high surrogate must not follow a high surrogate"))
    // wrong order / orphan high / orphan low
    for (bad <- Seq("\"\\ude04\\ud83d\"", "\"\\ud83dX\"", "\"\\ude04X\"",
        "\"\\ud83d\"")) {
      val e = intercept[IllegalArgumentException](j(bad))
      assert(e.getMessage.contains(
        "Unicode low surrogate must follow a high surrogate"), bad)
    }
    // \u0000 cannot be converted to text (jsonapi.c CODE_POINT_ZERO)
    val e0 = intercept[IllegalArgumentException](j("\"\\u0000\""))
    assert(e0.getMessage.contains("\\u0000"))
    // non-hex digits raise the json lexer's error (never a raw
    // NumberFormatException), including right after a high surrogate
    for (bad <- Seq("\"\\uZZZZ\"", "\"\\ud83d\\uZZZZ\"")) {
      val e = intercept[IllegalArgumentException](j(bad))
      assert(e.getMessage.contains("bad \\u escape"), s"$bad -> ${e.getMessage}")
    }
    // truncated low half -> the orphan-high structural error
    val et = intercept[IllegalArgumentException](j("\"\\ud83d\\ude0"))
    assert(et.getMessage.contains("surrogate"), et.getMessage)
    // simple escapes unaffected
    assert(j("\"\\u0024 \\u00a9\"") == JStr("$ \u00a9"))
  }

  // --- literals & canonical render (cypher_expr.out list/map literal) ---
  test("list literal renders PG-style") {
    assert(r(j("""[7, 7.0, "x", true, false, null, [0,1,2], {"p":"p"}]""")) ==
      """[7, 7.0, "x", true, false, null, [0, 1, 2], {"p": "p"}]""")
  }

  test("object keys sort by (length, bytes), duplicates last-wins") {
    assert(r(j("""{"i":7,"f":false,"l":[0,1,2],"o":{"p":"p"},"r":7.0,"s":"s","t":true,"\n2":1}""")) ==
      """{"f": false, "i": 7, "l": [0, 1, 2], "o": {"p": "p"}, "r": 7.0, "s": "s", "t": true, "\n2": 1}""")
    assert(r(Jsonb.mkObj(Seq("a" -> JNum(new java.math.BigDecimal(1)),
      "a" -> JNum(new java.math.BigDecimal(2))))) == """{"a": 2}""")
  }

  test("E-notation numbers print plain (6.02E23)") {
    assert(r(j("6.02E23")) == "602000000000000000000000")
    assert(r(j("3.14")) == "3.14")
    assert(r(j("-9223372036854775809")) == "-9223372036854775809")
  }

  // --- arithmetic (cypher_expr.out:52-61 and :55 arithmetic row) ---
  test("string concatenation: '1'+'1', '1'+1, 1+'1'") {
    assert(r(Jsonb.add(j("\"1\""), j("\"1\""))) == "\"11\"")
    assert(r(Jsonb.add(j("\"1\""), j("1"))) == "\"11\"")
    assert(r(Jsonb.add(j("1"), j("\"1\""))) == "\"11\"")
  }

  test("numeric ops: 1+1, 1-1, 2*2, 2/2, 2%2, 2^2, +1, -1") {
    assert(r(Jsonb.add(j("1"), j("1"))) == "2")
    assert(r(Jsonb.sub(j("1"), j("1"))) == "0")
    assert(r(Jsonb.mul(j("2"), j("2"))) == "4")
    assert(r(Jsonb.div(j("2"), j("2"))) == "1")
    assert(r(Jsonb.mod(j("2"), j("2"))) == "0")
    assert(r(Jsonb.pow(j("2"), j("2"))) == "4")
    assert(r(Jsonb.uplus(j("1"))) == "1")
    assert(r(Jsonb.uminus(j("1"))) == "-1")
  }

  test("integer division truncates (jnumber_op scale-0 rule)") {
    assert(r(Jsonb.div(j("1"), j("2"))) == "0")
    assert(r(Jsonb.div(j("7"), j("2"))) == "3")
    assert(r(Jsonb.div(j("-7"), j("2"))) == "-3")
  }

  test("decimal division keeps PG div scale (2.0/2 -> 20 zeros)") {
    assert(r(Jsonb.div(j("2.0"), j("2"))) == "1.00000000000000000000")
  }

  test("list concatenation & scalar/list promotion") {
    assert(r(Jsonb.add(j("\"s\""), j("[]"))) == "[\"s\"]")
    assert(r(Jsonb.add(j("0"), j("[]"))) == "[0]")
    assert(r(Jsonb.add(j("true"), j("[]"))) == "[true]")
    assert(r(Jsonb.add(j("[]"), j("\"s\""))) == "[\"s\"]")
    assert(r(Jsonb.add(j("[0]"), j("[1]"))) == "[0, 1]")
    assert(r(Jsonb.add(j("[]"), j("{}"))) == "[{}]")
    assert(r(Jsonb.add(j("{}"), j("[]"))) == "[{}]")
  }

  test("invalid '+' combos raise 'invalid expression'") {
    for ((l, rr) <- Seq("\"\"" -> "false", "\"\"" -> "{}", "0" -> "false",
      "0" -> "{}", "false" -> "\"\"", "false" -> "0", "false" -> "false",
      "false" -> "{}", "{}" -> "\"\"", "{}" -> "0", "{}" -> "false",
      "{}" -> "{}")) {
      val ex = intercept[IllegalArgumentException](Jsonb.add(j(l), j(rr)))
      assert(ex.getMessage.startsWith("invalid expression:"))
    }
  }

  test("non-add ops are numeric-only") {
    intercept[IllegalArgumentException](Jsonb.sub(j("\"\""), j("\"\"")))
    intercept[IllegalArgumentException](Jsonb.mul(j("[]"), j("[]")))
    intercept[IllegalArgumentException](Jsonb.div(j("{}"), j("{}")))
    intercept[IllegalArgumentException](Jsonb.mod(j("false"), j("0")))
    intercept[IllegalArgumentException](Jsonb.pow(j("[]"), j("0")))
    intercept[IllegalArgumentException](Jsonb.uminus(j("\"\"")))
    intercept[IllegalArgumentException](Jsonb.uplus(j("[]")))
  }

  // --- casts (cypher_expr.out ::bool block) ---
  test("bool cast: falsy '' 0 false [] {}, truthy 's' 1 true [0] {p:0}") {
    assert(Jsonb.toBool(j("\"\"")) == false)
    assert(Jsonb.toBool(j("0")) == false)
    assert(Jsonb.toBool(j("false")) == false)
    assert(Jsonb.toBool(j("[]")) == false)
    assert(Jsonb.toBool(j("{}")) == false)
    assert(Jsonb.toBool(j("\"s\"")) == true)
    assert(Jsonb.toBool(j("1")) == true)
    assert(Jsonb.toBool(j("true")) == true)
    assert(Jsonb.toBool(j("[0]")) == true)
    assert(Jsonb.toBool(j("{\"p\": 0}")) == true)
  }

  // --- compare (jsonb btree order) ---
  test("type rank: Null < String < Numeric < Bool < Array < Object") {
    val order = Seq("null", "\"a\"", "1", "true", "[1]", "{\"a\": 1}").map(j)
    order.sliding(2).foreach { case Seq(a, b) =>
      assert(Jsonb.compare(a, b) < 0, s"${a.render} < ${b.render}")
    }
  }

  test("numeric equality across scales: 7 == 7.0") {
    assert(Jsonb.compare(j("7"), j("7.0")) == 0)
    assert(Jsonb.compare(j("7"), j("7.1")) < 0)
  }

  test("arrays: length first, then elementwise") {
    assert(Jsonb.compare(j("[1, 2]"), j("[0, 0, 0]")) < 0)
    assert(Jsonb.compare(j("[1, 2]"), j("[1, 3]")) < 0)
    assert(Jsonb.compare(j("[1, 2]"), j("[1, 2]")) == 0)
  }

  test("objects: pair count first, then sorted pairwise") {
    assert(Jsonb.compare(j("{\"a\": 9}"), j("{\"a\": 1, \"b\": 1}")) < 0)
    assert(Jsonb.compare(j("{\"a\": 1}"), j("{\"a\": 2}")) < 0)
    assert(Jsonb.compare(j("{\"a\": 1}"), j("{\"b\": 1}")) < 0)
  }

  // --- containment ---
  test("containment @>") {
    assert(Jsonb.contains(j("{\"a\": 1, \"b\": {\"c\": 2}}"), j("{\"a\": 1}")))
    assert(Jsonb.contains(j("{\"a\": 1, \"b\": {\"c\": 2}}"), j("{\"b\": {\"c\": 2}}")))
    assert(!Jsonb.contains(j("{\"a\": 1}"), j("{\"a\": 2}")))
    assert(Jsonb.contains(j("[1, 2, 3]"), j("[3, 1]")))
    assert(Jsonb.contains(j("[1, 2, 3]"), j("2")))
    assert(!Jsonb.contains(j("[1, 2, 3]"), j("4")))
  }

  test("exists ?") {
    assert(Jsonb.exists(j("{\"a\": 1}"), "a"))
    assert(!Jsonb.exists(j("{\"a\": 1}"), "b"))
    assert(Jsonb.exists(j("[\"x\", \"y\"]"), "x"))
  }
}
