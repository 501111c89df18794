package graft.jsonb

import org.scalatest.funsuite.AnyFunSuite

/** Pins the sidecar-pushdown soundness invariant the planner relies on
  * (Compiler "sidecar guard", JsonPath.leadingLaxKey /
  * leadingLaxPredKey): for an OBJECT-rooted document — the only shape
  * `properties(v)` can take — whenever the analyzer derives a leading
  * key k from a LAX path, a non-empty exists (or a TRUE match) implies
  * top-level key k is present, so conjoining `__pj_k IS NOT NULL` can
  * never drop a qualifying row. Fuzzed over random object documents ×
  * random generated paths (member/index/filter/wildcard chains for
  * exists; Cmp/starts with/exists() predicates for match), far beyond
  * the golden corpus.
  *
  * The object-rooted restriction is LOAD-BEARING, not a convenience:
  * lax mode auto-unwraps a top-level ARRAY under a member accessor
  * (`$.k` on `[{"k":1}]` yields 1 with no top-level key anywhere), so
  * the implication is FALSE for general jsonb — which is exactly why
  * the Compiler attaches the guard only to `properties(v)` (always an
  * object by construction) and never to arbitrary jsonb expressions.
  * The counterexample is pinned below.
  */
class PushdownSoundnessSpec extends AnyFunSuite {

  private def hasTopKey(doc: JValue, k: String): Boolean = doc match {
    case o: JObj => o.get(k).isDefined
    case _       => false
  }

  private val rnd = new scala.util.Random(20260815L)

  /** Random OBJECT-rooted document — the properties(v) shape. */
  private def genObj(depth: Int): JValue =
    Jsonb.mkObj(Seq.tabulate(rnd.nextInt(5))(i =>
      s"k${rnd.nextInt(4)}" -> gen(depth - 1)))

  private def gen(depth: Int): JValue =
    if (depth == 0) rnd.nextInt(4) match {
      case 0 => JNull
      case 1 => JNum(new java.math.BigDecimal(rnd.nextInt(100)))
      case 2 => JStr(("abc" + rnd.nextInt(10)).take(1 + rnd.nextInt(4)))
      case 3 => JBool(rnd.nextBoolean())
    }
    else rnd.nextInt(3) match {
      case 0 => JArr(Vector.fill(rnd.nextInt(4))(gen(depth - 1)))
      case 1 => Jsonb.mkObj(Seq.tabulate(rnd.nextInt(4))(i =>
        s"k${rnd.nextInt(4)}" -> gen(depth - 1)))
      case 2 => gen(0)
    }

  private def genSuffix(): String = {
    val steps = Vector.fill(rnd.nextInt(3))(rnd.nextInt(4) match {
      case 0 => s".k${rnd.nextInt(4)}"
      case 1 => s"[${rnd.nextInt(3)}]"
      case 2 => ".*"
      case 3 => s" ? (@.k${rnd.nextInt(4)} == ${rnd.nextInt(5)})"
    })
    steps.mkString
  }

  test("exists guard: non-empty lax result implies the leading key is present") {
    var guarded = 0
    for (_ <- 1 to 1500) {
      val doc = genObj(3)
      val mode = if (rnd.nextInt(4) == 0) "strict " else ""
      val path = mode + s"$$.k${rnd.nextInt(4)}" + genSuffix()
      JsonPath.leadingLaxKey(path).foreach { k =>
        guarded += 1
        assert(!mode.startsWith("strict"),
          s"guard must never fire for strict paths: $path")
        val ex = try JsonPath.exists(doc, path, null, silent = true,
          useTz = false) catch { case _: Throwable => null }
        if (ex == java.lang.Boolean.TRUE)
          assert(hasTopKey(doc, k),
            s"exists=$ex but key $k absent: doc=${doc.render} path=$path")
      }
    }
    assert(guarded > 500, s"fuzz generated too few guarded paths: $guarded")
  }

  test("match guard: TRUE lax predicate implies the required key is present") {
    var guarded = 0
    val preds = Vector[() => String](
      () => s"$$.k${rnd.nextInt(4)}${genSuffix()} == ${rnd.nextInt(5)}",
      () => s"${rnd.nextInt(5)} < $$.k${rnd.nextInt(4)}",
      () => s"""$$.k${rnd.nextInt(4)} starts with "a"""",
      () => s"exists($$.k${rnd.nextInt(4)}${genSuffix()})",
      // OR / negation forms: the analyzer must return None (the other
      // branch can be true without the key) — checked via `guarded`
      // only counting Some cases; a wrong Some here would fail the
      // implication on the k-absent branch
      () => s"$$.k${rnd.nextInt(4)} == 1 || $$.k${rnd.nextInt(4)} == 2",
      () => s"!(exists($$.k${rnd.nextInt(4)}))")
    for (_ <- 1 to 1500) {
      val doc = genObj(3)
      val path = preds(rnd.nextInt(preds.length))()
      JsonPath.leadingLaxPredKey(path).foreach { k =>
        guarded += 1
        val m = try JsonPath.matches(doc, path, null, silent = true,
          useTz = false) catch { case _: Throwable => null }
        if (m == java.lang.Boolean.TRUE)
          assert(hasTopKey(doc, k),
            s"match=true but key $k absent: doc=${doc.render} path=$path")
      }
    }
    assert(guarded > 400, s"fuzz generated too few guarded paths: $guarded")
  }

  test("OR and negated predicates never yield a guard key") {
    assert(JsonPath.leadingLaxPredKey("$.a == 1 || $.b == 2").isEmpty)
    assert(JsonPath.leadingLaxPredKey("!(exists($.a))").isEmpty)
    assert(JsonPath.leadingLaxPredKey("strict $.a == 1").isEmpty)
  }

  test("typed guard: TRUE `$.k OP lit` match implies the value satisfies " +
      "OP under BigDecimal/raw-string order (the __pn_/__ps_ pushdown)") {
    // models a uniformly-shredded key: the doc's k value is always a
    // plain number (or always a string) — the only shapes under which
    // the planner attaches the typed comparison
    val ops = Vector("==", "!=", "<", "<=", ">", ">=")
    var numChecked = 0
    for (_ <- 1 to 2000) {
      val hasKey = rnd.nextInt(5) > 0
      val v = new java.math.BigDecimal(rnd.nextInt(2001) - 1000)
        .movePointLeft(rnd.nextInt(3))
      val doc = if (hasKey) Jsonb.mkObj(Seq("k" -> JNum(v)))
        else Jsonb.mkObj(Seq("other" -> JNum(v)))
      val lit = new java.math.BigDecimal(rnd.nextInt(2001) - 1000)
        .movePointLeft(rnd.nextInt(3))
      val op = ops(rnd.nextInt(ops.length))
      val path = if (rnd.nextBoolean()) s"$$.k $op $lit"
        else s"$lit ${Vector("==", "!=", ">", ">=", "<", "<=")(ops.indexOf(op))} $$.k"
      val parsed = JsonPath.leadingLaxPredCmp(path)
      assert(parsed.exists(t => t._1 == "k" && t._2 == op),
        s"$path parsed as $parsed")
      val m = JsonPath.matches(doc, path, null, silent = true, useTz = false)
      val c = v.compareTo(lit)
      val want = op match {
        case "==" => c == 0; case "!=" => c != 0
        case "<" => c < 0; case "<=" => c <= 0
        case ">" => c > 0; case ">=" => c >= 0
      }
      if (m == java.lang.Boolean.TRUE) {
        numChecked += 1
        assert(hasKey && want,
          s"match true but pushdown filter would drop: doc=${doc.render} $path")
      } else assert(!(hasKey && want),
        s"match $m but value satisfies $op: doc=${doc.render} $path")
    }
    assert(numChecked > 300, s"fuzz exercised too few TRUE matches: $numChecked")
    // string forms: == / != / starts with over decoded raw strings
    for (_ <- 1 to 500) {
      val pool = Vector("", "a", "ab", "abc", "b\\\"q", "日本", "Ab")
      val v = pool(rnd.nextInt(pool.length))
      val litS = pool(rnd.nextInt(pool.length))
      val doc = Jsonb.mkObj(Seq("k" -> JStr(v)))
      val (path, want) = rnd.nextInt(3) match {
        case 0 => (s"""$$.k == ${JStr(litS).render}""", v == litS)
        case 1 => (s"""$$.k != ${JStr(litS).render}""", v != litS)
        case 2 => (s"""$$.k starts with ${JStr(litS).render}""",
          v.startsWith(litS))
      }
      val m = JsonPath.matches(doc, path, null, silent = true, useTz = false)
      assert((m == java.lang.Boolean.TRUE) == want,
        s"doc=${doc.render} $path -> $m want $want")
    }
  }

  test("typed guard, exists twin: non-empty `$.k ? (@ OP lit)` implies the " +
      "value satisfies OP (incl. trailing steps)") {
    val ops = Vector("==", "!=", "<", "<=", ">", ">=")
    for (_ <- 1 to 1500) {
      val hasKey = rnd.nextInt(5) > 0
      val v = new java.math.BigDecimal(rnd.nextInt(201) - 100)
        .movePointLeft(rnd.nextInt(3))
      val doc = if (hasKey) Jsonb.mkObj(Seq("k" -> JNum(v)))
        else Jsonb.mkObj(Seq("o" -> JNum(v)))
      val lit = new java.math.BigDecimal(rnd.nextInt(201) - 100)
        .movePointLeft(rnd.nextInt(3))
      val op = ops(rnd.nextInt(ops.length))
      val trail = if (rnd.nextInt(4) == 0) ".type()" else ""
      val path = s"$$.k ? (@ $op $lit)$trail"
      assert(JsonPath.leadingLaxFilterCmp(path)
        .exists(t => t._1 == "k" && t._2 == op), path)
      val ex = JsonPath.exists(doc, path, null, silent = true, useTz = false)
      val c = v.compareTo(lit)
      val want = op match {
        case "==" => c == 0; case "!=" => c != 0
        case "<" => c < 0; case "<=" => c <= 0
        case ">" => c > 0; case ">=" => c >= 0
      }
      if (ex == java.lang.Boolean.TRUE)
        assert(hasKey && want,
          s"exists true but typed filter would drop: doc=${doc.render} $path")
    }
    // flipped operand normalizes; @.b predicates and plain chains don't fire
    assert(JsonPath.leadingLaxFilterCmp("$.k ? (5 < @)")
      .contains(("k", ">", Left(new java.math.BigDecimal(5)))))
    assert(JsonPath.leadingLaxFilterCmp("$.k ? (@.b > 5)").isEmpty)
    assert(JsonPath.leadingLaxFilterCmp("$.k.b").isEmpty)
    assert(JsonPath.leadingLaxFilterCmp("strict $.k ? (@ > 5)").isEmpty)
    // AND-spine: both bounds collected, each independently necessary
    // (jsonpath && is 3VL — TRUE requires both sides TRUE); leaves
    // under || or inside a non-qualifying shape contribute nothing
    assert(JsonPath.leadingLaxFilterCmp("$.k ? (@ > 1 && @ < 9)").length == 2)
    assert(JsonPath.leadingLaxFilterCmp(
      "$.k ? (@ > 1 && (@ < 9 || @ == 0))")
      .map(_._2) == Seq(">"))
    assert(JsonPath.leadingLaxPredCmp("$.a > 1 && $.b == 2").length == 2)
    for (_ <- 1 to 800) {
      val v = new java.math.BigDecimal(rnd.nextInt(101) - 50)
      val doc = Jsonb.mkObj(Seq("k" -> JNum(v)))
      val lo = rnd.nextInt(101) - 50; val hi = rnd.nextInt(101) - 50
      val path = s"$$.k ? (@ > $lo && @ < $hi)"
      val ex = JsonPath.exists(doc, path, null, silent = true, useTz = false)
      val want = v.intValue > lo && v.intValue < hi
      assert((ex == java.lang.Boolean.TRUE) == want,
        s"doc=${doc.render} $path -> $ex")
    }
  }

  test("typed guard, string RANGES: jsonpath codepoint order equals the " +
      "UTF8String binary order Spark evaluates `__ps_k OP lit` with") {
    import org.apache.spark.unsafe.types.UTF8String
    // edge pool: empty, prefixes, multi-byte UTF-8, private-use U+E000,
    // U+FFFF, and supplementary chars (surrogate pairs) — the exact
    // range where UTF-16 code-unit order and codepoint order DISAGREE
    val pool = Vector("", "a", "ab", "abc", "b", "m", "mz", "Ab", "日本",
      "é", "", "￿", "𐀀", "😀", "a￿",
      "a𐀀", "a😀b")
    val ops = Vector("==", "!=", "<", "<=", ">", ">=")
    var trues = 0
    for (_ <- 1 to 3000) {
      val hasKey = rnd.nextInt(5) > 0
      val v = pool(rnd.nextInt(pool.length))
      val litS = pool(rnd.nextInt(pool.length))
      val doc = if (hasKey) Jsonb.mkObj(Seq("k" -> JStr(v)))
        else Jsonb.mkObj(Seq("o" -> JStr(v)))
      val op = ops(rnd.nextInt(ops.length))
      val renderedLit = JStr(litS).render
      val existsForm = rnd.nextBoolean()
      val path = if (existsForm) s"$$.k ? (@ $op $renderedLit)"
        else s"$$.k $op $renderedLit"
      val extracted = if (existsForm) JsonPath.leadingLaxFilterCmp(path)
        else JsonPath.leadingLaxPredCmp(path)
      assert(extracted.exists(t =>
        t._1 == "k" && t._2 == op && t._3 == Right(litS)),
        s"$path parsed as $extracted")
      val m = if (existsForm)
        JsonPath.exists(doc, path, null, silent = true, useTz = false)
      else JsonPath.matches(doc, path, null, silent = true, useTz = false)
      // the filter Spark actually evaluates on the shred column:
      // UTF8String compare = per-byte UTF-8 = codepoint order
      val c = UTF8String.fromString(v).compareTo(UTF8String.fromString(litS))
      val want = op match {
        case "==" => c == 0; case "!=" => c != 0
        case "<" => c < 0; case "<=" => c <= 0
        case ">" => c > 0; case ">=" => c >= 0
      }
      // EXACT for a uniformly-string key: missing key -> empty lax seq
      // -> not-true on both sides; present -> same comparator
      assert((m == java.lang.Boolean.TRUE) == (hasKey && want),
        s"doc=${doc.render} $path -> $m, spark-side ${hasKey && want}")
      if (m == java.lang.Boolean.TRUE) trues += 1
    }
    assert(trues > 300, s"fuzz exercised too few TRUE matches: $trues")
  }

  test("like_regex anchored literal prefix: extraction rules + necessity") {
    def pfx(p: String, f: String = "") = JsonPath.regexLiteralPrefix(p, f)
    assert(pfx("^abc").contains("abc"))
    assert(pfx("abc").isEmpty, "unanchored")
    assert(pfx("^abc", "i").isEmpty, "case-fold breaks byte-prefix")
    assert(pfx("^abc", "m").isEmpty, "m re-anchors per line")
    assert(pfx("^ab|cd").isEmpty, "alternation outranks the anchor")
    assert(pfx("^ab?c").contains("a"), "? makes b optional")
    assert(pfx("^ab*c").contains("a"))
    assert(pfx("^ab{0,2}").contains("a"))
    assert(pfx("^ab+c").contains("ab"), "+ keeps its char")
    assert(pfx("^a\\d+").contains("a"), "escape stops the scan")
    assert(pfx("^(ab)c").isEmpty, "group before any literal")
    assert(pfx("^.x").isEmpty)
    assert(pfx("^").isEmpty)
    // a quantifier's atom is one CODEPOINT: dropping only the low
    // surrogate of a supplementary char would leave an orphan high
    // surrogate prefix (UTF8String encodes it as '?') that filters out
    // rows the regex matches
    val emoji = new String(Character.toChars(0x1F600))
    assert(pfx(s"^a$emoji?").contains("a"), "drop the WHOLE optional emoji")
    assert(pfx(s"^$emoji?x").isEmpty, "lone optional emoji leaves nothing")
    assert(pfx(s"^$emoji*").isEmpty)
    assert(pfx(s"^$emoji+").contains(emoji), "+ keeps the full pair")
    assert(pfx(s"^${emoji}b?").contains(emoji), "ASCII drop keeps the pair")
    // the extractor wires through both pushdown doors
    assert(JsonPath.leadingLaxPredCmp("""$.k like_regex "^foo.*bar"""")
      .contains(("k", "startswith", Right("foo"))))
    assert(JsonPath.leadingLaxFilterCmp("""$.k ? (@ like_regex "^foo")""")
      .contains(("k", "startswith", Right("foo"))))
    // necessity fuzz: whenever a prefix is derived, a TRUE match
    // implies the value startsWith it (the pushdown can never drop a
    // qualifying row)
    val pats = Vector("^abc", "^ab+c", "^ab?c", "^a\\d+", "^Cust[0-9]*",
      "^日本.", "^x{1,3}y", "^ab*", s"^a$emoji?", s"^a$emoji*b",
      s"^a$emoji+")
    val vals = Vector("abc", "ab", "abbc", "ac", "a", "a7", "a77b",
      "Cust123", "日本語", "xy", "xxxy", "zabc", "", "Xabc", "abX",
      s"a$emoji", "ab", s"a${emoji}b", s"a$emoji$emoji")
    var trues = 0
    for (p <- pats; v <- vals) {
      val path = s"""$$.k like_regex "$p""""
      JsonPath.leadingLaxPredCmp(path).collect {
        case ("k", "startswith", Right(pre)) =>
          val doc = Jsonb.mkObj(Seq("k" -> JStr(v)))
          val m = JsonPath.matches(doc, path, null, silent = true,
            useTz = false)
          if (m == java.lang.Boolean.TRUE) {
            trues += 1
            assert(v.startsWith(pre),
              s"match TRUE but pushdown would drop: v=$v pat=$p pre=$pre")
          }
      }
    }
    assert(trues > 10, s"fuzz exercised too few TRUE matches: $trues")
  }

  test("pinned: codepoint order diverges from String.compareTo on " +
      "supplementary chars, and sort key / Jsonb.compare follow codepoints") {
    val bmp = "￿"
    val supp = new String(Character.toChars(0x10000)) // surrogate pair
    assert(bmp.compareTo(supp) > 0,   "UTF-16 units put U+FFFF above")
    assert(Jsonb.codepointCmp(bmp, supp) < 0, "codepoints put U+FFFF below")
    assert(Jsonb.compare(JStr(bmp), JStr(supp)) < 0)
    // jsonpath compare takes the same order (compareStrings,
    // jsonpath_exec.c:2201)
    val doc = Jsonb.mkObj(Seq("k" -> JStr(bmp)))
    assert(JsonPath.matches(doc, s"""$$.k < ${JStr(supp).render}""",
      null, silent = true, useTz = false) == java.lang.Boolean.TRUE)
    // memcomparable key agrees (unsigned byte order)
    def key(s: String) = graft.expr.JsonbSortKeyRT.sortKey(
      org.apache.spark.unsafe.types.UTF8String.fromString(JStr(s).render))
    val c = java.util.Arrays.compareUnsigned(key(bmp), key(supp))
    assert(c < 0, s"sort key order $c")
  }

  test("pinned counterexample: lax array auto-unwrap breaks the implication " +
      "for non-object roots (why the guard is properties(v)-only)") {
    val doc = Jsonb.parse("""[{"k0": 1}]""")
    assert(JsonPath.leadingLaxKey("$.k0").contains("k0"))
    assert(JsonPath.exists(doc, "$.k0", null, silent = false,
      useTz = false) == java.lang.Boolean.TRUE)
    assert(!hasTopKey(doc, "k0")) // exists=true yet no top-level key
  }
}
