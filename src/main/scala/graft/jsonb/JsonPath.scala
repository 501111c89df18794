package graft.jsonb

import java.math.{BigDecimal => JBigDecimal, RoundingMode}
import scala.collection.mutable.ArrayBuffer

/** SQL/JSON path language (PostgreSQL `jsonpath`) over [[JValue]].
  *
  * The reference ships the full PG 12+ jsonpath surface (`@?`, `@@`,
  * `jsonb_path_exists/match/query/query_array/query_first`) and its
  * regression suite (src/test/regress/sql/jsonb_jsonpath.sql); this is
  * an independent implementation of the same semantics, behavior-
  * checked against the expected outputs
  * (src/test/regress/expected/jsonb_jsonpath.out, transcribed to
  * src/test/resources/jsonpath_golden.json).
  *
  * Semantics replicated from the reference executor
  * (src/backend/utils/adt/jsonpath_exec.c):
  *  - lax mode: structural errors suppressed, member/filter/method
  *    steps auto-unwrap arrays one level, array accessors auto-wrap
  *    non-arrays (executeItemOptUnwrapTarget);
  *  - strict mode: structural errors raised (unless silent);
  *  - filter predicates: three-valued, evaluation errors -> unknown;
  *    comparison is existential over both operand sequences
  *    (executePredicate); in lax mode the scan short-circuits on the
  *    first true, in strict the whole sequence is checked first;
  *  - cross-type comparison -> unknown, null vs non-null -> false
  *    (true for `!=`) (compareItems);
  *  - `.**` forces structural-error suppression for the rest of the
  *    chain (executeAnyItem), `**{last}` emits leaves only;
  *  - silent calls return the items accumulated BEFORE the error
  *    (executeJsonPath writes into `found` as it goes);
  *  - existence checks (`@?`) in lax mode skip non-numeric operands of
  *    unary +/- instead of erroring (executeUnaryArithmExpr); strict
  *    existence materializes the full list, so the error surfaces.
  *
  * Documented deviation: `.keyvalue()` ids are preorder indexes of the
  * object within the document (root = 0) rather than the reference's
  * jsonb byte offsets (executeKeyValueMethod), which depend on PG's
  * on-disk encoding. Ids remain unique per document and stable.
  * `.datetime()` follows the reference's template grammar for the
  * subset exercised by its tests (dd/mm/yyyy/HH24/MI/SS/TZH/TZM and
  * quoted separators).
  */
object JsonPath {

  // ------------------------------------------------------------------ errors

  /** structural = suppressed in lax mode / under `.**` (the reference's
    * ignoreStructuralErrors); every error is suppressed by silent mode.
    */
  final class PathError(val msg: String, val structural: Boolean,
      val fatal: Boolean = false)
      extends RuntimeException(msg) {
    // evaluation errors are control flow here: no stack traces
    override def fillInStackTrace(): Throwable = this
  }
  private def err(msg: String, structural: Boolean = false): Nothing =
    throw new PathError(msg, structural)
  /** fatal = raised via plain ereport in the reference, so neither the
    * predicate machinery nor silent mode suppresses it (e.g. a missing
    * path variable).
    */
  private def fatalErr(msg: String): Nothing =
    throw new PathError(msg, structural = false, fatal = true)

  // --------------------------------------------------------------------- AST

  sealed trait Expr
  case object Root extends Expr
  case object Current extends Expr
  case object LastIdx extends Expr // `last`, valid in array subscripts only
  final case class Lit(v: JValue) extends Expr
  final case class Variable(name: String) extends Expr
  final case class Arith(op: String, l: Expr, r: Expr) extends Expr
  final case class Unary(minus: Boolean, e: Expr) extends Expr
  final case class Chain(base: Expr, steps: List[Step]) extends Expr

  /** Predicates double as path expressions (the reference's "boolean
    * expression" extension): as a path they emit true/false/null.
    */
  sealed trait Pred extends Expr
  final case class Cmp(op: String, l: Expr, r: Expr) extends Pred
  final case class And(l: Pred, r: Pred) extends Pred
  final case class Or(l: Pred, r: Pred) extends Pred
  final case class Not(p: Pred) extends Pred
  final case class IsUnknown(p: Pred) extends Pred
  final case class ExistsP(e: Expr) extends Pred
  final case class LikeRegex(e: Expr, pattern: String, flags: String) extends Pred {
    // compiled once per parsed path (paths are cache-shared across
    // rows); recompiling per predicate evaluation would put a
    // Pattern.compile in the per-row hot path
    @transient lazy val re: java.util.regex.Pattern = regexPattern(pattern, flags)
  }
  final case class StartsWith(e: Expr, prefix: Expr) extends Pred

  sealed trait Step
  final case class Key(k: String) extends Step
  case object WildMember extends Step
  /** `.**{first to last}`; UNBOUNDED on both = `**{last}` = leaves only. */
  final case class AnyDesc(first: Long, last: Long) extends Step
  final case class Subscript(ranges: List[(Expr, Option[Expr])]) extends Step
  case object WildArray extends Step
  final case class Filter(p: Pred) extends Step
  final case class Method(name: String, arg: Option[String]) extends Step

  val UNBOUNDED: Long = Long.MaxValue

  final case class Path(lax: Boolean, expr: Expr)

  // ------------------------------------------------------------------ parser

  private val compiled = new java.util.concurrent.ConcurrentHashMap[String, Path]()

  def parse(s: String): Path = {
    val hit = compiled.get(s)
    if (hit != null) hit
    else {
      val p = new Parser(s).parsePath()
      if (compiled.size > 10000) compiled.clear() // bound the cache
      compiled.putIfAbsent(s, p)
      p
    }
  }

  private final class Parser(s: String) {
    private var i = 0
    private def fail(msg: String): Nothing =
      err(s"""syntax error in jsonpath: $msg at position $i""")
    private def ws(): Unit =
      while (i < s.length && Character.isWhitespace(s.charAt(i))) i += 1
    private def atEnd: Boolean = { ws(); i >= s.length }
    private def peek: Char = { ws(); if (i < s.length) s.charAt(i) else '\u0000' }
    private def eat(c: Char): Unit =
      if (peek == c) i += 1 else fail(s"expected '$c'")
    private def tryEat(tok: String): Boolean = {
      ws()
      if (s.startsWith(tok, i) &&
          (!isIdentChar(tok.last) || i + tok.length >= s.length ||
            !isIdentChar(s.charAt(i + tok.length)))) { i += tok.length; true }
      else false
    }
    private def isIdentStart(c: Char) =
      Character.isLetter(c) || c == '_' || c >= 128
    private def isIdentChar(c: Char) =
      Character.isLetterOrDigit(c) || c == '_' || c >= 128

    private def ident(): String = {
      ws()
      if (i >= s.length || !isIdentStart(s.charAt(i))) fail("expected identifier")
      val start = i
      while (i < s.length && isIdentChar(s.charAt(i))) i += 1
      s.substring(start, i)
    }

    private def quotedString(): String = {
      ws()
      if (peek != '"') fail("expected string")
      // reuse the JSON string scanner: find the closing quote honoring escapes
      val start = i; i += 1
      val sb = new StringBuilder
      while (i < s.length && s.charAt(i) != '"') {
        val c = s.charAt(i)
        if (c == '\\') {
          i += 1
          if (i >= s.length) fail("unterminated string")
          s.charAt(i) match {
            case '"'  => sb += '"'
            case '\\' => sb += '\\'
            case '/'  => sb += '/'
            case 'b'  => sb += '\b'
            case 'f'  => sb += '\f'
            case 'n'  => sb += '\n'
            case 'r'  => sb += '\r'
            case 't'  => sb += '\t'
            case 'u'  =>
              // same surrogate rules as the json lexer (reference
              // jsonpath_scan.l via jsonapi's checks; expected texts
              // jsonpath_encoding.out:42-68): pairs combine, orphans
              // and misorders error, code point zero errors
              def hex4(at: Int): Int =
                Jsonb.hex4(s, at, () => fail("bad \\u escape"))
              if (i + 4 >= s.length) fail("bad \\u escape")
              val ch = hex4(i + 1)
              i += 4
              if (ch >= 0xD800 && ch <= 0xDBFF) {
                if (i + 6 < s.length && s.charAt(i + 1) == '\\' &&
                    s.charAt(i + 2) == 'u') {
                  val lo = hex4(i + 3)
                  if (lo >= 0xDC00 && lo <= 0xDFFF) {
                    sb += ch.toChar; sb += lo.toChar; i += 6
                  } else if (lo >= 0xD800 && lo <= 0xDBFF)
                    fail("Unicode high surrogate must not follow " +
                      "a high surrogate")
                  else fail("Unicode low surrogate must follow " +
                    "a high surrogate")
                } else fail("Unicode low surrogate must follow " +
                  "a high surrogate")
              } else if (ch >= 0xDC00 && ch <= 0xDFFF)
                fail("Unicode low surrogate must follow a high surrogate")
              else if (ch == 0)
                fail("unsupported Unicode escape sequence: \\u0000 " +
                  "cannot be converted to text")
              else sb += ch.toChar
            case c2 => sb += c2 // jsonpath allows e.g. \$ \? pass-through
          }
          i += 1
        } else { sb += c; i += 1 }
      }
      if (i >= s.length) fail(s"unterminated string starting at $start")
      i += 1
      sb.toString
    }

    private def number(): JBigDecimal = {
      ws()
      val start = i
      if (i < s.length && (s.charAt(i) == '-' || s.charAt(i) == '+')) i += 1
      while (i < s.length && Character.isDigit(s.charAt(i))) i += 1
      if (i < s.length && s.charAt(i) == '.' && i + 1 < s.length &&
          Character.isDigit(s.charAt(i + 1))) {
        i += 1
        while (i < s.length && Character.isDigit(s.charAt(i))) i += 1
      }
      if (i < s.length && (s.charAt(i) == 'e' || s.charAt(i) == 'E')) {
        val save = i
        i += 1
        if (i < s.length && (s.charAt(i) == '-' || s.charAt(i) == '+')) i += 1
        if (i < s.length && Character.isDigit(s.charAt(i))) {
          while (i < s.length && Character.isDigit(s.charAt(i))) i += 1
        } else i = save
      }
      if (i == start) fail("expected number")
      new JBigDecimal(s.substring(start, i))
    }

    def parsePath(): Path = {
      val lax =
        if (tryEat("strict")) false
        else { tryEat("lax"); true }
      val e = parseExprOrPred()
      if (!atEnd) fail(s"trailing input '${s.substring(i)}'")
      Path(lax, e)
    }

    // predicate precedence: || < && < ! / comparisons
    private def parseExprOrPred(): Expr = parseOr()

    private def parseOr(): Expr = {
      var l = parseAnd()
      while (tryEat("||")) {
        val r = parseAnd()
        l = Or(asPred(l), asPred(r))
      }
      l
    }

    private def parseAnd(): Expr = {
      var l = parseNot()
      while (tryEat("&&")) {
        val r = parseNot()
        l = And(asPred(l), asPred(r))
      }
      l
    }

    private def asPred(e: Expr): Pred = e match {
      case p: Pred => p
      case _       => fail("expected a predicate")
    }

    private def parseNot(): Expr = {
      if (tryEat("!")) {
        // grammar: NOT applies to a delimited predicate only
        val inner = parseDelimitedPred()
        Not(inner)
      } else parseCmp()
    }

    private def parseDelimitedPred(): Pred = {
      if (tryEat("exists")) {
        eat('('); val e = parseExprOrPred(); eat(')')
        ExistsP(e)
      } else if (peek == '(') {
        eat('('); val inner = parseExprOrPred(); eat(')')
        val p = asPred(inner)
        if (tryEat("is")) {
          if (!tryEat("unknown")) fail("expected 'unknown'")
          IsUnknown(p)
        } else p
      } else fail("expected delimited predicate")
    }

    private def parseCmp(): Expr = {
      val l = parseAdditive()
      ws()
      val op =
        if (tryEat("==")) "=="
        else if (tryEat("!=") || tryEat("<>")) "!="
        else if (tryEat("<=")) "<="
        else if (tryEat(">=")) ">="
        // a bare < or > must not swallow <= / >= (handled above)
        else if (peek == '<') { i += 1; "<" }
        else if (peek == '>') { i += 1; ">" }
        else ""
      if (op.nonEmpty) Cmp(op, l, parseAdditive())
      else if (tryEat("like_regex")) {
        val pat = quotedString()
        val flags = if (tryEat("flag")) quotedString() else ""
        validateRegex(pat, flags)
        LikeRegex(l, pat, flags)
      } else if (tryEat("starts")) {
        if (!tryEat("with")) fail("expected 'with'")
        val init: Expr =
          if (peek == '"') Lit(JStr(quotedString()))
          else if (peek == '$') parsePrimaryChain()
          else fail("expected string or variable after 'starts with'")
        StartsWith(l, init)
      } else l
    }

    private def parseAdditive(): Expr = {
      var l = parseMultiplicative()
      var done = false
      while (!done) {
        ws()
        if (peek == '+') { i += 1; l = Arith("+", l, parseMultiplicative()) }
        else if (peek == '-') { i += 1; l = Arith("-", l, parseMultiplicative()) }
        else done = true
      }
      l
    }

    private def parseMultiplicative(): Expr = {
      var l = parseUnary()
      var done = false
      while (!done) {
        ws()
        if (peek == '*') { i += 1; l = Arith("*", l, parseUnary()) }
        else if (peek == '/') { i += 1; l = Arith("/", l, parseUnary()) }
        else if (peek == '%') { i += 1; l = Arith("%", l, parseUnary()) }
        else done = true
      }
      l
    }

    private def parseUnary(): Expr = {
      ws()
      if (peek == '-' && !startsNumber()) { i += 1; Unary(minus = true, parseUnary()) }
      else if (peek == '+' && !startsNumber()) { i += 1; Unary(minus = false, parseUnary()) }
      else if (peek == '-' || peek == '+') {
        // signed numeric literal (the scanner folds the sign into the
        // number, matching the reference: `-1` is a literal, `- 1` too —
        // both behave identically, so fold always)
        val sign = if (peek == '-') { i += 1; true } else { i += 1; false }
        ws()
        if (i < s.length && Character.isDigit(s.charAt(i))) {
          val n = number()
          withSteps(Lit(JNum(if (sign) n.negate else n)))
        } else Unary(sign, parseUnary())
      } else parsePrimaryChain()
    }

    private def startsNumber(): Boolean = {
      var j = i + 1
      while (j < s.length && Character.isWhitespace(s.charAt(j))) j += 1
      j < s.length && Character.isDigit(s.charAt(j))
    }

    private def parsePrimaryChain(): Expr = withSteps(parsePrimary())

    private def withSteps(base: Expr): Expr = {
      val steps = parseSteps()
      if (steps.isEmpty) base else Chain(base, steps)
    }

    private def parsePrimary(): Expr = {
      ws()
      if (i >= s.length) fail("unexpected end of input")
      s.charAt(i) match {
        case '$' =>
          i += 1
          if (i < s.length && isIdentStart(s.charAt(i))) Variable(ident())
          else if (i < s.length && s.charAt(i) == '"') Variable(quotedString())
          else Root
        case '@' => i += 1; Current
        case '"' => Lit(JStr(quotedString()))
        case c if Character.isDigit(c) => Lit(JNum(number()))
        case '(' =>
          eat('(')
          val inner = parseExprOrPred()
          eat(')')
          inner match {
            case p: Pred if tryEat("is") =>
              if (!tryEat("unknown")) fail("expected 'unknown'")
              IsUnknown(p)
            case other => other
          }
        case _ =>
          if (tryEat("last")) LastIdx
          else if (tryEat("true")) Lit(JBool(true))
          else if (tryEat("false")) Lit(JBool(false))
          else if (tryEat("null")) Lit(JNull)
          else if (tryEat("exists")) {
            eat('('); val e = parseExprOrPred(); eat(')')
            ExistsP(e)
          } else fail(s"unexpected '${s.charAt(i)}'")
      }
    }

    private def parseSteps(): List[Step] = {
      val steps = List.newBuilder[Step]
      var done = false
      while (!done) {
        ws()
        if (i < s.length && s.charAt(i) == '.') {
          i += 1
          ws()
          if (i < s.length && s.charAt(i) == '*') {
            i += 1
            if (i < s.length && s.charAt(i) == '*') {
              i += 1
              // .**{n} / .**{n to m} / .**{last}
              if (peek == '{') {
                eat('{')
                val first = anyLevel()
                val last = if (tryEat("to")) anyLevel() else first
                eat('}')
                steps += AnyDesc(first, last)
              } else steps += AnyDesc(0, UNBOUNDED)
            } else steps += WildMember
          } else if (i < s.length && s.charAt(i) == '"') {
            steps += Key(quotedString())
          } else {
            val name = ident()
            ws()
            if (i < s.length && s.charAt(i) == '(' && isMethod(name)) {
              i += 1
              val arg =
                if (peek == '"') Some(quotedString())
                else None
              eat(')')
              steps += Method(name, arg)
            } else steps += Key(name)
          }
        } else if (i < s.length && s.charAt(i) == '[') {
          i += 1
          ws()
          if (i < s.length && s.charAt(i) == '*') {
            i += 1; eat(']')
            steps += WildArray
          } else {
            val ranges = List.newBuilder[(Expr, Option[Expr])]
            var more = true
            while (more) {
              val from = parseExprOrPred() match {
                case p: Pred => fail("predicate not allowed as subscript"); p
                case e       => e
              }
              val to = if (tryEat("to")) Some(parseAdditive()) else None
              ranges += ((from, to))
              if (peek == ',') { i += 1 } else more = false
            }
            eat(']')
            steps += Subscript(ranges.result())
          }
        } else if (i < s.length && s.charAt(i) == '?') {
          i += 1
          eat('(')
          val p = asPred(parseExprOrPred())
          eat(')')
          steps += Filter(p)
        } else done = true
      }
      steps.result()
    }

    private def anyLevel(): Long = {
      ws()
      if (tryEat("last")) UNBOUNDED
      else {
        val n = number()
        n.longValueExact()
      }
    }

    private def isMethod(name: String): Boolean = name match {
      case "type" | "size" | "double" | "ceiling" | "floor" | "abs" |
          "keyvalue" | "datetime" => true
      case _ => false
    }
  }

  private[jsonb] def validateRegex(pat: String, flags: String): Unit = {
    try regexPattern(pat, flags)
    catch {
      case _: java.util.regex.PatternSyntaxException =>
        err(s"""invalid regular expression: $pat""")
      case e: PathError => throw e
    }
  }

  private def regexPattern(pat: String, flags: String): java.util.regex.Pattern = {
    // like_regex flags (reference: jsonpath_gram.y / regc POSIX AREs):
    // default `.` does NOT match newline and ^/$ anchor the whole
    // string; "s" = dot-all, "m" = newline-sensitive anchors, "q" =
    // literal, "i" = case-fold, "x" = extended.
    var f = 0
    flags.foreach {
      case 'i' => f |= java.util.regex.Pattern.CASE_INSENSITIVE |
          java.util.regex.Pattern.UNICODE_CASE
      case 's' => f |= java.util.regex.Pattern.DOTALL
      case 'm' => f |= java.util.regex.Pattern.MULTILINE
      case 'x' => f |= java.util.regex.Pattern.COMMENTS
      case 'q' => f |= java.util.regex.Pattern.LITERAL
      case c   => err(s"""unrecognized flag character "$c" in LIKE_REGEX predicate""")
    }
    val translated =
      if ((f & java.util.regex.Pattern.LITERAL) != 0) pat
      else translateAre(pat)
    java.util.regex.Pattern.compile(translated, f)
  }

  /** POSIX-ARE escapes that differ from Java's: `\b` is a backspace
    * character (Java: word boundary) and `\B` a literal backslash.
    */
  private def translateAre(pat: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < pat.length) {
      val c = pat.charAt(i)
      if (c == '\\' && i + 1 < pat.length) {
        pat.charAt(i + 1) match {
          case 'b' => sb.append("\\x08")
          case 'B' => sb.append("\\\\")
          case e   => sb.append('\\').append(e)
        }
        i += 2
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  // --------------------------------------------------------------- evaluator

  private val TRUE = 1; private val FALSE = 0; private val UNKNOWN = -1

  // finite decimal forms only ("inf"/"nan" are NOT valid double
  // representations here, matching the reference); compiled once —
  // .double() runs per row
  private val doubleRe = java.util.regex.Pattern.compile(
    """[+-]?(\d+(\.\d*)?|\.\d+)([eE][+-]?\d+)?""")

  /** One evaluation of one path over one document. */
  private final class Eval(root: JValue, vars: JValue, lax: Boolean,
      existence: Boolean, useTz: Boolean) {

    // `.**` and lax mode suppress structural errors for the rest of
    // the chain (reference: cxt->ignoreStructuralErrors)
    private var ignoreStructural = lax
    // existence evaluation (found == NULL in the reference): true for
    // a lax `@?` run and inside lax exists() predicates — the contexts
    // where unary +/- skips non-numeric operands
    private var existenceCtx = existence
    // innermost array length, for `last` (reference: innermostArraySize)
    private var innermostSize: Int = -1

    def run(e: Expr, found: ArrayBuffer[JValue]): Unit =
      exec(e, root, found += _, tail = true)

    /** exists-style run: true the moment anything is emitted (lax). */
    def runExists(e: Expr): Boolean = {
      object Found extends RuntimeException { override def fillInStackTrace(): Throwable = this }
      try { exec(e, root, _ => throw Found, tail = true); false }
      catch { case Found => true }
    }

    private def exec(e: Expr, cur: JValue, emit: JValue => Unit,
        tail: Boolean): Unit = e match {
      case Root    => emit(root)
      case Current => emit(cur)
      case Lit(v)  => emit(v)
      case LastIdx =>
        if (innermostSize < 0)
          err("LAST is allowed only in array subscripts")
        emit(JNum(JBigDecimal.valueOf(innermostSize.toLong - 1)))
      case Variable(name) => emit(lookupVar(name))
      case Chain(base, steps) =>
        val savedIgnore = ignoreStructural
        try exec(base, cur, v => applySteps(steps, v, emit), tail = false)
        finally ignoreStructural = savedIgnore
      case Arith(op, l, r) =>
        val lv = singleNumeric(collectUnwrapped(l, cur), "left", op)
        val rv = singleNumeric(collectUnwrapped(r, cur), "right", op)
        emit(JNum(arith(op, lv, rv)))
      case Unary(minus, arg) =>
        val seq = collectUnwrapped(arg, cur)
        seq.foreach {
          case JNum(n) => emit(JNum(if (minus) n.negate else n))
          case _ =>
            // existence mode (lax `@?` / lax exists()): skip
            // non-numerics instead of erroring (reference:
            // executeUnaryArithmExpr when found == NULL and !hasNext)
            if (!(existenceCtx && tail))
              err("operand of unary jsonpath operator " +
                (if (minus) "-" else "+") + " is not a numeric value")
        }
      case p: Pred =>
        // boolean path expression (reference extension): emits the
        // predicate's three-valued result as a JSON scalar
        pred(p, cur) match {
          case TRUE  => emit(JBool(true))
          case FALSE => emit(JBool(false))
          case _     => emit(JNull)
        }
    }

    /** Per-item, depth-first step application — matching the
      * reference's item-at-a-time executor so that the items emitted
      * before an error are exactly the reference's partial result.
      */
    private def applySteps(steps: List[Step], v: JValue,
        emit: JValue => Unit): Unit = steps match {
      case Nil => emit(v)
      case step :: rest =>
        def next(out: JValue): Unit = applySteps(rest, out, emit)
        step match {
          case Key(k) =>
            unwrapIfLax(v) { item =>
              item match {
                case o: JObj =>
                  o.get(k) match {
                    case Some(x) => next(x)
                    case None =>
                      if (!ignoreStructural)
                        err(s"""JSON object does not contain key "$k"""",
                          structural = true)
                  }
                case _ =>
                  if (!ignoreStructural)
                    err("jsonpath member accessor can only be applied to an object",
                      structural = true)
              }
            }
          case WildMember =>
            unwrapIfLax(v) {
              case JObj(fields) => fields.foreach { case (_, fv) => next(fv) }
              case _ =>
                if (!ignoreStructural)
                  err("jsonpath wildcard member accessor can only be applied to an object",
                    structural = true)
            }
          case WildArray =>
            v match {
              case JArr(items) => items.foreach(next)
              case other =>
                if (lax) next(other) // auto-wrap
                else err("jsonpath wildcard array accessor can only be applied to an array",
                  structural = true)
            }
          case Subscript(ranges) =>
            val items = v match {
              case JArr(it) => it
              case other if lax => Vector(other) // auto-wrap
              case _ =>
                err("jsonpath array accessor can only be applied to an array",
                  structural = true)
            }
            val savedSize = innermostSize
            innermostSize = items.length
            try {
              ranges.foreach { case (fromE, toE) =>
                val from = subscriptIndex(fromE, v)
                val to = toE.map(subscriptIndex(_, v)).getOrElse(from)
                if (!ignoreStructural &&
                    (from < 0 || from > to || to >= items.length))
                  err("jsonpath array subscript is out of bounds",
                    structural = true)
                var idx = math.max(from, 0)
                val hi = math.min(to, items.length - 1)
                while (idx <= hi) { next(items(idx)); idx += 1 }
              }
            } finally innermostSize = savedSize
          case Filter(p) =>
            unwrapIfLax(v) { item =>
              if (pred(p, item) == TRUE) next(item)
            }
          case AnyDesc(first, last) =>
            // the rest of the chain runs with structural errors
            // suppressed (reference: executeAnyItem sets
            // ignoreStructuralErrors around the continuation)
            val saved = ignoreStructural
            ignoreStructural = true
            try {
              val leavesOnly = first == UNBOUNDED && last == UNBOUNDED
              if (first == 0 && !leavesOnly) next(v)
              def descend(x: JValue, level: Long): Unit = {
                if (level <= last || leavesOnly) {
                  val children = x match {
                    case JObj(fields) => fields.map(_._2)
                    case JArr(items)  => items
                    case _            => Vector.empty
                  }
                  children.foreach { c =>
                    val isLeaf = !c.isInstanceOf[JObj] && !c.isInstanceOf[JArr]
                    if (level >= first || (leavesOnly && isLeaf)) next(c)
                    descend(c, level + 1)
                  }
                }
              }
              descend(v, 1)
            } finally ignoreStructural = saved
          case Method(name, arg) => method(name, arg, v, next)
        }
    }

    /** lax-mode single-level array unwrap for member/filter/method
      * steps (reference: executeItemUnwrapTargetArray).
      */
    private def unwrapIfLax(v: JValue)(f: JValue => Unit): Unit = v match {
      case JArr(items) if lax => items.foreach(f)
      case other              => f(other)
    }

    private def method(name: String, arg: Option[String], v: JValue,
        next: JValue => Unit): Unit = name match {
      case "type" =>
        next(JStr(v match {
          case JNull         => "null"
          case _: JStr       => "string"
          case _: JNum       => "number"
          case _: JBool      => "boolean"
          case _: JArr       => "array"
          case _: JObj       => "object"
          case dt: JDateTime => JsonPathDatetime.typeName(dt)
        }))
      case "size" =>
        v match {
          case JArr(items) => next(JNum(JBigDecimal.valueOf(items.length.toLong)))
          case _ =>
            if (lax) next(JNum(JBigDecimal.ONE)) // auto-wrapped singleton
            else err("jsonpath item method .size() can only be applied to an array",
              structural = true)
        }
      case "double" =>
        unwrapIfLax(v) {
          case JNum(n) =>
            val d = n.doubleValue()
            if (d.isInfinite || d.isNaN)
              err("numeric argument of jsonpath item method .double() is out of range for type double precision")
            next(JNum(new JBigDecimal(java.lang.Double.toString(d))))
          case JStr(s) =>
            if (!doubleRe.matcher(s).matches())
              err("string argument of jsonpath item method .double() is not a valid representation of a double precision number")
            val d = java.lang.Double.parseDouble(s)
            if (d.isInfinite || d.isNaN)
              err("numeric argument of jsonpath item method .double() is out of range for type double precision")
            next(JNum(new JBigDecimal(java.lang.Double.toString(d))))
          case _ =>
            err("jsonpath item method .double() can only be applied to a string or numeric value")
        }
      case "abs" | "floor" | "ceiling" =>
        unwrapIfLax(v) {
          case JNum(n) =>
            next(JNum(name match {
              case "abs"     => n.abs
              case "floor"   => n.setScale(0, RoundingMode.FLOOR)
              case "ceiling" => n.setScale(0, RoundingMode.CEILING)
            }))
          case _ =>
            err(s"jsonpath item method .$name() can only be applied to a numeric value")
        }
      case "keyvalue" =>
        unwrapIfLax(v) {
          case o: JObj =>
            val id = objectId(o)
            o.fields.foreach { case (k, fv) =>
              next(Jsonb.mkObj(Seq(
                "id" -> JNum(JBigDecimal.valueOf(id)),
                "key" -> JStr(k),
                "value" -> fv)))
            }
          case _ =>
            err("jsonpath item method .keyvalue() can only be applied to an object")
        }
      case "datetime" =>
        unwrapIfLax(v) {
          case JStr(s) => next(JsonPathDatetime.parse(s, arg))
          case _ =>
            err("jsonpath item method .datetime() can only be applied to a string")
        }
    }

    /** keyvalue() id: preorder index of the object within the document
      * (deviation from the reference's byte offsets, documented above).
      */
    private lazy val preorderIds: java.util.IdentityHashMap[JValue, Integer] = {
      val m = new java.util.IdentityHashMap[JValue, Integer]()
      var n = 0
      def walk(x: JValue): Unit = {
        m.put(x, n); n += 1
        x match {
          case JObj(fields) => fields.foreach(f => walk(f._2))
          case JArr(items)  => items.foreach(walk)
          case _            =>
        }
      }
      walk(root)
      m
    }
    private var generatedId = 1000000000
    private def objectId(o: JObj): Long = {
      val hit = preorderIds.get(o)
      if (hit != null) hit.toLong
      else { generatedId += 1; generatedId.toLong } // evaluation-created object
    }

    private def lookupVar(name: String): JValue = {
      vars match {
        case o: JObj =>
          o.get(name).getOrElse(
            fatalErr(s"""could not find jsonpath variable "$name""""))
        case _ =>
          fatalErr(s"""could not find jsonpath variable "$name"""")
      }
    }

    /** Operand evaluation: collect, then (lax) unwrap top-level arrays
      * one level (reference: executeItemOptUnwrapResult).
      */
    private def collectUnwrapped(e: Expr, cur: JValue): Vector[JValue] = {
      val buf = new ArrayBuffer[JValue]()
      exec(e, cur, buf += _, tail = false)
      if (lax)
        buf.iterator.flatMap {
          case JArr(items) => items
          case x           => Vector(x)
        }.toVector
      else buf.toVector
    }

    private def singleNumeric(seq: Vector[JValue], side: String,
        op: String): JBigDecimal = seq match {
      case Vector(JNum(n)) => n
      case _ =>
        err(s"$side operand of jsonpath operator $op is not a single numeric value")
    }

    private def arith(op: String, a: JBigDecimal, b: JBigDecimal): JBigDecimal =
      op match {
        case "+" => a.add(b)
        case "-" => a.subtract(b)
        case "*" => a.multiply(b)
        case "/" =>
          if (b.signum == 0) err("division by zero")
          Jsonb.numericDiv(a, b)
        case "%" =>
          if (b.signum == 0) err("division by zero")
          a.remainder(b)
      }

    private def subscriptIndex(e: Expr, arrayItem: JValue): Int = {
      // subscript expressions evaluate WITHOUT result unwrapping
      // (reference: getArrayIndex uses executeItem, not the
      // OptUnwrapResult variant)
      val buf = new ArrayBuffer[JValue]()
      exec(e, arrayItem, buf += _, tail = false)
      buf.toVector match {
        case Vector(JNum(n)) =>
          try n.setScale(0, RoundingMode.DOWN).intValueExact()
          catch {
            case _: ArithmeticException =>
              err("jsonpath array subscript is out of integer range")
          }
        case _ => err("jsonpath array subscript is not a single numeric value")
      }
    }

    // ------------------------------------------------------------ predicates

    private def pred(p: Pred, cur: JValue): Int = p match {
      case And(l, r) =>
        val lv = pred(l, cur)
        if (lv == FALSE) FALSE
        else {
          val rv = pred(r, cur)
          if (rv == FALSE) FALSE
          else if (lv == TRUE && rv == TRUE) TRUE
          else UNKNOWN
        }
      case Or(l, r) =>
        val lv = pred(l, cur)
        if (lv == TRUE) TRUE
        else {
          val rv = pred(r, cur)
          if (rv == TRUE) TRUE
          else if (lv == FALSE && rv == FALSE) FALSE
          else UNKNOWN
        }
      case Not(inner) =>
        pred(inner, cur) match {
          case TRUE  => FALSE
          case FALSE => TRUE
          case _     => UNKNOWN
        }
      case IsUnknown(inner) =>
        if (pred(inner, cur) == UNKNOWN) TRUE else FALSE
      case ExistsP(e) =>
        // strict: materialize everything so any error surfaces as
        // unknown; lax: stop at the first item (reference:
        // executeBoolItem jspExists)
        try {
          if (!lax) {
            val buf = new ArrayBuffer[JValue]()
            exec(e, cur, buf += _, tail = false)
            if (buf.nonEmpty) TRUE else FALSE
          } else {
            // lax exists() runs with found == NULL in the reference,
            // i.e. in existence mode (unary +/- skips non-numerics)
            object Found extends RuntimeException { override def fillInStackTrace(): Throwable = this }
            val saved = existenceCtx
            existenceCtx = true
            try { exec(e, cur, _ => throw Found, tail = true); FALSE }
            catch { case Found => TRUE }
            finally existenceCtx = saved
          }
        } catch { case pe: PathError if !pe.fatal => UNKNOWN }
      case Cmp(op, l, r) => predicate2(l, Some(r), cur, unwrapRight = true) {
          (lv, rv) => compareItems(op, lv, rv.get)
        }
      case StartsWith(l, prefix) =>
        predicate2(l, Some(prefix), cur, unwrapRight = false) { (lv, rv) =>
          (lv, rv.get) match {
            case (JStr(a), JStr(b)) => if (a.startsWith(b)) TRUE else FALSE
            case _                  => UNKNOWN
          }
        }
      case lr @ LikeRegex(e, _, _) =>
        predicate2(e, None, cur, unwrapRight = false) { (lv, _) =>
          lv match {
            case JStr(s) => if (lr.re.matcher(s).find()) TRUE else FALSE
            case _       => UNKNOWN
          }
        }
    }

    /** Existential scan over operand sequences with the reference's
      * mode-dependent short-circuiting (executePredicate): lax returns
      * on the first true; strict returns unknown on the first unknown
      * and scans everything before returning true.
      */
    private def predicate2(l: Expr, r: Option[Expr], cur: JValue,
        unwrapRight: Boolean)(cmp: (JValue, Option[JValue]) => Int): Int = {
      val lseq =
        try collectUnwrapped(l, cur)
        catch { case pe: PathError if !pe.fatal => return UNKNOWN }
      val rseq: Option[Vector[JValue]] = r match {
        case None => None
        case Some(re) =>
          try Some(
            if (unwrapRight) collectUnwrapped(re, cur)
            else { val b = new ArrayBuffer[JValue](); exec(re, cur, b += _, tail = false); b.toVector })
          catch { case pe: PathError if !pe.fatal => return UNKNOWN }
      }
      var sawError = false
      var found = false
      lseq.foreach { lv =>
        val rvals: Vector[Option[JValue]] = rseq match {
          case None     => Vector(None)
          case Some(rs) => rs.map(Some(_))
        }
        rvals.foreach { rv =>
          cmp(lv, rv) match {
            case UNKNOWN =>
              if (!lax) return UNKNOWN
              sawError = true
            case TRUE =>
              if (lax) return TRUE
              found = true
            case _ =>
          }
        }
      }
      if (found) TRUE
      else if (sawError) UNKNOWN
      else FALSE
    }

    /** reference: compareItems — null vs non-null compares false
      * (true for !=), cross-type and container comparison is unknown.
      */
    private def compareItems(op: String, a: JValue, b: JValue): Int = {
      val bothDt = a.isInstanceOf[JDateTime] && b.isInstanceOf[JDateTime]
      if (bothDt) {
        return JsonPathDatetime.compare(op,
          a.asInstanceOf[JDateTime], b.asInstanceOf[JDateTime], useTz)
      }
      if (a.typeRank != b.typeRank) {
        if (a == JNull || b == JNull)
          return if (op == "!=") TRUE else FALSE
        return UNKNOWN
      }
      val c = (a, b) match {
        case (JNull, JNull)       => 0
        case (JBool(x), JBool(y)) => java.lang.Boolean.compare(x, y)
        case (JNum(x), JNum(y))   => x.compareTo(y)
        // codepoint collation (jsonpath_exec.c:2201 compareStrings:
        // per-byte UTF-8 == codepoint order)
        case (JStr(x), JStr(y))   => Jsonb.codepointCmp(x, y)
        case _                    => return UNKNOWN // containers
      }
      val res = op match {
        case "==" => c == 0
        case "!=" => c != 0
        case "<"  => c < 0
        case "<=" => c <= 0
        case ">"  => c > 0
        case ">=" => c >= 0
      }
      if (res) TRUE else FALSE
    }
  }

  // --------------------------------------------------------------- public API

  /** jsonb_path_query: the result sequence; when silent, the items
    * accumulated before a (suppressed) error are returned — matching
    * the reference, which streams into `found`.
    */
  def query(doc: JValue, path: String, vars: JValue = null,
      silent: Boolean = false, useTz: Boolean = false): Vector[JValue] = {
    val p = parse(path)
    checkVars(vars)
    val ev = new Eval(doc, vars, p.lax, existence = false, useTz)
    val found = new ArrayBuffer[JValue]()
    try ev.run(p.expr, found)
    catch { case pe: PathError if silent && !pe.fatal => () }
    found.toVector
  }

  /** `@?` / jsonb_path_exists. Returns null when a suppressed error
    * occurred (SQL NULL).
    */
  def exists(doc: JValue, path: String, vars: JValue = null,
      silent: Boolean = true, useTz: Boolean = false): java.lang.Boolean = {
    val p = parse(path)
    checkVars(vars)
    try {
      if (p.lax) {
        // lax existence: first emission wins; unary +/- skips
        // non-numerics (reference: found == NULL fast path)
        val ev = new Eval(doc, vars, lax = true, existence = true, useTz)
        java.lang.Boolean.valueOf(ev.runExists(p.expr))
      } else {
        // strict: materialize the full list so errors surface
        val ev = new Eval(doc, vars, lax = false, existence = false, useTz)
        val found = new ArrayBuffer[JValue]()
        ev.run(p.expr, found)
        java.lang.Boolean.valueOf(found.nonEmpty)
      }
    } catch {
      case pe: PathError =>
        if (silent && !pe.fatal) null else throw pe
    }
  }

  /** `@@` / jsonb_path_match: single boolean result or SQL NULL. */
  def matches(doc: JValue, path: String, vars: JValue = null,
      silent: Boolean = true, useTz: Boolean = false): java.lang.Boolean = {
    val p = parse(path)
    checkVars(vars)
    val ev = new Eval(doc, vars, p.lax, existence = false, useTz)
    val found = new ArrayBuffer[JValue]()
    try ev.run(p.expr, found)
    catch { case pe: PathError => if (!silent || pe.fatal) throw pe }
    if (found.length == 1) {
      found(0) match {
        case JBool(b) => return java.lang.Boolean.valueOf(b)
        case JNull    => return null
        case _        =>
      }
    }
    if (!silent) err("single boolean result is expected")
    null
  }

  def queryArray(doc: JValue, path: String, vars: JValue = null,
      silent: Boolean = false, useTz: Boolean = false): JValue =
    JArr(query(doc, path, vars, silent, useTz).map(materialize))

  def queryFirst(doc: JValue, path: String, vars: JValue = null,
      silent: Boolean = false, useTz: Boolean = false): JValue =
    query(doc, path, vars, silent, useTz).headOption.map(materialize).orNull

  /** Render each result item as jsonb text (datetimes serialize back
    * to strings, like the reference's JsonbValueToJsonb).
    */
  def queryStrings(doc: JValue, path: String, vars: JValue, silent: Boolean,
      useTz: Boolean): Vector[String] =
    query(doc, path, vars, silent, useTz).map(v => materialize(v).render)

  /** Datetimes exist only during evaluation; converting a result back
    * to jsonb turns them into their text form.
    */
  private def materialize(v: JValue): JValue = v match {
    case dt: JDateTime => JStr(dt.text)
    case other         => other
  }

  private def checkVars(vars: JValue): Unit = vars match {
    case null | _: JObj => ()
    case _ =>
      err(""""vars" argument is not an object""")
  }

  /** The leading member key of a LAX, NON-PREDICATE path (`$.k ...`):
    * any document with a non-empty result must contain top-level key k
    * (lax `$.k` on a missing key yields empty without error), so an
    * `exists` filter on such a path implies a plain `key IS NOT NULL`
    * predicate over a shredded property sidecar — parquet-prunable.
    * Returns None for strict paths (the missing-key ERROR must
    * surface), predicate paths (`$.k == 1` emits one item ALWAYS,
    * even unknown), and unparsable paths (the runtime error must
    * surface at evaluation, not planning).
    */
  def leadingLaxKey(path: String): Option[String] =
    try {
      val p = parse(path)
      if (!p.lax) None
      else p.expr match {
        case Chain(Root, Key(k) :: _) => Some(k)
        case _ => None
      }
    } catch { case _: Throwable => None }

  /** The leading member key of a LAX top-level PREDICATE path whose
    * truth requires the key: for `$.k == v` / `$.k starts with s` /
    * `$.k like_regex r` / `exists($.k ...)`, a missing key makes the
    * operand sequence empty, the predicate false-or-unknown, and
    * jsonb_path_match never true — so a match FILTER implies
    * `properties->k IS NOT NULL` exactly. OR at the top is excluded
    * (the other branch can be true without k); AND is conservatively
    * excluded too (keep the proof one-step). Strict paths excluded
    * (missing-key error must surface), non-predicate paths excluded
    * (their missing-key "single boolean result" error must surface
    * when not silent).
    */
  def leadingLaxPredKey(path: String): Option[String] =
    try {
      val p = parse(path)
      if (!p.lax) None
      else {
        def rootKey(e: Expr): Option[String] = e match {
          case Chain(Root, Key(k) :: _) => Some(k)
          case _ => None
        }
        p.expr match {
          case Cmp(_, l, r)       => rootKey(l).orElse(rootKey(r))
          case StartsWith(e, _)   => rootKey(e)
          case lr: LikeRegex      => rootKey(lr.e)
          case ExistsP(e)         => rootKey(e)
          case _                  => None
        }
      }
    } catch { case _: Throwable => None }

  private def cmpLitOf(e: Expr): Option[Either[java.math.BigDecimal, String]] =
    e match {
      case Lit(JNum(n)) => Some(Left(n))
      case Lit(JStr(s)) => Some(Right(s))
      case _ => None
    }

  private def cmpFlip(op: String): String = op match {
    case "<" => ">"; case ">" => "<"
    case "<=" => ">="; case ">=" => "<="
    case other => other
  }

  /** Literal prefix every `like_regex` MATCH must start with, when the
    * pattern proves one: anchored (`^...`), no flags (`i` breaks case
    * parity, `m` re-anchors per line, `x`/`q` change parsing), no `|`
    * anywhere (anchors bind tighter than alternation — `^ab|cd`
    * matches "cd" with no prefix), and the prefix run stops before any
    * metacharacter; a trailing `?`/`*`/`{` quantifier makes its
    * preceding char optional, so it is dropped from the proof (`+`
    * keeps it — one-or-more). The same planner trick PG plays turning
    * anchored regexes into index range scans (indxpath.c prefix
    * extraction); here it feeds the `__ps_` startsWith pushdown as a
    * necessary conjunct (the regex itself still evaluates).
    */
  private[graft] def regexLiteralPrefix(pattern: String,
      flags: String): Option[String] = {
    if (flags.nonEmpty || !pattern.startsWith("^") ||
        pattern.contains("|")) None
    else {
      val meta = "\\^$.?*+()[]{"
      val sb = new StringBuilder
      var i = 1
      while (i < pattern.length && meta.indexOf(pattern.charAt(i)) < 0) {
        sb += pattern.charAt(i); i += 1
      }
      if (i < pattern.length && "?*{".indexOf(pattern.charAt(i)) >= 0 &&
          sb.nonEmpty) {
        // the quantifier's atom is one CODEPOINT (java.util.regex treats
        // a supplementary pair as a single atom): dropping only the low
        // surrogate would leave an orphan high surrogate that UTF8String
        // encodes as '?', silently filtering rows the regex matches
        sb.setLength(sb.length - 1)
        if (sb.nonEmpty && Character.isHighSurrogate(sb.charAt(sb.length - 1)))
          sb.setLength(sb.length - 1)
      }
      if (sb.isEmpty) None else Some(sb.toString)
    }
  }

  /** Qualifying comparison leaves on the AND-SPINE of a predicate:
    * jsonpath `&&` is 3VL — the conjunction is TRUE only when BOTH
    * sides are TRUE — so every spine leaf is independently necessary.
    * Leaves under `||` or `!` are never visited (the other OR branch
    * can be true without them; negation inverts). `leaf` extracts a
    * (key, op, literal) triple from one Cmp/StartsWith, or None.
    */
  private def andSpine(p: Pred,
      leaf: Pred => Option[(String, String, Either[java.math.BigDecimal, String])])
      : Seq[(String, String, Either[java.math.BigDecimal, String])] =
    p match {
      case And(l, r) => andSpine(l, leaf) ++ andSpine(r, leaf)
      case other     => leaf(other).toSeq
    }

  /** LAX top-level predicate comparisons of the SINGLE-STEP member
    * `$.k` against scalar literals, one per qualifying AND-spine leaf:
    * `(key, op, Left(number) | Right(string))` with op ∈ {== != < <= >
    * >=, startswith}. The basis for the EXACT typed-shred pushdown
    * (stronger than the presence guard): when key k shreds numerically
    * — uniformly ShredNumRe-matching values, so JSON nulls, strings,
    * containers and unrepresentable numbers all degrade the key and
    * the sidecar is absent — a TRUE jsonb_path_match requires value(k)
    * op literal under numeric compare, which IS BigDecimal order, i.e.
    * `__pn_k op lit`. Dually for uniformly-string keys with ALL of
    * == / != / < / <= / > / >= / starts with on the decoded raw
    * string: jsonpath string compare is codepoint collation
    * (compareStrings, jsonpath_exec.c:2201 — per-byte UTF-8), which
    * is exactly UTF8String/parquet binary order, so string ranges
    * prune row-groups like numeric ones. An AND pushes every qualifying leaf
    * (`$.a > 5 && $.b == 1` → both; the range form's min AND max prune
    * row-groups together); different keys may mix. Only the exact leaf
    * shape qualifies: a chained operand (`$.k.b == 1`) compares a
    * NESTED value, `$.k[0]` an element, so those leaves contribute
    * nothing (the path still gets the presence guard via
    * leadingLaxPredKey where its own rules allow); flipped
    * literal-first spellings normalize by flipping the operator.
    */
  def leadingLaxPredCmp(path: String)
      : Seq[(String, String, Either[java.math.BigDecimal, String])] =
    try {
      val p = parse(path)
      if (!p.lax) Nil
      else {
        def singleKey(e: Expr): Option[String] = e match {
          case Chain(Root, Key(k) :: Nil) => Some(k)
          case _ => None
        }
        def leaf(pr: Pred) = pr match {
          case Cmp(op, l, r) =>
            singleKey(l).flatMap(k => cmpLitOf(r).map(v => (k, op, v)))
              .orElse(singleKey(r).flatMap(k =>
                cmpLitOf(l).map(v => (k, cmpFlip(op), v))))
          case StartsWith(e, Lit(JStr(s))) =>
            singleKey(e).map(k => (k, "startswith",
              Right(s): Either[java.math.BigDecimal, String]))
          case lr: LikeRegex =>
            // anchored-regex literal prefix: a TRUE match REQUIRES the
            // prefix (find() with ^ and no m-flag matches input start
            // only), so the startswith pushdown is a sound conjunct
            singleKey(lr.e).flatMap(k =>
              regexLiteralPrefix(lr.pattern, lr.flags).map(p =>
                (k, "startswith",
                  Right(p): Either[java.math.BigDecimal, String])))
          case _ => None
        }
        p.expr match {
          case pr: Pred => andSpine(pr, leaf)
          case _ => Nil
        }
      }
    } catch { case _: Throwable => Nil }

  /** The EXISTS twin of leadingLaxPredCmp: a LAX non-predicate path of
    * the shape `$.k ? (pred) …` — leading member step, then a filter
    * whose AND-spine leaves compare the BARE current item against
    * scalar literals (either operand order; `starts with` included).
    * Any remaining steps after the filter only shrink the result, so
    * for a non-empty `jsonb_path_exists` the filter must have passed —
    * under a uniformly-shredded key each leaf is exactly `__pn_k OP
    * lit` (resp. `__ps_k`): necessary, and strictly subsuming the
    * presence guard (NULL fails every comparison). `@ > 5 && @ < 10`
    * pushes BOTH bounds — parquet prunes the row-group range.
    * Predicates on `@.b` (a member under the item) contribute nothing
    * — the item is then an object and the typed sidecar cannot exist,
    * but the proof is cleaner stated at the shape level.
    */
  def leadingLaxFilterCmp(path: String)
      : Seq[(String, String, Either[java.math.BigDecimal, String])] =
    try {
      val p = parse(path)
      if (!p.lax) Nil
      else {
        def isBareCur(e: Expr): Boolean = e match {
          case Current => true
          case Chain(Current, Nil) => true
          case _ => false
        }
        p.expr match {
          case Chain(Root, Key(k) :: Filter(pred) :: _) =>
            def leaf(pr: Pred) = pr match {
              case Cmp(op, l, r) if isBareCur(l) =>
                cmpLitOf(r).map(v => (k, op, v))
              case Cmp(op, l, r) if isBareCur(r) =>
                cmpLitOf(l).map(v => (k, cmpFlip(op), v))
              case StartsWith(e, Lit(JStr(s))) if isBareCur(e) =>
                Some((k, "startswith",
                  Right(s): Either[java.math.BigDecimal, String]))
              case lr: LikeRegex if isBareCur(lr.e) =>
                regexLiteralPrefix(lr.pattern, lr.flags).map(p =>
                  (k, "startswith",
                    Right(p): Either[java.math.BigDecimal, String]))
              case _ => None
            }
            andSpine(pred, leaf)
          case _ => Nil
        }
      }
    } catch { case _: Throwable => Nil }
}
