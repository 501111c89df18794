package graft.cypher

import graft.jsonb._
import java.math.{BigDecimal => JBigDecimal}
import scala.collection.mutable.ArrayBuffer

/** Recursive-descent parser for the Cypher surface of SURVEY §2
  * (clauses, patterns, expressions incl. list comprehension, slices,
  * hex/octal literals, parameters). Grammar shape follows the language
  * the reference accepts (gram.y Cypher rules) — written from scratch.
  */
object Parser {
  def parse(input: String): Ast.Query = {
    val (toks, starts) = Lexer.tokenizeWithStarts(input)
    new Parser(toks, starts, input).parseQuery()
  }

  /** Parse a standalone expression (constraint bodies etc.). */
  def parseExpression(input: String): Ast.Expr = {
    val (toks, starts) = Lexer.tokenizeWithStarts(input)
    new Parser(toks, starts, input).parseExpr()
  }

  // ------------------------------------------------------------- lexer
  sealed trait Tok
  final case class TId(s: String) extends Tok
  final case class TStr(cooked: String, raw: String) extends Tok
  final case class TNum(v: JBigDecimal) extends Tok
  final case class TParam(name: String) extends Tok
  final case class TSym(s: String) extends Tok
  case object TEnd extends Tok

  object Lexer {
    def tokenize(s: String): Vector[Tok] = tokenizeWithStarts(s)._1

    /** Tokens plus each token's start offset in the source — the
      * offsets let the parser lift VERBATIM source spans (the
      * (SELECT ...) sublink body must reach the SQL engine untouched:
      * re-rendering Cypher tokens would turn "ident" into a string
      * literal and split multi-char SQL operators).
      */
    def tokenizeWithStarts(s: String): (Vector[Tok], Vector[Int]) = {
      val out = new ArrayBuffer[Tok]()
      val starts = new ArrayBuffer[Int]()
      var i = 0
      while (i < s.length) {
        val tokStart = i
        i = step(s, i, out)
        while (starts.length < out.length) starts += tokStart
      }
      out += TEnd
      starts += s.length
      (out.toVector, starts.toVector)
    }

    /** Index just past the ')' matching the '(' at `open`, scanning
      * with the REAL token rules (either-quote strings with doubled or
      * backslash escapes, backtick-quoted identifiers, line and flat
      * block comments) so no token class can hide a paren from the
      * depth count — hybrid sql() block extraction drives this
      * (api/CypherSession.scala). Stops AT the matching paren: text
      * beyond it (the enclosing SQL) is never lexed. Returns s.length
      * when unbalanced. Throws only on a token malformed INSIDE the
      * block — such a block cannot parse as Cypher either, so callers
      * treat a throw as "not a Cypher block".
      */
    def matchingParen(s: String, open: Int): Int = {
      require(open < s.length && s.charAt(open) == '(', "not at a '('")
      val toks = new ArrayBuffer[Tok]()
      var i = open + 1
      var depth = 1
      while (i < s.length && depth > 0) {
        toks.clear()
        i = step(s, i, toks)
        toks.headOption match {
          case Some(TSym("(")) => depth += 1
          case Some(TSym(")")) => depth -= 1
          case _ => ()
        }
      }
      i
    }

    /** Lex one token (or skip one whitespace/comment run) starting at
      * `from`: appends 0 or 1 tokens to `out` and returns the index
      * just past the consumed text. The single source of truth for
      * token boundaries — tokenizeWithStarts and matchingParen both
      * drive it, so the block scanner can never disagree with the
      * parser about where a token ends. */
    private def step(s: String, from: Int, out: ArrayBuffer[Tok]): Int = {
      var i = from
      def peek(k: Int = 0): Char = if (i + k < s.length) s.charAt(i + k) else '\u0000'
      locally {
        val c = s.charAt(i)
        if (c.isWhitespace) i += 1
        else if (c == '/' && peek(1) == '/') { while (i < s.length && s.charAt(i) != '\n') i += 1 }
        else if (c == '/' && peek(1) == '*') {
          i += 2
          while (i + 1 < s.length && !(s.charAt(i) == '*' && s.charAt(i + 1) == '/')) i += 1
          // clamp: an unterminated '/*' at end of input must not
          // overshoot s.length (matchingParen's contract returns
          // s.length when unbalanced; an overshoot breaks the hybrid
          // sql() scanner's substring arithmetic)
          i = math.min(i + 2, s.length)
        }
        else if (c == '\'' || c == '"') {
          val quote = c
          val cooked = new StringBuilder
          val raw = new StringBuilder
          i += 1
          var done = false
          while (!done) {
            if (i >= s.length) throw new IllegalArgumentException("unterminated string")
            val ch = s.charAt(i)
            if (ch == quote) {
              if (peek(1) == quote) { cooked += quote; raw += quote; raw += quote; i += 2 } // SQL-style doubled quote
              else { i += 1; done = true }
            } else if (ch == '\\') {
              val e = peek(1)
              raw += '\\'; raw += e
              e match {
                case 'n' => cooked += '\n'
                case 'r' => cooked += '\r'
                case 't' => cooked += '\t'
                case 'b' => cooked += '\b'
                case 'f' => cooked += '\f'
                case '\\' => cooked += '\\'
                case '\'' => cooked += '\''
                case '"' => cooked += '"'
                case '/' => cooked += '/'
                case 'u' =>
                  // surrogate validation per the reference lexer
                  // (scan.l:185,279 <xeu> state): a high surrogate
                  // must pair with an immediately following \u low
                  // surrogate; orphans error; code point zero errors
                  // (text cannot hold NUL). Non-hex digits raise the
                  // lexer's own error, never a raw NumberFormatException
                  // (graft.jsonb.Jsonb.hex4 — the repo's one \u parser)
                  def hex4(at: Int, err: String): Int =
                    graft.jsonb.Jsonb.hex4(s, at,
                      () => throw new IllegalArgumentException(err))
                  val ch = hex4(i + 2, "invalid Unicode escape")
                  val hex = s.substring(i + 2, i + 6)
                  raw ++= hex
                  i += 4
                  if (ch >= 0xD800 && ch <= 0xDBFF) {
                    if (i + 8 <= s.length && s.charAt(i + 2) == '\\' &&
                        s.charAt(i + 3) == 'u') {
                      val lo = hex4(i + 4, "invalid Unicode surrogate pair")
                      val hexLo = s.substring(i + 4, i + 8)
                      if (lo >= 0xDC00 && lo <= 0xDFFF) {
                        cooked += ch.toChar; cooked += lo.toChar
                        raw ++= "\\u"; raw ++= hexLo
                        i += 6
                      } else throw new IllegalArgumentException(
                        "invalid Unicode surrogate pair")
                    } else throw new IllegalArgumentException(
                      "invalid Unicode surrogate pair")
                  } else if (ch >= 0xDC00 && ch <= 0xDFFF)
                    throw new IllegalArgumentException(
                      "invalid Unicode surrogate pair")
                  else if (ch == 0)
                    throw new IllegalArgumentException(
                      "invalid Unicode escape value")
                  else cooked += ch.toChar
                case other => cooked += other
              }
              i += 2
            } else { cooked += ch; raw += ch; i += 1 }
          }
          out += TStr(cooked.toString, raw.toString)
        }
        else if (c == '`') { // quoted identifier
          val sb = new StringBuilder
          i += 1
          while (i < s.length && s.charAt(i) != '`') { sb += s.charAt(i); i += 1 }
          // unterminated backtick: consume to end WITHOUT overshooting
          // past s.length (matchingParen reports unbalanced as s.length)
          if (i < s.length) i += 1
          out += TId(sb.toString)
        }
        else if (c.isDigit) {
          if (c == '0' && (peek(1) == 'x' || peek(1) == 'X')) {
            i += 2
            val st = i
            while (i < s.length && isHex(s.charAt(i))) i += 1
            // lexer-owned diagnostics, never a raw NumberFormatException
            // (same rule as \u escapes): `0x` with no digits is a
            // syntax error; >63-bit magnitudes overflow the int8 the
            // reference lexes hex literals into
            if (i == st) throw new IllegalArgumentException(
              "invalid hexadecimal integer literal")
            val mag = new java.math.BigInteger(s.substring(st, i), 16)
            if (mag.bitLength > 63) throw new IllegalArgumentException(
              "hexadecimal integer literal out of range")
            out += TNum(new JBigDecimal(mag))
          } else if (c == '0' && peek(1) >= '0' && peek(1) <= '7') { // octal
            i += 1
            val st = i
            while (i < s.length && s.charAt(i) >= '0' && s.charAt(i) <= '7') i += 1
            val mag = new java.math.BigInteger(s.substring(st, i), 8)
            if (mag.bitLength > 63) throw new IllegalArgumentException(
              "octal integer literal out of range")
            out += TNum(new JBigDecimal(mag))
          } else {
            val st = i
            while (i < s.length && s.charAt(i).isDigit) i += 1
            // ".." must stay a range operator, not a float dot
            if (i < s.length && s.charAt(i) == '.' && peek(1).isDigit) {
              i += 1
              while (i < s.length && s.charAt(i).isDigit) i += 1
            }
            if (i < s.length && (s.charAt(i) == 'e' || s.charAt(i) == 'E') &&
                (peek(1).isDigit || ((peek(1) == '+' || peek(1) == '-') && peek(2).isDigit))) {
              i += 1
              if (s.charAt(i) == '+' || s.charAt(i) == '-') i += 1
              while (i < s.length && s.charAt(i).isDigit) i += 1
            }
            out += TNum(new JBigDecimal(s.substring(st, i)))
          }
        }
        else if (c.isLetter || c == '_') {
          val st = i
          while (i < s.length && (s.charAt(i).isLetterOrDigit || s.charAt(i) == '_')) i += 1
          // PG folds unquoted identifiers to lowercase (labels, vars,
          // property keys — cypher_dml2.out:129-143 [:MARRIED] matches
          // :married); backquoted identifiers preserve case
          out += TId(s.substring(st, i).toLowerCase)
        }
        else if (c == '$') {
          i += 1
          val st = i
          while (i < s.length && (s.charAt(i).isLetterOrDigit || s.charAt(i) == '_')) i += 1
          out += TParam(s.substring(st, i))
        }
        else {
          val two = if (i + 1 < s.length) s.substring(i, i + 2) else ""
          two match {
            case "<=" | ">=" | "<>" | ".." | "+=" | "=~" | "->" | "<-" =>
              out += TSym(two); i += 2
            case "!=" => // PG-accepted spelling of <> (cypher_ddl.sql:292)
              out += TSym("<>"); i += 2
            case _ =>
              out += TSym(c.toString); i += 1
          }
        }
      }
      i
    }
    private def isHex(c: Char): Boolean =
      c.isDigit || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')
  }

  // ------------------------------------------------------------ parser
  final class Parser(toks: Vector[Tok], starts: Vector[Int] = Vector.empty,
      src: String = "") {
    import Ast._
    private var pos = 0

    private def cur: Tok = toks(pos)
    private def advance(): Tok = { val t = cur; pos += 1; t }
    private def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"syntax error: $msg (at token $pos: $cur)")

    private def isKw(t: Tok, kw: String): Boolean = t match {
      case TId(s) => s.equalsIgnoreCase(kw)
      case _      => false
    }
    private def atKw(kw: String): Boolean = isKw(cur, kw)
    private def eatKw(kw: String): Boolean = if (atKw(kw)) { pos += 1; true } else false
    private def expectKw(kw: String): Unit = if (!eatKw(kw)) fail(s"expected $kw")
    private def atSym(s: String): Boolean = cur == TSym(s)
    private def eatSym(s: String): Boolean = if (atSym(s)) { pos += 1; true } else false
    private def expectSym(s: String): Unit = if (!eatSym(s)) fail(s"expected '$s'")
    private def ident(): String = advance() match {
      case TId(s) => s
      case t      => fail(s"expected identifier, got $t")
    }

    // ----------------------------------------------------------- query
    def parseQuery(): Query = {
      val first = parseSingle()
      val ops = new ArrayBuffer[(String, SingleQuery)]()
      while (atKw("union") || atKw("intersect") || atKw("except")) {
        val op0 = ident().toLowerCase
        val op = if (op0 == "union" && eatKw("all")) "union all" else op0
        ops += ((op, parseSingle()))
      }
      cur match {
        case TEnd | TSym(";") => ()
        case t                => fail(s"unexpected trailing token $t")
      }
      Query(first, ops.toSeq)
    }

    private def parseSingle(): SingleQuery = {
      val clauses = new ArrayBuffer[Clause]()
      var done = false
      while (!done) {
        cur match {
          case t if isKw(t, "match") =>
            pos += 1; clauses += parseMatch(optional = false)
          case t if isKw(t, "optional") =>
            pos += 1; expectKw("match"); clauses += parseMatch(optional = true)
          case t if isKw(t, "unwind") =>
            pos += 1
            val e = parseExpr()
            expectKw("as")
            clauses += Unwind(e, ident())
          case t if isKw(t, "with") =>
            pos += 1; clauses += parseProjection(isReturn = false)
          case t if isKw(t, "return") =>
            pos += 1; clauses += parseProjection(isReturn = true)
          case t if isKw(t, "create") =>
            pos += 1; clauses += CreateClause(parsePatternList())
          case t if isKw(t, "delete") =>
            pos += 1; clauses += DeleteClause(parseExprList(), detach = false)
          case t if isKw(t, "detach") =>
            pos += 1; expectKw("delete")
            clauses += DeleteClause(parseExprList(), detach = true)
          case t if isKw(t, "set") =>
            pos += 1; clauses += SetClause(parseSetItems())
          case t if isKw(t, "remove") =>
            pos += 1
            val items = new ArrayBuffer[SetItem]()
            items += RemoveProp(parsePostfix())
            while (eatSym(",")) items += RemoveProp(parsePostfix())
            clauses += SetClause(items.toSeq)
          case t if isKw(t, "merge") =>
            pos += 1
            val path = parsePathPattern()
            var onCreate = Seq.empty[SetItem]
            var onMatch = Seq.empty[SetItem]
            while (atKw("on")) {
              pos += 1
              if (eatKw("create")) { expectKw("set"); onCreate = onCreate ++ parseSetItems() }
              else if (eatKw("match")) { expectKw("set"); onMatch = onMatch ++ parseSetItems() }
              else fail("expected CREATE or MATCH after ON")
            }
            clauses += MergeClause(path, onCreate, onMatch)
          case t if isKw(t, "load") =>
            pos += 1; expectKw("from")
            val table = ident()
            expectKw("as")
            clauses += LoadClause(table, ident())
          case _ => done = true
        }
      }
      if (clauses.isEmpty) fail("empty query")
      SingleQuery(clauses.toSeq)
    }

    private def parseMatch(optional: Boolean): Match = {
      val paths = parsePatternList()
      val where = if (eatKw("where")) Some(parseExpr()) else None
      Match(paths, optional, where)
    }

    private def parseProjection(isReturn: Boolean): Projection = {
      val distinct = eatKw("distinct")
      var star = false
      val items = new ArrayBuffer[(Expr, Option[String])]()
      if (atSym("*")) { pos += 1; star = true }
      else {
        items += parseProjItem()
        while (eatSym(",")) items += parseProjItem()
      }
      val orderBy = new ArrayBuffer[(Expr, Boolean)]()
      if (atKw("order")) {
        pos += 1; expectKw("by")
        do {
          val e = parseExpr()
          val asc =
            if (eatKw("desc") || eatKw("descending")) false
            else { eatKw("asc"); eatKw("ascending"); true }
          orderBy += ((e, asc))
        } while (eatSym(","))
      }
      val skip = if (eatKw("skip")) Some(parseExpr()) else None
      val limit = if (eatKw("limit")) Some(parseExpr()) else None
      val where = if (!isReturn && eatKw("where")) Some(parseExpr()) else None
      Projection(isReturn, distinct, items.toSeq, star, orderBy.toSeq, skip, limit, where)
    }

    private def parseProjItem(): (Expr, Option[String]) = {
      val e = parseExpr()
      val as = if (eatKw("as")) Some(ident()) else None
      (e, as)
    }

    private def parseExprList(): Seq[Expr] = {
      val out = new ArrayBuffer[Expr]()
      out += parseExpr()
      while (eatSym(",")) out += parseExpr()
      out.toSeq
    }

    private def parseSetItems(): Seq[SetItem] = {
      val out = new ArrayBuffer[SetItem]()
      def one(): SetItem = {
        // target is a postfix expression (var/prop/index) — a full
        // parseExpr would swallow the `=` as a comparison
        val target = parsePostfix()
        if (eatSym("=")) target match {
          case Vbl(n) => SetMap(n, parseExpr(), add = false)
          case p: Prop => SetProp(p, parseExpr())
          case i: Index => SetProp(i, parseExpr())
          case _ => fail("invalid SET target")
        }
        else if (eatSym("+=")) target match {
          case Vbl(n) => SetMap(n, parseExpr(), add = true)
          case _: Prop | _: Index => // cypher_dml.out:2339-2346
            throw new IllegalArgumentException(
              "+= operator on a property is not allowed")
          case _ => fail("invalid SET += target")
        }
        else fail("expected = or += in SET")
      }
      out += one()
      while (eatSym(",")) out += one()
      out.toSeq
    }

    // -------------------------------------------------------- patterns
    private def parsePatternList(): Seq[PathPattern] = {
      val out = new ArrayBuffer[PathPattern]()
      out += parsePathPattern()
      while (eatSym(",")) out += parsePathPattern()
      out.toSeq
    }

    def parsePathPattern(): PathPattern = {
      // p = pattern
      var variable: Option[String] = None
      (cur, toks(pos + 1)) match {
        case (TId(v), TSym("=")) if !isPathFinderKw(v) =>
          variable = Some(v); pos += 2
        case _ => ()
      }
      if (atKw("shortestpath") || atKw("allshortestpaths")) {
        val all = ident().equalsIgnoreCase("allshortestpaths")
        expectSym("(")
        val inner = parsePathPattern()
        expectSym(")")
        inner.copy(variable = variable,
          finder = if (all) PathFinder.AllShortest else PathFinder.Shortest)
      } else if (atKw("dijkstra")) {
        pos += 1
        expectSym("(")
        val inner = parsePathPattern()
        expectSym(",")
        val weight = parseExpr()
        // the reference spells qual and LIMIT as comma-separated args
        // (gram.y:18548-18623: dijkstra(chain, w), (chain, w, qual),
        // (chain, w, LIMIT n), (chain, w, qual, LIMIT n)); the WHERE
        // spelling is kept as an extension
        var qual: Option[Expr] = None
        var limit: Option[Long] = None
        def parseLimitValue(): Long = parseExpr() match {
          case Lit(JNum(n)) => n.longValue
          case _ => fail("dijkstra LIMIT must be a literal")
        }
        if (eatKw("where")) qual = Some(parseExpr())
        else if (eatSym(",")) {
          if (eatKw("limit")) limit = Some(parseLimitValue())
          else {
            qual = Some(parseExpr())
            if (eatSym(",")) { expectKw("limit"); limit = Some(parseLimitValue()) }
          }
        }
        if (limit.isEmpty && eatKw("limit")) limit = Some(parseLimitValue())
        expectSym(")")
        inner.copy(variable = variable,
          finder = PathFinder.Dijkstra(weight, qual, limit))
      } else {
        val head = parseNodePattern()
        val tail = new ArrayBuffer[(RelPattern, NodePattern)]()
        while (atSym("-") || atSym("<-") || atSym("<")) {
          val rel = parseRelPattern()
          val node = parseNodePattern()
          tail += ((rel, node))
        }
        PathPattern(variable, head, tail.toSeq)
      }
    }

    private def isPathFinderKw(s: String): Boolean =
      s.equalsIgnoreCase("shortestpath") || s.equalsIgnoreCase("allshortestpaths") ||
        s.equalsIgnoreCase("dijkstra")

    private def parseNodePattern(): NodePattern = {
      expectSym("(")
      var variable: Option[String] = None
      cur match {
        case TId(_) => variable = Some(ident())
        case _      => ()
      }
      var label: Option[String] = None
      var only = false
      if (eatSym(":")) {
        // legacy prefix form (:only lbl) kept as an extension; the
        // reference grammar is postfix — (n:lbl ONLY {props}),
        // gram.y:18643
        if (eatKw("only")) only = true
        label = Some(ident())
      }
      if (eatKw("only")) {
        if (label.isEmpty) fail("ONLY must have one label preceding it")
        only = true
      }
      val props =
        if (atSym("{")) Some(parseMapLiteral())
        else if (atSym("=")) { pos += 1; Some(parseExpr()) } // (:l =properties(a))
        else if (cur.isInstanceOf[TParam]) Some(parseAtom())
        else None
      expectSym(")")
      NodePattern(variable, label, only, props)
    }

    private def parseRelPattern(): RelPattern = {
      // <-[..]- | -[..]-> | -[..]-
      var direction = 0
      var leftArrow = false
      if (eatSym("<-")) leftArrow = true
      else if (eatSym("<")) { expectSym("-"); leftArrow = true }
      else expectSym("-")
      var variable: Option[String] = None
      var types: Seq[String] = Nil
      var varLength: Option[(Option[Long], Option[Long])] = None
      var props: Option[Expr] = None
      var only = false
      if (eatSym("[")) {
        cur match {
          case TId(_) => variable = Some(ident())
          case _      => ()
        }
        if (eatSym(":")) {
          val ts = new ArrayBuffer[String]()
          ts += ident()
          while (eatSym("|")) ts += ident()
          types = ts.toSeq
        }
        // postfix ONLY (gram.y:18684): exact label, no subtree —
        // before the varlen spec, errors without a type
        if (eatKw("only")) {
          if (types.isEmpty) fail("ONLY must have one label preceding it")
          only = true
        }
        if (eatSym("*")) {
          var lo: Option[Long] = None
          var hi: Option[Long] = None
          cur match {
            case TNum(n) => lo = Some(n.longValue); pos += 1
            case _       => ()
          }
          if (eatSym("..")) {
            cur match {
              case TNum(n) => hi = Some(n.longValue); pos += 1
              case _       => ()
            }
          } else hi = lo // *n means exactly n
          varLength = Some((lo, hi))
        }
        if (atSym("{")) props = Some(parseMapLiteral())
        else if (atSym("=")) { pos += 1; props = Some(parseExpr()) } // [:l =expr]
        else if (cur.isInstanceOf[TParam]) props = Some(parseAtom())
        expectSym("]")
      }
      if (leftArrow) { expectSym("-"); direction = -1 }
      else if (eatSym("->")) direction = 1
      else if (eatSym("-")) {
        if (eatSym(">")) direction = 1 else direction = 0
      } else fail("expected relationship tail")
      RelPattern(variable, types, direction, varLength, props, only)
    }

    // ----------------------------------------------------- expressions
    def parseExpr(): Expr = parseOr()

    private def parseOr(): Expr = {
      var l = parseXor()
      while (atKw("or")) { pos += 1; l = Or(l, parseXor()) }
      l
    }
    private def parseXor(): Expr = {
      var l = parseAnd()
      while (atKw("xor")) {
        pos += 1
        val r = parseAnd()
        l = And(Or(l, r), Not(And(l, r)))
      }
      l
    }
    private def parseAnd(): Expr = {
      var l = parseNot()
      while (atKw("and")) { pos += 1; l = And(l, parseNot()) }
      l
    }
    private def parseNot(): Expr =
      if (eatKw("not")) Not(parseNot()) else parseComparison()

    private def parseComparison(): Expr = {
      var l = parseAdditive()
      var done = false
      while (!done) {
        cur match {
          case TSym(op @ ("=" | "<>" | "<" | ">" | "<=" | ">=")) =>
            pos += 1
            l = Cmp(op, l, parseAdditive())
          case TSym("=~") =>
            pos += 1
            l = StrPred("regex", l, parseAdditive())
          case t if isKw(t, "is") =>
            pos += 1
            val neg = eatKw("not")
            expectKw("null")
            l = IsNull(l, neg)
          case t if isKw(t, "in") =>
            pos += 1
            l = InList(l, parseAdditive(), negated = false)
          case t if isKw(t, "starts") =>
            pos += 1; expectKw("with")
            l = StrPred("startswith", l, parseAdditive())
          case t if isKw(t, "ends") =>
            pos += 1; expectKw("with")
            l = StrPred("endswith", l, parseAdditive())
          case t if isKw(t, "contains") =>
            pos += 1
            l = StrPred("contains", l, parseAdditive())
          case _ => done = true
        }
      }
      l
    }

    private def parseAdditive(): Expr = {
      var l = parseMultiplicative()
      var done = false
      while (!done) {
        if (atSym("+")) { pos += 1; l = BinOp("+", l, parseMultiplicative()) }
        else if (atSym("-")) { pos += 1; l = BinOp("-", l, parseMultiplicative()) }
        else done = true
      }
      l
    }
    private def parseMultiplicative(): Expr = {
      var l = parsePower()
      var done = false
      while (!done) {
        if (atSym("*")) { pos += 1; l = BinOp("*", l, parsePower()) }
        else if (atSym("/")) { pos += 1; l = BinOp("/", l, parsePower()) }
        else if (atSym("%")) { pos += 1; l = BinOp("%", l, parsePower()) }
        else done = true
      }
      l
    }
    private def parsePower(): Expr = {
      val l = parseUnary()
      if (atSym("^")) { pos += 1; BinOp("^", l, parsePower()) } else l
    }
    private def parseUnary(): Expr =
      if (atSym("-")) { pos += 1; UnaryOp("-", parseUnary()) }
      else if (atSym("+")) { pos += 1; UnaryOp("+", parseUnary()) }
      else parsePostfix()

    private def parsePostfix(): Expr = {
      var e = parseAtom()
      var done = false
      while (!done) {
        if (atSym(".")) {
          pos += 1
          advance() match {
            case TId(k)     => e = Prop(e, k)
            case TStr(k, _) => e = Prop(e, k)
            case t          => fail(s"expected property name, got $t")
          }
        } else if (atSym("[")) {
          pos += 1
          // l[i], l[a..b], l[..b], l[a..], l[..]
          if (atSym("..")) {
            pos += 1
            val to = if (atSym("]")) None else Some(parseExpr())
            expectSym("]")
            e = Slice(e, None, to)
          } else {
            val idx = parseExpr()
            if (eatSym("..")) {
              val to = if (atSym("]")) None else Some(parseExpr())
              expectSym("]")
              e = Slice(e, Some(idx), to)
            } else {
              expectSym("]")
              e = Index(e, idx)
            }
          }
        } else done = true
      }
      e
    }

    private def num(v: JBigDecimal): Expr = Lit(JNum(v))

    private def parseAtom(): Expr = {
      cur match {
        case TNum(n)    => pos += 1; num(n)
        case TStr(s, _) => pos += 1; Lit(JStr(s))
        case TParam(n)  => pos += 1; Param(n)
        case TSym("(")  =>
          // (SELECT ...) = scalar SQL subquery primary (gram.y routes
          // parenthesized SELECT into a sublink; cypher_dml.sql:50-52).
          // The sublink body is lifted VERBATIM from the source (token
          // offsets bound the balanced span) — the SQL dialect must not
          // pass through the Cypher lexer's rendering, which would
          // lowercase identifiers, turn "ident" into a string literal,
          // and split multi-char SQL operators like ||.
          val isSelect = toks(pos + 1) match {
            case t: TId => isKw(t, "select")
            case _ => false
          }
          if (isSelect) {
            pos += 1
            val bodyStart = starts(pos)
            var depth = 0
            var done = false
            while (!done) {
              cur match {
                case TEnd => fail("unterminated (SELECT ...)")
                case TSym("(") => depth += 1; pos += 1
                case TSym(")") =>
                  if (depth == 0) done = true
                  else { depth -= 1; pos += 1 }
                case TParam(_) => fail("parameters are not supported inside (SELECT ...)")
                case _ => pos += 1
              }
            }
            val bodyEnd = starts(pos) // start of the closing ')'
            pos += 1
            Ast.SqlSubquery(src.substring(bodyStart, bodyEnd).trim)
          } else {
            pos += 1
            val e = parseExpr()
            expectSym(")")
            e
          }
        case TSym("[")  => parseListOrComprehension()
        case TSym("{")  => parseMapLiteral()
        case TSym("*")  => pos += 1; CountStar // only valid inside count(*)
        case t @ TId(name) =>
          if (isKw(t, "true")) { pos += 1; Lit(JBool(true)) }
          else if (isKw(t, "false")) { pos += 1; Lit(JBool(false)) }
          else if (isKw(t, "null")) { pos += 1; Lit(JNull) }
          else if (isKw(t, "case")) parseCase()
          else if (isKw(t, "exists") && toks(pos + 1) == TSym("(")) {
            pos += 2
            // exists((a)-[:t]->(b)) = pattern predicate; anything else
            // = property existence (n.prop IS NOT NULL). Backtrack if a
            // pattern parse fails or matches a bare parenthesized expr.
            val mark = pos
            val pattern: Option[PathPattern] =
              if (atSym("(")) {
                try {
                  val p = parsePathPattern()
                  if (p.tail.nonEmpty && atSym(")")) Some(p)
                  else { pos = mark; None }
                } catch { case _: Exception => pos = mark; None }
              } else None
            pattern match {
              case Some(p) =>
                expectSym(")")
                Ast.ExistsPattern(p)
              case None =>
                val e = parseExpr()
                expectSym(")")
                IsNull(e, negated = true) // exists(n.prop)
            }
          }
          else if (isKw(t, "size") && toks(pos + 1) == TSym("(")) {
            pos += 2
            // size((a)-[:t]->(b)) = pattern-match count
            // (cypher_dml.sql SIZE); anything else = list/string size.
            val mark = pos
            val pattern: Option[PathPattern] =
              if (atSym("(")) {
                try {
                  val p = parsePathPattern()
                  if (p.tail.nonEmpty && atSym(")")) Some(p)
                  else { pos = mark; None }
                } catch { case _: Exception => pos = mark; None }
              } else None
            pattern match {
              case Some(p) =>
                expectSym(")")
                Ast.SizePattern(p)
              case None =>
                val e = parseExpr()
                expectSym(")")
                FnCall("size", Seq(e))
            }
          }
          else if ((isKw(t, "all") || isKw(t, "any") || isKw(t, "none") ||
              isKw(t, "single")) && toks(pos + 1) == TSym("(")) {
            // all/any/none/single(x IN list WHERE pred) — cypher_dml2
            val op = name.toLowerCase
            pos += 2
            val v = ident()
            if (!eatKw("in")) fail("expected IN")
            val listE = parseExpr()
            if (!eatKw("where")) fail("expected WHERE")
            val w = parseExpr()
            expectSym(")")
            Ast.ListPred(op, v, listE, w)
          }
          else if ((isKw(t, "shortestpath") || isKw(t, "allshortestpaths")) &&
              toks(pos + 1) == TSym("(")) {
            val all = name.equalsIgnoreCase("allshortestpaths")
            pos += 2
            val p = parsePathPattern()
            expectSym(")")
            Ast.ShortestPathExpr(all, p)
          }
          else if (toks(pos + 1) == TSym("(")) { // function call
            pos += 2
            val distinct = eatKw("distinct")
            if (name.equalsIgnoreCase("count") && atSym("*")) {
              pos += 1
              expectSym(")")
              CountStar
            } else {
              val args = new ArrayBuffer[Expr]()
              if (!atSym(")")) {
                args += parseExpr()
                while (eatSym(",")) args += parseExpr()
              }
              expectSym(")")
              // edge_start_vertex/edge_end_vertex (graph.c:986,1002)
              // are the SQL-callable spellings of startnode/endnode
              val canonical = name.toLowerCase match {
                case "start_vertex" => "startnode"
                case "end_vertex"   => "endnode"
                case other => other
              }
              FnCall(canonical, args.toSeq, distinct)
            }
          }
          else { pos += 1; Vbl(name) }
        case t => fail(s"unexpected token $t")
      }
    }

    private def parseCase(): Expr = {
      expectKw("case")
      val operand = if (!atKw("when")) Some(parseExpr()) else None
      val whens = new ArrayBuffer[(Expr, Expr)]()
      while (eatKw("when")) {
        val w = parseExpr()
        expectKw("then")
        whens += ((w, parseExpr()))
      }
      val els = if (eatKw("else")) Some(parseExpr()) else None
      expectKw("end")
      CaseExpr(operand, whens.toSeq, els)
    }

    /** [1,2,3] or [x IN xs WHERE p | f] */
    private def parseListOrComprehension(): Expr = {
      expectSym("[")
      if (atSym("]")) { pos += 1; return ListExpr(Nil) }
      // lookahead: Id IN ...
      (cur, toks(pos + 1)) match {
        case (TId(v), t2) if isKw(t2, "in") && !isKw(cur, "true") && !isKw(cur, "false") && !isKw(cur, "null") =>
          pos += 2
          val list = parseExpr()
          val where = if (eatKw("where")) Some(parseExpr()) else None
          val proj = if (eatSym("|")) Some(parseExpr()) else None
          expectSym("]")
          ListComp(v, list, where, proj)
        case _ =>
          val items = new ArrayBuffer[Expr]()
          items += parseExpr()
          while (eatSym(",")) items += parseExpr()
          expectSym("]")
          ListExpr(items.toSeq)
      }
    }

    /** Map literal. Key quirk mirrored from the reference: quoted keys
      * keep their raw (unescaped) text, values are escape-processed
      * (cypher_expr.out map-literal case: key '\n' renders "\\n").
      */
    private def parseMapLiteral(): Expr = {
      expectSym("{")
      val fields = new ArrayBuffer[(String, Expr)]()
      if (!atSym("}")) {
        def one(): Unit = {
          val key = advance() match {
            case TId(k)       => k
            case TStr(_, raw) => raw
            case TNum(n)      => Jsonb.renderNum(n)
            case t            => fail(s"expected map key, got $t")
          }
          expectSym(":")
          fields += ((key, parseExpr()))
        }
        one()
        while (eatSym(",")) one()
      }
      expectSym("}")
      Ast.MapExpr(fields.toSeq)
    }
  }
}
