package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions for jsonb semantics (SURVEY §2.8, §4.3).
  *
  * Each expression is a thin codegen-capable shim over the static
  * [[JsonbRT]] runtime: `doGenCode` emits one static call, so plans
  * containing these stay inside whole-stage codegen.
  */
object ops {
  val RT = "graft.expr.JsonbRT"

  /** jsonb x jsonb -> jsonb binary ops. */
  case class JsonbBinary(op: String, left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = StringType
    override def nullable: Boolean = true
    override def prettyName: String = s"jsonb_$op"

    @transient private lazy val fn: (UTF8String, UTF8String) => UTF8String =
      op match {
        case "add"    => JsonbRT.add
        case "sub"    => JsonbRT.sub
        case "mul"    => JsonbRT.mul
        case "div"    => JsonbRT.div
        case "mod"    => JsonbRT.mod
        case "pow"    => JsonbRT.pow
        case "concat" => JsonbRT.concat
        case "get"    => JsonbRT.get
        case "delete" => JsonbRT.deleteKey
        case "delpath" => JsonbRT.deletePath
        case "getpath" => JsonbRT.getPathJ
        case "getpathtext" => JsonbRT.getPathText
        case "objectkv" => JsonbRT.jsonbObject2
      }

    override def nullSafeEval(l: Any, r: Any): Any =
      fn(l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val m = op match {
        case "delete"  => "deleteKey"
        case "delpath" => "deletePath"
        case "getpath" => "getPathJ"
        case "getpathtext" => "getPathText"
        case "objectkv" => "jsonbObject2"
        case o         => o
      }
      // result may be SQL NULL (e.g. `get` on a missing key) — a plain
      // defineCodeGen would write a null UTF8String marked non-null
      nullSafeCodeGen(ctx, ev, (l, r) =>
        s"""${ev.value} = $RT.$m($l, $r);
           |${ev.isNull} = ${ev.value} == null;
           |""".stripMargin)
    }

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** `jsonb - int`: array element delete by index (the reference's
    * jsonb_delete_idx overload).
    */
  case class JsonbDeleteIdx(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = StringType
    override def nullable: Boolean = true
    override def prettyName: String = "jsonb_delete"
    override def nullSafeEval(l: Any, r: Any): Any =
      JsonbRT.deleteIdx(l.asInstanceOf[UTF8String],
        r.asInstanceOf[Number].longValue)
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (l, r) =>
        s"""${ev.value} = $RT.deleteIdx($l, (long) $r);
           |${ev.isNull} = ${ev.value} == null;
           |""".stripMargin)
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** jsonb btree comparison returning SQL bool with 3VL nulls. */
  case class JsonbComparison(op: String, left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = BooleanType
    override def nullable: Boolean = true
    override def prettyName: String = s"jsonb_$op"

    private def decide(c: Int): Boolean = op match {
      case "eq" => c == 0
      case "ne" => c != 0
      case "lt" => c < 0
      case "le" => c <= 0
      case "gt" => c > 0
      case "ge" => c >= 0
    }

    override def nullSafeEval(l: Any, r: Any): Any =
      decide(JsonbRT.cmp(l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String]))

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val cmpOp = op match {
        case "eq" => "=="; case "ne" => "!="; case "lt" => "<"
        case "le" => "<="; case "gt" => ">"; case "ge" => ">="
      }
      defineCodeGen(ctx, ev, (l, r) => s"($RT.cmp($l, $r) $cmpOp 0)")
    }

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** jsonb @> containment / ? existence. */
  case class JsonbPredicate(op: String, left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = BooleanType
    override def nullable: Boolean = true
    override def prettyName: String = s"jsonb_$op"

    private def method: String = op match {
      case "contains"  => "contains"
      case "exists"    => "existsKey"
      case "existsany" => "existsAny"
      case "existsall" => "existsAll"
    }

    override def nullSafeEval(l: Any, r: Any): Any = {
      val lu = l.asInstanceOf[UTF8String]; val ru = r.asInstanceOf[UTF8String]
      op match {
        case "contains"  => JsonbRT.contains(lu, ru)
        case "exists"    => JsonbRT.existsKey(lu, ru)
        case "existsany" => JsonbRT.existsAny(lu, ru)
        case "existsall" => JsonbRT.existsAll(lu, ru)
      }
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (l, r) => s"$RT.$method($l, $r)")

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** jsonb -> jsonb unary ops (also covers text<->jsonb casts whose
    * output is a string column).
    */
  case class JsonbUnary(op: String, child: Expression)
      extends UnaryExpression {
    override def dataType: DataType = StringType
    override def nullable: Boolean = true
    override def prettyName: String = s"jsonb_$op"

    @transient private lazy val fn: UTF8String => UTF8String = op match {
      case "uminus"    => JsonbRT.uminus
      case "uplus"     => JsonbRT.uplus
      case "astext"    => JsonbRT.asText
      case "fromtext"  => JsonbRT.fromText
      case "keys"      => JsonbRT.keys
      case "head"      => JsonbRT.head
      case "last"      => JsonbRT.last
      case "tail"      => JsonbRT.tail
      case "toboolean" => JsonbRT.cypherToBoolean
      case "tostring"  => JsonbRT.cypherToString
      case "arrdistinct" => JsonbRT.arrayDistinct
      case "arrsum"    => JsonbRT.arraySum
      case "arravg"    => JsonbRT.arrayAvg
      case "arrmin"    => JsonbRT.arrayMin
      case "arrmax"    => JsonbRT.arrayMax
      case "strip_nulls" => JsonbRT.stripNullsJ
      case "pretty"    => JsonbRT.prettyJ
      case "typeof"    => JsonbRT.typeofJ
      case "assert_elements_array" => JsonbRT.assertElementsArray
      case "object1"   => JsonbRT.jsonbObject1
    }

    override def nullSafeEval(x: Any): Any = fn(x.asInstanceOf[UTF8String])

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val m = op match {
        case "astext" => "asText"; case "fromtext" => "fromText"
        case "toboolean" => "cypherToBoolean"; case "tostring" => "cypherToString"
        case "arrdistinct" => "arrayDistinct"; case "arrsum" => "arraySum"
        case "arravg" => "arrayAvg"; case "arrmin" => "arrayMin"
        case "arrmax" => "arrayMax"
        case "strip_nulls" => "stripNullsJ"; case "pretty" => "prettyJ"
        case "typeof" => "typeofJ"
        case "assert_elements_array" => "assertElementsArray"
        case "object1" => "jsonbObject1"
        case o => o
      }
      nullSafeCodeGen(ctx, ev, x =>
        s"""${ev.value} = $RT.$m($x);
           |${ev.isNull} = ${ev.value} == null;
           |""".stripMargin)
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** jsonb -> primitive casts. */
  case class JsonbCast(to: String, child: Expression) extends UnaryExpression {
    override def dataType: DataType = to match {
      case "bool"   => BooleanType
      case "double" => DoubleType
      case "long"   => LongType
    }
    override def nullable: Boolean = true
    override def prettyName: String = s"jsonb_to_$to"

    override def nullSafeEval(x: Any): Any = to match {
      case "bool"   => JsonbRT.toBool(x.asInstanceOf[UTF8String])
      case "double" => JsonbRT.asDouble(x.asInstanceOf[UTF8String])
      case "long"   => JsonbRT.asLong(x.asInstanceOf[UTF8String])
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val m = to match {
        case "bool" => "toBool"; case "double" => "asDouble"; case "long" => "asLong"
      }
      // boxed results: unwrap with a null check
      val jt = to match {
        case "bool" => "Boolean"; case "double" => "Double"; case "long" => "Long"
      }
      nullSafeCodeGen(ctx, ev, x => {
        s"""java.lang.$jt tmp_${ev.value} = $RT.$m($x);
           |if (tmp_${ev.value} == null) { ${ev.isNull} = true; }
           |else { ${ev.value} = tmp_${ev.value}.${to match {
                case "bool" => "booleanValue"
                case "double" => "doubleValue"
                case "long" => "longValue"}}(); }
           |""".stripMargin
      })
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** jsonb type rank (sort-key component for jsonb btree ORDER BY). */
  case class JsonbTypeRank(child: Expression) extends UnaryExpression {
    override def dataType: DataType = IntegerType
    override def nullable: Boolean = true
    override def prettyName: String = "jsonb_type_rank"
    override def nullSafeEval(x: Any): Any =
      JsonbRT.typeRank(x.asInstanceOf[UTF8String])
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, x => s"$RT.typeRank($x)")
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** jsonb length() -> long (string/array/object). */
  case class JsonbLength(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nullable: Boolean = true
    override def prettyName: String = "jsonb_length"

    override def nullSafeEval(x: Any): Any = {
      val r = JsonbRT.length(x.asInstanceOf[UTF8String])
      if (r == null) null else r.longValue
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, x =>
        s"""java.lang.Long tmp_${ev.value} = $RT.length($x);
           |if (tmp_${ev.value} == null) { ${ev.isNull} = true; }
           |else { ${ev.value} = tmp_${ev.value}.longValue(); }
           |""".stripMargin)

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** primitive -> jsonb number/bool render. */
  case class JsonbFromPrim(from: String, child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    override def nullable: Boolean = true
    override def prettyName: String = s"jsonb_from_$from"

    override def nullSafeEval(x: Any): Any = from match {
      case "long"   => JsonbRT.fromLong(x.asInstanceOf[Long])
      case "double" => JsonbRT.fromDouble(x.asInstanceOf[Double])
      case "bool"   => JsonbRT.fromBool(x.asInstanceOf[Boolean])
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val m = from match {
        case "long" => "fromLong"; case "double" => "fromDouble"; case "bool" => "fromBool"
      }
      defineCodeGen(ctx, ev, x => s"$RT.$m($x)")
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** List slice l[a..b]; open bounds are SQL NULLs (so cannot use
    * null-intolerant TernaryExpression defaults).
    */
  case class JsonbSlice(list: Expression, from: Expression, to: Expression)
      extends Expression {
    override def children: Seq[Expression] = Seq(list, from, to)
    override def dataType: DataType = StringType
    override def nullable: Boolean = true
    override def prettyName: String = "jsonb_slice"
    override lazy val deterministic: Boolean = true

    override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
      val l = list.eval(input)
      if (l == null) return null
      val f = from.eval(input)
      val t = to.eval(input)
      JsonbRT.slice(l.asInstanceOf[UTF8String],
        f.asInstanceOf[UTF8String], t.asInstanceOf[UTF8String])
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val lg = list.genCode(ctx); val fg = from.genCode(ctx); val tg = to.genCode(ctx)
      val code =
        s"""${lg.code}
           |boolean ${ev.isNull} = true;
           |UTF8String ${ev.value} = null;
           |if (!${lg.isNull}) {
           |  ${fg.code}
           |  ${tg.code}
           |  ${ev.value} = $RT.slice(${lg.value},
           |    ${fg.isNull} ? (UTF8String) null : ${fg.value},
           |    ${tg.isNull} ? (UTF8String) null : ${tg.value});
           |  ${ev.isNull} = ${ev.value} == null;
           |}
           |""".stripMargin
      ev.copy(code = org.apache.spark.sql.catalyst.expressions.codegen.Block
        .BlockHelper(new StringContext(code)).code())
    }

    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): Expression =
      copy(list = newChildren(0), from = newChildren(1), to = newChildren(2))
  }

  /** SET n.k = v / REMOVE n.k — SQL-NULL value deletes the key. */
  case class JsonbSetKey(obj: Expression, key: Expression, value: Expression)
      extends Expression {
    override def children: Seq[Expression] = Seq(obj, key, value)
    override def dataType: DataType = StringType
    override def nullable: Boolean = true
    override def prettyName: String = "jsonb_set_key"
    override lazy val deterministic: Boolean = true

    override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
      val o = obj.eval(input)
      if (o == null) return null
      val k = key.eval(input)
      if (k == null) return o
      JsonbRT.setKey(o.asInstanceOf[UTF8String], k.asInstanceOf[UTF8String],
        value.eval(input).asInstanceOf[UTF8String])
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val og = obj.genCode(ctx); val kg = key.genCode(ctx); val vg = value.genCode(ctx)
      val code =
        s"""${og.code}
           |boolean ${ev.isNull} = true;
           |UTF8String ${ev.value} = null;
           |if (!${og.isNull}) {
           |  ${kg.code}
           |  if (${kg.isNull}) { ${ev.value} = ${og.value}; ${ev.isNull} = false; }
           |  else {
           |    ${vg.code}
           |    ${ev.value} = $RT.setKey(${og.value}, ${kg.value},
           |      ${vg.isNull} ? (UTF8String) null : ${vg.value});
           |    ${ev.isNull} = false;
           |  }
           |}
           |""".stripMargin
      ev.copy(code = org.apache.spark.sql.catalyst.expressions.codegen.Block
        .BlockHelper(new StringContext(code)).code())
    }

    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): Expression =
      copy(obj = newChildren(0), key = newChildren(1), value = newChildren(2))
  }

  /** SRF analogs returning explode-able arrays directly as ArrayData
    * (no intermediate jsonb array round-trip): jsonb_each ({"key",
    * "value"} objects), jsonb_object_keys (text keys),
    * jsonb_array_elements_text (text elements, JSON null -> SQL NULL
    * element). Reference: jsonfuncs.c each_worker_jsonb /
    * jsonb_object_keys / elements_worker_jsonb.
    */
  case class JsonbSrfArray(op: String, child: Expression)
      extends UnaryExpression {
    override def dataType: DataType =
      ArrayType(StringType, containsNull = op == "array_elements_text")
    override def nullable: Boolean = true
    override def prettyName: String = s"jsonb_$op"
    private def method: String = op match {
      case "each"                => "eachRows"
      case "each_text"           => "eachTextRows"
      case "object_keys"         => "objectKeysRows"
      case "array_elements_text" => "arrayElementsText"
    }
    override def nullSafeEval(x: Any): Any = op match {
      case "each"        => JsonbRT.eachRows(x.asInstanceOf[UTF8String])
      case "each_text"   => JsonbRT.eachTextRows(x.asInstanceOf[UTF8String])
      case "object_keys" => JsonbRT.objectKeysRows(x.asInstanceOf[UTF8String])
      case "array_elements_text" =>
        JsonbRT.arrayElementsText(x.asInstanceOf[UTF8String])
    }
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, x =>
        s"""${ev.value} = $RT.$method($x);
           |${ev.isNull} = ${ev.value} == null;
           |""".stripMargin)
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** jsonb_array_length (jsonfuncs.c; errors on non-arrays). */
  case class JsonbArrayLength(child: Expression) extends UnaryExpression {
    override def dataType: DataType = IntegerType
    override def nullable: Boolean = true
    override def prettyName: String = "jsonb_array_length"
    override def nullSafeEval(x: Any): Any =
      JsonbRT.arrayLengthJ(x.asInstanceOf[UTF8String])
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, x => s"$RT.arrayLengthJ($x)")
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** jsonb_extract_path(_text): variadic key form of `#>`; STRICT on
    * the document, a SQL NULL key yields NULL (the reference's strict
    * call convention gives the same observable result).
    */
  case class JsonbExtractPath(text: Boolean, children: Seq[Expression])
      extends Expression {
    override def dataType: DataType = StringType
    override def nullable: Boolean = true
    override def prettyName: String =
      if (text) "jsonb_extract_path_text" else "jsonb_extract_path"
    override lazy val deterministic: Boolean = true

    override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
      val doc = children.head.eval(input)
      if (doc == null) return null
      val keys = children.tail.map(_.eval(input).asInstanceOf[UTF8String]).toArray
      JsonbRT.extractPath(doc.asInstanceOf[UTF8String], keys, text)
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val dg = children.head.genCode(ctx)
      val kgs = children.tail.map(_.genCode(ctx))
      val arr = ctx.freshName("jpKeys")
      val fill = kgs.zipWithIndex.map { case (kg, i) =>
        s"""${kg.code}
           |$arr[$i] = ${kg.isNull} ? null : ${kg.value};""".stripMargin
      }.mkString("\n")
      val code =
        s"""${dg.code}
           |boolean ${ev.isNull} = true;
           |UTF8String ${ev.value} = null;
           |if (!${dg.isNull}) {
           |  UTF8String[] $arr = new UTF8String[${kgs.length}];
           |  $fill
           |  ${ev.value} = $RT.extractPath(${dg.value}, $arr, $text);
           |  ${ev.isNull} = ${ev.value} == null;
           |}
           |""".stripMargin
      ev.copy(code = org.apache.spark.sql.catalyst.expressions.codegen.Block
        .BlockHelper(new StringContext(code)).code())
    }

    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): Expression =
      copy(children = newChildren)
  }

  /** to_jsonb(anyelement) and the value half of jsonb_build_*: any
    * Spark value -> jsonb text. STRICT (SQL NULL -> NULL). The child's
    * DataType rides into codegen as a reference object.
    */
  case class ToJsonbValue(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    override def nullable: Boolean = true
    override def prettyName: String = "to_jsonb"
    override def nullSafeEval(x: Any): Any =
      JsonbRT.toJsonbValue(x, child.dataType)
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val dtRef = ctx.addReferenceObj("toJsonbDt", child.dataType,
        "org.apache.spark.sql.types.DataType")
      nullSafeCodeGen(ctx, ev, x =>
        s"""${ev.value} = $RT.toJsonbValue($x, $dtRef);
           |${ev.isNull} = ${ev.value} == null;
           |""".stripMargin)
    }
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** The key half of jsonb_build_object: NOT null-safe on purpose —
    * a SQL NULL key must raise the reference's error, not propagate.
    */
  case class JsonbKeyText(child: Expression, argPos: Int)
      extends UnaryExpression {
    override def dataType: DataType = StringType
    override def nullable: Boolean = false
    override def prettyName: String = "jsonb_key_text"
    override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
      JsonbRT.keyText(child.eval(input), child.dataType, argPos)
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val dtRef = ctx.addReferenceObj("keyDt", child.dataType,
        "org.apache.spark.sql.types.DataType")
      val cg = child.genCode(ctx)
      val code =
        s"""${cg.code}
           |UTF8String ${ev.value} = $RT.keyText(
           |  ${cg.isNull} ? null : (Object) ${cg.value}, $dtRef, $argPos);
           |""".stripMargin
      ev.copy(code = org.apache.spark.sql.catalyst.expressions.codegen.Block
        .BlockHelper(new StringContext(code)).code(),
        isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
    }
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** jsonb_build_object / jsonb_build_array over pre-converted parts
    * (keys via JsonbKeyText, values via ToJsonbValue — the
    * registration layer wraps them). A SQL NULL value becomes jsonb
    * null; the result itself is never NULL.
    */
  case class JsonbBuild(obj: Boolean, children: Seq[Expression])
      extends Expression {
    override def dataType: DataType = StringType
    override def nullable: Boolean = false
    override def prettyName: String =
      if (obj) "jsonb_build_object" else "jsonb_build_array"
    override lazy val deterministic: Boolean = children.forall(_.deterministic)
    override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
      val parts = new Array[UTF8String](children.length)
      var i = 0
      while (i < children.length) {
        parts(i) = children(i).eval(input).asInstanceOf[UTF8String]
        i += 1
      }
      JsonbRT.buildFromParts(obj, parts)
    }
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val cgs = children.map(_.genCode(ctx))
      val arr = ctx.freshName("jbParts")
      val fill = cgs.zipWithIndex.map { case (cg, i) =>
        s"""${cg.code}
           |$arr[$i] = ${cg.isNull} ? (UTF8String) null : ${cg.value};""".stripMargin
      }.mkString("\n")
      val code =
        s"""UTF8String[] $arr = new UTF8String[${cgs.length}];
           |$fill
           |UTF8String ${ev.value} = $RT.buildFromParts($obj, $arr);
           |""".stripMargin
      ev.copy(code = org.apache.spark.sql.catalyst.expressions.codegen.Block
        .BlockHelper(new StringContext(code)).code(),
        isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
    }
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): Expression =
      copy(children = newChildren)
  }

  /** jsonb_set / jsonb_insert / jsonb_set_lax (jsonfuncs.c setPath).
    * Children are normalized to (target, path, new, flag[, treatment])
    * by the registration layer. set/insert are strict (any SQL NULL
    * argument -> NULL, like the reference's STRICT functions);
    * set_lax lets the NEW VALUE be NULL — that is its whole point —
    * and the treatment argument decides what a null value means.
    */
  case class JsonbMutateFunction(op: String, children: Seq[Expression])
      extends Expression {
    override def dataType: DataType = StringType
    override def nullable: Boolean = true
    override def prettyName: String = s"jsonb_$op"
    override lazy val deterministic: Boolean = true

    override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
      val t = children(0).eval(input)
      val path = children(1).eval(input)
      val nv = children(2).eval(input)
      val flag = children(3).eval(input)
      if (t == null || path == null || flag == null) return null
      val tu = t.asInstanceOf[UTF8String]
      val pu = path.asInstanceOf[UTF8String]
      val nu = nv.asInstanceOf[UTF8String]
      val f = flag.asInstanceOf[Boolean]
      op match {
        case "set" =>
          if (nu == null) null else JsonbRT.jsonbSet(tu, pu, nu, f)
        case "insert" =>
          if (nu == null) null else JsonbRT.jsonbInsert(tu, pu, nu, f)
        case "set_lax" =>
          val tr = children(4).eval(input)
          JsonbRT.jsonbSetLax(tu, pu, nu, f,
            if (tr == null) null else tr.asInstanceOf[UTF8String])
      }
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val tg = children(0).genCode(ctx); val pg = children(1).genCode(ctx)
      val ng = children(2).genCode(ctx); val fg = children(3).genCode(ctx)
      val lax = op == "set_lax"
      val trg = if (lax) children(4).genCode(ctx) else null
      val call =
        if (lax)
          // the explicit casts matter: when an argument is a NULL
          // literal its ExprCode value is the Java literal `null`, and
          // an uncast `cond ? null : null` ternary types as Object —
          // janino then finds no applicable method and the WHOLE
          // projection silently falls back to interpreter mode
          s"""$RT.jsonbSetLax(${tg.value}, ${pg.value},
             |  ${ng.isNull} ? (UTF8String) null : ${ng.value}, ${fg.value},
             |  ${trg.isNull} ? (UTF8String) null : ${trg.value})""".stripMargin
        else
          s"$RT.jsonb${if (op == "set") "Set" else "Insert"}(" +
            s"${tg.value}, ${pg.value}, ${ng.value}, ${fg.value})"
      val nullGuard =
        if (lax) s"!${tg.isNull} && !${pg.isNull} && !${fg.isNull}"
        else s"!${tg.isNull} && !${pg.isNull} && !${ng.isNull} && !${fg.isNull}"
      val code =
        s"""${tg.code}
           |${pg.code}
           |${ng.code}
           |${fg.code}
           |${if (lax) trg.code else ""}
           |boolean ${ev.isNull} = true;
           |UTF8String ${ev.value} = null;
           |if ($nullGuard) {
           |  ${ev.value} = $call;
           |  ${ev.isNull} = ${ev.value} == null;
           |}
           |""".stripMargin
      ev.copy(code = org.apache.spark.sql.catalyst.expressions.codegen.Block
        .BlockHelper(new StringContext(code)).code())
    }

    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): Expression =
      copy(children = newChildren)
  }

  /** SQL/JSON path functions (reference: jsonb_path_exists/match/
    * query_array/query_first and the `_tz` variants, jsonpath_exec.c).
    * Children are always (doc, path, vars, silent) — the registration
    * layer pads optional arguments; `vars` may be SQL NULL (no
    * variables), `silent` defaults false like the reference's SQL
    * signatures. exists/match return boolean, the query forms jsonb
    * text. SQL NULL on doc or path yields NULL.
    */
  case class JsonbPathFunction(op: String, tz: Boolean,
      children: Seq[Expression]) extends Expression {
    private def boolOut = op == "exists" || op == "match"
    // query_rows is the SRF row form: one jsonb text per result item,
    // ready for explode() (a result item is never a SQL NULL — JSON
    // null renders as "null")
    private def rowsOut = op == "query_rows"
    override def dataType: DataType =
      if (boolOut) BooleanType
      else if (rowsOut) ArrayType(StringType, containsNull = false)
      else StringType
    override def nullable: Boolean = true
    override def prettyName: String =
      (if (rowsOut) "jsonb_path_query" else s"jsonb_path_$op") +
        (if (tz) "_tz" else "")
    override lazy val deterministic: Boolean = true

    override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
      val doc = children(0).eval(input)
      val path = children(1).eval(input)
      if (doc == null || path == null) return null
      val vars = children(2).eval(input).asInstanceOf[UTF8String]
      val silentAny = children(3).eval(input)
      val silent = silentAny != null && silentAny.asInstanceOf[Boolean]
      val d = doc.asInstanceOf[UTF8String]; val p = path.asInstanceOf[UTF8String]
      op match {
        case "exists"      => JsonbRT.jsonpathExists(d, p, vars, silent, tz)
        case "match"       => JsonbRT.jsonpathMatch(d, p, vars, silent, tz)
        case "query_array" => JsonbRT.jsonpathQueryArray(d, p, vars, silent, tz)
        case "query_first" => JsonbRT.jsonpathQueryFirst(d, p, vars, silent, tz)
        case "query_rows"  => JsonbRT.jsonpathQueryRows(d, p, vars, silent, tz)
      }
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val dg = children(0).genCode(ctx); val pg = children(1).genCode(ctx)
      val vg = children(2).genCode(ctx); val sg = children(3).genCode(ctx)
      val m = op match {
        case "exists"      => "jsonpathExists"
        case "match"       => "jsonpathMatch"
        case "query_array" => "jsonpathQueryArray"
        case "query_first" => "jsonpathQueryFirst"
        case "query_rows"  => "jsonpathQueryRows"
      }
      val vty =
        if (boolOut) "boolean"
        else if (rowsOut) "org.apache.spark.sql.catalyst.util.ArrayData"
        else "UTF8String"
      val (jty, dflt) =
        if (boolOut) ("java.lang.Boolean", "false") else (vty, "null")
      val tmp = ctx.freshName("jpRes")
      val code =
        s"""${dg.code}
           |${pg.code}
           |boolean ${ev.isNull} = true;
           |$vty ${ev.value} = $dflt;
           |if (!${dg.isNull} && !${pg.isNull}) {
           |  ${vg.code}
           |  ${sg.code}
           |  $jty $tmp = $RT.$m(${dg.value}, ${pg.value},
           |    ${vg.isNull} ? (UTF8String) null : ${vg.value},
           |    ${sg.isNull} ? false : ${sg.value}, $tz);
           |  ${ev.isNull} = $tmp == null;
           |  if ($tmp != null) ${ev.value} = $tmp${if (boolOut) ".booleanValue()" else ""};
           |}
           |""".stripMargin
      ev.copy(code = org.apache.spark.sql.catalyst.expressions.codegen.Block
        .BlockHelper(new StringContext(code)).code())
    }

    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): Expression =
      copy(children = newChildren)
  }
}

/** Column-level API over the jsonb expressions. */
object J {
  import ops._
  private def e(c: Column): Expression = ColumnBridge.expression(c)
  private def col(x: Expression): Column = ColumnBridge.column(x)

  def lit(json: String): Column =
    col(Literal(UTF8String.fromString(graft.jsonb.Jsonb.parse(json).render), StringType))

  // SQL/JSON path over a jsonb column; path/vars are compile-time strings
  private def pathCall(op: String, doc: Column, path: String,
      vars: String): Column = {
    val varsLit =
      if (vars == null) Literal(null, StringType)
      else Literal(UTF8String.fromString(graft.jsonb.Jsonb.parse(vars).render), StringType)
    col(JsonbPathFunction(op, tz = false, Seq(e(doc),
      Literal(UTF8String.fromString(path), StringType), varsLit,
      Literal(false))))
  }
  def pathExists(doc: Column, path: String, vars: String = null): Column =
    pathCall("exists", doc, path, vars)
  def pathMatch(doc: Column, path: String, vars: String = null): Column =
    pathCall("match", doc, path, vars)
  def pathQueryArray(doc: Column, path: String, vars: String = null): Column =
    pathCall("query_array", doc, path, vars)
  def pathQueryFirst(doc: Column, path: String, vars: String = null): Column =
    pathCall("query_first", doc, path, vars)
  /** jsonb_path_query's SRF row form: array of per-item jsonb text,
    * ready for explode().
    */
  def pathQueryRows(doc: Column, path: String, vars: String = null): Column =
    pathCall("query_rows", doc, path, vars)
  /** jsonb_each_text's SRF analog: array of {"key","value"} objects
    * with TEXT values (JSON null -> SQL NULL through ->>).
    */
  def eachText(x: Column): Column = col(JsonbSrfArray("each_text", e(x)))
  /** jsonb_build_object over (literal key, any-typed value) pairs. */
  def buildObject(pairs: (String, Column)*): Column =
    col(JsonbBuild(obj = true, pairs.toSeq.flatMap { case (k, v) =>
      Seq(
        JsonbKeyText(Literal(UTF8String.fromString(k), StringType), 1),
        ToJsonbValue(e(v)))
    }))

  def add(l: Column, r: Column): Column = col(JsonbBinary("add", e(l), e(r)))
  def sub(l: Column, r: Column): Column = col(JsonbBinary("sub", e(l), e(r)))
  def mul(l: Column, r: Column): Column = col(JsonbBinary("mul", e(l), e(r)))
  def div(l: Column, r: Column): Column = col(JsonbBinary("div", e(l), e(r)))
  def mod(l: Column, r: Column): Column = col(JsonbBinary("mod", e(l), e(r)))
  def pow(l: Column, r: Column): Column = col(JsonbBinary("pow", e(l), e(r)))
  def concat(l: Column, r: Column): Column = col(JsonbBinary("concat", e(l), e(r)))
  def deleteKey(l: Column, r: Column): Column = col(JsonbBinary("delete", e(l), e(r)))
  def uminus(x: Column): Column = col(JsonbUnary("uminus", e(x)))
  def uplus(x: Column): Column = col(JsonbUnary("uplus", e(x)))

  def eq(l: Column, r: Column): Column = col(JsonbComparison("eq", e(l), e(r)))
  def ne(l: Column, r: Column): Column = col(JsonbComparison("ne", e(l), e(r)))
  def lt(l: Column, r: Column): Column = col(JsonbComparison("lt", e(l), e(r)))
  def le(l: Column, r: Column): Column = col(JsonbComparison("le", e(l), e(r)))
  def gt(l: Column, r: Column): Column = col(JsonbComparison("gt", e(l), e(r)))
  def ge(l: Column, r: Column): Column = col(JsonbComparison("ge", e(l), e(r)))

  def contains(l: Column, r: Column): Column = col(JsonbPredicate("contains", e(l), e(r)))
  def existsKey(l: Column, r: Column): Column = col(JsonbPredicate("exists", e(l), e(r)))

  /** property access n.k — key given as a plain string. */
  def getKey(l: Column, key: String): Column =
    col(JsonbBinary("get", e(l), Literal(UTF8String.fromString(
      graft.jsonb.JStr(key).render), StringType)))
  /** dynamic access l[expr] (expr is a jsonb string/number). */
  def getDyn(l: Column, k: Column): Column = col(JsonbBinary("get", e(l), e(k)))
  def slice(l: Column, from: Column, to: Column): Column =
    col(JsonbSlice(e(l), e(from), e(to)))
  def setKey(o: Column, k: Column, v: Column): Column =
    col(JsonbSetKey(e(o), e(k), e(v)))

  def sortKey(x: Column): Column = col(JsonbSortKey(e(x)))
  def asText(x: Column): Column = col(JsonbUnary("astext", e(x)))
  def fromText(x: Column): Column = col(JsonbUnary("fromtext", e(x)))
  def keysOf(x: Column): Column = col(JsonbUnary("keys", e(x)))
  def head(x: Column): Column = col(JsonbUnary("head", e(x)))
  def last(x: Column): Column = col(JsonbUnary("last", e(x)))
  def tail(x: Column): Column = col(JsonbUnary("tail", e(x)))
  def toBooleanFn(x: Column): Column = col(JsonbUnary("toboolean", e(x)))
  def toStringFn(x: Column): Column = col(JsonbUnary("tostring", e(x)))
  def arrDistinct(x: Column): Column = col(JsonbUnary("arrdistinct", e(x)))
  def arrSum(x: Column): Column = col(JsonbUnary("arrsum", e(x)))
  def arrAvg(x: Column): Column = col(JsonbUnary("arravg", e(x)))
  def arrMin(x: Column): Column = col(JsonbUnary("arrmin", e(x)))
  def arrMax(x: Column): Column = col(JsonbUnary("arrmax", e(x)))

  def fromLong(x: Column): Column = col(JsonbFromPrim("long", e(x.cast("long"))))
  def fromDouble(x: Column): Column = col(JsonbFromPrim("double", e(x.cast("double"))))
  def fromBool(x: Column): Column = col(JsonbFromPrim("bool", e(x)))

  def toBool(x: Column): Column = col(JsonbCast("bool", e(x)))
  def toDouble(x: Column): Column = col(JsonbCast("double", e(x)))
  def toLong(x: Column): Column = col(JsonbCast("long", e(x)))
  def lengthOf(x: Column): Column = col(JsonbLength(e(x)))
  def typeRank(x: Column): Column = col(JsonbTypeRank(e(x)))
}
