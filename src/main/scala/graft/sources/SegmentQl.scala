package graft.sources

import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._

/** SegmentQL-shaped filter statements for REST pushdown.
  *
  * Reference: the Lytics backend does NOT restrict pushdown to URL
  * param equalities — it compiles the WHERE expression tree into a
  * FilterStatement and ships its rendered text to the ad-hoc
  * segment-scan API (`backends/lytics/generator.go:96-111` assigns
  * `ql.Filter = sel.Where.Expr`, `resultreader.go` sends
  * `client.PageAdHocSegment(m.Req.ql.String())`). This object is the
  * Spark-side equivalent: a bidirectional mapping between Spark DSv2
  * [[Filter]] trees and a filter-statement STRING a REST API applies
  * server-side.
  *
  * Dialect (the qlbridge FilterQL expression shape):
  * {{{
  *   expr    := "AND" "(" expr {"," expr} ")"
  *            | "OR"  "(" expr {"," expr} ")"
  *            | "NOT" "(" expr ")"
  *            | "EXISTS" ident
  *            | ident op literal
  *            | ident "IN" "(" literal {"," literal} ")"
  *            | ident "LIKE" string          -- % wildcards, edge-anchored
  *            | "*"                          -- match-all (generator.go filterAll)
  *   op      := "=" | "!=" | ">" | ">=" | "<" | "<="
  *   literal := number | "string" | true | false
  * }}}
  *
  * COMPILE is total-or-decline per conjunct: a filter whose shape or
  * literals the dialect can't carry returns None and stays a Spark
  * residual (the polyfill contract — never ship an approximation).
  * PARSE is the server half: it rebuilds the [[Filter]] tree with
  * literals coerced to the addressed column's declared type, so the
  * loopback ENFORCES the dialect ([[FilterEval.eval]] applies proper
  * 3VL) and a mis-compiled client gets wrong rows in its spec, not in
  * production. Unknown fields and malformed statements throw — the
  * server answers 400, a loud refusal.
  */
object SegmentQl {

  private val Ident = "^[A-Za-z_][A-Za-z0-9_.]*$".r

  private def identOk(a: String): Boolean =
    Ident.findFirstIn(a).isDefined &&
      !Set("and", "or", "not", "exists", "in", "like", "true", "false")
        .contains(a.toLowerCase)

  private def quote(s: String): String = {
    val sb = new StringBuilder("\"")
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\t' => sb.append("\\t")
      case c => sb.append(c)
    }
    sb.append('"').toString
  }

  /** Render one literal, or None for values the dialect can't carry. */
  private def lit(v: Any): Option[String] = v match {
    case null => None
    case s: String => Some(quote(s))
    case b: java.lang.Boolean => Some(b.toString)
    case n @ (_: java.lang.Byte | _: java.lang.Short | _: java.lang.Integer |
        _: java.lang.Long) => Some(n.toString)
    // non-finite doubles have no dialect literal (the parser would 400
    // on "Infinity"/"NaN") — decline, keeping total-or-decline honest
    case d: java.lang.Double if !d.isInfinite && !d.isNaN => Some(d.toString)
    case f: java.lang.Float if !f.isInfinite && !f.isNaN => Some(f.toString)
    case d: java.math.BigDecimal => Some(d.toPlainString)
    case d: scala.math.BigDecimal => Some(d.underlying.toPlainString)
    // temporal values ride as quoted text in the SAME rendering the
    // param path uses; the parser re-types them from the column
    case t: java.sql.Timestamp => Some(quote(LineCodec.render(t)))
    case i: java.time.Instant => Some(quote(LineCodec.render(i)))
    case d: java.sql.Date => Some(quote(LineCodec.render(d)))
    case d: java.time.LocalDate => Some(quote(LineCodec.render(d)))
    case dt: java.time.LocalDateTime => Some(quote(LineCodec.render(dt)))
    case _ => None
  }

  /** Compile ONE top-level conjunct; None = decline (Spark polyfills). */
  def compile(f: Filter): Option[String] = f match {
    case EqualTo(a, v) if identOk(a) => lit(v).map(l => s"$a = $l")
    case GreaterThan(a, v) if identOk(a) => lit(v).map(l => s"$a > $l")
    case GreaterThanOrEqual(a, v) if identOk(a) => lit(v).map(l => s"$a >= $l")
    case LessThan(a, v) if identOk(a) => lit(v).map(l => s"$a < $l")
    case LessThanOrEqual(a, v) if identOk(a) => lit(v).map(l => s"$a <= $l")
    case In(a, vs) if identOk(a) && vs.nonEmpty =>
      val ls = vs.toSeq.map(lit)
      if (ls.forall(_.isDefined)) Some(s"$a IN (${ls.flatten.mkString(", ")})")
      else None // a NULL element has IN-specific 3VL the dialect skips
    case IsNotNull(a) if identOk(a) => Some(s"EXISTS $a")
    case IsNull(a) if identOk(a) => Some(s"NOT ( EXISTS $a )")
    // LIKE carries edge-anchored % wildcards only; a fragment containing
    // a literal % would be re-read as a wildcard — decline, don't mangle
    case StringStartsWith(a, p) if identOk(a) && !p.contains("%") =>
      Some(s"$a LIKE ${quote(p + "%")}")
    case StringEndsWith(a, p) if identOk(a) && !p.contains("%") =>
      Some(s"$a LIKE ${quote("%" + p)}")
    case StringContains(a, p) if identOk(a) && !p.contains("%") =>
      Some(s"$a LIKE ${quote("%" + p + "%")}")
    case Not(c) => compile(c).map(s => s"NOT ( $s )")
    case And(l, r) =>
      for (ls <- compile(l); rs <- compile(r)) yield s"AND ( $ls, $rs )"
    case Or(l, r) =>
      for (ls <- compile(l); rs <- compile(r)) yield s"OR ( $ls, $rs )"
    case _: AlwaysTrue => Some("*")
    case _ => None // EqualNullSafe, AlwaysFalse, anything newer
  }

  /** Render accepted conjuncts as one statement. */
  def render(conjuncts: Seq[String]): String = conjuncts match {
    case Seq(one) => one
    case many => s"AND ( ${many.mkString(", ")} )"
  }

  // ---- server half: parse + type literals against the table schema ----

  private final class P(s: String, schema: StructType) {
    private var i = 0
    private def err(msg: String): Nothing =
      throw new IllegalArgumentException(s"filterql: $msg at ${i} in: $s")
    private def ws(): Unit = while (i < s.length && s.charAt(i).isWhitespace) i += 1
    private def peek: Char = if (i < s.length) s.charAt(i) else '\u0000'
    private def eat(c: Char): Unit = { ws(); if (peek != c) err(s"expected '$c'"); i += 1 }

    private def word(): String = {
      ws()
      val start = i
      while (i < s.length && (s.charAt(i).isLetterOrDigit ||
        s.charAt(i) == '_' || s.charAt(i) == '.')) i += 1
      if (i == start) err("expected identifier")
      s.substring(start, i)
    }

    private def str(): String = {
      ws()
      if (peek != '"') err("expected string")
      i += 1
      val sb = new StringBuilder
      while (i < s.length && s.charAt(i) != '"') {
        if (s.charAt(i) == '\\' && i + 1 < s.length) {
          i += 1
          s.charAt(i) match {
            case 'n' => sb.append('\n'); case 't' => sb.append('\t')
            case c => sb.append(c)
          }
        } else sb.append(s.charAt(i))
        i += 1
      }
      if (i >= s.length) err("unterminated string")
      i += 1
      sb.toString
    }

    /** Raw literal: Left(text from a quoted string) | Right(number/bool). */
    private def rawLit(): Either[String, Any] = {
      ws()
      if (peek == '"') Left(str())
      else {
        val start = i
        if (peek == '-' || peek == '+') i += 1
        while (i < s.length && (s.charAt(i).isLetterOrDigit ||
          s.charAt(i) == '.' || s.charAt(i) == '-' || s.charAt(i) == '+')) i += 1
        val tok = s.substring(start, i)
        if (tok.isEmpty) err("expected literal")
        tok.toLowerCase match {
          case "true" => Right(java.lang.Boolean.TRUE)
          case "false" => Right(java.lang.Boolean.FALSE)
          case t if t.matches("[+-]?\\d+") =>
            // digit strings beyond Long range (a scale-0 Decimal rendered
            // via toPlainString) must still parse — the total-or-decline
            // contract says everything compile() emits the server accepts
            try Right(java.lang.Long.valueOf(t))
            catch { case _: NumberFormatException => Right(new java.math.BigDecimal(t)) }
          case t =>
            try Right(java.lang.Double.valueOf(t))
            catch { case _: NumberFormatException => err(s"bad literal '$tok'") }
        }
      }
    }

    private def fieldType(name: String): DataType = {
      val parts = name.split('.')
      var dt: DataType = schema
      parts.foreach { p =>
        dt match {
          case st: StructType =>
            val j = st.fieldNames.indexWhere(_.equalsIgnoreCase(p))
            if (j < 0) err(s"unknown field '$name'")
            dt = st.fields(j).dataType
          case _ => err(s"unknown field '$name'")
        }
      }
      dt
    }

    /** Literal coerced to the addressed column's declared type: quoted
      * text re-types through the same [[LineCodec.parse]] the param
      * path uses; bare numerics re-type to the column's numeric family.
      * Spark pushes DSv2 literals already cast to the column type, so a
      * bare token is that type's own toString rendering — a Float
      * rendered "0.1" must come back as 0.1f, NOT Double 0.1: their
      * widened values differ (0.1 vs 0.100000001...) and an uncoerced
      * parse would silently drop boundary/equality matches with no
      * Spark residual to save the day. */
    private def typedLit(field: String): Any = {
      val dt = fieldType(field)
      rawLit() match {
        case Left(text) => dt match {
          case StringType => text
          case other => LineCodec.parse(text, other)
        }
        case Right(n: Number) => dt match {
          case FloatType => java.lang.Float.valueOf(n.floatValue())
          case DoubleType => java.lang.Double.valueOf(n.doubleValue())
          case _: DecimalType => n match {
            case bd: java.math.BigDecimal => bd
            case l: java.lang.Long => java.math.BigDecimal.valueOf(l.longValue())
            case d: java.lang.Double => new java.math.BigDecimal(d.toString)
            case other => other
          }
          case _ => n // integral families: Long compares exactly
        }
        case Right(v) => v
      }
    }

    private def list(f: String): Array[Any] = {
      eat('(')
      val out = Seq.newBuilder[Any]
      out += typedLit(f)
      ws()
      while (peek == ',') { i += 1; out += typedLit(f); ws() }
      eat(')')
      out.result().toArray
    }

    private def args(): Seq[Filter] = {
      eat('(')
      val out = Seq.newBuilder[Filter]
      out += expr()
      ws()
      while (peek == ',') { i += 1; out += expr(); ws() }
      eat(')')
      out.result()
    }

    /** Edge-anchored LIKE pattern → the Spark string filter it came
      * from; any other wildcard shape is outside the dialect. */
    private def like(f: String, pat: String): Filter = {
      if (fieldType(f) != StringType) err(s"LIKE on non-string field '$f'")
      val lead = pat.startsWith("%")
      val trail = pat.endsWith("%") && pat.length > (if (lead) 1 else 0)
      val core = pat.stripPrefix("%").stripSuffix("%")
      if (core.contains("%")) err(s"unsupported LIKE pattern '$pat'")
      (lead, trail) match {
        case (true, true) => StringContains(f, core)
        case (true, false) => StringEndsWith(f, core)
        case (false, true) => StringStartsWith(f, core)
        case (false, false) => EqualTo(f, core)
      }
    }

    def expr(): Filter = {
      ws()
      if (peek == '*') { i += 1; return AlwaysTrue() }
      val w = word()
      w.toLowerCase match {
        case "and" => args().reduceLeft[Filter](And(_, _))
        case "or" => args().reduceLeft[Filter](Or(_, _))
        case "not" => { eat('('); val c = expr(); eat(')'); Not(c) }
        case "exists" =>
          val f = word()
          fieldType(f) // unknown field must 400, not silently never-match
          IsNotNull(f)
        case _ =>
          if (!identOk(w)) err(s"bad field '$w'")
          ws()
          // multi-char ops first
          if (s.startsWith(">=", i)) { i += 2; GreaterThanOrEqual(w, typedLit(w)) }
          else if (s.startsWith("<=", i)) { i += 2; LessThanOrEqual(w, typedLit(w)) }
          else if (s.startsWith("!=", i)) { i += 2; Not(EqualTo(w, typedLit(w))) }
          else if (peek == '=') { i += 1; EqualTo(w, typedLit(w)) }
          else if (peek == '>') { i += 1; GreaterThan(w, typedLit(w)) }
          else if (peek == '<') { i += 1; LessThan(w, typedLit(w)) }
          else {
            val kw = word().toLowerCase
            kw match {
              case "in" =>
                fieldType(w)
                In(w, list(w))
              case "like" => like(w, str())
              case other => err(s"expected operator, got '$other'")
            }
          }
      }
    }

    def parseAll(): Filter = {
      val e = expr()
      ws()
      if (i != s.length) err("trailing input")
      e
    }
  }

  /** Parse a statement back into a typed [[Filter]] tree (server side).
    * Throws IllegalArgumentException on malformed input or unknown
    * fields — the endpoint answers 400. */
  def parse(statement: String, schema: StructType): Filter =
    new P(statement, schema).parseAll()
}
