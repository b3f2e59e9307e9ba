package graft

import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{FilterEval, SegmentQl}

/** Randomized semantic-equivalence property for the SegmentQL dialect:
  * any filter tree compile() accepts must, after the wire round-trip
  * (render → parse against the schema), evaluate IDENTICALLY under SQL
  * 3VL on arbitrary rows — including null-laden ones. This is stronger
  * than a text fixpoint: a parser that re-types a literal wrongly, or a
  * renderer that loses an escape, changes some row's verdict and fails
  * here even when the statement text looks plausible. Seeded generation
  * — deterministic across runs. */
class SegmentQlPropertySpec extends AnyFunSuite {

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("grp", IntegerType),
    StructField("name", StringType), StructField("score", DoubleType),
    StructField("active", BooleanType), StructField("ts", TimestampType),
    // narrow/exact numeric families: a parser that keeps a Float's
    // "0.1" rendering as Double 0.1 (instead of re-typing to 0.1f)
    // drifts from the row's widened 0.100000001... and fails here
    StructField("ratio", FloatType),
    StructField("amt", DecimalType(38, 0))))

  private val rnd = new java.util.Random(20260815L)

  private val strings = Seq("alpha", "beta gamma", "x\"y", "a\\b", "",
    "line\nbreak", "tab\there", "ümlaut é", "50% off")
  private val tss = Seq("2024-01-02 03:04:05", "2025-06-07 08:09:10")
    .map(java.sql.Timestamp.valueOf)
  // decimal literals include values beyond Long range: toPlainString of
  // a scale-0 Decimal(38,0) must survive the wire (rawLit overflow path)
  private val decs = Seq("7", "12345", "-3", "123456789012345678901234567890",
    "-99999999999999999999999999999999999999")
    .map(new java.math.BigDecimal(_))

  private def literalFor(col: String): Any = col match {
    case "id" => java.lang.Long.valueOf(rnd.nextInt(100).toLong)
    case "grp" => java.lang.Integer.valueOf(rnd.nextInt(8))
    case "name" => strings(rnd.nextInt(strings.length))
    case "score" => java.lang.Double.valueOf(rnd.nextInt(400) / 4.0)
    case "active" => java.lang.Boolean.valueOf(rnd.nextBoolean())
    case "ts" => tss(rnd.nextInt(tss.length))
    // 0.1f-grid values: most are inexact floats whose shortest repr
    // re-parses as a DIFFERENT double than the widened float
    case "ratio" => java.lang.Float.valueOf(rnd.nextInt(1000) / 10.0f)
    case "amt" => decs(rnd.nextInt(decs.length))
  }

  private val cols =
    Seq("id", "grp", "name", "score", "active", "ts", "ratio", "amt")

  private def leaf(): Filter = {
    val c = cols(rnd.nextInt(cols.length))
    rnd.nextInt(9) match {
      case 0 => EqualTo(c, literalFor(c))
      case 1 => GreaterThan(c, literalFor(c))
      case 2 => GreaterThanOrEqual(c, literalFor(c))
      case 3 => LessThan(c, literalFor(c))
      case 4 => LessThanOrEqual(c, literalFor(c))
      case 5 => In(c, Array.fill(1 + rnd.nextInt(3))(literalFor(c)))
      case 6 => IsNotNull(c)
      case 7 => IsNull(c)
      case _ =>
        val frag = strings(rnd.nextInt(strings.length))
        rnd.nextInt(3) match {
          case 0 => StringStartsWith("name", frag)
          case 1 => StringEndsWith("name", frag)
          case _ => StringContains("name", frag)
        }
    }
  }

  private def tree(depth: Int): Filter =
    if (depth == 0 || rnd.nextInt(3) == 0) leaf()
    else rnd.nextInt(3) match {
      case 0 => And(tree(depth - 1), tree(depth - 1))
      case 1 => Or(tree(depth - 1), tree(depth - 1))
      case _ => Not(tree(depth - 1))
    }

  private def randomRow(): Array[Any] = Array[Any](
    if (rnd.nextInt(5) == 0) null else java.lang.Long.valueOf(rnd.nextInt(100).toLong),
    if (rnd.nextInt(5) == 0) null else java.lang.Integer.valueOf(rnd.nextInt(8)),
    if (rnd.nextInt(5) == 0) null else strings(rnd.nextInt(strings.length)),
    if (rnd.nextInt(5) == 0) null else java.lang.Double.valueOf(rnd.nextInt(400) / 4.0),
    if (rnd.nextInt(5) == 0) null else java.lang.Boolean.valueOf(rnd.nextBoolean()),
    if (rnd.nextInt(5) == 0) null else tss(rnd.nextInt(tss.length)),
    if (rnd.nextInt(5) == 0) null else java.lang.Float.valueOf(rnd.nextInt(1000) / 10.0f),
    if (rnd.nextInt(5) == 0) null else decs(rnd.nextInt(decs.length)))

  test("compiled filters survive the wire with identical 3VL on random rows") {
    var compiled = 0
    (1 to 300).foreach { _ =>
      val f = tree(3)
      SegmentQl.compile(f).foreach { stmt =>
        compiled += 1
        val back = SegmentQl.parse(stmt, schema)
        // text fixpoint: re-rendering the parsed tree is stable
        assert(SegmentQl.compile(back).isDefined, s"parsed tree declined: $stmt")
        (1 to 40).foreach { _ =>
          val row = randomRow()
          val a = FilterEval.eval3(f, schema, row)
          val b = FilterEval.eval3(back, schema, row)
          assert(a == b,
            s"3VL drift: $a vs $b\n  filter: $f\n  wire: $stmt\n  row: ${row.mkString(",")}")
        }
      }
    }
    // the generator must actually exercise the dialect, not decline away
    assert(compiled > 200, s"only $compiled/300 filters compiled")
  }

  test("statements the dialect declines never reach the wire (spot check)") {
    // every generated-and-declined case must be one of the DOCUMENTED
    // decline reasons, not an arbitrary hole
    (1 to 300).foreach { _ =>
      val f = tree(2)
      if (SegmentQl.compile(f).isEmpty) {
        def declinable(g: Filter): Boolean = g match {
          case StringStartsWith(_, p) => p.contains("%")
          case StringEndsWith(_, p) => p.contains("%")
          case StringContains(_, p) => p.contains("%")
          case In(_, vs) => vs.isEmpty || vs.contains(null)
          case EqualTo(_, null) => true
          case And(l, r) => declinable(l) || declinable(r)
          case Or(l, r) => declinable(l) || declinable(r)
          case Not(c) => declinable(c)
          case _ => false
        }
        assert(declinable(f), s"undocumented decline: $f")
      }
    }
  }
}
