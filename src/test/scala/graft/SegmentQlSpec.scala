package graft

import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{FilterEval, SegmentQl}

/** The SegmentQL dialect: Spark Filter trees → filter-statement text →
  * (server side) typed Filter trees. Compile is total-or-decline; parse
  * is enforcing (unknown fields / malformed input throw). */
class SegmentQlSpec extends AnyFunSuite {

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("grp", IntegerType),
    StructField("name", StringType), StructField("score", DoubleType),
    StructField("active", BooleanType),
    StructField("ts", TimestampType), StructField("day", DateType)))

  private def roundTrip(f: Filter): Filter = {
    val s = SegmentQl.compile(f).getOrElse(fail(s"declined: $f"))
    SegmentQl.parse(s, schema)
  }

  test("comparisons, IN, EXISTS, LIKE shapes and boolean trees round-trip") {
    val cases: Seq[Filter] = Seq(
      EqualTo("id", 5L),
      GreaterThan("score", 1.5),
      GreaterThanOrEqual("grp", 3L),
      LessThan("id", 100L),
      LessThanOrEqual("score", 2.5),
      In("name", Array[Any]("a", "b")),
      IsNotNull("name"),
      StringStartsWith("name", "pre"),
      StringEndsWith("name", "suf"),
      StringContains("name", "mid"),
      Not(EqualTo("grp", 2L)),
      And(EqualTo("id", 1L), Or(GreaterThan("score", 0.5), EqualTo("name", "x"))),
      Or(In("grp", Array[Any](1L, 2L, 3L)), Not(StringContains("name", "z"))))
    cases.foreach { f =>
      val got = roundTrip(f)
      // numeric literal types may widen (Int → Long) but 3VL evaluation
      // must agree on every row — compare by rendered statement instead
      assert(SegmentQl.compile(got) == SegmentQl.compile(f),
        s"$f -> ${SegmentQl.compile(f).get} -> $got")
    }
  }

  test("IsNull renders as NOT(EXISTS) and parses back") {
    val s = SegmentQl.compile(IsNull("name")).get
    assert(s == "NOT ( EXISTS name )")
    assert(SegmentQl.parse(s, schema) == Not(IsNotNull("name")))
    // semantics agree: 3VL of Not(IsNotNull(f)) == IsNull(f) on any row
    val row: Array[Any] = Array(1L, 1, null, 1.0, true, null, null)
    assert(FilterEval.eval(Not(IsNotNull("name")), schema, row))
  }

  test("string escaping survives quotes, backslashes and newlines") {
    val nasty = "a\"b\\c\nd\te"
    val f = EqualTo("name", nasty)
    assert(roundTrip(f) == f)
  }

  test("temporal literals ride as quoted text and re-type from the column") {
    val ts = java.sql.Timestamp.valueOf("2024-03-04 05:06:07")
    val got = roundTrip(GreaterThanOrEqual("ts", ts))
    val gotV = got.asInstanceOf[GreaterThanOrEqual].value
    assert(FilterEval.eval(EqualTo("ts", gotV), schema,
      Array[Any](1L, 1, "n", 1.0, true, ts, null)),
      s"timestamp literal drifted: $gotV vs $ts")
    val day = java.sql.Date.valueOf("2024-03-04")
    val gotD = roundTrip(EqualTo("day", day)).asInstanceOf[EqualTo].value
    assert(FilterEval.eval(EqualTo("day", gotD), schema,
      Array[Any](1L, 1, "n", 1.0, true, null, day)))
  }

  test("declines: null literals, literal %, null IN element, EqualNullSafe") {
    assert(SegmentQl.compile(EqualTo("name", null)).isEmpty)
    assert(SegmentQl.compile(StringContains("name", "50%")).isEmpty)
    assert(SegmentQl.compile(In("name", Array[Any]("a", null))).isEmpty)
    assert(SegmentQl.compile(EqualNullSafe("name", "x")).isEmpty)
    // a conjunct containing ANY undeclinable leaf declines whole
    assert(SegmentQl.compile(And(EqualTo("id", 1L),
      StringContains("name", "50%"))).isEmpty)
  }

  test("match-all: AlwaysTrue renders the reference's filterAll star") {
    assert(SegmentQl.compile(AlwaysTrue()).contains("*"))
    assert(SegmentQl.parse("*", schema) == AlwaysTrue())
  }

  test("parse enforces: unknown field, bad syntax, wild LIKE all throw") {
    def bad(s: String): Unit =
      intercept[IllegalArgumentException](SegmentQl.parse(s, schema))
    bad("nope = 5")                 // unknown field
    bad("AND ( id = 1, nope > 2 )") // unknown field in a tree
    bad("id = ")                    // missing literal
    bad("id == 5")                  // bad operator
    bad("AND ( id = 1")             // unbalanced
    bad("""name LIKE "a%b%c"""")    // interior wildcard
    bad("""score LIKE "x%"""")      // LIKE on a non-string column
    bad("id = 5 trailing")          // trailing junk
    bad("""EXISTS nope""")          // EXISTS must type-check the field
  }

  test("whitespace is insignificant: spaces before commas and parens parse") {
    assert(SegmentQl.parse("AND ( id = 1 , grp = 2 )", schema) ==
      And(EqualTo("id", 1L), EqualTo("grp", 2L)))
    // In holds an Array (reference equality) — compare by re-rendering
    assert(SegmentQl.compile(SegmentQl.parse("id IN ( 1 , 2 , 3 )", schema)) ==
      SegmentQl.compile(SegmentQl.parse("id IN (1,2,3)", schema)))
    assert(SegmentQl.parse("OR ( id = 1 ,\n\tgrp = 2 )", schema) ==
      Or(EqualTo("id", 1L), EqualTo("grp", 2L)))
  }

  test("non-finite double literals decline at compile (the parser rejects them)") {
    assert(SegmentQl.compile(EqualTo("score", Double.PositiveInfinity)).isEmpty)
    assert(SegmentQl.compile(GreaterThan("score", Double.NaN)).isEmpty)
    assert(SegmentQl.compile(LessThan("score", Float.NegativeInfinity)).isEmpty)
    assert(SegmentQl.compile(EqualTo("score", 1.5)).isDefined)
  }

  test("parsed trees evaluate with SQL 3VL (null never flips under NOT)") {
    val f = SegmentQl.parse("""NOT ( name = "x" )""", schema)
    val nullRow: Array[Any] = Array(1L, 1, null, 1.0, true, null, null)
    val yRow: Array[Any] = Array(2L, 1, "y", 1.0, true, null, null)
    val xRow: Array[Any] = Array(3L, 1, "x", 1.0, true, null, null)
    assert(!FilterEval.eval(f, schema, nullRow), "NULL must stay UNKNOWN, not true")
    assert(FilterEval.eval(f, schema, yRow))
    assert(!FilterEval.eval(f, schema, xRow))
  }

  test("dotted paths address nested struct fields") {
    val nested = StructType(Seq(StructField("meta", StructType(Seq(
      StructField("region", StringType))))))
    val f = SegmentQl.parse("""meta.region = "emea"""", nested)
    assert(f == EqualTo("meta.region", "emea"))
    intercept[IllegalArgumentException](SegmentQl.parse("meta.nope = 1", nested))
  }
}
