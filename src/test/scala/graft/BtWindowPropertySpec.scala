package graft

import org.scalatest.funsuite.AnyFunSuite

import com.fasterxml.jackson.databind.ObjectMapper

import graft.sources.BtQuery

/** Randomized protocol property for the BigTable windowed scan: for
  * arbitrary key universes, row sets (ranges or explicit keys), page
  * caps, window sizes and scan directions, the CLIENT resume loop
  * (requestJson with the last received key, re-select server-side,
  * re-cap) must drain to EXACTLY the window a one-shot evaluation of
  * the row set would produce — first n keys ascending forward, last n
  * keys descending reversed — regardless of where the per-response cap
  * slices the stream. This is the invariant the reversed-resume
  * contract (exclusive END at the last key) exists to preserve; an
  * off-by-one in either bound duplicates or drops a row at some page
  * boundary and fails here. Seeded generation — deterministic. */
class BtWindowPropertySpec extends AnyFunSuite {

  private val M = new ObjectMapper()
  private val rnd = new java.util.Random(20260816L)

  /** Simulated service: evaluate the request body over `rows`, cap the
    * response, report the resume key — the loopback's exact shape. */
  private def serve(body: String, rows: Seq[String], cap: Int)
      : (Seq[String], Boolean) = {
    val selected = BtQuery.select(M.readTree(body), r => r(0).asInstanceOf[String],
      rows.map(k => Array[Any](k)))
    val page = selected.take(cap)
    (page.map(_._1), selected.size > page.size)
  }

  /** The reader's drain loop (BtReaderFactory's shape): resume with the
    * last received key, subtract received from the remaining limit. */
  private def drain(rs: BtQuery.RowSet, rows: Seq[String], cap: Int,
      limit: Int, reversed: Boolean): Seq[String] = {
    var out = Vector.empty[String]
    var resume = ""
    var done = false
    var guard = 0
    while (!done && (limit < 0 || out.size < limit)) {
      guard += 1
      require(guard <= rows.size + 8, s"drain loop did not terminate: $out")
      val lim = if (limit > 0) limit - out.size else -1
      val body = BtQuery.requestJson(rs, lim, resume, reversed)
      val (page, more) = serve(body, rows, cap)
      if (page.isEmpty) done = true
      else {
        out ++= page
        resume = page.last
        if (!more) done = true
      }
    }
    out
  }

  /** Reference model: evaluate the row set directly, order, window. */
  private def model(rs: BtQuery.RowSet, rows: Seq[String], limit: Int,
      reversed: Boolean): Seq[String] = {
    val keys = rows.sorted
    val sel =
      if (rs.keys.nonEmpty) { val want = rs.keys.toSet; keys.filter(want) }
      else keys.filter(k => rs.ranges.exists { case (s, e) =>
        (s.isEmpty || k >= s) && (e.isEmpty || k < e)
      })
    val ordered = if (reversed) sel.reverse else sel
    if (limit > 0) ordered.take(limit) else ordered
  }

  private def randKey(): String = f"k${rnd.nextInt(500)}%04d"

  test("windowed drains equal the one-shot model at every page boundary") {
    for (_ <- 1 to 400) {
      val n = 1 + rnd.nextInt(60)
      val rows = Seq.fill(n)(randKey()).distinct
      val rs =
        if (rnd.nextBoolean()) {
          // 1-2 ranges, possibly unbounded on either side
          val ranges = (1 to (1 + rnd.nextInt(2))).map { _ =>
            val a = if (rnd.nextBoolean()) randKey() else ""
            val b = if (rnd.nextBoolean()) randKey() else ""
            if (a.nonEmpty && b.nonEmpty && a > b) (b, a) else (a, b)
          }
          BtQuery.RowSet(ranges, Nil)
        } else BtQuery.RowSet(Nil,
          Seq.fill(1 + rnd.nextInt(12))(randKey()).distinct)
      val cap = 1 + rnd.nextInt(7) // small caps force many resumes
      val limit = if (rnd.nextBoolean()) -1 else 1 + rnd.nextInt(20)
      val reversed = rnd.nextBoolean()
      val got = drain(rs, rows, cap, limit, reversed)
      val want = model(rs, rows, limit, reversed)
      assert(got == want,
        s"rs=$rs cap=$cap limit=$limit reversed=$reversed rows=${rows.sorted}")
    }
  }

  test("forward and reversed full drains are exact mirrors") {
    for (_ <- 1 to 100) {
      val rows = Seq.fill(1 + rnd.nextInt(40))(randKey()).distinct
      val rs = BtQuery.RowSet(Seq(("", "")), Nil)
      val cap = 1 + rnd.nextInt(5)
      val fwd = drain(rs, rows, cap, -1, reversed = false)
      val rev = drain(rs, rows, cap, -1, reversed = true)
      assert(fwd == rows.sorted && rev == fwd.reverse)
    }
  }
}
