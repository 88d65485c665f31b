package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.plans.HttpBody

/** HTTP response-message triage (plans.HttpBody): status line, header
  * block, and the three body framings (Content-Length / chunked /
  * read-to-end). Pins: framing equivalence (identical body from all
  * three modes), chunked grammar details (extensions, trailers,
  * multi-chunk reassembly), content-type parameter stripping, the
  * lying-length decline, and the truncation law. */
class HttpSpec extends AnyFunSuite {

  private def parse(b: Array[Byte]) = HttpBody.parse(b)
  private def body(r: org.apache.spark.sql.catalyst.InternalRow): Array[Byte] =
    r.getBinary(2)

  test("all three framings reassemble the identical body") {
    val payload = (0 until 500).map(i => s"w$i").mkString(" ").getBytes("UTF-8")
    for (mode <- 0 to 2; seed <- Seq(3L, 77L, 999L)) {
      val msg = HttpBody.wrap(seed, 200, "text/html; charset=utf-8", payload, mode)
      val r = parse(msg)
      assert(r != null, s"mode=$mode seed=$seed")
      assert(r.getInt(0) === 200)
      // parameters after ';' dropped, lowercased — the routing key
      assert(r.getUTF8String(1).toString === "text/html")
      assert(body(r).toSeq === payload.toSeq, s"mode=$mode body diverged")
    }
  }

  test("chunked grammar: multi-chunk, extension, trailer, hex case") {
    val msg = ("HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n" +
      "4;ext=1\r\nab, \r\nA\r\n0123456789\r\n0\r\nX-T: v\r\n\r\n")
      .getBytes("ISO-8859-1")
    val r = parse(msg)
    assert(r != null)
    assert(new String(body(r), "ISO-8859-1") === "ab, 0123456789")
  }

  test("declines and honest edges") {
    def dies(s: String): Unit =
      assert(parse(s.getBytes("ISO-8859-1")) == null, s.take(40))
    // malformed status lines
    dies("HTP/1.1 200 OK\r\n\r\nbody")
    dies("HTTP/1.1 20 OK\r\n\r\nbody")
    dies("HTTP/1.1 200OK\r\n\r\nbody")
    // header without a colon
    dies("HTTP/1.1 200 OK\r\nBadHeader\r\n\r\nbody")
    // lying Content-Length (claims more than available)
    dies("HTTP/1.1 200 OK\r\nContent-Length: 99\r\n\r\nshort")
    // chunk framing: bad hex, missing chunk CRLF, missing terminator
    dies("HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\nzz\r\nab\r\n0\r\n\r\n")
    dies("HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n2\r\nabX0\r\n\r\n")
    dies("HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n2\r\nab\r\n")
    // Content-Length SHORTER than available: the claim wins (the WARC
    // record may carry trailing bytes beyond the entity)
    val r = parse("HTTP/1.1 200 OK\r\nContent-Length: 4\r\n\r\nbodyEXTRA".getBytes)
    assert(r != null && new String(body(r)) === "body")
    // 404 with no Content-Type: type NULL, status honest
    val nf = parse("HTTP/1.1 404 Not Found\r\n\r\ngone".getBytes)
    assert(nf != null && nf.getInt(0) === 404 && nf.isNullAt(1))
    // truncation law over a chunked instance
    val full = HttpBody.wrap(7L, 200, "text/html", "x".repeat(300).getBytes, 1)
    (0 until full.length).foreach(i => parse(full.take(i)))
  }
}
