package graft

import java.io.ByteArrayInputStream
import java.nio.charset.StandardCharsets.ISO_8859_1

import graft.io.Warc

/** [[graft.io.Warc]] — framing fixtures are hand-written byte
  * literals (never produced by a WARC library), per the repo's
  * fixture discipline; the HTTP payload paths (chunked, gzip,
  * deflate — both zlib-wrapped and raw) are each exercised against
  * hand-assembled wire bytes.
  */
class WarcSpec extends SparkSpec {

  private def b(s: String): Array[Byte] = s.getBytes(ISO_8859_1)

  private def parse(bytes: Array[Byte]): Seq[Warc.WarcRecord] =
    Warc.parseStream(new ByteArrayInputStream(bytes), "test.warc").toSeq

  // a hand-written three-record WARC: warcinfo, request, response
  private def threeRecords: Array[Byte] = {
    val info = "software: graft-test\r\n"
    val req = "GET /a HTTP/1.1\r\n\r\n"
    val http = "HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n" +
      "Content-Length: 11\r\n\r\nhello warc!"
    b("WARC/1.0\r\n" +
      "WARC-Type: warcinfo\r\n" +
      "WARC-Record-ID: <urn:test:1>\r\n" +
      "WARC-Date: 2026-08-14T00:00:00Z\r\n" +
      "Content-Type: application/warc-fields\r\n" +
      s"Content-Length: ${info.length}\r\n" +
      "\r\n" + info + "\r\n\r\n" +
      "WARC/1.0\r\n" +
      "WARC-Type: request\r\n" +
      "WARC-Record-ID: <urn:test:2>\r\n" +
      "WARC-Target-URI: http://ex.test/a\r\n" +
      "WARC-Date: 2026-08-14T00:00:01Z\r\n" +
      "Content-Type: application/http; msgtype=request\r\n" +
      s"Content-Length: ${req.length}\r\n" +
      "\r\n" + req + "\r\n\r\n" +
      "WARC/1.0\r\n" +
      "WARC-Type: response\r\n" +
      "WARC-Record-ID: <urn:test:3>\r\n" +
      "WARC-Target-URI: http://ex.test/a\r\n" +
      "WARC-Date: 2026-08-14T00:00:01Z\r\n" +
      "Content-Type: application/http; msgtype=response\r\n" +
      s"Content-Length: ${http.length}\r\n" +
      "\r\n" + http + "\r\n\r\n")
  }

  test("plain WARC: three records, fields and payloads golden") {
    val rs = parse(threeRecords)
    assert(rs.map(_.warc_type) === Seq("warcinfo", "request", "response"))
    assert(rs(0).record_id === "<urn:test:1>")
    assert(rs(0).target_uri === None)
    assert(new String(rs(0).payload, ISO_8859_1) === "software: graft-test\r\n")
    assert(rs(1).target_uri === Some("http://ex.test/a"))
    assert(rs(1).http_status === None) // requests keep the raw block
    assert(new String(rs(1).payload, ISO_8859_1) === "GET /a HTTP/1.1\r\n\r\n")
    assert(rs(2).http_status === Some(200))
    assert(rs(2).http_content_type === Some("text/plain"))
    assert(new String(rs(2).payload, ISO_8859_1) === "hello warc!")
    assert(rs(2).payload_encoding === None)
    assert(rs(2).content_length > 11) // the HTTP block, not the body
  }

  test("per-record gzip members concatenate into the same records") {
    val plain = threeRecords
    // split at the record boundaries and gzip each independently
    val parts = {
      val s = new String(plain, ISO_8859_1)
      val idx = s.indexOf("WARC/1.0", 1)
      val idx2 = s.indexOf("WARC/1.0", idx + 1)
      Seq(s.substring(0, idx), s.substring(idx, idx2), s.substring(idx2))
    }
    val gz = new java.io.ByteArrayOutputStream()
    parts.foreach { p =>
      val g = new java.util.zip.GZIPOutputStream(gz)
      g.write(b(p)); g.finish()
    }
    val rs = parse(gz.toByteArray)
    assert(rs.map(_.warc_type) === Seq("warcinfo", "request", "response"))
    assert(new String(rs(2).payload, ISO_8859_1) === "hello warc!")
  }

  private def responseRecord(httpBlock: String): Array[Byte] =
    b("WARC/1.0\r\n" +
      "WARC-Type: response\r\n" +
      "WARC-Record-ID: <urn:test:x>\r\n" +
      "WARC-Target-URI: http://ex.test/x\r\n" +
      "WARC-Date: 2026-08-14T00:00:02Z\r\n" +
      "Content-Type: application/http; msgtype=response\r\n" +
      s"Content-Length: ${httpBlock.length}\r\n" +
      "\r\n" + httpBlock + "\r\n\r\n")

  test("chunked transfer coding de-frames, with extension and trailers") {
    val http = "HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n" +
      "Transfer-Encoding: chunked\r\n\r\n" +
      "5;ext=1\r\nhello\r\n" +
      "6\r\n world\r\n" +
      "0\r\nTrailer-X: t\r\n\r\n"
    val rs = parse(responseRecord(http))
    assert(new String(rs.head.payload, ISO_8859_1) === "hello world")
  }

  test("Content-Encoding gzip and deflate (zlib and raw) decode") {
    def gz(s: String): Array[Byte] = {
      val o = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(o)
      g.write(b(s)); g.close(); o.toByteArray
    }
    def zlib(s: String, nowrap: Boolean): Array[Byte] = {
      val d = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION, nowrap)
      d.setInput(b(s)); d.finish()
      val o = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](1024)
      while (!d.finished()) o.write(buf, 0, d.deflate(buf))
      o.toByteArray
    }
    def rec(enc: String, wire: Array[Byte]): Array[Byte] = {
      val head = b("HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n" +
        s"Content-Encoding: $enc\r\nContent-Length: ${wire.length}\r\n\r\n")
      val block = new java.io.ByteArrayOutputStream()
      block.write(head); block.write(wire)
      val blockBytes = block.toByteArray
      val out = new java.io.ByteArrayOutputStream()
      out.write(b("WARC/1.0\r\nWARC-Type: response\r\n" +
        "WARC-Record-ID: <urn:test:y>\r\nWARC-Date: 2026-08-14T00:00:03Z\r\n" +
        "Content-Type: application/http; msgtype=response\r\n" +
        s"Content-Length: ${blockBytes.length}\r\n\r\n"))
      out.write(blockBytes); out.write(b("\r\n\r\n"))
      out.toByteArray
    }
    assert(new String(parse(rec("gzip", gz("zipped body"))).head.payload, ISO_8859_1) === "zipped body")
    assert(new String(parse(rec("deflate", zlib("zlib body", false))).head.payload, ISO_8859_1) === "zlib body")
    assert(new String(parse(rec("deflate", zlib("raw body", true))).head.payload, ISO_8859_1) === "raw body")
  }

  test("unknown content coding is surfaced for quarantine, not silently kept") {
    val wire = Array[Byte](1, 2, 3, 4, 5)
    val head = "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n" +
      "Content-Encoding: compress\r\nContent-Length: 5\r\n\r\n"
    val block = b(head) ++ wire
    val rec = b("WARC/1.0\r\nWARC-Type: response\r\n" +
      "WARC-Record-ID: <urn:test:lzw>\r\nWARC-Date: 2026-08-14T00:00:04Z\r\n" +
      "Content-Type: application/http; msgtype=response\r\n" +
      s"Content-Length: ${block.length}\r\n\r\n") ++ block ++ b("\r\n\r\n")
    val r = parse(rec).head
    assert(r.payload_encoding === Some("compress"))
    assert(r.payload.toSeq === wire.toSeq) // wire bytes kept, not dropped
    assert(r.http_status === Some(200))
    // identity coding is NOT residual
    val r2 = parse(responseRecord(
      "HTTP/1.1 200 OK\r\nContent-Encoding: identity\r\nContent-Length: 2\r\n\r\nok")).head
    assert(r2.payload_encoding === None)
    assert(new String(r2.payload, ISO_8859_1) === "ok")
  }

  test("Content-Encoding br decodes (round 12); malformed br fails loudly") {
    val raw = ("brotli coded response body " * 8).getBytes(ISO_8859_1)
    val wire = graft.ext.Brotli.encodeRaw(raw)
    def rec(body: Array[Byte]): Array[Byte] = {
      val head = "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n" +
        s"Content-Encoding: br\r\nContent-Length: ${body.length}\r\n\r\n"
      val block = b(head) ++ body
      b("WARC/1.0\r\nWARC-Type: response\r\n" +
        "WARC-Record-ID: <urn:test:br2>\r\nWARC-Date: 2026-08-14T00:00:05Z\r\n" +
        "Content-Type: application/http; msgtype=response\r\n" +
        s"Content-Length: ${block.length}\r\n\r\n") ++ block ++ b("\r\n\r\n")
    }
    val r = parse(rec(wire)).head
    assert(r.payload_encoding === None) // decoded, nothing residual
    assert(r.payload.toSeq === raw.toSeq)
    // a corrupted brotli body must fail the record loudly, not pass
    // garbage downstream
    assertThrows[Exception] { parse(rec(Array[Byte](1, 2, 3, 4, 5))) }
  }

  test("malformed HTTP payload header lines are data, not fatal") {
    val http = "HTTP/1.1 200 OK\r\nthis line has no colon\r\n" +
      "Content-Type: text/plain\r\nContent-Length: 2\r\n\r\nhi"
    val r = parse(responseRecord(http)).head
    assert(r.http_status === Some(200))
    assert(r.http_content_type === Some("text/plain"))
    assert(new String(r.payload, ISO_8859_1) === "hi")
    // WARC FRAMING headers stay strict: corruption there is fatal
    val bad = b("WARC/1.0\r\nno colon here\r\nContent-Length: 0\r\n\r\n\r\n\r\n")
    val e = intercept[IllegalArgumentException] { parse(bad) }
    assert(e.getMessage.contains("malformed header"))
  }

  test("header continuation lines fold; names are case-insensitive") {
    val http = "HTTP/1.1 404 Not Found\r\ncontent-type: text/html;\r\n" +
      " charset=utf-8\r\nCONTENT-LENGTH: 3\r\n\r\nnot"
    val rs = parse(responseRecord(http))
    assert(rs.head.http_status === Some(404))
    assert(rs.head.http_content_type === Some("text/html; charset=utf-8"))
    assert(new String(rs.head.payload, ISO_8859_1) === "not")
  }

  test("truncated content block fails loudly") {
    val whole = responseRecord("HTTP/1.1 200 OK\r\nContent-Length: 5\r\n\r\nhello")
    val cut = whole.take(whole.length - 12)
    val e = intercept[Exception] { parse(cut) }
    assert(e.getMessage.contains("EOF") || e.isInstanceOf[java.io.EOFException])
  }

  test("record without Content-Length fails loudly") {
    val bad = b("WARC/1.0\r\nWARC-Type: metadata\r\n\r\n")
    val e = intercept[IllegalArgumentException] { parse(bad) }
    assert(e.getMessage.contains("Content-Length"))
  }

  test("garbage leader fails loudly, empty stream yields no records") {
    assert(parse(Array.emptyByteArray).isEmpty)
    val e = intercept[IllegalArgumentException] { parse(b("NOT-A-WARC\r\n")) }
    assert(e.getMessage.contains("version line"))
  }

  test("payload digests: sink writes sha1 base32, reader verifies; corruption flags") {
    // known-answer base32 (RFC 4648 test vectors)
    assert(Warc.base32("".getBytes) === "")
    assert(Warc.base32("f".getBytes) === "MY")
    assert(Warc.base32("fo".getBytes) === "MZXQ")
    assert(Warc.base32("foo".getBytes) === "MZXW6")
    assert(Warc.base32("foobar".getBytes) === "MZXW6YTBOI")
    // hand-computed digest header over a known body
    val body = "digest me please!"
    val sha1 = java.security.MessageDigest.getInstance("SHA-1")
    val good = "sha1:" + Warc.base32(sha1.digest(b(body)))
    def rec(digest: String, payload: String): Array[Byte] = {
      val http = s"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n" +
        s"Content-Length: ${payload.length}\r\n\r\n$payload"
      b("WARC/1.0\r\nWARC-Type: response\r\n" +
        "WARC-Record-ID: <urn:test:dg>\r\nWARC-Date: 2026-08-14T00:00:05Z\r\n" +
        s"WARC-Payload-Digest: $digest\r\n" +
        "Content-Type: application/http; msgtype=response\r\n" +
        s"Content-Length: ${http.length}\r\n\r\n$http\r\n\r\n")
    }
    assert(parse(rec(good, body)).head.digest_ok === Some(true))
    assert(parse(rec(good, "tampered body here!")).head.digest_ok === Some(false))
    // canonical padded base32 (md5 pads with 6 '=') and hex encodings
    val md5d = java.security.MessageDigest.getInstance("MD5").digest(b(body))
    assert(parse(rec("md5:" + Warc.base32(md5d) + "======", body)).head.digest_ok === Some(true))
    val sha256d = java.security.MessageDigest.getInstance("SHA-256").digest(b(body))
    assert(parse(rec("sha256:" + sha256d.map(x => f"$x%02x").mkString, body)).head.digest_ok === Some(true))
    // unknown algorithm or unrecognized encoding makes no claim
    assert(parse(rec("blake3:XYZ", body)).head.digest_ok === Some(true))
    assert(parse(rec("sha1:!!!notbase32!!!", body)).head.digest_ok === Some(true))
    // non-response records: the digest covers a payload this reader
    // does not reconstruct - no claim, never a false quarantine
    val req = "GET /a HTTP/1.1" + "\r\n\r\n"
    val reqRec = b("WARC/1.0\r\nWARC-Type: request\r\n" +
      "WARC-Record-ID: <urn:test:rq>\r\nWARC-Date: 2026-08-14T00:00:06Z\r\n" +
      "WARC-Payload-Digest: sha1:NOTTHEBLOCKDIGESTATALLPADPADPADP\r\n" +
      "Content-Type: application/http; msgtype=request\r\n" +
      s"Content-Length: ${req.length}\r\n\r\n$req\r\n\r\n")
    assert(parse(reqRec).head.digest_ok === None)
    assert(parse(responseRecord(
      "HTTP/1.1 200 OK\r\nContent-Length: 2\r\n\r\nok")).head.digest_ok === None)
  }

  test("sink round-trip: wire variants de-frame back to the payloads") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("warc_rt").toString + "/seg"
    val docs = (0 until 23).map(i =>
      (s"https://ex.test/doc/$i", "2026-08-14T00:00:00Z", "text/plain",
        s"payload $i ${"x" * (i * 37 % 1100)}".getBytes("UTF-8")))
    Warc.writeWarcGz(spark.createDataset(docs).repartition(3), dir, wireVariants = true)
    val back = Warc.responses(Warc.readWarc(spark, dir))
      .selectExpr("target_uri", "http_status", "decode(payload, 'UTF-8') AS p")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSeq
    assert(back.size === 23)
    assert(back.forall(_._2 === 200))
    // every sink-written digest verifies through its wire variant
    val digests = Warc.responses(Warc.readWarc(spark, dir))
      .select("digest_ok").collect().map(_.getAs[Boolean](0))
    assert(digests.length === 23 && digests.forall(identity))
    val byUri = back.map(t => t._1 -> t._3).toMap
    docs.foreach { case (uri, _, _, body) =>
      assert(byUri(uri) === new String(body, "UTF-8"), uri)
    }
    // one segment file per non-empty partition, no temp leftovers
    // (dot-prefixed local-FS checksum sidecars are hidden by convention)
    val files = new java.io.File(dir).listFiles().map(_.getName).toSeq
      .filterNot(_.startsWith("."))
    assert(files.size === 3 && files.forall(_.matches("segment-\\d{5}\\.warc\\.gz")),
      files.toString)
  }
}
