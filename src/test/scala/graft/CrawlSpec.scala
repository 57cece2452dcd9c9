package graft

import graft.operators.Crawl
import graft.operators.Crawl.{GzipCodec, WarcCodec}
import org.apache.spark.sql.functions._

class CrawlSpec extends SparkSuiteBase {

  test("GzipCodec: member round-trip with FNAME, multi-member concatenation, exact consumption") {
    val a = "hello crawl world".getBytes("UTF-8")
    val b = "second member".getBytes("UTF-8")
    val archive = GzipCodec.encodeMembers(Seq(Some("a.txt") -> a, None -> b))
    val Right(members) = GzipCodec.decodeMembers(archive)
    assert(members.length == 2)
    assert(members(0).name.contains("a.txt") && members(0).data.sameElements(a))
    assert(members(1).name.isEmpty && members(1).data.sameElements(b))
    // a member with an empty payload is legal
    val Right(e) = GzipCodec.decodeMembers(GzipCodec.encodeMember(Array.emptyByteArray))
    assert(e.head.data.isEmpty)
  }

  test("GzipCodec: interop — java.util.zip reads our members, we read java.util.zip output") {
    val data = "interop check payload".getBytes("UTF-8")
    // our encoder -> JDK decoder
    val jdkIn = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(GzipCodec.encodeMember(data, Some("x"))))
    assert(jdkIn.readAllBytes().sameElements(data))
    // JDK encoder -> our decoder
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(data); gz.close()
    val Right(m) = GzipCodec.decodeMembers(bos.toByteArray)
    assert(m.head.data.sameElements(data))
  }

  test("GzipCodec: every malformation degrades typed") {
    val ok = GzipCodec.encodeMember("payload bytes".getBytes("UTF-8"), Some("n"))
    assert(GzipCodec.decodeMembers(Array.emptyByteArray).left.exists(_ == "empty archive"))
    assert(GzipCodec.decodeMembers("definitely not a gzip archive".getBytes)
      .left.exists(_ == "bad gzip magic"))
    // flip a payload byte -> CRC mismatch
    val bad = ok.clone(); bad(ok.length - 12) = (bad(ok.length - 12) ^ 0x01).toByte
    assert(GzipCodec.decodeMembers(bad).left.exists(e =>
      e == "member CRC mismatch" || e.startsWith("truncated")))
    // flip an ISIZE byte
    val badIsize = ok.clone(); badIsize(ok.length - 1) = 0x7f
    assert(GzipCodec.decodeMembers(badIsize).left.exists(_ == "member ISIZE mismatch"))
    // truncations
    assert(GzipCodec.decodeMembers(ok.take(5)).left.exists(_ == "truncated member header"))
    assert(GzipCodec.decodeMembers(ok.dropRight(4)).left.exists(_ == "truncated member trailer"))
    assert(GzipCodec.decodeMembers(ok.dropRight(12)).isLeft)
    // reserved flag bits
    val badFlg = ok.clone(); badFlg(3) = 0x20
    assert(GzipCodec.decodeMembers(badFlg).left.exists(_ == "reserved flag bits set"))
    // trailing garbage is a (failed) next member, never silently ignored
    assert(GzipCodec.decodeMembers(ok ++ "junk".getBytes).isLeft)
  }

  test("WarcCodec: record round-trip and the degrade ladder") {
    val body = "<html>x</html>".getBytes("UTF-8")
    val rec = WarcCodec.encode(Seq("WARC-Type" -> "response", "K" -> "v"), body)
    val Right(r) = WarcCodec.decode(rec)
    assert(r.version == "WARC/1.0")
    assert(r.headers("WARC-Type") == "response" && r.headers("K") == "v")
    assert(r.headers("Content-Length") == body.length.toString)
    assert(r.body.sameElements(body))
    assert(WarcCodec.decode("HTTP/1.1 200 OK\r\n\r\n".getBytes)
      .left.exists(_ == "bad warc version"))
    assert(WarcCodec.decode("WARC/1.0\r\nNoColonHere\r\n\r\n".getBytes)
      .left.exists(_ == "malformed header line"))
    assert(WarcCodec.decode("WARC/1.0\r\nA: b\r\n\r\nbody\r\n\r\n".getBytes)
      .left.exists(_ == "missing Content-Length"))
    assert(WarcCodec.decode(rec.dropRight(6)).left.exists(_ == "truncated body"))
    assert(WarcCodec.decode(rec.dropRight(1)).left.exists(_ == "truncated body"))
    assert(WarcCodec.decode(rec ++ "x".getBytes).left.exists(_ == "trailing garbage"))
  }

  test("crawl pipeline: layer failures degrade to the failing layer's class; Arrow == row") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf0001)
    val media = Crawl.attachWarcGzMedia(docs)
    // parity across the whole fixture
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("doc_id").collect().map(_.toSeq).toList
    assert(canon(Crawl.crawlExtract(media)) == canon(Crawl.crawlExtractArrow(media)))
    def one(payload: Array[Byte]) = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(org.apache.spark.sql.Row(1L, payload))),
      media.schema)
    // layer 1: not gzip
    assert(Crawl.crawlExtract(one("plain".getBytes)).collect()(0).getString(1)
      == "gzip-corrupt")
    // layer 2: valid gzip member whose content is not a WARC record
    assert(Crawl.crawlExtract(one(GzipCodec.encodeMember("not warc".getBytes)))
      .collect()(0).getString(1) == "warc-corrupt")
    // layer 3: valid WARC but no response record
    val reqOnly = GzipCodec.encodeMember(WarcCodec.encode(
      Seq("WARC-Type" -> "request"), "GET /".getBytes))
    val r3 = Crawl.crawlExtract(one(reqOnly)).collect()(0)
    assert(r3.getString(1) == "no-response" && r3.getLong(2) == 1L)
    // gzip row/Arrow parity on the member fixture too
    val gz = Crawl.attachGzipMedia(docs)
    assert(canon(Crawl.decodeGzip(gz)) == canon(Crawl.decodeGzipArrow(gz)))
  }
}
