package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.io.Warc

/** WARC reader: framing, gzip layouts, HTTP envelope split, the
  * response projection, and the Lake format wiring — all on crafted
  * records (the writer side is the library's own [[Warc.record]], so
  * round-tripping is the contract).
  */
class WarcSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def resp(url: String, date: String, id: Int, status: Int,
                   html: String): Array[Byte] =
    Warc.record(Seq(
      "WARC-Type" -> "response",
      "WARC-Target-URI" -> url,
      "WARC-Date" -> date,
      "WARC-Record-ID" -> s"<urn:uuid:$id>",
      "Content-Type" -> "application/http; msgtype=response"),
      Warc.httpResponseBlock(status, "text/html; charset=UTF-8", html))

  private val winfo = Warc.record(Seq(
    "WARC-Type" -> "warcinfo",
    "WARC-Date" -> "2023-01-01T00:00:00Z",
    "WARC-Record-ID" -> "<urn:uuid:0>",
    "Content-Type" -> "application/warc-fields"),
    "software: test\r\n".getBytes("UTF-8"))

  private val req = Warc.record(Seq(
    "WARC-Type" -> "request",
    "WARC-Target-URI" -> "https://x.example.com/1",
    "WARC-Date" -> "2023-01-01T00:00:01Z",
    "WARC-Record-ID" -> "<urn:uuid:9>",
    "Content-Type" -> "application/http; msgtype=request"),
    "GET /1 HTTP/1.1\r\n\r\n".getBytes("UTF-8"))

  private val r1 = resp("https://x.example.com/1", "2023-01-01T00:00:01Z", 1,
    200, "<p>one</p>")
  private val r2 = resp("https://x.example.com/2", "2023-01-01T00:00:02Z", 2,
    301, "")
  private val all: Array[Byte] = Seq(winfo, r1, req, r2).reduce(_ ++ _)

  test("parseBytes: framing, headers, HTTP split; warcinfo/request carry no payload") {
    val recs = Warc.parseBytes("t", all)
    assert(recs.map(_.warc_type) === Seq("warcinfo", "response", "request", "response"))
    val by = recs.filter(_.warc_type == "response").map(r => r.url.get -> r).toMap
    val a = by("https://x.example.com/1")
    assert(a.http_status === Some(200))
    assert(a.http_content_type === Some("text/html; charset=UTF-8"))
    assert(a.html === Some("<p>one</p>"))
    assert(a.ts.get.toInstant === java.time.Instant.parse("2023-01-01T00:00:01Z"))
    assert(by("https://x.example.com/2").html === Some(""))
    assert(recs.head.url === None, "warcinfo has no target URI")
    assert(recs(2).html === None, "request blocks are not page payloads")
    // a conversion (WET-style) record carries its whole block as text
    val conv = Warc.record(Seq(
      "WARC-Type" -> "conversion",
      "WARC-Target-URI" -> "https://x.example.com/1",
      "WARC-Date" -> "2023-01-01T00:00:03Z",
      "Content-Type" -> "text/plain"),
      "already extracted".getBytes("UTF-8"))
    assert(Warc.parseBytes("t", conv).head.html === Some("already extracted"))
  }

  test("plain, whole-file-gzip, and per-record-gzip parse identically") {
    val plain = Warc.parseBytes("t", all)
    val whole = Warc.parseBytes("t", Warc.gzipMember(all))
    val perRecord = Warc.parseBytes("t",
      Seq(winfo, r1, req, r2).map(Warc.gzipMember).reduce(_ ++ _))
    assert(whole === plain)
    assert(perRecord === plain,
      "GZIPInputStream must walk concatenated members (the crawl layout)")
  }

  test("malformed framing fails the file loudly, never resynchronizes") {
    // truncated block: Content-Length says more bytes than exist
    // (cut inside r1's block: 6 drops the record terminator + 2 body bytes)
    val truncated = (winfo ++ r1).dropRight(6)
    val e1 = intercept[IllegalArgumentException] { Warc.parseBytes("t", truncated) }
    assert(e1.getMessage.contains("truncated"))
    // garbage where a version line should be
    val e2 = intercept[IllegalArgumentException] {
      Warc.parseBytes("t", "NOT-A-WARC\r\n\r\n".getBytes("UTF-8"))
    }
    assert(e2.getMessage.contains("version line"))
    // record without Content-Length
    val e3 = intercept[IllegalArgumentException] {
      Warc.parseBytes("t", "WARC/1.0\r\nWARC-Type: response\r\n\r\n".getBytes("UTF-8"))
    }
    assert(e3.getMessage.contains("Content-Length"))
    // a malformed WARC-Date degrades to a NULL ts, not a dead record
    val badDate = Warc.record(Seq(
      "WARC-Type" -> "response",
      "WARC-Target-URI" -> "https://x.example.com/bad",
      "WARC-Date" -> "yesterday-ish",
      "Content-Type" -> "application/http; msgtype=response"),
      Warc.httpResponseBlock(200, "text/html", "<p>x</p>"))
    val r = Warc.parseBytes("t", badDate).head
    assert(r.ts === None && r.html === Some("<p>x</p>"))
  }

  test("HTTP payload envelopes: chunked transfer, gzip/deflate content-encoding, header charset") {
    def respBlock(headers: String, body: Array[Byte]): Array[Byte] =
      (s"HTTP/1.1 200 OK\r\n$headers\r\n\r\n").getBytes("ISO-8859-1") ++ body
    def one(headers: String, body: Array[Byte]): Warc.Record =
      Warc.parseBytes("t", Warc.record(Seq(
        "WARC-Type" -> "response",
        "WARC-Target-URI" -> "https://e.example.com/x",
        "Content-Type" -> "application/http; msgtype=response"),
        respBlock(headers, body))).head
    // chunked: hex sizes + chunk-ext tolerated, trailers ignored
    assert(one("Content-Type: text/html\r\nTransfer-Encoding: chunked",
      "4;ext=1\r\nWiki\r\n5\r\npedia\r\n0\r\n\r\n".getBytes("UTF-8"))
      .html === Some("Wikipedia"))
    // malformed chunk framing degrades to the raw bytes, never throws
    assert(one("Content-Type: text/html\r\nTransfer-Encoding: chunked",
      "ZZZ\r\nnot chunked at all".getBytes("UTF-8"))
      .html === Some("ZZZ\r\nnot chunked at all"))
    // gzip / deflate content-encoding
    assert(one("Content-Type: text/html\r\nContent-Encoding: gzip",
      Warc.gzipMember("compressed page".getBytes("UTF-8")))
      .html === Some("compressed page"))
    locally {
      val d = new java.io.ByteArrayOutputStream()
      val z = new java.util.zip.DeflaterOutputStream(d)
      z.write("deflated page".getBytes("UTF-8")); z.close()
      assert(one("Content-Type: text/html\r\nContent-Encoding: deflate",
        d.toByteArray).html === Some("deflated page"))
    }
    // corrupt gzip degrades to raw bytes
    assert(one("Content-Type: text/html\r\nContent-Encoding: gzip",
      "not gzip".getBytes("UTF-8")).html === Some("not gzip"))
    // header charset: ISO-8859-1 0xE9 = é; unknown charsets fall back to
    // UTF-8 (where 0xE9 alone is malformed -> replacement char)
    assert(one("Content-Type: text/html; charset=ISO-8859-1",
      Array[Byte]('C', 'a', 'f', 0xE9.toByte)).html === Some("Café"))
    assert(one("Content-Type: text/html; charset=no-such-cs",
      Array[Byte]('C', 'a', 'f', 0xE9.toByte)).html === Some("Caf�"))
    // the layers compose in wire order: gzip first, then chunk; the
    // reader undoes chunking, then gzip, then decodes the charset
    locally {
      val gz = Warc.gzipMember("<p>Café</p>".getBytes("ISO-8859-1"))
      val chunked = s"${gz.length.toHexString}\r\n".getBytes("ISO-8859-1") ++
        gz ++ "\r\n0\r\n\r\n".getBytes("ISO-8859-1")
      val r = one("Content-Type: text/html; charset=ISO-8859-1\r\n" +
        "Content-Encoding: gzip\r\nTransfer-Encoding: chunked", chunked)
      assert(r.html === Some("<p>Café</p>"))
    }
  }

  test("folded WARC header values (RFC 5322 continuation lines) rejoin with one space") {
    // a long Target-URI folded across two lines — real crawls do this
    val folded = ("WARC/1.0\r\n" +
      "WARC-Type: response\r\n" +
      "WARC-Target-URI: https://x.example.com/very/long\r\n" +
      "\t/folded/path\r\n" +
      "Content-Type: application/http; msgtype=response\r\n" +
      "Content-Length: 44\r\n\r\n" +
      "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" +
      "\r\n\r\n").getBytes("ISO-8859-1")
    val r = Warc.parseBytes("t", folded).head
    assert(r.url === Some("https://x.example.com/very/long /folded/path"))
    assert(r.http_status === Some(200), "framing survives the fold (Content-Length honored)")
    // a fold with no preceding header has no home and is skipped, not fatal
    val orphan = ("WARC/1.0\r\n" +
      " orphan fold line\r\n" +
      "WARC-Type: warcinfo\r\n" +
      "Content-Length: 0\r\n\r\n\r\n\r\n").getBytes("ISO-8859-1")
    assert(Warc.parseBytes("t", orphan).head.warc_type === "warcinfo")
  }

  test("meta-charset prescan: WHATWG order — BOM > header > <meta> > UTF-8") {
    def one(headers: String, body: Array[Byte]): Warc.Record =
      Warc.parseBytes("t", Warc.record(Seq(
        "WARC-Type" -> "response",
        "WARC-Target-URI" -> "https://m.example.com/x",
        "Content-Type" -> "application/http; msgtype=response"),
        (s"HTTP/1.1 200 OK\r\n$headers\r\n\r\n").getBytes("ISO-8859-1") ++ body)).head
    // <meta charset=…> form, no transport charset: no U+FFFD damage
    val iso = "<html><head><meta charset=\"ISO-8859-1\"></head>" +
      "<body><p>Smörgåsbord</p></body></html>"
    assert(one("Content-Type: text/html", iso.getBytes("ISO-8859-1")).html === Some(iso))
    // http-equiv form, windows-1251 (Cyrillic single-byte)
    val cyr = "<html><head><meta http-equiv=\"Content-Type\" " +
      "content=\"text/html; charset=windows-1251\"></head>" +
      "<body><p>Привет мир</p></body></html>"
    assert(one("Content-Type: text/html", cyr.getBytes("windows-1251")).html === Some(cyr))
    // the transport charset WINS over a (lying) meta declaration
    val lying = "<meta charset=\"ISO-8859-1\"><p>Café</p>"
    assert(one("Content-Type: text/html; charset=UTF-8",
      lying.getBytes("UTF-8")).html === Some(lying))
    // a BOM wins over everything, and is consumed, not emitted
    assert(one("Content-Type: text/html; charset=ISO-8859-1",
      Array(0xEF, 0xBB, 0xBF).map(_.toByte) ++ "<p>Café</p>".getBytes("UTF-8"))
      .html === Some("<p>Café</p>"))
    assert(one("Content-Type: text/html",
      "<p>Фаза</p>".getBytes("UTF-16")) // Java UTF-16 writes a BE BOM
      .html === Some("<p>Фаза</p>"))
    // the prescan window is the spec's 1024 bytes: a later meta is ignored
    val late = (" " * 1100) + "<meta charset=\"ISO-8859-1\"><p>Café</p>"
    val got = one("Content-Type: text/html", late.getBytes("ISO-8859-1")).html.get
    assert(got.contains("Caf�"), "past-window meta must not apply (UTF-8 fallback)")
  }

  test("writer rejects CR/LF header injection; write() strips CR/LF from URLs") {
    val e = intercept[IllegalArgumentException] {
      Warc.record(Seq("WARC-Target-URI" ->
        "https://x.example.com/\r\nWARC-Type: warcinfo"), Array.emptyByteArray)
    }
    assert(e.getMessage.contains("header injection"))
    intercept[IllegalArgumentException] {
      Warc.record(Seq("Injected\nKey" -> "v"), Array.emptyByteArray)
    }
    // the frame-level sink survives a hostile URL by stripping the CR/LF
    val dir = SparkTestBase.tmpDir("graft_warc_inject") + "/out"
    Warc.write(Seq(("https://w.example.com/a\r\nWARC-Type: forged", "<p>x</p>"))
      .toDF("url", "html"), dir)
    val back = Warc.responses(spark, dir).select($"url", $"html")
      .as[(String, String)].collect().toSeq
    assert(back === Seq(("https://w.example.com/aWARC-Type: forged", "<p>x</p>")),
      "one record, CR/LF stripped — no forged second record")
  }

  test("record iterator closes its stream on malformed framing and on exhaustion") {
    final class Sensing(b: Array[Byte]) extends java.io.ByteArrayInputStream(b) {
      var closed = false
      override def close(): Unit = { closed = true; super.close() }
    }
    val ok = new Sensing(all)
    assert(Warc.records("t", ok).size === 4)
    assert(ok.closed, "clean exhaustion closes")
    val bad = new Sensing((winfo ++ r1).dropRight(6))
    intercept[IllegalArgumentException] { Warc.records("t", bad).toList }
    assert(bad.closed, "a require() tripping mid-advance must close the handle first")
  }

  test("Warc.write: crawl-layout shards round-trip through the reader") {
    val dir = SparkTestBase.tmpDir("graft_warc_write") + "/out"
    val t1 = java.sql.Timestamp.from(java.time.Instant.parse("2024-05-01T10:00:00Z"))
    val df = Seq(
      ("https://w.example.com/1", t1, "<p>alpha</p>"),
      ("https://w.example.com/2", null.asInstanceOf[java.sql.Timestamp], "<div>beta</div>"),
      ("https://w.example.com/3", t1, null.asInstanceOf[String])) // null html -> empty payload
      .toDF("url", "ts", "html").repartition(2)
    Warc.write(df, dir)
    // shard layout: only .warc.gz files, at most one per partition
    val files = new java.io.File(dir).listFiles().map(_.getName).sorted.toSeq
    assert(files.nonEmpty && files.forall(_.endsWith(".warc.gz")), s"unexpected shard names: $files")
    assert(files.size <= 2)
    val back = Warc.responses(spark, dir)
      .select($"url", $"ts", $"html").collect()
      .map(r => (r.getString(0), Option(r.getTimestamp(1)), r.getString(2)))
      .sortBy(_._1).toSeq
    assert(back === Seq(
      ("https://w.example.com/1", Some(t1), "<p>alpha</p>"),
      ("https://w.example.com/2", None, "<div>beta</div>"),
      ("https://w.example.com/3", Some(t1), "")),
      "url/ts/html must round-trip exactly (no ts -> no WARC-Date -> NULL)")
    // overwrite posture: a second write of the same frame replaces shards
    Warc.write(df, dir)
    assert(Warc.responses(spark, dir).count() === 3)
  }

  test("CrawlScale: derived corpus lands as real shards; the chain's policy slices bite") {
    import graft.ext.CrawlScale
    val dir = SparkTestBase.tmpDir("graft_crawlscale") + "/warc"
    val corpus = "/root/testdata/sf0.001"
    val nDocs = spark.read.parquet(s"$corpus/documents.parquet").count()
    CrawlScale.writeShards(spark, corpus, dir)
    // every document round-trips through real .warc.gz bytes
    val parsed = Warc.responses(spark, dir)
    assert(parsed.count() === nDocs)
    // the planted slices exist in the bytes: blocked host, benchmark
    // host, robots noindex, canonical declaration
    import org.apache.spark.sql.functions.col
    assert(parsed.where(col("url").startsWith("https://ads.example.net/")).count() >= 1)
    assert(parsed.where(col("url").startsWith("https://bench.example.org/")).count() >= 1)
    assert(parsed.where(graft.ext.Html.robotsNoindex(col("html"))).count() >= 1)
    assert(parsed.where(
      graft.ext.Html.htmlCanonicalUrl(col("html")) =!= "").count() >= 1)
    // the front cut drops them before the content chain
    val (train0, bench) = CrawlScale.front(spark, dir)
    val kept = train0.cache()
    try {
      assert(kept.where(col("url").startsWith("https://ads.example.net/")).count() === 0)
      assert(kept.where(col("url").startsWith("https://bench.example.org/")).count() === 0)
      assert(kept.count() < nDocs, "the cuts must bite")
      assert(bench.count() >= 1, "decontamination needs a real benchmark side")
      // and the full chain lands non-empty manifest rows over real bytes
      val manifest = CrawlScale.chain(spark, dir)
      assert(manifest.count() >= 1)
    } finally kept.unpersist()
  }

  test("Warc.writeConversions: WET-style text shards round-trip as conversion records") {
    val dir = SparkTestBase.tmpDir("graft_wet_write") + "/out"
    val t1 = java.sql.Timestamp.from(java.time.Instant.parse("2024-06-01T00:00:00Z"))
    Warc.writeConversions(Seq(
      ("https://w.example.com/1", t1, "extracted text one"),
      ("https://w.example.com/2", t1, "Café text two")) // non-ASCII survives UTF-8
      .toDF("url", "ts", "text"), dir)
    val back = Warc.read(spark, dir)
    assert(back.where($"warc_type" === "conversion").count() === 2)
    val got = back.select($"url", $"html", $"content_type").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).sortBy(_._1).toSeq
    assert(got === Seq(
      ("https://w.example.com/1", "extracted text one", "text/plain"),
      ("https://w.example.com/2", "Café text two", "text/plain")),
      "conversion blocks are the raw text, no HTTP envelope")
  }

  test("distributed read over files; responses projection; Lake 'warc' format") {
    val dir = SparkTestBase.tmpDir("graft_warc")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "shard0.warc"), all)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "shard1.warc.gz"),
      Seq(winfo, r1, req, r2).map(Warc.gzipMember).reduce(_ ++ _))
    val full = Warc.read(spark, dir)
    assert(full.count() === 8, "both shards parse, all record types")
    val resp = Warc.responses(spark, dir)
    assert(resp.columns.toSeq === Seq("path", "url", "ts", "record_id",
      "http_status", "http_content_type", "html", "n_block_bytes"))
    assert(resp.count() === 4)
    assert(resp.where($"url" === "https://x.example.com/1").count() === 2,
      "one per shard: the projection filters types, not duplicates")
    // the F5-style lake wiring: format 'warc' resolves to the reader
    val viaLake = graft.io.Lake(dir).read(spark, "warc", dir)
    assert(viaLake.count() === 4)
    // composition with the extraction front door
    val text = resp.where($"path".endsWith("shard1.warc.gz"))
      .select($"url", graft.ext.Html.htmlToText($"html").as("text"))
      .orderBy("url").as[(String, String)].collect().toSeq
    assert(text === Seq(
      ("https://x.example.com/1", "one"),
      ("https://x.example.com/2", "")))
  }
}
