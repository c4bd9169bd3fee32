package graft.io

import java.io.{BufferedInputStream, ByteArrayInputStream, ByteArrayOutputStream, InputStream}
import java.nio.charset.StandardCharsets
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** WARC (ISO 28500) reader — the container format of web crawls
  * (Common Crawl, Internet Archive), and the true stage-0 input of
  * every published curation recipe the repo implements (CCNet,
  * RefinedWeb, C4 all start from WARC response records). Pure-JDK
  * byte parsing, the same discipline as the MP4 ISO-BMFF demux
  * (`ext/Multimodal.scala`): no format library, the spec's framing
  * rules implemented directly.
  *
  * Format (warc-1.1 §4): records are `WARC/<ver>\r\n`, header lines
  * (`Name: value`), an empty line, exactly `Content-Length` block
  * bytes, then `\r\n\r\n`. A `response` record's block is an HTTP/1.1
  * message: status line + headers + `\r\n\r\n` + payload (the HTML).
  * Crawl WARCs ship gzipped with ONE GZIP MEMBER PER RECORD so
  * readers can skip without decompressing everything;
  * `GZIPInputStream` reads concatenated members transparently, so
  * plain, whole-file-gzip, and per-record-gzip files all parse
  * through the same path.
  *
  * Scale shape: `binaryFiles` hands each .warc(.gz) file to ONE task
  * as a stream — the parse is single-pass, constant memory plus one
  * record block at a time, and the file never materializes whole.
  * Gzip isn't splittable, but crawl corpora arrive as many ~1 GB
  * shards (100 TB ≈ 100k files), so file-grain parallelism saturates
  * any cluster; downstream operators re-fan via their own shuffles.
  * Payload decode follows the WHATWG sniffing order (BOM, transport
  * charset, `<meta>` prescan of the first 1024 bytes, UTF-8 fallback)
  * always with replacement for malformed sequences — "bytes in,
  * best-effort text out", but best-effort now honors the encodings a
  * real crawl actually declares.
  */
object Warc {

  /** One parsed record. `html` carries the decoded HTTP payload for
    * `response` records (and the whole block for `conversion` /
    * `resource` records — WET-style extracts); null otherwise.
    */
  final case class Record(
      path: String,
      url: Option[String], // WARC-Target-URI
      ts: Option[java.sql.Timestamp], // WARC-Date
      warc_type: String,
      record_id: Option[String], // WARC-Record-ID
      content_type: Option[String], // the record block's type
      http_status: Option[Int], // response records only
      http_content_type: Option[String],
      html: Option[String],
      n_block_bytes: Long)

  /** All records of every `.warc` / `.warc.gz` under `path` (file,
    * directory, or glob), one file per task, streamed.
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.sparkContext.binaryFiles(path)
      // Hadoop hidden/metadata convention (.crc sidecars, _SUCCESS
      // markers) — the same leading-./_ rule Spark's file sources use
      .filter { case (file, _) =>
        val name = new org.apache.hadoop.fs.Path(file).getName
        !name.startsWith(".") && !name.startsWith("_")
      }
      .flatMap { case (file, pds) =>
        val raw = pds.open()
        val in = if (file.toLowerCase.endsWith(".gz"))
          new GZIPInputStream(raw, 1 << 16) else raw
        // a downstream limit/take (or task failure) can abandon the
        // iterator mid-file; the task-completion hook closes the handle
        // either way, so long-lived executors don't accrete one leaked
        // stream per partially-read shard
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit](_ => in.close()))
        records(file, in)
      }
      .toDS().toDF()
  }

  /** The crawl-pipeline projection: `response` records only, with the
    * HTML payload — (url, ts, html) plus provenance, ready for
    * [[graft.ext.Html.htmlToText]] and
    * [[graft.ext.Dedup.urlDedup]]. This is the `warc` lake format
    * ([[Lake.read]]).
    */
  def responses(spark: SparkSession, path: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    read(spark, path).where(col("warc_type") === "response")
      .select("path", "url", "ts", "record_id", "http_status",
        "http_content_type", "html", "n_block_bytes")
  }

  /** Parse one WARC byte buffer (plain or gzip) — the driver-side /
    * test seam over the same streaming parser.
    */
  def parseBytes(path: String, bytes: Array[Byte]): Seq[Record] = {
    val isGzip = bytes.length >= 2 &&
      (bytes(0) & 0xff) == 0x1f && (bytes(1) & 0xff) == 0x8b
    val raw: InputStream = new ByteArrayInputStream(bytes)
    val in = if (isGzip) new GZIPInputStream(raw, 1 << 16) else raw
    records(path, in).toSeq
  }

  // ---- the streaming parser ----

  /** Close-on-exhaustion record iterator over one stream. Malformed
    * framing FAILS the record's file loudly (a truncated block means
    * every later offset is garbage — silently resynchronizing would
    * fabricate records), matching the MP4 demux's overrun checks.
    */
  private[graft] def records(path: String, in0: InputStream): Iterator[Record] =
    new Iterator[Record] {
      private val in = new BufferedInputStream(in0, 1 << 16)
      private var nextRec: Option[Record] = None
      private var closed = false
      advance()

      override def hasNext: Boolean = nextRec.isDefined
      override def next(): Record = {
        val r = nextRec.getOrElse(throw new NoSuchElementException)
        advance()
        r
      }

      private def close(): Unit = if (!closed) { closed = true; in.close() }

      // a require() tripping mid-record must not leak the handle: the
      // loud failure propagates, but the stream closes first (the
      // task-completion hook in [[read]] is the executor-side backstop;
      // this covers driver-side parseBytes and direct callers too)
      private def advance(): Unit =
        try advanceUnsafe()
        catch { case e: Throwable => close(); throw e }

      private def advanceUnsafe(): Unit = {
        nextRec = None
        if (closed) return
        // skip inter-record blank lines to the next version line
        var line = readLine(in)
        while (line != null && line.isEmpty) line = readLine(in)
        if (line == null) { close(); return }
        require(line.startsWith("WARC/"),
          s"$path: expected a WARC version line, got '${line.take(40)}'")
        // headers to the empty line; first colon splits, keys fold case;
        // a line starting with SP/HT is a FOLDED continuation of the
        // previous header's value (warc-1.1 §4 inherits RFC 5322
        // folding — long URI values in real crawls do fold), joined
        // with one space
        val headers = scala.collection.mutable.Map.empty[String, String]
        var lastKey: String = null
        var h = readLine(in)
        while (h != null && h.nonEmpty) {
          if ((h.charAt(0) == ' ' || h.charAt(0) == '\t') && lastKey != null) {
            headers(lastKey) = headers(lastKey) + " " + h.trim
          } else {
            val i = h.indexOf(':')
            if (i > 0) {
              lastKey = h.substring(0, i).trim.toLowerCase
              headers(lastKey) = h.substring(i + 1).trim
            } else lastKey = null // junk line: a fold after it has no home
          }
          h = readLine(in)
        }
        require(h != null, s"$path: EOF inside a WARC header block")
        val len = headers.getOrElse("content-length",
          throw new IllegalArgumentException(
            s"$path: WARC record without Content-Length")).toLong
        require(len >= 0 && len <= Int.MaxValue,
          s"$path: unsupported WARC block length $len")
        val block = in.readNBytes(len.toInt)
        require(block.length == len,
          s"$path: truncated WARC block (${block.length} of $len bytes)")
        val warcType = headers.getOrElse("warc-type", "unknown")
        val contentType = headers.get("content-type")
        val (status, httpCt, payload) =
          if (warcType == "response" &&
            contentType.exists(_.toLowerCase.startsWith("application/http")))
            parseHttp(block)
          else if (warcType == "conversion" || warcType == "resource")
            (None, contentType, Some(new String(block, StandardCharsets.UTF_8)))
          else (None, None, None)
        nextRec = Some(Record(
          path = path,
          url = headers.get("warc-target-uri"),
          ts = headers.get("warc-date").flatMap(parseDate),
          warc_type = warcType,
          record_id = headers.get("warc-record-id"),
          content_type = contentType,
          http_status = status,
          http_content_type = httpCt,
          html = payload,
          n_block_bytes = len))
      }
    }

  /** Split an HTTP/1.1 message block: (status, Content-Type, body).
    *
    * The body is what a crawl actually serves, so three envelope
    * layers are undone IN ORDER, each tolerantly (inner-HTTP chaos
    * must degrade the payload, never kill the record — the WARC
    * Content-Length already guaranteed the outer framing):
    *
    *  1. `Transfer-Encoding: chunked` — de-chunked by the hex size
    *     lines; malformed chunk framing falls back to the raw bytes;
    *  2. `Content-Encoding: gzip`/`x-gzip`/`deflate` — decompressed;
    *     a corrupt stream falls back to the raw bytes;
    *  3. charset — WHATWG encoding-sniffing precedence: a byte-order
    *     mark wins outright; else the `charset=` parameter of the
    *     HTTP Content-Type; else a `<meta charset>` /
    *     `http-equiv=Content-Type` prescan of the first 1024 bytes
    *     (the HTML5 prescan window); UTF-8 otherwise — always with
    *     replacement for malformed sequences. Real crawls declare a
    *     large minority of encodings ONLY in the meta tag; without the
    *     prescan those pages decode with U+FFFD damage.
    */
  private def parseHttp(block: Array[Byte])
    : (Option[Int], Option[String], Option[String]) = {
    val sep = indexOfCrlfCrlf(block)
    val (head, bodyBytes) =
      if (sep < 0) (new String(block, StandardCharsets.ISO_8859_1), Array.empty[Byte])
      else (new String(block, 0, sep, StandardCharsets.ISO_8859_1),
        java.util.Arrays.copyOfRange(block, sep + 4, block.length))
    val lines = head.split("\r\n", -1)
    val status = lines.headOption
      .filter(_.startsWith("HTTP/")).map(_.split(" ", 3))
      .filter(_.length >= 2).flatMap(a => a(1).toIntOption)
    def header(name: String): Option[String] = lines.drop(1).collectFirst {
      case l if l.toLowerCase.startsWith(name + ":") =>
        l.substring(l.indexOf(':') + 1).trim
    }
    val ct = header("content-type")
    val unchunked =
      if (header("transfer-encoding").exists(_.toLowerCase.contains("chunked")))
        dechunk(bodyBytes).getOrElse(bodyBytes)
      else bodyBytes
    val inflated = header("content-encoding").map(_.toLowerCase) match {
      case Some(e) if e.contains("gzip") => gunzipLenient(unchunked)
      case Some(e) if e.contains("deflate") => inflateLenient(unchunked)
      case _ => unchunked
    }
    (status, ct, Some(decodeHtml(inflated, ct)))
  }

  /** Decode an HTML payload per the WHATWG sniffing order: BOM, then
    * the transport charset, then the `<meta>` prescan, then UTF-8.
    * BOM bytes are consumed (UTF-16 via the auto-detecting JDK
    * charset; the UTF-8 BOM stripped explicitly — the JDK decoder
    * would otherwise leave a U+FEFF at offset 0).
    */
  private[io] def decodeHtml(b: Array[Byte], contentType: Option[String]): String = {
    if (b.length >= 3 && (b(0) & 0xff) == 0xef && (b(1) & 0xff) == 0xbb &&
      (b(2) & 0xff) == 0xbf)
      new String(b, 3, b.length - 3, StandardCharsets.UTF_8)
    else if (b.length >= 2 && ((b(0) & 0xff) == 0xfe && (b(1) & 0xff) == 0xff ||
      (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xfe))
      new String(b, StandardCharsets.UTF_16) // BOM-detecting, BOM-consuming
    else {
      val cs = contentType.flatMap(charsetOf)
        .orElse(metaCharsetOf(b))
        .getOrElse(StandardCharsets.UTF_8)
      new String(b, cs)
    }
  }

  private val MetaCharsetRe = java.util.regex.Pattern.compile(
    "(?i)<meta[^>]{0,512}?charset\\s*=\\s*[\"']?([A-Za-z0-9_.:-]+)")

  /** The HTML5 prescan: a `<meta … charset=…>` declaration in the
    * first 1024 bytes (covers both the `<meta charset="…">` form and
    * `http-equiv="Content-Type" content="…; charset=…"` — the
    * attribute value contains `charset=` either way). The window is
    * decoded as ISO-8859-1 — every ASCII-compatible encoding a meta
    * tag can declare reads identically there, and the prescan never
    * applies to the UTF-16 family (caught by BOM above per spec).
    */
  private[io] def metaCharsetOf(b: Array[Byte]): Option[java.nio.charset.Charset] = {
    val head = new String(b, 0, math.min(1024, b.length), StandardCharsets.ISO_8859_1)
    val m = MetaCharsetRe.matcher(head)
    if (m.find())
      try Some(java.nio.charset.Charset.forName(m.group(1)))
      catch { case _: Exception => None }
    else None
  }

  /** The `charset=` parameter of a Content-Type value, when the JVM
    * supports it (quoted or bare, case-insensitive).
    */
  private[io] def charsetOf(contentType: String): Option[java.nio.charset.Charset] = {
    val m = java.util.regex.Pattern
      .compile("(?i)charset=\"?([A-Za-z0-9_.:-]+)\"?").matcher(contentType)
    if (m.find())
      try Some(java.nio.charset.Charset.forName(m.group(1)))
      catch { case _: Exception => None }
    else None
  }

  /** Undo HTTP/1.1 chunked transfer coding: hex-size line, chunk
    * bytes, CRLF, repeat; 0-size terminates (trailers ignored). None
    * on malformed framing — the caller keeps the raw bytes.
    */
  private[io] def dechunk(b: Array[Byte]): Option[Array[Byte]] = {
    val out = new ByteArrayOutputStream(b.length)
    var p = 0
    def line(): String = {
      val sb = new java.lang.StringBuilder(16)
      while (p < b.length && b(p) != '\n') {
        if (b(p) != '\r') sb.append(b(p).toChar)
        p += 1
      }
      if (p >= b.length) return null // no terminating LF: malformed
      p += 1 // consume LF
      sb.toString
    }
    while (true) {
      val l = line()
      if (l == null) return None
      val size =
        try java.lang.Long.parseLong(l.split(";")(0).trim, 16)
        catch { case _: NumberFormatException => return None }
      if (size == 0) return Some(out.toByteArray) // trailers ignored
      if (size < 0 || p + size > b.length) return None
      out.write(b, p, size.toInt)
      p += size.toInt
      // the CRLF after the chunk data
      if (p + 1 < b.length && b(p) == '\r' && b(p + 1) == '\n') p += 2
      else if (p < b.length && b(p) == '\n') p += 1
      else return None
    }
    None // unreachable
  }

  private def gunzipLenient(b: Array[Byte]): Array[Byte] =
    try new GZIPInputStream(new ByteArrayInputStream(b)).readAllBytes()
    catch { case _: Exception => b }

  private def inflateLenient(b: Array[Byte]): Array[Byte] =
    try new java.util.zip.InflaterInputStream(new ByteArrayInputStream(b)).readAllBytes()
    catch {
      case _: Exception =>
        // some servers send RAW deflate (no zlib header) — retry nowrap
        try new java.util.zip.InflaterInputStream(new ByteArrayInputStream(b),
          new java.util.zip.Inflater(true)).readAllBytes()
        catch { case _: Exception => b }
    }

  private def indexOfCrlfCrlf(b: Array[Byte]): Int = {
    var i = 0
    while (i + 3 < b.length) {
      if (b(i) == '\r' && b(i + 1) == '\n' && b(i + 2) == '\r' && b(i + 3) == '\n')
        return i
      i += 1
    }
    -1
  }

  /** ISO-8601 WARC-Date → Timestamp; malformed dates parse to None
    * (provenance metadata must not fail the content record).
    */
  private def parseDate(s: String): Option[java.sql.Timestamp] =
    try Some(java.sql.Timestamp.from(java.time.Instant.parse(s)))
    catch { case _: java.time.format.DateTimeParseException => None }

  /** Line up to LF, CR dropped, ISO-8859-1 (header charset per spec);
    * null at EOF.
    */
  private def readLine(in: InputStream): String = {
    var c = in.read()
    if (c == -1) return null
    val sb = new java.lang.StringBuilder(64)
    while (c != -1 && c != '\n') {
      if (c != '\r') sb.append(c.toChar)
      c = in.read()
    }
    sb.toString
  }

  // ---- the writer side: fixtures, tests, and WARC-shaped sinks ----

  /** Serialize one record with correct framing (Content-Length set
    * from `block`, terminating `\r\n\r\n`). `headers` keep their
    * given order; Content-Length is appended.
    *
    * Header values are attacker-influenced by definition in web data
    * (a crawled URL IS the WARC-Target-URI value), so a CR/LF anywhere
    * in a key or value would inject forged headers — or whole forged
    * records — into the written shard and desync the Content-Length
    * framing for every downstream consumer. Serialization therefore
    * REJECTS control characters in headers loudly, the same
    * fail-don't-resync posture the reader takes for malformed framing.
    */
  def record(headers: Seq[(String, String)], block: Array[Byte]): Array[Byte] = {
    headers.foreach { case (k, v) =>
      require(!k.exists(c => c == '\r' || c == '\n') &&
        !v.exists(c => c == '\r' || c == '\n'),
        s"WARC header contains CR/LF (header injection): '$k: ${v.take(80)}'")
    }
    val sb = new StringBuilder("WARC/1.0\r\n")
    headers.foreach { case (k, v) => sb.append(k).append(": ").append(v).append("\r\n") }
    sb.append("Content-Length: ").append(block.length).append("\r\n\r\n")
    val head = sb.toString.getBytes(StandardCharsets.ISO_8859_1)
    val out = new ByteArrayOutputStream(head.length + block.length + 4)
    out.write(head); out.write(block); out.write("\r\n\r\n".getBytes(StandardCharsets.ISO_8859_1))
    out.toByteArray
  }

  /** An HTTP/1.1 response block for a `response` record. */
  def httpResponseBlock(status: Int, contentType: String, body: String): Array[Byte] = {
    val head = s"HTTP/1.1 $status OK\r\nContent-Type: $contentType\r\n\r\n"
    (head + body).getBytes(StandardCharsets.UTF_8)
  }

  /** One gzip member (crawl WARCs gzip PER RECORD and concatenate). */
  def gzipMember(bytes: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(bytes.length / 2 + 64)
    val gz = new GZIPOutputStream(out)
    gz.write(bytes); gz.close()
    out.toByteArray
  }

  /** Distributed WARC sink: land (url, ts, html) rows as `response`
    * records in crawl layout — one `.warc.gz` shard per partition,
    * one gzip member per record, so [[read]] (and any standard WARC
    * tool) skips record-by-record without decompressing the shard.
    * Null/absent ts rows get no WARC-Date header; null html writes an
    * empty payload. Record-IDs are deterministic (`urn:graft:<hash of
    * url+ts+partition+row>`) so re-running the same frame produces
    * byte-stable shards modulo partition assignment.
    *
    * Scale shape: `foreachPartition` streams each shard through one
    * Hadoop FS `create` — no local staging, no driver funnel; shard
    * count = partition count, the same file-grain parallelism the
    * reader consumes. Existing shard files are overwritten (the
    * parquet `mode("overwrite")` posture for a fixed partition
    * layout); pick a fresh dir per logical write like any lake land.
    */
  def write(df: DataFrame, dir: String, urlCol: String = "url",
            tsCol: String = "ts", htmlCol: String = "html",
            httpStatus: Int = 200,
            contentType: String = "text/html; charset=UTF-8"): Unit =
    writeRecords(df, dir, urlCol, tsCol, htmlCol,
      block = (body: String) => httpResponseBlock(httpStatus, contentType, body),
      warcType = "response",
      recordContentType = "application/http; msgtype=response")

  /** WET-style sink: land EXTRACTED text as `conversion` records
    * (`text/plain` blocks, no HTTP envelope) — the companion format
    * crawl pipelines publish beside the response WARCs, and exactly
    * what [[responses]] → `Html.htmlToText` produces. Same shard
    * layout and round-trip contract as [[write]] (the reader maps a
    * conversion record's whole block into `html`).
    */
  def writeConversions(df: DataFrame, dir: String, urlCol: String = "url",
                       tsCol: String = "ts", textCol: String = "text"): Unit =
    writeRecords(df, dir, urlCol, tsCol, textCol,
      block = (body: String) => body.getBytes(StandardCharsets.UTF_8),
      warcType = "conversion",
      recordContentType = "text/plain")

  private def writeRecords(df: DataFrame, dir: String, urlCol: String,
                           tsCol: String, bodyCol: String,
                           block: String => Array[Byte], warcType: String,
                           recordContentType: String): Unit = {
    val cols = df.columns
    require(Seq(urlCol, bodyCol).forall(cols.contains),
      s"Warc writer needs '$urlCol' and '$bodyCol' columns; frame has ${cols.mkString(", ")}")
    val hasTs = cols.contains(tsCol)
    import org.apache.spark.sql.functions.{col, lit}
    val slim = df.select(col(urlCol).cast("string").as("u"),
      (if (hasTs) col(tsCol).cast("timestamp") else lit(null).cast("timestamp")).as("t"),
      col(bodyCol).cast("string").as("h"))
    // the session's Hadoop conf isn't serializable; ship the entries
    // that differ from defaults and rebuild executor-side (executors
    // also carry the site files on their classpath, so this is belt
    // and braces for programmatic overrides like test miniclusters)
    val confEntries: Seq[(String, String)] = {
      val it = df.sparkSession.sparkContext.hadoopConfiguration.iterator()
      val b = Seq.newBuilder[(String, String)]
      while (it.hasNext) { val e = it.next(); b += (e.getKey -> e.getValue) }
      b.result()
    }
    slim.foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
      if (rows.hasNext) {
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val path = new org.apache.hadoop.fs.Path(
          f"${dir.stripSuffix("/")}/part-$pid%05d.warc.gz")
        val conf = new org.apache.hadoop.conf.Configuration()
        confEntries.foreach { case (k, v) => conf.set(k, v) }
        val fs = path.getFileSystem(conf)
        fs.setWriteChecksum(false) // no .crc sidecars in a crawl layout
        val out = fs.create(path, true)
        try {
          var i = 0L
          rows.foreach { r =>
            // CR/LF are not legal URL characters (RFC 3986 forbids
            // controls), but crawled data carries them anyway — strip
            // rather than let one hostile URL fail the whole shard
            // ([[record]] still REJECTS any other CR/LF-bearing header)
            val url = Option(r.getString(0))
              .map(_.filterNot(c => c == '\r' || c == '\n'))
            val ts = Option(r.getTimestamp(1))
            val body = Option(r.getString(2)).getOrElse("")
            val id = java.lang.Long.toHexString(
              scala.util.hashing.MurmurHash3.stringHash(
                s"${url.getOrElse("")}|${ts.map(_.getTime).getOrElse(0L)}|$pid|$i").toLong)
            val headers = Seq("WARC-Type" -> warcType) ++
              url.map("WARC-Target-URI" -> _) ++
              ts.map(t => "WARC-Date" -> t.toInstant.toString) ++
              Seq("WARC-Record-ID" -> s"<urn:graft:$id>",
                "Content-Type" -> recordContentType)
            out.write(gzipMember(record(headers, block(body))))
            i += 1
          }
        } finally out.close()
      }
    }
  }
}
