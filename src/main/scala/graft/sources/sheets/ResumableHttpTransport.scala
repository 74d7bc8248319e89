package graft.sources.sheets

import java.io.{IOException, InputStream, OutputStream}
import java.net.{HttpURLConnection, URL}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}

/** Chunked, RESUMABLE transport, BOTH directions — the production shape of
  * the reference's Drive path: upload (publication) below, plus the
  * [[download]]/[[list]] read twins (`loader.py:125-141, 197-205`) and a
  * per-request [[credentials]] supplier (`loader.py:78-102`). Upload
  * protocol — the reference's Drive publication path
  * (`/root/reference/src/loader.py:78-102, 137-139, 180-183`: start an
  * upload session, stream fixed-size chunks, finalize-or-resume), behind
  * the same [[SheetTransport]] seam the sink already writes through, so
  * the CSV assembly, cell-guard and commit bookkeeping are unchanged.
  *
  * Protocol (the standard resumable-media contract):
  *
  *   1. `POST <endpoint>/start?name=<sheet>` with the total byte length in
  *      `X-Upload-Content-Length` → `Location` header carries the session
  *      URL.
  *   2. `PUT <session>` per chunk with `Content-Range: bytes a-b/N`.
  *      Server replies 308 (resume-incomplete) with `Range: bytes=0-k`
  *      confirming its durable prefix, or 200/201 on the final chunk —
  *      publication is ATOMIC on the server (temp file + move), so a
  *      reader never observes a partial sheet.
  *   3. On ANY transport error the client does not guess: it re-asks the
  *      server where it stands (`Content-Range: bytes *` slash `N` — the
  *      status probe) and resumes from the server-confirmed offset. A
  *      chunk the server half-received is re-sent from the confirmed
  *      byte, so the upload converges under arbitrary mid-chunk kills.
  *
  * The body is spooled to a local temp file first: the protocol needs the
  * total length up front, and re-sending an arbitrary byte range after a
  * failure requires a seekable source (a Writer stream is neither). That
  * is also the reference's shape — it uploads a finished local CSV.
  *
  * Zero-egress note: nothing in this class knows about any real service;
  * it speaks the protocol to whatever `endpoint` it is given (the spec
  * drives it against an in-process stub server and kills chunks
  * mid-flight).
  */
final class ResumableHttpTransport(endpoint: String,
    chunkSize: Int = 64 * 1024, maxRetries: Int = 8,
    credentials: () => Option[String] = () => None,
    backoffBaseMs: Long = 100L) extends SheetTransport {
  require(chunkSize > 0)

  /** Exponential backoff with full jitter before the `attempt`'th
    * consecutive retry (round 14, ADVICE: the retry path re-requested
    * immediately, so a rate-limiting server answering 429 got hammered
    * `maxRetries` times back-to-back). Sleep is uniform in
    * [0, base * 2^min(attempt,6)] — the standard full-jitter scheme; the
    * cap bounds any single wait at base*64 ms (6.4 s at the default).
    */
  private def backoff(attempt: Int): Unit = {
    val maxMs = backoffBaseMs << math.min(attempt, 6)
    val ms = java.util.concurrent.ThreadLocalRandom.current().nextLong(maxMs + 1)
    if (ms > 0) Thread.sleep(ms)
  }

  /** visible for the spec: how many status probes (resume round-trips)
    * this transport issued.
    */
  @volatile private[graft] var resumeProbes: Int = 0

  /** visible for the spec: how many download chunk retries resumed from
    * the locally-confirmed offset.
    */
  @volatile private[graft] var downloadResumes: Int = 0

  override def upsert(name: String, content: java.io.Writer => Unit): Unit = {
    val tmp = Files.createTempFile("graft_upload_", ".spool")
    try {
      val w = Files.newBufferedWriter(tmp, StandardCharsets.UTF_8)
      try content(w) finally w.close()
      val total = Files.size(tmp)
      val session = startSession(name, total)
      uploadChunks(session, tmp, total)
    } finally Files.deleteIfExists(tmp)
  }

  private def startSession(name: String, total: Long): String = {
    val enc = java.net.URLEncoder.encode(name, "UTF-8")
    val c = open(s"$endpoint/start?name=$enc", "POST")
    c.setRequestProperty("X-Upload-Content-Length", total.toString)
    c.setFixedLengthStreamingMode(0)
    c.setDoOutput(true)
    c.getOutputStream.close()
    val code = c.getResponseCode
    val loc = c.getHeaderField("Location")
    c.disconnect()
    if (code != 200 || loc == null)
      throw new IOException(s"resumable start failed: HTTP $code")
    if (loc.startsWith("http")) loc else endpoint.stripSuffix("/") + loc
  }

  private def uploadChunks(session: String, file: Path, total: Long): Unit = {
    var offset = 0L
    var retries = 0
    while (offset < total) {
      val len = math.min(chunkSize.toLong, total - offset)
      try {
        offset = putChunk(session, file, offset, len, total)
        retries = 0
      } catch {
        case e: IOException =>
          retries += 1
          if (retries > maxRetries)
            throw new IOException(s"upload of $file gave up after $maxRetries retries", e)
          backoff(retries)
          // never assume what the server kept: probe, then resume from its
          // confirmed prefix (loader.py's next_chunk() loop re-entering)
          offset = queryOffset(session, total)
      }
    }
  }

  /** Sends bytes [off, off+len) and returns the server-confirmed NEXT
    * offset (which may be less than off+len if the server kept a shorter
    * durable prefix).
    */
  private def putChunk(session: String, file: Path,
      off: Long, len: Long, total: Long): Long = {
    val c = open(session, "PUT")
    c.setRequestProperty("Content-Range", s"bytes $off-${off + len - 1}/$total")
    c.setFixedLengthStreamingMode(len)
    c.setDoOutput(true)
    val out = c.getOutputStream
    try copyRange(file, off, len, out) finally out.close()
    val code = c.getResponseCode
    val confirmed = nextOffset(c, code, total)
    c.disconnect()
    confirmed
  }

  /** The status probe: an empty PUT with `Content-Range: bytes *` slash
    * total; the reply's Range header is the server's durable prefix.
    */
  private def queryOffset(session: String, total: Long): Long = {
    resumeProbes += 1
    val c = open(session, "PUT")
    c.setRequestProperty("Content-Range", s"bytes */$total")
    c.setFixedLengthStreamingMode(0)
    c.setDoOutput(true)
    c.getOutputStream.close()
    val code = c.getResponseCode
    val confirmed = nextOffset(c, code, total)
    c.disconnect()
    confirmed
  }

  private def nextOffset(c: HttpURLConnection, code: Int, total: Long): Long =
    code match {
      case 200 | 201 => total
      case 308 =>
        val r = c.getHeaderField("Range") // "bytes=0-<last>"
        if (r == null) 0L
        else r.substring(r.indexOf('-') + 1).toLong + 1
      case other => throw new IOException(s"chunk rejected: HTTP $other")
    }

  private def copyRange(file: Path, off: Long, len: Long, out: OutputStream): Unit = {
    val in = Files.newInputStream(file)
    try {
      skipFully(in, off)
      val buf = new Array[Byte](8192)
      var remaining = len
      while (remaining > 0) {
        val n = in.read(buf, 0, math.min(buf.length.toLong, remaining).toInt)
        if (n < 0) throw new IOException("spool truncated under upload")
        out.write(buf, 0, n)
        remaining -= n
      }
    } finally in.close()
  }

  private def skipFully(in: InputStream, n: Long): Unit = {
    var remaining = n
    while (remaining > 0) {
      val s = in.skip(remaining)
      if (s <= 0) throw new IOException("spool truncated under skip")
      remaining -= s
    }
  }

  private def open(url: String, method: String): HttpURLConnection = {
    val c = new URL(url).openConnection().asInstanceOf[HttpURLConnection]
    c.setRequestMethod(method)
    c.setConnectTimeout(5000)
    c.setReadTimeout(10000)
    // the credential-supplier hook (reference parity: loader.py:78-102
    // acquires-or-refreshes before each service call). Invoked PER
    // REQUEST, so a supplier backed by a refreshing token cache rotates
    // mid-transfer without the transport knowing — the production swap
    // is configuration (pass a supplier), not a code change.
    credentials().foreach(tok =>
      c.setRequestProperty("Authorization", s"Bearer $tok"))
    c
  }

  /** Chunked, RESUMABLE download — the read twin of the upload protocol
    * (reference parity: `loader.py:125-141`, the `MediaIoBaseDownload`
    * next_chunk() loop). Fixed-size `Range: bytes a-b` GETs against
    * `<endpoint>/download?name=<name>`; the server replies 206 with
    * `Content-Range: bytes a-b/N` (the total N steers termination) or
    * 200 with the whole body for servers without range support. Progress
    * is only advanced by bytes FULLY read into the local buffer, so on
    * any transport error the retry re-requests from the locally-confirmed
    * offset — the mirror of the upload's server-confirmed-prefix rule
    * (here the CLIENT is the durable side). Converges under arbitrary
    * mid-chunk kills; gives up after `maxRetries` consecutive failures.
    */
  def download(name: String): Array[Byte] = {
    val enc = java.net.URLEncoder.encode(name, "UTF-8")
    val buf = new java.io.ByteArrayOutputStream()
    var off = 0L
    var total = -1L // unknown until the first Content-Range reply
    var retries = 0
    while (total < 0 || off < total) {
      try {
        val c = open(s"$endpoint/download?name=$enc", "GET")
        c.setRequestProperty("Range", s"bytes=$off-${off + chunkSize - 1}")
        val code = c.getResponseCode
        code match {
          case 206 =>
            val cr = Option(c.getHeaderField("Content-Range")).getOrElse(
              throw new IOException("206 without Content-Range"))
            // "bytes a-b/N"
            val m = "bytes (\\d+)-(\\d+)/(\\d+)".r.findFirstMatchIn(cr)
              .getOrElse(throw new IOException(s"bad Content-Range: $cr"))
            if (m.group(1).toLong != off)
              throw new IOException(
                s"server range starts at ${m.group(1)}, asked $off")
            total = m.group(3).toLong
            // drain the chunk; bytes read are a valid prefix of [a, b] so
            // they commit even when the connection dies mid-body — a kill
            // surfaces EITHER as an IOException (retry from the unchanged
            // offset) or as a SHORT read (the loop re-asks from off +
            // bytes kept). Both converge duplicate-free; both count as a
            // resume for the spec's evidence.
            val chunk = try c.getInputStream.readAllBytes()
              finally c.disconnect()
            if (chunk.isEmpty) // zero progress must hit the retry cap,
              throw new IOException("empty 206 body") // never loop free
            if (chunk.length < (m.group(2).toLong - m.group(1).toLong + 1))
              downloadResumes += 1
            buf.write(chunk)
            off += chunk.length
          case 200 => // no range support: whole body in one read
            if (off > 0) throw new IOException(
              "server dropped range support mid-download")
            val body = try c.getInputStream.readAllBytes()
              finally c.disconnect()
            buf.write(body)
            off = body.length.toLong; total = off
          case 416 if total < 0 && off == 0 => // zero-byte file
            c.disconnect()
            total = 0
          case other if other >= 400 && other < 500 &&
              other != 408 && other != 429 =>
            // a 4xx (401/403/404/...) is the server DECIDING, not the
            // transport failing: retrying a deterministic rejection
            // maxRetries times only masks it as retry exhaustion —
            // fail fast instead (416 mid-stream falls through here too:
            // a file that shrank under us is not retriable either).
            // 408 (request timeout) and 429 (rate limit) are transient by
            // definition — they fall through to the retrying path below,
            // which waits with exponential backoff + jitter before
            // re-requesting (the reference loader retries such statuses
            // too, but with NO backoff of its own; the wait here is what
            // keeps a rate-limiting server from being hammered).
            c.disconnect()
            throw new FatalTransportException(
              s"download of $name rejected: HTTP $other")
          case other =>
            c.disconnect()
            throw new IOException(s"download chunk rejected: HTTP $other")
        }
        retries = 0
      } catch {
        case e: FatalTransportException => throw e
        case e: IOException =>
          retries += 1
          if (retries > maxRetries)
            throw new IOException(
              s"download of $name gave up after $maxRetries retries", e)
          backoff(retries)
          downloadResumes += 1
          // off only ever counts fully-committed chunks — re-request from it
      }
    }
    buf.toByteArray
  }

  /** PAGINATED folder listing for discovery (reference parity:
    * `loader.py:113-122` walks Drive's `nextPageToken` cursor until the
    * server stops returning one — a folder of tens of thousands of
    * `.sql` files never arrives as one giant response). Page protocol:
    * GET `<endpoint>/list[?pageToken=<tok>]` → newline-separated names
    * in the body; a non-empty `X-Next-Page-Token` response header means
    * more pages remain and its value is the next request's cursor. A
    * server without pagination simply never sets the header and the
    * walk degenerates to the previous single GET.
    */
  def list(): Seq[String] = {
    val out = Seq.newBuilder[String]
    val seen = scala.collection.mutable.Set.empty[String]
    var token: Option[String] = None
    var more = true
    while (more) {
      val url = s"$endpoint/list" + token.map(t =>
        "?pageToken=" + java.net.URLEncoder.encode(t, "UTF-8")).getOrElse("")
      val c = open(url, "GET")
      val code = c.getResponseCode
      if (code != 200) {
        c.disconnect()
        throw new IOException(s"list failed: HTTP $code")
      }
      val body = new String(c.getInputStream.readAllBytes(),
        StandardCharsets.UTF_8)
      token = Option(c.getHeaderField("X-Next-Page-Token")).filter(_.nonEmpty)
      c.disconnect()
      out ++= body.linesIterator.filter(_.nonEmpty)
      // cursor-cycle guard: a buggy server re-issuing a token it already
      // served must fail loudly, not list forever
      token.foreach { t =>
        if (!seen.add(t))
          throw new IOException(s"list page cursor cycle on token '$t'")
      }
      more = token.isDefined
    }
    out.result()
  }

}

/** A deterministic server-side rejection (4xx): retrying cannot change
  * the answer, so the retry loops rethrow it immediately instead of
  * burning maxRetries attempts on it.
  */
final class FatalTransportException(msg: String) extends IOException(msg)
