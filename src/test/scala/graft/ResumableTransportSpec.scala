package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.concurrent.ConcurrentHashMap

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.funsuite.AnyFunSuite

/** In-process resumable-upload stub speaking the protocol
  * [[graft.sources.sheets.ResumableHttpTransport]] implements (start
  * session → chunked PUT with Content-Range → 308/Range or final 2xx),
  * with a kill switch that aborts the connection mid-chunk exactly once —
  * the failure the RESUME path exists for. Publication is atomic
  * (temp spool + move), mirroring the real service's all-or-nothing
  * finalize.
  */
final class ResumableUploadStub(dest: Path) {
  private final class Session(val name: String, val total: Long, val spool: Path) {
    @volatile var received: Long = 0L
  }
  private val sessions = new ConcurrentHashMap[String, Session]()
  /** abort (close without response) the chunk containing this byte, once */
  @volatile var killAtByte: Long = -1L
  @volatile var statusProbes: Int = 0
  @volatile var chunkPuts: Int = 0
  /** truncate the DOWNLOAD chunk containing this byte mid-body, once */
  @volatile var killDownloadAtByte: Long = -1L
  @volatile var rangeGets: Int = 0
  /** every /download request, including rejected ones (fail-fast proof) */
  @volatile var downloadGets: Int = 0
  /** page size for /list; 0 = unpaginated single response */
  @volatile var listPageSize: Int = 0
  /** every /list request (page-walk proof) */
  @volatile var listGets: Int = 0
  /** names whose upload /start blocks on [[uploadGate]] — the hung-
    * transport stand-in for the runRemote hang-isolation test
    */
  @volatile var stallUploadsFor: Set[String] = Set.empty
  val uploadGate = new java.util.concurrent.CountDownLatch(1)
  /** non-empty -> every request must carry `Authorization: Bearer <one of>` */
  @volatile var allowedTokens: Set[String] = Set.empty
  val seenTokens = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
  server.createContext("/start", (ex: HttpExchange) => authed(ex)(handleStart))
  server.createContext("/upload/", (ex: HttpExchange) => authed(ex)(handleUpload))
  server.createContext("/list", (ex: HttpExchange) => authed(ex)(handleList))
  server.createContext("/download", { (ex: HttpExchange) =>
    downloadGets += 1 // counted BEFORE the auth gate: a 401 is a request too
    authed(ex)(handleDownload)
  })
  // a cached pool, NOT the default single dispatcher thread: the stall
  // switch parks one handler on the gate, and siblings' requests must
  // still be served (the whole point of the hang-isolation tests)
  server.setExecutor(java.util.concurrent.Executors.newCachedThreadPool(
    { r: Runnable =>
      val t = new Thread(r, "stub-handler"); t.setDaemon(true); t
    }))
  server.start()

  /** Auth gate shared by every context: outside the zero-auth default,
    * reject requests whose bearer token is not in [[allowedTokens]] —
    * and RECORD each token seen, the per-request-supplier evidence.
    */
  private def authed(ex: HttpExchange)(h: HttpExchange => Unit): Unit = {
    val tok = Option(ex.getRequestHeaders.getFirst("Authorization"))
      .filter(_.startsWith("Bearer ")).map(_.stripPrefix("Bearer "))
    tok.foreach(seenTokens.add)
    if (allowedTokens.nonEmpty && !tok.exists(allowedTokens.contains)) {
      ex.getRequestBody.readAllBytes()
      ex.sendResponseHeaders(401, -1)
      ex.close()
    } else h(ex)
  }

  def endpoint: String = s"http://127.0.0.1:${server.getAddress.getPort}"
  def stop(): Unit = server.stop(0)

  private def handleStart(ex: HttpExchange): Unit = {
    val q = Option(ex.getRequestURI.getQuery).getOrElse("")
    val name = q.split("&").collectFirst {
      case kv if kv.startsWith("name=") =>
        java.net.URLDecoder.decode(kv.drop(5), "UTF-8")
    }.getOrElse("unnamed")
    val total = Option(ex.getRequestHeaders.getFirst("X-Upload-Content-Length"))
      .map(_.toLong).getOrElse(-1L)
    ex.getRequestBody.readAllBytes()
    if (stallUploadsFor.contains(name)) uploadGate.await() // hung transport
    val id = java.util.UUID.randomUUID().toString
    sessions.put(id, new Session(name, total,
      Files.createTempFile("stub_spool_", ".part")))
    ex.getResponseHeaders.set("Location", s"/upload/$id")
    ex.sendResponseHeaders(200, -1)
    ex.close()
  }

  private def handleUpload(ex: HttpExchange): Unit = {
    val id = ex.getRequestURI.getPath.stripPrefix("/upload/")
    val s = sessions.get(id)
    if (s == null) { ex.sendResponseHeaders(404, -1); ex.close(); return }
    val cr = Option(ex.getRequestHeaders.getFirst("Content-Range")).getOrElse("")
    if (cr.startsWith("bytes */")) {
      statusProbes += 1
      ex.getRequestBody.readAllBytes()
      respondProgress(ex, s)
      return
    }
    // "bytes a-b/N"
    val m = "bytes (\\d+)-(\\d+)/(\\d+)".r.findFirstMatchIn(cr).getOrElse {
      ex.sendResponseHeaders(400, -1); ex.close(); return
    }
    val (a, b) = (m.group(1).toLong, m.group(2).toLong)
    chunkPuts += 1
    if (killAtByte >= a && killAtByte <= b) {
      killAtByte = -1L
      // read part of the body, then drop the connection without any
      // response — the client must treat this as byte-loss, not success
      val in = ex.getRequestBody
      val half = ((b - a + 1) / 2).toInt
      var read = 0
      val buf = new Array[Byte](4096)
      while (read < half) {
        val n = in.read(buf, 0, math.min(buf.length, half - read))
        if (n < 0) read = half else read += n
      }
      ex.close()
      return
    }
    val body = ex.getRequestBody.readAllBytes()
    if (a > s.received) { respondProgress(ex, s); return } // gap: resync
    // append only the unseen suffix (an a < received overlap after resume)
    val skip = (s.received - a).toInt
    if (body.length > skip) {
      val ch = java.nio.channels.FileChannel.open(s.spool,
        java.nio.file.StandardOpenOption.WRITE)
      try ch.write(java.nio.ByteBuffer.wrap(body, skip, body.length - skip),
        s.received)
      finally ch.close()
      s.received += body.length - skip
    }
    if (s.received == s.total) {
      Files.createDirectories(dest)
      Files.move(s.spool, dest.resolve(s"${s.name}.csv"),
        StandardCopyOption.REPLACE_EXISTING)
      ex.sendResponseHeaders(201, -1)
      ex.close()
    } else respondProgress(ex, s)
  }

  private def handleList(ex: HttpExchange): Unit = {
    listGets += 1
    ex.getRequestBody.readAllBytes()
    import scala.jdk.CollectionConverters._
    val all: Seq[String] =
      if (!Files.isDirectory(dest)) Seq.empty
      else {
        val st = Files.list(dest)
        try st.iterator().asScala.map(_.getFileName.toString).toSeq.sorted
        finally st.close()
      }
    // pagination: pageToken is an opaque cursor (here: a start offset);
    // a non-final page sets X-Next-Page-Token, Drive-style
    val page =
      if (listPageSize <= 0) all
      else {
        val off = Option(ex.getRequestURI.getQuery).getOrElse("")
          .split("&").collectFirst {
            case kv if kv.startsWith("pageToken=") => kv.drop(10).toInt
          }.getOrElse(0)
        val slice = all.slice(off, off + listPageSize)
        if (off + listPageSize < all.size)
          ex.getResponseHeaders.set("X-Next-Page-Token",
            (off + listPageSize).toString)
        slice
      }
    val body = page.map(_ + "\n").mkString.getBytes(StandardCharsets.UTF_8)
    ex.sendResponseHeaders(200, if (body.isEmpty) -1 else body.length)
    if (body.nonEmpty) ex.getResponseBody.write(body)
    ex.close()
  }

  private def handleDownload(ex: HttpExchange): Unit = {
    val q = Option(ex.getRequestURI.getQuery).getOrElse("")
    val name = q.split("&").collectFirst {
      case kv if kv.startsWith("name=") =>
        java.net.URLDecoder.decode(kv.drop(5), "UTF-8")
    }.getOrElse("")
    ex.getRequestBody.readAllBytes()
    val file = dest.resolve(name)
    if (!Files.isRegularFile(file)) {
      ex.sendResponseHeaders(404, -1); ex.close(); return
    }
    val bytes = Files.readAllBytes(file)
    val n = bytes.length.toLong
    val range = Option(ex.getRequestHeaders.getFirst("Range")).getOrElse("")
    val m = "bytes=(\\d+)-(\\d+)".r.findFirstMatchIn(range)
    if (m.isEmpty) { // no range: whole body, 200
      ex.sendResponseHeaders(200, math.max(n, -1))
      if (n > 0) ex.getResponseBody.write(bytes)
      ex.close(); return
    }
    rangeGets += 1
    val a = m.get.group(1).toLong
    if (a >= n) { ex.sendResponseHeaders(416, -1); ex.close(); return }
    val b = math.min(m.get.group(2).toLong, n - 1)
    ex.getResponseHeaders.set("Content-Range", s"bytes $a-$b/$n")
    val len = (b - a + 1).toInt
    if (killDownloadAtByte >= a && killDownloadAtByte <= b) {
      killDownloadAtByte = -1L
      // promise the full chunk, ship half, drop the connection — the
      // client must treat the truncated body as loss, not completion
      ex.sendResponseHeaders(206, len)
      ex.getResponseBody.write(bytes, a.toInt, len / 2)
      ex.close()
      return
    }
    ex.sendResponseHeaders(206, len)
    ex.getResponseBody.write(bytes, a.toInt, len)
    ex.close()
  }

  private def respondProgress(ex: HttpExchange, s: Session): Unit = {
    if (s.received == s.total && s.total >= 0) ex.sendResponseHeaders(200, -1)
    else {
      if (s.received > 0)
        ex.getResponseHeaders.set("Range", s"bytes=0-${s.received - 1}")
      ex.sendResponseHeaders(308, -1)
    }
    ex.close()
  }
}

/** Drives the chunked transport end-to-end against the stub: clean
  * upload, mid-chunk connection kill with resume, and upsert-by-name
  * replacement — the semantics `loader.py:137-139, 180-183` rely on,
  * proven without egress.
  */
class ResumableTransportSpec extends AnyFunSuite {
  import graft.sources.sheets.ResumableHttpTransport

  private def withStub(f: (ResumableUploadStub, Path) => Unit): Unit = {
    val dest = Files.createTempDirectory("stub_dest_")
    val stub = new ResumableUploadStub(dest)
    try f(stub, dest) finally stub.stop()
  }

  private def body(n: Int): String = {
    val sb = new StringBuilder
    var i = 0
    while (sb.length < n) { sb.append(s"row_$i,value_${i * 7 % 991}\n"); i += 1 }
    sb.toString
  }

  test("clean chunked upload lands byte-identical, multiple chunks") {
    withStub { (stub, dest) =>
      val t = new ResumableHttpTransport(stub.endpoint, chunkSize = 4096)
      val content = body(40000)
      t.upsert("sheet_clean", w => w.write(content))
      val got = new String(
        Files.readAllBytes(dest.resolve("sheet_clean.csv")), StandardCharsets.UTF_8)
      assert(got == content, "uploaded bytes differ")
      assert(stub.chunkPuts >= 10, s"expected >=10 chunks, saw ${stub.chunkPuts}")
      assert(stub.statusProbes == 0, "clean path must not need resume probes")
    }
  }

  test("mid-chunk kill: client probes, resumes from server prefix, bytes equal") {
    withStub { (stub, dest) =>
      val t = new ResumableHttpTransport(stub.endpoint, chunkSize = 4096)
      val content = body(40000)
      stub.killAtByte = 4 * 4096L + 123 // abort inside the 5th chunk, once
      t.upsert("sheet_killed", w => w.write(content))
      val got = new String(
        Files.readAllBytes(dest.resolve("sheet_killed.csv")), StandardCharsets.UTF_8)
      assert(got == content, "resume produced different bytes")
      assert(stub.statusProbes >= 1, "kill must force at least one status probe")
      assert(t.resumeProbes >= 1, "transport did not record its resume")
      assert(stub.killAtByte == -1L, "kill switch never fired")
    }
  }

  test("upsert-by-name: a second upload atomically replaces the first") {
    withStub { (stub, dest) =>
      val t = new ResumableHttpTransport(stub.endpoint, chunkSize = 1024)
      t.upsert("sheet_upsert", w => w.write(body(3000)))
      val v2 = "only,the,second\nversion,survives,1\n"
      t.upsert("sheet_upsert", w => w.write(v2))
      val got = new String(
        Files.readAllBytes(dest.resolve("sheet_upsert.csv")), StandardCharsets.UTF_8)
      assert(got == v2)
    }
  }

  test("kill on the FINAL chunk still finalizes exactly once") {
    withStub { (stub, dest) =>
      val t = new ResumableHttpTransport(stub.endpoint, chunkSize = 4096)
      val content = body(20000)
      stub.killAtByte = content.getBytes(StandardCharsets.UTF_8).length - 10L
      t.upsert("sheet_tail", w => w.write(content))
      val got = new String(
        Files.readAllBytes(dest.resolve("sheet_tail.csv")), StandardCharsets.UTF_8)
      assert(got == content)
      assert(t.resumeProbes >= 1)
    }
  }

  test("download twin: clean chunked download is byte-identical, multiple chunks") {
    withStub { (stub, dest) =>
      val t = new ResumableHttpTransport(stub.endpoint, chunkSize = 4096)
      val content = body(40000)
      Files.createDirectories(dest)
      Files.writeString(dest.resolve("pull_clean.csv"), content)
      val got = new String(t.download("pull_clean.csv"), StandardCharsets.UTF_8)
      assert(got == content, "downloaded bytes differ")
      assert(stub.rangeGets >= 10, s"expected >=10 range GETs, saw ${stub.rangeGets}")
      assert(t.downloadResumes == 0, "clean path must not need resumes")
    }
  }

  test("download twin: mid-chunk kill resumes from the confirmed offset, bytes equal") {
    withStub { (stub, dest) =>
      val t = new ResumableHttpTransport(stub.endpoint, chunkSize = 4096)
      val content = body(40000)
      Files.createDirectories(dest)
      Files.writeString(dest.resolve("pull_killed.csv"), content)
      stub.killDownloadAtByte = 4 * 4096L + 123 // truncate the 5th chunk, once
      val got = new String(t.download("pull_killed.csv"), StandardCharsets.UTF_8)
      assert(got == content, "resumed download produced different bytes")
      assert(t.downloadResumes >= 1, "transport did not record its resume")
      assert(stub.killDownloadAtByte == -1L, "kill switch never fired")
    }
  }

  test("remote discovery: list + chunked download, same contract as the local folder") {
    withStub { (stub, dest) =>
      val t = new ResumableHttpTransport(stub.endpoint, chunkSize = 1024)
      Files.createDirectories(dest)
      Files.writeString(dest.resolve("b_query.sql"), "SELECT 1 AS one")
      Files.writeString(dest.resolve("a_query.sql"), body(5000)) // multi-chunk
      Files.writeString(dest.resolve("notes.txt"), "not sql")
      stub.killDownloadAtByte = 1500 // survive a kill mid-discovery too
      val specs = graft.etl.SqlFolderSource.discover(t)
      assert(specs.map(_.name) == Seq("a_query", "b_query"))
      assert(specs(0).sql == body(5000))
      assert(specs(1).sql == "SELECT 1 AS one")
    }
  }

  test("credential supplier: invoked per request, rotation mid-transfer works") {
    withStub { (stub, dest) =>
      stub.allowedTokens = Set("tok_epoch1", "tok_epoch2")
      // a refreshing token cache: epoch flips after the 3rd request —
      // the transport must pick up the new token WITHOUT restarting
      val calls = new java.util.concurrent.atomic.AtomicInteger(0)
      val t = new ResumableHttpTransport(stub.endpoint, chunkSize = 4096,
        credentials = () => Some(
          if (calls.incrementAndGet() <= 3) "tok_epoch1" else "tok_epoch2"))
      val content = body(40000)
      t.upsert("sheet_auth", w => w.write(content))
      val got = new String(
        Files.readAllBytes(dest.resolve("sheet_auth.csv")), StandardCharsets.UTF_8)
      assert(got == content)
      assert(calls.get() > 3, "supplier not consulted per request")
      assert(stub.seenTokens.contains("tok_epoch1")
        && stub.seenTokens.contains("tok_epoch2"),
        "rotation never reached the wire")
    }
  }

  test("missing/wrong credential: requests are rejected with HTTP 401, named") {
    withStub { (stub, dest) =>
      stub.allowedTokens = Set("the_token")
      val anon = new ResumableHttpTransport(stub.endpoint, chunkSize = 4096,
        maxRetries = 1)
      val eUp = intercept[java.io.IOException] {
        anon.upsert("sheet_denied", w => w.write(body(2000)))
      }
      assert(eUp.getMessage.contains("401"), s"upload error hides cause: $eUp")
      Files.createDirectories(dest)
      Files.writeString(dest.resolve("pull_denied.csv"), body(2000))
      val before = stub.downloadGets
      val eDown = intercept[graft.sources.sheets.FatalTransportException] {
        anon.download("pull_denied.csv")
      }
      assert(String.valueOf(eDown.getMessage).contains("HTTP 401"),
        s"download error hides cause: $eDown")
      // a deterministic rejection must NOT be retried into "exhaustion"
      assert(stub.downloadGets - before == 1,
        s"401 was retried ${stub.downloadGets - before - 1} times")
      // the authorized transport succeeds against the same stub state
      val ok = new ResumableHttpTransport(stub.endpoint, chunkSize = 4096,
        credentials = () => Some("the_token"))
      assert(new String(ok.download("pull_denied.csv"),
        StandardCharsets.UTF_8) == body(2000))
    }
  }

  test("404 download fails fast: one request, no retry exhaustion") {
    withStub { (stub, dest) =>
      Files.createDirectories(dest)
      val t = new ResumableHttpTransport(stub.endpoint, chunkSize = 4096)
      val e = intercept[graft.sources.sheets.FatalTransportException] {
        t.download("no_such_sheet.csv")
      }
      assert(e.getMessage.contains("HTTP 404"), s"cause hidden: $e")
      assert(stub.downloadGets == 1,
        s"deterministic 404 retried: ${stub.downloadGets} requests")
      // transient (5xx-shaped) failures must still retry: unchanged —
      // covered by the mid-chunk-kill tests above
    }
  }

  test("credential cache: first run acquires once, later runs read the file") {
    import graft.sources.sheets.CredentialCache
    val dir = Files.createTempDirectory("cred_cache")
    val path = dir.resolve(".credentials").resolve("sheets-etl.json")
    val acquires = new java.util.concurrent.atomic.AtomicInteger(0)
    var now = 1000L
    def mk() = new CredentialCache(path,
      () => { acquires.incrementAndGet()
        CredentialCache.Token(s"tok${acquires.get()}", now + 3600000L) },
      clock = () => now)
    // first run: no file -> the flow runs once, result stored AND used
    // (no reference-style "run the script again" restart)
    assert(mk().current().value == "tok1")
    assert(acquires.get() == 1)
    assert(Files.isRegularFile(path), "credential never stored")
    // a NEW instance (= a new process run) serves from disk, no flow
    assert(mk().current().value == "tok1")
    assert(acquires.get() == 1, "cached credential re-acquired")
    // expiry (with the early-refresh skew) forces one re-acquire
    now += 3600000L
    assert(mk().current().value == "tok2")
    assert(acquires.get() == 2)
    // a torn cache file reads as INVALID -> re-acquire, never a crash
    Files.writeString(path, "garbage with no expiry line")
    assert(mk().current().value == "tok3")
    assert(acquires.get() == 3)
  }

  test("credential cache end-to-end: cache-backed supplier rotates on expiry") {
    import graft.sources.sheets.CredentialCache
    withStub { (stub, dest) =>
      stub.allowedTokens = Set("epoch1", "epoch2")
      val path = Files.createTempDirectory("cred_e2e").resolve("cred.json")
      val epoch = new java.util.concurrent.atomic.AtomicInteger(0)
      @volatile var now = 0L
      val cache = new CredentialCache(path,
        () => CredentialCache.Token(s"epoch${epoch.incrementAndGet()}",
          now + 120000L),
        clock = () => now)
      val t = new ResumableHttpTransport(stub.endpoint, chunkSize = 4096,
        credentials = cache.supplier)
      t.upsert("sheet_cached", w => w.write(body(9000)))
      now += 120000L // the cached token dies between two publishes
      t.upsert("sheet_cached", w => w.write(body(9001)))
      assert(new String(Files.readAllBytes(dest.resolve("sheet_cached.csv")),
        StandardCharsets.UTF_8) == body(9001))
      assert(stub.seenTokens.contains("epoch1")
        && stub.seenTokens.contains("epoch2"),
        "cache-backed rotation never reached the wire")
      assert(epoch.get() == 2, s"expected exactly 2 acquisitions: $epoch")
    }
  }

  test("paginated listing: the cursor walk concatenates every page in order") {
    withStub { (stub, dest) =>
      Files.createDirectories(dest)
      val names = (1 to 7).map(i => f"q$i%02d.sql")
      names.foreach(n => Files.writeString(dest.resolve(n), "SELECT 1"))
      stub.listPageSize = 3 // 7 names -> pages of 3+3+1
      val t = new ResumableHttpTransport(stub.endpoint, chunkSize = 4096)
      assert(t.list() == names, "page walk lost or reordered names")
      assert(stub.listGets == 3,
        s"expected 3 page requests, saw ${stub.listGets}")
      // a server without pagination degenerates to one GET
      stub.listPageSize = 0
      stub.listGets = 0
      assert(t.list() == names)
      assert(stub.listGets == 1)
    }
  }
}
