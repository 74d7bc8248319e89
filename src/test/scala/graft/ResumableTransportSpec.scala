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

  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
  server.createContext("/start", (ex: HttpExchange) => handleStart(ex))
  server.createContext("/upload/", (ex: HttpExchange) => handleUpload(ex))
  server.start()

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
}
