package graft.sources.sheets

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, StandardCopyOption}

/** On-disk credential cache with a first-run acquisition seam — the
  * acquire-and-cache half of the reference's `get_credentials`
  * (`/root/reference/src/loader.py:78-102`): look in the cache file; if
  * nothing is stored or the stored credential is invalid (here: expired),
  * complete the acquisition flow ONCE (there: an interactive browser
  * OAuth flow via `tools.run_flow`; here: any `() => Token` — the flow
  * itself needs egress and a human, so it stays behind this seam), store
  * the result, and serve it. Composes with the transport's per-request
  * credential supplier ([[ResumableHttpTransport]]'s `credentials`
  * argument) via [[supplier]], so rotation/refresh parity
  * (`loader.py:131, 151` rebuilding an authorized Http per request) and
  * acquire/cache parity live in one object.
  *
  * Storage shape mirrors `oauth2client.file.Storage`: one small file
  * under a `.credentials`-style directory, created on demand
  * (`loader.py:88-91`), owner-readable only. Writes are atomic
  * (temp + move) so a crash mid-store never leaves a torn credential —
  * the invalid-cache path would otherwise re-trigger the interactive
  * flow the cache exists to avoid.
  *
  * Unlike the reference, a first-run acquisition does NOT exit the
  * process (`loader.py:100-101` prints "Please run the script again" and
  * `sys.exit()`): the token is already in hand, so it is stored AND
  * used. The reference's restart requirement is an artifact of
  * oauth2client's flow API, not a semantic worth reproducing.
  */
final class CredentialCache(path: Path,
    acquire: () => CredentialCache.Token,
    clock: () => Long = () => System.currentTimeMillis()) {
  import CredentialCache._

  /** The per-request supplier to hand to a transport: every call
    * re-reads the cached credential and re-acquires if it has expired,
    * so a long batch rotates tokens mid-transfer without restarting.
    */
  def supplier: () => Option[String] = () => Some(current().value)

  /** The valid credential, from cache or a (single) acquisition. */
  def current(): Token = synchronized {
    load().filter(t => t.expiresAtMillis > clock() + RefreshSkewMs)
      .getOrElse {
        val t = acquire()
        store(t)
        t
      }
  }

  private def load(): Option[Token] =
    if (!Files.isRegularFile(path)) None
    else scala.util.Try {
      val lines = Files.readString(path, StandardCharsets.UTF_8)
        .linesIterator.toSeq
      Token(lines.head, lines(1).trim.toLong)
    }.toOption // a torn/garbled cache reads as "invalid" -> re-acquire,
               // the reference's `not credentials or credentials.invalid`

  private def store(t: Token): Unit = {
    Option(path.getParent).foreach(Files.createDirectories(_))
    val tmp = Files.createTempFile(
      Option(path.getParent).getOrElse(path.toAbsolutePath.getParent),
      ".cred", ".tmp")
    Files.writeString(tmp, s"${t.value}\n${t.expiresAtMillis}\n",
      StandardCharsets.UTF_8)
    restrictToOwner(tmp)
    Files.move(tmp, path, StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
  }

  private def restrictToOwner(p: Path): Unit =
    scala.util.Try { // POSIX-only nicety; NTFS et al. just skip it
      import java.nio.file.attribute.PosixFilePermission._
      Files.setPosixFilePermissions(p, java.util.EnumSet.of(
        OWNER_READ, OWNER_WRITE))
    }
}

object CredentialCache {
  /** A bearer credential with its wall-clock expiry. */
  final case class Token(value: String, expiresAtMillis: Long)

  /** Re-acquire this long BEFORE nominal expiry, so a token never dies
    * mid-chunk between the supplier call and the request hitting the
    * wire (the oauth2client library refreshes early for the same reason).
    */
  val RefreshSkewMs: Long = 60000L

  /** The reference's default location: `~/.credentials/sheets-etl.json`
    * (`loader.py:87-91`).
    */
  def defaultPath: Path = java.nio.file.Paths.get(
    System.getProperty("user.home"), ".credentials", "sheets-etl.json")
}
