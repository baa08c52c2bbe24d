package graft.sources

import java.nio.charset.StandardCharsets.UTF_8

/** Shared keying for per-dataset derived artifacts under
  * `target/graft-scratch` (serving mirrors, IVF cell indexes). One
  * implementation for every caller — the key scheme must never drift
  * between artifact kinds, or a change to canonicalization in one spot
  * silently splits the namespace.
  *
  * The key hashes the CANONICALIZED dataset path, a FINGERPRINT of the
  * dataset's files (name, length, mtime — so a regenerated fixture
  * yields a fresh namespace instead of serving a stale on-disk artifact
  * whose `_SUCCESS` marker survived from the old data), and any extra
  * discriminators the artifact depends on (e.g. bucket count). The
  * fingerprint is one directory listing — metadata only, no data read —
  * and is best-effort for nested directory tables (a rewritten
  * partition directory still bumps mtime/length at the top level).
  */
private[graft] object Scratch {

  /** 16-hex-char SHA-256 key over (canonical path, file fingerprint,
    * extras). */
  def key(dataDir: String, extra: String*): String = {
    val canon = java.nio.file.Paths.get(dataDir)
      .toAbsolutePath.normalize.toString
    val md = java.security.MessageDigest.getInstance("SHA-256")
    md.update(canon.getBytes(UTF_8))
    val root = new java.io.File(canon)
    val files = Option(root.listFiles())
      .map(_.sortBy(_.getName)).getOrElse(Array(root))
    files.foreach { f =>
      md.update(s"${f.getName}:${f.length}:${f.lastModified}".getBytes(UTF_8))
    }
    extra.foreach(e => md.update(e.getBytes(UTF_8)))
    md.digest().take(8).map(b => f"$b%02x").mkString
  }

  /** Scratch directory for an artifact kind + key. */
  def dir(prefix: String, key: String): String =
    new java.io.File(s"target/graft-scratch/${prefix}_$key").getAbsolutePath
}
