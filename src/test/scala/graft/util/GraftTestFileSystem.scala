package graft.util

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{DelegateToFileSystem, Path, RawLocalFileSystem}

import java.net.URI

/** A NON-DEFAULT FileSystem scheme (`graftfs://`) for the sink specs:
  * local-disk storage behind a custom scheme, so a test proves the
  * sinks resolve every metadata and data operation through the Hadoop
  * [[org.apache.hadoop.fs.FileSystem]] plugin machinery — the same
  * seam an `hdfs://` or object-store root uses — rather than
  * hard-coding `file://` or `java.nio`. Registered per-test via
  * `fs.graftfs.impl`. */
class GraftTestFileSystem extends RawLocalFileSystem {
  override def getScheme: String = "graftfs"
  override def getUri: URI = URI.create("graftfs:///")
}

/** The [[org.apache.hadoop.fs.FileContext]] binding for `graftfs://`
  * (`fs.AbstractFileSystem.graftfs.impl`) — present so specs cover a
  * scheme WITH an AbstractFileSystem registration; `graftraw://` below
  * covers the scheme-without-binding case the versioned pointer was
  * designed for. */
class GraftTestAbstractFs(uri: URI, conf: Configuration)
  extends DelegateToFileSystem(uri, new GraftTestFileSystem(), conf, "graftfs", false)

/** A scheme (`graftraw://`) that registers ONLY the FileSystem impl —
  * no AbstractFileSystem — the environment the version-named pointer
  * files ([[TableFs.swapPointer]]) must stay atomic-for-readers on.
  * Every `rename`/`delete` is reported to [[GraftRawTestFileSystem]]'s
  * mutation hook BEFORE and AFTER executing, so a spec can read the
  * pointer at every intermediate state of a swap and assert no
  * pointer-missing window exists. */
class GraftRawTestFileSystem extends RawLocalFileSystem {
  override def getScheme: String = "graftraw"
  override def getUri: URI = URI.create("graftraw:///")

  override def rename(src: Path, dst: Path): Boolean = {
    GraftRawTestFileSystem.fire(s"before rename $src -> $dst")
    val r = super.rename(src, dst)
    GraftRawTestFileSystem.fire(s"after rename $src -> $dst")
    r
  }

  override def delete(p: Path, recursive: Boolean): Boolean = {
    GraftRawTestFileSystem.fire(s"before delete $p")
    val r = super.delete(p, recursive)
    GraftRawTestFileSystem.fire(s"after delete $p")
    r
  }
}

object GraftRawTestFileSystem {
  /** Spec-installed observer called around every mutation; the hook is
    * re-entrancy-guarded so a hook that itself reads through the
    * filesystem (e.g. `readPointer`) doesn't recurse. */
  @volatile var onMutation: String => Unit = _ => ()
  private val inHook = new ThreadLocal[java.lang.Boolean] {
    override def initialValue(): java.lang.Boolean = false
  }
  private def fire(what: String): Unit =
    if (!inHook.get()) {
      inHook.set(true)
      try onMutation(what) finally inHook.set(false)
    }
}
