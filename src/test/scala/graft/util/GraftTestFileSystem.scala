package graft.util

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{DelegateToFileSystem, RawLocalFileSystem}

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
  * (`fs.AbstractFileSystem.graftfs.impl`) — present so the pointer
  * swap exercises its ATOMIC overwrite-rename path on the custom
  * scheme. A second scheme without this binding covers the documented
  * delete-then-rename fallback. */
class GraftTestAbstractFs(uri: URI, conf: Configuration)
  extends DelegateToFileSystem(uri, new GraftTestFileSystem(), conf, "graftfs", false)

/** A scheme (`graftraw://`) that registers ONLY the FileSystem impl —
  * no AbstractFileSystem — so [[TableFs.swapPointer]]'s documented
  * fallback (delete-then-rename when no FileContext binding exists) is
  * what runs. */
class GraftRawTestFileSystem extends RawLocalFileSystem {
  override def getScheme: String = "graftraw"
  override def getUri: URI = URI.create("graftraw:///")
}
