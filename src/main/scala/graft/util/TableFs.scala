package graft.util

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileContext, FileSystem, Options, Path}

import java.nio.charset.StandardCharsets

/** The sinks' filesystem seam: every manifest/pointer/cleaner operation
  * the upsert tables perform, expressed against the Hadoop
  * [[FileSystem]] API instead of `java.nio` — so a table root can be
  * `file://`, `hdfs://`, an object-store scheme, or a custom test
  * filesystem, resolved from the same Hadoop configuration Spark's own
  * reads and writes use. At 100 TB the table root IS object storage;
  * `java.nio.Files` only ever spoke to the driver's local disk.
  *
  * All paths are RELATIVE to the table root; `str(rel)` yields the
  * fully-qualified form Spark's reader/writer accepts, so the data
  * files and the metadata files are guaranteed to live on the same
  * filesystem.
  *
  * Atomicity notes, per store:
  *  - the pointer swap ([[swapPointer]]) uses `FileContext.rename` with
  *    `Options.Rename.OVERWRITE` — single-operation atomic
  *    replace-on-rename on HDFS and POSIX local filesystems, the same
  *    primitive Structured Streaming's checkpoint manager relies on;
  *  - a filesystem with no [[FileContext]] binding (custom schemes that
  *    register only `fs.<scheme>.impl`) falls back to delete-then-rename
  *    — a small non-atomic window in which the pointer is missing;
  *    [[currentSnapshot readers|readString]] of a missing pointer see
  *    "no snapshot", never a torn value, so the failure mode is a
  *    retryable read, not corruption;
  *  - object stores without atomic rename (S3) should front the pointer
  *    with a consistent store (the same requirement Hudi/Delta document
  *    for their commit files); everything else in the layout is
  *    immutable write-once data, which object stores handle natively.
  */
final class TableFs(root: String, conf: Configuration) {

  private val fs: FileSystem = new Path(root).getFileSystem(conf)

  /** Fully-qualified table root (scheme + authority pinned, so relative
    * resolution can never silently hop filesystems). */
  val rootPath: Path = fs.makeQualified(new Path(root))

  /** `FileContext` bound to the root's scheme, if the scheme registers
    * an `AbstractFileSystem` (all built-in schemes do) — the holder of
    * the atomic overwrite-rename used by [[swapPointer]]. */
  private lazy val fileContext: Option[FileContext] =
    scala.util.Try(FileContext.getFileContext(rootPath.toUri, conf)).toOption

  def resolve(rel: String): Path =
    if (rel.isEmpty) rootPath else new Path(rootPath, rel)

  /** Fully-qualified path string (what `spark.read.parquet` takes). */
  def str(rel: String): String = resolve(rel).toString

  def exists(rel: String): Boolean = fs.exists(resolve(rel))

  def mkdirs(rel: String): Unit = { fs.mkdirs(resolve(rel)): Unit }

  def readBytes(rel: String): Array[Byte] = {
    val p = resolve(rel)
    val len = fs.getFileStatus(p).getLen
    require(len <= 64L * 1024 * 1024, s"metadata file unexpectedly large: $p ($len bytes)")
    val buf = new Array[Byte](len.toInt)
    val in = fs.open(p)
    try in.readFully(0, buf) finally in.close()
    buf
  }

  def readString(rel: String): String =
    new String(readBytes(rel), StandardCharsets.UTF_8)

  /** Write-once metadata write (`FileSystem.create` makes parents). */
  def writeBytes(rel: String, bytes: Array[Byte]): Unit = {
    val out = fs.create(resolve(rel), true)
    try out.write(bytes) finally out.close()
  }

  def writeString(rel: String, s: String): Unit =
    writeBytes(rel, s.getBytes(StandardCharsets.UTF_8))

  /** Atomically publish `content` at `rel`: write `<rel>.tmp`, then
    * rename over the destination (see the class-level atomicity notes).
    * This is the sinks' commit point — after it returns, readers
    * resolve the new snapshot. */
  def swapPointer(rel: String, content: String): Unit = {
    val tmpRel = rel + ".tmp"
    writeString(tmpRel, content)
    val (src, dst) = (resolve(tmpRel), resolve(rel))
    fileContext match {
      case Some(fc) => fc.rename(src, dst, Options.Rename.OVERWRITE)
      case None =>
        // no AbstractFileSystem binding: delete-then-rename (documented
        // non-atomic window; readers of a missing pointer see "no
        // snapshot", never a torn value)
        fs.delete(dst, false)
        require(fs.rename(src, dst), s"pointer rename failed: $src -> $dst")
    }
  }

  /** Names of the immediate SUBDIRECTORIES of `rel` (empty if the dir
    * doesn't exist) — the cleaner/manifest listing primitive. One
    * `listStatus` call: object-store listings are per-request metered,
    * and the callers only ever list bounded metadata levels (snapshots,
    * commit dirs, bucket dirs), never data files. */
  def listSubdirNames(rel: String): Seq[String] = {
    val p = resolve(rel)
    if (!fs.exists(p)) Nil
    else fs.listStatus(p).filter(_.isDirectory).map(_.getPath.getName).toSeq
  }

  /** Recursive delete, tolerant of concurrent deleters (cleanup runs
    * after the pointer swap and must never fail a published commit). */
  def deleteRecursively(rel: String): Unit =
    { scala.util.Try(fs.delete(resolve(rel), true)): Unit }
}
