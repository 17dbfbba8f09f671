package graft.util

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

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
  * Pointer atomicity — MONOTONIC VERSION-NAMED files, no overwrite on
  * any scheme: [[swapPointer]] publishes `<rel>.v<N>` (N strictly
  * increasing), readers ([[readPointer]]) list the versions and take
  * max-N, and old versions are deleted AFTER the new one is visible.
  * Because nothing is ever renamed OVER the live pointer, there is no
  * window on ANY scheme in which the pointer is missing or torn:
  *  - the new version file appears via rename of a fully-written tmp
  *    file to a FRESH name — atomic on HDFS/POSIX, and on object
  *    stores a single-object copy whose destination key materializes
  *    only complete (single-PUT atomicity);
  *  - a reader that races the post-publish cleanup and loses its
  *    listed max version simply retries the next-lower surviving
  *    version (retention keeps the previous version through the swap);
  *  - no `FileContext`/`AbstractFileSystem` binding is required — a
  *    scheme registering only `fs.<scheme>.impl` gets the identical
  *    guarantee (spec: `SinkSchemeSpec` reads the pointer inside every
  *    mutation the swap performs and never sees "no snapshot").
  * Legacy single-file pointers (pre-versioning layouts) are still
  * readable: [[readPointer]] falls back to the plain `<rel>` file when
  * no versioned one exists.
  */
final class TableFs(root: String, conf: Configuration) {

  private val fs: FileSystem = new Path(root).getFileSystem(conf)

  /** Fully-qualified table root (scheme + authority pinned, so relative
    * resolution can never silently hop filesystems). */
  val rootPath: Path = fs.makeQualified(new Path(root))

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

  // ------------------------------------------------------------- pointer

  /** How many published versions survive a swap (the new one plus this
    * many predecessors): 2 keeps the previous pointer alive through
    * the entire swap + cleanup, so a reader racing the cleanup always
    * has a version to fall back to. */
  private val RetainPointerVersions = 2

  private def versionName(rel: String, n: Long): String = s"$rel.v$n"

  /** Published versions of `rel`, ascending by N. One `globStatus`
    * call on `<rel>.v*` — bounded by the retention count plus any
    * in-flight swap. */
  private def pointerVersions(rel: String): Seq[Long] = {
    val pattern = new Path(rootPath, rel + ".v*")
    val VName = (java.util.regex.Pattern.quote(
      resolve(rel).getName) + "\\.v(\\d+)").r
    Option(fs.globStatus(pattern)).getOrElse(Array.empty)
      .flatMap(st => st.getPath.getName match {
        case VName(n) => Some(n.toLong)
        case _        => None // .tmp files and strays never count
      })
      .sorted.toSeq
  }

  /** Atomically publish `content` at pointer `rel`: write
    * `<rel>.v<N+1>.tmp`, rename it to the FRESH name `<rel>.v<N+1>`
    * (never over a live file), then delete versions older than the
    * previous one. This is the sinks' commit point — after it returns,
    * [[readPointer]] resolves the new snapshot; at every instant
    * DURING it, readers resolve the old one (see the class-level
    * atomicity notes). Single-writer per table, like the sinks'
    * commit protocol itself. */
  def swapPointer(rel: String, content: String): Unit = {
    val next = pointerVersions(rel).lastOption.map(_ + 1).getOrElse(0L)
    val tmpRel = versionName(rel, next) + ".tmp"
    writeString(tmpRel, content)
    require(fs.rename(resolve(tmpRel), resolve(versionName(rel, next))),
      s"pointer publish failed: $tmpRel -> ${versionName(rel, next)}")
    // cleanup AFTER the publish, best-effort (a failed delete must
    // never fail a committed swap): keep the new version and its
    // predecessor, drop older ones plus any legacy plain file
    val stale = pointerVersions(rel).dropRight(RetainPointerVersions)
    stale.foreach(n =>
      { scala.util.Try(fs.delete(resolve(versionName(rel, n)), false)): Unit })
    scala.util.Try(fs.delete(resolve(rel), false)): Unit
  }

  /** Resolve pointer `rel`: the highest published version's content,
    * retrying lower versions if the listed max vanished to a
    * concurrent cleanup; falls back to the legacy plain `<rel>` file
    * (pre-versioning layouts), and None when nothing is published. */
  def readPointer(rel: String): Option[String] = {
    val versioned = pointerVersions(rel).reverse.iterator
      .map(n => scala.util.Try(readString(versionName(rel, n))).toOption)
      .collectFirst { case Some(s) => s }
    versioned.orElse {
      if (exists(rel)) scala.util.Try(readString(rel)).toOption else None
    }
  }

  // ------------------------------------------------------------- listing

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

  /** Total bytes under `rel` (0 if absent) — the read-amplification
    * observable the MOR compaction policy keys on. One
    * `getContentSummary` call per chained dir; callers bound the call
    * count by buckets × chain length, never data-file fan-out. */
  def sizeBytes(rel: String): Long = {
    val p = resolve(rel)
    if (!fs.exists(p)) 0L else fs.getContentSummary(p).getLength
  }

  /** Recursive delete, tolerant of concurrent deleters (cleanup runs
    * after the pointer swap and must never fail a published commit). */
  def deleteRecursively(rel: String): Unit =
    { scala.util.Try(fs.delete(resolve(rel), true)): Unit }
}
