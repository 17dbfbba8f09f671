package graft.util

import java.nio.file.{FileVisitResult, Files, Path, SimpleFileVisitor}
import java.nio.file.attribute.BasicFileAttributes

/** Local-filesystem helpers shared by the sinks' snapshot cleaners and
  * the query harness's temp dirs. One definition so a robustness fix
  * (concurrent-delete tolerance, symlink handling) reaches every
  * cleaner; `deleteIfExists` makes races with other deleters benign. */
object LocalFs {

  def deleteRecursively(p: Path): Unit =
    Files.walkFileTree(p, new SimpleFileVisitor[Path] {
      override def visitFile(f: Path, a: BasicFileAttributes): FileVisitResult = {
        Files.deleteIfExists(f); FileVisitResult.CONTINUE
      }
      override def postVisitDirectory(d: Path, e: java.io.IOException): FileVisitResult = {
        Files.deleteIfExists(d); FileVisitResult.CONTINUE
      }
    })
}
