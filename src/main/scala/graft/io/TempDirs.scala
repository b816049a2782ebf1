package graft.io

import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._

/** Process-scoped scratch directories: every dir handed out here is
  * registered for recursive deletion in a JVM shutdown hook, so repeated
  * bench/verify runs leave no `/tmp/graft-*` residue. Sinks that are
  * written once and re-scanned across invocations (the partitioned-sink /
  * labeled-CSV caches) combine this with a per-(JVM, dir) cache: first call
  * writes, later calls only read, exit deletes.
  */
object TempDirs {

  private val registered =
    java.util.concurrent.ConcurrentHashMap.newKeySet[Path]()

  // Per-dir try/catch: one undeletable dir (e.g. a file Spark still holds
  // open at exit) must not kill the hook thread and leak the rest.
  Runtime.getRuntime.addShutdownHook(new Thread(() =>
    registered.iterator().asScala.foreach { p =>
      try deleteRecursively(p)
      catch { case e: Exception => System.err.println(s"[TempDirs] leak $p: $e") }
    }))

  /** Create and register a scratch directory (deleted on JVM exit). */
  def scratch(prefix: String): Path = {
    val p = Files.createTempDirectory(prefix)
    registered.add(p)
    p
  }

  def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p, java.nio.file.LinkOption.NOFOLLOW_LINKS)) {
      val children = Files.list(p)
      try children.iterator().asScala.foreach(deleteRecursively)
      finally children.close()
    }
    Files.deleteIfExists(p)
  }
}
