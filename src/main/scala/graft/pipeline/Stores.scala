package graft.pipeline

import java.nio.file.{Files, Path}
import java.util.concurrent.ConcurrentLinkedQueue

import scala.jdk.CollectionConverters._

/** Temp directories for per-call persisted stores (the `*_store` /
  * incremental surface entries build their store fresh each run). The
  * returned plans read the store lazily, so a dir must outlive its call —
  * all registered dirs are reclaimed together at JVM exit by ONE shutdown
  * hook (per-call hooks would accumulate without bound under the bench's
  * repeated-invocation loop).
  */
private[graft] object Stores {

  private val dirs = new ConcurrentLinkedQueue[Path]

  private lazy val hookOnce: Unit = {
    sys.addShutdownHook {
      dirs.asScala.foreach { d =>
        if (Files.exists(d)) {
          Files.walk(d).iterator().asScala.toSeq.reverseIterator
            .foreach(p => Files.deleteIfExists(p))
        }
      }
    }
    ()
  }

  /** Create a JVM-exit-reclaimed temp directory and return its path. */
  def temp(prefix: String): String = {
    hookOnce
    val p = Files.createTempDirectory(prefix)
    dirs.add(p)
    p.toString
  }
}
