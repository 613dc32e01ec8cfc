package graft

import java.nio.file.{Files, Path}
import java.util.Comparator

/** Tracked scratch-space for query faces that persist intermediates
  * (landing zones, stream staging tiles, checkpoint dirs, sink dirs).
  *
  * Every engine-created temp directory hangs off ONE per-JVM root that
  * a shutdown hook deletes recursively, so a full Bench/Verify run — or
  * k repeated bench iterations — leaves `/tmp` exactly as it found it.
  * Before this, each `createTempDirectory("graft_…")` call site leaked
  * its tree past process exit (harmless in a sandbox, an operational
  * bug on a shared driver host).
  *
  * Driver-local by design: these paths are only ever read/written
  * through Spark in local mode or by driver-side staging code; a
  * cluster deployment would point the same faces at object-store URIs,
  * where lifecycle is a bucket policy, not a JVM hook.
  */
object TempDirs {

  private lazy val root: Path = {
    val r = Files.createTempDirectory("graft_run_")
    Runtime.getRuntime.addShutdownHook(new Thread(() => deleteRecursively(r)))
    r
  }

  /** A fresh directory `<root>/<prefix><random>`, deleted (with all
    * contents) when the JVM exits. */
  def create(prefix: String): String =
    Files.createTempDirectory(root, prefix).toString

  private def deleteRecursively(p: Path): Unit =
    // Best-effort for the WHOLE tree: the walk itself can throw
    // (NoSuchFileException / UncheckedIOException) when entries vanish
    // mid-traversal — e.g. a racing executor thread still tearing down
    // its own scratch file at JVM exit — and an exception escaping the
    // shutdown hook would abandon the rest of the root. Per-file
    // deletes are additionally guarded so one locked file doesn't stop
    // its siblings.
    try {
      if (Files.exists(p)) {
        val stream = Files.walk(p)
        try stream.sorted(Comparator.reverseOrder[Path]())
          .forEach(f => try Files.deleteIfExists(f) catch { case _: Exception => () })
        finally stream.close()
      }
    } catch { case _: Exception => () }
}
