package graft.core

/** RAM-backed scratch space for query-local fixtures and streaming
  * checkpoints (guide §6: scratch I/O should not ride the shared data
  * disk). The catalog's fixture-building queries (Iceberg/Delta table
  * commits, format round-trips, streaming state/offset logs) write and
  * re-read megabytes of scratch per invocation; on this host /tmp is
  * the co-tenant-shared disk, while /dev/shm is tmpfs. Bench's sink
  * cells have used exactly this root since r9 — this helper gives every
  * scratch site the same policy.
  *
  * This is NOT cross-run caching: each invocation creates a fresh
  * directory, writes its fixture from the parquet inputs, reads it back
  * within the same query, and the JVM-exit hook deletes it. Nothing is
  * keyed on the input path and nothing survives the process.
  */
object Scratch {
  val root: java.nio.file.Path = {
    val shm = java.nio.file.Paths.get("/dev/shm")
    if (java.nio.file.Files.isWritable(shm)) shm
    else java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"))
  }

  private val created = new java.util.concurrent.ConcurrentLinkedQueue[String]()
  @volatile private var hooked = false
  private def hookOnce(): Unit = if (!hooked) synchronized {
    if (!hooked) {
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        created.forEach { d =>
          org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(d))
        }
      }))
      hooked = true
    }
  }

  /** Fresh scratch directory under the RAM-backed root; deleted at JVM
    * exit (fixture dirs must outlive the query's lazy materialization,
    * so per-query deletion is not safe — the sink/noop save happens
    * after the query function returns). */
  def dir(prefix: String): String = {
    hookOnce()
    val d = java.nio.file.Files.createTempDirectory(root, prefix).toString
    created.add(d)
    d
  }

  /** Register a caller-managed fixed path (wipe-and-recreate staging
    * dirs) for the same JVM-exit cleanup. */
  def register(path: String): String = {
    hookOnce()
    if (!created.contains(path)) created.add(path)
    path
  }
}
