package graft.util

/** /tmp staging directories for the pay-once write paths (csv/orc round
  * trips, partitioned/bucketed sinks, schema-merge fixtures).
  *
  * One definition of the naming recipe: sanitized sfDir name + pid, so
  * concurrent Verify/Bench runs on the same machine can never race on an
  * overwrite-then-read of a shared directory. Every dir is registered for
  * recursive deletion at JVM exit so repeated runs don't accrete copies
  * under /tmp.
  */
object Staging {

  private val dirs = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  private lazy val hookInstalled: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      dirs.forEach(p => delete(new java.io.File(p)))))

  /** Staging path for (key, sfDir), unique per JVM, cleaned at exit. */
  def dir(key: String, sfDir: String): String = {
    val sf = new java.io.File(sfDir).getName.replaceAll("[^A-Za-z0-9]", "_")
    val p = s"/tmp/graft_${key}_${sf}_${java.lang.ProcessHandle.current.pid}"
    hookInstalled
    dirs.add(p)
    p
  }

  private def delete(f: java.io.File): Unit = {
    val cs = f.listFiles()
    if (cs != null) cs.foreach(delete)
    f.delete()
    ()
  }
}
