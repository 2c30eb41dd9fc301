package graft.ops

/** Local-filesystem scratch hygiene, shared by the gate queries and the
  * plan/bench tools (previously three private copies of the same
  * recursive delete — round-8 review).
  */
object LocalFiles {

  /** Recursive delete; silent no-op on a missing path. */
  def deleteRecursively(path: String): Unit = {
    def go(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(go))
      f.delete(); ()
    }
    go(new java.io.File(path))
  }

  private val registered =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** A per-process scratch directory under java.io.tmpdir, stable WITHIN
    * the process (so a 3-pass bench overwrites one copy instead of
    * accumulating three) and keyed by the JVM pid ACROSS processes (so
    * two drivers on the same fixture cannot race each other's
    * overwrite — the round-8 review's concurrency finding). Registered
    * for recursive delete at JVM shutdown, so nothing outlives the run. */
  def processScratchDir(tag: String): String = {
    val dir = new java.io.File(System.getProperty("java.io.tmpdir"),
      s"graft-$tag-pid${ProcessHandle.current().pid()}")
    dir.mkdirs()
    val path = dir.getAbsolutePath
    if (registered.add(path)) {
      Runtime.getRuntime.addShutdownHook(new Thread(() =>
        deleteRecursively(path)))
    }
    path
  }
}
