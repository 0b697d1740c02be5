package graft.io

/** JVM-lifetime temp directories with guaranteed exit cleanup — the
  * shared registry behind every build-once-serve-many saved index
  * ([[graft.text.Bm25.ensureSavedIndex]], [[graft.vector.Ivf
  * .ensureSavedIndex]]). Every directory is registered BEFORE any
  * bytes land, so even a double-build loser (two threads racing one
  * memo slot) is reclaimed by the shutdown hook.
  */
object TempDirs {

  private val created =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  private lazy val hook: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      created.forEach { d =>
        try Zips.deleteRecursively(new java.io.File(d))
        catch { case _: Throwable => () } // best-effort exit cleanup
      }
    }))

  /** Create a temp directory registered for recursive exit cleanup. */
  def create(prefix: String): String = {
    hook
    val p = java.nio.file.Files.createTempDirectory(prefix).toString
    created.add(p)
    p
  }

  /** Delete a registered directory NOW and unregister it — the
    * bounded-retention path for [[SavedIndex]]'s parked superseded
    * indexes. No-op for unregistered paths (never deletes a
    * directory this registry didn't create). */
  def reclaim(path: String): Unit =
    if (created.remove(path))
      try Zips.deleteRecursively(new java.io.File(path))
      catch { case _: Throwable => () }

  /** Spec hook: is the path registered for exit cleanup? */
  def isRegistered(path: String): Boolean = created.contains(path)

  /** Spec hook: registry size (to assert memo hits create no dirs). */
  def registeredCount: Int = created.size()
}
