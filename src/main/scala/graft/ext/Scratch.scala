package graft.ext

/** Session-scoped scratch directories reclaimed at JVM exit — one
  * shutdown hook per distinct path, however many times a query reuses
  * it. Shared by every registry that stages temp data (incremental
  * loads, streaming file sources) so the cleanup policy lives in one
  * place. */
object Scratch {

  private val hooked =
    scala.collection.concurrent.TrieMap.empty[String, Unit]

  def reclaimOnExit(path: String): Unit =
    hooked.getOrElseUpdate(path, {
      Runtime.getRuntime.addShutdownHook(new Thread(() =>
        org.apache.commons.io.FileUtils
          .deleteQuietly(new java.io.File(path)): Unit))
    })
}
