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

  /** Hadoop-path variant: the path may live on any Hadoop filesystem
    * (file:, hdfs:, s3a:), and deletion goes through that scheme's
    * `FileSystem` — a cluster's shared-FS scratch cannot be reclaimed
    * with `java.io.File`. The configuration is captured at
    * registration because the SparkSession may already be stopped
    * when the hook fires. */
  def reclaimOnExitHadoop(
      path: String,
      conf: org.apache.hadoop.conf.Configuration): Unit =
    hooked.getOrElseUpdate(s"hadoop:$path", {
      Runtime.getRuntime.addShutdownHook(new Thread(() =>
        try {
          val p = new org.apache.hadoop.fs.Path(path)
          p.getFileSystem(conf).delete(p, true): Unit
        } catch { case _: Throwable => () }))
    })
}
