package graft.control

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardOpenOption}

/** Rotating human-readable text log — utils/text_logger.py:24-71
  * parity: size-rotated file (default 5 MiB, 3 backups kept), UTC
  * timestamps, and the reference's line format
  * `ts | LEVEL | module | pipeline_name | run_id | message`.
  *
  * Like the JSONL control sinks this is deliberately DRIVER-side: one
  * tiny append per event must never become a distributed job. Rotation
  * shifts `f.log -> f.log.1 -> ... -> f.log.N` and drops the oldest,
  * mirroring RotatingFileHandler.
  */
class RotatingTextLogger(dir: String, fileName: String = "etl_logs.log",
                         maxBytes: Long = 5L * 1024 * 1024,
                         backupCount: Int = 3) {
  Files.createDirectories(Paths.get(dir))
  private val path = Paths.get(dir, fileName)
  private val fmt = java.time.format.DateTimeFormatter
    .ofPattern("yyyy-MM-dd HH:mm:ss,SSS")
    .withZone(java.time.ZoneOffset.UTC)

  def info(runId: String, pipeline: String, module: String,
           msg: String): Unit = log("INFO", runId, pipeline, module, msg)
  def warn(runId: String, pipeline: String, module: String,
           msg: String): Unit = log("WARNING", runId, pipeline, module, msg)
  def error(runId: String, pipeline: String, module: String,
            msg: String): Unit = log("ERROR", runId, pipeline, module, msg)

  private def log(level: String, runId: String, pipeline: String,
                  module: String, msg: String): Unit = synchronized {
    rotateIfNeeded()
    val line = s"${fmt.format(java.time.Instant.now())} | $level | " +
      s"$module | $pipeline | $runId | $msg\n"
    Files.write(path, line.getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
  }

  /** Roll when the current file has reached maxBytes: backups shift up
    * by one, the oldest (index backupCount) is dropped. */
  private def rotateIfNeeded(): Unit =
    if (Files.exists(path) && Files.size(path) >= maxBytes) {
      Files.deleteIfExists(Paths.get(s"$path.$backupCount"))
      for (i <- backupCount - 1 to 1 by -1) {
        val src = Paths.get(s"$path.$i")
        if (Files.exists(src)) Files.move(src, Paths.get(s"$path.${i + 1}"))
      }
      Files.move(path, Paths.get(s"$path.1"))
    }
}
