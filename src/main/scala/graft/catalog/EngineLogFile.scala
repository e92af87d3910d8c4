package graft.catalog

import java.nio.file.{Files, Path, StandardOpenOption}
import java.time.Instant

import org.apache.logging.log4j.{Level, LogManager}
import org.apache.logging.log4j.core.{LogEvent, LoggerContext}
import org.apache.logging.log4j.core.appender.AbstractAppender
import org.apache.logging.log4j.core.config.{LoggerConfig, Property}

/** Routes the engine's own log lines (the `graft.catalog` slf4j loggers —
  * register/delete failure reasons, namespace-scan warnings) into the
  * run's `catalog_migration.log`, so the summary's "Please check the
  * `catalog_migration.log` file" instruction is true for them — the
  * reference achieves the same with a root-logger file appender
  * (cli/src/main/resources/logback.xml:20-45). Implemented against the
  * log4j2 core API that Spark bundles; non-additive, so engine INFO
  * detail goes to the file without spamming the Spark console (the CLI
  * mirrors its console lines into the same file separately).
  */
object EngineLogFile {

  private val LoggerName = "graft.catalog"

  private final class LineAppender(name: String, path: Path)
      extends AbstractAppender(name, null, null, true, Property.EMPTY_ARRAY) {
    override def append(event: LogEvent): Unit = try {
      val sb = new StringBuilder()
        .append(Instant.ofEpochMilli(event.getTimeMillis)).append(' ')
        .append('[').append(event.getThreadName).append("] ")
        .append(event.getLevel).append(' ')
        .append(event.getLoggerName).append(" - ")
        .append(event.getMessage.getFormattedMessage)
      Option(event.getThrown).foreach { t =>
        sb.append(System.lineSeparator()).append(t.toString)
        t.getStackTrace.foreach(f =>
          sb.append(System.lineSeparator()).append("\tat ").append(f))
      }
      sb.append(System.lineSeparator())
      synchronized {
        Files.writeString(path, sb.toString(),
          StandardOpenOption.CREATE, StandardOpenOption.APPEND)
      }
    } catch { case _: Exception => () }
  }

  /** Attach a file appender for the engine loggers; returns the detach
    * closure (idempotent) — call it when the run ends so successive CLI
    * invocations with different output dirs don't cross-write. Fail-soft:
    * a logging backend that isn't log4j2-core leaves logging untouched. */
  def attach(logFile: Path): () => Unit =
    try {
      val ctx = LogManager.getContext(false) match {
        case c: LoggerContext => c
        case _ => return () => ()
      }
      val config = ctx.getConfiguration
      val name = s"graft-migration-${System.nanoTime()}"
      val appender = new LineAppender(name, logFile)
      appender.start()
      config.addAppender(appender)
      val (loggerConfig, created) = config.getLoggerConfig(LoggerName) match {
        case lc if lc.getName == LoggerName => (lc, false)
        case _ =>
          val lc = new LoggerConfig(LoggerName, Level.INFO, /* additive = */ false)
          config.addLogger(LoggerName, lc)
          (lc, true)
      }
      val prevLevel = loggerConfig.getLevel
      val prevAdditive = loggerConfig.isAdditive
      loggerConfig.setLevel(Level.INFO)
      loggerConfig.setAdditive(false)
      loggerConfig.addAppender(appender, Level.INFO, null)
      ctx.updateLoggers()
      var detached = false
      () =>
        if (!detached) {
          detached = true
          loggerConfig.removeAppender(name)
          config.getAppenders.remove(name)
          appender.stop()
          // a non-additive LoggerConfig left behind with no appenders
          // would blackhole all later graft.catalog logging in this JVM
          if (created) config.removeLogger(LoggerName)
          else {
            loggerConfig.setLevel(prevLevel)
            loggerConfig.setAdditive(prevAdditive)
          }
          ctx.updateLoggers()
        }
    } catch { case _: Throwable => () => () }
}
