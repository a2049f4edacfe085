package graft

import org.apache.logging.log4j.{Level, LogManager}
import org.apache.logging.log4j.core.{LogEvent, LoggerContext}
import org.apache.logging.log4j.core.appender.AbstractAppender
import org.apache.logging.log4j.core.config.Property

import java.util.concurrent.CopyOnWriteArrayList

/** Gate against SILENT whole-stage-codegen fallback (VERDICT r9 #3):
  * when janino rejects a generated class (the classic mode is "Code
  * grows beyond 64 KB" in a no-groupkey hash aggregate, which cannot
  * split its update function the way Project stages can), Spark logs
  * one ERROR and runs the plan INTERPRETED — every test still
  * passes, so the perf cliff ships invisibly. This appender hooks the
  * log4j2 root logger and records every ERROR the CodeGenerator
  * emits; suites that stress wide generated code end with an
  * assertion that the record is empty, turning the silent fallback
  * into a red test.
  *
  * Installed once by [[TestSpark]], so the record covers every query
  * the shared session runs, in whichever suite. */
object CodegenErrorWatch {

  val errors = new CopyOnWriteArrayList[String]()

  private lazy val installed: Unit = {
    val ctx = LogManager.getContext(false).asInstanceOf[LoggerContext]
    val appender = new AbstractAppender("graft-codegen-watch", null,
        null, true, Property.EMPTY_ARRAY) {
      override def append(e: LogEvent): Unit =
        if (e.getLevel.isMoreSpecificThan(Level.ERROR)
            && e.getLoggerName != null
            && e.getLoggerName.contains("CodeGenerator"))
          errors.add(e.getLoggerName + ": "
            + e.getMessage.getFormattedMessage.linesIterator
              .take(2).mkString(" | ").take(300))
    }
    appender.start()
    val cfg = ctx.getConfiguration
    cfg.getRootLogger.addAppender(appender, Level.ERROR, null)
    ctx.updateLoggers()
  }

  def install(): Unit = installed

  /** Assertion body shared by the per-suite gate tests. */
  def assertClean(): Unit = {
    import scala.jdk.CollectionConverters._
    assert(errors.isEmpty,
      s"CodeGenerator ERROR(s) fired — a plan silently fell back to " +
        s"interpreted execution:\n  ${errors.asScala.mkString("\n  ")}")
  }
}
