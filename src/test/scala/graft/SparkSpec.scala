package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session for all suites (one JVM-wide SparkSession). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.session
  val sf: String = "/root/testdata/sf0.001"
}

object SparkSpec {
  /** Count of codegen COMPILE failures logged anywhere in this test
    * JVM. Spark's 64 KB janino fallback is an ERROR log + silent
    * interpreted execution — tests stay green while the plan quietly
    * stops compiling (round-10 verdict: two fallbacks inside RdfSpec
    * slipped past the per-query gate because they came from
    * spec-COMPOSED plans). A log4j2 appender pinned to the
    * CodeGenerator logger turns every such event into a counter that
    * suites assert on ([[assertNoCodegenFallback]]). */
  val codegenErrors = new java.util.concurrent.atomic.AtomicInteger(0)

  private def installCodegenErrorCounter(): Unit = {
    import org.apache.logging.log4j.{Level, LogManager}
    import org.apache.logging.log4j.core.LoggerContext
    import org.apache.logging.log4j.core.appender.AbstractAppender
    import org.apache.logging.log4j.core.config.{LoggerConfig, Property}
    val loggerName = "org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator"
    val ctx = LogManager.getContext(false).asInstanceOf[LoggerContext]
    val cfg = ctx.getConfiguration
    val appender = new AbstractAppender(
      "graft-codegen-error-counter", null, null, true, Property.EMPTY_ARRAY) {
      override def append(event: org.apache.logging.log4j.core.LogEvent): Unit =
        if (event.getLevel.isMoreSpecificThan(Level.ERROR)) codegenErrors.incrementAndGet()
    }
    appender.start()
    val lc = cfg.getLoggerConfig(loggerName) match {
      case exact if exact.getName == loggerName => exact
      case _ =>
        val fresh = new LoggerConfig(loggerName, Level.ERROR, true)
        cfg.addLogger(loggerName, fresh)
        fresh
    }
    lc.addAppender(appender, Level.ERROR, null)
    ctx.updateLoggers()
  }

  /** Assert no codegen compile failure has fired in this JVM so far —
    * call at the end of suites whose compositions ride the 64 KB
    * cliff. A failure names the suite that ran the offending plan via
    * the test ordering, and the sbt log carries the janino stack. */
  def assertNoCodegenFallback(where: String): Unit = {
    val n = codegenErrors.get()
    assert(n == 0,
      s"$where: $n codegen compile failure(s) were logged in this test JVM — " +
        "a plan silently fell back to interpreted execution (check the log for " +
        "'Code grows beyond 64 KB' / 'Failed to compile')")
  }

  lazy val session: SparkSession = {
    val s = GraftSession.builder(master = "local[4]", shufflePartitions = 4).getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    // AFTER SparkContext + setLogLevel: Spark (re)initializes log4j2 at
    // startup, which would wipe a pre-installed programmatic appender
    installCodegenErrorCounter()
    s
  }
}
