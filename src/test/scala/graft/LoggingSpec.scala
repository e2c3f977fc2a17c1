package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.{ConfigException, Logging}

/** The queued log bridge (reference logging.py:50-162): dictConfig
  * parsing, the QueueHandler/QueueListener drain, python's
  * effective-level prefix rule, and the bounded-queue loud-drop policy
  * the reference's unbounded Manager queue lacks. */
class LoggingSpec extends AnyFunSuite {

  test("dictConfig YAML parses: formatter, file+console handlers, levels") {
    val logFile = java.nio.file.Files.createTempFile("graft_log", ".log")
    val cfg = Logging.parseConfig(
      s"""version: 1
         |formatters:
         |  pytroll:
         |    format: "[%(levelname)s: %(asctime)s : %(name)s] %(message)s"
         |    datefmt: "%Y-%m-%d %H:%M:%S"
         |handlers:
         |  file:
         |    class: logging.FileHandler
         |    formatter: pytroll
         |    filename: $logFile
         |root:
         |  level: INFO
         |  handlers: [file]
         |loggers:
         |  graft.noisy:
         |    level: ERROR
         |""".stripMargin)
    assert(cfg.rootLevel == "INFO")
    assert(cfg.loggerLevels == Map("graft.noisy" -> "ERROR"))
    assert(cfg.handlers.size == 1)
    Logging.loggingOn(cfg) { bridge =>
      bridge.logger("graft.app")("INFO", "hello")
      bridge.logger("graft.app")("DEBUG", "filtered: below root INFO")
      bridge.logger("graft.noisy.sub")("WARNING", "filtered: noisy is ERROR")
      bridge.logger("graft.noisy.sub")("ERROR", "kept")
    }
    val lines = java.nio.file.Files.readAllLines(logFile)
    assert(lines.size == 2, s"got $lines")
    assert(lines.get(0).matches(
      """\[INFO: \d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2} : graft\.app\] hello"""),
      lines.get(0))
    assert(lines.get(1).endsWith(": graft.noisy.sub] kept"))
  }

  test("bad configs are parse-time ConfigExceptions, not log-time surprises") {
    intercept[ConfigException] {
      Logging.parseConfig(
        """version: 1
          |handlers:
          |  h:
          |    class: logging.SMTPHandler
          |root: {handlers: [h]}
          |""".stripMargin)
    }
    intercept[ConfigException] {
      Logging.parseConfig(
        """version: 1
          |handlers:
          |  f: {class: logging.FileHandler}
          |root: {handlers: [f]}
          |""".stripMargin) // FileHandler without filename
    }
    intercept[ConfigException] {
      Logging.parseConfig("version: 1\nroot: {handlers: [nosuch]}\n")
    }
  }

  test("strftime datefmt translates; unsupported codes are config errors") {
    assert(Logging.datefmtToJava("%Y-%m-%d %H:%M:%S") == "yyyy-MM-dd HH:mm:ss")
    assert(Logging.datefmtToJava("%d/%m/%y") == "dd/MM/yy")
    intercept[ConfigException] { Logging.datefmtToJava("%Q") }
    intercept[ConfigException] { Logging.datefmtToJava("trailing %") }
  }

  test("every bad -c input is a parse-time ConfigException (the exit-2 contract)") {
    // ADVICE r13: malformed YAML escaped as a raw snakeyaml exception,
    // bad levels as require()'s IllegalArgumentException, and a bad
    // datefmt only threw at QueueBridge construction inside loggingOn —
    // all past cliMain's -c catch. parseConfig now owns all of them.
    intercept[ConfigException] { Logging.parseConfig("{ not: [valid") }
    intercept[ConfigException] {
      Logging.parseConfig("version: 1\nroot: {level: NOISY}\n")
    }
    intercept[ConfigException] {
      Logging.parseConfig("version: 1\nloggers: {graft.x: {level: WAT}}\n")
    }
    intercept[ConfigException] {
      Logging.parseConfig(
        """version: 1
          |formatters: {f: {datefmt: '%Q'}}
          |handlers: {h: {class: logging.StreamHandler, formatter: f}}
          |root: {handlers: [h]}
          |""".stripMargin)
    }
    intercept[ConfigException] { Logging.parseConfig("version: 2\n") }
  }

  test("concurrent producers drain through one listener; order within a producer holds") {
    val sink = new Logging.CollectingHandler
    val cfg = Logging.defaultConfig().copy(handlers = Seq(sink), rootLevel = "DEBUG")
    Logging.loggingOn(cfg) { bridge =>
      val threads = (0 until 8).map { t =>
        new Thread(() => {
          val log = bridge.logger(s"graft.worker$t")
          (0 until 100).foreach(i => log("INFO", s"m$i"))
        })
      }
      threads.foreach(_.start())
      threads.foreach(_.join())
    } // loggingOn's stop() drains what is queued before returning
    import scala.jdk.CollectionConverters._
    val lines = sink.lines.asScala.toSeq
    assert(lines.size == 800, s"lost records: ${lines.size}")
    // per-producer order is preserved through the single queue
    (0 until 8).foreach { t =>
      val mine = lines.filter(_.contains(s"graft.worker$t]"))
        .map(_.split("m").last.toInt)
      assert(mine == (0 until 100), s"worker$t out of order")
    }
  }

  test("bounded queue drops loudly instead of wedging producers") {
    // a handler that blocks until released wedges the listener — the
    // reference's unbounded Manager queue would grow without limit and
    // producers would never learn; the bridge drops and counts
    val gate = new java.util.concurrent.CountDownLatch(1)
    val slow = new Logging.Handler {
      override def write(line: String): Unit = gate.await()
    }
    val cfg = Logging.defaultConfig().copy(handlers = Seq(slow))
    val bridge = new Logging.QueueBridge(cfg, capacity = 16).start()
    val log = bridge.logger("graft.flood")
    (0 until 200).foreach(i => log("INFO", s"f$i"))
    assert(bridge.dropped > 0, "over-capacity records must be counted as dropped")
    gate.countDown()
    bridge.stop()
  }
}
