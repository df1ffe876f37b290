package graft.core

import java.util.logging.{Formatter, Level, LogRecord, Logger, StreamHandler}

/** Env-driven logger construction (reference: fluvii/logging_utils.py) —
  * the last reference module with no graft twin. Parity points:
  *
  *   - level resolves explicit arg > FLUVII_LOGLEVEL env > "INFO"
  *     (logging_utils.py:21-22);
  *   - one stdout handler per logger, at the same level, with the format
  *     "PID {process} - {asctime} - {name} - {levelname}: {message}"
  *     (logging_utils.py:6-18);
  *   - no propagation to parent handlers (logging_utils.py:30).
  *
  * Python level names are accepted (DEBUG/INFO/WARNING/ERROR/CRITICAL) and
  * mapped onto java.util.logging levels; emitted records render the PYTHON
  * level name so log lines are format-identical across the two stacks. */
object Logging {

  /** FLUVII_LOGLEVEL with the reference's default (logging_utils.py:21-22),
    * resolved through the dotenv-aware environment. */
  def loglevel(e: Map[String, String] = Configs.effectiveEnv()): String =
    e.getOrElse("FLUVII_LOGLEVEL", "INFO")

  /** Python's CRITICAL as a distinct JUL level (above SEVERE): mapping it
    * onto SEVERE would render critical lines as "ERROR", breaking
    * format-identity with the reference for level-keyed alerting. */
  object Critical extends Level("CRITICAL", Level.SEVERE.intValue + 100)

  private[core] def toJul(py: String): Level = py.toUpperCase match {
    case "DEBUG"            => Level.FINE
    case "INFO"             => Level.INFO
    case "WARNING" | "WARN" => Level.WARNING
    case "ERROR"            => Level.SEVERE
    case "CRITICAL"         => Critical
    case other              => Level.parse(other)
  }

  private[core] def pyLevelName(l: Level): String =
    if (l.intValue >= Critical.intValue) "CRITICAL"
    else if (l.intValue >= Level.SEVERE.intValue) "ERROR"
    else if (l.intValue >= Level.WARNING.intValue) "WARNING"
    else if (l.intValue >= Level.INFO.intValue) "INFO"
    else "DEBUG"

  // java.util.logging's LogManager holds loggers WEAKLY: if the caller
  // drops the returned reference, the configured level/handler would be
  // GC'd and a later getLogger() would silently revert to root-handler
  // formatting. Python's logging (the parity reference) retains loggers
  // forever; this registry matches that.
  private val retained =
    new java.util.concurrent.ConcurrentHashMap[String, Logger]()

  /** "PID {process} - {asctime} - {name} - {levelname}: {message}" with
    * Python's default asctime rendering (comma millis). */
  final class LineFormatter extends Formatter {
    private val ts =
      java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss,SSS")
    override def format(r: LogRecord): String = {
      val when = java.time.LocalDateTime
        .ofInstant(r.getInstant, java.time.ZoneId.systemDefault)
        .format(ts)
      val pid = ProcessHandle.current().pid()
      s"PID $pid - $when - ${r.getLoggerName} - ${pyLevelName(r.getLevel)}: ${formatMessage(r)}\n"
    }
  }

  /** logging_utils.init_logger: named logger, resolved level, one stdout
    * handler in the pinned format, propagation off. Idempotent — re-init
    * replaces the handler set rather than stacking duplicates. */
  def initLogger(name: String, loglevel: Option[String] = None,
      e: Map[String, String] = Configs.effectiveEnv()): Logger = {
    val lvl = toJul(loglevel.getOrElse(this.loglevel(e)))
    val logger = Logger.getLogger(name)
    logger.setLevel(lvl)
    logger.setUseParentHandlers(false) // propagate = False
    logger.getHandlers.foreach(logger.removeHandler)
    val h = new StreamHandler(System.out, new LineFormatter) {
      override def publish(rec: LogRecord): Unit = { super.publish(rec); flush() }
    }
    h.setLevel(lvl)
    logger.addHandler(h)
    retained.put(name, logger)
    logger
  }
}
