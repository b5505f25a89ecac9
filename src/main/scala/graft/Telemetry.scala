package graft

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, Paths, StandardOpenOption}

/** X6: usage telemetry. The reference posts anonymized usage events to
  * a hosted analytics service (`replibyte/src/telemetry.rs:1-193`,
  * PostHog, opt-out via config). This engine deliberately inverts both
  * defaults: telemetry is OFF unless a sink path is set, and events
  * only ever go to a local JSONL file — a zero-egress engine must not
  * phone home, and the operational questions telemetry answers
  * ("which commands run, how long, did they fail") are served just as
  * well by a file the operator owns and can ship wherever they like.
  */
object Telemetry {

  @volatile private var sink: Option[Path] = None

  /** Enable capture into a local JSONL file (created on first event). */
  def enable(path: String): Unit = { sink = Some(Paths.get(path)) }

  def disable(): Unit = { sink = None }

  def isEnabled: Boolean = sink.isDefined

  /** Capture one event (mirrors the reference's
    * `TelemetryClient::capture_command` surface). No-op when disabled;
    * never throws — telemetry must not fail the job.
    */
  def capture(event: String, props: Map[String, String] = Map.empty): Unit =
    sink.foreach { p =>
      try {
        val fields =
          (Map("event" -> event, "ts_ms" -> System.currentTimeMillis().toString) ++ props)
            .map { case (k, v) => s""""${escape(k)}":"${escape(v)}"""" }
            .mkString("{", ",", "}\n")
        Files.write(p, fields.getBytes(UTF_8),
          StandardOpenOption.CREATE, StandardOpenOption.APPEND)
      } catch { case _: java.io.IOException => () }
    }

  private def escape(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      // remaining control chars must be \u-escaped for valid JSON (and
      // a raw CR/LF would split the JSONL line)
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
}
