package graft.multimodal

/** WebVTT (W3C) text-track parsing — the subtitle/caption modality of
  * a video training corpus (next to Mp4's container walk: MP4 says
  * where the frames are, the VTT track says what is SAID when, which
  * is what a caption-alignment pipeline actually trains on).
  *
  * Real line-level parser with the hostile-input discipline of the
  * other multimodal walkers (Exif/Mp4/Wav): a malformed cue is
  * SKIPPED, never thrown on — a crawl's caption files are exactly as
  * broken as its images.
  *
  * Supported per the spec's core: the `WEBVTT` header (with optional
  * trailing text; BOM tolerated), `NOTE`/`STYLE`/`REGION` blocks
  * (skipped whole), optional cue identifiers, both timestamp shapes
  * (`HH:MM:SS.mmm` and the hour-less `MM:SS.mmm`), cue settings after
  * the arrow (ignored — they style, they don't time), multi-line
  * payloads terminated by a blank line or EOF, and CRLF/CR line
  * endings.
  */
object Vtt {

  /** One parsed cue: 0-based index among KEPT cues, times in ms, the
    * payload lines. */
  final case class Cue(idx: Int, startMs: Long, endMs: Long, lines: Vector[String])

  /** Parse `HH:MM:SS.mmm` or `MM:SS.mmm` to ms; None when malformed.
    * Strict field widths per the spec (minutes/seconds two digits,
    * millis three) — a lax reader silently mis-times sloppy files. */
  private[multimodal] def parseTs(s: String): Option[Long] = {
    val t = s.trim
    val parts = t.split(":")
    def secMs(x: String): Option[(Long, Long)] = {
      val i = x.indexOf('.')
      if (i != 2 || x.length != 6) return None
      val (ss, mmm) = (x.substring(0, 2), x.substring(3))
      if (ss.forall(_.isDigit) && mmm.length == 3 && mmm.forall(_.isDigit))
        Some((ss.toLong, mmm.toLong))
      else None
    }
    parts match {
      case Array(h, m, x) if h.nonEmpty && h.forall(_.isDigit) &&
          m.length == 2 && m.forall(_.isDigit) =>
        secMs(x).collect { case (ss, mmm) if m.toLong < 60 && ss < 60 =>
          ((h.toLong * 60 + m.toLong) * 60 + ss) * 1000 + mmm
        }
      case Array(m, x) if m.length == 2 && m.forall(_.isDigit) =>
        secMs(x).collect { case (ss, mmm) if m.toLong < 60 && ss < 60 =>
          (m.toLong * 60 + ss) * 1000 + mmm
        }
      case _ => None
    }
  }

  /** Parse a whole VTT payload to its kept cues. A file without the
    * WEBVTT header is not a VTT file — zero cues (the frontier keeps
    * the bytes, it just doesn't get a text track out of them). */
  def parse(payload: String): Vector[Cue] = {
    val lines = payload.replace("\r\n", "\n").replace('\r', '\n').split("\n", -1)
    if (lines.isEmpty) return Vector.empty
    val head = lines(0).stripPrefix("﻿")
    if (!(head == "WEBVTT" || head.startsWith("WEBVTT ") ||
        head.startsWith("WEBVTT\t"))) return Vector.empty
    val out = Vector.newBuilder[Cue]
    var idx = 0
    var i = 1
    while (i < lines.length) {
      // skip blank separators
      while (i < lines.length && lines(i).trim.isEmpty) i += 1
      if (i < lines.length) {
        val blockStart = lines(i).trim
        if (blockStart.startsWith("NOTE") || blockStart == "STYLE" ||
            blockStart.startsWith("REGION")) {
          // comment/style/region block: runs to the next blank line
          while (i < lines.length && lines(i).trim.nonEmpty) i += 1
        } else {
          // optional cue id line: the line WITHOUT "-->" before the
          // timing line
          var timing = lines(i)
          if (!timing.contains("-->") && i + 1 < lines.length &&
              lines(i + 1).contains("-->")) {
            i += 1
            timing = lines(i)
          }
          if (timing.contains("-->")) {
            val arrow = timing.indexOf("-->")
            val startS = timing.substring(0, arrow)
            // settings after the end timestamp are whitespace-split off
            val endS = timing.substring(arrow + 3).trim
              .split("[ \t]", 2)(0)
            val parsed = for {
              st <- parseTs(startS)
              en <- parseTs(endS)
              if en > st // zero/negative-length cues are malformed
            } yield (st, en)
            // payload lines to the blank separator
            val body = Vector.newBuilder[String]
            i += 1
            while (i < lines.length && lines(i).trim.nonEmpty) {
              body += lines(i)
              i += 1
            }
            parsed match {
              case Some((st, en)) =>
                out += Cue(idx, st, en, body.result())
                idx += 1
              case None => () // malformed timing: cue skipped whole
            }
          } else {
            // stray text block with no timing anywhere: skip it
            while (i < lines.length && lines(i).trim.nonEmpty) i += 1
          }
        }
      }
    }
    out.result()
  }

  /** Render ms as `HH:MM:SS.mmm` (or `MM:SS.mmm` when `shortForm`) —
    * the writer half of the round trip; the gate fixture uses both
    * shapes so a parser that only reads one hash-fails. */
  def formatTs(ms: Long, shortForm: Boolean = false): String = {
    val mmm = ms % 1000
    val s = ms / 1000 % 60
    val m = ms / 60000 % 60
    val h = ms / 3600000
    if (shortForm) {
      require(h == 0, s"short form cannot carry hours: $ms ms")
      f"$m%02d:$s%02d.$mmm%03d"
    } else f"$h%02d:$m%02d:$s%02d.$mmm%03d"
  }
}
