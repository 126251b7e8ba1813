package graft.functions

/** API-edge parsers (CLI surface of the reference, C4):
  *  - sexagesimal → decimal degrees (P10, __main__.py:177-187 via astropy
  *    SkyCoord) — hourangle RA: deg = 15h + m/4 + s/240; dms Dec.
  *  - human-readable durations (P11, __main__.py:199-211 via the
  *    `humanreadable` package): "6d23h59m59s9ms1us" → microseconds.
  * Pure Scala: these run on the driver when a watch request is parsed,
  * never inside a Spark plan.
  */
object CoordParse {

  private val HmsRe = """^\s*(\d+)h(\d+)m([\d.]+)s\s*$""".r
  private val DmsRe = """^\s*([+-]?)(\d+)d(\d+)m([\d.]+)s\s*$""".r

  /** "21h53m34.2s" → degrees (RA hourangle). */
  def hmsToDeg(s: String): Double = s match {
    case HmsRe(h, m, sec) =>
      15.0 * h.toDouble + m.toDouble / 4.0 + sec.toDouble / 240.0
    case _ => throw new IllegalArgumentException(s"bad hms: '$s'")
  }

  /** "+40d44m02s" → degrees (declination). */
  def dmsToDeg(s: String): Double = s match {
    case DmsRe(sign, d, m, sec) =>
      val v = d.toDouble + m.toDouble / 60.0 + sec.toDouble / 3600.0
      if (sign == "-") -v else v
    case _ => throw new IllegalArgumentException(s"bad dms: '$s'")
  }

  /** Accepts decimal degrees directly or sexagesimal (hourangle when
    * `hourAngle`), like the reference CLI. */
  def parseCoord(s: String, hourAngle: Boolean): Double =
    try s.toDouble
    catch {
      case _: NumberFormatException =>
        if (hourAngle) hmsToDeg(s) else dmsToDeg(s)
    }

  private val DurToken = """(\d+)(d|h|m(?!s)|s|ms|us)""".r

  /** "7d", "6d23h59m59s9ms1us" → microseconds. Unknown tokens are an error
    * (unlike the reference's silent no-op validation — SURVEY §7.3). */
  def durationToMicros(s: String): Long = {
    val trimmed = s.trim
    val tokens = DurToken.findAllMatchIn(trimmed).toSeq
    val consumed = tokens.map(_.matched).mkString
    require(tokens.nonEmpty && consumed == trimmed.replaceAll("\\s", ""),
      s"bad duration: '$s'")
    tokens.map { m =>
      val n = m.group(1).toLong
      m.group(2) match {
        case "d" => n * 86400000000L
        case "h" => n * 3600000000L
        case "m" => n * 60000000L
        case "s" => n * 1000000L
        case "ms" => n * 1000L
        case "us" => n
      }
    }.sum
  }
}
