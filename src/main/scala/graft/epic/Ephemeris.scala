package graft.epic

import java.sql.Timestamp

/** Low-precision solar-system ephemerides (P9 — the reference calls astropy
  * `get_body` per image timestamp, watch_dog.py:500-509, _utils/Utils.py:
  * 75-85). EPIC pixels are 1.444°/px (run.py defaults), so sub-degree
  * accuracy is ample:
  *
  *  - planets: Keplerian elements + centennial rates from the public JPL
  *    "Approximate Positions of the Planets" formulation (Standish),
  *    valid 1800–2050, error ≲ arcminutes;
  *  - sun: Meeus low-accuracy solar longitude (error < 0.01°);
  *  - moon: truncated ELP main terms from Meeus ch. 47 (error ≲ 0.3°).
  *
  * Geocentric (not topocentric): parallax at LWA-SV matters only for the
  * moon (< 1°), well under pixel scale. Pure deterministic math — safe in a
  * per-batch UDF; same (body, t) always yields the same position.
  */
object Ephemeris {

  private val ObliquityDeg = 23.43928
  private def d2r(d: Double) = math.toRadians(d)

  /** name → (a, e, I, L, ϖ, Ω) + rates per Julian century (J2000). */
  private val elements: Map[String, (Array[Double], Array[Double])] = Map(
    "mercury" -> (Array(0.38709927, 0.20563593, 7.00497902, 252.25032350,
      77.45779628, 48.33076593),
      Array(0.00000037, 0.00001906, -0.00594749, 149472.67411175,
        0.16047689, -0.12534081)),
    "venus" -> (Array(0.72333566, 0.00677672, 3.39467605, 181.97909950,
      131.60246718, 76.67984255),
      Array(0.00000390, -0.00004107, -0.00078890, 58517.81538729,
        0.00268329, -0.27769418)),
    "earth" -> (Array(1.00000261, 0.01671123, -0.00001531, 100.46457166,
      102.93768193, 0.0),
      Array(0.00000562, -0.00004392, -0.01294668, 35999.37244981,
        0.32327364, 0.0)),
    "mars" -> (Array(1.52371034, 0.09339410, 1.84969142, -4.55343205,
      -23.94362959, 49.55953891),
      Array(0.00001847, 0.00007882, -0.00813131, 19140.30268499,
        0.44441088, -0.29257343)),
    "jupiter" -> (Array(5.20288700, 0.04838624, 1.30439695, 34.39644051,
      14.72847983, 100.47390909),
      Array(-0.00011607, -0.00013253, -0.00183714, 3034.74612775,
        0.21252668, 0.20469106)),
    "saturn" -> (Array(9.53667594, 0.05386179, 2.48599187, 49.95424423,
      92.59887831, 113.66242448),
      Array(-0.00125060, -0.00050991, 0.00193609, 1222.49362201,
        -0.41897216, -0.28867794)),
    "uranus" -> (Array(19.18916464, 0.04725744, 0.77263783, 313.23810451,
      170.95427630, 74.01692503),
      Array(-0.00196176, -0.00004397, -0.00242939, 428.48202785,
        0.40805281, 0.04240589)),
    "neptune" -> (Array(30.06992276, 0.00859048, 1.77004347, -55.12002969,
      44.96476227, 131.78422574),
      Array(0.00026291, 0.00005105, 0.00035372, 218.45945325,
        -0.32241464, -0.00508664)))

  val bodies: Set[String] = elements.keySet - "earth" ++ Set("sun", "moon")

  /** Julian centuries since J2000.0 for a UTC timestamp (TT−UTC ~69 s is
    * negligible at this precision). */
  private def centuries(t: Timestamp): Double = {
    val jd = t.getTime / 86400000.0 + 2440587.5
    (jd - 2451545.0) / 36525.0
  }

  private def norm360(x: Double): Double = {
    val r = x % 360.0
    if (r < 0) r + 360.0 else r
  }

  /** Solve Kepler's equation M = E − e·sin E (radians). */
  private def eccentricAnomaly(mRad: Double, e: Double): Double = {
    var ecc = mRad
    var i = 0
    while (i < 12) { ecc = mRad + e * math.sin(ecc); i += 1 }
    ecc
  }

  /** Heliocentric ecliptic J2000 xyz (AU) for a Keplerian body. */
  private def heliocentric(name: String, T: Double): Array[Double] = {
    val (e0, r) = elements(name)
    val a = e0(0) + r(0) * T
    val ecc = e0(1) + r(1) * T
    val inc = d2r(e0(2) + r(2) * T)
    val ll = e0(3) + r(3) * T
    val peri = e0(4) + r(4) * T
    val node = e0(5) + r(5) * T
    val omega = d2r(peri - node)
    val m = d2r(norm360(ll - peri))
    val bigE = eccentricAnomaly(m, ecc)
    val xp = a * (math.cos(bigE) - ecc)
    val yp = a * math.sqrt(1 - ecc * ecc) * math.sin(bigE)
    val cw = math.cos(omega); val sw = math.sin(omega)
    val co = math.cos(d2r(node)); val so = math.sin(d2r(node))
    val ci = math.cos(inc); val si = math.sin(inc)
    Array(
      (cw * co - sw * so * ci) * xp + (-sw * co - cw * so * ci) * yp,
      (cw * so + sw * co * ci) * xp + (-sw * so + cw * co * ci) * yp,
      (sw * si) * xp + (cw * si) * yp)
  }

  private def eclToRaDec(x: Double, y: Double, z: Double): (Double, Double) = {
    val eps = d2r(ObliquityDeg)
    val xeq = x
    val yeq = y * math.cos(eps) - z * math.sin(eps)
    val zeq = y * math.sin(eps) + z * math.cos(eps)
    val r = math.sqrt(xeq * xeq + yeq * yeq + zeq * zeq)
    (norm360(math.toDegrees(math.atan2(yeq, xeq))),
      math.toDegrees(math.asin(zeq / r)))
  }

  private def sunPosition(T: Double): (Double, Double) = {
    // Meeus low-accuracy solar coordinates
    val l0 = 280.46646 + 36000.76983 * T
    val m = d2r(357.52911 + 35999.05029 * T)
    val c = (1.914602 - 0.004817 * T) * math.sin(m) +
      (0.019993 - 0.000101 * T) * math.sin(2 * m) +
      0.000289 * math.sin(3 * m)
    val lambda = d2r(norm360(l0 + c))
    eclToRaDec(math.cos(lambda), math.sin(lambda), 0.0)
  }

  private def moonPosition(T: Double): (Double, Double) = {
    // Meeus ch. 47, main periodic terms only
    val lp = 218.3164477 + 481267.88123421 * T
    val d = d2r(297.8501921 + 445267.1114034 * T)
    val m = d2r(357.5291092 + 35999.0502909 * T)
    val mp = d2r(134.9633964 + 477198.8675055 * T)
    val f = d2r(93.2720950 + 483202.0175233 * T)
    val lambda = lp + 6.288774 * math.sin(mp) +
      1.274027 * math.sin(2 * d - mp) + 0.658314 * math.sin(2 * d) +
      0.213618 * math.sin(2 * mp) - 0.185116 * math.sin(m) -
      0.114332 * math.sin(2 * f)
    val beta = 5.128122 * math.sin(f) + 0.280602 * math.sin(mp + f) +
      0.277693 * math.sin(mp - f) + 0.173237 * math.sin(2 * d - f)
    val lam = d2r(norm360(lambda)); val bet = d2r(beta)
    eclToRaDec(math.cos(bet) * math.cos(lam), math.cos(bet) * math.sin(lam),
      math.sin(bet))
  }

  /** Geocentric apparent (ra, dec) in degrees, or None for a non-body. */
  def position(body: String, t: Timestamp): Option[(Double, Double)] = {
    val T = centuries(t)
    body.toLowerCase match {
      case "sun" => Some(sunPosition(T))
      case "moon" => Some(moonPosition(T))
      case b if elements.contains(b) && b != "earth" =>
        val p = heliocentric(b, T)
        val e = heliocentric("earth", T)
        Some(eclToRaDec(p(0) - e(0), p(1) - e(1), p(2) - e(2)))
      case _ => None
    }
  }
}
