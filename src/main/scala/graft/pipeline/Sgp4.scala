package graft.pipeline

import java.time.Instant

/** Two-line element set, parsed into the mean elements SGP4 consumes.
  *
  * The reference's F5 sunlight check builds its overpass footprint from
  * pyorbital's `Orbital` (trollflow2/plugins/__init__.py:823-846), which
  * reads exactly these fields from a TLE and propagates with SGP4. The
  * format and the algorithm are public: CelesTrak's TLE format
  * description and Spacetrack Report #3 (Hoots & Roehrich, 1980), as
  * revisited by Vallado et al. (AIAA 2006-6753).
  *
  * Angles are stored in DEGREES as printed in the TLE; `meanMotionRevDay`
  * in revolutions/day; `epoch` resolved to a UTC instant from the
  * YYDDD.dddddddd field (years 57-99 → 19xx, 00-56 → 20xx, per the
  * CelesTrak convention).
  */
final case class Tle(
    satNum: Int,
    epoch: Instant,
    bstar: Double,
    inclinationDeg: Double,
    raanDeg: Double,
    eccentricity: Double,
    argPerigeeDeg: Double,
    meanAnomalyDeg: Double,
    meanMotionRevDay: Double)

object Tle {
  /** Modulo-10 TLE checksum: digits count as themselves, '-' as 1,
    * everything else 0, over the first 68 columns. */
  def checksum(line: String): Int =
    line.take(68).foldLeft(0) { (acc, c) =>
      acc + (if (c.isDigit) c - '0' else if (c == '-') 1 else 0)
    } % 10

  /** Exponent-notation field like ` 66816-4` → 0.66816e-4. */
  private def expField(s: String): Double = {
    val t = s.trim
    if (t.isEmpty || t == "+" || t == "-") 0.0
    else {
      val mantSign = if (t.startsWith("-")) -1.0 else 1.0
      val body = t.stripPrefix("-").stripPrefix("+")
      val expIdx = body.lastIndexWhere(c => c == '-' || c == '+')
      val (mant, exp) =
        if (expIdx <= 0) (body, "0") else body.splitAt(expIdx)
      mantSign * s"0.$mant".toDouble * math.pow(10.0, exp.toDouble)
    }
  }

  private def epochInstant(field: String): Instant = {
    val yy = field.take(2).trim.toInt
    val year = if (yy >= 57) 1900 + yy else 2000 + yy
    val doyFrac = field.drop(2).trim.toDouble
    val dayOfYear = doyFrac.toInt
    val frac = doyFrac - dayOfYear
    val midnight = java.time.LocalDate.ofYearDay(year, dayOfYear)
      .atStartOfDay(java.time.ZoneOffset.UTC).toInstant
    midnight.plusNanos(math.round(frac * 86400.0 * 1e9))
  }

  def parse(line1: String, line2: String): Tle = {
    require(line1.length >= 69 && line1(0) == '1',
      s"TLE line 1 malformed: '${line1.take(20)}...'")
    require(line2.length >= 69 && line2(0) == '2',
      s"TLE line 2 malformed: '${line2.take(20)}...'")
    require(checksum(line1) == line1(68) - '0',
      s"TLE line 1 checksum ${line1(68)} != computed ${checksum(line1)}")
    require(checksum(line2) == line2(68) - '0',
      s"TLE line 2 checksum ${line2(68)} != computed ${checksum(line2)}")
    val sat1 = line1.substring(2, 7).trim.toInt
    val sat2 = line2.substring(2, 7).trim.toInt
    require(sat1 == sat2, s"TLE satellite numbers disagree: $sat1 vs $sat2")
    Tle(
      satNum = sat1,
      epoch = epochInstant(line1.substring(18, 32)),
      bstar = expField(line1.substring(53, 61)),
      inclinationDeg = line2.substring(8, 16).trim.toDouble,
      raanDeg = line2.substring(17, 25).trim.toDouble,
      eccentricity = s"0.${line2.substring(26, 33).trim}".toDouble,
      argPerigeeDeg = line2.substring(34, 42).trim.toDouble,
      meanAnomalyDeg = line2.substring(43, 51).trim.toDouble,
      meanMotionRevDay = line2.substring(52, 63).trim.toDouble)
  }
}

/** SGP4 near-earth propagator (Spacetrack Report #3, WGS-72 constants)
  * — the model behind every TLE in the public catalog and behind
  * pyorbital's `Orbital.get_lonlatalt`, which the reference's
  * `check_sunlight_coverage`/`covers` plugins use for their overpass
  * geometry (trollflow2/plugins/__init__.py:823-846, trollsched `Pass`).
  *
  * This is a from-the-equations implementation of the published
  * algorithm: epoch initialization (un-Kozai of the mean motion, C/D
  * drag coefficients), secular gravity + drag update, long-period
  * periodics, Kepler iteration, and short-period periodics, yielding
  * TEME-of-date position/velocity. Deep-space (SDP4) terms are out of
  * scope: every LEO imager the reference flies (period well under 225
  * minutes) is a near-earth case, and the constructor enforces that.
  *
  * Verified against the Spacetrack Report #3 SGP4 test case (satellite
  * 88888, t = 0..1440 min) in Sgp4Spec.
  */
final class Sgp4(tle: Tle) {
  import math._

  // WGS-72 constants, the set TLEs are fitted against (STR#3 / Vallado)
  private val reKm = 6378.135
  private val xke = 0.0743669161 // sqrt(GM) in (earth radii)^1.5 / min
  private val j2 = 1.082616e-3
  private val j3 = -2.53881e-6
  private val j4 = -1.65597e-6
  private val ck2 = 0.5 * j2
  private val ck4 = -0.375 * j4
  private val qoms2t = 1.88027916e-9 // ((120-78)/re)^4
  private val s0 = 1.01222928 // 78/re + 1
  private val a3ovk2 = -j3 / ck2

  // ---- epoch mean elements (radians, rad/min) ----
  private val xincl = toRadians(tle.inclinationDeg)
  private val xnodeo = toRadians(tle.raanDeg)
  private val eo = tle.eccentricity
  private val omegao = toRadians(tle.argPerigeeDeg)
  private val xmo = toRadians(tle.meanAnomalyDeg)
  private val xno = tle.meanMotionRevDay * 2.0 * Pi / 1440.0
  private val bstar = tle.bstar

  require(eo > 0.0 && eo < 1.0, s"eccentricity $eo out of (0,1)")

  // ---- initialization: un-Kozai the mean motion ----
  private val cosio = cos(xincl)
  private val theta2 = cosio * cosio
  private val x3thm1 = 3.0 * theta2 - 1.0
  private val eosq = eo * eo
  private val betao2 = 1.0 - eosq
  private val betao = sqrt(betao2)
  private val a1 = pow(xke / xno, 2.0 / 3.0)
  private val del1 = 1.5 * ck2 * x3thm1 / (a1 * a1 * betao * betao2)
  private val ao =
    a1 * (1.0 - del1 * (1.0 / 3.0 + del1 * (1.0 + 134.0 / 81.0 * del1)))
  private val delo = 1.5 * ck2 * x3thm1 / (ao * ao * betao * betao2)
  private val xnodp = xno / (1.0 + delo) // "brouwer" mean motion
  private val aodp = ao / (1.0 - delo)

  require(2.0 * Pi / xnodp < 225.0,
    s"period ${2.0 * Pi / xnodp} min is deep-space (SDP4), unsupported")

  // perigee-dependent s / qoms2t adjustment
  private val perigeKm = (aodp * (1.0 - eo) - 1.0) * reKm
  private val (s4, qoms24) =
    if (perigeKm < 156.0) {
      val s4km = if (perigeKm < 98.0) 20.0 else perigeKm - 78.0
      (s4km / reKm + 1.0, pow((120.0 - s4km) / reKm, 4.0))
    } else (s0, qoms2t)

  private val isimp = aodp * (1.0 - eo) / 1.0 < (220.0 / reKm + 1.0)

  private val pinvsq = 1.0 / (aodp * aodp * betao2 * betao2)
  private val tsi = 1.0 / (aodp - s4)
  private val eta = aodp * eo * tsi
  private val etasq = eta * eta
  private val eeta = eo * eta
  private val psisq = abs(1.0 - etasq)
  private val coef = qoms24 * pow(tsi, 4.0)
  private val coef1 = coef / pow(psisq, 3.5)
  private val c2 = coef1 * xnodp *
    (aodp * (1.0 + 1.5 * etasq + eeta * (4.0 + etasq)) +
      0.75 * ck2 * tsi / psisq * x3thm1 *
        (8.0 + 3.0 * etasq * (8.0 + etasq)))
  private val c1 = bstar * c2
  private val sinio = sin(xincl)
  private val c3 =
    if (eo > 1.0e-4) coef * tsi * a3ovk2 * xnodp * sinio / eo else 0.0
  private val x1mth2 = 1.0 - theta2
  private val c4 = 2.0 * xnodp * coef1 * aodp * betao2 *
    (eta * (2.0 + 0.5 * etasq) + eo * (0.5 + 2.0 * etasq) -
      2.0 * ck2 * tsi / (aodp * psisq) *
        (-3.0 * x3thm1 * (1.0 - 2.0 * eeta + etasq * (1.5 - 0.5 * eeta)) +
          0.75 * x1mth2 * (2.0 * etasq - eeta * (1.0 + etasq)) *
            cos(2.0 * omegao)))
  private val c5 = 2.0 * coef1 * aodp * betao2 *
    (1.0 + 2.75 * (etasq + eeta) + eeta * etasq)
  private val theta4 = theta2 * theta2
  private val temp1i = 3.0 * ck2 * pinvsq * xnodp
  private val temp2i = temp1i * ck2 * pinvsq
  private val temp3i = 1.25 * ck4 * pinvsq * pinvsq * xnodp
  private val xmdot = xnodp + 0.5 * temp1i * betao * x3thm1 +
    0.0625 * temp2i * betao * (13.0 - 78.0 * theta2 + 137.0 * theta4)
  private val x1m5th = 1.0 - 5.0 * theta2
  private val omgdot = -0.5 * temp1i * x1m5th +
    0.0625 * temp2i * (7.0 - 114.0 * theta2 + 395.0 * theta4) +
    temp3i * (3.0 - 36.0 * theta2 + 49.0 * theta4)
  private val xhdot1 = -temp1i * cosio
  private val xnodot = xhdot1 +
    (0.5 * temp2i * (4.0 - 19.0 * theta2) +
      2.0 * temp3i * (3.0 - 7.0 * theta2)) * cosio
  private val omgcof = bstar * c3 * cos(omegao)
  private val xmcof =
    if (eo > 1.0e-4) -2.0 / 3.0 * coef * bstar / eeta else 0.0
  private val xnodcf = 3.5 * betao2 * xhdot1 * c1
  private val t2cof = 1.5 * c1
  private val xlcof =
    0.125 * a3ovk2 * sinio * (3.0 + 5.0 * cosio) / (1.0 + cosio)
  private val aycof = 0.25 * a3ovk2 * sinio
  private val delmo = pow(1.0 + eta * cos(xmo), 3.0)
  private val sinmo = sin(xmo)
  private val x7thm1 = 7.0 * theta2 - 1.0
  // non-simplified drag terms
  private val (d2, d3, d4, t3cof, t4cof, t5cof) =
    if (isimp) (0.0, 0.0, 0.0, 0.0, 0.0, 0.0)
    else {
      val c1sq = c1 * c1
      val d2v = 4.0 * aodp * tsi * c1sq
      val temp = d2v * tsi * c1 / 3.0
      val d3v = (17.0 * aodp + s4) * temp
      val d4v = 0.5 * temp * aodp * tsi * (221.0 * aodp + 31.0 * s4) * c1
      val t3 = d2v + 2.0 * c1sq
      val t4 = 0.25 * (3.0 * d3v + c1 * (12.0 * d2v + 10.0 * c1sq))
      val t5 = 0.2 * (3.0 * d4v + 12.0 * c1 * d3v + 6.0 * d2v * d2v +
        15.0 * c1sq * (2.0 * d2v + c1sq))
      (d2v, d3v, d4v, t3, t4, t5)
    }

  /** TEME-of-date position (km) and velocity (km/s) at `tMin` minutes
    * after the TLE epoch. */
  def propagate(tMin: Double): (Array[Double], Array[Double]) = {
    val tsince = tMin
    // secular gravity and atmospheric drag
    val xmdf = xmo + xmdot * tsince
    val omgadf = omegao + omgdot * tsince
    val xnoddf = xnodeo + xnodot * tsince
    val tsq = tsince * tsince
    val xnode = xnoddf + xnodcf * tsq
    var tempa = 1.0 - c1 * tsince
    var tempe = bstar * c4 * tsince
    var templ = t2cof * tsq
    var omega = omgadf
    var xmp = xmdf
    if (!isimp) {
      val delomg = omgcof * tsince
      val delm = xmcof * (pow(1.0 + eta * cos(xmdf), 3.0) - delmo)
      val temp = delomg + delm
      xmp = xmdf + temp
      omega = omgadf - temp
      val tcube = tsq * tsince
      val tfour = tsince * tcube
      tempa = tempa - d2 * tsq - d3 * tcube - d4 * tfour
      tempe = tempe + bstar * c5 * (sin(xmp) - sinmo)
      templ = templ + t3cof * tcube + tfour * (t4cof + tsince * t5cof)
    }
    val a = aodp * tempa * tempa
    val e = eo - tempe
    require(e > -0.001 && e < 1.0, s"eccentricity $e decayed out of range at t=$tMin")
    val eClamped = max(1.0e-6, e)
    val xl = xmp + omega + xnode + xnodp * templ
    val beta = sqrt(1.0 - eClamped * eClamped)
    val xn = xke / pow(a, 1.5)
    // long-period periodics
    val axn = eClamped * cos(omega)
    val templp = 1.0 / (a * beta * beta)
    val xll = templp * xlcof * axn
    val aynl = templp * aycof
    val xlt = xl + xll
    val ayn = eClamped * sin(omega) + aynl
    // Kepler's equation for (E + omega)
    val capu = mod2pi(xlt - xnode)
    var epw = capu
    var converged = false
    var iter = 0
    var sinepw = 0.0; var cosepw = 0.0
    var temp4 = 0.0; var temp5 = 0.0; var temp6 = 0.0
    // 25-iteration cap (matching common SGP4 ports, e.g. Vallado's
    // C++ release): the ±0.95 step clamp can legitimately spend many
    // early iterations in clamped steps when |M−E| starts near pi at
    // high eccentricity; 10 was tight enough to throw on valid TLEs.
    while (!converged && iter < 25) {
      sinepw = sin(epw)
      cosepw = cos(epw)
      val temp3 = axn * sinepw
      temp4 = ayn * cosepw
      temp5 = axn * cosepw
      temp6 = ayn * sinepw
      // Vallado's ±0.95-rad step clamp: near-singular (1 - axn·cosE -
      // ayn·sinE) denominators otherwise fling the Newton iterate far
      // from the root and the loop oscillates instead of converging
      val rawStep = (capu - temp4 + temp3 - epw) / (1.0 - temp5 - temp6)
      val step = max(-0.95, min(0.95, rawStep))
      val next = epw + step
      converged = abs(next - epw) <= 1.0e-12
      epw = next
      iter += 1
    }
    require(converged,
      s"Kepler iteration did not converge in $iter steps at t=$tMin " +
        s"(axn=$axn ayn=$ayn) — refusing to emit a degraded position")
    sinepw = sin(epw); cosepw = cos(epw)
    temp4 = ayn * cosepw; temp5 = axn * cosepw; temp6 = ayn * sinepw
    // short-period preliminary quantities
    val ecose = temp5 + temp6
    val esine = axn * sinepw - ayn * cosepw
    val elsq = axn * axn + ayn * ayn
    val pl = a * (1.0 - elsq)
    val r = a * (1.0 - ecose)
    val rdot = xke * sqrt(a) * esine / r
    val rfdot = xke * sqrt(pl) / r
    val betal = sqrt(1.0 - elsq)
    val t3 = esine / (1.0 + betal)
    val cosu = a / r * (cosepw - axn + ayn * t3)
    val sinu = a / r * (sinepw - ayn - axn * t3)
    val u = atan2(sinu, cosu)
    val sin2u = 2.0 * sinu * cosu
    val cos2u = 2.0 * cosu * cosu - 1.0
    val tempsp = 1.0 / pl
    val temp1 = ck2 * tempsp
    val temp2 = temp1 * tempsp
    // short-period periodics
    val rk = r * (1.0 - 1.5 * temp2 * betal * x3thm1) +
      0.5 * temp1 * x1mth2 * cos2u
    val uk = u - 0.25 * temp2 * x7thm1 * sin2u
    val xnodek = xnode + 1.5 * temp2 * cosio * sin2u
    val xinck = xincl + 1.5 * temp2 * cosio * sinio * cos2u
    val rdotk = rdot - xn * temp1 * x1mth2 * sin2u
    val rfdotk = rfdot + xn * temp1 * (x1mth2 * cos2u + 1.5 * x3thm1)
    // orientation vectors and TEME state
    val sinuk = sin(uk); val cosuk = cos(uk)
    val sinik = sin(xinck); val cosik = cos(xinck)
    val sinnok = sin(xnodek); val cosnok = cos(xnodek)
    val xmx = -sinnok * cosik
    val xmy = cosnok * cosik
    val ux = xmx * sinuk + cosnok * cosuk
    val uy = xmy * sinuk + sinnok * cosuk
    val uz = sinik * sinuk
    val vx = xmx * cosuk - cosnok * sinuk
    val vy = xmy * cosuk - sinnok * sinuk
    val vz = sinik * cosuk
    val pos = Array(rk * ux * reKm, rk * uy * reKm, rk * uz * reKm)
    val vel = Array(
      (rdotk * ux + rfdotk * vx) * reKm / 60.0,
      (rdotk * uy + rfdotk * vy) * reKm / 60.0,
      (rdotk * uz + rfdotk * vz) * reKm / 60.0)
    (pos, vel)
  }

  /** Sub-satellite geodetic point at `tMin` minutes after epoch:
    * (latitude°, longitude° in [-180,180), altitude km). TEME → earth-
    * fixed via GMST rotation; geodetic latitude via the standard
    * iterative flattening correction (WGS-72 f = 1/298.26) — the same
    * chain pyorbital's `get_lonlatalt` runs. */
  def subPoint(tMin: Double): (Double, Double, Double) = {
    val (pos, _) = propagate(tMin)
    val theta = gmstRad(tle.epoch.plusNanos(math.round(tMin * 60.0 * 1e9)))
    val lonRad = mod2pi(atan2(pos(1), pos(0)) - theta)
    val rxy = sqrt(pos(0) * pos(0) + pos(1) * pos(1))
    val f = 1.0 / 298.26
    val e2 = f * (2.0 - f)
    var lat = atan2(pos(2), rxy)
    var c = 1.0
    var i = 0
    while (i < 5) {
      val sl = sin(lat)
      c = 1.0 / sqrt(1.0 - e2 * sl * sl)
      lat = atan2(pos(2) + reKm * c * e2 * sl, rxy)
      i += 1
    }
    val alt = rxy / cos(lat) - reKm * c
    val lonDeg = {
      val d = toDegrees(lonRad)
      if (d >= 180.0) d - 360.0 else d
    }
    (toDegrees(lat), lonDeg, alt)
  }

  private def mod2pi(x: Double): Double = {
    val t = x % (2.0 * Pi)
    if (t < 0) t + 2.0 * Pi else t
  }

  /** Greenwich mean sidereal time (radians) — the standard polynomial in
    * UT1 centuries from J2000 (Vallado, "Fundamentals of Astrodynamics",
    * eq. 3-47; treats UTC as UT1, like pyorbital). */
  private def gmstRad(t: Instant): Double = {
    val jd = 2440587.5 + t.toEpochMilli / 86400000.0 // Unix epoch JD
    val tut1 = (jd - 2451545.0) / 36525.0
    val sec = 67310.54841 +
      (876600.0 * 3600.0 + 8640184.812866) * tut1 +
      0.093104 * tut1 * tut1 - 6.2e-6 * tut1 * tut1 * tut1
    val deg = (sec % 86400.0) / 240.0 // 86400 s = 360°
    mod2pi(toRadians(if (deg < 0) deg + 360.0 else deg))
  }
}
