package graft.functions

import org.scalatest.funsuite.AnyFunSuite

class CoordParseSpec extends AnyFunSuite {

  test("hms → degrees matches the astropy hourangle conversion") {
    // Cyg A from the reference's example.txt: 19h59m28.3s ≈ 299.868°
    assert(math.abs(CoordParse.hmsToDeg("19h59m28.3566s") - 299.8681525) < 1e-4)
    assert(CoordParse.hmsToDeg("0h0m0s") == 0.0)
    assert(CoordParse.hmsToDeg("12h0m0s") == 180.0)
  }

  test("dms → degrees with sign") {
    assert(math.abs(CoordParse.dmsToDeg("+40d44m02s") - 40.733889) < 1e-4)
    assert(math.abs(CoordParse.dmsToDeg("-23d30m0s") + 23.5) < 1e-9)
  }

  test("parseCoord passes decimals through") {
    assert(CoordParse.parseCoord("299.868", hourAngle = true) == 299.868)
    assert(CoordParse.parseCoord("19h59m28.3566s", hourAngle = true) > 299.0)
  }

  test("durations: reference examples parse exactly") {
    assert(CoordParse.durationToMicros("7d") == 7L * 86400000000L)
    // "6d23h59m59s9ms1us" from __main__.py:199-211
    assert(CoordParse.durationToMicros("6d23h59m59s9ms1us") ==
      6L * 86400000000L + 23L * 3600000000L + 59L * 60000000L +
        59L * 1000000L + 9L * 1000L + 1L)
  }

  test("durations: garbage rejected (validation bug fixed, SURVEY §7.3)") {
    intercept[IllegalArgumentException](CoordParse.durationToMicros("7x"))
    intercept[IllegalArgumentException](CoordParse.durationToMicros(""))
    intercept[IllegalArgumentException](CoordParse.durationToMicros("d7"))
  }
}
