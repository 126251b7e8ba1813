package graft.epic

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Sky↔pixel coordinate transforms as Catalyst Column arithmetic.
  *
  * Everything here compiles to built-in codegen'd expressions (trig, floor,
  * when) — no UDFs — so the transforms fuse into whole-stage codegen with the
  * rest of the pipeline and Catalyst can constant-fold the header-derived
  * parameters per image.
  *
  * Semantics derived from the reference (all citations into
  * /root/reference/src/epic_stream_processor/):
  *  - `nearest_pix` rounding: epic_services/watch_dog.py:281-286 —
  *    floor(p + min(frac(p), 0.5)); NOT builtin round (half-up differs at
  *    frac(p) == 0.5: nearest_pix(2.5) = 2 + 0.5 → floor(3.0) = 3, but
  *    nearest_pix(-0.5) = floor(0.0) = 0 while round gives -1).
  *  - world↔pix: epic_services/watch_dog.py:377-381,418-420 call astropy
  *    `all_world2pix`/`all_pix2world`; EPIC headers declare an orthographic
  *    SIN projection (all-sky direction-cosine grid, watch_dog.py:443,
  *    _utils/Utils.py:62-72), reimplemented here from the standard SIN
  *    equations. NaN outside the projection (opposite hemisphere /
  *    l²+m² > 1) matches astropy's NaN behavior, which the downstream NaN
  *    filter (watch_dog.py:422-424) relies on.
  */
object Wcs {

  private val DegPerRad = 180.0 / math.Pi

  /** Reference rounding: floor(p + min(frac(p), 0.5)).
    *
    * Domain note: `p − floor(p)` is always the NON-NEGATIVE fractional
    * part, where the reference's `np.modf` (watch_dog.py:274-293)
    * yields a NEGATIVE frac for p < 0 — so the two roundings diverge
    * for negative pixel coordinates (e.g. p = −0.3: here
    * floor(−0.3 + 0.5) = 0, modf-style floor(−0.3 + (−0.3)) = −1).
    * Observationally masked in the pipeline: both land at x < 0 and
    * the FOV predicate (x ≥ 0 ∧ y ≥ 0, EpicPipeline) drops them —
    * the faithful-to-reference claim holds on the kept domain p ≥ 0
    * (`WcsSpec` documents the masked divergence at p = −0.3). Do not
    * "fix" this either direction without re-checking that filter. */
  def nearestPix(p: Column): Column =
    floor(p + least(p - floor(p), lit(0.5d)))

  /** SIN-projection world→pixel. Inputs/outputs in degrees / 1-based pixel
    * coordinates (astropy origin=1 convention, watch_dog.py:377-381).
    * Returns struct(x, y), NaN outside the projection hemisphere. */
  def world2pix(ra: Column, dec: Column, ra0: Column, dec0: Column,
      crpix1: Column, crpix2: Column, cdelt1: Column, cdelt2: Column): Column = {
    val raR = radians(ra); val decR = radians(dec)
    val ra0R = radians(ra0); val dec0R = radians(dec0)
    val dra = raR - ra0R
    // native-sphere cosine distance: negative ⇒ behind the projection plane
    val cosC = sin(decR) * sin(dec0R) + cos(decR) * cos(dec0R) * cos(dra)
    val l = cos(decR) * sin(dra)
    val m = sin(decR) * cos(dec0R) - cos(decR) * sin(dec0R) * cos(dra)
    val x = when(cosC >= 0d, crpix1 + l * DegPerRad / cdelt1)
      .otherwise(lit(Double.NaN))
    val y = when(cosC >= 0d, crpix2 + m * DegPerRad / cdelt2)
      .otherwise(lit(Double.NaN))
    struct(x.as("x"), y.as("y"))
  }

  /** SIN-projection pixel→world (1-based pixel in, degrees out); NaN when
    * the pixel lies outside the unit direction-cosine disk. RA normalized
    * to [0, 360) like astropy. */
  def pix2world(x: Column, y: Column, ra0: Column, dec0: Column,
      crpix1: Column, crpix2: Column, cdelt1: Column, cdelt2: Column): Column = {
    val l = (x - crpix1) * cdelt1 / DegPerRad
    val m = (y - crpix2) * cdelt2 / DegPerRad
    val s = lit(1.0d) - l * l - m * m
    val dec0R = radians(dec0)
    val sq = sqrt(s)
    val decR = asin(m * cos(dec0R) + sin(dec0R) * sq)
    val raR = radians(ra0) + atan2(l, cos(dec0R) * sq - m * sin(dec0R))
    val ra = when(s >= 0d, pmod(degrees(raR), lit(360.0d)))
      .otherwise(lit(Double.NaN))
    val dec = when(s >= 0d, degrees(decR)).otherwise(lit(Double.NaN))
    struct(ra.as("ra"), dec.as("dec"))
  }

  /** Direction cosine of 0-based pixel x on an n-pixel axis:
    * l = x·(2/n) − 1 (_utils/Utils.py:62-72 — pure arithmetic, the
    * reference's memoized lmn grid never needs materializing). */
  def pixelToLm(p: Column, dim: Column): Column =
    p * 2.0d / dim - 1.0d
}
