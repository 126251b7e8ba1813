package graft.functions

import graft.SparkSpec
import graft.queries.LlmQueries

/** Behavior specs for KMV set algebra (a06): the union-buffer identity
  * that makes sketch algebra sound (merge-truncate of two buffers IS the
  * buffer of the union), and the query-level consistency contract. The
  * oracle gate separately proves DuckDB equality. */
class KmvAlgebraSpec extends SparkSpec {

  private val k = 16

  test("merged buffers equal the buffer of the concatenated input") {
    val sk = new KmvBuffer(k)
    val xs = (0L until 400L).map(i => (i * 7919L + 11L) % 100003L)
    val ys = (0L until 400L).map(i => (i * 104729L + 5L) % 100003L)
    val direct = (xs ++ ys).foldLeft(sk.zero)(sk.reduce)
    // array-function form the a06 query uses: union, sort, truncate
    val viaAlgebra = (xs.foldLeft(sk.zero)(sk.reduce) ++
      ys.foldLeft(sk.zero)(sk.reduce)).distinct.sorted.take(k).toArray
    assert(java.util.Arrays.equals(direct, viaAlgebra))
  }

  test("buffer is the k smallest distinct values regardless of order") {
    val sk = new KmvBuffer(4)
    val got = Seq(9L, 2L, 9L, 7L, 1L, 5L, 3L).foldLeft(sk.zero)(sk.reduce)
    assert(got.toSeq === Seq(1L, 2L, 3L, 5L))
  }

  test("a06 estimates are consistent and near the exact readout") {
    val rows = LlmQueries.all("a06_sketch_algebra")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getLong(6),
        r.getLong(7)))
    assert(rows.nonEmpty)
    rows.foreach { case (a, b, ea, eb, eu, ei, nu, ni) =>
      // each estimate is independently noisy, so eu can land above
      // ea+eb (that's exactly why est_inter clamps at zero) — the sound
      // invariants are: a full union buffer's k-th value is <= either
      // side's, so eu dominates both sides; the clamp holds; and every
      // estimate sits inside the KMV error band of its exact readout
      assert(eu >= math.max(ea, eb) - 1e-9, s"$a/$b: $eu vs $ea,$eb")
      assert(ei >= 0.0)
      assert(nu >= ni && nu > 0)
      // KMV relative error ~ 1/sqrt(k): allow a generous 3x band
      assert(math.abs(eu - nu) <= 3.0 * nu / math.sqrt(64.0) + 1.0,
        s"$a/$b union est $eu vs exact $nu")
    }
  }
}
