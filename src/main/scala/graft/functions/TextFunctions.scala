package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text / similarity primitives for the LLM-data-pipeline operators.
  *
  * Everything here is built from `org.apache.spark.sql.functions` higher-order
  * functions — no UDFs — so the expressions stay inside Catalyst (prunable,
  * pushdown-friendly) and are exactly reproducible in the DuckDB oracle SQL
  * (same fold order, same integer arithmetic).
  *
  * Determinism contract: hashes are explicit polynomial/affine arithmetic,
  * not engine-native hash functions (Spark's xxhash64 and DuckDB's hash()
  * disagree), so the oracle can replay them bit-for-bit.
  */
object TextFunctions {

  /** Modulus for all polynomial/affine hashes (fits comfortably in a long:
    * acc < 1e9, acc*31 + 127 < 2^35). */
  val Mod = 1000000007L

  /** Whitespace tokenization. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** Rolling polynomial hash over the characters of a string:
    * fold(acc, ch) = (acc*31 + codepoint(ch)) mod 1e9+7. This is the
    * document fingerprint and the shingle hash. Compiled as the codegen'd
    * graft.plans.PolyHash kernel (identical fold to the split+aggregate
    * HOF form). */
  def fingerprint(s: Column): Column = graft.plans.PolyHash(s)

  /** Modulus of the SECOND independent rolling hash behind
    * [[fingerprintWide]] (base 131; a different prime < 1e9 so
    * acc*131 + codepoint stays far inside a long). */
  val Mod2 = 999999937L

  /** ~2^60 identity key: fingerprint(s)·Mod2 + polyhash131(s) — two
    * INDEPENDENT sub-2^30 rolling hashes packed injectively into one
    * long (max ≈ 1.0e18 < 2^63). Use this wherever a hash REPLACES the
    * value as the equality key (span/segment dedup keys): a single
    * mod-1e9+7 hash has a ~2^30 keyspace, and at the billions of spans
    * a 100 TB corpus yields, birthday collisions would mark unrelated
    * windows as duplicates — a drift the oracle can never catch because
    * it replays the same hash. At ~2^60 the expected collisions across
    * 2^30 distinct keys are ~0.0005. For similarity FEATURES
    * (shingle/minhash inputs) the narrow [[fingerprint]] stays right:
    * a rare feature collision perturbs one Jaccard estimate instead of
    * fabricating a duplicate, and the minhash affine maps need values
    * in the 1e9+7 field. */
  def fingerprintWide(s: Column): Column =
    graft.plans.PolyHash(s) * lit(Mod2) +
      graft.plans.PolyHash(s, 131L, Mod2)

  /** 3-word shingles of a token array (1-based element_at); empty when the
    * document has fewer than 3 tokens. */
  def shingles3(w: Column): Column =
    when(size(w) >= 3,
      transform(sequence(lit(1), size(w) - 2),
        i => concat_ws(" ",
          element_at(w, i), element_at(w, i + 1), element_at(w, i + 2))))
      .otherwise(array().cast("array<string>"))

  /** i-th minhash permutation of a shingle fingerprint: affine map
    * (f*(37+2i) + 1000+i) mod 1e9+7 — min over shingles per doc gives
    * signature position i. */
  def minhashPerm(f: Column, i: Int): Column =
    (f * (37L + 2L * i) + (1000L + i)) % Mod

  /** Byte-BPE merges fixture (published `merges.txt` format: one
    * "left right" pair per line, rank = line order). Well-formed: every
    * symbol is a base character or the product of an EARLIER merge, which
    * is what makes one pass per rule in rank order equivalent to the
    * reference BPE encode loop (repeat: merge the lowest-ranked pair
    * present) — a rule can only ever create pairs involving its own
    * output, and every rule consuming that output ranks later. */
  val BpeMerges: Seq[(String, String)] = Seq(
    ("t", "h"), ("th", "e"), ("i", "n"), ("a", "n"), ("an", "d"),
    ("e", "r"), ("o", "n"), ("r", "e"), ("o", "r"), ("e", "n"),
    ("a", "t"), ("e", "s"), ("o", "u"), ("i", "t"), ("i", "s"),
    ("o", "f"), ("a", "r"), ("a", "l"), ("s", "t"), ("n", "g"),
    ("in", "g"), ("e", "d"), ("t", "o"), ("c", "o"), ("l", "e"),
    ("m", "e"), ("h", "e"), ("u", "r"), ("w", "h"), ("wh", "e"),
    ("c", "h"), ("l", "l"), ("s", "e"), ("o", "m"), ("d", "e"))

  /** Exact byte-level BPE token count (t11): per whitespace word, wrap
    * every character as a bracketed symbol (`"cat"` → `"[c][a][t]"`),
    * apply each merge rule in rank order as a left-to-right
    * non-overlapping replace (`"[a][t]"` → `"[at]"` — `replace` scanning
    * semantics match BPE's merge-all-occurrences step), and count the
    * surviving symbols; the document count is the sum over words. All
    * codegen'd built-ins (regexp_replace / replace / aggregate), and the
    * oracle replays the identical replace chain in DuckDB. */
  def bpeTokenCount(text: Column, merges: Seq[(String, String)] = BpeMerges)
      : Column = {
    def wordTokens(word: Column): Column = {
      val symbols = regexp_replace(word, "(.)", "[$1]")
      val merged = merges.foldLeft(symbols) { case (acc, (a, b)) =>
        call_function("replace", acc, lit(s"[$a][$b]"), lit(s"[$a$b]"))
      }
      // token count = number of '[' left standing
      (length(merged) - length(translate(merged, "[", ""))).cast("long")
    }
    aggregate(tokens(text), lit(0L),
      (acc, w) => acc + wordTokens(w))
  }

  /** BPE-ish token-count estimate: runs of letters, runs of digits, and
    * single non-alnum glyphs each count as one token. */
  def bpeCount(text: Column): Column =
    regexp_count(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"))

  /** Cast a float embedding to double exactly (widening). */
  def toDouble(v: Column): Column = v.cast("array<double>")

  /** Sequential left-fold dot product — same order as DuckDB's
    * list_reduce(list_prepend(0.0, ...)), so results are bit-identical.
    * Compiled as the codegen'd graft.plans.DotProduct kernel (identical
    * fold order to the aggregate/zip_with HOF form, ~40× faster on O(n²)
    * pair joins). */
  def dot(a: Column, b: Column): Column = graft.plans.DotProduct(a, b)

  /** Cosine similarity via sequential folds. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** Deterministic pseudo-random hyperplane j (64-dim): coordinate d is
    * ((1103515245*(j*64+d) + 12345) mod 2001) - 1000, as double. The same
    * integer arithmetic is replayed in the oracle SQL. */
  def hyperplane(j: Int, dim: Int = 64): Column =
    transform(sequence(lit(0), lit(dim - 1)),
      d => ((lit(1103515245L) * (lit(j * dim) + d) + 12345L) % 2001L - 1000L)
        .cast("double"))

  /** Sign-bit of the projection of `v` onto hyperplane j. */
  def lshBit(v: Column, j: Int, dim: Int = 64): Column =
    when(dot(v, hyperplane(j, dim)) > 0d, lit(1L)).otherwise(lit(0L))

  /** LSH bucket id from `nBits` hyperplane sign bits. */
  def lshBucket(v: Column, nBits: Int, dim: Int = 64): Column =
    (0 until nBits).map(j => lshBit(v, j, dim) * (1L << j))
      .reduce(_ + _)
}
