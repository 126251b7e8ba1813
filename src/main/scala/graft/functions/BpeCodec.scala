package graft.functions

/** Exact byte-level BPE encoder over an arbitrary-size merge table — the
  * vocab-scale path for t11/t19. The replace-chain Column form
  * ([[TextFunctions.bpeTokenCount]]) compiles one `replace` call PER
  * RULE into the plan, which is the right shape for a ~35-rule fixture
  * and a non-starter at a realistic 30–50k-merge vocabulary (the
  * expression tree alone would be tens of thousands of nodes deep). This
  * codec is the reference encode loop itself — per word, repeatedly
  * merge the LOWEST-RANKED adjacent pair present (all occurrences,
  * left-to-right non-overlapping) until none remains — which is
  * O(len²·lookup) per word independent of vocabulary size, with the
  * whole merge table one plan-constant hash map shipped to executors
  * once per stage (the broadcast-small-table shape).
  *
  * For a well-formed table (every symbol a base character or the product
  * of an earlier rule — merges.txt line order IS rank) this loop is
  * equivalent to applying each rule once in rank order, which is what
  * the replace-chain form and the t11 DuckDB oracle do; `BpeCodecSpec`
  * pins the equivalence on the corpus and on adversarial words, and t11
  * runs THROUGH this codec against its unchanged replace-chain oracle.
  *
  * Symbols are interned to int ids at construction; a word encodes as an
  * int array with in-place merge compaction — no per-word allocation
  * beyond the id buffer. Characters outside the base alphabet get
  * negative ids that by construction appear in no merge rule.
  */
final class BpeCodec(val merges: Seq[(String, String)]) extends Serializable {

  /** (symbol string → id) for base chars and merge outputs; built lazily
    * so a deserialized copy on an executor rebuilds its own maps. */
  @transient private lazy val tables: (java.util.HashMap[String, Integer],
      java.util.HashMap[java.lang.Long, java.lang.Long]) = {
    val syms = new java.util.HashMap[String, Integer]()
    def idOf(s: String): Int = {
      val got = syms.get(s)
      if (got != null) got.intValue()
      else { val id = syms.size(); syms.put(s, id); id }
    }
    // base alphabet first: every single-codepoint prefix of every rule
    // symbol (a rule symbol is itself built from base chars)
    merges.foreach { case (a, b) =>
      (a + b).codePoints().forEach(cp =>
        idOf(new String(Character.toChars(cp))): Unit)
    }
    val ranks = new java.util.HashMap[java.lang.Long, java.lang.Long]()
    merges.zipWithIndex.foreach { case ((a, b), rank) =>
      val key = (idOf(a).toLong << 32) | (idOf(b).toLong & 0xffffffffL)
      val out = idOf(a + b)
      // first rank wins if a duplicate pair appears (merges.txt order)
      if (!ranks.containsKey(key))
        ranks.put(key, (rank.toLong << 32) | (out.toLong & 0xffffffffL))
    }
    (syms, ranks)
  }

  private def symIds = tables._1
  private def pairRanks = tables._2

  /** Token count of one whitespace-free word. */
  def countWord(word: String): Long = {
    if (word.isEmpty) return 0L
    // codepoints → ids; unknown chars get unique negative ids (never in
    // any rule, so they are 1 token each and block merges across them)
    var n = 0
    val ids = new Array[Int](word.length)
    var i = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      val sym = symIds.get(new String(Character.toChars(cp)))
      ids(n) = if (sym != null) sym.intValue() else -(cp + 1)
      n += 1
      i += Character.charCount(cp)
    }
    // reference encode loop: merge the lowest-ranked pair present
    var done = false
    while (!done && n >= 2) {
      var bestRank = Long.MaxValue
      var bestKey = 0L
      var bestOut = 0
      var j = 0
      while (j < n - 1) {
        val key = (ids(j).toLong << 32) | (ids(j + 1).toLong & 0xffffffffL)
        val r = pairRanks.get(key)
        if (r != null && (r.longValue() >>> 32) < bestRank) {
          bestRank = r.longValue() >>> 32
          bestKey = key
          bestOut = r.longValue().toInt
        }
        j += 1
      }
      if (bestRank == Long.MaxValue) done = true
      else {
        // merge ALL occurrences of the best pair, left-to-right
        // non-overlapping, compacting in place
        var w = 0
        var rdr = 0
        while (rdr < n) {
          if (rdr < n - 1 &&
              ((ids(rdr).toLong << 32) |
                (ids(rdr + 1).toLong & 0xffffffffL)) == bestKey) {
            ids(w) = bestOut; rdr += 2
          } else { ids(w) = ids(rdr); rdr += 1 }
          w += 1
        }
        n = w
      }
    }
    n.toLong
  }

  /** Token count of a document: whitespace words encoded independently
    * (identical split semantics to TextFunctions.tokens). */
  def countTokens(text: String): Long = {
    var total = 0L
    var i = 0
    val s = text.trim
    while (i < s.length) {
      var j = i
      while (j < s.length && !Character.isWhitespace(s.charAt(j))) j += 1
      if (j > i) total += countWord(s.substring(i, j))
      i = j + 1
    }
    total
  }
}

/** Merge-table fixtures and merges.txt I/O (the published one-pair-per-
  * line format, rank = line order — the same format the t18 trainer
  * emits, so a trained vocabulary feeds straight back into tokenizing). */
object BpeVocab {

  /** Deterministic synthetic merge table of `n` rules at realistic
    * vocabulary scale. Structure mirrors a trained byte-BPE vocab: the
    * base alphabet is a–z, every rule concatenates two EXISTING symbols
    * (well-formed by construction: line order is a valid training
    * order), picks skew toward short/early symbols (frequent subwords
    * merge first in real training), symbol length capped at 16. Output
    * strings are UNIQUE — each symbol has exactly one producing rule —
    * which is the condition under which the encode loop and the
    * rank-order replace chain are provably equivalent: a duplicate
    * surface string (e.g. "abc" from both (ab,c) and (a,bc)) would let a
    * consumer rule rank between its two producers and see only one of
    * them. Purely a function of (n, seed): replayable everywhere. */
  def synthetic(n: Int, seed: Long = 42L): Seq[(String, String)] = {
    val r = new java.util.Random(seed)
    val syms = scala.collection.mutable.ArrayBuffer.tabulate(26)(i =>
      ('a' + i).toChar.toString)
    val outSeen = scala.collection.mutable.HashSet[String](syms.toSeq: _*)
    val out = scala.collection.mutable.ArrayBuffer[(String, String)]()
    while (out.length < n) {
      // quadratic skew: early (short, "frequent") symbols picked most
      val a = syms((r.nextDouble() * r.nextDouble() * syms.length).toInt)
      val b = syms((r.nextDouble() * r.nextDouble() * syms.length).toInt)
      if (a.length + b.length <= 16 && outSeen.add(a + b)) {
        out += ((a, b))
        syms += a + b
      }
    }
    out.toSeq
  }

  /** Parse merges.txt content (one "left right" pair per line; lines
    * starting with '#' are header comments, per the published format). */
  def parse(lines: Iterator[String]): Seq[(String, String)] =
    lines.filterNot(l => l.isEmpty || l.startsWith("#")).map { l =>
      val sp = l.indexOf(' ')
      (l.substring(0, sp), l.substring(sp + 1))
    }.toSeq

  def load(path: String): Seq[(String, String)] = {
    val src = scala.io.Source.fromFile(path, "UTF-8")
    try parse(src.getLines()) finally src.close()
  }

  def save(merges: Seq[(String, String)], path: String): Unit =
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      merges.map { case (a, b) => s"$a $b" }
        .mkString("", "\n", "\n").getBytes("UTF-8"))
}
