package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Batched BPE vocabulary training — the SCALE path of t18's exact
  * trainer. Sequential BPE (Sennrich et al. 2016) runs one Spark round
  * per learned merge: count adjacent pairs, pick the argmax, rewrite.
  * Exact and fine at 8 merges (t18's oracle unrolls it), structurally
  * non-viable at a realistic 30–50k-merge vocabulary — 50,000 driver
  * round-trips each launching a full corpus pass.
  *
  * This trainer learns up to `batch` merges per round under a
  * NON-INTERACTION constraint: candidates are accepted in count order
  * (ties → lexicographic pair, t18's order) but a pair is skipped this
  * round if any of its operands or its output shares a symbol with an
  * already-accepted pair. Non-interacting merges cannot overlap in any
  * word (an overlap of "a b" and "x y" requires a shared symbol), so
  * within a round every accepted pair's count is exactly what the
  * sequential trainer would also have seen — `batch = 1` IS sequential
  * BPE (spec-pinned against t18), and larger batches deviate only where
  * a brand-new pair involving a just-created symbol would out-count a
  * later batch member (the standard batched-BPE approximation; real
  * tokenizers accept it because pair counts are heavy-tailed). 50k
  * merges at batch 256 is ~200 Spark rounds instead of 50,000.
  *
  * Scale shape: training runs over the DISTINCT-WORD frequency table
  * (corpus read once, then vocabulary-sized data); each round is one
  * partial-aggregated pair count, a `4·batch`-row collect (the
  * control-plane batch, replacing t18's 1-row collect), and ONE
  * declarative rewrite pass — the per-word merge application is a pure
  * Catalyst `aggregate` fold over the symbol array with the accepted
  * batch as a broadcast map literal, so the rewrite stays codegen'd and
  * shuffle-free.
  */
object BpeTrainer {

  final case class Merge(rank: Int, lhs: String, rhs: String,
      merged: String, nOcc: Long)

  // key separator for the (pend, next) map lookup: never occurs inside
  // a symbol (corpus is [a-z]+) and keeps keys unambiguous — ("ab","c")
  // and ("a","bc") are different pairs
  private val Sep = "\u0001"

  /** The t18 word-frequency table: distinct lowercase words split into
    * single-char symbol arrays, with corpus counts. */
  def wordTable(docs: DataFrame): DataFrame =
    docs
      .select(explode(split(trim(col("text")), "\\s+")).as("w"))
      .where(col("w").rlike("^[a-z]+$"))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .select(split(col("w"), "").as("y"), col("cnt"))

  /** One declarative rewrite pass: apply the non-interacting `pairs`
    * ((lhs, rhs) → merged) to a symbol-array column, left-to-right
    * non-overlapping — a Catalyst `aggregate` fold, no UDF. */
  private def applyBatch(y: Column,
      pairs: Seq[(String, String, String)]): Column = {
    val m = map(pairs.flatMap { case (a, b, out) =>
      Seq(lit(a + Sep + b), lit(out)) }: _*)
    val folded = aggregate(
      y,
      struct(array().cast("array<string>").as("out"),
        lit("").as("pend")),
      (acc, x) => {
        val pend = acc.getField("pend")
        val hit = element_at(m, concat(pend, lit(Sep), x))
        when(pend === "",
          struct(acc.getField("out").as("out"), x.as("pend")))
          .when(hit.isNotNull,
            struct(concat(acc.getField("out"), array(hit)).as("out"),
              lit("").as("pend")))
          .otherwise(
            struct(concat(acc.getField("out"), array(pend)).as("out"),
              x.as("pend")))
      },
      acc => when(acc.getField("pend") === "", acc.getField("out"))
        .otherwise(concat(acc.getField("out"),
          array(acc.getField("pend")))))
    folded
  }

  /** Learn up to `nMerges` rules from `docs` (a documents frame with a
    * `text` column), `batch` per round. Returns merges in rank order —
    * directly saveable as merges.txt ([[graft.functions.BpeVocab]]). */
  def train(docs: DataFrame, nMerges: Int, batch: Int = 256)
      : Seq[Merge] = {
    require(nMerges >= 1 && batch >= 1)
    val learned = Seq.newBuilder[Merge]
    var rank = 0
    // eager localCheckpoint, not persist: each round's rewrite nests a
    // batch-sized map-literal fold over the PREVIOUS round's plan, so
    // without lineage truncation the expression tree grows by one fold
    // per round and a vocab-scale run (5k merges ≈ 25 rounds) dies in
    // driver heap before any executor works. Checkpoint blocks free via
    // the ContextCleaner when the next round drops its reference (the
    // DupClusters round pattern).
    var words = wordTable(docs).localCheckpoint(true)
    var exhausted = false
    while (rank < nMerges && !exhausted) {
      // candidate pool: 4× the batch so the non-interaction filter
      // has slack (rejected pairs surface again next round anyway)
      val cands = words
        .where(size(col("y")) >= 2)
        .select(col("cnt"), explode(expr(
          "transform(sequence(1, size(y) - 1), i -> " +
            "struct(element_at(y, i) as a, element_at(y, i + 1) as b))"))
          .as("p"))
        .groupBy(col("p.a"), col("p.b")).agg(sum(col("cnt")).as("n"))
        // t18's order: count desc, then the bracketed-pair string —
        // which for same-count pairs is (a, b) lexicographic
        .orderBy(col("n").desc, concat(lit("["), col("a"), lit("]["),
          col("b"), lit("]")).asc)
        .limit(4 * batch)
        .collect()
      if (cands.isEmpty) exhausted = true
      else {
        val used = scala.collection.mutable.HashSet[String]()
        val accepted = Seq.newBuilder[(String, String, String)]
        var taken = 0
        val it = cands.iterator
        while (it.hasNext && taken < batch && rank + taken < nMerges) {
          val r = it.next()
          val (a, b, n) = (r.getString(0), r.getString(1), r.getLong(2))
          if (!used(a) && !used(b) && !used(a + b)) {
            used ++= Seq(a, b, a + b)
            accepted += ((a, b, a + b))
            learned += Merge(rank + taken + 1, a, b, a + b, n)
            taken += 1
          }
        }
        val pairs = accepted.result()
        if (pairs.isEmpty) exhausted = true
        else {
          rank += pairs.size
          words = words
            .select(applyBatch(col("y"), pairs).as("y"), col("cnt"))
            .localCheckpoint(true)
        }
      }
  }
    learned.result()
  }
}
