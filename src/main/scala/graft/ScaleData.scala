package graft

import org.apache.spark.sql.SparkSession

/** Deterministic scale-up generator for the documents/embeddings corpus —
  * the input of the r8 SCALING PROBE ([[ScaleProbe]]). The driver's own
  * testdata stops at sf0.1 (TESTDATA.md), so every 100 TB claim in this
  * repo rested on plan shape alone; this generator extends the SAME
  * distributional family the driver ships, profiled from
  * `/root/testdata/sf0.1` (read-only — this writes elsewhere):
  *
  *  - documents: 5000·m rows; 31-word vocabulary (the exact sf0.1 word
  *    list), token count uniform 10–100 (observed min 10 / max 100 /
  *    mean 54.1), 20 uniform sources, lang mix en 41% / zh,es,fr,de
  *    ~15% each;
  *  - planted near-dups: ~5% of docs are a ONE-token-mutated copy of an
  *    earlier ≥35-token doc — shingle-Jaccard lands in 0.84–1.0 (the
  *    observed sf0.1 band: 248 pairs in [0.8,1.0], none in [0.3,0.8)),
  *    and the ~1/31 of mutants whose replacement redraws the same word
  *    reproduce the observed trickle of EXACT duplicates (8 at sf0.1);
  *  - embeddings: 2000·m rows; 64-dim unit vectors = normalized
  *    N(0,1)⁶⁴ + 0.56·(label centroid), matching the observed weak
  *    cluster structure (within-label cosine-to-centroid ≈ 0.07), labels
  *    uniform over 10.
  *
  * Everything is a pure function of (fixed seed, row id) — splitmix64
  * per-row streams — so the corpus is identical across runs, partition
  * counts and executors, and a mutant can regenerate its source doc's
  * words without reading it (the copy is O(1), not a join).
  *
  * Usage: `runMain graft.ScaleData <outRoot> <m1,m2,...>` writes
  * `<outRoot>/x<m>/{documents,embeddings}.parquet` per multiplier.
  */
object ScaleData {

  val Vocab: Array[String] = Array(
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window")

  private val Langs = Array("en", "zh", "es", "fr", "de")

  /** splitmix64 — one strong mix so per-row Random seeds are decorrelated
    * even though row ids are sequential. */
  private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private def rng(stream: Long, i: Long) =
    new java.util.Random(mix(stream * 0x100000001b3L ^ i))

  /** Base (pre-mutation) token sequence of doc `i` — pure in `i`. */
  private def baseWords(i: Long): Array[String] = {
    val r = rng(1, i)
    val n = 10 + r.nextInt(91)
    Array.fill(n)(Vocab(r.nextInt(Vocab.length)))
  }

  /** Mutation decision for doc `i`, decidable without generating text:
    * Some(source doc id) when `i` is a planted near-dup. Sources must be
    * non-mutants (no chains — pairs, like the observed corpus) with ≥35
    * tokens (so a 1-token edit keeps Jaccard ≥ ~0.84). */
  private def mutationOf(i: Long): Option[Long] = {
    val r = rng(2, i)
    if (i == 0 || r.nextDouble() >= 0.075) None
    else {
      val j = (mix(3 * 0x100000001b3L ^ i) >>> 1) % i
      // over-approximate "j is a mutant" by j's own first draw alone —
      // j might still have fallen back to base on an unsuitable source,
      // but skipping such a j only trims the planted rate, never chains
      val jMayBeMutant = j != 0 && rng(2, j).nextDouble() < 0.075
      if (jMayBeMutant || baseWords(j).length < 35) None else Some(j)
    }
  }

  final case class Doc(doc_id: Long, text: String, lang: String,
      source: String, n_chars: Long)

  def doc(i: Long): Doc = {
    val words = mutationOf(i) match {
      case Some(j) =>
        val w = baseWords(j).clone()
        val r = rng(4, i)
        w(r.nextInt(w.length)) = Vocab(r.nextInt(Vocab.length))
        w
      case None => baseWords(i)
    }
    val r = rng(5, i)
    val lang =
      if (r.nextDouble() < 0.41) "en" else Langs(1 + r.nextInt(4))
    val text = words.mkString(" ")
    Doc(i, text, lang, s"src${i % 20}", text.length.toLong)
  }

  final case class Emb(vec_id: Long, embedding: Array[Float], label: Int)

  private val Dim = 64

  /** Unit centroid of label `l` — pure in `l`. */
  private def centroid(l: Int): Array[Double] = {
    val r = rng(6, l.toLong)
    val c = Array.fill(Dim)(r.nextGaussian())
    val n = math.sqrt(c.map(x => x * x).sum)
    c.map(_ / n)
  }

  def emb(i: Long): Emb = {
    val r = rng(7, i)
    val label = r.nextInt(10)
    val c = centroid(label)
    val v = Array.tabulate(Dim)(d => r.nextGaussian() + 0.56 * c(d))
    val n = math.sqrt(v.map(x => x * x).sum)
    Emb(i, v.map(x => (x / n).toFloat), label)
  }

  /** CLUSTERED-corpus variant — the geometry real embedding corpora
    * have (text/image encoders put most of their mass near per-topic
    * centers), where [[emb]]'s near-uniform mix (within-label
    * cosine-to-centroid ≈ 0.07) is product quantization's ADVERSARIAL
    * case: with no per-subspace structure to exploit, codebook
    * reconstruction error swamps edge selection. 64 Gaussian centers,
    * per-dimension noise σ = 0.12 → cosine-to-centroid ≈ 0.72 —
    * clearly structured, far from degenerate (clusters still overlap;
    * brute-force top-5 still crosses cluster boundaries). Pure in `i`
    * like [[emb]]. The PQ build rung's past-sq8 fitness claim is
    * MEASURED on this corpus (`HnswPqBuildSpec`'s clustered floor —
    * the r11 verdict's missing #3), not argued. */
  def embClustered(i: Long): Emb = {
    val r = rng(8, i)
    val label = r.nextInt(64)
    val c = centroid(label)
    val v = Array.tabulate(Dim)(d => 0.12 * r.nextGaussian() + c(d))
    val n = math.sqrt(v.map(x => x * x).sum)
    Emb(i, v.map(x => (x / n).toFloat), label)
  }

  def writeCorpus(spark: SparkSession, outDir: String, m: Int): Unit = {
    import spark.implicits._
    val nDocs = 5000L * m
    val nEmb = 2000L * m
    spark.range(nDocs).map(i => doc(i))
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    spark.range(nEmb).map(i => emb(i))
      .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
  }

  def main(args: Array[String]): Unit = {
    val outRoot = args(0)
    val ms = args(1).split(",").map(_.trim.toInt)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-scaledata")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.hadoop.fs.file.impl", "graft.ForkFreeLocalFileSystem")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    ms.foreach { m =>
      writeCorpus(spark, s"$outRoot/x$m", m)
      println(s"[scaledata] wrote $outRoot/x$m (m=$m)")
    }
    spark.stop()
  }
}
