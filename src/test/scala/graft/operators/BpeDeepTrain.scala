package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.BpeCodec

/** Dev probe: trainer→codec CLOSURE at the FULL 40k vocabulary — the
  * r10 verdict's depth check on the batched trainer's tie/no-op
  * handling. `BpeClosureSpec` proves the property at 5k merges inside
  * `sbt test`; 40k needs ~157 batched Spark rounds (~25–40 min), which
  * would dominate the suite, so it runs as a once-per-round probe and
  * the results land in BASELINE.md (summary + sha256 of the learned
  * table, so any depth regression shows as a hash change).
  *
  * Checks mirror the spec: (a) well-formed at every rank (operands are
  * base chars or earlier outputs — the precondition for the codec's
  * loop⇔chain equivalence), (b) a re-trained prefix reproduces
  * byte-identically, (c) loop == chain on sampled trained/unseen/
  * adversarial words, (d) the table drives the codegen BpeCount path.
  * Run: `sbt "Test/runMain graft.operators.BpeDeepTrain <out.json>
  * [nMerges]"` with SPARK_DRIVER_MEM=16g+. */
object BpeDeepTrain {

  private def chainCount(merges: Seq[(String, String)], w: String): Int = {
    var syms = w.map(_.toString).toVector
    merges.foreach { case (a, b) =>
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
          out += (a + b); i += 2
        } else { out += syms(i); i += 1 }
      }
      syms = out.result()
    }
    syms.length
  }

  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/bpe_deep_train.json")
    val nMerges = args.lift(1).map(_.toInt).getOrElse(40000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.hadoop.fs.file.impl", "graft.ForkFreeLocalFileSystem")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    // 80k distinct 6–14-char words with a skewed frequency table — rich
    // enough pair structure for 40k merges (the 31-word driver corpus
    // cannot go past ~100)
    val nWords = 80000
    val docs = spark.range(nWords).map { i =>
      val w = BpeClosureWords.word(i)
      Seq.fill(1 + (i % 13).toInt)(w).mkString(" ")
    }.toDF("text")

    val t0 = System.nanoTime()
    val merges = BpeTrainer.train(docs, nMerges, batch = 256)
    val trainSec = (System.nanoTime() - t0) / 1e9
    require(merges.size == nMerges,
      s"corpus yielded only ${merges.size} of $nMerges merges")

    // (a) well-formed at depth
    require(merges.map(_.rank) == (1 to nMerges))
    val seen = scala.collection.mutable.HashSet[String]()
    merges.foreach { m =>
      require(m.merged == m.lhs + m.rhs, s"rank ${m.rank} output")
      for (op <- Seq(m.lhs, m.rhs))
        require(op.length == 1 || seen.contains(op),
          s"rank ${m.rank}: operand '$op' not a base char or earlier " +
            "output — depth broke well-formedness")
      seen += m.merged
    }
    // (b) reproducible prefix
    val again = BpeTrainer.train(docs, 300, batch = 256)
    require(again == merges.take(300), "retrained prefix diverged")
    // (c) loop == chain closure on samples
    val codec = new BpeCodec(merges.map(m => (m.lhs, m.rhs)))
    val table = merges.map(m => (m.lhs, m.rhs))
    var checked = 0
    (0 until 500).foreach { k =>
      val w = BpeClosureWords.word(k * 131L % nWords)
      require(codec.countWord(w) == chainCount(table, w), s"word $w")
      checked += 1
    }
    Seq("", "zzzzzzzzzz", "a" * 60,
        BpeClosureWords.word(7) + BpeClosureWords.word(8)).foreach { w =>
      require(codec.countWord(w) == chainCount(table, w), s"'$w'")
      checked += 1
    }
    // (d) the 40k table rides the codegen path
    val corpus = graft.Tables.load(spark, "/root/testdata/sf0.01",
      "documents")
    val t1 = System.nanoTime()
    val total = corpus
      .select(graft.plans.BpeCount(col("text"), codec).as("n"))
      .agg(sum(col("n"))).head().getLong(0)
    val encSec = (System.nanoTime() - t1) / 1e9
    val sha = java.security.MessageDigest.getInstance("SHA-256")
      .digest(merges.map(m => s"${m.lhs} ${m.rhs}").mkString("\n")
        .getBytes("UTF-8")).map("%02x".format(_)).mkString

    val json =
      s"""{"metric":"bpe_deep_train","n_merges":$nMerges,""" +
      s""""train_sec":${f"$trainSec%.1f"},"closure_words":$checked,""" +
      s""""encode_tokens":$total,"encode_sec":${f"$encSec%.2f"},""" +
      s""""merges_sha256":"$sha"}"""
    println(json)
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (json + "\n").getBytes("UTF-8"))
    spark.stop()
  }
}
