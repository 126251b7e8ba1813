package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SaltedJoinSpec extends SparkSpec {

  test("salted join equals the plain join on skewed data") {
    import spark.implicits._
    // 10k rows on ONE hot key + a tail of singletons
    val skewed = ((1 to 10000).map(i => (7L, s"hot_$i")) ++
      (1 to 50).map(i => (100L + i, s"cold_$i"))).toDF("k", "payload")
    val dim = ((1 to 50).map(i => (100L + i, s"dim_$i")) :+ (7L, "dim_hot"))
      .toDF("k", "dname")
    val plain = skewed.join(dim, Seq("k"))
      .orderBy("k", "payload").collect()
    val salted = SaltedJoin.join(skewed, dim, on = "k", buckets = 8)
      .orderBy("k", "payload").collect()
    assert(salted.length == plain.length)
    assert(salted.toSeq == plain.toSeq)
  }

  test("the hot key's rows spread across salt buckets") {
    import spark.implicits._
    val skewed = (1 to 10000).map(i => (7L, s"hot_$i")).toDF("k", "payload")
    val spread = skewed.withColumn("_salt",
        pmod(hash(skewed.columns.map(col): _*), lit(8)))
      .groupBy("_salt").count().collect()
    // all 8 buckets used, and no bucket hoards the key (≤ 2× fair share)
    assert(spread.length == 8)
    assert(spread.forall(_.getLong(1) <= 2 * 10000 / 8))
  }

  test("salting is deterministic (retry-safe): same rows, same salt") {
    import spark.implicits._
    val df = (1 to 100).map(i => (7L, s"p_$i")).toDF("k", "payload")
    val s1 = df.withColumn("_salt", pmod(hash(df.columns.map(col): _*), lit(8)))
      .orderBy("payload").select("_salt").collect().toSeq
    val s2 = df.withColumn("_salt", pmod(hash(df.columns.map(col): _*), lit(8)))
      .orderBy("payload").select("_salt").collect().toSeq
    assert(s1 == s2)
  }
}
