package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the assumption the text-hash oracles depend on: LlmQueries'
  * DuckDB fragments fold `ascii(char)` (codepoints) while the Spark
  * PolyHash kernel folds UTF-8 bytes. Those agree iff the corpus is pure
  * ASCII — true for the driver-generated documents table, asserted here so
  * a corpus change surfaces as THIS failure, not as an inscrutable oracle
  * hash mismatch on t04/m01/m02/d02-d04. */
class AsciiCorpusSpec extends SparkSpec {

  test("documents corpus is pure ASCII (oracle codepoint==byte premise)") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val nonAscii = docs
      .where(length(col("text")) =!= octet_length(col("text")))
      .count()
    assert(nonAscii == 0,
      s"$nonAscii documents contain non-ASCII text: the ascii()-based " +
        "DuckDB oracles no longer match the byte-based PolyHash kernel — " +
        "switch the oracle folds to byte iteration before trusting them")
  }
}
