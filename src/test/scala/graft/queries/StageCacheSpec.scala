package graft.queries

import graft.SparkSpec

/** The Bench stage-rerun contract over [[LlmQueries]]' session stage
  * cache: dropping ONE stage and re-forcing it rebuilds the same frame
  * (deterministic stages — the rerun measures the same work the first
  * timing did), and does not disturb other cached stages. This is what
  * lets Bench adjudicate a stage-row outlier (r14's stage_lsh_pairs
  * read 2.9× its band with the mechanism blind to stages). */
class StageCacheSpec extends SparkSpec {

  test("dropStage: re-forced stage row rebuilds to identical rows") {
    val stages = LlmQueries.sharedStages(spark, sf0001).toMap
    // force the dependency chain the way Bench does (dependency order)
    val firstFps = stages("stage_shingle_fps")()
    val firstPairs = stages("stage_lsh_pairs")()
    // drop ONLY lsh_pairs; shingle_fps must stay warm (same-work
    // attribution: the original row was timed on warm dependencies)
    LlmQueries.dropStage(spark, sf0001, "lsh_pairs")
    val again = stages("stage_lsh_pairs")()
    assert(again === firstPairs)
    // upstream stage unaffected by the drop
    assert(stages("stage_shingle_fps")() === firstFps)
    LlmQueries.clearStageCache()
  }

  test("dropStage of an uncached stage is a no-op") {
    LlmQueries.clearStageCache()
    LlmQueries.dropStage(spark, sf0001, "lsh_pairs") // must not throw
  }
}
