package graft.streaming

import java.nio.file.Files

import graft.{SparkSpec, Tables}

/** flatMapGroupsWithState sessionization ≡ batch gaps-and-islands on the
  * events table. */
class SessionizeSpec extends SparkSpec {

  test("streamed sessionization equals batch sessionization") {
    val dir = "/root/testdata/sf0.001"
    val ckpt = Files.createTempDirectory("graft_sess_spec").toString

    val batch = Streams.sessionizeBatch(
      Tables.events(spark, dir)
        .select("event_id", "user_id", "ts", "value"), gapMinutes = 30)
      .collect().toSet
    val streamed = Streams
      .sessionizeStream(spark, dir, ckpt, gapMinutes = 30)
      .select("user_id", "session_start", "n_events", "sum_value")
      .collect().toSet

    assert(streamed === batch)
    assert(batch.nonEmpty)
  }
}
