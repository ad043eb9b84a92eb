package graft.streaming

import graft.SparkSpec

/** Pins the bench arms themselves: all four streaming pipelines replay a
  * tiny load end-to-end and report real metrics — an arm that starts
  * erroring (e.g. a chained-operator or RocksDB wiring regression) fails
  * here instead of silently degrading BENCH_r{N}.json to an error field.
  */
class StreamBenchSpec extends SparkSpec {

  test("stream bench: all four arms emit metric lines with rows out, no errors") {
    val json = StreamBench.run(spark, nUsers = 6, sessionsPerUser = 6, nBatches = 2)
    assert(json.startsWith("[") && json.endsWith("]"), json)
    for (arm <- Seq("sessionize", "chained_kpis", "chained_departments", "timer_rocksdb"))
      assert(json.contains(s""""pipeline":"$arm""""), s"missing arm $arm in $json")
    assert(!json.contains("\"error\""), json)
    val outs = """"n_rows_out":(\d+)""".r.findAllMatchIn(json).map(_.group(1).toLong).toList
    assert(outs.size === 4, json)
    assert(outs.forall(_ > 0L), json)
    // both sessionizer arms (built-in session_window and explicit-timer
    // RocksDB) must close the same 6 × 6 sessions
    val sess = """"pipeline":"(?:sessionize|timer_rocksdb)"[^}]*"n_rows_out":(\d+)""".r
      .findAllMatchIn(json).map(_.group(1).toLong).toList
    assert(sess === List(36L, 36L), json)
  }
}
