package graft.streaming

import graft.SparkSpec

/** Pins the bench arms themselves: all five streaming pipelines replay a
  * tiny load end-to-end and report real metrics — an arm that starts
  * erroring (e.g. a chained-operator or RocksDB wiring regression) fails
  * here instead of silently degrading BENCH_r{N}.json to an error field.
  */
class StreamBenchSpec extends SparkSpec {

  test("stream bench: all five arms emit metric lines with rows out, no errors") {
    val json = StreamBench.run(spark, nUsers = 6, sessionsPerUser = 6, nBatches = 2,
      doWarmup = false)
    assert(json.startsWith("[") && json.endsWith("]"), json)
    for (arm <- Seq("sessionize", "chained_kpis", "chained_departments",
        "timer_rocksdb", "sessionize_curve"))
      assert(json.contains(s""""pipeline":"$arm""""), s"missing arm $arm in $json")
    assert(!json.contains("\"error\""), json)
    val outs = """"n_rows_out":(\d+)""".r.findAllMatchIn(json).map(_.group(1).toLong).toList
    assert(outs.size === 5, json)
    assert(outs.forall(_ > 0L), json)
    // both sessionizer arms (built-in session_window and explicit-timer
    // RocksDB) must close the same 6 × 6 sessions
    val sess = """"pipeline":"(?:sessionize|timer_rocksdb)"[^}]*"n_rows_out":(\d+)""".r
      .findAllMatchIn(json).map(_.group(1).toLong).toList
    assert(sess === List(36L, 36L), json)
    // per-arm noise accounting (VERDICT r14 #2): every arm carries its
    // bracketing probe (the default no-op probe reports -1)
    val probes = """"probe_sec":(-?[0-9.]+)""".r.findAllMatchIn(json).map(_.group(1)).toList
    assert(probes.size === 5, json)
    // the state curve is present for every arm, its max equals the
    // reported state_rows_max, and the flusher drains session state
    val curves = """"state_curve":\[([0-9,]*)\]""".r.findAllMatchIn(json)
      .map(_.group(1).split(",").filter(_.nonEmpty).map(_.toLong).toList).toList
    val maxes = """"state_rows_max":(\d+)""".r.findAllMatchIn(json).map(_.group(1).toLong).toList
    assert(curves.size === 5, json)
    curves.zip(maxes).foreach { case (c, m) => assert(c.max === m, json) }
    // sessionize_curve: the long replay's state must PLATEAU (bounded by
    // in-flight sessions), never exceeding the small user set × a few
    // in-flight sessions even though 10 batches were fed
    val curveArm = curves.last
    assert(curveArm.max <= 6L * 12L, s"curve state ${curveArm.max} not bounded: $json")
  }
}
