package graft

/** Dev tool: print the AQE-final executed plan of registered queries —
  * the `.explain`-driven iteration loop for plan audits (not a test; run
  * with `sbt "Test/runMain graft.PlanAudit <sfDir> [query ...]"`).
  * With no query args, audits every registered query and prints only the
  * join/exchange/window skeleton lines plus red-flag markers.
  */
object PlanAudit {

  private val RedFlags = Seq("BroadcastNestedLoopJoin", "CartesianProduct")
  // declared all-pairs baselines / 1-row broadcast scalar joins where a
  // nested-loop is the intended plan (PlanSpec distinguishes these)
  private val AllowedNestedLoop = Set(
    "ann_topk_brute", "dedup_embedding", "ev_heavy_hitters", "txt_tfidf_top_terms",
    "txt_tfidf_doc_sim", "txt_unigram_logprob", "txt_mixture_sample", "ev_gapfill",
    "dedup_ngram_jaccard", "dedup_minhash_lsh", "dedup_simhash_pairs")

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val spark = GraftSession.local("plan-audit", 8)
    try {
      names.foreach { name =>
        val df = SparkEntry.queries(name)(spark, dir)
        df.queryExecution.toRdd.count() // materialize so AQE finalizes
        val plan = df.queryExecution.executedPlan.toString
        val skeleton = plan.linesIterator.filter(l =>
          l.contains("Join") || l.contains("Exchange") || l.contains("Window") ||
            l.contains("Generate") || RedFlags.exists(l.contains))
        println(s"===== $name")
        skeleton.foreach(l => println(l.replaceAll("#\\d+", "")))
        RedFlags.filter(plan.contains).foreach { f =>
          val tag = if (AllowedNestedLoop(name)) "allowed (declared)" else "RED FLAG"
          println(s"  !! $f — $tag")
        }
      }
    } finally spark.stop()
  }
}
