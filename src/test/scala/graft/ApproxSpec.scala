package graft

import graft.dedup.Dedup
import graft.sim.Similarity
import org.apache.spark.sql.functions._

/** Quantitative gates for the approximate paths. Since r12 every
  * REGISTERED approximate query is deterministic by construction
  * (`ev_approx_users` = from-first-principles HLL, `ev_approx_quantiles`
  * = md5-sample percentiles) and hash-oracled like any exact query — so
  * the gates here carry the remaining claim: the estimates are CLOSE to
  * the exact answers they approximate.
  *
  *  - `Stats.hllDistinct` / `Stats.sampledQuantiles`: estimate error vs
  *    the exact distinct count / exact quantile band.
  *  - Spark's native `approx_count_distinct` / `approx_percentile`
  *    (HyperLogLog++ / KLL-style sketches): no longer registered —
  *    engine sketches can never cross-engine hash — but still gated
  *    here at their published error bounds, as the API-surface twins
  *    the deterministic estimators replaced.
  *  - `ann_topk_lsh` (hyperplane-LSH ANN): approximate by construction,
  *    so the correctness claim is recall against the exact brute-force
  *    top-k, asserted at the documented threshold.
  *  - `dedup_embedding_lsh` IS fully oracled (deterministic construction),
  *    but its usefulness claim is recall vs the all-pairs baseline — also
  *    pinned here.
  *
  * Everything runs on the real sf0.01 testdata: approximation quality on
  * synthetic toy rows says nothing about the registered queries.
  */
class ApproxSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.01"

  test("registered deterministic HLL within 10% of exact per event_type") {
    // sf0.01 has ~150 distinct users per type — the linear-counting
    // regime (zeros ≈ 141 of 256), where the lookup-table correction is
    // doing the work; the raw harmonic estimate alone would read ~265
    val approx = graft.ops.Stats.hllDistinct(Tables.events(spark, dir))
      .select(col("event_type"), col("approx_users"))
      .as[(String, Long)].collect().toMap
    val exact = Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(count_distinct(col("user_id")).as("n"))
      .as[(String, Long)].collect().toMap
    assert(approx.keySet === exact.keySet)
    exact.foreach { case (et, n) =>
      val err = math.abs(approx(et) - n).toDouble / n
      assert(err <= 0.10, s"$et: approx=${approx(et)} exact=$n err=$err")
    }
  }

  test("registered sampled quantiles inside the 3-sigma rank-error envelope") {
    // the p-quantile of an n-sample sits at CDF position ≈ N(p, p(1−p)/n)
    // in the full distribution — the gate is that envelope (+1% for the
    // interpolation grain), scaled per type: 'purchase' samples ~200
    // events (±4.6% at p95) where 'view' samples ~5800 (±0.9%)
    val approx = graft.ops.Stats.sampledQuantiles(Tables.events(spark, dir))
      .select(col("event_type"), col("n_sampled"), col("p50_approx"), col("p95_approx"))
      .as[(String, Long, Double, Double)].collect()
    assert(approx.length === 5)
    val vals = Tables.events(spark, dir)
      .select(col("event_type"), col("value").cast("double"))
      .as[(String, Double)].collect()
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sorted }
    approx.foreach { case (et, n, a50, a95) =>
      assert(n > 150, s"$et: 1-in-10 sample unexpectedly small ($n)")
      val full = vals(et)
      def cdf(x: Double): Double = full.count(_ <= x).toDouble / full.length
      val d50 = 3 * math.sqrt(0.25 / n) + 0.01
      val d95 = 3 * math.sqrt(0.0475 / n) + 0.01
      assert(math.abs(cdf(a50) - 0.5) <= d50,
        s"$et p50: $a50 at CDF ${cdf(a50)}, envelope ±$d50")
      assert(math.abs(cdf(a95) - 0.95) <= d95,
        s"$et p95: $a95 at CDF ${cdf(a95)}, envelope ±$d95")
    }
  }

  test("HLL approx_count_distinct within 2x rsd of exact per event_type") {
    val rsd = 0.01 // the rsd the registered ev_approx_users query passes
    val approx = Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(approx_count_distinct(col("user_id"), rsd).as("approx_users"))
      .as[(String, Long)].collect().toMap
    val exact = Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(count_distinct(col("user_id")).as("n"))
      .as[(String, Long)].collect().toMap
    assert(approx.keySet === exact.keySet)
    exact.foreach { case (et, n) =>
      val err = math.abs(approx(et) - n).toDouble / n
      assert(err <= 2 * rsd, s"$et: approx=${approx(et)} exact=$n err=$err")
    }
  }

  test("approx_percentile within tight rank error of exact quantiles") {
    // accuracy=10000 bounds rank error to n/10000; at sf0.01 (~12k rows per
    // event_type) that's a handful of ranks — assert the approx value sits
    // within the exact [p-0.01, p+0.01] quantile band (the registered
    // ev_approx_quantiles accuracy)
    val bands = Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        expr("approx_percentile(value, 0.5, 10000)").as("a50"),
        expr("percentile(value, 0.49)").as("lo50"),
        expr("percentile(value, 0.51)").as("hi50"),
        expr("approx_percentile(value, 0.95, 10000)").as("a95"),
        expr("percentile(value, 0.94)").as("lo95"),
        expr("percentile(value, 0.96)").as("hi95"))
      .as[(String, Double, Double, Double, Double, Double, Double)].collect()
    assert(bands.nonEmpty)
    bands.foreach { case (et, a50, lo50, hi50, a95, lo95, hi95) =>
      assert(a50 >= lo50 && a50 <= hi50, s"$et p50: $a50 outside [$lo50, $hi50]")
      assert(a95 >= lo95 && a95 <= hi95, s"$et p95: $a95 outside [$lo95, $hi95]")
    }
  }

  test("RQ rerank recovers what the 72-cell code ranking loses") {
    val emb = Tables.embeddings(spark, dir)
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select(col("query_id"), col("neighbor_id"))
        .as[(Long, Long)].collect().toSet
    val exact = pairs(Similarity.bruteForceTopK(emb))
    val raw = pairs(Similarity.rqTopK(emb))
    val reranked = pairs(Similarity.rqRerank(emb))
    val rawRecall = (raw & exact).size.toDouble / exact.size
    val rerankRecall = (reranked & exact).size.toDouble / exact.size
    // the deterministic seed codebook binds here, by design: 72 cells
    // over ~2000 vectors tie massively, so the raw code ranking is
    // near-random (measured 0.04) and the exact-precision stage is what
    // makes the index servable (measured 0.26 at shortlist 50) — the
    // dial is codebook size/training (rqTrain), not the sandwich
    assert(rerankRecall >= 0.2, s"rerank recall $rerankRecall < 0.2")
    assert(rerankRecall > rawRecall,
      s"rerank ($rerankRecall) must beat the raw code ranking ($rawRecall)")
  }

  test("LSH ANN recall@5 >= 0.6 vs brute-force on sf0.01 embeddings") {
    val emb = Tables.embeddings(spark, dir)
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select(col("query_id"), col("neighbor_id"))
        .as[(Long, Long)].collect().toSet
    val exact = pairs(Similarity.bruteForceTopK(emb))
    val lsh = pairs(Similarity.lshTopK(spark, emb))
    val recall = (lsh & exact).size.toDouble / exact.size
    // single 8-bit table at the testdata's weak similarity level (top
    // cosines ~0.4-0.5): the documented floor is 0.6 — raising bits or
    // adding tables moves this dial (Similarity doc comment)
    assert(recall >= 0.6, s"recall@${Similarity.TopK} = $recall < 0.6")
  }

  test("LSH embedding near-dup recall >= 0.75 vs all-pairs on sf0.01") {
    val emb = Tables.embeddings(spark, dir)
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select(col("vec_id_1"), col("vec_id_2")).as[(Long, Long)].collect().toSet
    val exact = pairs(Dedup.embeddingNearDups(emb))
    val lsh = pairs(Dedup.embeddingNearDupsLsh(emb))
    assert(lsh.subsetOf(exact), "LSH pairs must be exact-verified near-dups")
    val recall = lsh.size.toDouble / exact.size
    // measured 48/59 = 0.81 with 8 tables x 4 bits (deterministic planes);
    // gate at 0.75 to absorb testdata regeneration
    assert(recall >= 0.75, s"recall = $recall < 0.75")
  }

  test("MinHash audience sketch: mean |error| within the 1/sqrt(k) envelope") {
    // k=64 → per-pair std ≈ 0.125; the MEAN absolute error across pairs
    // sits well under it. Measured mean 421 e4 / max 1546 e4 at sf0.01;
    // gate the mean at 1250 e4 (the single-pair sigma) — loose enough to
    // absorb testdata regeneration, tight enough to catch a broken hash
    val rows = graft.ops.Analytics.segmentMinhash(
      Tables.events(spark, "/root/testdata/sf0.01"))
      .select($"err_e4").as[Long].collect()
    assert(rows.nonEmpty)
    val meanAbs = rows.map(math.abs).sum.toDouble / rows.length
    assert(meanAbs <= 1250.0, s"mean |err| = $meanAbs e4 exceeds the sketch envelope")
  }
}
