package graft

import graft.dedup.Dedup

/** Invocation-scoped index hygiene for the dedup calibration readouts.
  *
  * lshPrCurve / methodAgreement / ensembleImpact / lshBandDesign each
  * build corpus-sized shingle/signature indexes via `localCheckpoint`.
  * Those blocks are NOT CacheManager-tracked (`clearCache` cannot touch
  * them) and only fall to the ContextCleaner after a GC, so each op must
  * materialize its few-row readout and free its indexes before returning
  * — otherwise repeated invocations in a long-lived session pin
  * corpus-sized block sets (ADVICE r10). The contract checked here: one
  * invocation leaves behind exactly ONE persisted RDD — the checkpointed
  * readout itself (≤ 9 rows) — never the shingle or signature indexes.
  */
class CheckpointHygieneSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  private val a = "the quick brown fox jumps over the lazy dog again and again"
  private val b = "completely different words entirely unrelated to anything else here now"
  private val corpus = docs((1L, a), (2L, a), (3L, b))

  private def newPersisted(op: => Unit): Int = {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    op
    val after = spark.sparkContext.getPersistentRDDs.keySet
    (after -- before).size
  }

  test("lshPrCurve frees its shingle and signature indexes; only the readout stays") {
    assert(newPersisted(Dedup.lshPrCurve(corpus).collect()) === 1)
  }

  test("methodAgreement frees its shingle and signature indexes; only the readout stays") {
    assert(newPersisted(Dedup.methodAgreement(corpus).collect()) === 1)
  }

  test("ensembleImpact frees its shingle and signature indexes; only the readout stays") {
    assert(newPersisted(Dedup.ensembleImpact(corpus).collect()) === 1)
  }

  test("lshBandDesign frees its shingle and signature indexes; only the readout stays") {
    assert(newPersisted(Dedup.lshBandDesign(corpus).collect()) === 1)
  }
}
