package graft

import org.scalatest.funsuite.AnyFunSuite

/** Allowlist liveness (VERDICT r12 #3): [[PlanAudit]]'s exemption sets
  * name queries whose nested-loop joins / global windows are bounded by
  * construction, but nothing tied those names to the live registry — a
  * renamed or deleted query would leave a dead exemption behind that
  * could silently excuse a FUTURE query reusing the name (an unaudited
  * all-pairs join shipping under a stale allowlist entry). Every
  * allowlisted name must resolve to a registered query.
  */
class PlanAuditLivenessSpec extends AnyFunSuite {

  private lazy val registered = SparkEntry.queries.keySet

  private def deadEntries(allowlist: Set[String]): Set[String] =
    allowlist.diff(registered)

  test("every AllPairsBaselines entry names a registered query") {
    val dead = deadEntries(PlanAudit.AllPairsBaselines)
    assert(dead.isEmpty, s"dead all-pairs exemptions (prune them): ${dead.toSeq.sorted.mkString(", ")}")
  }

  test("every ScalarBroadcast entry names a registered query") {
    val dead = deadEntries(PlanAudit.ScalarBroadcast)
    assert(dead.isEmpty, s"dead scalar-broadcast exemptions (prune them): ${dead.toSeq.sorted.mkString(", ")}")
  }

  test("every BoundedGlobalWindow entry names a registered query") {
    val dead = deadEntries(PlanAudit.BoundedGlobalWindow)
    assert(dead.isEmpty, s"dead bounded-window exemptions (prune them): ${dead.toSeq.sorted.mkString(", ")}")
  }
}
