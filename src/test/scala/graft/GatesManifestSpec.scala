package graft

import org.scalatest.funsuite.AnyFunSuite

/** The gate manifest must stay total and well-formed: a rows-only query
  * that ships without a hash-gated companion is exactly the silent
  * coverage gap the manifest exists to prevent. Pure registry checks —
  * no SparkSession needed. */
class GatesManifestSpec extends AnyFunSuite {

  private val registered = SparkEntry.queries.keySet
  private val oracled = SparkEntry.oracleSql.keySet

  test("every registered no-oracle query has a gate entry") {
    val rowsOnly = registered -- oracled
    val ungated = rowsOnly -- SparkEntry.gates.keySet
    assert(ungated.isEmpty,
      s"rows-only queries without a gate mapping: ${ungated.toSeq.sorted.mkString(", ")}")
  }

  test("every gate key is a registered query that genuinely lacks an oracle") {
    val unknown = SparkEntry.gates.keySet -- registered
    assert(unknown.isEmpty,
      s"gate keys that are not registered queries: ${unknown.toSeq.sorted.mkString(", ")}")
    val oracledKeys = SparkEntry.gates.keySet.intersect(oracled)
    assert(oracledKeys.isEmpty,
      s"gate keys that already have an oracle (stale mapping): ${oracledKeys.toSeq.sorted.mkString(", ")}")
  }

  test("every gate target is a registered query WITH an oracle") {
    val targets = SparkEntry.gates.values.toSet
    val unregistered = targets -- registered
    assert(unregistered.isEmpty,
      s"gate targets that are not registered: ${unregistered.toSeq.sorted.mkString(", ")}")
    val unoracled = targets -- oracled
    assert(unoracled.isEmpty,
      s"gate targets without an oracle (gating through a rows-only row is no gate): ${unoracled.toSeq.sorted.mkString(", ")}")
  }

  test("no oracle entry is an orphan (oracle without a registered query)") {
    val orphans = oracled -- registered
    assert(orphans.isEmpty,
      s"oracleSql keys with no registered query: ${orphans.toSeq.sorted.mkString(", ")}")
  }
}
