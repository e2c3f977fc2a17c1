package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.queries._

/** Driver-contract consistency: every query must carry an oracle, names
  * must be globally unique (the merged Map would silently shadow a
  * duplicate), and the naming convention must hold. Pure metadata — no
  * Spark session. */
class ContractSpec extends AnyFunSuite {

  private val packs: Seq[(String, Map[String, _], Map[String, String])] = Seq(
    ("Relational", Relational.defs, Relational.oracles),
    ("EventOps", EventOps.defs, EventOps.oracles),
    ("TextAnalysis", TextAnalysis.defs, TextAnalysis.oracles),
    ("Dedup", Dedup.defs, Dedup.oracles),
    ("Similarity", Similarity.defs, Similarity.oracles),
    ("Media", Media.defs, Media.oracles),
    ("Trollflow", Trollflow.defs, Trollflow.oracles),
    ("Search", Search.defs, Search.oracles),
    ("Curation", Curation.defs, Curation.oracles)
  )

  test("every query has an oracle and vice versa, per pack") {
    packs.foreach { case (name, defs, oracles) =>
      assert(defs.keySet == oracles.keySet,
        s"$name: defs/oracles mismatch: " +
          s"missing oracles ${defs.keySet -- oracles.keySet}, " +
          s"orphan oracles ${oracles.keySet -- defs.keySet}")
    }
  }

  test("query names are globally unique across packs") {
    val all = packs.flatMap(_._2.keys)
    val dups = all.groupBy(identity).filter(_._2.size > 1).keys
    assert(dups.isEmpty, s"duplicate query names across packs: $dups")
    assert(SparkEntry.queries.size == all.size,
      "merged map lost entries (shadowed key?)")
    assert(SparkEntry.oracleSql.size == all.size)
  }

  test("query names follow the qNN_slug convention") {
    SparkEntry.queries.keys.foreach { n =>
      assert(n.matches("q\\d+_[a-z0-9_]+"), s"bad query name: $n")
    }
  }

  test("oracle SQL is non-empty and single-statement") {
    SparkEntry.oracleSql.foreach { case (n, sql) =>
      assert(sql.trim.nonEmpty, s"$n: empty oracle")
      assert(!sql.contains(";"), s"$n: oracle must be a single statement")
    }
  }
}
