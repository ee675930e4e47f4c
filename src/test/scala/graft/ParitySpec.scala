package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Parity

/** Guards the cross-engine rounding discipline (SURVEY §6): the
  * oracles spell Parity.stableRoundSql's floor chain inline, and this
  * suite is what keeps those copies honest — no SparkSession needed,
  * it greps the registered oracle SQL. */
class ParitySpec extends AnyFunSuite {

  test("no oracle calls the engine-specific round()") {
    val round = """(?i)(?<![a-z_])round\s*\(""".r
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(round.findFirstIn(sql).isEmpty,
        s"$name oracle still calls round() — engines disagree on ties; use the stableRoundSql chain")
    }
  }

  test("every oracle floor chain matches the canonical stableRoundSql form") {
    // the helper IS the template the regex checks against
    assert(Parity.stableRoundSql("x", 2) == "floor((x) * 1e2 + 0.5) / 1e2")
    val chain = """\* 1e(\d+) \+ 0\.5\) / 1e(\d+)""".r
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      chain.findAllMatchIn(sql).foreach { m =>
        assert(m.group(1) == m.group(2),
          s"$name floor chain mixes scales (${m.matched}) — multiply and divide must use the same 1e<s>")
      }
    }
    // the chain must appear somewhere (the discipline is in use, not vacuous)
    val total = SparkEntry.oracleSql.valuesIterator
      .map(sql => chain.findAllMatchIn(sql).size).sum
    assert(total > 20, s"only $total floor chains found across the oracles — pattern drifted?")
  }
}
