package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the README's prose claims to the code they describe.
  *
  * The registry-count claim ("All N registry verification queries")
  * went stale two rounds in a row (72→74→79); this test makes the
  * number un-rottable — any registry change that forgets the README
  * fails the suite with the exact edit to make.
  */
class ReadmeSpec extends AnyFunSuite {

  test("README registry-query count matches SparkEntry.queries.size") {
    val readme = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get("README.md")), "UTF-8")
    val claim = """All (\d+) registry verification""".r
    val claimed = claim.findFirstMatchIn(readme).map(_.group(1).toInt)
    assert(claimed.isDefined, "README.md no longer contains the 'All N registry verification' claim")
    assert(claimed.get === SparkEntry.queries.size,
      s"README.md claims ${claimed.get} registry queries but SparkEntry.queries has " +
        s"${SparkEntry.queries.size} — update README.md:15")
  }

  test("every registry query with an oracle shares its name with oracleSql") {
    // oracleSql keys must be a subset of queries keys or the driver's
    // DuckDB replay silently skips them.
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracleSql entries with no matching query: $orphans")
  }

  test("registry has no duplicate query names across its 11 modules") {
    // SparkEntry.queries is a Map built from a Seq concatenation — a
    // name collision between modules would silently DROP one of the
    // two queries from the driver's correctness sweep. Fail loudly on
    // the Seq instead.
    val names = SparkEntry.registryNames
    val dups = names.groupBy(identity).collect { case (n, g) if g.size > 1 => n }
    assert(dups.isEmpty, s"duplicate registry query names: $dups")
    assert(names.size === SparkEntry.queries.size,
      "registry Seq and queries Map must be the same size (no Map-keyed drops)")
  }
}
