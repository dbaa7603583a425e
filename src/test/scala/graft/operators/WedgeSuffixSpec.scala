package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Pins graph_common_neighbors' two wedge-exchange formulations equal on
  * the fixture corpus (r12): the grouped-suffix exchange (one (w, a,
  * suffix-array) row per watchlist edge, exploded AFTER the shuffle) must
  * produce exactly the per-wedge-row form's output — same pairs, same cn,
  * same aa, same ranks. ns is sorted-distinct, so suffix pairs are the
  * old in-order a < c pairs by construction; this spec guards the
  * construction.
  */
class WedgeSuffixSpec extends AnyFunSuite {
  import SparkTestSession._

  test("grouped-suffix wedge exchange == per-wedge-row exchange on fixtures") {
    for (mod <- Seq(4, 1)) { // the default watchlist and the full graph
      val old = Graph.commonNeighborsPlan(spark, sf, 5, mod, groupedSuffix = false)
      val sfx = Graph.commonNeighborsPlan(spark, sf, 5, mod, groupedSuffix = true)
      val extra = sfx.exceptAll(old).count()
      val missing = old.exceptAll(sfx).count()
      assert(extra == 0 && missing == 0,
        s"mod=$mod diverged: extra=$extra missing=$missing")
      assert(old.count() === sfx.count())
    }
  }
}
