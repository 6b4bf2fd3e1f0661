package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.KCore

/** Hand-graph pins for iterative k-core peeling. */
class KCoreSpec extends AnyFunSuite with SparkSpec {

  private def core(edges: Seq[(Long, Long)], k: Int, maxRounds: Int = 10): Set[Long] = {
    import spark.implicits._
    KCore.coreMembers(edges.toDF("a", "b"), k, maxRounds)
      .collect().map(_.getLong(0)).toSet
  }

  test("lollipop: the tail peels one vertex per round, the triangle stays") {
    // triangle 1-2-3 with a 3-vertex tail 3-4-5-6: the 2-core is the
    // triangle; vertex 6 peels in round 1, 5 in round 2, 4 in round 3 —
    // a genuine cascade, not a single sweep
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
    assert(core(edges, 2) == Set(1L, 2L, 3L))
  }

  test("K4 survives its own 3-core; a pendant on K4 does not") {
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    assert(core(k4 :+ (4L, 9L), 3) == Set(1L, 2L, 3L, 4L))
  }

  test("empty core: a tree has no 2-core") {
    assert(core(Seq((1L, 2L), (2L, 3L), (2L, 4L), (4L, 5L)), 2) == Set.empty)
  }

  test("non-convergence within maxRounds throws, never half-peels") {
    // the 6-vertex lollipop tail needs 3+1 rounds; cap at 2 must throw
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
    assertThrows[IllegalArgumentException](core(edges, 2, maxRounds = 2))
  }
}
