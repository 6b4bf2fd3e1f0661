package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TriangleCount

/** Hand-graph pins for degree-oriented triangle counting. */
class TriangleCountSpec extends AnyFunSuite with SparkSpec {

  private def count(verts: Seq[Long], edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    TriangleCount.perNode(
      verts.toDF("node"), edges.toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("K4: four triangles, each node on three") {
    val verts = Seq(1L, 2L, 3L, 4L)
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    assert(count(verts, edges) == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("path + isolated vertex: zero triangles everywhere") {
    assert(count(Seq(1L, 2L, 3L, 4L), Seq((1L, 2L), (2L, 3L))) ==
      Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 0L))
  }

  test("bowtie: center on two triangles, wings on one") {
    // triangles (1,2,3) and (3,4,5) sharing vertex 3
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L), (3L, 5L))
    assert(count(Seq(1L, 2L, 3L, 4L, 5L), edges) ==
      Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 1L, 5L -> 1L))
  }

  test("hub star plus one rim edge: orientation handles skew") {
    // hub 10 connected to 1..6, rim edge (1,2) -> one triangle (10,1,2)
    val star = (1L to 6L).map(i => (10L, i))
    val got = count(Seq(1L, 2L, 3L, 4L, 5L, 6L, 10L), star :+ (1L, 2L))
    assert(got(10L) == 1L && got(1L) == 1L && got(2L) == 1L)
    assert((3L to 6L).forall(got(_) == 0L))
  }

  test("edge order does not matter (either endpoint first)") {
    val a = count(Seq(1L, 2L, 3L), Seq((1L, 2L), (2L, 3L), (1L, 3L)))
    val b = count(Seq(1L, 2L, 3L), Seq((2L, 1L), (3L, 2L), (3L, 1L)))
    assert(a == b && a(1L) == 1L)
  }
}
