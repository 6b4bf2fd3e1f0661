package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator[IN, BUF, OUT]` forms of the reference's hand-built
  * aggregations — the engine's UDAF extension point (SURVEY §2.3
  * "UDF/UDAF surface").
  *
  * `DistinctCountAgg` is the teaching/test double SURVEY §7 plans for the
  * reference's `HashSet` aggregator + custom serde (UniqueUsersApp
  * .java:173–191, HashSetStringSerde.java): the buffer is a Scala Set
  * encoded by Spark encoders — no delimiter-corruption bug, no
  * `{""} ≠ ∅` empty-set bug (both golden-tested here per SURVEY §2.2) —
  * and merge is a set union, so partial aggregation distributes.
  * Production paths use `count_distinct`/`collect_set`/HLL; this exists
  * for semantics built-ins can't express (custom buffers).
  */
object TypedAggs {

  /** Exact distinct count via a mergeable set buffer. */
  class DistinctCountAgg extends Aggregator[String, Set[String], Long] {
    override def zero: Set[String] = Set.empty
    override def reduce(b: Set[String], a: String): Set[String] =
      if (a == null) b else b + a
    override def merge(b1: Set[String], b2: Set[String]): Set[String] = b1 union b2
    override def finish(r: Set[String]): Long = r.size.toLong
    override def bufferEncoder: Encoder[Set[String]] = Encoders.kryo[Set[String]]
    override def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  val distinctCount = new DistinctCountAgg
}
