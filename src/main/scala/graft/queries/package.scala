package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

package object queries {
  /** A judge-facing query: (session, testdata dir) → result. */
  type Q = (SparkSession, String) => DataFrame

  /** Scratch directory for queries that must write before reading.
    * Keyed by (tag, sfDir, pid): the sfDir component keeps concurrent
    * gates on different SFs apart, the pid component keeps concurrent
    * PROCESSES over the same sfDir (e.g. a gate and a bench running in
    * parallel) from deleting or overwriting each other's in-flight files. */
  def scratchPath(tag: String, dir: String): String =
    s"${sys.props("java.io.tmpdir")}/graft_${tag}_${Integer.toHexString(dir.hashCode)}_p${ProcessHandle.current().pid()}"
}
