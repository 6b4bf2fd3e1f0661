package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

package object queries {
  /** A judge-facing query: (session, testdata dir) → result. */
  type Q = (SparkSession, String) => DataFrame
}
