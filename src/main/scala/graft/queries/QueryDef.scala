package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-checkable query: a Spark implementation plus (optionally) an
  * equivalent ANSI SQL text the driver runs in DuckDB over the same parquet
  * tables. Column names/aliases MUST match between the two — the driver
  * sorts columns by name before hashing values.
  *
  * Queries with `oracle = None` get a weaker rows-only check (used for
  * seeded-randomness ops and ops whose semantics aren't SQL-expressible).
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  def apply(name: String, sql: String)(run: (SparkSession, String) => DataFrame): Q =
    Q(name, run, Some(sql))
  def rowsOnly(name: String)(run: (SparkSession, String) => DataFrame): Q =
    Q(name, run, None)
}
