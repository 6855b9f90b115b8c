package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 (plus the LLM-data-pipeline
  * extension surface) registers here as a named query; those with a DuckDB
  * oracle also contribute the equivalent ANSI SQL for the driver's
  * hash-match correctness gate.
  */
object SparkEntry {

  /** All operator registrations, in evaluation-cost order. */
  def allOps: Seq[Op] =
    operators.Relational.ops ++
    operators.Relational2.ops ++
    operators.Relational3.ops ++
    operators.Relational4.ops ++
    operators.Relational5.ops ++
    operators.AsOf.ops ++
    operators.TextAnalysis.ops ++
    operators.Dedup.ops ++
    operators.Similarity.ops ++
    operators.Graph.ops ++
    operators.MLOps.ops ++
    operators.StreamOps.ops ++
    operators.SourceOps.ops ++
    operators.Multimodal.ops ++
    operators.Curation.ops ++
    operators.JobTopology.ops

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allOps.map(o => o.name -> o.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    allOps.collect { case Op(n, _, Some(sql)) => n -> sql }.toMap
}
