package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic adversarially-skewed edge corpus for the skew probes
  * (SkewSpec + graft.Micro SKEW_STRESS): one hub subject ("hub0") owns the
  * first 10% of all edges, the rest follow a log-uniform (≈ zipf) rank
  * distribution over 50k subjects. Hub neighbours are prefixed `hv`, tail
  * targets `tv`, so the hub star is a closed component whose minimum id is
  * the hub itself. Every row is a pure function of its id — bit-identical
  * across partitionings and parallelism levels. */
object EdgeGen {

  def zipfEdges(spark: SparkSession, nEdges: Long): DataFrame = {
    val hub = nEdges / 10
    spark.range(nEdges).select(
      when(col("id") < hub, lit("hub0"))
        .otherwise(concat(lit("s"),
          floor(exp((pmod(xxhash64(col("id")), lit(1000000)) / 1e6) * log(lit(50000.0))))
            .cast("long"))).as("s"),
      when(col("id") < hub, concat(lit("hv"), col("id")))
        .otherwise(concat(lit("tv"), col("id"))).as("d"))
  }
}
