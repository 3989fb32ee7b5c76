package graft

import org.apache.spark.sql.SparkSession

/** Engine-level session settings every graft entry point applies.
  *
  * `InferFiltersFromGenerate` is excluded: the rule infers a
  * `size(generatorChild) > 0` filter under every explode, and predicate
  * pushdown then alias-substitutes the generator child's FULL defining
  * expression into the filter and sinks it to the file scan. For cheap
  * children that is a win; for expensive computed arrays (word shingles
  * here) it duplicates the kernel into the scan stage — which for a
  * small/under-split input is a single task — serializing the most
  * expensive computation in the plan (observed 6-10 s single-threaded vs
  * <1 s post-repartition on the 32-core bench; the SPARK-33544 class of
  * issue). The filter's only benefit is skipping empty arrays before the
  * explode, which the explode does anyway.
  */
object SessionDefaults {
  val excludedOptimizerRules: String =
    "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate"

  def apply(b: SparkSession.Builder): SparkSession.Builder =
    b.config("spark.sql.optimizer.excludedRules", excludedOptimizerRules)
      .config("spark.sql.session.timeZone", "UTC")
}
