package graft

import org.apache.spark.sql.SparkSession

/** Plan-review tool: `runMain graft.Explain <query> <sfDir> [plan]` —
  * times one SparkEntry query and (with `plan`) prints the formatted
  * physical plan, the §6 checklist input (PushedFilters, ReadSchema,
  * broadcast choices, WholeStageCodegen spans, Exchanges). */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val showPlan = args.length > 2 && args(2) == "plan"
    val spark = Tables.session(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
    // time construction AND execution: iterative/DML queries do real
    // work while the closure builds the frame (Bench measures the same
    // way, so these numbers stay comparable)
    val t0 = System.nanoTime()
    val df = SparkEntry.queries(name)(spark, sfDir)
    if (showPlan) println(df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode))
    val n = df.count()
    println(f"[explain] $name rows=$n time=${(System.nanoTime() - t0) / 1e9}%.2fs")
    spark.stop()
  }
}
