package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Physical-plan audit over the whole catalog: for each query, the parquet
  * scans (read schema width + pushed filters), the join operators chosen,
  * and any whole-stage-codegen gaps. The 100 TB checklist in executable
  * form — run after plan-shape changes:
  *
  *   sbt "runMain graft.PlanAudit /root/testdata/sf0.01"
  */
object PlanAudit {

  private def collectAll(p: SparkPlan): Seq[SparkPlan] =
    p +: (p.children ++ p.subqueries).flatMap {
      case a: AdaptiveSparkPlanExec => collectAll(a.executedPlan)
      case c => collectAll(c)
    }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        val plan = df.queryExecution.executedPlan
        val nodes = collectAll(plan match {
          case a: AdaptiveSparkPlanExec => a.executedPlan
          case p => p
        })
        val scans = nodes.collect { case s: FileSourceScanExec =>
          val table = s.relation.location.rootPaths.headOption
            .map(_.getName.stripSuffix(".parquet")).getOrElse("?")
          val pushed = s.metadata.getOrElse("PushedFilters", "[]")
          s"$table cols=${s.requiredSchema.fieldNames.length}(${s.requiredSchema.fieldNames.mkString(",")}) pushed=$pushed"
        }
        val joins = nodes.map(_.nodeName).filter(_.contains("Join"))
          .groupBy(identity).map { case (k, v) => s"$k x${v.size}" }.toSeq.sorted
        println(s"== $name")
        scans.distinct.foreach(s => println(s"   scan: $s"))
        if (joins.nonEmpty) println(s"   joins: ${joins.mkString(", ")}")
        val nested = joins.exists(_.contains("NestedLoop"))
        val cartesian = joins.exists(_.contains("Cartesian"))
        if (nested || cartesian) println(s"   WARN: non-equi join in plan")
      } catch {
        case e: Throwable => println(s"== $name\n   AUDIT ERROR: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
