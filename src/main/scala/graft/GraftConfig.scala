package graft

/** Deployment-tunable knobs, env-read once at class load.
  *
  * These are HOST-MEASURED constants whose right value differs between
  * this single-JVM test host and a real cluster, so they must be tunable
  * without recompiling. Every knob keeps the measured default; a set but
  * unparsable value FAILS LOUDLY — a silently ignored misconfiguration
  * would look exactly like the tuning having no effect.
  */
object GraftConfig {

  /** Edge count at or below which the iterative-graph operators
    * ([[graft.pipeline.Dedup.components]],
    * [[graft.graph.Graph.stronglyConnectedComponents]]) switch from the
    * distributed propagation loop to ONE single-task pass (union-find /
    * Tarjan). 2M string edges is tens of MB in one task — measured on
    * this host as the point where a job-per-round loop stops paying for
    * itself. On a large cluster with slower task dispatch or bigger
    * executors, tune via `SPARK_GRAFT_LOCAL_EDGES`.
    */
  val LocalEdgeThreshold: Long =
    parseLocalEdges(sys.env.get("SPARK_GRAFT_LOCAL_EDGES"))

  private[graft] def parseLocalEdges(v: Option[String]): Long = v match {
    case None => 2000000L
    case Some(s) =>
      val n = try s.trim.toLong catch {
        case _: NumberFormatException => throw new IllegalArgumentException(
          s"SPARK_GRAFT_LOCAL_EDGES must be a long, got '$s'")
      }
      require(n >= 0, s"SPARK_GRAFT_LOCAL_EDGES must be >= 0, got $n")
      n
  }
}
