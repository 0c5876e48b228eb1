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

  private[graft] def parseLocalEdges(v: Option[String]): Long =
    parseLong("SPARK_GRAFT_LOCAL_EDGES", v, default = 2000000L, min = 0L)

  /** Per-vertex adjacency cap for the walk family
    * ([[graft.graph.Graph.deterministicWalks]] and siblings). Exists
    * because of a power-law-OOM finding (one hub's full neighbor list as
    * a single `collect_list` array row); 10000 string neighbors ≈ a few
    * hundred KB per hub row. The right cap is a cluster-memory fact, so
    * it is tunable via `SPARK_GRAFT_WALK_MAX_DEGREE` without recompiling.
    */
  val WalkMaxDegree: Int =
    parseWalkMaxDegree(sys.env.get("SPARK_GRAFT_WALK_MAX_DEGREE"))

  private[graft] def parseWalkMaxDegree(v: Option[String]): Int = {
    val n = parseLong("SPARK_GRAFT_WALK_MAX_DEGREE", v, default = 10000L, min = 1L)
    require(n <= Int.MaxValue,
      s"SPARK_GRAFT_WALK_MAX_DEGREE must fit an int, got $n")
    n.toInt
  }

  /** Vector count at or below which
    * [[graft.pipeline.Dedup.embeddingNearDupAuto]] uses the EXACT
    * all-pairs regime (complete recall, O(n²) pairs) and above which it
    * switches to self-sizing LSH (bucketed equi-joins, recall bounded by
    * the band/guard contract). ~10⁵ vectors ≈ 5·10⁹ candidate dot
    * products — the measured point where exact stops paying for its
    * recall on this host; a beefier cluster can raise it via
    * `SPARK_GRAFT_EXACT_PAIR_VECTORS`.
    */
  val ExactPairVectors: Long =
    parseExactPairVectors(sys.env.get("SPARK_GRAFT_EXACT_PAIR_VECTORS"))

  private[graft] def parseExactPairVectors(v: Option[String]): Long =
    parseLong("SPARK_GRAFT_EXACT_PAIR_VECTORS", v, default = 100000L, min = 0L)

  private def parseLong(name: String, v: Option[String], default: Long,
                        min: Long): Long = v match {
    case None => default
    case Some(s) =>
      val n = try s.trim.toLong catch {
        case _: NumberFormatException => throw new IllegalArgumentException(
          s"$name must be a long, got '$s'")
      }
      require(n >= min, s"$name must be >= $min, got $n")
      n
  }
}
