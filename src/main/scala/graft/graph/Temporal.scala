package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.GraftStorage.Syntax

/** Temporal-network reachability over a bipartite CONTACT LOG
  * `(actor, entity, ts)` — the standard spreading-process primitive
  * (information diffusion, contagion tracing, provenance audits): a
  * time-respecting path alternates actor → entity → actor along
  * NON-DECREASING timestamps, so influence can only flow forward in
  * time. Static reachability over the projected graph wildly
  * over-counts — it happily routes through an entity whose contacts all
  * predate the source's arrival.
  */
object Temporal {

  /** EARLIEST-ARRIVAL reachability: for each actor, the earliest
    * timestamp (unix micros; seeds = 0) at which a time-respecting path
    * from any seed reaches it within `waves` actor→entity→actor steps.
    * Returns `(actor, arrival_us)` — actors never reached have no row.
    *
    * Per wave the DP relaxes twice: an entity's arrival is the MIN
    * timestamp of any contact by an already-reached actor at or after
    * that actor's arrival; an actor's arrival is the MIN timestamp of
    * any contact with a reached entity at or after the entity's arrival.
    * Both steps are one equi-join + one min-aggregate keyed on the
    * contact log's own columns — each contact row participates at most
    * once per side per wave, so a full run is O(waves · |contacts|)
    * shuffled rows with map-side partial mins; state is one
    * `(actor, long)` row per reached actor. Fixed `waves` define the
    * result (the [[Graph.shortestPathsWeighted]] contract — earliest
    * arrivals can improve without new rows, so "no new rows" is not
    * convergence); rounds are eager-checkpointed with the superseded
    * round released ([[Graph.shortestPaths]] precedent).
    *
    * All state is exact integer micros → the oracle replays the waves
    * bit-for-bit as unrolled join/min CTEs.
    */
  def earliestArrival(contacts: DataFrame, actorCol: String, entityCol: String,
                      tsCol: String, seeds: Seq[Long], waves: Int = 2): DataFrame = {
    require(waves >= 1, "waves must be >= 1")
    // both relax joins probe the contact log every wave — pin it once
    val c = contacts.select(col(actorCol).as("u"), col(entityCol).as("ent"),
        unix_micros(col(tsCol)).as("ts"))
      .persistTracked()
    var arr = c.select(col("u")).filter(col("u").isin(seeds: _*)).distinct()
      .select(col("u").as("au"), lit(0L).as("arr"))
      .localCheckpoint(true)
    for (_ <- 1 to waves) {
      val eArr = c.join(arr, col("u") === col("au") && col("ts") >= col("arr"))
        .groupBy(col("ent").as("eent")).agg(min(col("ts")).as("earr"))
      val reached = c.join(eArr, col("ent") === col("eent") && col("ts") >= col("earr"))
        .groupBy(col("u").as("au")).agg(min(col("ts")).as("arr"))
      val next = arr.unionByName(reached)
        .groupBy(col("au")).agg(min(col("arr")).as("arr"))
        .localCheckpoint(true)
      graft.GraftStorage.releaseCheckpoint(arr) // superseded wave
      arr = next
    }
    arr.select(col("au").as("actor"), col("arr").as("arrival_us"))
  }
}
