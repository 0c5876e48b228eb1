package graft.graph

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Property graph as two DataFrames — the representation GraphFrames uses
  * and the reference leans on everywhere (`RetweetTagsJaccardGraph.py:42`).
  * Vertices carry a single string `id` (heterogeneous union of user ids and
  * hashtag strings, SURVEY.md §1.2); edges are `(src, dst, w, type)` with
  * `w: double` (documented divergence: the reference's unioned `w` is
  * string-coerced because its `jaccard` UDF defaults to StringType).
  */
case class Graph(vertices: DataFrame, edges: DataFrame) {

  /** Subgraph by edge predicate (reference G3, `g.filterEdges(sql)` at
    * `RetweetTagsJaccardGraph.py:262,271`). Vertices are left untouched,
    * matching GraphFrames semantics; use [[withDerivedVertices]] to shrink
    * the vertex set to the surviving endpoints.
    */
  def filterEdges(sqlPredicate: String): Graph = filterEdges(expr(sqlPredicate))

  def filterEdges(condition: Column): Graph = Graph(vertices, edges.filter(condition))

  /** Re-derive vertices as the endpoint set of the current edges
    * (`RetweetTagsJaccardGraph.py:274-276`).
    */
  def withDerivedVertices: Graph = Graph(Graph.verticesOf(edges), edges)

  /** GraphFrames-style motif search (reference G2,
    * `RetweetTagsJaccardGraph.py:158`) — see [[Motif]] for the supported
    * grammar, semantics, and scale notes.
    */
  def find(pattern: String): DataFrame = Motif.find(this, pattern)

  /** CSV export of edges + vertices (reference S2, `bigdata/__init__.py:96-114`).
    * `coalesce(1)` instead of the reference's `repartition(1)` — same single
    * output file without the full shuffle.
    */
  def save(path: String, prefix: String, sep: String = ","): Unit = {
    def write(df: DataFrame, p: String): Unit =
      df.coalesce(1).write.mode("overwrite")
        .option("header", "true").option("sep", sep).csv(p)
    write(edges, s"$path/$prefix.edges.csv")
    write(vertices, s"$path/$prefix.vertices.csv")
  }
}

object Graph {
  /** Distinct endpoint ids of an edge set — the vertex-derivation idiom the
    * reference repeats at `RetweetTagsJaccardGraph.py:68-70,131-133,188-190`.
    */
  def verticesOf(edges: DataFrame): DataFrame =
    edges.select(col("src").as("id"))
      .union(edges.select(col("dst").as("id")))
      .distinct()
}
