package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** GraphFrames-style motif search (reference G2,
  * `RetweetTagsJaccardGraph.py:158` — `g.find("(c)-[e]->(a); ...")`),
  * compiled to a cascade of equi-joins on the edge DataFrame.
  *
  * Supported pattern grammar: semicolon-separated edge terms
  * `(v1)-[e]->(v2)`, where any name may be empty (anonymous). An
  * UNDIRECTED term `(v1)-[e]-(v2)` — an extension; GraphFrames motifs are
  * directed-only — matches the edge row in either orientation (`e` binds
  * the original row; a self-loop binds once). Matching GraphFrames
  * semantics:
  *   - a repeated VERTEX name unifies (equi-join on the id);
  *   - each term binds a fresh edge row — two named edges may still bind
  *     the same underlying row (GraphFrames imposes no distinctness);
  *   - named vertices/edges come back as one struct column each, in
  *     first-appearance order; anonymous elements are matched but not
  *     returned;
  *   - named vertices must exist in `vertices` (inner join); anonymous
  *     endpoints are not checked;
  *   - no implicit dedup — one output row per distinct binding;
  *   - negated terms `!(a)-[]->(b)` assert NO such edge exists, compiled
  *     to a LEFT ANTI join (the scale-safe NOT EXISTS plan — one
  *     hash-partitioned anti join on the bound vertex columns, never a
  *     per-row subquery). GraphFrames' rules apply: a negated term may
  *     not name its edge, a motif may not be all-negated, and every
  *     vertex named in a negated term must be bound by a positive term
  *     (an anonymous endpoint is existential: `!(a)-[]->()` = "a has no
  *     out-edges at all").
  *
  * Scale shape: each term is one equi-join on a bound vertex column — the
  * same hash-partitioned shuffle a hand-written self-join cascade would
  * do, with Catalyst free to reorder and AQE to handle skew. A motif whose
  * terms share no vertex degenerates to a cross join (as in GraphFrames) —
  * guard patterns accordingly. For the reference's shared-hashtag motif
  * specifically, [[graft.ops.JaccardGraph]]'s count-based rewrite is the
  * strictly cheaper equivalent (4 joins → 1); `PropertySpec` proves the
  * equivalence on random graphs.
  */
object Motif {

  private[graft] final case class EdgeTerm(src: String, edge: String, dst: String,
                                           negated: Boolean = false,
                                           directed: Boolean = true)

  private val Term =
    """(!?)\s*\(\s*(\w*)\s*\)\s*-\s*\[\s*(\w*)\s*\]\s*(->|-)\s*\(\s*(\w*)\s*\)""".r

  private[graft] def parse(pattern: String): Seq[EdgeTerm] = {
    val terms = pattern.split(";").map(_.trim).filter(_.nonEmpty).toSeq
    require(terms.nonEmpty, s"empty motif pattern: '$pattern'")
    val parsed = terms.map {
      case Term(bang, s, e, arrow, d) =>
        val neg = bang.nonEmpty
        if (neg) require(e.isEmpty,
          s"negated term '!($s)-[$e]->($d)' may not name its edge (GraphFrames rule)")
        EdgeTerm(s, e, d, neg, directed = arrow == "->")
      case bad => throw new IllegalArgumentException(
        s"unsupported motif term '$bad' — expected '(v1)-[e]->(v2)', " +
          "'(v1)-[e]-(v2)' (either direction), or '!(v1)-[]->(v2)'")
    }
    require(parsed.exists(!_.negated),
      s"motif '$pattern' contains only negated terms (GraphFrames rule)")
    val positive = parsed.filterNot(_.negated)
      .flatMap(t => Seq(t.src, t.dst)).filter(_.nonEmpty).toSet
    parsed.filter(_.negated).foreach { t =>
      Seq(t.src, t.dst).filter(_.nonEmpty).foreach { v =>
        require(positive.contains(v),
          s"vertex '$v' appears only in a negated term — it must be bound " +
            "by a positive term")
      }
    }
    parsed
  }

  def find(g: Graph, pattern: String, allowCartesian: Boolean = false): DataFrame = {
    val terms = parse(pattern)
    val edgeNames = terms.map(_.edge).filter(_.nonEmpty)
    require(edgeNames.distinct.size == edgeNames.size,
      s"edge names must be unique, got: ${edgeNames.mkString(", ")}")
    val vertexNames = terms.flatMap(t => Seq(t.src, t.dst)).filter(_.nonEmpty).distinct
    require(vertexNames.intersect(edgeNames).isEmpty,
      "a name cannot be used for both a vertex and an edge")

    // named elements in first-appearance order → output column order
    val outOrder = scala.collection.mutable.LinkedHashSet.empty[String]
    terms.foreach { t =>
      if (t.src.nonEmpty) outOrder += t.src
      if (t.edge.nonEmpty) outOrder += t.edge
      if (t.dst.nonEmpty) outOrder += t.dst
    }

    // an undirected term matches the edge row in EITHER orientation; the
    // reversed side drops self-loops so a loop row binds once, not twice
    // (both orientations of a loop are the same edge). The bound struct is
    // the ORIGINAL edge row either way.
    def orient(sCol: String, dCol: String, edgeName: String, directed: Boolean) = {
      val fwd = g.edges.select(Seq(col("src").as(sCol), col("dst").as(dCol)) ++
        (if (edgeName.nonEmpty) Seq(struct(col("*")).as(edgeName)) else Nil): _*)
      if (directed) fwd
      else fwd.unionAll(
        g.edges.filter(col("src") =!= col("dst"))
          .select(Seq(col("dst").as(sCol), col("src").as(dCol)) ++
            (if (edgeName.nonEmpty) Seq(struct(col("*")).as(edgeName)) else Nil): _*))
    }

    var bound = Map.empty[String, String] // vertex name -> internal id column
    var acc: DataFrame = null
    terms.filterNot(_.negated).zipWithIndex.foreach { case (t, i) =>
      val (sCol, dCol) = (s"__s$i", s"__d$i")
      var term = orient(sCol, dCol, t.edge, t.directed)
      // self-loop term (a)-[e]->(a): constrain within the term itself
      if (t.src.nonEmpty && t.src == t.dst) term = term.filter(col(sCol) === col(dCol))
      if (acc == null) acc = term
      else {
        val conds = Seq(t.src -> sCol, t.dst -> dCol).collect {
          case (name, c) if name.nonEmpty && bound.contains(name) =>
            col(c) === col(bound(name))
        }
        // disconnected term → cartesian (GraphFrames semantics), but NEVER
        // silently: at 100× an accidentally disconnected pattern plans an
        // |matches|² product that looks fine at test scale and kills the
        // cluster in production. The caller must opt in.
        if (conds.isEmpty) require(allowCartesian,
          s"motif term '(${t.src})-[${t.edge}]->(${t.dst})' shares no bound " +
            "vertex with the preceding terms — the join would be a CARTESIAN " +
            "product over all matches so far. Reorder the pattern so every " +
            "term connects to an earlier one, or pass allowCartesian = true " +
            "if the product is intended (GraphFrames semantics).")
        acc = if (conds.isEmpty) acc.crossJoin(term)
              else acc.join(term, conds.reduce(_ && _))
      }
      if (t.src.nonEmpty && !bound.contains(t.src)) bound += t.src -> sCol
      if (t.dst.nonEmpty && !bound.contains(t.dst)) bound += t.dst -> dCol
    }

    // negated terms LAST (conjunctive semantics — order is immaterial, and
    // placing them after the positive joins keeps each one a single
    // LEFT ANTI hash join against the already-bound vertex columns; an
    // anonymous endpoint stays unconstrained = existentially quantified
    // inside the NOT EXISTS)
    terms.filter(_.negated).foreach { t =>
      require(t.src.nonEmpty || t.dst.nonEmpty,
        "a negated term needs at least one named endpoint")
      // undirected negation = "no edge in EITHER direction": the anti join
      // runs against both orientations (duplicates are harmless in an anti)
      val nterm = {
        val fwd = g.edges.select(col("src").as("__ns"), col("dst").as("__nd"))
        if (t.directed) fwd
        else fwd.unionAll(g.edges.select(col("dst").as("__ns"), col("src").as("__nd")))
      }
      val conds = Seq(t.src -> "__ns", t.dst -> "__nd").collect {
        case (name, c) if name.nonEmpty => col(c) === col(bound(name))
      }
      acc = acc.join(nterm, conds.reduce(_ && _), "left_anti")
    }

    // attach vertex attribute structs (inner join: named vertices must exist)
    val withVertices = bound.foldLeft(acc) { case (df, (v, idCol)) =>
      df.join(g.vertices.select(struct(col("*")).as(v), col("id").as(s"__vid_$v")),
        col(idCol) === col(s"__vid_$v"))
    }
    withVertices.select(outOrder.toSeq.map(col): _*)
  }
}
