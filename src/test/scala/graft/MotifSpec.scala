package graft

import graft.graph.{Graph, Motif}
import graft.ops.JaccardGraph
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

class MotifSpec extends SparkTestBase {
  import spark.implicits._

  private def graphOf(edges: Seq[(String, String, Double, String)]): Graph = {
    val e = edges.toDF("src", "dst", "w", "type")
    Graph(Graph.verticesOf(e), e)
  }

  private val diamond = graphOf(Seq(
    ("u1", "t1", 1.0, "HT"), ("u2", "t1", 1.0, "HT"),
    ("u1", "t2", 1.0, "HT"), ("u2", "t2", 1.0, "HT"),
    ("u3", "t1", 1.0, "HT")))

  test("parse: named, anonymous, negated, and malformed terms") {
    assert(Motif.parse("(a)-[e]->(b); ()-[]->(c)") ===
      Seq(Motif.EdgeTerm("a", "e", "b"), Motif.EdgeTerm("", "", "c")))
    assert(Motif.parse("(a)-[]->(b); !(b)-[]->(a)") ===
      Seq(Motif.EdgeTerm("a", "", "b"),
        Motif.EdgeTerm("b", "", "a", negated = true)))
    // GraphFrames rules: all-negated motif, named edge inside a negation,
    // and a vertex that exists only in a negated term are all rejected
    intercept[IllegalArgumentException](Motif.parse("!(a)-[]->(b)"))
    intercept[IllegalArgumentException](Motif.parse("(a)-[]->(b); !(a)-[e]->(b)"))
    intercept[IllegalArgumentException](Motif.parse("(a)-[]->(b); !(c)-[]->(a)"))
    intercept[IllegalArgumentException](Motif.parse("   "))
    intercept[IllegalArgumentException](
      Motif.find(diamond, "(a)-[e]->(b); (b)-[e]->(c)")) // duplicate edge name
    intercept[IllegalArgumentException](
      Motif.find(diamond, "(a)-[a]->(b)")) // vertex/edge name clash
  }

  test("negated term: one-way edges (a→b with no b→a)") {
    val g = graphOf(Seq(
      ("a", "b", 1.0, "RT"), ("b", "a", 1.0, "RT"), // mutual — excluded
      ("c", "d", 1.0, "RT")))                       // one-way — kept
    val oneWay = g.find("(x)-[]->(y); !(y)-[]->(x)")
      .select(col("x.id"), col("y.id")).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(oneWay === Set(("c", "d")))
  }

  test("negated term with anonymous endpoint: terminal vertices") {
    val g = graphOf(Seq(
      ("a", "b", 1.0, "RT"), ("b", "c", 1.0, "RT")))
    // y has no out-edge at all
    val terminal = g.find("(x)-[]->(y); !(y)-[]->()")
      .select(col("x.id"), col("y.id")).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(terminal === Set(("b", "c")))
  }

  test("single edge term returns src-struct, edge-struct, dst-struct columns") {
    val rows = diamond.find("(x)-[e]->(y)")
    assert(rows.columns.toSeq === Seq("x", "e", "y"))
    assert(rows.count() === 5)
    val one = rows.filter(col("x.id") === "u3").collect().head
    assert(one.getStruct(1).getAs[String]("type") === "HT")
    assert(one.getStruct(2).getAs[String]("id") === "t1")
  }

  test("repeated vertex name unifies: 2-paths through a shared middle vertex") {
    val chain = graphOf(Seq(
      ("a", "b", 1.0, "RT"), ("b", "c", 1.0, "RT"), ("c", "d", 1.0, "RT")))
    val paths = chain.find("(x)-[]->(y); (y)-[]->(z)")
      .select(col("x.id"), col("y.id"), col("z.id")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(paths === Set(("a", "b", "c"), ("b", "c", "d")))
  }

  test("anonymous vertices do not unify with each other") {
    val g = graphOf(Seq(("a", "b", 1.0, "RT"), ("c", "d", 1.0, "RT")))
    // two independent anonymous-endpoint terms → full 2×2 cross of edges —
    // the GraphFrames cartesian semantics, behind the explicit opt-in
    assert(g.find("()-[e]->(); ()-[e2]->()", allowCartesian = true).count() === 4)
  }

  test("a disconnected pattern fails LOUDLY unless the cartesian is opted into") {
    val g = graphOf(Seq(("a", "b", 1.0, "RT"), ("c", "d", 1.0, "RT")))
    // at test scale a silent cartesian looks fine; at 100× it plans an
    // |matches|² product — the compiler must refuse without the opt-in
    val e = intercept[IllegalArgumentException] {
      g.find("(x)-[]->(y); (z)-[]->(w)")
    }
    assert(e.getMessage.contains("CARTESIAN"))
    assert(e.getMessage.contains("allowCartesian"))
    // the opt-in path keeps GraphFrames semantics: 2 × 2 edge matches
    assert(g.find("(x)-[]->(y); (z)-[]->(w)", allowCartesian = true).count() === 4)
  }

  test("self-loop pattern matches only loops") {
    val g = graphOf(Seq(("a", "a", 1.0, "RT"), ("a", "b", 1.0, "RT")))
    val loops = g.find("(v)-[e]->(v)").select(col("v.id")).as[String].collect()
    assert(loops.toSeq === Seq("a"))
  }

  test("the reference's 4-vertex shared-hashtag motif on the diamond graph") {
    // u1,u2 share {t1,t2} → the one candidate couple; u3 has only t1
    val couples = diamond
      .find("(c)-[e]->(a); (d)-[e1]->(a); (c)-[e2]->(b); (d)-[e3]->(b)")
      .filter("e.type = 'HT' and e1.type = 'HT' and e2.type = 'HT' and " +
        "e3.type = 'HT' and a.id > b.id and c.id > d.id")
      .select(col("c.id"), col("d.id")).distinct().collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(couples.toSeq === Seq(("u2", "u1")))
  }

  // -------- property: motif find ≡ JaccardGraph count-based rewrite (J6)

  private def trials[A](gen: Gen[A], n: Int)(body: A => Unit): Unit =
    (0 until n).foreach { i =>
      body(gen.apply(Gen.Parameters.default.withSize(10), Seed(i.toLong))
        .getOrElse(fail(s"generator failed for seed $i")))
    }

  private val tagPairGen: Gen[List[(String, String)]] =
    Gen.listOfN(14, for {
      u <- Gen.choose(1, 5)
      t <- Gen.oneOf("t1", "t2", "t3", "t4")
    } yield (s"u$u", t))

  test("motif find ≡ count-based J6 rewrite on random bipartite graphs") {
    trials(tagPairGen, 10) { pairs =>
      val ut = pairs.distinct // (user, tag), deduped like normalized tag lists
      val g = graphOf(ut.map { case (u, t) => (u, t, 1.0, "HT") })
      val viaMotif = g
        .find("(c)-[e]->(a); (d)-[e1]->(a); (c)-[e2]->(b); (d)-[e3]->(b)")
        .filter("e.type = 'HT' and e1.type = 'HT' and e2.type = 'HT' and " +
          "e3.type = 'HT' and a.id > b.id and c.id > d.id")
        .select(col("c.id"), col("d.id")).distinct().collect()
        .map(r => (r.getString(0), r.getString(1))).toSet
      val viaRewrite = JaccardGraph.pairsFromTagPairs(
          ut.toDF("id", "tag"), minShared = 2L)
        .select("src", "dst").collect()
        .map(r => (r.getString(0), r.getString(1))).toSet
      assert(viaMotif === viaRewrite, s"pairs=$ut")
    }
  }

  // -------- property: negation ≡ brute-force NOT EXISTS enumeration

  private val edgeListGen: Gen[List[(String, String)]] =
    Gen.listOfN(12, for {
      s <- Gen.choose(1, 5)
      d <- Gen.choose(1, 5)
    } yield (s"u$s", s"u$d"))

  test("negated motif ≡ brute-force enumeration on random directed graphs") {
    trials(edgeListGen, 10) { raw =>
      val edges = raw.distinct
      val e = edges.toSet
      val g = graphOf(edges.map { case (s, d) => (s, d, 1.0, "RT") })

      // one-way edges: (x)->(y) with no back edge
      val oneWay = g.find("(x)-[]->(y); !(y)-[]->(x)")
        .select(col("x.id"), col("y.id")).collect()
        .map(r => (r.getString(0), r.getString(1))).toSet
      assert(oneWay === e.filter { case (s, d) => !e.contains((d, s)) },
        s"one-way mismatch, edges=$edges")

      // open 2-paths: x→y→z with no closing x→z (bindings, so x=z allowed)
      val open = g.find("(x)-[]->(y); (y)-[]->(z); !(x)-[]->(z)")
        .select(col("x.id"), col("y.id"), col("z.id")).collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
      val brute = for {
        (x, y) <- e; (y2, z) <- e if y2 == y && !e.contains((x, z))
      } yield (x, y, z)
      assert(open === brute, s"open-path mismatch, edges=$edges")
    }
  }

  test("undirected term: parses, matches either orientation, loop binds once") {
    assert(Motif.parse("(a)-[e]-(b)") ===
      Seq(Motif.EdgeTerm("a", "e", "b", directed = false)))
    val g = graphOf(Seq(
      ("u1", "u2", 1.0, "RT"), ("u3", "u3", 1.0, "RT")))
    val und = g.find("(a)-[e]-(b)")
      .select(col("a.id"), col("b.id")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    // u1-u2 binds in both orientations; the u3 loop exactly once
    assert(und.sorted === Seq(("u1", "u2"), ("u2", "u1"), ("u3", "u3")).sorted)
  }

  test("undirected ≡ union of both directed orientations on random graphs") {
    trials(edgeListGen, 10) { raw =>
      val edges = raw.distinct
      val g = graphOf(edges.map { case (s, d) => (s, d, 1.0, "RT") })
      def pairs(p: String) = g.find(p).select(col("x.id"), col("y.id"))
        .collect().map(r => (r.getString(0), r.getString(1))).toSeq
      val und = pairs("(x)-[]-(y)")
      val fwd = pairs("(x)-[]->(y)")
      val rev = edges.filter { case (s, d) => s != d }
        .map { case (s, d) => (d, s) }
      // multiset equality: undirected = forward bindings + reversed non-loops
      assert(und.sorted === (fwd ++ rev).sorted, s"edges=$edges")

      // undirected negation: connected-in-NEITHER-direction 2-path closure
      val e = edges.toSet
      val open = g.find("(x)-[]->(y); (y)-[]->(z); !(x)-[]-(z)")
        .select(col("x.id"), col("y.id"), col("z.id")).collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
      val brute = for {
        (x, y) <- e; (y2, z) <- e
        if y2 == y && !e.contains((x, z)) && !e.contains((z, x))
      } yield (x, y, z)
      assert(open === brute, s"undirected-negation mismatch, edges=$edges")
    }
  }
}
