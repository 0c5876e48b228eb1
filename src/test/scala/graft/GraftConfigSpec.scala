package graft

import org.scalatest.funsuite.AnyFunSuite

class GraftConfigSpec extends AnyFunSuite {

  test("parseLocalEdges: measured default when unset, parsed when set") {
    assert(GraftConfig.parseLocalEdges(None) == 2000000L)
    assert(GraftConfig.parseLocalEdges(Some("500")) == 500L)
    assert(GraftConfig.parseLocalEdges(Some(" 0 ")) == 0L)
  }

  test("parseLocalEdges: a set but invalid value fails loudly") {
    val e = intercept[IllegalArgumentException](
      GraftConfig.parseLocalEdges(Some("two million")))
    assert(e.getMessage.contains("SPARK_GRAFT_LOCAL_EDGES"))
    intercept[IllegalArgumentException](GraftConfig.parseLocalEdges(Some("-1")))
  }

  test("parseWalkMaxDegree: default 10000, parsed when set, loud when invalid") {
    assert(GraftConfig.parseWalkMaxDegree(None) == 10000)
    assert(GraftConfig.parseWalkMaxDegree(Some("250")) == 250)
    val e = intercept[IllegalArgumentException](
      GraftConfig.parseWalkMaxDegree(Some("lots")))
    assert(e.getMessage.contains("SPARK_GRAFT_WALK_MAX_DEGREE"))
    // a zero cap would silently empty every walk — reject, don't obey
    intercept[IllegalArgumentException](GraftConfig.parseWalkMaxDegree(Some("0")))
    intercept[IllegalArgumentException](
      GraftConfig.parseWalkMaxDegree(Some("9999999999")))
  }

  test("the walk family's default cap reads the env knob, not a compile-time constant") {
    // walks pass maxDegree = Graph.DefaultWalkMaxDegree; the cluster
    // operator tunes it via SPARK_GRAFT_WALK_MAX_DEGREE without recompiling
    assert(graft.graph.Graph.DefaultWalkMaxDegree == GraftConfig.WalkMaxDegree)
  }

  test("parseExactPairVectors: default 1e5, parsed when set, loud when invalid") {
    assert(GraftConfig.parseExactPairVectors(None) == 100000L)
    assert(GraftConfig.parseExactPairVectors(Some("42")) == 42L)
    val e = intercept[IllegalArgumentException](
      GraftConfig.parseExactPairVectors(Some("1e5")))
    assert(e.getMessage.contains("SPARK_GRAFT_EXACT_PAIR_VECTORS"))
    intercept[IllegalArgumentException](GraftConfig.parseExactPairVectors(Some("-5")))
  }
}
