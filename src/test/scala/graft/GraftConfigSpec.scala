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
}
