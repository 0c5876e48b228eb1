package graft

import graft.pipeline.Checks

class ChecksSpec extends SparkTestBase {
  import spark.implicits._

  test("unique flags duplicate key tuples") {
    val df = Seq((1L, 1), (1L, 1), (2L, 1)).toDF("k", "sub")
    val r = Checks.unique(df, Seq("k", "sub"), "pk").collect().head
    assert(r.getAs[Long]("metric") === 1L && !r.getAs[Boolean]("passed"))
  }

  test("complete counts nulls; inRange counts violations") {
    val df = Seq(Some(1.0), None, Some(5.0)).toDF("x")
    val c = Checks.complete(df, "x", "c").collect().head
    assert(c.getAs[Long]("metric") === 1L && !c.getAs[Boolean]("passed"))
    val rr = Checks.inRange(df, "x", 0.0, 2.0, "r").collect().head
    assert(rr.getAs[Long]("metric") === 1L && !rr.getAs[Boolean]("passed"))
  }

  test("referential counts orphans; kAnonymity counts small classes") {
    val child = Seq(1L, 2L, 9L).toDF("fk")
    val parent = Seq(1L, 2L).toDF("pk")
    val f = Checks.referential(child, "fk", parent, "pk", "fk").collect().head
    assert(f.getAs[Long]("metric") === 1L && !f.getAs[Boolean]("passed"))

    val d = Seq(("en", "a"), ("en", "a"), ("fr", "b")).toDF("lang", "src")
    val k = Checks.kAnonymity(d, Seq("lang", "src"), 2L, "k2").collect().head
    assert(k.getAs[Long]("metric") === 1L && !k.getAs[Boolean]("passed"))
  }

  test("suite unions check rows; a clean table passes everything") {
    val df = Seq((1L, 1.0), (2L, 2.0)).toDF("k", "x")
    val audit = Checks.suite(
      Checks.unique(df, Seq("k"), "u"),
      Checks.complete(df, "x", "c"),
      Checks.inRange(df, "x", 0.0, 10.0, "r")).collect()
    assert(audit.length === 3)
    assert(audit.forall(_.getAs[Boolean]("passed")))
    assert(audit.map(_.getAs[String]("check")).toSet === Set("u", "c", "r"))
  }

  test("lDiversity flags homogeneous classes k-anonymity misses") {
    // class A: 3 rows, all the same diagnosis (big but homogeneous);
    // class B: 2 rows, 2 distinct diagnoses
    val df = Seq(("A", "flu"), ("A", "flu"), ("A", "flu"),
      ("B", "flu"), ("B", "cold")).toDF("zip", "diag")
    val r = Checks.lDiversity(df, Seq("zip"), "diag", l = 2L, "l2").collect()(0)
    assert(r.getAs[Long]("metric") === 1L)     // only class A violates
    assert(!r.getAs[Boolean]("passed"))
    // the same table is 3-anonymous-ish on A: kAnonymity(k=3) flags B, not A
    val k = Checks.kAnonymity(df, Seq("zip"), 3L, "k3").collect()(0)
    assert(k.getAs[Long]("metric") === 1L)
    // empty input: vacuously clean, not null
    val e = Checks.lDiversity(df.filter("1 = 0"), Seq("zip"), "diag", 2L, "l2e")
      .collect()(0)
    assert(e.getAs[Long]("metric") === 0L && e.getAs[Boolean]("passed"))
  }
}
