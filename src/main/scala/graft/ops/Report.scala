package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-user flat report (reference `exportReport`,
  * `RetweetTagsJaccardGraph.py:194-243`): for each user — normalized tags,
  * users they retweeted-relationship with (both directions), and their
  * Jaccard-similar peers. Columns: user | hashTags | retweetUsers |
  * beRetweetUsers | jaccardUsers (arrays stringified as "[a,b,c]").
  *
  * The reference's third join matches JC edges on EITHER endpoint with an
  * OR condition (`:225-227`), which Spark can only plan as a
  * BroadcastNestedLoopJoin. Rewritten (SURVEY.md J5) as a union of the two
  * endpoint projections followed by ONE left equi-join — same semantics
  * (`array_except(concat(collect_set(src), collect_set(dst)), [user])`
  * ≡ collect_set over the unioned peer column minus the user), and it
  * shuffle-joins at any scale.
  *
  * Divergence (documented): collected arrays are `array_sort`ed for
  * deterministic output; the reference's array order is whatever
  * `collect_set` produced.
  */
object Report {

  def build(userTags: DataFrame, rtEdges: DataFrame, jcEdges: DataFrame): DataFrame = {
    // J3: users this user retweeted-to (edge author→retweeter; user as src)
    val rt = rtEdges.select(col("src"), col("dst"))
    val step1 = userTags
      .join(rt, userTags("id") === rt("src"), "left")
      .select(userTags("id").as("user"), col("hts"), col("dst").as("retweeted_user"))
      .groupBy(col("user"), col("hts")) // array-typed grouping key, as in the reference (A4)
      .agg(array_sort(collect_set(col("retweeted_user"))).as("rt_users"))

    // J4: users who retweeted this user (user as dst)
    val step2 = step1
      .join(rt, step1("user") === rt("dst"), "left")
      .groupBy(col("user"), col("hts"), col("rt_users"))
      .agg(array_sort(collect_set(col("src"))).as("bert_users"))

    // J5 rewrite: both endpoints of each JC edge → (user, peer), one equi-join
    val peers = jcEdges.select(col("src").as("u"), col("dst").as("peer"))
      .union(jcEdges.select(col("dst").as("u"), col("src").as("peer")))
    val step3 = step2
      .join(peers, step2("user") === peers("u"), "left")
      .groupBy(col("user"), col("hts"), col("rt_users"), col("bert_users"))
      .agg(array_sort(array_except(collect_set(col("peer")), array(col("user")))).as("jc_users"))

    step3.select(
      col("user"),
      Normalize.stringifyArray(col("hts")).as("hashTags"),
      Normalize.stringifyArray(col("rt_users")).as("retweetUsers"),
      Normalize.stringifyArray(col("bert_users")).as("beRetweetUsers"),
      Normalize.stringifyArray(col("jc_users")).as("jaccardUsers"))
  }

  /** Power BI CSV export (`:242-243`): single file, `;` separator. */
  def save(report: DataFrame, path: String): Unit =
    report.coalesce(1).write.mode("overwrite")
      .option("header", "true").option("sep", ";")
      .csv(s"$path/exportPowerBI")
}
