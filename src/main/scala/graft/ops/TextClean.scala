package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions._

/** Word-cloud text cleaning (reference D6, `bigdata/__init__.py:28,31-47`
  * + `generateTextFromTweeter` at `:73-94`).
  *
  * The reference runs spaCy `en_core_web_sm` (tokenize → lemmatize → keep
  * alphabetic lemmas). spaCy does not exist on the JVM — DOCUMENTED
  * DIVERGENCE: we tokenize with a regex, keep alphabetic tokens, and
  * lowercase as a lemma approximation. The cleaner is pluggable behind
  * [[TextCleaner]] so a real JVM lemmatizer can be dropped in.
  *
  * TOKEN CLASS (r12 verdict finding 2): the reference keeps tokens where
  * Python's `isalpha()` holds, which is UNICODE-aware — so the token
  * class here is `\p{L}+` (any Unicode letter), not `[A-Za-z]+`: the
  * golden fixture's "unicode tëst!" cleans to "unicode tëst" (one kept
  * accented token), matching spaCy, where the pre-r13 ASCII class split
  * it to "unicode t st". Order is lower() THEN split on non-letters, in
  * both the UDF and expr forms (Locale.ROOT lowercasing, same as
  * Spark's `lower`), so the two stay behavior-identical.
  */
trait TextCleaner extends Serializable {
  /** null-safe: None → "" like the reference (`:40-41`). */
  def clean(s: String): String
}

/** Regex tokenizer (Unicode letters) + lowercase — same order as
  * [[TextClean.cleanExpr]]: lower first, then split on non-letters.
  */
object RegexTextCleaner extends TextCleaner {
  override def clean(s: String): String =
    if (s == null) ""
    else s.toLowerCase(java.util.Locale.ROOT)
      .split("[^\\p{L}]+").filter(_.nonEmpty).mkString(" ")
}

/** [[RegexTextCleaner]] + Porter stemming — the closest public,
  * dependency-free stand-in for the reference's spaCy lemmatization
  * (tokenize → lemmatize → keep alphabetic, `bigdata/__init__.py:42-46`).
  * "running"→"run", "studies"→"studi": regular inflections normalize like
  * spaCy's lemmas; what still differs is documented on
  * [[graft.functions.Porter]] (irregular forms, POS-sensitive lemmas,
  * non-word stems).
  */
object PorterTextCleaner extends TextCleaner {
  override def clean(s: String): String =
    if (s == null) ""
    else s.toLowerCase(java.util.Locale.ROOT)
      .split("[^\\p{L}]+").filter(_.nonEmpty)
      .map(graft.functions.Porter.stem).mkString(" ")
}

object TextClean {

  def cleanUdf(cleaner: TextCleaner = RegexTextCleaner): UserDefinedFunction =
    udf((s: String) => cleaner.clean(s))

  /** Pure-Catalyst equivalent of [[RegexTextCleaner]] — keeps the hot path
    * inside whole-stage codegen (no UDF serialization): strip
    * non-alphabetic runs containing digits, split, filter, lower, join.
    */
  def cleanExpr(c: Column): Column =
    array_join(
      filter(
        // after lower(), anything that is not a Unicode letter splits —
        // the reference's `isalpha()` token class (see object scaladoc)
        split(lower(c), "[^\\p{L}]+"),
        t => length(t) > 0),
      " ")

  /** [[cleanExpr]] + per-token Porter stemming — the stemmed twin, still
    * fully codegen'd: `graft_stem` is a native expression and the
    * `transform` lambda touches only its element variable (no re-evaluated
    * captured expression — the O(W²) HOF trap). Needs
    * [[graft.functions.VectorFunctions.register]] on the session.
    */
  def stemmedCleanExpr(c: Column): Column =
    array_join(
      transform(
        filter(split(lower(c), "[^\\p{L}]+"), t => length(t) > 0),
        w => graft.functions.VectorFunctions.stem(w)),
      " ")

  /** Per-tweet cleaned text, preferring the retweeted original's text
    * (reference P6 + D6, `bigdata/__init__.py:87-90`). `stemmed = true`
    * runs the Porter-stemmed cleaner — closest to the reference's spaCy
    * lemmatized output (the session must have VectorFunctions registered).
    */
  def wordcloudText(tweets: DataFrame, stemmed: Boolean = false): DataFrame = {
    val cl: Column => Column = if (stemmed) stemmedCleanExpr else cleanExpr
    tweets.select(
      when(col("retweeted_status.text").isNull, cl(col("text")))
        .otherwise(cl(col("retweeted_status.text")))
        .as("txt_plus_rt"))
  }

  /** CSV dump for the word cloud (`bigdata/__init__.py:91-93`). */
  def save(df: DataFrame, basePath: String): Unit =
    df.coalesce(1).write.mode("overwrite")
      .option("header", "true").csv(s"$basePath/wordCloud")
}
