package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Hashtag/text normalization (reference F1-F5, `bigdata/__init__.py:49-70`)
  * and array stringification (reference D1, `bigdata/__init__.py:23`) as
  * native Catalyst expressions — fully codegen'd, no UDF serialization
  * boundary.
  */
object Normalize {
  /** Char-for-char de-accent map, verbatim from `bigdata/__init__.py:63`
    * (25 source chars incl. a duplicate 'ä'; `translate` is
    * first-mapping-wins on the duplicate in both engines).
    */
  val Accented = "ãäöüẞáäčďéěíĺľňóôŕšťúùůýž"
  val Plain    = "aaousaacdeeillnoorstuuuyz"

  /** lowercase + de-accent one string. */
  def normalizeTag(c: Column): Column = translate(lower(c), Accented, Plain)

  /** Reference-faithful array normalization (`bigdata/__init__.py:60-67`):
    * the array→string→array round trip (join on "," → lower → translate →
    * split) applied before dedup + sort. Kept verbatim because it has an
    * observable quirk: an empty array becomes `[""]`, and that "" tag then
    * participates downstream (SURVEY.md §7.4 #4).
    */
  def normalizeTags(c: Column): Column =
    array_sort(array_distinct(split(normalizeTag(array_join(c, ",")), ",")))

  /** Element-wise variant without the round-trip quirk (`[] → []`): cleaner
    * semantics for new pipelines; NOT used on the reference-fidelity path.
    */
  def normalizeTagsElementwise(c: Column): Column =
    array_sort(array_distinct(transform(c, normalizeTag(_))))

  /** `'[' + ','.join(x) + ']'` (reference D1) as a native expression. */
  def stringifyArray(c: Column): Column =
    concat(lit("["), array_join(c, ","), lit("]"))
}
