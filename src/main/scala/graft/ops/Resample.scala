package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series resampling to a regular grid with forward fill — the
  * "every key, every bucket, latest known value" shape that feature
  * pipelines and dashboards need from irregular event streams.
  *
  * Per key: buckets run from the key's first to last observation
  * (`floor(ms/stepMs)`); each bucket takes the LAST observation inside it
  * (total order `(ts, seq)`), and empty buckets inherit the previous
  * bucket's value (forward fill).
  *
  * Scale shape: one groupBy for per-bucket last values (max_by — map-side
  * partial), one per-key `sequence` explode for the grid (size the step
  * so buckets-per-key stays bounded: days for month-long ranges, not
  * milliseconds), one equi-join, one per-key window ordered by bucket
  * (high-cardinality key → well-distributed). The fill value rides in a
  * struct box so a genuinely-null observation forward-fills as null
  * instead of resurrecting an older value (same box trick as
  * [[AsOfJoin]]).
  */
object Resample {

  def forwardFill(df: DataFrame, key: String, ts: String, seq: String,
                  value: String, stepMs: Long): DataFrame = {
    val bucketed = df.select(col(key),
      floor(unix_millis(col(ts)) / stepMs).cast("long").as("bucket"),
      col(ts), col(seq), col(value))
    val perBucket = bucketed.groupBy(col(key), col("bucket"))
      .agg(max_by(struct(col(value).as("v")), struct(col(ts), col(seq))).as("box"))
    val grid = bucketed.groupBy(col(key))
      .agg(min("bucket").as("b0"), max("bucket").as("b1"))
      .select(col(key), explode(sequence(col("b0"), col("b1"))).as("bucket"))
    grid.join(perBucket, Seq(key, "bucket"), "left")
      .withColumn("__filled", last(col("box"), ignoreNulls = true).over(
        Window.partitionBy(key).orderBy("bucket")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col(key), col("bucket"), col("__filled.v").as("filled"))
  }
}
