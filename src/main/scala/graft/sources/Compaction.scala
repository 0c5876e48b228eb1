package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions.col

/** Small-files compaction — the nightly maintenance job every streaming
  * ingest needs: micro-batch sinks leave thousands of KB-sized parquet
  * files whose open/footer overhead eventually dominates scans.
  *
  * The rewrite is `repartitionByRange(sortCol)` + `sortWithinPartitions`:
  *  - ONE range-partitioner exchange (the minimum any bulk rewrite pays);
  *  - output files carry disjoint `sortCol` ranges with tight parquet
  *    min/max footer stats, so later range/point predicates on `sortCol`
  *    skip whole files (the same data-skipping contract as
  *    [[ZOrder]] for one dimension);
  *  - `targetFiles` sizes output for the TARGET cluster's scan
  *    parallelism — pick `totalBytes / ~512 MB`, not today's file count.
  */
object Compaction {

  /** Compact `input` into `targetFiles` range-clustered files at `outDir`.
    * Returns the compacted frame re-read from disk (for chaining /
    * verification).
    */
  def compact(input: DataFrame, outDir: String, sortCol: String,
              targetFiles: Int): DataFrame = {
    input
      .repartitionByRange(targetFiles, col(sortCol))
      .sortWithinPartitions(sortCol)
      .write.mode(SaveMode.Overwrite).parquet(outDir)
    input.sparkSession.read.parquet(outDir)
  }
}
