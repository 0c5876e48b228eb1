package graft.cli

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthesize a ~10× scale point from the driver's sf0.1 testdata (no
  * sf1 exists) so the SCALE.md curve gets a third measured point. Each
  * replicated table keeps PER-COPY semantics identical to sf0.1 while
  * copies stay disjoint — so a 10× run measures data growth, not an
  * artificial blowup of the result set:
  *
  *  - key columns get a copy offset (disjoint id spaces; per-copy join
  *    and graph structure identical to sf0.1);
  *  - `documents.text` applies a BIJECTIVE word suffix per copy
  *    ("w" → "w·i"): within-copy shingle-set geometry (Jaccard,
  *    containment, minhash collisions on real dup structure) is exactly
  *    preserved under the bijection, while cross-copy shingle sets are
  *    disjoint — no synthetic cross-copy near-dups;
  *  - `embeddings.embedding` rotates dimensions by the copy index (a
  *    permutation — orthogonal, so within-copy cosines/norms are exactly
  *    preserved) — cross-copy vectors decorrelate instead of arriving as
  *    10 exact duplicates of each vector.
  *
  * Dimension-like tables (region/nation/part/supplier/customer/orders)
  * are copied once — the scale question lives in documents/embeddings/
  * lineitem/events for every expensive catalog query.
  *
  * Usage: `sbt "runMain graft.cli.GenScale /tmp/sfx1 10"`.
  */
object GenScale {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("/tmp/sfx1")
    val copies = args.lift(1).map(_.toInt).getOrElse(10)
    val srcDir = args.lift(2).getOrElse("/root/testdata/sf0.1")
    val Off = 100000000L
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def read(t: String) = spark.read.parquet(s"$srcDir/$t.parquet")

    def replicate(t: String)(per: (DataFrame, Int) => DataFrame): Unit = {
      val base = read(t)
      val all = (0 until copies).map(i => per(base, i)).reduce(_.unionByName(_))
      all.write.mode("overwrite").parquet(s"$outDir/$t.parquet")
      println(s"GENSCALE $t: ${all.count()} rows")
    }

    replicate("documents") { (df, i) =>
      val text =
        if (i == 0) col("text")
        else array_join(transform(split(col("text"), " "),
          w => concat(w, lit(s"·$i"))), " ")
      df.select((col("doc_id") + i * Off).as("doc_id"), text.as("text"),
        col("lang"), col("source"), col("n_chars"))
    }
    replicate("embeddings") { (df, i) =>
      // rotate by i mod 64: past 64 copies the rotation aliases (copies
      // 64.. reuse rotations 0..), which weakens CROSS-copy decorrelation
      // for aliased pairs but preserves the properties the experiment
      // needs — within-copy geometry exact, id spaces disjoint
      val r = i % 64
      val emb =
        if (r == 0) col("embedding")
        else concat(slice(col("embedding"), r + 1, 64 - r),
          slice(col("embedding"), 1, r))
      df.select((col("vec_id") + i * Off).as("vec_id"), emb.as("embedding"),
        col("label"))
    }
    // CLUSTERED mixture corpus (r11 verdict task 2) — the IVF
    // quantizer's FAVORABLE regime, so SCALE.md can measure the
    // base/probe/trained recall levers where they actually pay off
    // (the plain synthetic corpus is near-orthogonal, the worst case).
    // Mixture-of-"Gaussians" with deterministic components: cluster
    // c = vec_id % 16, centroid dimension d = (c·37 + d·13) % 17 − 8,
    // vector = centroid + the replicated embedding as the noise term —
    // the noise distribution is the empirical corpus, so no RNG
    // anywhere and the catalog's q_ann_recall_ivf_clustered derivation
    // (Queries.clusteredDeCte) replays it exactly at any scale.
    spark.read.parquet(s"$outDir/embeddings.parquet")
      .select(col("vec_id"),
        array((0 until 64).map { d =>
          (pmod(pmod(col("vec_id"), lit(16)) * lit(37) + lit(d * 13), lit(17))
            - lit(8)).cast("double") +
            col("embedding").getItem(d).cast("double")
        }: _*).as("embedding"),
        col("label"))
      .write.mode("overwrite").parquet(s"$outDir/embeddings_clustered.parquet")
    println(s"GENSCALE embeddings_clustered: written")
    replicate("lineitem") { (df, i) =>
      df.withColumn("l_orderkey", col("l_orderkey") + i * Off)
        .withColumn("l_partkey", col("l_partkey") + i * Off)
        .withColumn("l_suppkey", col("l_suppkey") + i * Off)
    }
    replicate("events") { (df, i) =>
      df.withColumn("event_id", col("event_id") + i * Off)
        .withColumn("user_id", col("user_id") + i * Off)
    }
    Seq("region", "nation", "customer", "supplier", "part", "orders")
      .foreach { t =>
        read(t).write.mode("overwrite").parquet(s"$outDir/$t.parquet")
      }
    spark.stop()
  }
}
