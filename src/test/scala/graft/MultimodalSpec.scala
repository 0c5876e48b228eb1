package graft

import graft.pipeline.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  lazy val media = Multimodal.fromDocuments(
    Seq((1L, "hello world this is a payload"), (2L, "x")).toDF("doc_id", "text"))

  test("fromDocuments: binary payload + typed metadata struct") {
    val r = media.collect().map(x => (x.getAs[Long]("media_id"), x.getAs[Array[Byte]]("media"))).toMap
    assert(new String(r(1L), "UTF-8") === "hello world this is a payload")
    val meta = media.select(col("meta.media_type"), col("meta.width")).collect().head
    assert(meta.getString(0) === "image" && meta.getInt(1) === 64)
  }

  test("feature extraction: deterministic normalized histogram via mapPartitions") {
    val f1 = Multimodal.extractFeatures(media).collect()
      .map(r => r.getAs[Long]("media_id") -> r.getAs[Seq[Double]]("features")).toMap
    val f2 = Multimodal.extractFeatures(media).collect()
      .map(r => r.getAs[Long]("media_id") -> r.getAs[Seq[Double]]("features")).toMap
    assert(f1 === f2)
    assert(f1(1L).length === 16)
    assert(math.abs(f1(1L).sum - 1.0) < 1e-9) // histogram normalized
  }

  test("frame sampling: n frames covering the payload") {
    val frames = Multimodal.sampleFrames(media.filter(col("media_id") === 1L), n = 4).collect()
    assert(frames.length === 4)
    assert(frames.map(_.getAs[Int]("frame_no")).sorted === Array(0, 1, 2, 3))
    assert(frames.map(_.getAs[Long]("frame_bytes")).sum === 29L) // total payload length
  }

  test("resize: payload shrunk, metadata updated") {
    val r = Multimodal.resize(media, 2, 3).collect()
      .map(x => x.getAs[Long]("media_id") ->
        ((x.getAs[Array[Byte]]("media").length,
          x.getStruct(x.fieldIndex("meta")).getAs[Int]("width")))).toMap
    assert(r(1L) === ((6, 2)))  // 2*3 bytes
    assert(r(2L) === ((1, 2)))  // payload shorter than target
  }
}
