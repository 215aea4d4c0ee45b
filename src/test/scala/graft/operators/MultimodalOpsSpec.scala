package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalOpsSpec extends SparkSpec {

  private def mediaDf = {
    import spark.implicits._
    val payload1 = Array.tabulate(64)(i => i.toByte)         // ramp
    val payload2 = Array.fill(64)(255.toByte)                // constant white
    MultimodalOps.asMedia(
      Seq((1L, payload1), (2L, payload2)).toDF("id", "bytes"),
      "id", "bytes", "image/gray8", 8, 8)
  }

  test("asMedia builds the typed media schema") {
    val df = mediaDf
    assert(df.schema("payload").dataType.typeName == "binary")
    assert(df.select("meta.mediaType").collect().head.getString(0) == "image/gray8")
    assert(df.select("meta.width").collect().head.getInt(0) == 8)
  }

  test("extractImageFeatures: deterministic stub decode features") {
    val feats = MultimodalOps.extractImageFeatures(mediaDf)
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), r.getSeq[Long](2))).toMap
    // payload2 = all 255 -> intensity 1.0, all pixels in top bin
    assert(math.abs(feats(2L)._1 - 1.0) < 1e-9)
    assert(feats(2L)._2.last == 64L)
    // payload1 ramp 0..63 -> mean = (0+..+63)/64/255
    val expected = (0 until 64).map(_ / 255.0).sum / 64
    assert(math.abs(feats(1L)._1 - expected) < 1e-6) // stub decodes to Float
    assert(feats(1L)._2.sum == 64L)
  }

  test("resize keeps schema and scales dimensions") {
    val out = MultimodalOps.resize(mediaDf, 4, 4)
    val r = out.filter(col("media_id") === 2L).collect().head
    assert(r.getStruct(2).getInt(1) == 4)
    val bytes = r.getAs[Array[Byte]](1)
    assert(bytes.length == 16)
    assert(bytes.forall(b => (b & 0xff) == 255))
  }

  test("sampleFrames chunks payloads deterministically") {
    val frames = MultimodalOps.sampleFrames(mediaDf, 4)
      .filter(col("media_id") === 1L)
      .orderBy("frame_idx")
      .collect().map(_.getAs[Array[Byte]]("frame"))
    assert(frames.length == 4)
    assert(frames.map(_.length).sum == 64)
    assert(frames(0).head == 0.toByte && frames(3).last == 63.toByte)
  }
}
