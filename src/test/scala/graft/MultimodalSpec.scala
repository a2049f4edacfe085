package graft

import graft.multimodal.Multimodal
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val payloads = Multimodal.attachPayload(
    Seq((1L, "hello world of binary payloads"),
      (2L, "another opaque media blob")).toDF("id", "txt"),
    "id", "txt")

  test("decodeFeatures: deterministic fake decode, correct shape") {
    val f = Multimodal.decodeFeatures(payloads).collect()
      .sortBy(_.doc_id)
    assert(f.length == 2)
    assert(f(0).byte_len == 30)
    assert(f(0).histogram.length == 16)
    assert(math.abs(f(0).histogram.sum - 1f) < 1e-5) // normalized
    // deterministic: same input -> same features
    val again = Multimodal.decodeFeatures(payloads).collect()
      .sortBy(_.doc_id)
    assert(f(0).histogram.toSeq == again(0).histogram.toSeq)
  }

  test("sampleFrames: stride-2 sampling of 8-byte frames") {
    val frames = Multimodal.sampleFrames(payloads, frameBytes = 8, stride = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1),
        r.getAs[Array[Byte]](2)))
    // doc 1: 30 bytes -> 3 full frames -> idx 0, 2 kept
    val d1 = frames.filter(_._1 == 1L).map(_._2).sorted
    assert(d1.toSeq == Seq(0, 2))
    val first = frames.find(f => f._1 == 1L && f._2 == 0).get._3
    assert(new String(first, "UTF-8") == "hello wo")
  }
}
