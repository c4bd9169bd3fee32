package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ext.Multimodal
import graft.ext.Multimodal._

/** Multimodal plumbing: the fake codec is deterministic, so the full
  * binary-column contract (schema, batch transforms, flatMap shape) is
  * exactly testable even though real decoders are stubbed.
  */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private lazy val assets = Multimodal.syntheticAssets(spark, 30, bodyLen = 1024)

  test("decode parses typed metadata out of the binary header") {
    val d = Multimodal.decode(assets).collect().map(x => x.asset_id -> x).toMap
    assert(d.size === 30)
    assert(d(0L).kind === "image" && d(0L).width === 64 && d(0L).nFrames === 1)
    assert(d(1L).kind === "audio" && d(1L).sampleRate === 16000)
    assert(d(2L).kind === "video" && d(2L).nFrames === 6)
    assert(d.values.forall(_.payloadBytes === 1024 + FakeCodec.HeaderLen))
  }

  test("decode rejects a non-GRFT payload loudly") {
    val bad = Seq(Asset(99L, "image", Array.fill[Byte](64)(0))).toDS()
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.decode(bad).collect()
    }
    assert(e.getMessage.contains("bad magic") ||
      Option(e.getCause).exists(_.getMessage.contains("bad magic")))
  }

  test("feature extraction: fixed dim, L1-normalized, deterministic") {
    val f1 = Multimodal.extractFeatures(assets).collect().map(x => x.asset_id -> x.features).toMap
    val f2 = Multimodal.extractFeatures(assets).collect().map(x => x.asset_id -> x.features).toMap
    assert(f1.values.forall(_.length === 64))
    f1.foreach { case (id, v) =>
      assert(math.abs(v.sum - 1f) < 1e-3, s"asset $id not normalized: ${v.sum}")
      assert(v.toSeq === f2(id).toSeq, s"asset $id features not deterministic")
    }
  }

  test("resize rewrites header dims and scales the body") {
    val small = Multimodal.resize(assets.filter(_.kind == "image"), 32, 32)
    val d = Multimodal.decode(small).collect()
    assert(d.nonEmpty)
    assert(d.forall(x => x.width === 32 && x.height === 32))
    assert(d.forall(_.payloadBytes < 1024 + FakeCodec.HeaderLen),
      "downscale must shrink the payload")
  }

  test("frame sampling emits every strideth frame per video asset") {
    val frames = Multimodal.sampleFrames(assets.filter(_.kind == "video"), stride = 2)
      .collect().groupBy(_.asset_id)
    val metas = Multimodal.decode(assets.filter(_.kind == "video")).collect()
      .map(x => x.asset_id -> x.nFrames).toMap
    assert(frames.keySet === metas.keySet)
    frames.foreach { case (id, fs) =>
      assert(fs.length === (metas(id) + 1) / 2, s"asset $id frame count")
      assert(fs.map(_.frame_idx).sorted.toSeq === (0 until metas(id) by 2).toSeq)
      assert(fs.forall(_.frame.nonEmpty))
    }
  }

  test("asset stats groups on decoded metadata only") {
    val stats = Multimodal.assetStats(Multimodal.decode(assets))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(stats === Map("image" -> 10L, "audio" -> 10L, "video" -> 10L))
  }
}
