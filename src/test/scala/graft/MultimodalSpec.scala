package graft

import org.apache.spark.sql.functions._

import graft.ops.{Multimodal, Tables}

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media() =
    Multimodal.mediaFromDocuments(
      Seq((0L, "alpha beta gamma delta"), (1L, "epsilon zeta"), (2L, "eta theta iota"))
        .toDF("doc_id", "text"), "doc_id", "text")

  test("media table carries binary payloads with cycled types") {
    val m = media().as[(Long, String, Array[Byte])].collect().sortBy(_._1)
    assert(m.map(_._2).toSeq == Seq("image", "audio", "video"))
    assert(new String(m(0)._3, "UTF-8") == "alpha beta gamma delta")
  }

  test("extractMeta computes size/magic/hash in pure columns") {
    val meta = Multimodal.extractMeta(media())
      .where(col("media_id") === 0)
      .select("n_bytes", "magic_hex").as[(Int, String)].head()
    assert(meta._1 == 22)
    assert(meta._2 == "616C7068") // 'alph'
  }

  test("decode stub is deterministic and partition-local") {
    val d1 = Multimodal.decodeStub(spark, media()).collect().sortBy(_.media_id)
    val d2 = Multimodal.decodeStub(spark, media().repartition(3)).collect().sortBy(_.media_id)
    assert(d1.toSeq == d2.toSeq, "decode must not depend on partitioning")
    assert(d1.forall(r => r.width >= 16 && r.height >= 16))
    assert(d1.head.channels == 3) // media_id 0 cycles to image
    assert(d1(1).channels == 2)   // media_id 1 cycles to audio
  }

  test("byte-histogram features count high nibbles and sum to payload size") {
    val rows = Multimodal.byteFeatures(media())
      .select("media_id", "n_bytes", "features")
      .as[(Long, Int, Seq[Int])].collect()
    for ((id, n, bins) <- rows) {
      assert(bins.length == 16 && bins.sum == n, s"media $id: $bins vs $n bytes")
    }
    // manual check on a known payload
    val payload = "alpha beta gamma delta".getBytes("UTF-8")
    val expected = payload.groupBy(b => (b >> 4) & 0xF).view.mapValues(_.length).toMap
    val got = rows.find(_._1 == 0L).get._3
    (0 until 16).foreach(i => assert(got(i) == expected.getOrElse(i, 0), s"bin $i"))
  }

  test("resize stub keeps every k-th byte deterministically") {
    val out = Multimodal.resizeStub(spark, media().where(col("media_id") === 0), 3)
      .collect().head
    val original = "alpha beta gamma delta".getBytes("UTF-8")
    assert(out.bytes.toSeq == original.indices.collect {
      case i if i % 3 == 0 => original(i)
    }.toSeq)
  }

  test("frame sampling slices payload bytes into n frames") {
    val frames = Multimodal.frameSample(media().where(col("media_id") === 0), 4)
      .select("frame_id", "frame_bytes").as[(Int, Array[Byte])].collect().sortBy(_._1)
    assert(frames.length == 4)
    val joined = frames.map(f => new String(f._2, "UTF-8")).mkString
    assert("alpha beta gamma delta".startsWith(joined.take(20)))
    assert(frames.forall(_._2.length == 5)) // 22 bytes / 4 → frames of 5
  }
}
