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

  test("decode fallback is deterministic and partition-local") {
    val d1 = Multimodal.decode(spark, media()).collect().sortBy(_.media_id)
    val d2 = Multimodal.decode(spark, media().repartition(3)).collect().sortBy(_.media_id)
    assert(d1.toSeq == d2.toSeq, "decode must not depend on partitioning")
    assert(d1.forall(r => r.width >= 16 && r.height >= 16))
    assert(d1.head.channels == 3) // media_id 0 cycles to image
    assert(d1(1).channels == 2)   // media_id 1 cycles to audio
  }

  // minimal REAL container headers, built to the public format specs
  private def pngBytes(w: Int, h: Int, colorType: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(33)
    bb.put(Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte))
    bb.putInt(13).put("IHDR".getBytes("US-ASCII"))
    bb.putInt(w).putInt(h)
    bb.put(8.toByte).put(colorType.toByte) // bit depth, color type
    bb.put(0.toByte).put(0.toByte).put(0.toByte)
    bb.array()
  }
  private def jpegBytes(w: Int, h: Int, ncomp: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(2 + 18 + 10)
    bb.put(0xFF.toByte).put(0xD8.toByte)                  // SOI
    bb.put(0xFF.toByte).put(0xE0.toByte).putShort(16)     // APP0, len 16
    bb.put("JFIF".getBytes("US-ASCII")).put(new Array[Byte](10))
    bb.put(0xFF.toByte).put(0xC0.toByte).putShort(8)      // SOF0 header
    bb.put(8.toByte).putShort(h.toShort).putShort(w.toShort).put(ncomp.toByte)
    bb.array()
  }
  private def gifBytes(w: Int, h: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(13).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("GIF89a".getBytes("US-ASCII"))
    bb.putShort(w.toShort).putShort(h.toShort)
    bb.put(0.toByte).put(0.toByte).put(0.toByte)
    bb.array()
  }

  test("decode parses real PNG/JPEG/GIF headers for dimensions and channels") {
    // direct unit checks of the parser, incl. PNG channel mapping
    assert(Multimodal.parseImageHeader(pngBytes(640, 480, 2)) == Some((640, 480, 3)))
    assert(Multimodal.parseImageHeader(pngBytes(31, 17, 6)) == Some((31, 17, 4)))
    assert(Multimodal.parseImageHeader(pngBytes(8, 8, 0)) == Some((8, 8, 1)))
    assert(Multimodal.parseImageHeader(jpegBytes(1920, 1080, 3)) == Some((1920, 1080, 3)))
    assert(Multimodal.parseImageHeader(gifBytes(320, 200)) == Some((320, 200, 3)))
    assert(Multimodal.parseImageHeader("plain text payload".getBytes("UTF-8")).isEmpty)
    // ... and through the distributed decode stage
    val mediaDf = Seq(
      (1L, "image", pngBytes(640, 480, 6)),
      (2L, "image", jpegBytes(800, 600, 1)),
      (3L, "image", gifBytes(99, 44)))
      .toDF("media_id", "media_type", "bytes")
    val decoded = Multimodal.decode(spark, mediaDf).collect().sortBy(_.media_id)
    assert(decoded.map(d => (d.width, d.height, d.channels)).toSeq ==
      Seq((640, 480, 4), (800, 600, 1), (99, 44, 3)))
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

  test("parseWavHeader walks real RIFF subchunks, any order, word-aligned") {
    def le16(v: Int) = Array[Byte]((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
    def le32(v: Long) = Array[Byte]((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
    def chunk(id: String, payload: Array[Byte]): Array[Byte] =
      id.getBytes("US-ASCII") ++ le32(payload.length.toLong) ++ payload ++
        (if (payload.length % 2 == 1) Array[Byte](0) else Array.empty[Byte])
    val fmt = le16(1) ++ le16(2) ++ le32(44100L) ++ le32(44100L * 2 * 2) ++
      le16(4) ++ le16(16)
    // a LIST chunk BEFORE fmt exercises the walk (odd payload → pad byte)
    val body = chunk("LIST", Array[Byte](1, 2, 3)) ++ chunk("fmt ", fmt) ++
      chunk("data", Array.fill[Byte](10)(7))
    val wav = "RIFF".getBytes("US-ASCII") ++ le32(4L + body.length) ++
      "WAVE".getBytes("US-ASCII") ++ body
    assert(Multimodal.parseWavHeader(wav).contains((2, 44100, 16, 10L)))
    // header-only (data chunk declared but truncated): size still read
    val headerOnly = "RIFF".getBytes("US-ASCII") ++ le32(100L) ++
      "WAVE".getBytes("US-ASCII") ++ chunk("fmt ", fmt) ++
      "data".getBytes("US-ASCII") ++ le32(99999L)
    assert(Multimodal.parseWavHeader(headerOnly).contains((2, 44100, 16, 99999L)))
    assert(Multimodal.parseWavHeader("RIFX1234WAVE".getBytes).isEmpty)
    assert(Multimodal.parseWavHeader(Array[Byte](1, 2, 3)).isEmpty)
    // a fmt chunk declaring < 16 payload bytes is corrupt — the walk
    // must NOT read the next subchunk's bytes as channels/rate/bits
    val shortFmt = "RIFF".getBytes("US-ASCII") ++ le32(100L) ++
      "WAVE".getBytes("US-ASCII") ++ chunk("fmt ", fmt.take(8)) ++
      chunk("data", Array.fill[Byte](10)(7))
    assert(Multimodal.parseWavHeader(shortFmt).isEmpty,
      "short fmt subchunk must land in the unknown bucket")
  }

  test("parseMp4Header walks real BMFF boxes; skips unknown boxes; rejects v1") {
    def be32(v: Long) = Array[Byte](((v >> 24) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
    def box(typ: String, payload: Array[Byte]): Array[Byte] =
      be32(8L + payload.length) ++ typ.getBytes("US-ASCII") ++ payload
    def mvhd(ver: Int, ts: Long, dur: Long): Array[Byte] =
      box("mvhd", Array[Byte](ver.toByte, 0, 0, 0) ++ be32(0) ++ be32(0) ++
        be32(ts) ++ be32(dur))
    val mp4 = box("ftyp", "mp42".getBytes ++ be32(0) ++ "isom".getBytes) ++
      box("free", Array.fill[Byte](5)(0)) ++ // unknown box skipped
      box("moov", box("iods", Array[Byte](9)) ++ mvhd(0, 90000L, 4500000L))
    assert(Multimodal.parseMp4Header(mp4).contains(("mp42", 90000L, 4500000L)))
    // version-1 mvhd (64-bit times) is documented out of scope
    val v1 = box("ftyp", "isom".getBytes ++ be32(0)) ++
      box("moov", mvhd(1, 90000L, 1L))
    assert(Multimodal.parseMp4Header(v1).isEmpty)
    // a zero-size box must terminate, not loop
    assert(Multimodal.parseMp4Header(be32(0L) ++ "ftyp".getBytes).isEmpty)
    assert(Multimodal.parseMp4Header("notabmff".getBytes).isEmpty)
  }

  test("decodeAv routes wav/mp4/unknown per row in one partition-local pass") {
    val wavHex = "52494646" + "24000000" + "57415645" +
      "666d7420" + "10000000" + "0100" + "0100" + "401f0000" +
      "803e0000" + "0200" + "1000" + "64617461" + "00000000"
    val media = Seq(
      (1L, wavHex),
      (2L, "0000001466747970" + "69736f6d" + "00000000" + "6d703432" +
        "000000246d6f6f76" + "0000001c6d766864" + "00000000" +
        "00000000" + "00000000" + "00000258" + "00010000"),
      (3L, "deadbeef"))
      .toDF("media_id", "hx")
      .select(col("media_id"), unhex(col("hx")).as("bytes"))
    val got = Multimodal.decodeAv(spark, media).collect()
      .map(m => m.media_id -> m).toMap
    assert(got(1L).container == "wav" &&
      got(1L).sample_rate.contains(8000) && got(1L).channels.contains(1))
    assert(got(2L).container == "mp4" && got(2L).brand.contains("isom") &&
      got(2L).timescale.contains(600L) && got(2L).duration.contains(65536L))
    assert(got(3L).container == "unknown" && got(3L).channels.isEmpty)
  }

  test("pcmStats: sample decode exact; truncated/odd/8-bit/non-wav payloads handled") {
    import graft.ops.Multimodal
    def hx(parts: String*): Array[Byte] =
      parts.mkString.replaceAll("\\s", "").grouped(2)
        .map(Integer.parseInt(_, 16).toByte).toArray
    def le16(v: Int): String = {
      val u = v & 0xFFFF
      f"${u & 0xFF}%02x${(u >> 8) & 0xFF}%02x"
    }
    def wav(bits: Int, declaredLen: Int, samples: Seq[Int]): Array[Byte] =
      hx("52494646", "24000000", "57415645",
        "666d7420", "10000000", "0100", "0100", "401f0000", "803e0000",
        "0200", le16(bits).take(4),
        "64617461",
        f"${declaredLen & 0xFF}%02x${(declaredLen >> 8) & 0xFF}%02x0000",
        samples.map(le16).mkString)
    // exact stats: 0 (silent), 1000, -32768 (clip), 32767 (clip), 300 (silent)
    val s1 = Seq(0, 1000, -32768, 32767, 300)
    val got = Multimodal.pcmStatsOf(1L, wav(16, 10, s1), 327).get
    assert(got.n_samples == 5 && got.peak == 32768)
    assert(got.sum_sq == s1.map(v => v.toLong * v).sum)
    assert(got.rms == math.sqrt(got.sum_sq.toDouble / 5))
    assert(got.clip_frac == 2.0 / 5 && got.silence_frac == 2.0 / 5)
    // truncated: declared 100 bytes, only 3 samples present → stats
    // over what's there
    val t = Multimodal.pcmStatsOf(2L, wav(16, 100, Seq(5, -5, 7)), 327).get
    assert(t.n_samples == 3 && t.peak == 7)
    // odd byte count available: trailing byte dropped
    val oddBytes = wav(16, 5, Seq(1, 2, 3)).dropRight(1)
    val o = Multimodal.pcmStatsOf(3L, oddBytes, 327).get
    assert(o.n_samples == 2)
    // header-only (declared data, zero payload) → zero samples, zero stats
    val h = Multimodal.pcmStatsOf(4L, wav(16, 8, Seq.empty), 327).get
    assert(h.n_samples == 0 && h.rms == 0.0 && h.clip_frac == 0.0)
    // 8-bit PCM and non-WAV payloads are quarantined, not mis-parsed
    assert(Multimodal.pcmStatsOf(5L, wav(8, 4, Seq(1, 2)), 327).isEmpty)
    assert(Multimodal.pcmStatsOf(6L, "not a wav at all".getBytes, 327).isEmpty)
  }

  test("byteGramSignature: Knuth bin arithmetic matches reference; dup=1.0, distinct near-orthogonal") {
    // reference implementation of the bin recipe, plain JVM integers
    def binOf(v: Long, bins: Int): Long = {
      val h = ((v & 0xFFFFL) * 2654435761L + (v >> 16) * 2041643008L) %
        4294967296L
      (h * bins) >> 32
    }
    // differential: the column arithmetic equals the JVM arithmetic on
    // adversarial 32-bit corners (0, 1, 2^16±1, 2^31, 2^32−1, …)
    val corners = Seq(0L, 1L, 255L, 65535L, 65536L, 65537L,
      0x7FFFFFFFL, 0x80000000L, 0xDEADBEEFL, 0xFFFFFFFFL)
    val payloads = corners.zipWithIndex.map { case (v, i) =>
      val b = java.nio.ByteBuffer.allocate(4).putInt(v.toInt).array()
      (i.toLong, "raw", b)
    }.toDF("media_id", "media_type", "bytes")
    val got = Multimodal.byteGramSignature(payloads, bins = 64)
      .select(col("media_id"), col("signature"))
      .as[(Long, Array[Float])].collect().toMap
    corners.zipWithIndex.foreach { case (v, i) =>
      val sig = got(i.toLong)
      val want = binOf(v, 64).toInt
      assert(sig(want) == 1.0f && sig.sum == 1.0f,
        s"corner $v: expected single count in bin $want")
    }
    // quality on real text payloads: identical payloads → cosine 1
    // exactly; distinct payloads → median pairwise cosine stays low
    // (the property the md5 recipe had and the nibble histogram
    // famously lacked — 0.998 median, SCALING.md round-11)
    val docs = Tables.table(spark, sf, "documents").limit(40)
    val m = Multimodal.mediaFromDocuments(docs, "doc_id", "text")
    val sig = Multimodal.byteGramSignature(m)
      .as[(Long, Array[Float])].collect()
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i); i += 1 }
      d / math.sqrt(na) / math.sqrt(nb)
    }
    val pair = for (x <- sig; y <- sig if x._1 < y._1) yield cos(x._2, y._2)
    val med = pair.sorted.apply(pair.length / 2)
    assert(med < 0.75, f"distinct payloads must stay discriminable: median pairwise cosine $med%.3f")
    val self = sig.head
    assert(math.abs(cos(self._2, self._2) - 1.0) < 1e-12)
  }

  // ── MP4 sample tables (round-13): box builders to the public spec ──
  private def beI(v: Int): Array[Byte] =
    java.nio.ByteBuffer.allocate(4).putInt(v).array
  private def beL(v: Long): Array[Byte] =
    java.nio.ByteBuffer.allocate(8).putLong(v).array
  private def bx(typ: String, body: Array[Byte]*): Array[Byte] = {
    val b = body.flatten.toArray
    beI(b.length + 8) ++ typ.getBytes("US-ASCII") ++ b
  }
  private def stblBytes(stts: Seq[(Int, Int)],
                        stsz: Either[(Int, Int), Seq[Int]],
                        stsc: Seq[(Int, Int)], stco: Seq[Long],
                        co64: Boolean, stss: Option[Seq[Int]],
                        ctts: Seq[(Int, Int)] = Nil,
                        cttsV1: Boolean = false): Array[Byte] = {
    val sttsB = bx("stts", beI(0), beI(stts.size),
      stts.flatMap { case (c, d) => beI(c) ++ beI(d) }.toArray)
    val stszB = stsz match {
      case Left((fixed, n)) => bx("stsz", beI(0), beI(fixed), beI(n))
      case Right(sizes) => bx("stsz", beI(0), beI(0), beI(sizes.size),
        sizes.flatMap(beI).toArray)
    }
    val stscB = bx("stsc", beI(0), beI(stsc.size),
      stsc.flatMap { case (f, s) => beI(f) ++ beI(s) ++ beI(1) }.toArray)
    val coB =
      if (co64) bx("co64", beI(0), beI(stco.size), stco.flatMap(beL).toArray)
      else bx("stco", beI(0), beI(stco.size),
        stco.flatMap(o => beI(o.toInt)).toArray)
    val stssB = stss.map(ns => bx("stss", beI(0), beI(ns.size),
      ns.flatMap(beI).toArray)).getOrElse(Array.empty[Byte])
    val cttsB =
      if (ctts.isEmpty) Array.empty[Byte]
      else bx("ctts", Array[Byte](if (cttsV1) 1 else 0, 0, 0, 0),
        beI(ctts.size),
        ctts.flatMap { case (c, o) => beI(c) ++ beI(o) }.toArray)
    bx("stbl", sttsB, stszB, stscB, coB, stssB, cttsB)
  }
  private def trakBytes(trackId: Int, v1: Boolean, handler: String,
                        timescale: Int, stbl: Array[Byte]): Array[Byte] = {
    val tkhd =
      if (v1) bx("tkhd", Array[Byte](1, 0, 0, 7), new Array[Byte](16),
        beI(trackId))
      else bx("tkhd", Array[Byte](0, 0, 0, 7), new Array[Byte](8),
        beI(trackId))
    val mdhd =
      if (v1) bx("mdhd", Array[Byte](1, 0, 0, 0), new Array[Byte](16),
        beI(timescale), beL(0))
      else bx("mdhd", Array[Byte](0, 0, 0, 0), new Array[Byte](8),
        beI(timescale), beI(0))
    val hdlr = bx("hdlr", beI(0), beI(0),
      handler.getBytes("US-ASCII"), new Array[Byte](12), Array[Byte](0))
    bx("trak", tkhd, bx("mdia", mdhd, hdlr, bx("minf", stbl)))
  }
  private val ftypB = bx("ftyp", "isom".getBytes, beI(0), "isom".getBytes)

  test("mp4SampleTable: two tracks, every field hand-computed (dts runs, both stsz forms, chunk walk, co64, stss)") {
    // track 7 (vide, v0): 5 samples, stts runs (2×10, 3×20), sizes
    // table, 2 samples/chunk over stco [1000, 2000, 3000], sync {1,4}
    val t1 = trakBytes(7, v1 = false, "vide", 600, stblBytes(
      Seq((2, 10), (3, 20)), Right(Seq(100, 200, 50, 25, 75)),
      Seq((1, 2)), Seq(1000L, 2000L, 3000L), co64 = false,
      Some(Seq(1, 4))))
    // track 9 (soun, v1 boxes): 3 fixed-128 samples, one chunk whose
    // stsc capacity (10) exceeds n, co64 offset past 2^32, no stss
    val big = (1L << 32) + 5L
    val t2 = trakBytes(9, v1 = true, "soun", 44100, stblBytes(
      Seq((3, 5)), Left((128, 3)), Seq((1, 10)), Seq(big), co64 = true,
      None))
    val mp4 = ftypB ++ bx("moov", t1, t2)
    val got = Multimodal.parseMp4Samples(42L, mp4)
    val v = got.filter(_.track_id == 7L)
    assert(v.map(_.dts) == Seq(0L, 10L, 20L, 40L, 60L))
    assert(v.map(_.size) == Seq(100L, 200L, 50L, 25L, 75L))
    assert(v.map(_.chunk_n) == Seq(1, 1, 2, 2, 3))
    assert(v.map(_.offset) == Seq(1000L, 1100L, 2000L, 2050L, 3000L))
    assert(v.map(_.keyframe) == Seq(true, false, false, true, false))
    assert(v.forall(s => s.handler == "vide" && s.timescale == 600L))
    val a = got.filter(_.track_id == 9L)
    assert(a.map(_.dts) == Seq(0L, 5L, 10L))
    assert(a.map(_.size) == Seq(128L, 128L, 128L))
    assert(a.map(_.offset) == Seq(big, big + 128, big + 256))
    assert(a.forall(_.keyframe), "absent stss must mean all keyframes")
    assert(a.forall(s => s.handler == "soun" && s.timescale == 44100L))
    assert(got.map(_.sample_n).toSet == Set(1, 2, 3, 4, 5))
  }

  test("mp4SampleTable: multi-entry stsc runs switch samples-per-chunk mid-walk") {
    // chunks 1-2 carry 3 samples, chunks 3+ carry 1 → 8 samples land
    // as [3, 3, 1, 1]
    val t = trakBytes(1, v1 = false, "vide", 90000, stblBytes(
      Seq((8, 10)), Left((10, 8)), Seq((1, 3), (3, 1)),
      Seq(100L, 200L, 300L, 400L), co64 = false, None))
    val got = Multimodal.parseMp4Samples(1L, ftypB ++ bx("moov", t))
    assert(got.map(_.chunk_n) == Seq(1, 1, 1, 2, 2, 2, 3, 4))
    assert(got.map(_.offset) ==
      Seq(100L, 110L, 120L, 200L, 210L, 220L, 300L, 400L))
  }

  test("mp4SampleTable: size==1 largesize box headers are followed") {
    val t = trakBytes(3, v1 = true, "vide", 1000, stblBytes(
      Seq((2, 7)), Right(Seq(11, 13)), Seq((1, 2)), Seq(500L),
      co64 = false, None))
    val moovBody = t
    // moov with a 64-bit largesize header: size field = 1, then the
    // true size (16 + body) as BE64
    val moov = beI(1) ++ "moov".getBytes("US-ASCII") ++
      beL(16L + moovBody.length) ++ moovBody
    val got = Multimodal.parseMp4Samples(3L, ftypB ++ moov)
    assert(got.map(_.dts) == Seq(0L, 7L))
    assert(got.map(_.size) == Seq(11L, 13L))
  }

  test("mp4SampleTable: truncated tables quarantine the trak; sibling traks survive") {
    // stsz declares 1000 sizes but carries 2 — the whole trak drops
    val bad = trakBytes(1, v1 = false, "vide", 600,
      bx("stbl",
        bx("stts", beI(0), beI(1), beI(2), beI(5)),
        bx("stsz", beI(0), beI(0), beI(1000), beI(7), beI(8)),
        bx("stsc", beI(0), beI(1), beI(1), beI(2), beI(1)),
        bx("stco", beI(0), beI(1), beI(64))))
    val good = trakBytes(2, v1 = false, "soun", 8000, stblBytes(
      Seq((1, 3)), Right(Seq(9)), Seq((1, 1)), Seq(77L), co64 = false,
      None))
    val got = Multimodal.parseMp4Samples(5L, ftypB ++ bx("moov", bad, good))
    assert(got.map(_.track_id).distinct == Seq(2L),
      "truncated trak must drop; sibling must survive")
    assert(got.map(_.offset) == Seq(77L))
    // inconsistent stts total (2 ≠ stsz count 1) also quarantines
    val bad2 = trakBytes(1, v1 = false, "vide", 600, stblBytes(
      Seq((2, 5)), Right(Seq(9)), Seq((1, 1)), Seq(77L), co64 = false,
      None))
    assert(Multimodal.parseMp4Samples(6L, ftypB ++ bx("moov", bad2)).isEmpty)
  }

  test("mp4SampleTable: ctts composition offsets — v0 runs, v1 signed (B-frame) offsets, absent ctts means pts=dts") {
    // v0, runs: samples 1-2 get +30, sample 3 gets +0
    val t1 = trakBytes(1, v1 = false, "vide", 600, stblBytes(
      Seq((3, 10)), Left((8, 3)), Seq((1, 3)), Seq(100L), co64 = false,
      None, ctts = Seq((2, 30), (1, 0))))
    val g1 = Multimodal.parseMp4Samples(1L, ftypB ++ bx("moov", t1))
    assert(g1.map(_.dts) == Seq(0L, 10L, 20L))
    assert(g1.map(_.pts) == Seq(30L, 40L, 20L))
    // v1: signed negative offset must sign-extend, not wrap
    val t2 = trakBytes(2, v1 = true, "vide", 600, stblBytes(
      Seq((2, 10)), Left((8, 2)), Seq((1, 2)), Seq(100L), co64 = false,
      None, ctts = Seq((1, 5), (1, -5)), cttsV1 = true))
    val g2 = Multimodal.parseMp4Samples(2L, ftypB ++ bx("moov", t2))
    assert(g2.map(_.pts) == Seq(5L, 5L), s"v1 signed: ${g2.map(_.pts)}")
    // absent ctts → pts = dts
    val t3 = trakBytes(3, v1 = false, "soun", 600, stblBytes(
      Seq((2, 7)), Left((8, 2)), Seq((1, 2)), Seq(100L), co64 = false,
      None))
    val g3 = Multimodal.parseMp4Samples(3L, ftypB ++ bx("moov", t3))
    assert(g3.map(s => s.pts == s.dts) == Seq(true, true))
    // ctts total (1) inconsistent with sample count (2) → quarantined
    val bad = trakBytes(4, v1 = false, "vide", 600, stblBytes(
      Seq((2, 7)), Left((8, 2)), Seq((1, 2)), Seq(100L), co64 = false,
      None, ctts = Seq((1, 5))))
    assert(Multimodal.parseMp4Samples(4L, ftypB ++ bx("moov", bad)).isEmpty)
  }

  test("mp4SampleTable: hostile declared counts quarantine — 2^31+ (negative after cast), fixed-form 2^30, box-overrunning tables") {
    // (a) stts declares 0x80000000 entries — the raw u32 casts to a
    // NEGATIVE Int; must drop the trak, never throw
    // NegativeArraySizeException from the task
    val negCount = trakBytes(1, v1 = false, "vide", 600,
      bx("stbl",
        bx("stts", beI(0), beI(0x80000000.toInt), beI(1), beI(5)),
        bx("stsz", beI(0), beI(0), beI(1), beI(7)),
        bx("stsc", beI(0), beI(1), beI(1), beI(1), beI(1)),
        bx("stco", beI(0), beI(1), beI(64))))
    assert(Multimodal.parseMp4Samples(1L, ftypB ++ bx("moov", negCount)).isEmpty)
    // (b) fixed-size stsz declaring 2^30 samples (no table bytes to
    // bounds-check) must quarantine BEFORE any allocation — the
    // OOM/DoS vector of a corrupt header; 2^31 (negative) likewise
    for (n <- Seq(1 << 30, 0x80000001.toInt)) {
      val hugeFixed = trakBytes(2, v1 = false, "soun", 600,
        bx("stbl",
          bx("stts", beI(0), beI(1), beI(1), beI(5)),
          bx("stsz", beI(0), beI(128), beI(n)),
          bx("stsc", beI(0), beI(1), beI(1), beI(1), beI(1)),
          bx("stco", beI(0), beI(1), beI(64))))
      assert(Multimodal.parseMp4Samples(2L, ftypB ++ bx("moov", hugeFixed)).isEmpty,
        s"fixed-size count $n must quarantine, not allocate")
    }
    // (c) a table that overruns its BOX while staying inside the file
    // (it would silently read the sibling stco's bytes) is a mis-parse
    // and must quarantine: stss declares 4 syncs but its box carries 1
    val boxOverrun = trakBytes(3, v1 = false, "vide", 600,
      bx("stbl",
        bx("stts", beI(0), beI(1), beI(2), beI(5)),
        bx("stsz", beI(0), beI(0), beI(2), beI(7), beI(8)),
        bx("stsc", beI(0), beI(1), beI(1), beI(2), beI(1)),
        bx("stss", beI(0), beI(4), beI(1)),
        bx("stco", beI(0), beI(1), beI(64))))
    assert(Multimodal.parseMp4Samples(3L, ftypB ++ bx("moov", boxOverrun)).isEmpty,
      "stss overrunning its box into the sibling stco must quarantine")
    // same payload with an honest stss count parses fine (the control)
    val ok = trakBytes(3, v1 = false, "vide", 600,
      bx("stbl",
        bx("stts", beI(0), beI(1), beI(2), beI(5)),
        bx("stsz", beI(0), beI(0), beI(2), beI(7), beI(8)),
        bx("stsc", beI(0), beI(1), beI(1), beI(2), beI(1)),
        bx("stss", beI(0), beI(1), beI(1)),
        bx("stco", beI(0), beI(1), beI(64))))
    assert(Multimodal.parseMp4Samples(3L, ftypB ++ bx("moov", ok)).size == 2)
  }

  // ── EXIF/TIFF walk: byte fixtures built with explicit order ──
  private def tiff(le: Boolean, entries: Seq[Array[Byte]],
                   tail: Array[Byte] = Array.empty,
                   ifdCountOverride: Int = -1): Array[Byte] = {
    val ord = if (le) java.nio.ByteOrder.LITTLE_ENDIAN
      else java.nio.ByteOrder.BIG_ENDIAN
    val body = entries.flatten.toArray
    val bb = java.nio.ByteBuffer.allocate(8 + 2 + body.length + 4 + tail.length)
      .order(ord)
    bb.put((if (le) "II" else "MM").getBytes("US-ASCII"))
    bb.putShort(42.toShort)
    bb.putInt(8)
    bb.putShort((if (ifdCountOverride >= 0) ifdCountOverride
      else entries.size).toShort)
    bb.put(body)
    bb.putInt(0)
    bb.put(tail)
    bb.array
  }
  private def tiffEntry(le: Boolean, tag: Int, typ: Int, cnt: Int,
                        v: Long, short: Boolean = false): Array[Byte] = {
    val ord = if (le) java.nio.ByteOrder.LITTLE_ENDIAN
      else java.nio.ByteOrder.BIG_ENDIAN
    val bb = java.nio.ByteBuffer.allocate(12).order(ord)
    bb.putShort(tag.toShort); bb.putShort(typ.toShort); bb.putInt(cnt)
    if (short) { bb.putShort(v.toShort); bb.putShort(0) } else bb.putInt(v.toInt)
    bb.array
  }

  test("parseExif: both byte orders, SHORT/LONG values, DateTime via offset, GPS pointer, spec-default orientation") {
    for (le <- Seq(true, false)) {
      // 5 entries → DateTime lands at 8 + 2 + 5*12 + 4 = 74
      val dt = "2024:03:05 10:11:12".getBytes("US-ASCII") :+ 0.toByte
      val bytes = tiff(le, Seq(
        tiffEntry(le, 0x0100, 3, 1, 640L, short = true), // width SHORT
        tiffEntry(le, 0x0101, 4, 1, 480L),               // height LONG
        tiffEntry(le, 0x0112, 3, 1, 6L, short = true),
        tiffEntry(le, 0x0132, 2, 20, 74L),
        tiffEntry(le, 0x8825, 4, 1, 94L)),               // GPS IFD after dt
        tail = dt ++ Array[Byte](0, 0))
      val got = Multimodal.parseExif(1L, bytes)
      assert(got.contains(Multimodal.ExifMeta(1L, if (le) "II" else "MM",
        640L, 480L, 6L, "2024:03:05 10:11:12", has_gps = true)),
        s"le=$le: $got")
    }
    // no orientation/DateTime/GPS tags: orientation defaults to 1,
    // datetime null, has_gps false; unknown tags skip
    val minimal = tiff(le = true, Seq(
      tiffEntry(le = true, 0x0100, 4, 1, 33L),
      tiffEntry(le = true, 0x0101, 4, 1, 44L),
      tiffEntry(le = true, 0x9999, 4, 1, 0L)))
    val m = Multimodal.parseExif(2L, minimal)
    assert(m.contains(Multimodal.ExifMeta(2L, "II", 33L, 44L, 1L, null,
      has_gps = false)))
  }

  test("parseExif: quarantine — bad magic, truncated IFD, out-of-bounds DateTime/GPS offsets, missing dimensions") {
    def ok(le: Boolean) = Seq(
      tiffEntry(le, 0x0100, 4, 1, 10L), tiffEntry(le, 0x0101, 4, 1, 20L))
    // control parses
    assert(Multimodal.parseExif(1L, tiff(le = true, ok(true))).isDefined)
    // wrong magic / non-TIFF / null / short
    assert(Multimodal.parseExif(1L, "PKxxxx".getBytes).isEmpty)
    assert(Multimodal.parseExif(1L, null).isEmpty)
    assert(Multimodal.parseExif(1L, Array[Byte]('I', 'I', 42, 0)).isEmpty)
    // declared entry count overruns the file → truncated IFD drop
    assert(Multimodal.parseExif(1L,
      tiff(le = true, ok(true), ifdCountOverride = 1000)).isEmpty)
    // DateTime offset beyond the payload
    assert(Multimodal.parseExif(1L, tiff(le = false,
      ok(false) :+ tiffEntry(le = false, 0x0132, 2, 20, 5000L))).isEmpty)
    // GPS pointer out of bounds is a mis-parse, not a flag
    assert(Multimodal.parseExif(1L, tiff(le = true,
      ok(true) :+ tiffEntry(le = true, 0x8825, 4, 1, 4000L))).isEmpty)
    // missing mandatory dimensions
    assert(Multimodal.parseExif(1L, tiff(le = true,
      Seq(tiffEntry(le = true, 0x0112, 3, 1, 1L, short = true)))).isEmpty)
  }

  test("mp4SampleTable: non-BMFF / null / headerless payloads emit nothing") {
    assert(Multimodal.parseMp4Samples(1L, "RIFFxxxxWAVE".getBytes).isEmpty)
    assert(Multimodal.parseMp4Samples(1L, null).isEmpty)
    assert(Multimodal.parseMp4Samples(1L, Array[Byte](0, 0, 0, 3)).isEmpty)
    // moov without ftyp is not a recognized file
    val t = trakBytes(1, v1 = false, "vide", 600, stblBytes(
      Seq((1, 3)), Right(Seq(9)), Seq((1, 1)), Seq(77L), co64 = false, None))
    assert(Multimodal.parseMp4Samples(1L, bx("moov", t)).isEmpty)
  }

  test("mp4SampleTable dataset is partition-independent; pcmStats drops null payloads") {
    val t = trakBytes(4, v1 = false, "vide", 600, stblBytes(
      Seq((3, 10)), Right(Seq(5, 6, 7)), Seq((1, 2)), Seq(10L, 20L),
      co64 = false, Some(Seq(1))))
    val mp4 = ftypB ++ bx("moov", t)
    val df = Seq((1L, mp4), (2L, mp4), (3L, null)).toDF("media_id", "bytes")
    val a = Multimodal.mp4SampleTable(spark, df).collect()
      .sortBy(s => (s.media_id, s.sample_n))
    val b = Multimodal.mp4SampleTable(spark, df.repartition(3)).collect()
      .sortBy(s => (s.media_id, s.sample_n))
    assert(a.toSeq == b.toSeq)
    assert(a.count(_.media_id == 1L) == 3 && a.count(_.media_id == 3L) == 0)
    // ADVICE r12: a null bytes payload must drop, not NPE
    val pcm = Multimodal.pcmStats(spark,
      Seq((1L, null: Array[Byte])).toDF("media_id", "bytes")).collect()
    assert(pcm.isEmpty)
  }
}
