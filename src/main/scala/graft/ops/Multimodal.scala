package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (north-star extension): image/audio/video
  * treated as opaque `binary` columns + typed metadata, with
  * decode/feature/resize/frame-sample stages.
  *
  * The Spark-side plumbing — schema, batch shape, partition-local
  * processing via typed mapPartitions, frame explosion — is real and
  * tested, and so is the header-level decode: [[decode]] parses PNG /
  * JPEG / GIF container headers (pure JVM, no codec dependency) for
  * real width/height/channels. Full pixel decode and [[resizeStub]]
  * remain honest stand-ins (pixel codecs are not in this container);
  * payloads that are no recognized container get deterministic
  * pseudo-dims so synthetic fixtures stay runnable end-to-end.
  */
object Multimodal {

  case class MediaRecord(media_id: Long, media_type: String, bytes: Array[Byte])
  case class DecodedMedia(media_id: Long, media_type: String,
                          width: Int, height: Int, channels: Int,
                          n_bytes: Int, content_sha: String)

  /** Build a media table from any (id, text) source: payload = UTF-8
    * bytes, type cycled deterministically. Stand-in for reading real blob
    * columns / object-store pointers. */
  def mediaFromDocuments(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col(idCol) % 3).cast("int") + 1).as("media_type"),
      col(textCol).cast("binary").as("bytes"))

  /** Pure-column metadata extraction (no decode): size, magic bytes,
    * content hash. Runs fully inside whole-stage codegen. */
  def extractMeta(media: DataFrame): DataFrame =
    media.select(col("media_id"), col("media_type"),
      length(col("bytes")).as("n_bytes"),
      upper(hex(substring(col("bytes"), 1, 4))).as("magic_hex"),
      sha2(col("bytes"), 256).as("content_sha"))

  private def u8(b: Byte): Int = b & 0xFF
  private def be16(bytes: Array[Byte], i: Int): Int =
    (u8(bytes(i)) << 8) | u8(bytes(i + 1))
  private def be32(bytes: Array[Byte], i: Int): Int =
    (u8(bytes(i)) << 24) | (u8(bytes(i + 1)) << 16) |
      (u8(bytes(i + 2)) << 8) | u8(bytes(i + 3))
  private def le16(bytes: Array[Byte], i: Int): Int =
    u8(bytes(i)) | (u8(bytes(i + 1)) << 8)

  /** (width, height, channels) from a PNG / JPEG / GIF container header
    * — a real header parse in pure JVM (the format specs are all
    * public: PNG IHDR is the first chunk after the 8-byte signature;
    * JPEG dimensions ride the first SOFn marker segment; GIF's logical
    * screen descriptor directly follows the 6-byte version tag).
    * Returns None when the payload is none of the three. */
  private[graft] def parseImageHeader(bytes: Array[Byte]): Option[(Int, Int, Int)] = {
    // PNG: \x89PNG\r\n\x1a\n + IHDR(len,type,w,h,bitdepth,colortype,...)
    if (bytes.length >= 26 &&
        u8(bytes(0)) == 0x89 && bytes(1) == 'P' && bytes(2) == 'N' && bytes(3) == 'G' &&
        u8(bytes(4)) == 0x0D && u8(bytes(5)) == 0x0A && u8(bytes(6)) == 0x1A && u8(bytes(7)) == 0x0A &&
        bytes(12) == 'I' && bytes(13) == 'H' && bytes(14) == 'D' && bytes(15) == 'R') {
      val channels = u8(bytes(25)) match { // color type
        case 0 => 1 // grayscale
        case 2 => 3 // truecolor
        case 3 => 1 // palette index
        case 4 => 2 // gray + alpha
        case 6 => 4 // truecolor + alpha
        case _ => return None
      }
      Some((be32(bytes, 16), be32(bytes, 20), channels))
    }
    // JPEG: FFD8, then marker segments; dims are in the first SOFn
    // (C0-CF except C4=DHT, C8=JPG-extension, CC=DAC)
    else if (bytes.length >= 4 && u8(bytes(0)) == 0xFF && u8(bytes(1)) == 0xD8) {
      var i = 2
      while (i + 9 < bytes.length && u8(bytes(i)) == 0xFF) {
        val marker = u8(bytes(i + 1))
        if (marker == 0xFF) { i += 1 } // fill byte
        else if (marker >= 0xC0 && marker <= 0xCF &&
                 marker != 0xC4 && marker != 0xC8 && marker != 0xCC) {
          // SOFn: len(2) precision(1) height(2) width(2) ncomponents(1)
          return Some((be16(bytes, i + 7), be16(bytes, i + 5), u8(bytes(i + 9))))
        } else if (marker == 0xD8 || (marker >= 0xD0 && marker <= 0xD9)) {
          i += 2 // standalone marker, no length
        } else {
          i += 2 + be16(bytes, i + 2) // skip the segment by its length
        }
      }
      None
    }
    // GIF: "GIF87a"/"GIF89a" + logical screen w,h (little-endian)
    else if (bytes.length >= 10 &&
             bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == '8' &&
             (bytes(4) == '7' || bytes(4) == '9') && bytes(5) == 'a') {
      Some((le16(bytes, 6), le16(bytes, 8), 3))
    } else None
  }

  private def le32L(bytes: Array[Byte], i: Int): Long =
    u8(bytes(i)).toLong | (u8(bytes(i + 1)).toLong << 8) |
      (u8(bytes(i + 2)).toLong << 16) | (u8(bytes(i + 3)).toLong << 24)
  private def be32L(bytes: Array[Byte], i: Int): Long =
    (u8(bytes(i)).toLong << 24) | (u8(bytes(i + 1)).toLong << 16) |
      (u8(bytes(i + 2)).toLong << 8) | u8(bytes(i + 3)).toLong

  /** (channels, sample_rate, bits_per_sample, data_bytes) from a RIFF/
    * WAVE container header — a real subchunk walk (public spec: RIFF
    * size + WAVE tag, then word-aligned `fmt `/`data` subchunks; the
    * PCM `fmt ` payload carries channels LE16 @+2, rate LE32 @+4, bits
    * LE16 @+14). The declared `data` size is reported even when the
    * payload is truncated after the header (header-only metadata, the
    * same posture as [[parseImageHeader]]). None when not a WAV. */
  private[graft] def parseWavHeader(bytes: Array[Byte]): Option[(Int, Int, Int, Long)] = {
    if (bytes.length >= 12 &&
        bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F' &&
        bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E') {
      var i = 12
      var fmt: Option[(Int, Int, Int)] = None
      var dataLen = -1L
      var corrupt = false
      while (!corrupt && i + 8 <= bytes.length &&
          (fmt.isEmpty || dataLen < 0)) {
        val id = new String(bytes, i, 4, "US-ASCII")
        val size = le32L(bytes, i + 4)
        // a PCM fmt payload is ≥ 16 bytes; a malformed header declaring
        // a shorter fmt chunk would read bytes belonging to the NEXT
        // subchunk as channels/rate/bits — corrupt, not garbage fields
        if (id == "fmt " && size < 16L) corrupt = true
        else if (id == "fmt " && i + 24 <= bytes.length)
          fmt = Some((le16(bytes, i + 10), le32L(bytes, i + 12).toInt,
            le16(bytes, i + 22)))
        else if (id == "data") dataLen = size
        // a declared size near 2^32 would truncate negative through
        // .toInt and stall or rewind the walk — corrupt payloads must
        // land in "unknown", never hang a task (contract above). The
        // word-aligned advance is computed in Long and bounds-checked.
        val step = 8L + size + (size & 1L)
        if (size < 0L || step <= 0L || i.toLong + step > Int.MaxValue)
          corrupt = true
        else i = (i.toLong + step).toInt
      }
      if (corrupt) None
      else fmt.flatMap { case (ch, rate, bits) =>
        if (dataLen >= 0) Some((ch, rate, bits, dataLen)) else None
      }
    } else None
  }

  /** (major_brand, timescale, duration) from an ISO BMFF (MP4)
    * container — a real box walk (public spec: length-prefixed
    * big-endian boxes; `ftyp` carries the brand, `moov`/`mvhd` v0
    * carries timescale BE32 @+12 and duration BE32 @+16 after the
    * version/flags word). mvhd version 1 (64-bit times) returns None —
    * out of scope for the header gate, documented. None when not BMFF. */
  private[graft] def parseMp4Header(bytes: Array[Byte]): Option[(String, Long, Long)] = {
    var i = 0
    var brand: String = null
    var ts = -1L
    var dur = -1L
    while (i + 8 <= bytes.length && (brand == null || ts < 0)) {
      val size = be32L(bytes, i)
      // sizes advance the walk in Long with bounds checks — a size in
      // [2^31, 2^32) would truncate negative through .toInt and rewind
      // into an ArrayIndexOutOfBounds; corrupt payloads must land in
      // "unknown", never kill the job (contract above)
      if (size < 8L || i.toLong + size > Int.MaxValue) return None
      val typ = new String(bytes, i + 4, 4, "US-ASCII")
      if (typ == "ftyp" && i + 12 <= bytes.length)
        brand = new String(bytes, i + 8, 4, "US-ASCII")
      else if (typ == "moov") {
        var j = i + 8
        val end = math.min(i + size, bytes.length.toLong).toInt
        while (j + 8 <= end && ts < 0) {
          val csize = be32L(bytes, j)
          if (csize < 8L || j.toLong + csize > Int.MaxValue) return None
          val ctyp = new String(bytes, j + 4, 4, "US-ASCII")
          if (ctyp == "mvhd" && j + 28 <= bytes.length) {
            if (u8(bytes(j + 8)) != 0) return None // v1: 64-bit times
            ts = be32L(bytes, j + 20)
            dur = be32L(bytes, j + 24)
          }
          j = (j.toLong + csize).toInt
        }
      }
      i = (i.toLong + size).toInt
    }
    if (brand != null && ts > 0) Some((brand, ts, dur)) else None
  }

  case class AvMeta(media_id: Long, container: String,
                    channels: Option[Int], sample_rate: Option[Int],
                    bits: Option[Int], n_data: Option[Long],
                    brand: Option[String], timescale: Option[Long],
                    duration: Option[Long])

  /** Audio/video container metadata: the [[decode]] shape for WAV and
    * MP4 payloads — partition-local typed map running the real header
    * parses; unrecognized payloads report container "unknown" with all
    * fields null (a production pipeline quarantines them). */
  def decodeAv(spark: SparkSession, media: DataFrame): Dataset[AvMeta] = {
    import spark.implicits._
    media.select(col("media_id"), col("bytes")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          parseWavHeader(bytes) match {
            case Some((ch, rate, bits, dataLen)) =>
              AvMeta(id, "wav", Some(ch), Some(rate), Some(bits),
                Some(dataLen), None, None, None)
            case None => parseMp4Header(bytes) match {
              case Some((brand, ts, dur)) =>
                AvMeta(id, "mp4", None, None, None, None,
                  Some(brand), Some(ts), Some(dur))
              case None =>
                AvMeta(id, "unknown", None, None, None, None, None, None, None)
            }
          }
        }
      }
  }

  case class PcmStats(media_id: Long, n_samples: Long, peak: Int,
                      sum_sq: Long, rms: Double,
                      clip_frac: Double, silence_frac: Double)

  /** Sample-level PCM statistics over a WAV payload's `data` subchunk
    * — what [[parseWavHeader]]'s header walk started, finished at the
    * sample level (round-11 verdict #6): peak amplitude, RMS,
    * clipping fraction, silence ratio, the standard audio-quality
    * gates of a training pipeline (drop silent/clipped clips, bucket
    * by loudness). 16-bit PCM only (the dominant WAV encoding; other
    * bit depths emit no row, same quarantine posture as [[decodeAv]]).
    *
    * Contracts:
    *  - the walk is [[parseWavHeader]]'s (word-aligned subchunks,
    *    corrupt-size guards); payloads that are not a 16-bit WAV with
    *    a located `data` subchunk are dropped, never mis-parsed;
    *  - TRUNCATED payloads (declared data size > bytes present) are
    *    measured over the bytes actually present, an odd trailing
    *    byte dropped — header-only fixtures yield n_samples = 0;
    *  - arithmetic is engine-portable: peak/sum_sq/counts are exact
    *    integers (LE16 sign decode, |−32768| = 32768); rms is ONE
    *    long→double cast (IEEE round-to-nearest, same as an oracle's
    *    BIGINT→DOUBLE), one division, one correctly-rounded sqrt;
    *    the fractions are single divisions — so the whole row
    *    replays bit-exactly from the sample-generation arithmetic.
    *
    * Row-local (partition-local typed map, zero shuffle); `silence`
    * = |sample| <= silenceThreshold (default ~1% of full scale). */
  def pcmStats(spark: SparkSession, media: DataFrame,
               silenceThreshold: Int = 327): Dataset[PcmStats] = {
    import spark.implicits._
    media.select(col("media_id"), col("bytes")).as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        pcmStatsOf(id, bytes, silenceThreshold)
      })
  }

  private[graft] def pcmStatsOf(id: Long, bytes: Array[Byte],
                                silenceThreshold: Int): Option[PcmStats] = {
    if (bytes == null) return None
    if (!(bytes.length >= 12 &&
        bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F' &&
        bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E'))
      return None
    var i = 12
    var bits = -1
    var dataOff = -1
    var dataLen = -1L
    var corrupt = false
    while (!corrupt && i + 8 <= bytes.length && (bits < 0 || dataOff < 0)) {
      val chunkId = new String(bytes, i, 4, "US-ASCII")
      val size = le32L(bytes, i + 4)
      if (chunkId == "fmt " && size < 16L) corrupt = true
      else if (chunkId == "fmt " && i + 24 <= bytes.length)
        bits = le16(bytes, i + 22)
      else if (chunkId == "data") { dataOff = i + 8; dataLen = size }
      val step = 8L + size + (size & 1L)
      if (size < 0L || step <= 0L || i.toLong + step > Int.MaxValue)
        corrupt = true
      else i = (i.toLong + step).toInt
    }
    if (corrupt || bits != 16 || dataOff < 0 || dataLen < 0) return None
    val avail = math.max(0L, math.min(dataLen, (bytes.length - dataOff).toLong))
    val n = (avail / 2L).toInt // odd trailing byte dropped
    var peak = 0
    var sumSq = 0L
    var clip = 0L
    var silent = 0L
    var j = 0
    while (j < n) {
      val s = (bytes(dataOff + 2 * j + 1) << 8) |
        (bytes(dataOff + 2 * j) & 0xFF) // sign rides the high byte
      val a = if (s < 0) -s else s
      if (a > peak) peak = a
      sumSq += s.toLong * s
      if (s == 32767 || s == -32768) clip += 1
      if (a <= silenceThreshold) silent += 1
      j += 1
    }
    val rms = if (n == 0) 0.0 else math.sqrt(sumSq.toDouble / n)
    Some(PcmStats(id, n.toLong, peak, sumSq, rms,
      if (n == 0) 0.0 else clip.toDouble / n,
      if (n == 0) 0.0 else silent.toDouble / n))
  }

  private def be64L(bytes: Array[Byte], i: Int): Long =
    (be32L(bytes, i) << 32) | be32L(bytes, i + 4)

  case class Mp4Sample(media_id: Long, track_id: Long, handler: String,
                       timescale: Long, sample_n: Int, dts: Long,
                       pts: Long, size: Long, chunk_n: Int, offset: Long,
                       keyframe: Boolean)

  /** Per-sample table walk of an ISO BMFF (MP4) container — what
    * [[parseMp4Header]]'s box gate started, finished at the sample
    * level the way [[pcmStats]] finished WAV (round-12 verdict #3):
    * for every `trak` under `moov`, decode the `stbl` sample tables
    * (pure box arithmetic from the public spec, no codec) into one
    * row per sample carrying its decoding timestamp, byte size, chunk
    * assignment, absolute file offset, and keyframe flag — the index
    * a video pipeline needs to frame-sample ("every k-th keyframe"),
    * clip by time range, or locate payload bytes, all WITHOUT
    * touching `mdat`.
    *
    * Tables decoded (ISO/IEC 14496-12):
    *  - `stts` decoding deltas, run-length (sample_count, delta)
    *    entries → dts = prefix sum;
    *  - `stsz` sizes — both the fixed-size form (sample_size > 0) and
    *    the per-sample table;
    *  - `stsc` sample→chunk runs (first_chunk, samples_per_chunk):
    *    each chunk's capacity comes from the latest run at or before
    *    it; samples assign sequentially;
    *  - `stco`/`co64` 32/64-bit chunk offsets; a sample's offset =
    *    its chunk's offset + sizes of the chunk's earlier samples
    *    (declared offsets, [[parseWavHeader]]'s header-only posture —
    *    `mdat` is never read);
    *  - `stss` sync samples; an ABSENT stss means every sample is a
    *    keyframe (the spec's default, the q-missing-stss edge);
    *  - `tkhd`(v0/v1) track id, `mdhd`(v0/v1 — 64-bit times) track
    *    timescale, `hdlr` handler fourcc; `size==1` largesize box
    *    headers are followed.
    *
    * Quarantine contract (the [[decodeAv]]/[[pcmStats]] convention):
    * a payload that is not BMFF, a trak whose declared table entry
    * counts overrun the bytes present (truncated tables), or
    * inconsistent stts/stsz/stsc totals emit NO rows for that trak —
    * dropped, never mis-parsed. Row-local flatMap, zero shuffle. */
  def mp4SampleTable(spark: SparkSession, media: DataFrame): Dataset[Mp4Sample] = {
    import spark.implicits._
    media.select(col("media_id"), col("bytes")).as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        parseMp4Samples(id, bytes)
      })
  }

  /** One box header at `i` within [start, end): (type, payloadStart,
    * boxEnd) — handles size==1 (64-bit largesize) and size==0 (to the
    * end of the enclosing container). None = corrupt/overrun. */
  private def boxAt(bytes: Array[Byte], i: Int, end: Int): Option[(String, Int, Int)] = {
    if (i + 8 > end) return None
    val size0 = be32L(bytes, i)
    val typ = new String(bytes, i + 4, 4, "US-ASCII")
    if (size0 == 1L) {
      if (i + 16 > end) return None
      val size = be64L(bytes, i + 8)
      if (size < 16L || i.toLong + size > end) None
      else Some((typ, i + 16, (i.toLong + size).toInt))
    } else if (size0 == 0L) Some((typ, i + 8, end))
    else if (size0 < 8L || i.toLong + size0 > end) None
    else Some((typ, i + 8, (i.toLong + size0).toInt))
  }

  /** Children of a container box [from, end): (type, payloadStart,
    * boxEnd) triples in order; None if any header is corrupt. */
  private def boxChildren(bytes: Array[Byte], from: Int, end: Int): Option[List[(String, Int, Int)]] = {
    val out = List.newBuilder[(String, Int, Int)]
    var i = from
    while (i < end) {
      boxAt(bytes, i, end) match {
        case Some(t @ (_, _, boxEnd)) =>
          if (boxEnd <= i) return None // zero-progress guard
          out += t; i = boxEnd
        case None => return None
      }
    }
    Some(out.result())
  }

  private[graft] def parseMp4Samples(id: Long, bytes: Array[Byte]): Seq[Mp4Sample] = {
    if (bytes == null || bytes.length < 8) return Nil
    val top = boxChildren(bytes, 0, bytes.length).getOrElse(return Nil)
    if (!top.exists(_._1 == "ftyp")) return Nil
    val out = Seq.newBuilder[Mp4Sample]
    for ((typ, p, e) <- top if typ == "moov";
         tracks <- boxChildren(bytes, p, e).toSeq;
         (ttyp, tp, te) <- tracks if ttyp == "trak")
      out ++= parseTrak(id, bytes, tp, te).getOrElse(Nil)
    out.result()
  }

  /** One trak's samples; None = this trak is corrupt (dropped). */
  private def parseTrak(id: Long, bytes: Array[Byte], from: Int,
                        end: Int): Option[Seq[Mp4Sample]] = {
    val kids = boxChildren(bytes, from, end).getOrElse(return None)
    var trackId = -1L
    var timescale = -1L
    var handler = "????"
    var stts: Array[Long] = null // flattened (count, delta) pairs
    var stszFixed = -1L
    var stszCount = -1 // fixed-size form's declared count (raw u32→Int)
    var stszSizes: Array[Long] = null
    var stsc: Array[Long] = null // flattened (firstChunk, spc) pairs
    var chunkOff: Array[Long] = null
    var stss: Array[Long] = null // sync sample numbers, 1-based
    var ctts: Array[Long] = null // flattened (count, offset) pairs
    def u32s(at: Int, n: Int, stride: Int, fields: Int,
             se: Int): Option[Array[Long]] = {
      // n groups of `fields` BE32s read at `at` with `stride` bytes
      // per group — bounds-checked ONCE against the declared count.
      // n is a raw unvalidated u32 cast to Int: a declared count
      // >= 2^31 arrives NEGATIVE and must quarantine (not throw
      // NegativeArraySizeException), and the table must fit the
      // ENCLOSING BOX `se` (not merely the file) — a table overrunning
      // its box into sibling bytes is a mis-parse, not a decode.
      if (n < 0 || at.toLong + n.toLong * stride > se) return None
      val a = new Array[Long](n * fields)
      var g = 0
      while (g < n) {
        var f = 0
        while (f < fields) {
          a(g * fields + f) = be32L(bytes, at + g * stride + f * 4); f += 1
        }
        g += 1
      }
      Some(a)
    }
    for ((k, p, e) <- kids) k match {
      case "tkhd" =>
        if (p + 4 > e) return None
        val v = u8(bytes(p))
        val at = if (v == 1) p + 20 else p + 12 // v1: 64-bit times
        if (at + 4 > e) return None
        trackId = be32L(bytes, at)
      case "mdia" =>
        val mk = boxChildren(bytes, p, e).getOrElse(return None)
        for ((mt, mp, me) <- mk) mt match {
          case "mdhd" =>
            if (mp + 4 > me) return None
            val v = u8(bytes(mp))
            val at = if (v == 1) mp + 20 else mp + 12
            if (at + 4 > me) return None
            timescale = be32L(bytes, at)
          case "hdlr" =>
            if (mp + 12 > me) return None
            handler = new String(bytes, mp + 8, 4, "US-ASCII")
          case "minf" =>
            val nk = boxChildren(bytes, mp, me).getOrElse(return None)
            for ((nt, np, ne) <- nk if nt == "stbl") {
              val sk = boxChildren(bytes, np, ne).getOrElse(return None)
              for ((st, sp, se) <- sk) st match {
                case "stts" =>
                  if (sp + 8 > se) return None
                  val n = be32L(bytes, sp + 4).toInt
                  stts = u32s(sp + 8, n, 8, 2, se).getOrElse(return None)
                case "stsz" =>
                  if (sp + 12 > se) return None
                  stszFixed = be32L(bytes, sp + 4)
                  val n = be32L(bytes, sp + 8).toInt
                  if (stszFixed == 0L)
                    stszSizes = u32s(sp + 12, n, 4, 1, se).getOrElse(return None)
                  else stszCount = n // materialized AFTER the stts check
                case "stsc" =>
                  if (sp + 8 > se) return None
                  val n = be32L(bytes, sp + 4).toInt
                  stsc = u32s(sp + 8, n, 12, 2, se).getOrElse(return None)
                case "stco" =>
                  if (sp + 8 > se) return None
                  val n = be32L(bytes, sp + 4).toInt
                  chunkOff = u32s(sp + 8, n, 4, 1, se).getOrElse(return None)
                case "co64" =>
                  if (sp + 8 > se) return None
                  val n = be32L(bytes, sp + 4).toInt
                  if (n < 0 || sp.toLong + 8 + n.toLong * 8 > se) return None
                  chunkOff = Array.tabulate(n)(c => be64L(bytes, sp + 8 + c * 8))
                case "stss" =>
                  if (sp + 8 > se) return None
                  val n = be32L(bytes, sp + 4).toInt
                  stss = u32s(sp + 8, n, 4, 1, se).getOrElse(return None)
                case "ctts" =>
                  // composition offsets: pts = dts + offset. v0
                  // offsets are unsigned; v1 (the B-frame form) are
                  // SIGNED 32-bit — sign-extend them
                  if (sp + 8 > se) return None
                  val v = u8(bytes(sp))
                  val n = be32L(bytes, sp + 4).toInt
                  val raw = u32s(sp + 8, n, 8, 2, se).getOrElse(return None)
                  if (v == 1) {
                    var g = 1
                    while (g < raw.length) { raw(g) = raw(g).toInt.toLong; g += 2 }
                  }
                  ctts = raw
                case _ => ()
              }
            }
          case _ => ()
        }
      case _ => ()
    }
    if (trackId < 0 || timescale < 0 || stts == null ||
        (stszSizes == null && stszCount < 0) ||
        stsc == null || chunkOff == null) return None
    // Fixed-size stsz has no table to bounds-check, so its sizes array
    // materializes only AFTER the stts cross-check passes: a corrupt
    // header declaring 2^30 (or a negative-after-cast 2^31+) count
    // quarantines instead of attempting the allocation (an OOM/DoS
    // vector on arbitrary media bytes).
    val sttsTotal = stts.indices.by(2).map(stts(_)).sum
    if (stszSizes == null) {
      if (stszCount < 0 || stszCount.toLong != sttsTotal ||
          stszCount > bytes.length) return None
      stszSizes = Array.fill(stszCount)(stszFixed)
    }
    val n = stszSizes.length
    if (sttsTotal != n.toLong) return None
    if (ctts != null &&
        ctts.indices.by(2).map(ctts(_)).sum != n.toLong) return None
    val sync = if (stss == null) null else stss.toSet
    val samples = Vector.newBuilder[Mp4Sample]
    // walk chunks in order, pulling each chunk's samples-per-chunk
    // from the last stsc run at or before it
    var s = 0        // 0-based sample index
    var run = 0      // index into stsc pairs
    var dts = 0L
    var sttsRun = 0  // index into stts pairs
    var sttsLeft = if (stts.length >= 2) stts(0) else 0L
    var cttsRun = 0  // index into ctts pairs (when present)
    var cttsLeft = if (ctts != null && ctts.length >= 2) ctts(0) else 0L
    var c = 0        // 0-based chunk index
    while (s < n && c < chunkOff.length) {
      while (run + 2 < stsc.length && stsc(run + 2) <= c + 1) run += 2
      val spc = stsc(run + 1)
      var inChunk = 0L
      var intra = 0L
      while (s < n && inChunk < spc) {
        while (sttsLeft == 0L && sttsRun + 2 < stts.length) {
          sttsRun += 2; sttsLeft = stts(sttsRun)
        }
        if (sttsLeft == 0L) return None // stts exhausted early
        var ctOff = 0L
        if (ctts != null) {
          while (cttsLeft == 0L && cttsRun + 2 < ctts.length) {
            cttsRun += 2; cttsLeft = ctts(cttsRun)
          }
          if (cttsLeft == 0L) return None // ctts exhausted early
          ctOff = ctts(cttsRun + 1)
          cttsLeft -= 1
        }
        val kf = if (sync == null) true else sync.contains((s + 1).toLong)
        samples += Mp4Sample(id, trackId, handler, timescale, s + 1, dts,
          dts + ctOff, stszSizes(s), c + 1, chunkOff(c) + intra, kf)
        dts += stts(sttsRun + 1)
        sttsLeft -= 1
        intra += stszSizes(s)
        s += 1; inChunk += 1
      }
      c += 1
    }
    if (s < n) return None // chunks ran out before all samples placed
    Some(samples.result())
  }

  /** Little/big-endian hex builders for CONSTRUCTING container headers
    * as columns (`unhex` of the concatenation) — the deterministic
    * payload factory the q197 gate uses: both engines know the field
    * values arithmetically; only Spark runs the byte-level parse, and
    * the oracle's arithmetic ground truth checks it recovered every
    * field. */
  def le16Hex(v: Column): Column =
    concat(lpad(hex(v.bitwiseAND(lit(255))), 2, "0"),
      lpad(hex(shiftright(v, 8).bitwiseAND(lit(255))), 2, "0"))

  def le32Hex(v: Column): Column =
    concat(lpad(hex(v.bitwiseAND(lit(255))), 2, "0"),
      lpad(hex(shiftright(v, 8).bitwiseAND(lit(255))), 2, "0"),
      lpad(hex(shiftright(v, 16).bitwiseAND(lit(255))), 2, "0"),
      lpad(hex(shiftright(v, 24).bitwiseAND(lit(255))), 2, "0"))

  def be32Hex(v: Column): Column = lpad(hex(v), 8, "0")

  def be64Hex(v: Column): Column = lpad(hex(v), 16, "0")

  def be16Hex(v: Column): Column = lpad(hex(v), 4, "0")

  // ───────────────────────── EXIF / TIFF tag walk ─────────────────────────

  case class ExifMeta(media_id: Long, byte_order: String, width: Long,
                      height: Long, orientation: Long, datetime: String,
                      has_gps: Boolean)

  /** Baseline TIFF IFD0 walk (TIFF 6.0 / EXIF public spec, both byte
    * orders): header (`II`/`MM` + magic 42 + IFD offset), then one
    * pass over IFD0's 12-byte entries. Fields read — the ones a
    * crawled-image pipeline filters on:
    *
    *  - ImageWidth 0x0100 / ImageLength 0x0101 (SHORT or LONG;
    *    mandatory — a fileless dimension is a corrupt image record);
    *  - Orientation 0x0112 (SHORT; absent = 1, the spec default);
    *  - DateTime 0x0132 (ASCII count 20 via offset; 19 chars + NUL);
    *  - GPS IFD pointer 0x8825 — PRESENCE is the PII flag the scrub
    *    family cannot see from text (the pointer must land in-file).
    *
    * Per spec, a ≤4-byte value is LEFT-JUSTIFIED in the entry's value
    * field: a SHORT reads as u16 at the field start in the FILE's
    * byte order.
    *
    * Quarantine contract (the [[parseMp4Samples]] convention): wrong
    * magic, an IFD whose declared entry count overruns the file, an
    * out-of-bounds DateTime/GPS offset, an unexpected type/count on a
    * known tag, or missing dimensions emit NO row — dropped, never
    * mis-parsed. Row-local flatMap, zero shuffle. */
  private[graft] def parseExif(id: Long, bytes: Array[Byte]): Option[ExifMeta] = {
    if (bytes == null || bytes.length < 8) return None
    val le = bytes(0) == 'I'.toByte && bytes(1) == 'I'.toByte
    val be = bytes(0) == 'M'.toByte && bytes(1) == 'M'.toByte
    if (!le && !be) return None
    def u16(i: Int): Int =
      if (i < 0 || i + 2 > bytes.length) -1
      else if (le) u8(bytes(i)) | (u8(bytes(i + 1)) << 8)
      else (u8(bytes(i)) << 8) | u8(bytes(i + 1))
    def u32(i: Int): Long =
      if (i < 0 || i + 4 > bytes.length) -1L
      else if (le) u8(bytes(i)).toLong | (u8(bytes(i + 1)).toLong << 8) |
        (u8(bytes(i + 2)).toLong << 16) | (u8(bytes(i + 3)).toLong << 24)
      else (u8(bytes(i)).toLong << 24) | (u8(bytes(i + 1)).toLong << 16) |
        (u8(bytes(i + 2)).toLong << 8) | u8(bytes(i + 3)).toLong
    if (u16(2) != 42) return None
    val ifd = u32(4)
    if (ifd < 8L || ifd > Int.MaxValue.toLong) return None
    val p0 = ifd.toInt
    val n = u16(p0)
    if (n <= 0) return None
    if (p0.toLong + 2L + n.toLong * 12L + 4L > bytes.length) return None
    var width = -1L
    var height = -1L
    var orientation = 1L
    var datetime: String = null
    var hasGps = false
    var i = 0
    while (i < n) {
      val ep = p0 + 2 + i * 12
      val tag = u16(ep)
      val typ = u16(ep + 2)
      val cnt = u32(ep + 4)
      tag match {
        case 0x0100 | 0x0101 | 0x0112 =>
          if (cnt != 1L) return None
          val v = typ match {
            case 3 => u16(ep + 8).toLong
            case 4 => u32(ep + 8)
            case _ => return None
          }
          if (v < 0L) return None
          if (tag == 0x0100) width = v
          else if (tag == 0x0101) height = v
          else orientation = v
        case 0x0132 =>
          if (typ != 2 || cnt != 20L) return None
          val off = u32(ep + 8)
          if (off < 0L || off + 20L > bytes.length) return None
          datetime = new String(bytes, off.toInt, 19, "US-ASCII")
        case 0x8825 =>
          if (typ != 4 || cnt != 1L) return None
          val off = u32(ep + 8)
          if (off < 0L || off + 2L > bytes.length) return None
          hasGps = true
        case _ => () // unknown tags skip — the walk is forward-compatible
      }
      i += 1
    }
    if (width < 0L || height < 0L) return None
    Some(ExifMeta(id, if (le) "II" else "MM", width, height, orientation,
      datetime, hasGps))
  }

  /** Row-local EXIF/TIFF walk over (media_id, bytes) — one row per
    * parseable image, corrupt payloads quarantined. */
  def exifTags(spark: SparkSession, media: DataFrame): Dataset[ExifMeta] = {
    import spark.implicits._
    media.select(col("media_id"), col("bytes")).as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, b) => parseExif(id, b) })
  }

  /** Decode stage: partition-local typed map — the shape a real decoder
    * runs in (one codec context per partition, streamed batches, no
    * driver involvement).
    *
    * Dimensions/channels come from a REAL container-header parse
    * ([[parseImageHeader]]: PNG, JPEG, GIF) when the payload is one.
    * Payloads that are no recognized container — e.g. the synthetic
    * text-derived fixtures — fall back to deterministic pseudo-dims
    * derived from the first bytes (the documented, oracle-checkable
    * stand-in; a production pipeline would route them to a quarantine
    * table instead). Pixel-level decode stays out of scope: no codec
    * libraries in this container. */
  def decode(spark: SparkSession, media: DataFrame): Dataset[DecodedMedia] = {
    import spark.implicits._
    media.select("media_id", "media_type", "bytes").as[MediaRecord]
      .mapPartitions { it =>
        // one context per partition — the digest follows the same
        // discipline a codec context would (digest() resets it)
        val sha = java.security.MessageDigest.getInstance("SHA-256")
        val hexChars = "0123456789abcdef".toCharArray
        it.map { m =>
          val n = m.bytes.length
          val (w, h, c) = parseImageHeader(m.bytes).getOrElse {
            val b0 = if (n > 0) m.bytes(0) & 0xFF else 0
            val b1 = if (n > 1) m.bytes(1) & 0xFF else 0
            (16 + (b0 * 7) % 1904, 16 + (b1 * 13) % 1064,
              if (m.media_type == "audio") 2 else 3)
          }
          val dig = sha.digest(m.bytes)
          val hex = new Array[Char](dig.length * 2)
          var i = 0
          while (i < dig.length) {
            hex(2 * i) = hexChars((dig(i) >> 4) & 0xF)
            hex(2 * i + 1) = hexChars(dig(i) & 0xF)
            i += 1
          }
          DecodedMedia(m.media_id, m.media_type,
            width = w, height = h, channels = c, n_bytes = n,
            content_sha = new String(hex))
        }
      }
  }

  /** Former name of [[decode]], kept for source compatibility from when
    * the dimension path was fully stubbed. */
  @deprecated("use decode — the header parse is real now", "round 5")
  def decodeStub(spark: SparkSession, media: DataFrame): Dataset[DecodedMedia] =
    decode(spark, media)

  /** Feature extraction: 16-bin histogram of payload byte high-nibbles —
    * a REAL (non-stub) content feature computed per row by
    * [[graft.functions.ByteHistogram]]; where a production pipeline
    * plugs in a learned encoder, the Spark shape (binary → fixed-width
    * vector column) is identical. */
  def byteFeatures(media: DataFrame): DataFrame =
    media.select(col("media_id"), col("media_type"),
      length(col("bytes")).as("n_bytes"),
      graft.functions.ByteHistogram.of(col("bytes")).as("features"))

  /** 64-bin hashed byte-4-gram frequency signature — a bag-of-local-
    * patterns content feature for BINARY near-dup mining (where
    * [[byteFeatures]]' global nibble histogram is a coarse summary, the
    * local 4-byte windows discriminate: two payloads share signature
    * direction only when they share local byte patterns, the property
    * an image/audio near-dup miner needs). Non-overlapping windows,
    * each binned by a Knuth multiplicative hash over the window's
    * 32-bit big-endian value — `bin = ((v·2654435761 mod 2^32)·bins)
    * >> 32`, the HIGH bits, where an odd multiplier actually mixes —
    * pure integer arithmetic, replayable verbatim in any SQL engine
    * (the oracle splits v 16/16 so every product fits a BIGINT:
    * `v·2654435761 mod 2^32` = `(lo·2654435761 + hi·2041643008) mod
    * 2^32`). Payloads under 4 bytes emit no row.
    *
    * Scale shape: the ENTIRE accumulation is one compiled loop per
    * row ([[graft.functions.ByteGramSignature]]) — zero shuffle, zero
    * per-window allocation. Round-12 history: the original
    * hex→md5-per-window→explode→groupBy pipeline cost 63 s on the
    * x100 corpus; swapping md5 for this integer hash INSIDE that
    * pipeline moved nothing (65 s — the interpreted HOF lambda, the
    * 2× hex string, the per-window substring and the (media_id, bin)
    * exchange were the real tax, not the digest); compiling the loop
    * is what cut it. Counts are small integers (exactly representable
    * in float), so downstream double-accumulated cosines are
    * bit-identical to an oracle computing from the raw counts.
    * Returns (media_id, signature: array<float>[bins]). */
  def byteGramSignature(media: DataFrame, bins: Int = 64): DataFrame = {
    require(bins >= 2, s"bins must be >= 2: $bins")
    media.where(length(col("bytes")) >= 4)
      .select(col("media_id"),
        graft.functions.ByteGramSignature.of(col("bytes"), bins).as("signature"))
  }

  /** Resize stage STUB: keep every `factor`-th byte of the payload —
    * deterministic byte decimation standing in for a real image/audio
    * resample (codec libraries are not in this container). Runs in the
    * same partition-local typed map as [[decodeStub]]. */
  def resizeStub(spark: SparkSession, media: DataFrame, factor: Int): Dataset[MediaRecord] = {
    import spark.implicits._
    require(factor > 0, "factor must be positive")
    media.select("media_id", "media_type", "bytes").as[MediaRecord]
      .mapPartitions { it =>
        it.map { m =>
          val out = new Array[Byte]((m.bytes.length + factor - 1) / factor)
          var i = 0
          while (i < out.length) { out(i) = m.bytes(i * factor); i += 1 }
          MediaRecord(m.media_id, m.media_type, out)
        }
      }
  }

  /** Frame sampling: split the payload into `n` equal byte slices
    * ("frames"), one output row per frame — the explode shape a video
    * pipeline uses. Pure column expressions. */
  def frameSample(media: DataFrame, n: Int): DataFrame = {
    val frameLen = greatest((length(col("bytes")) / n).cast("int"), lit(1))
    media.select(col("media_id"), col("media_type"), col("bytes"),
      frameLen.as("flen"),
      explode(sequence(lit(0), lit(n - 1))).as("frame_id"))
      .select(col("media_id"), col("media_type"), col("frame_id"),
        col("bytes").substr(col("frame_id") * col("flen") + 1, col("flen")).as("frame_bytes"))
  }
}
