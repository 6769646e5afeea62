package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One media item: opaque bytes + typed metadata — the multimodal column
  * model (image/audio/video as `binary` with a kind tag). At 100 TB the
  * payload stays columnar (parquet binary, never stringified) and decode
  * runs batched per partition.
  */
final case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])

/** Decoded features. IMAGE payloads (PNG/JPEG/GIF/BMP by magic bytes)
  * decode REAL dimensions via the JDK's `javax.imageio` — header-only
  * (an `ImageReader` reads width/height without rasterizing the pixels).
  * Non-image payloads (audio/video: no codec libs in this container)
  * fall back to [[Multimodal.decodeStub]]'s deterministic fake. The
  * Spark-side plumbing — schema, typed Dataset, per-partition batching,
  * feature extraction shape — is identical for both paths.
  */
final case class MediaFeatures(
    media_id: Long,
    kind: String,
    n_bytes: Long,
    width: Int,
    height: Int,
    n_frames: Int,
    sampled_frames: Int)

object Multimodal {

  /** Deterministic fake decode: dimensions derived from byte length, as a
    * placeholder for the audio/video decoders this container lacks (which
    * would run here, batched per partition, exactly this shape).
    */
  def decodeStub(r: MediaRow): MediaFeatures = {
    val n = r.payload.length.toLong
    val frames = (n % 24).toInt + 1
    MediaFeatures(r.media_id, r.kind, n,
      width = (n % 640).toInt, height = ((n * 7) % 480).toInt,
      n_frames = frames, sampled_frames = math.min(frames, 8))
  }

  /** Magic-byte sniff for the formats `javax.imageio` ships readers for.
    * Cheaper and more honest than trying ImageIO on every payload: a
    * text/audio byte blob must NOT burn an ImageReader probe per row.
    */
  private[operators] def looksLikeImage(p: Array[Byte]): Boolean =
    if (p.length < 8) false
    else (p(0) == 0x89.toByte && p(1) == 'P' && p(2) == 'N' && p(3) == 'G') || // PNG
      (p(0) == 0xFF.toByte && p(1) == 0xD8.toByte && p(2) == 0xFF.toByte) || // JPEG
      (p(0) == 'G' && p(1) == 'I' && p(2) == 'F' && p(3) == '8') || // GIF
      (p(0) == 'B' && p(1) == 'M') // BMP

  /** Header-only image decode: width/height (and frame count for
    * multi-frame GIFs) via an `ImageReader`, WITHOUT decoding pixel data
    * — `getWidth(0)` parses the header only, so cost per image is
    * microseconds, not a rasterization. None if ImageIO has no reader
    * for the bytes or the header is corrupt (caller falls back to the
    * stub, job continues — the per-record-failure discipline of the exec
    * operator applied to decode).
    */
  private[operators] def imageDims(payload: Array[Byte]): Option[(Int, Int, Int)] =
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) None
        else {
          val reader = readers.next()
          try {
            reader.setInput(iis, false, true)
            val frames =
              try math.max(reader.getNumImages(true), 1)
              catch { case _: Exception => 1 }
            Some((reader.getWidth(0), reader.getHeight(0), frames))
          } finally reader.dispose()
        }
      } finally iis.close()
    } catch { case _: Exception => None }

  /** Decode one media row: real dimensions for image payloads, stub
    * arithmetic otherwise.
    */
  def decode(r: MediaRow): MediaFeatures =
    (if (looksLikeImage(r.payload)) imageDims(r.payload) else None) match {
      case Some((w, h, frames)) =>
        MediaFeatures(r.media_id, r.kind, r.payload.length.toLong,
          width = w, height = h,
          n_frames = frames, sampled_frames = math.min(frames, 8))
      case None => decodeStub(r)
    }

  /** Decoded audio features (the WAV/RIFF container path). `duration_ms`
    * is exact integer arithmetic: n_samples·1000 / sample_rate.
    */
  final case class AudioFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      sample_rate: Int,
      channels: Int,
      bits_per_sample: Int,
      n_samples: Long,
      duration_ms: Long)

  private[operators] def looksLikeWav(p: Array[Byte]): Boolean =
    p.length >= 12 &&
      p(0) == 'R' && p(1) == 'I' && p(2) == 'F' && p(3) == 'F' &&
      p(8) == 'W' && p(9) == 'A' && p(10) == 'V' && p(11) == 'E'

  private def le16(p: Array[Byte], i: Int): Int =
    (p(i) & 0xFF) | ((p(i + 1) & 0xFF) << 8)
  private def le32(p: Array[Byte], i: Int): Int =
    (p(i) & 0xFF) | ((p(i + 1) & 0xFF) << 8) |
      ((p(i + 2) & 0xFF) << 16) | ((p(i + 3) & 0xFF) << 24)

  /** Header-only WAV parse: walk the RIFF chunk list for `fmt ` (sample
    * rate / channels / bits) and `data` (payload size → sample count and
    * duration). Pure byte arithmetic — no JavaSound, no codec libs; the
    * compressed-audio formats this container can't decode fall back to
    * the stub exactly like non-image payloads do. None on truncated or
    * malformed headers (caller falls back, job continues).
    */
  private[operators] def wavInfo(p: Array[Byte]): Option[(Int, Int, Int, Long)] = {
    if (!looksLikeWav(p)) return None
    var sampleRate = 0; var channels = 0; var bits = 0; var blockAlign = 0
    var dataSize = -1L
    // long cursor: a malformed 32-bit chunk size near 2^32 must not wrap
    // an int index back into the buffer (infinite loop)
    var pos = 12L
    while (pos + 8 <= p.length && (sampleRate == 0 || dataSize < 0)) {
      val i = pos.toInt
      val size = le32(p, i + 4).toLong & 0xFFFFFFFFL
      val isFmt = p(i) == 'f' && p(i + 1) == 'm' && p(i + 2) == 't' && p(i + 3) == ' '
      val isData = p(i) == 'd' && p(i + 1) == 'a' && p(i + 2) == 't' && p(i + 3) == 'a'
      if (isFmt && i + 8 + 16 <= p.length) {
        channels = le16(p, i + 10)
        sampleRate = le32(p, i + 12)
        blockAlign = le16(p, i + 20)
        bits = le16(p, i + 22)
      } else if (isData) {
        // size may exceed the (truncated) payload; the real byte count is
        // what's actually present
        dataSize = math.min(size, (p.length - i - 8).toLong)
      }
      pos += 8 + size + (size & 1) // chunks are word-aligned
    }
    if (sampleRate <= 0 || channels <= 0 || blockAlign <= 0 || dataSize < 0) None
    else Some((sampleRate, channels, bits, dataSize / blockAlign))
  }

  private def be24(p: Array[Byte], i: Int): Int =
    ((p(i) & 0xFF) << 16) | ((p(i + 1) & 0xFF) << 8) | (p(i + 2) & 0xFF)

  private[operators] def looksLikeFlac(p: Array[Byte]): Boolean =
    p.length >= 42 &&
      p(0) == 'f' && p(1) == 'L' && p(2) == 'a' && p(3) == 'C'

  /** FLAC STREAMINFO parse — fixed-offset byte arithmetic like the WAV
    * path, no codec: the mandatory first metadata block (type 0, ≥ 34
    * bytes) packs sample rate (20 bits), channels−1 (3), bits−1 (5) and
    * total samples (36) at bytes 10–17 of the block. None on malformed
    * or truncated headers — caller falls back, job continues.
    */
  private[operators] def flacInfo(p: Array[Byte]): Option[(Int, Int, Int, Long)] = {
    if (!looksLikeFlac(p)) return None
    // metadata block header at 4: 1 bit last-block, 7 bits type (must be
    // 0 = STREAMINFO first, per spec), 24-bit BE length ≥ 34
    if ((p(4) & 0x7F) != 0 || be24(p, 5) < 34) return None
    val s = 8 // STREAMINFO data start
    val b = (i: Int) => p(s + i) & 0xFF
    val rate = (b(10) << 12) | (b(11) << 4) | (b(12) >> 4)
    val channels = ((b(12) >> 1) & 7) + 1
    val bits = (((b(12) & 1) << 4) | (b(13) >> 4)) + 1
    val nSamples = ((b(13) & 0x0F).toLong << 32) |
      ((b(14).toLong << 24) | (b(15) << 16) | (b(16) << 8) | b(17))
    if (rate <= 0) None else Some((rate, channels, bits, nSamples))
  }

  /** MPEG-audio bitrate table, kbps: (versionBits, layerBits) → index
    * 1–14. Version bits: 3 = MPEG1, 2 = MPEG2, 0 = MPEG2.5; layer bits:
    * 3 = Layer I, 2 = Layer II, 1 = Layer III (ISO/IEC 11172-3 header).
    */
  private val Mp3Bitrates: Map[(Int, Int), Array[Int]] = {
    val v1l1 = Array(32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448)
    val v1l2 = Array(32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384)
    val v1l3 = Array(32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
    val v2l1 = Array(32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256)
    val v2l23 = Array(8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)
    Map((3, 3) -> v1l1, (3, 2) -> v1l2, (3, 1) -> v1l3,
      (2, 3) -> v2l1, (2, 2) -> v2l23, (2, 1) -> v2l23,
      (0, 3) -> v2l1, (0, 2) -> v2l23, (0, 1) -> v2l23)
  }

  private val Mp3Rates: Map[Int, Array[Int]] = Map(
    3 -> Array(44100, 48000, 32000), // MPEG1
    2 -> Array(22050, 24000, 16000), // MPEG2
    0 -> Array(11025, 12000, 8000)) // MPEG2.5

  private[operators] def looksLikeMp3(p: Array[Byte]): Boolean =
    (p.length >= 10 && p(0) == 'I' && p(1) == 'D' && p(2) == '3') ||
      (p.length >= 4 && (p(0) & 0xFF) == 0xFF && (p(1) & 0xE0) == 0xE0)

  /** MP3 frame-header parse — version/layer/bitrate/samplerate from the
    * first sync frame (after skipping an ID3v2 tag: syncsafe 28-bit
    * size, +10 footer when flagged), then the standard CBR estimate:
    * frames = data / frameLen, frameLen = spf/8·bitrate/rate (+pad).
    * bits_per_sample is 0 — not a PCM concept for a lossy codec. Pure
    * table+integer arithmetic; None on malformed headers.
    */
  private[operators] def mp3Info(p: Array[Byte]): Option[(Int, Int, Long)] = {
    if (!looksLikeMp3(p)) return None
    var off = 0
    if (p(0) == 'I' && p(1) == 'D' && p(2) == '3') {
      val syncsafe = ((p(6) & 0x7F) << 21) | ((p(7) & 0x7F) << 14) |
        ((p(8) & 0x7F) << 7) | (p(9) & 0x7F)
      off = 10 + syncsafe + (if ((p(5) & 0x10) != 0) 10 else 0)
      if (off < 0) return None // hostile tag size wrapping int
    }
    // bounded forward scan for the first frame sync (files pad after the
    // tag); 2 KiB keeps hostile payloads from turning this into O(n)
    val limit = math.min(off + 2048L, p.length.toLong - 4L)
    while (off <= limit &&
      !((p(off) & 0xFF) == 0xFF && (p(off + 1) & 0xE0) == 0xE0)) off += 1
    if (off > limit) return None
    val h = be32(p, off)
    val ver = ((h >> 19) & 3).toInt
    val layer = ((h >> 17) & 3).toInt
    val brIdx = ((h >> 12) & 15).toInt
    val srIdx = ((h >> 10) & 3).toInt
    val pad = ((h >> 9) & 1).toInt
    if (ver == 1 || layer == 0 || brIdx == 0 || brIdx == 15 || srIdx == 3)
      return None // reserved / free-format / bad — not parseable headers
    val kbps = Mp3Bitrates((ver, layer))(brIdx - 1)
    val rate = Mp3Rates(ver)(srIdx)
    val channels = if (((h >> 6) & 3) == 3) 1 else 2
    // samples per frame: Layer I 384; Layer II 1152; Layer III 1152
    // (MPEG1) / 576 (MPEG2/2.5)
    val spf = layer match {
      case 3 => 384
      case 2 => 1152
      case _ => if (ver == 3) 1152 else 576
    }
    val frameLen =
      if (layer == 3) (12 * kbps * 1000 / rate + pad) * 4
      else spf / 8 * kbps * 1000 / rate + pad
    if (frameLen <= 0) return None
    val nFrames = (p.length - off).toLong / frameLen
    Some((rate, channels, nFrames * spf))
  }

  /** Deterministic fake audio decode for non-WAV payloads (same role as
    * [[decodeStub]] for non-image payloads).
    */
  def audioStub(r: MediaRow): AudioFeatures = {
    val n = r.payload.length.toLong
    AudioFeatures(r.media_id, r.kind, n,
      sample_rate = 8000, channels = 1, bits_per_sample = 16,
      n_samples = n / 2, duration_ms = (n / 2) * 1000 / 8000)
  }

  /** Decode one audio row: real header fields for WAV (RIFF chunks),
    * FLAC (STREAMINFO) and MP3 (frame header + CBR estimate) payloads —
    * all pure byte arithmetic; the stub only remains for genuinely
    * unknown payloads.
    */
  def decodeAudio(r: MediaRow): AudioFeatures = wavInfo(r.payload) match {
    case Some((rate, ch, bits, nSamples)) =>
      AudioFeatures(r.media_id, r.kind, r.payload.length.toLong,
        sample_rate = rate, channels = ch, bits_per_sample = bits,
        n_samples = nSamples, duration_ms = nSamples * 1000L / rate)
    case None => flacInfo(r.payload) match {
      case Some((rate, ch, bits, nSamples)) =>
        AudioFeatures(r.media_id, r.kind, r.payload.length.toLong,
          sample_rate = rate, channels = ch, bits_per_sample = bits,
          n_samples = nSamples, duration_ms = nSamples * 1000L / rate)
      case None => mp3Info(r.payload) match {
        case Some((rate, ch, nSamples)) =>
          AudioFeatures(r.media_id, r.kind, r.payload.length.toLong,
            sample_rate = rate, channels = ch, bits_per_sample = 0,
            n_samples = nSamples, duration_ms = nSamples * 1000L / rate)
        case None => audioStub(r)
      }
    }
  }

  /** Audio feature extraction over a typed media Dataset — the audio
    * twin of [[extractFeatures]], same per-partition batching.
    */
  def extractAudio(media: Dataset[MediaRow]): Dataset[AudioFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(decodeAudio))
  }

  /** Decoded video-container features (the MP4/ISO-BMFF path): brand
    * from `ftyp`, movie duration from `moov/mvhd` — header metadata by
    * pure byte arithmetic, no codec. Frame DECODE needs codecs this
    * container lacks; duration/timescale is what a curation pipeline
    * filters on first anyway ("drop clips under 2 s").
    */
  final case class VideoFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      brand: String,
      timescale: Long,
      duration_ms: Long,
      n_top_boxes: Int)

  private def be32(p: Array[Byte], i: Int): Long =
    ((p(i) & 0xFFL) << 24) | ((p(i + 1) & 0xFFL) << 16) |
      ((p(i + 2) & 0xFFL) << 8) | (p(i + 3) & 0xFFL)
  private def be64(p: Array[Byte], i: Int): Long =
    (be32(p, i) << 32) | be32(p, i + 4)

  private[operators] def looksLikeMp4(p: Array[Byte]): Boolean =
    p.length >= 12 &&
      p(4) == 'f' && p(5) == 't' && p(6) == 'y' && p(7) == 'p'

  /** ISO-BMFF box walk: top-level boxes are (32-bit size, 4-char type)
    * with size==1 → 64-bit largesize and size==0 → extends to EOF.
    * Recurse ONE level into `moov` for `mvhd` (version 0: 32-bit
    * timescale/duration at offset 20; version 1: 64-bit at 28). None on
    * malformed/truncated headers — caller falls back to the stub, the
    * job continues (the per-record-failure discipline again).
    */
  private[operators] def mp4Info(p: Array[Byte]): Option[(String, Long, Long, Int)] = {
    if (!looksLikeMp4(p)) return None
    val brand = new String(p, 8, 4, "US-ASCII")
    var timescale = -1L
    var duration = -1L
    var nTop = 0
    var pos = 0L
    while (pos + 8 <= p.length) {
      val i = pos.toInt
      val size0 = be32(p, i)
      val tpe = new String(p, i + 4, 4, "US-ASCII")
      val (hdr, size) =
        if (size0 == 1L) {
          if (i + 16 > p.length) return None
          (16, be64(p, i + 8))
        } else if (size0 == 0L) (8, p.length.toLong - pos)
        else (8, size0)
      // subtraction form: `pos + size` with a hostile 64-bit largesize
      // near Long.MaxValue wraps negative and passes the naive check
      if (size < hdr || size > p.length - pos) return None // malformed
      nTop += 1
      if (tpe == "moov") {
        // child walk within [i+hdr, i+size)
        var cPos = pos + hdr
        val end = pos + size
        while (cPos + 8 <= end) {
          val ci = cPos.toInt
          val cSize0 = be32(p, ci)
          val cTpe = new String(p, ci + 4, 4, "US-ASCII")
          // same three size forms as the top-level walk: 1 = 64-bit
          // largesize follows, 0 = to end of parent box
          val (cHdr, cSize) =
            if (cSize0 == 1L) {
              if (cPos + 16 > end) return None
              (16L, be64(p, ci + 8))
            } else if (cSize0 == 0L) (8L, end - cPos)
            else (8L, cSize0)
          if (cSize < cHdr || cSize > end - cPos) return None
          // mvhd field offsets below assume the compact 8-byte header
          // (no real mvhd needs largesize — skip rather than misread)
          if (cTpe == "mvhd" && cHdr == 8L && ci + 8 + 4 <= p.length) {
            val version = p(ci + 8) & 0xFF
            if (version == 0 && ci + 8 + 4 + 8 + 8 <= p.length) {
              timescale = be32(p, ci + 20)
              duration = be32(p, ci + 24)
            } else if (version == 1 && ci + 8 + 4 + 16 + 12 <= p.length) {
              timescale = be32(p, ci + 28)
              duration = be64(p, ci + 32)
            }
          }
          cPos += cSize
        }
      }
      pos += size
    }
    // duration > MaxValue/1000 would overflow the ms conversion —
    // that's a corrupt mvhd (≈ 292k years at timescale 1000), not a clip
    if (timescale <= 0 || duration < 0 || duration > Long.MaxValue / 1000L) None
    else Some((brand, timescale, duration, nTop))
  }

  /** Deterministic fake video decode for non-MP4 payloads. */
  def videoStub(r: MediaRow): VideoFeatures = {
    val n = r.payload.length.toLong
    VideoFeatures(r.media_id, r.kind, n,
      brand = "none", timescale = 1000L,
      duration_ms = n % 60000L, n_top_boxes = 0)
  }

  /** Decode one video row: real ftyp/mvhd fields for MP4 payloads, stub
    * arithmetic otherwise. `duration_ms` is exact integer arithmetic:
    * duration·1000 / timescale.
    */
  def decodeVideo(r: MediaRow): VideoFeatures = mp4Info(r.payload) match {
    case Some((brand, ts, dur, nTop)) =>
      VideoFeatures(r.media_id, r.kind, r.payload.length.toLong,
        brand = brand, timescale = ts,
        duration_ms = dur * 1000L / ts, n_top_boxes = nTop)
    case None => videoStub(r)
  }

  /** Video feature extraction — the container-metadata twin of
    * [[extractAudio]], same per-partition batching.
    */
  def extractVideo(media: Dataset[MediaRow]): Dataset[VideoFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(decodeVideo))
  }

  /** Decode/feature-extract over a typed media Dataset. mapPartitions so a
    * real decoder amortizes codec init once per partition (ImageIO's
    * reader registry lookup is per-JVM; heavier decoders — model weights,
    * native codecs — would init here). `decoder` defaults to the real
    * content-sniffing [[decode]]; pass [[decodeStub]] when the consumer
    * needs arithmetic an external oracle can replay.
    */
  def extractFeatures(media: Dataset[MediaRow],
      decoder: MediaRow => MediaFeatures = decode): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(decoder))
  }

  /** Demo media table derived from `documents` (text bytes as the opaque
    * payload) — the testdata has no real media; the plumbing is the point.
    */
  def mediaFromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col("doc_id").as("media_id"),
      concat(lit("img/"), col("source")).as("kind"),
      col("text").cast("binary").as("payload"))
      .as[MediaRow]
  }

  /** Per-kind feature rollup — integer-only aggregates over the STUB
    * decode, EXPLICITLY: the DuckDB oracle replays the stub arithmetic,
    * and the real content-sniffing decode must never leak in here — a
    * document text that happens to start with image magic bytes ("BM…")
    * would otherwise decode "real" dimensions on the Spark side only and
    * break the hash gate data-dependently. Real media trees go through
    * [[extractFeatures]]'s default decoder instead.
    */
  def featureSummary(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    extractFeatures(mediaFromDocuments(spark, docs), decodeStub)
      .groupBy(col("kind"))
      .agg(count(lit(1)).as("n_media"),
        sum(col("n_bytes")).as("total_bytes"),
        sum(col("width").cast("long")).as("sum_width"),
        sum(col("height").cast("long")).as("sum_height"),
        sum(col("n_frames").cast("long")).as("sum_frames"),
        sum(col("sampled_frames").cast("long")).as("sum_sampled"))
      .orderBy(col("kind"))
  }
}
