package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.io.Sources

/** Multimodal-column plumbing: media payloads travel as opaque `binary`
  * columns with a typed metadata struct; decode / feature-extraction runs
  * batched per partition.
  *
  * The container ships no image/audio codec libraries, so the codec is a
  * hand-written, spec-conformant RIFF/WAVE implementation: a builder and
  * a chunk-walking parser (little-endian fields, pad bytes, magic
  * validation). BOTH decode gates run it — m4 parses the container's
  * header fields, m2 decodes the sample bytes out of the container and
  * featurizes them — so the per-partition decode seam carries an actual
  * binary format end to end; nothing in the decode path is a stand-in.
  */
object MultimodalOps {

  /** Media row schema: payload + typed metadata, the shape a 100 TB
    * multimodal lake would carry (payload possibly a pointer). */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("payload", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("mime", StringType),
      StructField("byte_len", LongType))))))

  /** Wrap documents as a media table (text bytes standing in for blobs). */
  def asMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      col("text").cast("binary").as("payload"),
      struct(
        lit("text/plain").as("mime"),
        octet_length(col("text").cast("binary")).cast("long").as("byte_len")).as("meta"))

  /** Feature kernel over DECODED samples: 8-bin byte histogram,
    * normalized — the fixed-width featurizer a real pipeline runs after
    * the codec (per-channel stats, embeddings, ... all share this
    * shape: decoded bytes in, fixed-width vector out). */
  def byteHistogram(samples: Array[Byte]): Array[Double] = {
    val bins = new Array[Double](8)
    samples.foreach(b => bins((b & 0xff) / 32) += 1.0)
    val n = math.max(samples.length, 1)
    bins.map(_ / n)
  }

  /** Wrap documents as an audio media table: each payload is a REAL
    * RIFF/WAVE container ([[buildWav]]) holding the text bytes as PCM
    * samples — built per partition, the producer's per-partition
    * resource pattern (reference ProducerFinal.scala:66). */
  def asWavMedia(docs: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(mediaSchema)
    docs.select(col("doc_id"), col("lang"), col("text").cast("binary").as("data"))
      .mapPartitions { rows =>
        rows.map { r =>
          val wav = buildWav(r.getLong(0), r.getString(1), r.getAs[Array[Byte]](2))
          Row(r.getLong(0), wav, Row("audio/wav", wav.length.toLong))
        }
      }(enc)
  }

  /** Batched per-partition decode producing feature vectors: the payload
    * is parsed as a WAV container ([[decodeWav]] — magic validation,
    * chunk walk, pad-byte skips), its sample bytes are extracted, and the
    * featurizer runs over the DECODED samples. `byte_len` in the output
    * is the decoded sample count (what came OUT of the codec), not the
    * container size. */
  def decodeFeatures(spark: SparkSession, media: DataFrame): DataFrame = {
    val out = StructType(Seq(
      StructField("media_id", LongType),
      StructField("mime", StringType),
      StructField("byte_len", LongType),
      StructField("features", ArrayType(DoubleType))))
    val enc = org.apache.spark.sql.Encoders.row(out)
    media.mapPartitions { rows =>
      // codec/session init would happen once per partition here
      rows.map { r =>
        // positional access: media rows may come straight from another
        // mapPartitions (schemaless GenericRow), mediaSchema fixes order
        val samples = decodeWav(r.getAs[Array[Byte]](1))
        val meta = r.getStruct(2)
        Row(r.getLong(0), meta.getString(0), samples.length.toLong,
          byteHistogram(samples))
      }
    }(enc)
  }

  /** m2: the decode path end-to-end over a real binary format — wraps
    * each doc's bytes into a WAV container, runs the per-partition
    * chunk-walking decoder ([[decodeFeatures]]/[[decodeWav]]), and
    * projects the 8-bin normalized histogram of the decoded samples to
    * columns. The DuckDB oracle recomputes the histogram from the
    * original UTF-8 bytes (the samples' closed form), so a wrong pad
    * skip, a misread chunk size, or any other codec bug — builder or
    * parser — breaks the hash, as does any slip in the mapPartitions
    * plumbing (schema, encoder, batching). */
  def m2DecodeHistogram(spark: SparkSession, dir: String): DataFrame = {
    val feats = decodeFeatures(spark,
      asWavMedia(Sources.table(spark, dir, "documents")))
    val bins = (0 until 8).map(i =>
      round(element_at(col("features"), i + 1), 4).as(s"b$i"))
    feats.select((col("media_id") +: col("byte_len") +: bins): _*)
      .orderBy("media_id")
  }

  /** Frames sampled per media payload (m3). */
  val FrameCount = 4
  val FrameBytes = 16

  /** m3: deterministic frame-sampling over the opaque payload — the
    * video-frame-extraction shape: k fixed-size windows at evenly spaced
    * offsets, each digested. A real codec would decode the window; the
    * plumbing (binary slicing, per-frame rows, digest) is identical and
    * oracle-checked. Frames are digested via lower-hex so both engines
    * hash the exact same byte rendering. */
  def m3FrameSample(spark: SparkSession, dir: String): DataFrame = {
    val media = asMedia(Sources.table(spark, dir, "documents"))
      .select(col("media_id"), col("payload"),
        col("meta.byte_len").as("byte_len"))
    val frames = (0 until FrameCount).map { i =>
      struct(lit(i).as("frame_no"),
        floor(lit(i) * (greatest(col("byte_len") - FrameBytes, lit(0))) / (FrameCount - 1))
          .cast("long").as("off"))
    }
    media
      .select(col("media_id"), col("payload"), col("byte_len"),
        explode(array(frames: _*)).as("f"))
      .select(col("media_id"), col("byte_len"),
        col("f.frame_no"), col("f.off"),
        md5(lower(hex(expr(s"substring(payload, f.off + 1, $FrameBytes)"))))
          .as("frame_md5"))
      .orderBy("media_id", "frame_no")
  }

  // ---- m4: a REAL container format behind the decode seam ------------

  /** m4 runs the header-parsing half of the codec through the same
    * per-partition seam m2 decodes through: each doc's text bytes are wrapped
    * into a spec-conformant PCM WAV file (RIFF container: little-endian
    * chunk sizes, word-aligned chunks with pad bytes, a leading
    * non-audio chunk so the reader must genuinely walk the chunk list),
    * and the decoder parses the container back per the spec — magic
    * validation, LE field reads, chunk skip/align — never by position
    * arithmetic shared with the builder. The audio parameters derive
    * deterministically from doc_id, so the DuckDB oracle checks the
    * PARSED fields against their closed forms: any bug in builder or
    * parser (a wrong pad, a misread offset) breaks the hash. */
  val WavBits = 16

  private[graft] def wavChannels(docId: Long): Int = (1 + docId % 2).toInt
  private[graft] def wavRate(docId: Long): Int = (8000 * (1 + docId % 3)).toInt

  /** Build a minimal spec-conformant WAV: RIFF(WAVE) with a custom
    * "note" chunk (the lang tag — odd lengths exercise RIFF's pad-byte
    * rule), the 16-byte PCM "fmt " chunk, and a "data" chunk holding the
    * text bytes as samples. */
  private[graft] def buildWav(docId: Long, lang: String, data: Array[Byte]): Array[Byte] = {
    val channels = wavChannels(docId)
    val rate = wavRate(docId)
    val note = lang.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val notePad = note.length % 2
    val dataPad = data.length % 2
    val riffSize = 4 + (8 + note.length + notePad) + (8 + 16) + (8 + data.length + dataPad)
    val buf = java.nio.ByteBuffer.allocate(8 + riffSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")); buf.putInt(riffSize)
    buf.put("WAVE".getBytes("US-ASCII"))
    buf.put("note".getBytes("US-ASCII")); buf.putInt(note.length); buf.put(note)
    if (notePad == 1) buf.put(0.toByte)
    buf.put("fmt ".getBytes("US-ASCII")); buf.putInt(16)
    buf.putShort(1.toShort) // PCM
    buf.putShort(channels.toShort)
    buf.putInt(rate)
    buf.putInt(rate * channels * (WavBits / 8)) // byte rate
    buf.putShort((channels * (WavBits / 8)).toShort) // block align
    buf.putShort(WavBits.toShort)
    buf.put("data".getBytes("US-ASCII")); buf.putInt(data.length); buf.put(data)
    if (dataPad == 1) buf.put(0.toByte)
    buf.array()
  }

  /** Parsed WAV header facts (all long-typed for the oracle). */
  private[graft] final case class WavMeta(
    nChannels: Long, sampleRate: Long, bitDepth: Long,
    dataBytes: Long, durationMs: Long)

  /** Parse a WAV per the RIFF spec: validate magics, then walk chunks
    * (LE sizes, word alignment) until `data`. Unknown chunks are skipped
    * by their declared size — the reader never assumes the builder's
    * layout. */
  private[graft] def parseWav(bytes: Array[Byte]): WavMeta = walkWav(bytes)._1

  /** Decode the sample bytes out of a WAV container — the chunk walk
    * locates `data` per the spec, then the samples are sliced by the
    * chunk's declared size (never by builder-shared arithmetic). */
  private[graft] def decodeWav(bytes: Array[Byte]): Array[Byte] = {
    val (meta, off) = walkWav(bytes)
    java.util.Arrays.copyOfRange(bytes, off, off + meta.dataBytes.toInt)
  }

  /** The shared spec walk: parsed header facts + the data chunk's byte
    * offset. */
  private def walkWav(bytes: Array[Byte]): (WavMeta, Int) = {
    val buf = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag(): String = {
      val a = new Array[Byte](4); buf.get(a); new String(a, "US-ASCII")
    }
    require(tag() == "RIFF", "not a RIFF container")
    buf.getInt // riff size (validated implicitly: chunk walk must not overrun)
    require(tag() == "WAVE", "not a WAVE form")
    var channels = -1L; var rate = -1L; var bits = -1L; var dataLen = -1L
    var dataOff = -1
    while (dataLen < 0 && buf.remaining() >= 8) {
      val id = tag()
      val size = buf.getInt
      id match {
        case "fmt " =>
          val start = buf.position()
          val audioFormat = buf.getShort
          require(audioFormat == 1, s"not PCM: format $audioFormat")
          channels = buf.getShort.toLong
          rate = buf.getInt.toLong
          buf.getInt // byte rate (derivable)
          buf.getShort // block align (derivable)
          bits = buf.getShort.toLong
          buf.position(start + size + (size % 2))
        case "data" =>
          dataLen = size.toLong
          dataOff = buf.position()
          require(dataOff + dataLen <= bytes.length, "data chunk overruns file")
        case _ =>
          buf.position(buf.position() + size + (size % 2))
      }
    }
    require(dataLen >= 0, "no data chunk")
    require(channels > 0 && rate > 0 && bits > 0, "data chunk before fmt")
    val byteRate = rate * channels * (bits / 8)
    (WavMeta(channels, rate, bits, dataLen, dataLen * 1000L / byteRate), dataOff)
  }

  /** m4: wrap each doc's bytes into a WAV (builder) and decode the
    * container back per-partition (parser) — the m2 seam with a real
    * codec in it. The oracle recomputes every parsed field from its
    * closed form over `documents`. */
  def m4WavMeta(spark: SparkSession, dir: String): DataFrame = {
    val out = StructType(Seq(
      StructField("media_id", LongType),
      StructField("n_channels", LongType),
      StructField("sample_rate", LongType),
      StructField("bit_depth", LongType),
      StructField("data_bytes", LongType),
      StructField("duration_ms", LongType)))
    val enc = org.apache.spark.sql.Encoders.row(out)
    Sources.table(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), col("text").cast("binary").as("data"))
      .mapPartitions { rows =>
        // codec init once per partition (the ProducerFinal.scala:66 move)
        rows.map { r =>
          val wav = buildWav(r.getLong(0), r.getString(1), r.getAs[Array[Byte]](2))
          val m = parseWav(wav)
          Row(r.getLong(0), m.nChannels, m.sampleRate, m.bitDepth,
            m.dataBytes, m.durationMs)
        }
      }(enc)
      .orderBy("media_id")
  }

  // ---- m5: a second real container, image-shaped (BMP) ---------------

  /** Pixel row width for a doc's BMP — deliberately often NOT a multiple
    * of 4, so the builder and parser must both honor the BMP stride rule
    * (rows padded to 4-byte boundaries) instead of getting it for free. */
  private[graft] def bmpWidth(docId: Long): Int = (16 + docId % 17).toInt

  /** Build a spec-conformant 8-bpp palettized BMP: BITMAPFILEHEADER +
    * 40-byte BITMAPINFOHEADER + a 256-entry grayscale palette + the
    * pixel array, rows stored BOTTOM-UP and padded to 4-byte strides —
    * the structural opposite of RIFF's chunk walk, which is the point of
    * a second codec. The doc's bytes are the pixels, top-down row-major,
    * zero-padded to fill the last row. */
  private[graft] def buildBmp(docId: Long, data: Array[Byte]): Array[Byte] = {
    val width = bmpWidth(docId)
    val height = math.max((data.length + width - 1) / width, 1)
    val stride = (width + 3) & ~3
    val imageSize = stride * height
    val pxOff = 14 + 40 + 256 * 4
    val fileSize = pxOff + imageSize
    val buf = java.nio.ByteBuffer.allocate(fileSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte)
    buf.putInt(fileSize)
    buf.putShort(0.toShort); buf.putShort(0.toShort) // reserved
    buf.putInt(pxOff)
    buf.putInt(40) // BITMAPINFOHEADER
    buf.putInt(width)
    buf.putInt(height) // positive: bottom-up
    buf.putShort(1.toShort) // planes
    buf.putShort(8.toShort) // bpp
    buf.putInt(0) // BI_RGB
    buf.putInt(imageSize)
    buf.putInt(2835); buf.putInt(2835) // 72 dpi
    buf.putInt(256); buf.putInt(0) // palette entries / important
    var i = 0
    while (i < 256) { // grayscale BGRA palette
      buf.put(i.toByte).put(i.toByte).put(i.toByte).put(0.toByte); i += 1
    }
    // rows bottom-up: file row r holds logical (top-down) row height-1-r
    var r = height - 1
    while (r >= 0) {
      val rowStart = r * width
      var c = 0
      while (c < stride) {
        val idx = rowStart + c
        buf.put(if (c < width && idx < data.length) data(idx) else 0.toByte)
        c += 1
      }
      r -= 1
    }
    buf.array()
  }

  /** Parsed BMP facts (long-typed for the oracle). */
  private[graft] final case class BmpMeta(
    width: Long, height: Long, bpp: Long, stride: Long,
    imageSize: Long, fileSize: Long, pixelSum: Long)

  /** Parse a BMP per the spec: validate the magic, read LE header fields,
    * seek to the DECLARED pixel offset (never builder arithmetic), walk
    * rows bottom-up computing the stride from width per the 4-byte rule,
    * and sum pixel values over the logical image (pad columns excluded
    * per spec — they are stride filler, not pixels). */
  private[graft] def parseBmp(bytes: Array[Byte]): BmpMeta = {
    val buf = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    require(buf.get() == 'B'.toByte && buf.get() == 'M'.toByte, "not a BMP")
    val fileSize = buf.getInt.toLong
    buf.getShort; buf.getShort // reserved
    val pxOff = buf.getInt
    val dibSize = buf.getInt
    require(dibSize >= 40, s"unsupported DIB header: $dibSize")
    val width = buf.getInt.toLong
    val height = buf.getInt.toLong
    require(height > 0, "top-down BMPs not produced here")
    buf.getShort // planes
    val bpp = buf.getShort.toLong
    require(bpp == 8, s"not 8-bpp: $bpp")
    require(buf.getInt == 0, "compressed BMP")
    val imageSize = buf.getInt.toLong
    val stride = ((width + 3) & ~3L)
    require(pxOff + imageSize <= bytes.length, "pixel array overruns file")
    var sum = 0L
    var r = 0
    while (r < height) {
      val rowOff = pxOff + (height - 1 - r) * stride // bottom-up
      var c = 0
      while (c < width) {
        sum += java.lang.Byte.toUnsignedInt(bytes(rowOff.toInt + c))
        c += 1
      }
      r += 1
    }
    BmpMeta(width, height, bpp, stride, imageSize, fileSize, sum)
  }

  /** Decode the logical (top-down row-major) pixel bytes back out of a
    * BMP — the image twin of [[decodeWav]], used by the round-trip
    * property test. */
  private[graft] def decodeBmp(bytes: Array[Byte]): Array[Byte] = {
    val m = parseBmp(bytes)
    val buf = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.position(10)
    val pxOff = buf.getInt
    val out = new Array[Byte]((m.width * m.height).toInt)
    var r = 0
    while (r < m.height) {
      val rowOff = pxOff + (m.height - 1 - r) * m.stride
      System.arraycopy(bytes, rowOff.toInt, out, (r * m.width).toInt, m.width.toInt)
      r += 1
    }
    out
  }

  /** m5: wrap each doc's bytes into a BMP (builder) and parse the image
    * back per-partition — the second real codec behind the m2/m4 seam,
    * structurally disjoint from RIFF (fixed headers + strided bottom-up
    * rows vs walked chunks). The oracle recomputes every field from its
    * closed form: width from doc_id, height/stride/sizes from the byte
    * count per the 4-byte stride rule, and the pixel sum from the raw
    * text bytes (pad pixels are zero by construction, and the parser
    * sums the LOGICAL image only — a stride/flip bug breaks the sum). */
  def m5BmpMeta(spark: SparkSession, dir: String): DataFrame = {
    val out = StructType(Seq(
      StructField("media_id", LongType),
      StructField("width", LongType),
      StructField("height", LongType),
      StructField("bpp", LongType),
      StructField("stride", LongType),
      StructField("image_size", LongType),
      StructField("file_size", LongType),
      StructField("pixel_sum", LongType)))
    val enc = org.apache.spark.sql.Encoders.row(out)
    Sources.table(spark, dir, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("data"))
      .mapPartitions { rows =>
        // codec init once per partition (the ProducerFinal.scala:66 move)
        rows.map { r =>
          val bmp = buildBmp(r.getLong(0), r.getAs[Array[Byte]](1))
          val m = parseBmp(bmp)
          Row(r.getLong(0), m.width, m.height, m.bpp, m.stride,
            m.imageSize, m.fileSize, m.pixelSum)
        }
      }(enc)
      .orderBy("media_id")
  }

  /** Light header probe: width, height, stride, pixel offset — the
    * byte range a ranged fetch would read before seeking. */
  private def bmpHeader(bytes: Array[Byte]): (Int, Int, Int, Int) = {
    val buf = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    require(buf.get() == 'B'.toByte && buf.get() == 'M'.toByte, "not a BMP")
    buf.position(10)
    val pxOff = buf.getInt
    buf.position(18)
    val width = buf.getInt
    val height = buf.getInt
    (width, height, (width + 3) & ~3, pxOff)
  }

  /** Seek-decode ONE logical row out of a BMP: header fields give the
    * row's byte range (declared pixel offset + bottom-up stride
    * arithmetic), and only those `width` bytes are touched — the
    * ranged-read shape that matters at 100 TB, where decoding a sample
    * of rows must not fetch the whole object. */
  private[graft] def decodeBmpRow(bytes: Array[Byte], row: Int): Array[Byte] = {
    val (width, height, stride, pxOff) = bmpHeader(bytes)
    require(width > 0 && height > 0, s"bad BMP dims ${width}x$height")
    require(row >= 0 && row < height, s"row $row out of [0, $height)")
    // offset arithmetic in Long: a corrupt header's height*stride can
    // overflow Int and wrap to a small positive value that would pass
    // the bounds check yet read the wrong bytes
    val off = pxOff.toLong + (height - 1 - row).toLong * stride
    require(off >= 0 && off + width <= bytes.length,
      s"row $row byte range [$off, ${off + width}) outside ${bytes.length}-byte file")
    java.util.Arrays.copyOfRange(bytes, off.toInt, off.toInt + width)
  }

  // ---- m7: ranged-read audio window sampling --------------------------

  /** Windows sampled per audio payload (m7) and frames per window. */
  val WinCount = 4
  val WinFrames = 8

  /** Seek-decode ONE window of PCM frames out of a WAV by header
    * arithmetic: the chunk walk reads the HEADERS (the first ~50 bytes —
    * the ranged header probe an object-store reader issues), then the
    * window's byte range is computed from the declared data offset +
    * frame arithmetic (block align = channels × 2 at 16-bit) and ONLY
    * those bytes are decoded — int16 little-endian SIGNED samples, so
    * the energy sum proves the decoder interprets samples, not just
    * copies bytes. Returns (start_frame, n_samples, Σ sample²) — all
    * integer-exact. */
  private[graft] def wavWindowEnergy(bytes: Array[Byte], winNo: Int): (Long, Long, Long) = {
    val (meta, dataOff) = walkWav(bytes)
    val ba = (meta.nChannels * (meta.bitDepth / 8)).toInt
    val nf = meta.dataBytes / ba
    val start = winNo.toLong * math.max(nf - WinFrames, 0) / (WinCount - 1)
    val take = math.min(WinFrames.toLong, nf - start)
    val ns = take * meta.nChannels
    // window byte range in Long (corrupt-header safety, the m6 rule)
    val boff = dataOff.toLong + start * ba
    require(boff >= 0 && boff + 2 * ns <= bytes.length,
      s"window $winNo byte range [$boff, ${boff + 2 * ns}) outside ${bytes.length}-byte file")
    var energy = 0L
    var j = 0
    while (j < ns) {
      val lo = java.lang.Byte.toUnsignedInt(bytes(boff.toInt + 2 * j))
      val hi = bytes(boff.toInt + 2 * j + 1).toInt // sign-carrying high byte
      val v = (hi << 8) | lo // signed 16-bit
      energy += v.toLong * v
      j += 1
    }
    (start, ns, energy)
  }

  /** m7: random-access PCM window sampling over the WAV container — the
    * audio twin of m6's BMP row seeks, completing the ranged-read story
    * for BOTH codec families (RIFF chunk walk + strided image): four
    * evenly spaced windows of [[WinFrames]] frames are seek-decoded per
    * payload by header arithmetic alone and reduced to an integer-exact
    * energy sum over the decoded SIGNED int16 samples. Only the header
    * and the windows' bytes are touched, never the full data chunk —
    * at 100 TB this is how an object-store audio pipeline samples:
    * header probe, then per-window ranged GETs. The oracle recomputes
    * each window's samples from closed form (hex-nibble byte recovery,
    * LE pairing, two's-complement sign fold), so a block-align, seek,
    * endianness, or sign bug breaks the sum. */
  def m7WavWindowEnergy(spark: SparkSession, dir: String): DataFrame = {
    val out = StructType(Seq(
      StructField("media_id", LongType),
      StructField("win_no", LongType),
      StructField("start_frame", LongType),
      StructField("n_samples", LongType),
      StructField("energy", LongType)))
    val enc = org.apache.spark.sql.Encoders.row(out)
    Sources.table(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), col("text").cast("binary").as("data"))
      .mapPartitions { rows =>
        // codec init once per partition (the ProducerFinal.scala:66 move)
        rows.flatMap { r =>
          val id = r.getLong(0)
          val wav = buildWav(id, r.getString(1), r.getAs[Array[Byte]](2))
          (0 until WinCount).map { i =>
            val (start, ns, energy) = wavWindowEnergy(wav, i)
            Row(id, i.toLong, start, ns, energy)
          }
        }
      }(enc)
      .orderBy("media_id", "win_no")
  }

  /** Rows sampled per image (m6). */
  val RowSampleCount = 4

  /** Render `bytes` as lower-hex and md5 that rendering (digest itself
    * lower-hex) — the convention every ranged-decode gate's oracle
    * replays as `md5(lower(hex(...)))`. One definition so the charset
    * and casing contract cannot drift between m6/m8/m9. */
  private def hexDigest(md: java.security.MessageDigest, bytes: Array[Byte]): String = {
    val hexStr = bytes.map(b => f"${b & 0xff}%02x").mkString
    md.reset()
    md.digest(hexStr.getBytes("US-ASCII")).map(b => f"${b & 0xff}%02x").mkString
  }

  /** m6: random-access row sampling over the BMP container — m3's
    * frame-sampling shape upgraded from opaque byte windows to REAL
    * codec-addressed units: four evenly spaced logical rows are
    * seek-decoded by header arithmetic (see [[decodeBmpRow]]) and
    * digested. The oracle recomputes each row's bytes from closed form
    * (data slice + zero fill at the tail) — a stride, flip, or offset
    * bug lands the seek on the wrong bytes and breaks the digest. */
  def m6BmpRowSample(spark: SparkSession, dir: String): DataFrame = {
    val out = StructType(Seq(
      StructField("media_id", LongType),
      StructField("row_no", LongType),
      StructField("row_idx", LongType),
      StructField("row_md5", StringType)))
    val enc = org.apache.spark.sql.Encoders.row(out)
    Sources.table(spark, dir, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("data"))
      .mapPartitions { rows =>
        // digest instance init once per partition (the ProducerFinal.scala:66 move)
        val md = java.security.MessageDigest.getInstance("MD5")
        rows.flatMap { r =>
          val id = r.getLong(0)
          val bmp = buildBmp(id, r.getAs[Array[Byte]](1))
          val (_, height, _, _) = bmpHeader(bmp)
          (0 until RowSampleCount).map { i =>
            val ri = i * (height - 1) / (RowSampleCount - 1)
            Row(id, i.toLong, ri.toLong, hexDigest(md, decodeBmpRow(bmp, ri)))
          }
        }
      }(enc)
      .orderBy("media_id", "row_no")
  }

  /** Thumbnail dimensions for m8 — fixed-size output regardless of the
    * source image, the shape a training pipeline's preprocessor emits. */
  val ThumbW = 8
  val ThumbH = 8

  /** Seek-decode a ThumbW×ThumbH nearest-neighbor thumbnail out of a
    * BMP: the resize touches only the ThumbH distinct mapped source rows
    * ([[decodeBmpRow]]'s header-arithmetic ranged read), never the whole
    * pixel array — at 100 TB a thumbnail pass must read O(thumb) bytes
    * per object, not O(image). Output is logical top-down row-major.
    * Index math in Long first (the m6/m7 rule): a corrupt header's
    * dimensions must not wrap Int into a plausible in-bounds index. */
  private[graft] def decodeBmpThumb(bytes: Array[Byte]): Array[Byte] = {
    val (width, height, _, _) = bmpHeader(bytes)
    require(width > 0 && height > 0, s"bad BMP dims ${width}x$height")
    val out = new Array[Byte](ThumbW * ThumbH)
    var lastRi = -1
    var rowBytes: Array[Byte] = null
    var y = 0
    while (y < ThumbH) {
      // nearest-neighbor row map: floor(y * height / ThumbH) < height
      val ri = (y.toLong * height / ThumbH).toInt
      if (ri != lastRi) { rowBytes = decodeBmpRow(bytes, ri); lastRi = ri }
      var x = 0
      while (x < ThumbW) {
        out(y * ThumbW + x) = rowBytes((x.toLong * width / ThumbW).toInt)
        x += 1
      }
      y += 1
    }
    out
  }

  /** m8: nearest-neighbor thumbnail through the real BMP codec — the
    * RESIZE leg of the decode / feature-extract / resize / frame-sample
    * family (m2 / m1 / m8 / m3). Each doc's image shrinks (or tiles up,
    * when the source is shorter than 8 rows) to a fixed 8×8 grayscale
    * thumbnail via integer index mapping over seek-decoded rows; the
    * digest is over the thumbnail's lower-hex rendering and the
    * luminance sum is integer-exact, so a row-map, column-map, stride,
    * or bottom-up-flip bug lands on the wrong pixels and breaks both.
    * The oracle recomputes every pixel from closed form (data byte at
    * `ri*w + ci` when inside the payload, else the builder's zero
    * fill). */
  def m8BmpThumbnail(spark: SparkSession, dir: String): DataFrame = {
    val out = StructType(Seq(
      StructField("media_id", LongType),
      StructField("thumb_w", LongType),
      StructField("thumb_h", LongType),
      StructField("lum_sum", LongType),
      StructField("thumb_md5", StringType)))
    val enc = org.apache.spark.sql.Encoders.row(out)
    Sources.table(spark, dir, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("data"))
      .mapPartitions { rows =>
        // digest instance init once per partition (the ProducerFinal.scala:66 move)
        val md = java.security.MessageDigest.getInstance("MD5")
        rows.map { r =>
          val id = r.getLong(0)
          val bmp = buildBmp(id, r.getAs[Array[Byte]](1))
          val thumb = decodeBmpThumb(bmp)
          var lum = 0L
          thumb.foreach(b => lum += (b & 0xff))
          Row(id, ThumbW.toLong, ThumbH.toLong, lum, hexDigest(md, thumb))
        }
      }(enc)
      .orderBy("media_id")
  }

  // ---- m9: indexed multi-frame ("video") container -------------------

  /** Per-frame payload budget and frames sampled per video (m9). */
  val VideoFramePayload = 64
  val VideoSampleCount = 4

  /** Build a GMV1 container: magic + LE u32 frame count + LE u32 payload
    * budget + a u32 offset INDEX + one complete BMP per frame (frame k
    * holds payload bytes [k·fp, (k+1)·fp), the last frame short). The
    * index-then-frames layout is the structural essence of a video
    * container (MP4's sample table, AVI's idx1): frame access is a
    * table lookup plus one ranged read, never a scan-and-parse walk. */
  private[graft] def buildVideo(docId: Long, data: Array[Byte]): Array[Byte] = {
    val fp = VideoFramePayload
    val nf = math.max((data.length + fp - 1) / fp, 1)
    val frames = (0 until nf).map { k =>
      val lo = math.min(k * fp, data.length)
      val hi = math.min(lo + fp, data.length)
      buildBmp(docId, java.util.Arrays.copyOfRange(data, lo, hi))
    }
    val headerLen = 12 + 4 * nf
    val buf = java.nio.ByteBuffer.allocate(headerLen + frames.map(_.length).sum)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('G'.toByte).put('M'.toByte).put('V'.toByte).put('1'.toByte)
    buf.putInt(nf)
    buf.putInt(fp)
    var off = headerLen
    frames.foreach { f => buf.putInt(off); off += f.length }
    frames.foreach(buf.put)
    buf.array()
  }

  /** Parse the GMV1 index: (n_frames, payload budget, frame offsets) —
    * the ~(12 + 4·nf)-byte header probe a ranged reader issues before
    * any frame fetch. */
  private[graft] def videoIndex(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
    val buf = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    require(buf.get() == 'G'.toByte && buf.get() == 'M'.toByte &&
      buf.get() == 'V'.toByte && buf.get() == '1'.toByte, "not a GMV1 container")
    val nf = buf.getInt
    val fp = buf.getInt
    require(nf > 0 && fp > 0, s"bad GMV1 header: nf=$nf fp=$fp")
    // table arithmetic in Long (the m6/m7 rule): a corrupt nf must not
    // wrap the table size into a plausible bound
    require(12L + 4L * nf <= bytes.length, s"index table overruns file (nf=$nf)")
    val offs = Array.fill(nf)(buf.getInt)
    (nf, fp, offs)
  }

  /** Seek-decode ONE frame's logical pixels out of a GMV1 container:
    * index lookup gives the frame's byte range, the embedded BMP decodes
    * from that slice alone — index + one ranged read, never the whole
    * object. */
  private[graft] def decodeVideoFrame(bytes: Array[Byte], k: Int): Array[Byte] = {
    val (nf, _, offs) = videoIndex(bytes)
    require(k >= 0 && k < nf, s"frame $k out of [0, $nf)")
    val end = if (k + 1 < nf) offs(k + 1) else bytes.length
    require(offs(k) >= 0 && offs(k) <= end && end <= bytes.length,
      s"frame $k byte range [${offs(k)}, $end) outside ${bytes.length}-byte file")
    decodeBmp(java.util.Arrays.copyOfRange(bytes, offs(k), end))
  }

  /** m9: codec-addressed frame sampling through a REAL indexed container
    * — m3's frame-sample shape upgraded the way m6 upgraded row access:
    * the doc's bytes become a GMV1 multi-frame container (an offset
    * index over per-frame BMPs), four evenly spaced frames are fetched
    * by index seek + ranged decode, and each decoded frame reports its
    * pixel count, integer-exact unsigned pixel sum, and the md5 of its
    * logical pixels (payload slice + the builder's zero fill). The
    * oracle recomputes all three from closed form; an index, offset,
    * slice, or stride bug lands the seek on the wrong bytes and breaks
    * sum and digest both. */
  def m9VideoFrameSample(spark: SparkSession, dir: String): DataFrame = {
    val out = StructType(Seq(
      StructField("media_id", LongType),
      StructField("frame_no", LongType),
      StructField("frame_idx", LongType),
      StructField("n_frames", LongType),
      StructField("px_sum", LongType),
      StructField("frame_md5", StringType)))
    val enc = org.apache.spark.sql.Encoders.row(out)
    Sources.table(spark, dir, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("data"))
      .mapPartitions { rows =>
        // digest instance init once per partition (the ProducerFinal.scala:66 move)
        val md = java.security.MessageDigest.getInstance("MD5")
        rows.flatMap { r =>
          val id = r.getLong(0)
          val video = buildVideo(id, r.getAs[Array[Byte]](1))
          val (nf, _, _) = videoIndex(video)
          (0 until VideoSampleCount).map { i =>
            val fi = i * (nf - 1) / (VideoSampleCount - 1)
            val px = decodeVideoFrame(video, fi)
            var sum = 0L
            px.foreach(b => sum += (b & 0xff))
            Row(id, i.toLong, fi.toLong, nf.toLong, sum, hexDigest(md, px))
          }
        }
      }(enc)
      .orderBy("media_id", "frame_no")
  }

  // ---- m10: audio thumbnail (nearest-neighbor resample) -------------

  /** Output sample count for m10's audio thumbnail — fixed-size output
    * regardless of source duration, m8's contract for audio. */
  val AudioThumb = 16

  /** Seek-decode a fixed [[AudioThumb]]-sample nearest-neighbor
    * "thumbnail" of a WAV's first channel: the chunk walk reads only
    * the headers, then frame index fi = k·nf/AudioThumb maps each
    * output slot to its source frame and ONLY that frame's first
    * 2-byte sample is touched (header-arithmetic ranged read — the
    * audio preview/downsample pass of a media pipeline, O(thumb)
    * bytes per object, never O(audio)). Returns (n_frames, signed
    * sample values in slot order). Offset math in Long first (the
    * m6/m7 rule). */
  private[graft] def decodeWavThumb(bytes: Array[Byte]): (Long, Array[Int]) =
    decodeWavThumbN(bytes, AudioThumb)

  /** [[decodeWavThumb]] at an explicit slot count — m14's fingerprint
    * reads [[WavHashSamples]] slots through the identical frame-map and
    * ranged-read law, so the two gates cannot drift on seek math. */
  private[graft] def decodeWavThumbN(bytes: Array[Byte], slots: Int): (Long, Array[Int]) = {
    val (meta, dataOff) = walkWav(bytes)
    val ba = (meta.nChannels * (meta.bitDepth / 8)).toInt
    val nf = meta.dataBytes / ba
    // a payload shorter than one block-align has no complete frame: the
    // defined result is an EMPTY thumbnail (nf = 0, zero slots), the
    // m11 philosophy — classify the degenerate container, never abort
    // the whole gate over one object
    if (nf < 1) return (0L, Array.emptyIntArray)
    val out = new Array[Int](slots)
    var k = 0
    while (k < slots) {
      // nearest-neighbor frame map: floor(k·nf/slots) < nf
      val fi = k.toLong * nf / slots
      val boff = dataOff.toLong + fi * ba
      require(boff >= 0 && boff + 2 <= bytes.length,
        s"slot $k byte range [$boff, ${boff + 2}) outside ${bytes.length}-byte file")
      val lo = java.lang.Byte.toUnsignedInt(bytes(boff.toInt))
      val hi = bytes(boff.toInt + 1).toInt // sign-carrying high byte
      out(k) = (hi << 8) | lo // signed 16-bit, first channel
      k += 1
    }
    (nf, out)
  }

  /** m10: nearest-neighbor audio resample through the real WAV codec —
    * the RESIZE leg for the audio family, completing the verb across
    * both codec families (m8 resizes images, m10 resizes audio): each
    * payload shrinks (or tiles up, when shorter than [[AudioThumb]]
    * frames) to a fixed [[AudioThumb]]-sample first-channel thumbnail
    * by integer frame mapping over header-arithmetic ranged reads.
    * The signed integer sample sum proves the decoder interprets
    * samples (endianness + two's complement), and the digest over the
    * read byte pairs pins the exact seek positions — a block-align,
    * frame-map, or channel-stride bug lands on the wrong bytes and
    * breaks both. The oracle recomputes every slot from closed form
    * (hex-nibble recovery at fi·blockAlign, LE pairing, sign fold);
    * thumbnail ≡ decimated-full-decode is property-tested. */
  def m10WavThumbnail(spark: SparkSession, dir: String): DataFrame = {
    val out = StructType(Seq(
      StructField("media_id", LongType),
      StructField("n_frames", LongType),
      StructField("thumb_n", LongType),
      StructField("sample_sum", LongType),
      StructField("thumb_md5", StringType)))
    val enc = org.apache.spark.sql.Encoders.row(out)
    Sources.table(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), col("text").cast("binary").as("data"))
      .mapPartitions { rows =>
        // digest instance init once per partition (the ProducerFinal.scala:66 move)
        val md = java.security.MessageDigest.getInstance("MD5")
        rows.map { r =>
          val id = r.getLong(0)
          val wav = buildWav(id, r.getString(1), r.getAs[Array[Byte]](2))
          val (nf, samples) = decodeWavThumb(wav)
          var sum = 0L
          samples.foreach(sum += _)
          // digest over the decoded byte pairs exactly as read (LE
          // order); a sub-frame payload yields the empty thumbnail —
          // zero slots, md5 of zero bytes — never an aborted gate
          val raw = new Array[Byte](2 * samples.length)
          var k = 0
          while (k < samples.length) {
            raw(2 * k) = (samples(k) & 0xff).toByte
            raw(2 * k + 1) = ((samples(k) >> 8) & 0xff).toByte
            k += 1
          }
          Row(id, nf, samples.length.toLong, sum, hexDigest(md, raw))
        }
      }(enc)
      .orderBy("media_id")
  }

  // ---- m11: malformed-container audit (the codec-layer O18 guard) ----

  /** m11's deterministic corruption rules — the stand-ins for what a
    * real 100 TB crawl actually contains: truncated uploads, wrong
    * magics, lying length fields. Both rules and their parser-visible
    * outcomes are closed-form in doc_id, so the oracle replays the
    * whole audit. */
  val CorruptMod = 17
  val BadMagicResidue = 5
  val OverrunResidue = 11

  /** Apply m11's corruption rule to a built WAV: residue
    * [[BadMagicResidue]] flips the first magic byte ('R' → 'X');
    * residue [[OverrunResidue]] inflates the data chunk's declared
    * size so it overruns the file; every other doc passes through
    * clean. Returns the (possibly corrupted) bytes. */
  private[graft] def corruptWav(docId: Long, wav: Array[Byte]): Array[Byte] = {
    val out = wav.clone()
    if (docId % CorruptMod == BadMagicResidue) {
      out(0) = 'X'.toByte
    } else if (docId % CorruptMod == OverrunResidue) {
      // the data chunk is the LAST chunk; its LE size field sits 8 bytes
      // before the payload — find it from the clean parse, then lie
      val dataLen = parseWav(wav).dataBytes.toInt
      val sizeOff = wav.length - dataLen - (dataLen % 2) - 4
      java.nio.ByteBuffer.wrap(out, sizeOff, 4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(dataLen + 1000000)
    }
    out
  }

  /** Classify one container through the REAL parser: 'ok' with its
    * data size, or the parser's stated rejection. The mapping is from
    * the parser's own failure messages — the audit reports what the
    * codec SAW, never what the corruption rule intended (a guard that
    * reports the rule instead of the parse is circular). */
  private[graft] def auditWav(bytes: Array[Byte]): (String, Long) =
    try { ("ok", parseWav(bytes).dataBytes) }
    catch {
      case e: IllegalArgumentException =>
        val msg = Option(e.getMessage).getOrElse("")
        val reason =
          if (msg.contains("not a RIFF container")) "bad_magic"
          else if (msg.contains("overruns file")) "overrun"
          else "other"
        (reason, 0L)
    }

  /** m11: the malformed-media audit — O18's malformed-record guard
    * applied at the CODEC layer, the first pass a 100 TB media crawl
    * runs before any decode work is scheduled: every container is
    * header-probed through the real parser, rejects are COUNTED AND
    * CLASSIFIED by the parser's own failure mode (wrong magic vs
    * lying length field), and the ledger reports, per outcome, the
    * doc count and the decodable byte mass. Corruption here is a
    * deterministic fixture rule ([[corruptWav]]) so the oracle
    * replays the audit in closed form — but the classification path
    * is the parser's, exercised on genuinely malformed bytes (the
    * reject branches m4's happy path never enters).
    *
    * Scale shape: one narrow header-probe map per object (the ~50-byte
    * ranged read of m7's story — rejects cost ONLY the probe, never a
    * fetch of the object body) and a 3-row ledger aggregation. The
    * audit is exactly as parallel as the scan. */
  def m11WavAudit(spark: SparkSession, dir: String): DataFrame = {
    val out = StructType(Seq(
      StructField("outcome", StringType),
      StructField("n_docs", LongType),
      StructField("data_bytes", LongType)))
    val enc = org.apache.spark.sql.Encoders.row(out)
    Sources.table(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), col("text").cast("binary").as("data"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val wav = corruptWav(id, buildWav(id, r.getString(1), r.getAs[Array[Byte]](2)))
          val (outcome, bytes) = auditWav(wav)
          Row(outcome, 1L, bytes)
        }
      }(enc)
      .groupBy("outcome")
      .agg(sum("n_docs").as("n_docs"), sum("data_bytes").as("data_bytes"))
      .orderBy("outcome")
  }

  /** m12's corruption modulus and residues — a different modulus from
    * m11's so the two audits corrupt different doc subsets (the two
    * codec guards are exercised independently). */
  val BmpCorruptMod = 19
  val BmpBadMagicResidue = 3
  val BmpOverrunResidue = 7

  /** Apply m12's corruption rule to a built BMP: residue
    * [[BmpBadMagicResidue]] flips the 'B' magic; residue
    * [[BmpOverrunResidue]] inflates the DIB header's declared image
    * size (LE u32 at byte 34) so the pixel array overruns the file. */
  private[graft] def corruptBmp(docId: Long, bmp: Array[Byte]): Array[Byte] = {
    val out = bmp.clone()
    if (docId % BmpCorruptMod == BmpBadMagicResidue) {
      out(0) = 'X'.toByte
    } else if (docId % BmpCorruptMod == BmpOverrunResidue) {
      val buf = java.nio.ByteBuffer.wrap(out)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.putInt(34, buf.getInt(34) + 1000000)
    }
    out
  }

  /** Classify one BMP through the REAL parser — m11's audit kernel for
    * the second codec family (fixed strided headers vs RIFF's walked
    * chunks): 'ok' with the logical pixel count, or the parser's own
    * stated rejection. */
  private[graft] def auditBmp(bytes: Array[Byte]): (String, Long) =
    try { val m = parseBmp(bytes); ("ok", m.width * m.height) }
    catch {
      case e: IllegalArgumentException =>
        val msg = Option(e.getMessage).getOrElse("")
        val reason =
          if (msg.contains("not a BMP")) "bad_magic"
          else if (msg.contains("overruns file")) "overrun"
          else "other"
        (reason, 0L)
    }

  /** m12: m11's malformed-media audit applied to the SECOND codec
    * family — the guard's classification logic proven against a
    * structurally different container (fixed LE headers + declared
    * offsets vs RIFF's chunk walk), with a different corruption subset
    * (mod [[BmpCorruptMod]]), so the two audits cannot pass by
    * accident of shared layout. Ledger: per parser outcome, doc count
    * and total LOGICAL pixel mass of decodable images. Oracle replays
    * the corruption rule's closed form (pixel mass = width × height
    * with width from doc_id and height from the byte count per the
    * stride build rule).
    *
    * Scale shape: identical to m11 — one narrow header-probe map per
    * object, a reject costs only the probe, and the ledger aggregation
    * is 3 rows. */
  def m12BmpAudit(spark: SparkSession, dir: String): DataFrame = {
    val out = StructType(Seq(
      StructField("outcome", StringType),
      StructField("n_docs", LongType),
      StructField("px_total", LongType)))
    val enc = org.apache.spark.sql.Encoders.row(out)
    Sources.table(spark, dir, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("data"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val bmp = corruptBmp(id, buildBmp(id, r.getAs[Array[Byte]](1)))
          val (outcome, px) = auditBmp(bmp)
          Row(outcome, 1L, px)
        }
      }(enc)
      .groupBy("outcome")
      .agg(sum("n_docs").as("n_docs"), sum("px_total").as("px_total"))
      .orderBy("outcome")
  }

  // ---- m13: image near-dup via average-hash --------------------------

  /** m13 banding geometry: the 64-bit aHash splits into [[AHashBands]]
    * bands of [[AHashBandBits]] bits; pairs sharing any band value are
    * candidates (pigeonhole: every pair within Hamming 3 is guaranteed
    * to share a band — pairs beyond that are found when the banding
    * collides, d5's declared approximate-with-replayed-banding
    * semantics). [[AHashDfMax]] is d2's df discipline on the band key:
    * a band value hotter than this (the all-ones band every saturated
    * thumbnail shares — the one value whose bucket grows WITH the
    * corpus) is dropped from candidate generation, oracle-mirrored, so
    * candidate cost stays Σ bounded-bucket² instead of going quadratic
    * on the hot value. [[AHashHamMax]] is the verify threshold. */
  val AHashBands = 4
  val AHashBandBits = 16
  val AHashDfMax = 100L
  val AHashHamMax = 10L

  /** The per-image aHash bands through the REAL codec path: m8's
    * seek-decoded 8×8 thumbnail → integer mean → bit p set iff
    * pixel p > mean → [[AHashBands]] × [[AHashBandBits]]-bit band
    * values. One narrow map, one row per image. */
  private def ahashBands(spark: SparkSession, dir: String): DataFrame =
    ahashBandsFrom(Sources.table(spark, dir, "documents"))

  /** [[ahashBands]] over an arbitrary `(doc_id, text)` frame — the seam
    * m15's streaming replay fingerprints each ARRIVING micro-batch
    * through (the expensive codec map runs exactly once per object;
    * only the narrow fingerprint rows are ever re-read). Identical
    * math by construction: the dir-reading form above delegates here. */
  private[graft] def ahashBandsFrom(docs: DataFrame): DataFrame = {
    val out = StructType(
      StructField("media_id", LongType) +:
        (0 until AHashBands).map(k => StructField(s"b$k", LongType)))
    val enc = org.apache.spark.sql.Encoders.row(out)
    docs
      .select(col("doc_id"), col("text").cast("binary").as("data"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val thumb = decodeBmpThumb(buildBmp(id, r.getAs[Array[Byte]](1)))
          var lum = 0L
          thumb.foreach(b => lum += (b & 0xff))
          val mean = lum / (ThumbW * ThumbH)
          val vals = (0 until AHashBands).map { k =>
            var bv = 0L
            var j = 0
            while (j < AHashBandBits) {
              if ((thumb(k * AHashBandBits + j) & 0xff) > mean) bv |= 1L << j
              j += 1
            }
            bv
          }
          Row.fromSeq(id +: vals)
        }
      }(enc)
  }

  /** m13 image near-dup: the d-family's dedup discipline applied to the
    * MULTIMODAL column — perceptual average-hash (aHash) fingerprints
    * through m8's real BMP codec, banded LSH candidates, exact Hamming
    * verify at ≤ [[AHashHamMax]]. This is the image-corpus twin of d3
    * (MinHash bands → verify) and d5 (sign-LSH bands → verify): the
    * fingerprint is perceptual (a thumbnail bit flips only when a
    * pixel crosses the image's own mean), candidates meet on a bounded
    * equi-join key, and the oracle replays the identical pixel math,
    * banding, df cap, and verify in closed form — any codec, stride,
    * mean, or bit-order bug lands on different pairs.
    *
    * Scale shape: one narrow codec map per image (O(thumb) ranged
    * reads, the m8 law), a 4-rows-per-image band explode, the df-
    * capped (band, value) equi-join (never all-pairs), and a verify
    * join that moves only 5-column fingerprint rows — never pixels.
    * The one growing-bucket hazard (the saturated all-ones band) is
    * exactly what [[AHashDfMax]] drops. */
  def m13BmpNearDup(spark: SparkSession, dir: String): DataFrame =
    bandedHammingPairs(ahashBands(spark, dir))

  /** The banded near-dup chain over ANY [[AHashBands]]-band fingerprint
    * frame (media_id, b0..b{n-1}) — the ONE source for the discipline
    * both perceptual-hash gates share (m13 image aHash, m14 audio
    * sample-hash): band explode, df cap on the (band, value) key, the
    * capped equi-join candidate generation, and the exact
    * `bit_count(xor)` Hamming verify at ≤ [[AHashHamMax]]. An edit to
    * the banding discipline changes both gates together, never one.
    * `private[graft]` for m15's streaming replay, which re-derives the
    * pair set per micro-batch over the arrived fingerprint store
    * through this exact chain — stream ≡ batch as shared code, then
    * re-proven against the shared oracle string. */
  private[graft] def bandedHammingPairs(fp: DataFrame): DataFrame = {
    val bands = explodeBands(fp)
    val okBands = bands.groupBy("bi", "bv")
      .agg(count(lit(1)).as("df"))
      .filter(col("df") <= AHashDfMax)
      .select("bi", "bv")
    val capped = bands.join(okBands, Seq("bi", "bv"))
    val cand = capped.as("x").join(capped.as("y"),
        col("x.bi") === col("y.bi") && col("x.bv") === col("y.bv") &&
          col("x.media_id") < col("y.media_id"))
      .select(col("x.media_id").as("a_id"), col("y.media_id").as("b_id"))
      .distinct()
    hammingVerify(cand, fp).orderBy("a_id", "b_id")
  }

  /** The band explode the candidate chain keys on — (media_id, bi, bv),
    * [[AHashBands]] rows per fingerprint. Factored out of
    * [[bandedHammingPairs]] so m15's INCREMENTAL per-batch chain uses
    * the identical band geometry (stream ≡ batch as shared code).
    * `keep` rides extra columns through unchanged (m15 tags each store
    * row with its batch membership so ONE scan feeds batch bands, store
    * bands, and the df/delta aggregation). */
  private[graft] def explodeBands(fp: DataFrame, keep: Seq[String] = Nil): DataFrame = {
    val bandCols = (0 until AHashBands).map { k =>
      struct(lit(k.toLong).as("bi"), col(s"b$k").as("bv"))
    }
    fp.select(col("media_id") +: keep.map(col) :+
        explode(array(bandCols: _*)).as("band"): _*)
      .select(col("media_id") +: keep.map(col) :+
        col("band.bi") :+ col("band.bv"): _*)
  }

  /** The exact `bit_count(xor)` Hamming verify at ≤ [[AHashHamMax]]
    * over normalized (a_id < b_id) candidate rows, fingerprints fetched
    * by id from `fp` — only 5-column fingerprint rows shuffle, never
    * pixels. Shared by [[bandedHammingPairs]] and m15's incremental
    * per-batch additions, so the verify rule cannot drift between the
    * batch and streaming chains. */
  private[graft] def hammingVerify(cand: DataFrame, fp: DataFrame): DataFrame = {
    val a = fp.select(col("media_id").as("a_id") +:
      (0 until AHashBands).map(k => col(s"b$k").as(s"a$k")): _*)
    val b = fp.select(col("media_id").as("b_id") +:
      (0 until AHashBands).map(k => col(s"b$k").as(s"bb$k")): _*)
    val ham = (0 until AHashBands)
      .map(k => bit_count(col(s"a$k").bitwiseXOR(col(s"bb$k"))).cast("long"))
      .reduce(_ + _)
    cand.join(a, "a_id").join(b, "b_id")
      .withColumn("hamming", ham)
      .filter(col("hamming") <= AHashHamMax)
      .select(col("a_id"), col("b_id"), col("hamming"))
  }

  // ---- m14: audio near-dup via sample-hash ---------------------------

  /** Fingerprint width for m14 — [[AHashBands]] × [[AHashBandBits]]
    * sample slots, so the audio hash packs into the same 4 × 16-bit
    * band geometry as m13's image aHash and rides [[bandedHammingPairs]]
    * unchanged. */
  val WavHashSamples: Int = AHashBands * AHashBandBits

  /** The per-payload audio-hash bands through the REAL codec path:
    * [[decodeWavThumbN]]'s seek-decoded [[WavHashSamples]]-slot
    * first-channel thumbnail (header-arithmetic ranged reads — never
    * the full data chunk) → TRUNCATING integer mean over the signed
    * samples (JVM `/`, matching DuckDB's integer `//` which truncates
    * toward zero on negatives — measured, not assumed: -7 // 2 = -3;
    * a floorDiv here would diverge on negative sums) → bit j set
    * iff sample j > mean → [[AHashBands]] × [[AHashBandBits]]-bit band
    * values. Payloads with no complete frame (nf = 0) carry no
    * fingerprint — the m11 philosophy, classify-don't-abort. */
  private def whashBands(spark: SparkSession, dir: String): DataFrame =
    whashBandsFrom(Sources.table(spark, dir, "documents"))

  /** [[whashBands]] over an arbitrary `(doc_id, lang, text)` frame —
    * m18's streaming seam, the [[ahashBandsFrom]] move on the audio
    * fingerprint (lang rides along because [[buildWav]]'s container
    * derives its header from it). Identical math by construction. */
  private[graft] def whashBandsFrom(docs: DataFrame): DataFrame = {
    val out = StructType(
      StructField("media_id", LongType) +:
        (0 until AHashBands).map(k => StructField(s"b$k", LongType)))
    val enc = org.apache.spark.sql.Encoders.row(out)
    docs
      .select(col("doc_id"), col("lang"), col("text").cast("binary").as("data"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          val wav = buildWav(id, r.getString(1), r.getAs[Array[Byte]](2))
          val (nf, samples) = decodeWavThumbN(wav, WavHashSamples)
          if (nf < 1) None
          else {
            var sum = 0L
            samples.foreach(sum += _)
            val mean = sum / WavHashSamples
            val vals = (0 until AHashBands).map { k =>
              var bv = 0L
              var j = 0
              while (j < AHashBandBits) {
                if (samples(k * AHashBandBits + j) > mean) bv |= 1L << j
                j += 1
              }
              bv
            }
            Some(Row.fromSeq(id +: vals))
          }
        }
      }(enc)
  }

  /** m14 audio near-dup: m13's perceptual-hash dedup discipline applied
    * to the SECOND codec family — completing the near-dup verb across
    * both containers exactly as m11/m12 completed the audit verb: the
    * fingerprint is perceptual over decoded SIGNED samples (a bit flips
    * only when a sample crosses the payload's own mean), reads
    * O([[WavHashSamples]]) bytes per object through the RIFF chunk walk
    * + frame-map ranged reads (the m7/m10 law — never the full data
    * chunk), and the candidate/verify chain is [[bandedHammingPairs]]
    * verbatim. The oracle replays the whole chain in closed form —
    * slot seeks at fi·blockAlign, hex-nibble LE recovery,
    * two's-complement sign fold, floor-division mean, bit rule,
    * banding, df cap, Hamming — so an endianness, block-align, sign,
    * or rounding bug lands on different pairs.
    *
    * Scale shape: one narrow codec map per object, then m13's bounded
    * chain — the df cap drops the one corpus-growing band value (the
    * all-zeros band of near-silent payloads, the audio twin of m13's
    * saturated band). */
  def m14WavNearDup(spark: SparkSession, dir: String): DataFrame =
    bandedHammingPairs(whashBands(spark, dir))

  // ---- m17: consensus near-dup across both perceptual channels -------

  /** m17 consensus near-dup: d13's consensus verb on the MEDIA family —
    * pairs flagged by either perceptual channel, with provenance. The
    * two channels are genuinely independent evidence over the same
    * object bytes: m13 reads them through the BMP pixel walk (spatial
    * downsample → luma mean bits), m14 through the RIFF chunk walk
    * (strided sample seeks → signed mean bits) — different containers,
    * different arithmetic, different failure modes. A pair both
    * channels flag (`channel = 'both'`) is the high-confidence dedup
    * verdict a production pipeline acts on without human review; a
    * single-channel pair is the review queue. Byte-identical payloads
    * are hamming-0 in BOTH channels by construction, so the fixture's
    * exact twins pin the 'both' row class.
    *
    * Scale shape: the two chains are the already-bounded m13/m14 plans
    * (df-capped band equi-joins); the consensus itself is one
    * full-outer join of two OUTPUT-sized pair sets on (a_id, b_id) —
    * near-dup density, never corpus-sized. Oracle = m13's chain ⋈full
    * m14's chain by construction (the d13 nested-WITH move). */
  def m17ConsensusNearDup(spark: SparkSession, dir: String): DataFrame = {
    val img = m13BmpNearDup(spark, dir)
      .withColumnRenamed("hamming", "img_hamming")
    val aud = m14WavNearDup(spark, dir)
      .withColumnRenamed("hamming", "aud_hamming")
    img.join(aud, Seq("a_id", "b_id"), "full_outer")
      .select(col("a_id"), col("b_id"),
        when(col("img_hamming").isNotNull && col("aud_hamming").isNotNull, "both")
          .when(col("img_hamming").isNotNull, "image")
          .otherwise("audio").as("channel"),
        coalesce(col("img_hamming"), lit(-1L)).as("img_hamming"),
        coalesce(col("aud_hamming"), lit(-1L)).as("aud_hamming"))
      .orderBy("a_id", "b_id")
  }

  /** m1: metadata + content-hash projection over the media table —
    * the oracle-checkable slice of the multimodal path. */
  def m1MultimodalMeta(spark: SparkSession, dir: String): DataFrame =
    asMedia(Sources.table(spark, dir, "documents"))
      .select(
        col("media_id"),
        col("meta.mime").as("mime"),
        col("meta.byte_len").as("byte_len"),
        lower(hex(substring(col("payload"), 1, 8))).as("head_hex"),
        md5(col("payload")).as("content_md5"))
      .orderBy("media_id")
}
