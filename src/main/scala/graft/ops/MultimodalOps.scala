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
