package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.io.Sources

/** Multimodal-column plumbing: media payloads travel as opaque `binary`
  * columns with a typed metadata struct; decode / feature-extraction runs
  * batched per partition.
  *
  * The container ships no image/audio codecs, so `fakeDecode` stands in
  * for the real decoder — a deterministic byte-level featurizer with the
  * same Spark-side contract (binary in, fixed-width feature vector +
  * metadata out). Swapping in a real codec changes ONE function; the
  * schema, batching, and partitioning stay as tested here.
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

  /** Deterministic stand-in for a media decoder: 8-bin byte histogram,
    * normalized. Real pipelines put the codec here, still batched
    * per-partition so codec init cost amortizes (cf. the per-partition
    * producer pattern at reference ProducerFinal.scala:66). */
  def fakeDecode(payload: Array[Byte]): Array[Double] = {
    val bins = new Array[Double](8)
    payload.foreach(b => bins((b & 0xff) / 32) += 1.0)
    val n = math.max(payload.length, 1)
    bins.map(_ / n)
  }

  /** Batched per-partition "decode" producing feature vectors. */
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
        val payload = r.getAs[Array[Byte]]("payload")
        val meta = r.getAs[Row]("meta")
        Row(r.getLong(0), meta.getString(0), meta.getLong(1), fakeDecode(payload))
      }
    }(enc)
  }

  /** m2: the decode path end-to-end, oracle-checkable — runs the
    * per-partition batched "decoder" (`decodeFeatures`/`fakeDecode`) and
    * projects the 8-bin normalized byte histogram to columns. The DuckDB
    * oracle recomputes the same histogram from the UTF-8 bytes, so the
    * whole mapPartitions plumbing (schema, encoder, batching) is
    * hash-checked, not just the metadata slice. */
  def m2DecodeHistogram(spark: SparkSession, dir: String): DataFrame = {
    val feats = decodeFeatures(spark,
      asMedia(Sources.table(spark, dir, "documents")))
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
