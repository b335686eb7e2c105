package graft

import org.scalacheck.Prop.forAll
import org.scalacheck.{Gen, Properties}

import graft.ops.MultimodalOps

/** Scalacheck properties over the pure (non-Spark) kernels. */
object DecodeProps extends Properties("byteHistogram") {

  private val bytesGen: Gen[Array[Byte]] =
    Gen.containerOf[Array, Byte](Gen.choose(Byte.MinValue, Byte.MaxValue))

  property("emits 8 non-negative bins") = forAll(bytesGen) { bs =>
    val h = MultimodalOps.byteHistogram(bs)
    h.length == 8 && h.forall(_ >= 0.0)
  }

  property("bins sum to 1 for non-empty payloads") = forAll(bytesGen) { bs =>
    bs.isEmpty || math.abs(MultimodalOps.byteHistogram(bs).sum - 1.0) < 1e-9
  }

  property("is deterministic") = forAll(bytesGen) { bs =>
    MultimodalOps.byteHistogram(bs).sameElements(MultimodalOps.byteHistogram(bs))
  }

  property("bin index covers the full byte range") = forAll(bytesGen) { bs =>
    // every byte lands in exactly one bin: total mass equals count/n
    val h = MultimodalOps.byteHistogram(bs)
    val n = math.max(bs.length, 1)
    math.abs(h.sum - bs.length.toDouble / n) < 1e-9
  }
}

/** The m4 WAV codec: the parser must recover exactly what the builder
  * encoded, across odd/even chunk lengths (RIFF pad-byte rule) and any
  * payload contents — and reject non-RIFF bytes instead of misreading. */
object WavCodecProps extends Properties("wavCodec") {

  private val bytesGen: Gen[Array[Byte]] =
    Gen.containerOf[Array, Byte](Gen.choose(Byte.MinValue, Byte.MaxValue))
  private val langGen: Gen[String] =
    Gen.oneOf("en", "es", "de", "fr", "und", "x", "pt-BR")
  private val idGen: Gen[Long] = Gen.choose(0L, 1000000L)

  property("parse inverts build for every field") =
    forAll(idGen, langGen, bytesGen) { (id, lang, data) =>
      val m = MultimodalOps.parseWav(MultimodalOps.buildWav(id, lang, data))
      val ch = MultimodalOps.wavChannels(id).toLong
      val rate = MultimodalOps.wavRate(id).toLong
      m.nChannels == ch && m.sampleRate == rate && m.bitDepth == 16L &&
        m.dataBytes == data.length.toLong &&
        m.durationMs == data.length.toLong * 1000L / (rate * ch * 2L)
    }

  property("total file length follows the RIFF size field + 8") =
    forAll(idGen, langGen, bytesGen) { (id, lang, data) =>
      val wav = MultimodalOps.buildWav(id, lang, data)
      val le = java.nio.ByteBuffer.wrap(wav, 4, 4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt
      wav.length == le + 8
    }

  property("rejects payloads without the RIFF magic") = forAll(bytesGen) { bs =>
    bs.length >= 4 && bs.startsWith("RIFF".getBytes("US-ASCII")) ||
      scala.util.Try(MultimodalOps.parseWav(bs)).isFailure
  }

  property("decode recovers exactly the encoded samples") =
    forAll(idGen, langGen, bytesGen) { (id, lang, data) =>
      MultimodalOps.decodeWav(MultimodalOps.buildWav(id, lang, data))
        .sameElements(data)
    }

  property("window seek-decode energy equals the full-decode energy, any window") =
    forAll(idGen, langGen, bytesGen) { (id, lang, data) =>
      // the ranged path (header probe + window byte range) must agree
      // with the trusted full decode sliced the same way — any seek,
      // block-align, endianness, or sign slip diverges
      val wav = MultimodalOps.buildWav(id, lang, data)
      val full = MultimodalOps.decodeWav(wav)
      val ch = MultimodalOps.wavChannels(id)
      val ba = ch * 2
      val nf = full.length / ba
      (0 until MultimodalOps.WinCount).forall { i =>
        val (start, ns, energy) = MultimodalOps.wavWindowEnergy(wav, i)
        val expStart = i.toLong * math.max(nf - MultimodalOps.WinFrames, 0) /
          (MultimodalOps.WinCount - 1)
        val expNs = math.min(MultimodalOps.WinFrames.toLong, nf - expStart) * ch
        val expEnergy = (0L until expNs).map { j =>
          val o = (expStart * ba + 2 * j).toInt
          val v = (full(o + 1).toInt << 8) | java.lang.Byte.toUnsignedInt(full(o))
          v.toLong * v
        }.sum
        start == expStart && ns == expNs && energy == expEnergy
      }
    }

  property("thumbnail seek-decode equals the decimated full decode, any payload") =
    forAll(idGen, langGen, bytesGen) { (id, lang, data) =>
      // m10's ranged path (header probe + one 2-byte read per slot) must
      // agree with the trusted full decode decimated by the same integer
      // frame map — a block-align, frame-map, or channel-stride slip
      // lands on the wrong sample
      val wav = MultimodalOps.buildWav(id, lang, data)
      val full = MultimodalOps.decodeWav(wav)
      val ba = MultimodalOps.wavChannels(id) * 2
      val nf = full.length / ba
      if (nf < 1) {
        // sub-frame payloads decode to the DEFINED empty thumbnail
        // (nf = 0, zero slots) — classified, never an abort
        val (gotNf, got) = MultimodalOps.decodeWavThumb(wav)
        gotNf == 0L && got.isEmpty
      } else {
        val (gotNf, got) = MultimodalOps.decodeWavThumb(wav)
        gotNf == nf.toLong && got.length == MultimodalOps.AudioThumb &&
          (0 until MultimodalOps.AudioThumb).forall { k =>
            val o = (k.toLong * nf / MultimodalOps.AudioThumb).toInt * ba
            got(k) == ((full(o + 1).toInt << 8) | java.lang.Byte.toUnsignedInt(full(o)))
          }
      }
    }
}

/** The m5 BMP codec: strided bottom-up rows must invert exactly — a
  * stride or row-flip bug shows up as byte misplacement — and every
  * parsed field must match its closed form. */
object BmpCodecProps extends Properties("bmpCodec") {
  import graft.ops.MultimodalOps

  private val bytesGen: Gen[Array[Byte]] =
    Gen.containerOf[Array, Byte](Gen.choose(Byte.MinValue, Byte.MaxValue))
  private val idGen: Gen[Long] = Gen.choose(0L, 1000000L)

  property("parse inverts build for every field") =
    forAll(idGen, bytesGen) { (id, data) =>
      val m = MultimodalOps.parseBmp(MultimodalOps.buildBmp(id, data))
      val w = MultimodalOps.bmpWidth(id).toLong
      val h = math.max((data.length + w - 1) / w, 1)
      val stride = (w + 3) & ~3L
      m.width == w && m.height == h && m.bpp == 8L &&
        m.stride == stride && m.imageSize == stride * h &&
        m.fileSize == 14L + 40L + 1024L + stride * h &&
        m.pixelSum == data.map(java.lang.Byte.toUnsignedInt(_).toLong).sum
    }

  property("decode recovers the logical pixels: data then zero fill") =
    forAll(idGen, bytesGen) { (id, data) =>
      val px = MultimodalOps.decodeBmp(MultimodalOps.buildBmp(id, data))
      val w = MultimodalOps.bmpWidth(id)
      val h = math.max((data.length + w - 1) / w, 1)
      px.length == w * h &&
        px.take(data.length).sameElements(data) &&
        px.drop(data.length).forall(_ == 0)
    }

  property("rejects payloads without the BM magic") = forAll(bytesGen) { bs =>
    bs.length >= 2 && bs(0) == 'B'.toByte && bs(1) == 'M'.toByte ||
      scala.util.Try(MultimodalOps.parseBmp(bs)).isFailure
  }

  property("row seek-decode returns exactly the logical row, any row") =
    forAll(idGen, bytesGen) { (id, data) =>
      val bmp = MultimodalOps.buildBmp(id, data)
      val w = MultimodalOps.bmpWidth(id)
      val h = math.max((data.length + w - 1) / w, 1)
      (0 until h).forall { r =>
        val expect = Array.tabulate[Byte](w) { c =>
          val idx = r * w + c
          if (idx < data.length) data(idx) else 0.toByte
        }
        MultimodalOps.decodeBmpRow(bmp, r).sameElements(expect)
      }
    }

  property("thumbnail seek-decode equals nearest-neighbor over the full decode") =
    forAll(idGen, bytesGen) { (id, data) =>
      // the ranged path (header probe + per-row seeks) must agree with
      // the trusted full decode sampled by the same floor-index map —
      // a row-map, column-map, or bottom-up-flip slip diverges
      val bmp = MultimodalOps.buildBmp(id, data)
      val full = MultimodalOps.decodeBmp(bmp)
      val w = MultimodalOps.bmpWidth(id)
      val h = math.max((data.length + w - 1) / w, 1)
      val tw = MultimodalOps.ThumbW; val th = MultimodalOps.ThumbH
      val expect = Array.tabulate[Byte](tw * th) { p =>
        val ri = (p / tw) * h / th
        val ci = (p % tw) * w / tw
        full(ri * w + ci)
      }
      MultimodalOps.decodeBmpThumb(bmp).sameElements(expect)
    }
}

/** The m9 GMV1 container: index-addressed frame seeks must recover
  * exactly the per-frame payload slices (plus the embedded BMP's zero
  * fill), for every frame of arbitrary payloads. */
object VideoCodecProps extends Properties("videoCodec") {
  import graft.ops.MultimodalOps

  private val bytesGen: Gen[Array[Byte]] =
    Gen.containerOf[Array, Byte](Gen.choose(Byte.MinValue, Byte.MaxValue))
  private val idGen: Gen[Long] = Gen.choose(0L, 1000000L)

  property("index counts frames per the payload budget") =
    forAll(idGen, bytesGen) { (id, data) =>
      val (nf, fp, offs) = MultimodalOps.videoIndex(MultimodalOps.buildVideo(id, data))
      fp == MultimodalOps.VideoFramePayload &&
        nf == math.max((data.length + fp - 1) / fp, 1) &&
        offs.length == nf && offs.head == 12 + 4 * nf
    }

  property("frame seek-decode recovers slice then zero fill, any frame") =
    forAll(idGen, bytesGen) { (id, data) =>
      val video = MultimodalOps.buildVideo(id, data)
      val (nf, fp, _) = MultimodalOps.videoIndex(video)
      val w = MultimodalOps.bmpWidth(id)
      (0 until nf).forall { k =>
        val lo = math.min(k * fp, data.length)
        val slice = data.slice(lo, math.min(lo + fp, data.length))
        val h = math.max((slice.length + w - 1) / w, 1)
        val expect = slice ++ Array.fill[Byte](w * h - slice.length)(0)
        MultimodalOps.decodeVideoFrame(video, k).sameElements(expect)
      }
    }

  property("rejects payloads without the GMV1 magic") = forAll(bytesGen) { bs =>
    bs.length >= 4 && bs.startsWith("GMV1".getBytes("US-ASCII")) ||
      scala.util.Try(MultimodalOps.videoIndex(bs)).isFailure
  }
}
