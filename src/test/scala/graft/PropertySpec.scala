package graft

import org.scalacheck.Prop.forAll
import org.scalacheck.{Gen, Properties}

import graft.ops.MultimodalOps

/** Scalacheck properties over the pure (non-Spark) kernels. */
object DecodeProps extends Properties("fakeDecode") {

  private val bytesGen: Gen[Array[Byte]] =
    Gen.containerOf[Array, Byte](Gen.choose(Byte.MinValue, Byte.MaxValue))

  property("emits 8 non-negative bins") = forAll(bytesGen) { bs =>
    val h = MultimodalOps.fakeDecode(bs)
    h.length == 8 && h.forall(_ >= 0.0)
  }

  property("bins sum to 1 for non-empty payloads") = forAll(bytesGen) { bs =>
    bs.isEmpty || math.abs(MultimodalOps.fakeDecode(bs).sum - 1.0) < 1e-9
  }

  property("is deterministic") = forAll(bytesGen) { bs =>
    MultimodalOps.fakeDecode(bs).sameElements(MultimodalOps.fakeDecode(bs))
  }

  property("bin index covers the full byte range") = forAll(bytesGen) { bs =>
    // every byte lands in exactly one bin: total mass equals count/n
    val h = MultimodalOps.fakeDecode(bs)
    val n = math.max(bs.length, 1)
    math.abs(h.sum - bs.length.toDouble / n) < 1e-9
  }
}
