package graft

import graft.expressions.MinHash
import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck properties for the pure (non-Spark) parts of the MinHash
  * machinery — the universal hash family that LSH correctness rests on. */
object MinHashProps extends Properties("MinHash") {

  property("family: a odd, a/b in [0, 2^31), pairwise distinct") =
    Prop.forAll(Gen.choose(1, 256)) { n =>
      val fam = MinHash.hashFamily(n)
      fam.forall { case (a, b) =>
        a % 2 == 1 && a > 0 && a < MinHash.M31 + 1 &&
          b >= 0 && b <= MinHash.M31
      } && fam.distinct.length == n
    }

  property("h_i(x) stays in [0, M31) and permutes (injective on samples)") =
    Prop.forAll(Gen.choose(0L, MinHash.M31 - 1),
      Gen.choose(0, 63)) { (x, i) =>
      val (a, b) = MinHash.hashFamily(64)(i)
      val v = (a * x + b) % MinHash.M31
      v >= 0 && v < MinHash.M31
    }

  property("distinct inputs map to distinct outputs under one h_i") =
    Prop.forAll(Gen.listOfN(50, Gen.choose(0L, MinHash.M31 - 1))) { xs =>
      val (a, b) = MinHash.hashFamily(1).head
      val d = xs.distinct
      d.map(x => (a * x + b) % MinHash.M31).distinct.length == d.length
    }
}
