package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Deterministic property sampling over scalacheck generators
  * (org.scalatestplus bridge is not in the offline cache, so properties
  * are checked by seeded exhaustive sampling instead).
  */
trait GenSampling {
  def forAllSamples[A](gen: Gen[A], n: Int = 100)(f: A => Unit): Unit =
    (0 until n).foreach { i =>
      f(gen.pureApply(Gen.Parameters.default, Seed(i.toLong)))
    }

  def forAllSamples2[A, B](ga: Gen[A], gb: Gen[B], n: Int = 100)(f: (A, B) => Unit): Unit =
    (0 until n).foreach { i =>
      f(
        ga.pureApply(Gen.Parameters.default, Seed(i.toLong)),
        gb.pureApply(Gen.Parameters.default, Seed(i.toLong + 10000))
      )
    }
}
