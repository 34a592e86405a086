package graft

import org.scalacheck.{Prop, Test => ScTest}
import org.scalatest.Assertions

/** Minimal scalatest<->scalacheck bridge (the scalatestplus artifact is not
  * in the offline cache): run a Prop with a fixed seed and assert it passed. */
object PropHelper extends Assertions {
  def check(prop: Prop, minTests: Int = 100): Unit = {
    val params = ScTest.Parameters.default
      .withMinSuccessfulTests(minTests)
      .withInitialSeed(org.scalacheck.rng.Seed(42L))
    val result = ScTest.check(params, prop)
    assert(result.passed, s"property failed: ${result.status}")
  }
}
