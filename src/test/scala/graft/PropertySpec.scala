package graft

import graft.operators.Transforms
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** ScalaCheck-generator property suite (FIXTURES.md §5): for generated
  * positive trend+seasonal+noise series, revert(transform(y)) == y within
  * 1e-8. Uses Gen directly with fixed seeds (no scalatest bridge in the
  * offline cache), so failures are reproducible. */
class PropertySpec extends SparkSpec {

  val seriesGen: Gen[Seq[Double]] = for {
    n     <- Gen.choose(30, 60)
    base  <- Gen.choose(50.0, 500.0)
    slope <- Gen.choose(-0.5, 2.0)
    amp   <- Gen.choose(0.0, 20.0)
    seed  <- Gen.choose(0, 1000)
  } yield (0 until n).map { t =>
    math.max(1.0,
      base + slope * t + amp * math.sin(2 * math.Pi * (t % 12) / 12.0)
        + (((t * 37 + seed) % 13) - 6) * 0.5)
  }

  private def roundTrips(ys: Seq[Double]): Unit = {
    val df = obsSeries(ys)
    val transforms = Seq(
      Transforms.logT(df), Transforms.sqrtT(df), Transforms.scaleT(df),
      Transforms.minmaxT(df), Transforms.diffT(df, 1), Transforms.diffT(df, 12),
      Transforms.detrendLinearT(df), Transforms.boxcoxMleT(df))
    transforms.foreach { t =>
      val back = col1(t.revert(t.transform(df)), "y")
      ys.zip(back).foreach { case (a, b) =>
        assert(math.abs(a - b) < 1e-8, s"round trip broke: $a vs $b")
      }
    }
  }

  test("∀ generated series: revert∘transform == id for all transform pairs") {
    (1 to 5).foreach { i =>
      val ys = seriesGen(Gen.Parameters.default, Seed(42L + i)).get
      roundTrips(ys)
    }
  }
}
