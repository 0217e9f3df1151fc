package graft.forecast

import breeze.linalg.{DenseMatrix, DenseVector}
import org.scalatest.funsuite.AnyFunSuite

class LinAlgSpec extends AnyFunSuite {

  test("Jacobi eigSym reproduces A = V diag(w) V' with orthonormal V, sorted values") {
    val rng = new scala.util.Random(31)
    val b = DenseMatrix.tabulate(12, 12)((_, _) => rng.nextGaussian())
    val a = b * b.t // SPD
    val (w, v) = LinAlg.eigSym(a)
    assert((1 until 12).forall(i => w(i - 1) >= w(i))) // descending
    assert(w.toArray.forall(_ > -1e-9))
    val recon = v * breeze.linalg.diag(w) * v.t
    val errR = breeze.linalg.max(breeze.numerics.abs(recon - a))
    assert(errR < 1e-9, s"recon err $errR")
    val gram = v.t * v
    val errO = breeze.linalg.max(breeze.numerics.abs(gram - DenseMatrix.eye[Double](12)))
    assert(errO < 1e-10, s"orthonormality err $errO")
  }

  test("solveSpd matches the exact solution on a well-posed system and survives singular ones") {
    val rng = new scala.util.Random(7)
    val b = DenseMatrix.tabulate(8, 8)((_, _) => rng.nextGaussian())
    val a = b * b.t + DenseMatrix.eye[Double](8) * 0.1
    val xTrue = DenseVector.tabulate(8)(i => (i + 1).toDouble)
    val x = LinAlg.solveSpd(a, a * xTrue)
    assert(breeze.linalg.max(breeze.numerics.abs(x - xTrue)) < 1e-8)
    // rank-deficient: ridge kicks in, finite answer, no throw
    val ones = DenseMatrix.fill(4, 4)(1.0)
    val xs = LinAlg.solveSpd(ones, DenseVector(1.0, 1.0, 1.0, 1.0))
    assert(xs.toArray.forall(v => !v.isNaN && !v.isInfinite))
  }

  test("nelderMead escapes a 0.0-start coordinate that is flat to first order") {
    // double well (x²−1)²: gradient is exactly 0 at the x=0 start, so a
    // relative-only simplex perturbation (~1e-6 axis) sees an objective
    // spread below tol and returns the start — the GARCH skew-t λ freeze.
    // The absolute perturbation floor must walk it to a well at x=±1.
    val (x, fx, conv) = LinAlg.nelderMead(
      a => { val d = a(0) * a(0) - 1.0; d * d }, Array(0.0))
    assert(conv, "should converge")
    assert(math.abs(math.abs(x(0)) - 1.0) < 1e-4, s"stuck at ${x(0)}")
    assert(fx < 1e-8)
    // and a mixed start: zero coord alongside a nonzero one, both recover
    val (p, _, _) = LinAlg.nelderMead(
      a => math.pow(a(0) - 2.0, 2) + math.pow(a(1) + 1.5, 2), Array(0.0, 1.0))
    assert(math.abs(p(0) - 2.0) < 1e-4 && math.abs(p(1) + 1.5) < 1e-4)
  }

  test("nelderMead keeps tiny-but-nonzero coordinates at their natural scale") {
    // GARCH-ω-shaped axis: scale ~5e-8, optimum at 2e-8. The zero-axis
    // absolute floor must NOT fire here (a 0.05 opening is 10^6× the
    // coordinate's scale); explicit per-axis steps pin the opening.
    val f = (a: Array[Double]) => {
      val d = (a(0) - 2e-8) * 1e8; d * d
    }
    val (x, fx, conv) = LinAlg.nelderMead(f, Array(5e-8),
      steps = Array(1.25e-8))
    assert(conv && fx < 1e-8, s"fx=$fx conv=$conv")
    assert(math.abs(x(0) - 2e-8) < 1e-11, s"x=${x(0)}")
    // and the default path: 5e-8 is above the 1e-12 zero threshold, so
    // the simplex must open relatively (not at +0.05) and still converge
    val (y, fy, _) = LinAlg.nelderMead(f, Array(5e-8))
    assert(fy < 1e-6, s"default-step fit stuck: fy=$fy y=${y(0)}")
  }

  test("thread-safety hammer: concurrent eigSym/solveSpd/Ssa.forecast never disagree or throw") {
    val rng = new scala.util.Random(13)
    val series = Array.fill(8)(Array.tabulate(200)(i =>
      math.sin(i * 0.3) * 5 + 100 + rng.nextGaussian() * 0.01))
    val expected = series.map(s => Ssa.forecast(s, 5, 20).toSeq)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val results = Await.result(
      Future.sequence((0 until 64).map(k =>
        Future(k -> Ssa.forecast(series(k % 8), 5, 20).toSeq))), 120.seconds)
    results.foreach { case (k, r) => assert(r === expected(k % 8)) }
  }

  test("thread-safety hammer: concurrent exact-MLE fits (Kalman/breeze gemm) are deterministic") {
    val rng = new scala.util.Random(29)
    // ARMA(1,1)-ish series so the MLE path (incl. MA refinement) runs
    val series = Array.fill(4) {
      val x = new Array[Double](400)
      var e0 = 0.0
      (0 until 400).foreach { i =>
        val e = rng.nextGaussian()
        x(i) = (if (i > 0) 0.6 * x(i - 1) else 0.0) + e + 0.4 * e0
        e0 = e
      }
      x
    }
    val expected = series.map(s => Ar.fit(s, maxP = 2, maxQ = 1, exactMle = true))
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val results = Await.result(
      Future.sequence((0 until 32).map(k =>
        Future(k -> Ar.fit(series(k % 4), maxP = 2, maxQ = 1, exactMle = true)))),
      300.seconds)
    results.foreach { case (k, f) =>
      val e = expected(k % 4)
      assert(f.coefs.toSeq === e.coefs.toSeq && f.maCoefs.toSeq === e.maCoefs.toSeq &&
        f.sigma2 === e.sigma2 && f.aic === e.aic)
    }
  }
}
