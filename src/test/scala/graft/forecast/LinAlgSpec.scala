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
}
