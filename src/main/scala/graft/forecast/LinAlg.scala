package graft.forecast

import breeze.linalg.{DenseMatrix, DenseVector}

/** Pure-Scala dense kernels for the per-ticker model fits.
  *
  * Why not LAPACK: netlib's pure-Java (f2j) LAPACK translates Fortran
  * SAVE locals into static fields, so `dgesdd` (behind breeze `svd` and
  * `pinv`) is not reentrant — concurrent per-ticker fits in one JVM
  * intermittently throw NotConvergedException, and a call that overlaps
  * another's can in principle be silently corrupted. The matrices in
  * these kernels are tiny (AR normal equations ≲ 15×15, SSA Gram
  * ≲ 60×60), far below where optimized LAPACK matters; deterministic,
  * lock-free, thread-safe Scala beats a global JVM lock that would
  * serialize every executor core's fits.
  */
object LinAlg {

  /** Eigendecomposition of a small symmetric matrix by cyclic Jacobi
    * rotations. Returns (eigenvalues descending, eigenvector columns in
    * matching order). Deterministic: fixed sweep order, fixed tolerance. */
  def eigSym(a0: DenseMatrix[Double], maxSweeps: Int = 64, tol: Double = 1e-12)
      : (DenseVector[Double], DenseMatrix[Double]) = {
    val n = a0.rows
    require(a0.cols == n, "eigSym needs a square matrix")
    val a = a0.copy
    val v = DenseMatrix.eye[Double](n)
    var sweep = 0
    var off = offDiag(a)
    val scale = math.max(1e-300, (0 until n).map(i => math.abs(a(i, i))).max)
    while (sweep < maxSweeps && off > tol * scale) {
      var p = 0
      while (p < n - 1) {
        var q = p + 1
        while (q < n) {
          val apq = a(p, q)
          if (math.abs(apq) > 1e-300) {
            // Jacobi rotation zeroing a(p,q)
            val theta = (a(q, q) - a(p, p)) / (2.0 * apq)
            val t = math.signum(theta) match {
              case 0.0 => 1.0 / (theta + math.sqrt(theta * theta + 1.0))
              case s => s / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            }
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var k = 0
            while (k < n) {
              val akp = a(k, p); val akq = a(k, q)
              a(k, p) = c * akp - s * akq
              a(k, q) = s * akp + c * akq
              k += 1
            }
            k = 0
            while (k < n) {
              val apk = a(p, k); val aqk = a(q, k)
              a(p, k) = c * apk - s * aqk
              a(q, k) = s * apk + c * aqk
              val vkp = v(k, p); val vkq = v(k, q)
              v(k, p) = c * vkp - s * vkq
              v(k, q) = s * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      off = offDiag(a)
      sweep += 1
    }
    // sort eigenpairs descending (stable: by value then original index)
    val order = (0 until n).sortBy(i => (-a(i, i), i))
    val values = DenseVector(order.map(i => a(i, i)).toArray)
    val vectors = DenseMatrix.tabulate(n, n)((r, ci) => v(r, order(ci)))
    (values, vectors)
  }

  private def offDiag(a: DenseMatrix[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.rows) {
      var j = i + 1
      while (j < a.cols) { s += math.abs(a(i, j)); j += 1 }
      i += 1
    }
    s
  }

  /** Deterministic Nelder-Mead (fixed start simplex, fixed iteration
    * cap) — shared by the GARCH QMLE and the ARMA CSS refinement.
    *
    * `steps`, when given, sets the signed per-axis opening of the start
    * simplex (axis i opens at start(i) + steps(i)) for callers that know
    * their coordinates' natural scales — e.g. the GARCH skew-t λ needs a
    * 0.05 absolute opening while ω lives at ~1e-8..1e-5 and needs a 25%
    * relative one. The default keeps the 25% relative step with an
    * absolute 0.05 opening ONLY for axes that start numerically at zero
    * (|v| < 1e-12): a relative perturbation leaves a 0.0-start axis too
    * narrow to sense curvature that is flat to first order at 0 (froze
    * the skew-t λ), but a wide absolute floor on merely-small coords
    * would dwarf their natural scale (GARCH ω ≈ 0.05·E[r²]). */
  def nelderMead(f: Array[Double] => Double, start: Array[Double],
      maxIter: Int = 400, tol: Double = 1e-10,
      steps: Array[Double] = null): (Array[Double], Double, Boolean) = {
    val dim = start.length
    var simplex = (0 to dim).map { i =>
      val p = start.clone()
      if (i > 0) {
        val v = p(i - 1)
        p(i - 1) =
          if (steps != null) v + steps(i - 1)
          else if (math.abs(v) < 1e-12) v + 0.05
          else v * 1.25 + 1e-6
      }
      (p, f(p))
    }.sortBy(_._2).toVector
    var iter = 0
    while (iter < maxIter && math.abs(simplex.last._2 - simplex.head._2) > tol) {
      val best = simplex.head; val worst = simplex.last
      val centroid = Array.tabulate(dim)(j =>
        simplex.dropRight(1).map(_._1(j)).sum / dim)
      def at(t: Double) = Array.tabulate(dim)(j =>
        centroid(j) + t * (centroid(j) - worst._1(j)))
      val refl = at(1.0); val fr = f(refl)
      simplex =
        if (fr < best._2) {
          val exp = at(2.0); val fe = f(exp)
          simplex.dropRight(1) :+ (if (fe < fr) (exp, fe) else (refl, fr))
        } else if (fr < simplex(dim - 1)._2) {
          simplex.dropRight(1) :+ (refl, fr)
        } else {
          val con = at(0.5); val fc = f(con)
          if (fc < worst._2) simplex.dropRight(1) :+ (con, fc)
          else simplex.map { case (p, _) => // shrink toward best
            val q = Array.tabulate(dim)(j => best._1(j) + 0.5 * (p(j) - best._1(j)))
            (q, f(q))
          }
        }
      simplex = simplex.sortBy(_._2)
      iter += 1
    }
    (simplex.head._1, simplex.head._2, iter < maxIter)
  }

  /** Solve the SPD system `m x = b` by Cholesky with an escalating ridge
    * (m + λI) when the factorization hits a non-positive pivot — the
    * deterministic stand-in for pinv's minimum-norm solve on the tiny,
    * occasionally collinear normal equations of the AR grids. */
  def solveSpd(m: DenseMatrix[Double], b: DenseVector[Double]): DenseVector[Double] = {
    val n = m.rows
    val trace = math.max(1e-300, (0 until n).map(i => math.abs(m(i, i))).sum)
    var ridge = 0.0
    var attempt = 0
    while (attempt < 12) {
      val l = DenseMatrix.zeros[Double](n, n)
      var ok = true
      var i = 0
      while (ok && i < n) {
        var j = 0
        while (ok && j <= i) {
          var s = m(i, j) + (if (i == j) ridge else 0.0)
          var k = 0
          while (k < j) { s -= l(i, k) * l(j, k); k += 1 }
          if (i == j) {
            if (s <= trace * 1e-14) ok = false
            else l(i, i) = math.sqrt(s)
          } else l(i, j) = s / l(j, j)
          j += 1
        }
        i += 1
      }
      if (ok) {
        // forward + back substitution
        val y = new Array[Double](n)
        i = 0
        while (i < n) {
          var s = b(i)
          var k = 0
          while (k < i) { s -= l(i, k) * y(k); k += 1 }
          y(i) = s / l(i, i)
          i += 1
        }
        val x = new Array[Double](n)
        i = n - 1
        while (i >= 0) {
          var s = y(i)
          var k = i + 1
          while (k < n) { s -= l(k, i) * x(k); k += 1 }
          x(i) = s / l(i, i)
          i -= 1
        }
        return DenseVector(x)
      }
      ridge = if (ridge == 0.0) trace * 1e-10 else ridge * 100.0
      attempt += 1
    }
    DenseVector.zeros[Double](n) // fully degenerate system
  }
}
