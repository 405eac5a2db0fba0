package graft

/** Generates DuckDB SQL text that solves ordinary least squares with an
  * intercept by unrolled Cholesky factorization of the normal equations.
  *
  * This exists so multi-regressor MLlib OLS fits (`mlr`) can be oracled in
  * portable SQL: DuckDB's `regr_slope` handles one regressor only, but the
  * normal-equation moments (X'X, X'y) are plain SQL aggregates and a k×k
  * Cholesky solve unrolls into a short chain of CTEs. Agreement with MLlib's
  * "normal" solver is ~1e-12 relative, far inside the 6-decimal rounding
  * every oracle output uses.
  *
  * The solve is deliberately emitted as ONE CTE PER STAGE rather than lateral
  * column aliases in a single SELECT: DuckDB binds lateral aliases by textual
  * substitution, so a k=6 triangular solve written with intra-SELECT
  * references expands exponentially and never finishes planning. Chained
  * CTEs bind each intermediate once as a real column.
  *
  * Usage: splice `momentsCte` + `solveCtes` into a WITH chain; the final CTE
  * (`<tag>_fit`, single row) exposes `beta_0` (intercept) and `beta_i` (the
  * coefficient of the i-th regressor, 1-based).
  */
private[graft] object OracleGen {

  /** CTE computing the normal-equation moments for regressors `xs` (SQL
    * expressions) against target `yExpr` over `fromClause` (may include a
    * WHERE filter): `sa_i_j = Σ x_i·x_j` (lower triangle, x_0 ≡ 1) and
    * `sb_i = Σ x_i·y`. */
  def momentsCte(tag: String, xs: Seq[String], fromClause: String,
                 yExpr: String = "y", keys: Seq[String] = Nil): String = {
    val c = "1.0" +: xs
    val sa = for (i <- c.indices; j <- 0 to i)
      yield s"sum((${c(i)})*(${c(j)})) AS sa_${i}_${j}"
    val sb = c.indices.map(i => s"sum((${c(i)})*($yExpr)) AS sb_$i")
    val grp = if (keys.isEmpty) "" else s" GROUP BY ${keys.mkString(", ")}"
    s"${tag}_m AS (SELECT ${(keys ++ sa ++ sb).mkString(", ")} FROM $fromClause$grp)"
  }

  /** CTE chain solving A·β = b from `<tag>_m` via Cholesky (A = L·L',
    * forward solve L·z = b, backward solve L'·β = z). One CTE per
    * elimination column / solve step; final CTE is `<tag>_fit`. Every step
    * is a row-wise `SELECT *, ...`, so when `momentsCte` grouped by keys
    * (one moments row per key), the chain solves every key's system in the
    * same pass and `<tag>_fit` carries one fit per key. */
  def solveCtes(tag: String, k: Int): String = {
    def a(i: Int, j: Int) = if (i >= j) s"sa_${i}_${j}" else s"sa_${j}_${i}"
    val ctes = scala.collection.mutable.ArrayBuffer.empty[String]
    var prev = s"${tag}_m"
    for (j <- 0 to k) {
      val diag = (0 until j).map(t => s" - l_${j}_${t}*l_${j}_${t}").mkString
      val cols = scala.collection.mutable.ArrayBuffer(s"sqrt(${a(j, j)}$diag) AS l_${j}_${j}")
      for (i <- j + 1 to k) {
        val off = (0 until j).map(t => s" - l_${i}_${t}*l_${j}_${t}").mkString
        cols += s"(${a(i, j)}$off) / sqrt(${a(j, j)}$diag) AS l_${i}_${j}"
      }
      val name = s"${tag}_c$j"
      ctes += s"$name AS (SELECT *, ${cols.mkString(", ")} FROM $prev)"
      prev = name
    }
    for (i <- 0 to k) {
      val fwd = (0 until i).map(t => s" - l_${i}_${t}*z_$t").mkString
      val name = s"${tag}_f$i"
      ctes += s"$name AS (SELECT *, (sb_$i$fwd) / l_${i}_${i} AS z_$i FROM $prev)"
      prev = name
    }
    for (i <- k to 0 by -1) {
      val bwd = (i + 1 to k).map(t => s" - l_${t}_${i}*beta_$t").mkString
      val name = if (i == 0) s"${tag}_fit" else s"${tag}_b$i"
      ctes += s"$name AS (SELECT *, (z_$i$bwd) / l_${i}_${i} AS beta_$i FROM $prev)"
      prev = name
    }
    ctes.mkString(",\n")
  }
}
