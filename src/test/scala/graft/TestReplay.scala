package graft

/** Shared driver-side replays of the engine's deterministic-randomness
  * primitives. These ARE the spec of the md5 pipelines — one copy, so a
  * formula change (widening the fold, a new CDF) cannot leave a stale
  * twin silently pinning the old behavior in one suite. */
object TestReplay {

  /** Lowercase hex md5 of a UTF-8 string — the driver-side twin of both
    * engines' `md5()`. */
  def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Driver-side replay of `DetRandom.md5Long48`: the 48-bit fold of
    * md5's first 12 hex digits. */
  def md5Long48(key: String): Long =
    md5hex(key).take(12).foldLeft(0L)((acc, c) =>
      acc * 16 + Character.digit(c, 16))

  /** Driver-side replay of `Privacy.laplaceNoise`: the 48-bit md5 fold,
    * u = (v + ½)/2^48, Laplace inverse CDF at scale `b`. */
  def laplace(key: String, b: Double): Double = {
    val u = (md5Long48(key) + 0.5) / 281474976710656.0
    val d = u - 0.5
    -b * math.signum(d) * math.log(1.0 - 2.0 * math.abs(d))
  }
}
