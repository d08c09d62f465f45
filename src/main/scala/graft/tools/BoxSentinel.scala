package graft.tools

/** Shared-box contention sentinel for the measurement harnesses
  * ([[graft.Bench]], [[ScaleSweep]]): counts live foreign JVMs (any
  * java process that is not this JVM or an ancestor — sbt/the driver
  * wrapper launch us, so the parent chain must not count) and reads
  * the 1-minute load average, so every recorded number carries the
  * evidence to tell box contention apart from plan regressions without
  * a rerun. */
object BoxSentinel {
  def jvmCount(): Int = {
    val self = ProcessHandle.current()
    val ancestors = Iterator.iterate(self.parent())(p =>
        if (p.isPresent) p.get.parent() else p)
      .takeWhile(_.isPresent).map(_.get.pid).toSet + self.pid
    ProcessHandle.allProcesses().filter { h =>
      !ancestors.contains(h.pid) &&
        h.info().command().map[Boolean](c =>
          c.endsWith("/java") || c == "java").orElse(false)
    }.count().toInt
  }

  def loadAvg(): Double = java.lang.management.ManagementFactory
    .getOperatingSystemMXBean.getSystemLoadAverage

  /** Foreign-load threshold for the `solo` stamp: at sweep START this
    * JVM has done no work yet, so any 1-min load above this many cores
    * is someone else's (the r9 driver artifact recorded 0 foreign JVMs
    * but load 12.5 — a concurrent non-JVM oracle job the process count
    * cannot see). load_end is NOT gated: the sweep's own local[32] work
    * legitimately drives the trailing load average. */
  val SoloLoadMax = 4.0

  /** `"solo":…,"other_jvms_start":…` JSON fragment (no braces).
    * `solo` now requires BOTH zero foreign JVMs at start+end AND a
    * quiet pre-sweep load average, so a contended sweep's artifact
    * disqualifies itself instead of asserting trust it doesn't have. */
  def jsonFields(jvms0: Int, load0: Double, jvms1: Int, load1: Double): String =
    s""""solo":${jvms0 == 0 && jvms1 == 0 && load0 < SoloLoadMax},""" +
      s""""other_jvms_start":$jvms0,""" +
      s""""other_jvms_end":$jvms1,"load_start":$load0,"load_end":$load1"""
}
