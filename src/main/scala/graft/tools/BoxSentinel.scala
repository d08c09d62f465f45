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

  /** `"solo":…,"other_jvms_start":…` JSON fragment (no braces). */
  def jsonFields(jvms0: Int, load0: Double, jvms1: Int, load1: Double): String =
    s""""solo":${jvms0 == 0 && jvms1 == 0},"other_jvms_start":$jvms0,""" +
      s""""other_jvms_end":$jvms1,"load_start":$load0,"load_end":$load1"""
}
