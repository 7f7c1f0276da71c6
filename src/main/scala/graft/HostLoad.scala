package graft

/**
 * One-line host-load stamp printed beside every timed probe sample
 * (VERDICT r15 item 6): this host's eval wall-clocks drift 1.5–6×
 * with background load (SCALING.md r15 recorded a 9–79 s swing on
 * one cell), and a sample recorded without its load context cannot
 * be separated from a regression afterwards. Reads /proc/loadavg
 * plus the cgroup-v2 CPU pressure file (falling back to
 * /proc/pressure/cpu); a file that is absent or unreadable prints
 * as "-" so probes run on any host. Deliberately cheap (two small
 * reads) — callers print it once per timed sample.
 */
object HostLoad {
  private def read(path: String): Option[String] =
    try Some(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), "UTF-8").trim)
    catch { case scala.util.control.NonFatal(_) => None }

  /** e.g. `load=9.25,5.43,2.86 cpu-psi=some avg10=1.17 avg60=0.52` —
    * 1/5/15-minute run-queue averages and the "some tasks stalled on
    * CPU" pressure share over the 10 s / 60 s windows. */
  def line: String = {
    val la = read("/proc/loadavg")
      .map(_.split(" ").take(3).mkString(",")).getOrElse("-")
    val psi = read("/sys/fs/cgroup/cpu.pressure")
      .orElse(read("/proc/pressure/cpu"))
      .flatMap(_.linesIterator.find(_.startsWith("some")))
      .map(_.split(" ").take(3).mkString(" ")).getOrElse("-")
    s"load=$la cpu-psi=$psi"
  }
}
