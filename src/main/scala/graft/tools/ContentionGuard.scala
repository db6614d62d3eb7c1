package graft.tools

import scala.util.Try

/**
 * Battery hygiene: a measured Bench/Verify run sharing the machine with
 * another JVM battery or a DuckDB oracle checker reads garbage (a
 * discarded round-11 run clocked 17× on a control purely from
 * contention). Before a run starts, scan `/proc` for OTHER live
 * bench/verify/oracle processes — excluding this process and its own
 * ancestor chain (the sbt launcher's command line names the main class
 * too) — and warn loudly; with `GRAFT_GUARD=strict` refuse outright.
 *
 * Warn-don't-refuse is the default on purpose: the round driver runs
 * these mains unattended, and a stray unrelated process must never cost
 * the round its artifacts — the warning plus the `contended` count in
 * the bench JSON make a contended map self-identifying instead.
 */
object ContentionGuard {

  private val Patterns =
    Seq("graft.Bench", "graft.Verify", "check_oracle", "oracle_dtype_check",
      "duckdb")

  /** PIDs of this process and its ancestors (their command lines
    * legitimately name our own main class). */
  private def ancestors(): Set[Long] = {
    val out = scala.collection.mutable.Set.empty[Long]
    var pid = ProcessHandle.current().pid()
    var hops = 0
    while (pid > 1 && hops < 32) {
      out += pid
      pid = Try {
        // /proc/<pid>/stat field 4 is the ppid; field 2 (comm) may hold
        // spaces/parens, so parse from AFTER the closing paren
        val stat = new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(s"/proc/$pid/stat")))
        stat.substring(stat.lastIndexOf(')') + 2).split(" ")(1).toLong
      }.getOrElse(0L)
      hops += 1
    }
    out.toSet
  }

  /** Other live processes whose command line names a battery component. */
  def rivals(): Seq[(Long, String)] = Try {
    val mine = ancestors()
    val proc = new java.io.File("/proc")
    proc.listFiles((_, n) => n.forall(_.isDigit)).toSeq.flatMap { d =>
      val pid = d.getName.toLong
      if (mine(pid)) None
      else Try {
        val cmd = new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(s"/proc/$pid/cmdline"))).replace('\u0000', ' ')
        // only WORKER binaries count: a shell wrapper whose command TEXT
        // quotes a battery main is idle and would false-positive every
        // driver-launched run
        val argv0 = cmd.takeWhile(_ != ' ')
        val worker = argv0.contains("java") || argv0.contains("python") ||
          argv0.contains("duckdb")
        if (worker) Patterns.find(cmd.contains).map(_ => pid -> cmd.take(160))
        else None
      }.toOption.flatten
    }
  }.getOrElse(Seq.empty)

  /** Warn about rivals (stderr) and return their count; with
    * `GRAFT_GUARD=strict` a contended start exits 3 instead — local
    * iteration can make "never a contended map" a hard guarantee. */
  def check(what: String): Int = {
    val found = rivals()
    found.foreach { case (pid, cmd) =>
      System.err.println(
        s"[$what] WARNING: concurrent battery process pid=$pid: $cmd — " +
          "timings from this run are contended; rerun alone")
    }
    if (found.nonEmpty && sys.env.get("GRAFT_GUARD").contains("strict")) {
      System.err.println(s"[$what] GRAFT_GUARD=strict: refusing to start")
      sys.exit(3)
    }
    found.size
  }
}
