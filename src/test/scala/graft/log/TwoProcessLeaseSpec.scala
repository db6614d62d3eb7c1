package graft.log

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files
import java.util.concurrent.TimeUnit

/**
 * Cross-process lease chaos (VERDICT r15 directive 3): a REAL second JVM
 * (`graft.tools.LeaseCli`) contends for the same root — the in-JVM
 * `installHeldForTest` simulation's claims re-proven across true process
 * boundaries, the way the reference's integration suite launches real
 * broker processes (`internal/test/integration/test_cluster.go:28-80`).
 */
class TwoProcessLeaseSpec extends AnyFunSuite {

  private val javaBin =
    System.getProperty("java.home") + java.io.File.separator + "bin" +
      java.io.File.separator + "java"
  private val classpath = System.getProperty("java.class.path")

  // the same JDK17 opens the forked test JVM runs with (build.sbt) — the
  // child touches only Hadoop local-FS paths but inherits the full set so
  // a Hadoop internals change can never split the two environments
  private val addOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  private final case class Child(proc: Process, out: StringBuilder)

  private def spawn(args: String*): Child = {
    val cmd = (Seq(javaBin) ++ addOpens ++
      Seq("-cp", classpath, "graft.tools.LeaseCli") ++ args)
    val pb = new ProcessBuilder(cmd: _*)
    pb.redirectErrorStream(false)
    val proc = pb.start()
    val out = new StringBuilder
    val reader = new Thread(() => {
      val br = new java.io.BufferedReader(
        new java.io.InputStreamReader(proc.getInputStream))
      var line = br.readLine()
      while (line != null) {
        out.synchronized { out.append(line).append('\n'): Unit }
        line = br.readLine()
      }
    })
    reader.setDaemon(true)
    reader.start()
    // drain stderr (Hadoop noise) so the child never blocks on a full pipe
    val errDrain = new Thread(() => {
      val in = proc.getErrorStream
      while (in.read() >= 0) ()
    })
    errDrain.setDaemon(true)
    errDrain.start()
    Child(proc, out)
  }

  private def outputOf(c: Child): String = c.out.synchronized(c.out.toString)

  private def freshRoot(): String =
    Files.createTempDirectory("polar_2proc").toString

  private def awaitLease(root: String, holder: String, timeoutMs: Long = 30000L): WriterLease.Lease = {
    val until = System.currentTimeMillis() + timeoutMs
    while (System.currentTimeMillis() < until) {
      WriterLease.current(root) match {
        case Some(l) if l.holderId == holder => return l
        case _ => Thread.sleep(50)
      }
    }
    fail(s"no lease by '$holder' appeared on $root within $timeoutMs ms")
  }

  test("a live lease held by another PROCESS fences this one; release hands over") {
    val root = freshRoot()
    val cfg = TopicConfig(root, "leasecli", 1, 1)
    // process B acquires and commits for a few seconds, then releases
    val b = spawn(root, "hold", "proc-b", "60000", "40", "200", "hb")
    try {
      awaitLease(root, "proc-b")
      WriterLease.resetProbeCache()
      // this process cannot acquire while B lives...
      intercept[WriterLease.FencedWriterException](
        WriterLease.acquire(root, "proc-a", 60000L))
      // ...and its unleased group commits are fenced
      WriterLease.resetProbeCache()
      val e = intercept[WriterLease.FencedWriterException](
        ConsumerGroups.commit(cfg, "ga", Map(0 -> 1L)))
      assert(e.getMessage.contains("proc-b"), e.getMessage)
      // B finishes cleanly: its commits landed, its release handed over
      assert(b.proc.waitFor(60, TimeUnit.SECONDS), "child B hung")
      assert(b.proc.exitValue() === 0, outputOf(b))
      val log = outputOf(b)
      assert(log.contains("ACQUIRED") && log.contains("RELEASED"), log)
      assert(log.contains("COMMITTED 39"), s"all 40 commits must land:\n$log")
      // the released root acquires immediately, no TTL wait
      WriterLease.resetProbeCache()
      val a = WriterLease.acquire(root, "proc-a", 60000L)
      assert(a.epoch > 0L)
      // B's committed positions survived
      assert(ConsumerGroups.committed(cfg, "hb") === Some(Map(0 -> 39L)))
    } finally {
      b.proc.destroyForcibly(): Unit
      WriterLease.release(root)
    }
  }

  test("takeover fences the OTHER PROCESS at its next group commit via the doc stamp") {
    val root = freshRoot()
    val cfg = TopicConfig(root, "leasecli", 1, 1)
    // B holds with a LONG ttl (its local deadline stays live throughout)
    // and commits group 'g' continuously
    val b = spawn(root, "hold", "proc-b", "3600000", "300", "100", "g")
    try {
      val bl = awaitLease(root, "proc-b")
      // this process seizes the root and stamps the SAME group doc
      WriterLease.resetProbeCache()
      val a = WriterLease.acquire(root, "proc-a", 3600000L, takeover = true)
      assert(a.epoch > bl.epoch)
      // keep committing while B lives: group docs are read-check-rename
      // (not CAS), so one A-commit can interleave B's read→write window
      // and be re-stamped over — the NEXT A-commit re-stamps and B's
      // following cycle observes it. The stamp guarantee is "fenced
      // within one full commit cycle of observing the successor's doc",
      // not "no interleaving ever" (that's the documented quiesce
      // contract for concurrent committers).
      var j = 0
      ConsumerGroups.commit(cfg, "g", Map(0 -> 10000L))
      while (b.proc.isAlive && j < 300) {
        Thread.sleep(100)
        j += 1
        if (b.proc.isAlive)
          ConsumerGroups.commit(cfg, "g", Map(0 -> (10000L + j)))
      }
      // B's commit reads the doc, sees the newer stamp, and is fenced
      // ACROSS THE PROCESS BOUNDARY despite a live local deadline
      assert(b.proc.waitFor(60, TimeUnit.SECONDS),
        s"child B must fence and exit, not run its full loop:\n${outputOf(b)}")
      assert(b.proc.exitValue() === 3, outputOf(b))
      assert(outputOf(b).contains("FENCED"), outputOf(b))
      // with B fenced and gone, the successor's writes are definitive
      ConsumerGroups.commit(cfg, "g", Map(0 -> 20000L))
      assert(ConsumerGroups.committed(cfg, "g") === Some(Map(0 -> 20000L)))
    } finally {
      b.proc.destroyForcibly(): Unit
      WriterLease.release(root)
    }
  }

  test("a process that dies holding the lease hands over at TTL expiry, cross-process") {
    val root = freshRoot()
    // B acquires with a short ttl and exits WITHOUT releasing
    val b = spawn(root, "acquire", "proc-b", "1500")
    try {
      assert(b.proc.waitFor(60, TimeUnit.SECONDS), "child B hung")
      assert(b.proc.exitValue() === 0, outputOf(b))
      val l = awaitLease(root, "proc-b")
      // while the deadline stands, acquire refuses...
      if (System.currentTimeMillis() < l.deadlineMs)
        intercept[WriterLease.FencedWriterException](
          WriterLease.acquire(root, "proc-a", 60000L))
      // ...and once it passes, the next contender takes over WITHOUT force
      while (System.currentTimeMillis() <= l.deadlineMs) Thread.sleep(25)
      val a = WriterLease.acquire(root, "proc-a", 60000L)
      assert(a.epoch > l.epoch)
      assert(a.holderId === "proc-a")
    } finally {
      b.proc.destroyForcibly(): Unit
      WriterLease.release(root)
    }
  }
}
