package graft.tools

import graft.log.{ConsumerGroups, TopicConfig, WriterLease}

/**
 * Operator CLI for the writer lease — and the second-process vehicle for
 * the cross-process chaos spec (`TwoProcessLeaseSpec` spawns this main in
 * its own JVM against a shared root, the way the reference's integration
 * suite launches real broker processes,
 * `/root/reference/internal/test/integration/test_cluster.go:28-80`).
 *
 * Commands (all take the root as argv(0)):
 *   status                          — print the standing lease (or none)
 *   acquire <holder> <ttlMs> [takeover] — acquire and EXIT without
 *                                     releasing (simulates a driver that
 *                                     dies holding the lease)
 *   hold <holder> <ttlMs> <iters> <sleepMs> [group]
 *                                   — acquire, then do `iters` group
 *                                     commits `sleepMs` apart (each one
 *                                     runs the lease write gate, so the
 *                                     lease auto-renews at half-TTL),
 *                                     then release. Prints FENCED and
 *                                     exits 3 the moment another process
 *                                     seizes the root.
 *   commit <group> <part> <offset>  — one unleased group commit (fences
 *                                     against a foreign live lease)
 *
 * Exit codes: 0 ok, 2 usage, 3 fenced.
 */
object LeaseCli {

  def main(args: Array[String]): Unit = {
    if (args.length < 2) usage()
    val root = args(0)
    val cfg = TopicConfig(root, "leasecli", 1, 1)
    try {
      args(1) match {
        case "status" =>
          WriterLease.current(root) match {
            case Some(l) =>
              println(s"LEASE holder=${l.holderId} epoch=${l.epoch} " +
                s"deadlineMs=${l.deadlineMs} ttlMs=${l.ttlMs}")
            case None => println("UNLEASED")
          }
        case "acquire" =>
          if (args.length < 4) usage()
          val takeover = args.length > 4 && args(4) == "takeover"
          val l = WriterLease.acquire(root, args(2), args(3).toLong, takeover)
          println(s"ACQUIRED epoch=${l.epoch} deadlineMs=${l.deadlineMs}")
        case "hold" =>
          if (args.length < 6) usage()
          val group = if (args.length > 6) args(6) else "cli-hold"
          val l = WriterLease.acquire(root, args(2), args(3).toLong)
          println(s"ACQUIRED epoch=${l.epoch}")
          Console.out.flush()
          val iters = args(4).toInt
          var i = 0
          while (i < iters) {
            ConsumerGroups.commit(cfg, group, Map(0 -> i.toLong))
            println(s"COMMITTED $i")
            Console.out.flush()
            Thread.sleep(args(5).toLong)
            i += 1
          }
          WriterLease.release(root)
          println("RELEASED")
        case "commit" =>
          if (args.length < 5) usage()
          ConsumerGroups.commit(cfg, args(2), Map(args(3).toInt -> args(4).toLong))
          println("COMMITTED")
        case other =>
          System.err.println(s"unknown command: $other"); usage()
      }
    } catch {
      case e: WriterLease.FencedWriterException =>
        println(s"FENCED ${e.getMessage}")
        Console.out.flush()
        sys.exit(3)
    }
  }

  private def usage(): Nothing = {
    System.err.println(
      "usage: LeaseCli <root> status|acquire|hold|commit ...")
    sys.exit(2)
  }
}
