package graft.operators

import graft.GraftSession
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** kCore vs a driver-side reference peel on random graphs — covers the
  * shapes one fixture can't: empty cores, fully-surviving graphs,
  * disconnected components, chains that peel from the ends inward. */
class KCorePropSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = GraftSession.builder(master = "local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** Reference peel: repeatedly remove nodes of degree < k to fixpoint. */
  private def refKCore(edges: Set[(Long, Long)], k: Int): Map[Long, Int] = {
    var es = edges.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    var changed = true
    while (changed) {
      val deg = es.groupBy(_._1).view.mapValues(_.size).toMap
      val alive = deg.filter(_._2 >= k).keySet
      val next = es.filter { case (a, b) => alive(a) && alive(b) }
      changed = next.size != es.size
      es = next
    }
    es.groupBy(_._1).view.mapValues(_.size).toMap
  }

  private def runKCore(edges: Set[(Long, Long)], k: Int): Map[Long, Long] = {
    val s = spark
    import s.implicits._
    val sym = edges.toSeq.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val df = sym.toDF("src", "dst")
    Analytics.kCore(df, k, maxRounds = 50)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("matches reference peel on random graphs, k in 2..4") {
    val rnd = new scala.util.Random(7)
    (0 until 8).foreach { trial =>
      val n = 6 + rnd.nextInt(30)
      val p = 0.08 + rnd.nextDouble() * 0.18
      val edges = (for {
        a <- 0L until n.toLong; b <- (a + 1) until n.toLong
        if rnd.nextDouble() < p
      } yield (a, b)).toSet
      if (edges.nonEmpty) {
        (2 to 4).foreach { k =>
          val expect = refKCore(edges, k)
          val got = runKCore(edges, k)
          assert(got.view.mapValues(_.toInt).toMap === expect,
            s"trial $trial k=$k edges=$edges")
        }
      }
    }
  }

  test("chain peels to empty for k = 2; cycle survives whole") {
    val chain = (0L until 9L).map(i => (i, i + 1)).toSet
    assert(runKCore(chain, 2).isEmpty) // a path has ends of degree 1 forever
    val cycle = chain + ((9L, 0L))
    val core = runKCore(cycle, 2)
    assert(core.keySet === (0L to 9L).toSet)
    assert(core.values.forall(_ === 2L))
  }

  test("disconnected cliques: only the big one survives k = 3") {
    val k4 = (for (a <- 0L until 4L; b <- (a + 1) until 4L) yield (a, b)).toSet
    val tri = Set((10L, 11L), (11L, 12L), (10L, 12L))
    val core = runKCore(k4 ++ tri, 3)
    assert(core.keySet === Set(0L, 1L, 2L, 3L))
  }
}
