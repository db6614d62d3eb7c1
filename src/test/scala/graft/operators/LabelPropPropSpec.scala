package graft.operators

import graft.GraftSession
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** labelPropagation vs a driver-side reference fold on random graphs —
  * synchronous rounds with min-label tie-break are a pure function of the
  * edge set, so the distributed run must equal the sequential replay
  * round for round, on any topology (stars, chains, disconnected pieces,
  * dense blobs — including the bipartite shapes where synchronous LPA
  * legitimately oscillates; the reference oscillates identically). */
class LabelPropPropSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = GraftSession.builder(master = "local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** Sequential reference: synchronous min-label-tie-break LPA. */
  private def refLpa(edges: Set[(Long, Long)], rounds: Int): Map[Long, Long] = {
    val adj = edges.flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var labels: Map[Long, Long] = adj.keys.map(n => n -> n).toMap
    for (_ <- 1 to rounds) {
      labels = adj.map { case (n, nbrs) =>
        val counts = nbrs.toSeq.map(labels).groupBy(identity)
          .view.mapValues(_.size).toMap
        val best = counts.toSeq.minBy { case (lbl, c) => (-c, lbl) }._1
        n -> best
      }
    }
    labels
  }

  private def runLpa(edges: Set[(Long, Long)], rounds: Int): Map[Long, (Long, Long)] = {
    val s = spark
    import s.implicits._
    val sym = edges.toSeq.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    Analytics.labelPropagation(sym.toDF("src", "dst"), rounds)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
  }

  private def summarize(labels: Map[Long, Long]): Map[Long, (Long, Long)] =
    labels.groupBy(_._2).map { case (community, members) =>
      community -> (members.size.toLong, members.keys.min)
    }

  test("random sparse graphs equal the sequential replay") {
    val rng = new scala.util.Random(11)
    for (trial <- 1 to 6) {
      val n = 10 + rng.nextInt(40)
      val m = n + rng.nextInt(2 * n)
      val edges = (1 to m).map { _ =>
        val a = rng.nextInt(n).toLong
        val b = rng.nextInt(n).toLong
        (math.min(a, b), math.max(a, b))
      }.filter { case (a, b) => a != b }.toSet
      if (edges.nonEmpty) {
        val rounds = 1 + rng.nextInt(4)
        assert(runLpa(edges, rounds) === summarize(refLpa(edges, rounds)),
          s"trial $trial: n=$n m=${edges.size} rounds=$rounds")
      }
    }
  }

  test("star and chain (oscillating bipartite shapes) still replay exactly") {
    val star = (2L to 8L).map(l => (1L, l)).toSet
    val chain = (1L to 9L).map(i => (i, i + 1)).toSet
    for (rounds <- 1 to 4) {
      assert(runLpa(star, rounds) === summarize(refLpa(star, rounds)))
      assert(runLpa(chain, rounds) === summarize(refLpa(chain, rounds)))
    }
  }
}
