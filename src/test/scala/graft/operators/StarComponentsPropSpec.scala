package graft.operators

import graft.GraftSession
import org.apache.spark.sql.SparkSession
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/**
 * Property guard for the distributed large-star/small-star connected
 * components: on RANDOM edge lists (mixed shapes, duplicate edges, both
 * orientations, self-loops) the distributed labeling must equal
 * union-find ground truth computed in plain Scala. Runs with
 * `smallGraphMaxPairs = 0` so every case exercises the star loop, not the
 * driver path.
 */
class StarComponentsPropSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = GraftSession.builder(master = "local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def truth(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x0: Long): Long = {
      var x = x0
      while (parent.getOrElse(x, x) != x) x = parent(x)
      x
    }
    val nodes = scala.collection.mutable.Set.empty[Long]
    edges.foreach { case (a, b) =>
      nodes += a; nodes += b
      val ra = find(a); val rb = find(b)
      if (ra < rb) parent(rb) = ra else if (rb < ra) parent(ra) = rb
    }
    nodes.iterator.map(n => n -> find(n)).toMap
  }

  test("star contraction equals union-find on random graphs (ScalaCheck)") {
    val sp = spark
    import sp.implicits._
    val edgeGen: Gen[(Long, Long)] = for {
      a <- Gen.chooseNum(0L, 40L)
      b <- Gen.chooseNum(0L, 40L)
    } yield (a, b)
    val graphGen: Gen[List[(Long, Long)]] =
      Gen.chooseNum(1, 60).flatMap(n => Gen.listOfN(n, edgeGen))

    val prop = Prop.forAll(graphGen) { edges =>
      // the operator contract excludes self-pairs (near-dup pairs always
      // have id_a < id_b) but the algorithm must tolerate them anyway
      val df = edges.toDF("id_a", "id_b")
      val got = Dedup.connectedComponents(df, "id_a", "id_b",
          maxIter = 30, smallGraphMaxPairs = 0L)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      got == truth(edges)
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(res.passed, res.status.toString)
  }
}
