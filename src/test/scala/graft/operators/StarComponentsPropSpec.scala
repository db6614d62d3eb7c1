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
      // skewSaltFactor = 1: the random-shape cases guard the contraction
      // algebra; the salted join path has its own dedicated case below
      // (salting multiplies per-round stage overhead — prohibitive across
      // 12 cases × ~15 rounds of tiny data)
      val got = Dedup.connectedComponents(df, "id_a", "id_b",
          maxIter = 30, smallGraphMaxPairs = 0L, skewSaltFactor = 1)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      got == truth(edges)
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(res.passed, res.status.toString)
  }

  test("power-law mega-component: salted star loop matches union-find at scale") {
    val sp = spark
    import sp.implicits._
    // adversarial skew: 80% of 20k nodes hang directly off hub 0 (the
    // mega-component whose root key floods one join task without
    // salting), the rest form chain strands into the same component,
    // plus a disjoint ring that must stay separate
    val n = 4000
    val edges: Seq[(Long, Long)] =
      (1 until n).map { i =>
        if (i % 5 == 0) (i.toLong, math.max(0, i - 5).toLong)
        else (i.toLong, 0L)
      } ++ (0 until 200).map(i => ((n + i).toLong, (n + (i + 1) % 200).toLong))
    val got = Dedup.connectedComponents(edges.toDF("id_a", "id_b"),
        "id_a", "id_b", maxIter = 40, smallGraphMaxPairs = 0L,
        skewSaltFactor = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expect = truth(edges)
    assert(got.size === expect.size)
    assert(got === expect)
    // the mega-component's label is the hub, the ring's is its min id
    assert(got(1L) === 0L && got((n - 1).toLong) === 0L)
    assert(got((n + 100).toLong) === n.toLong)
  }
}
