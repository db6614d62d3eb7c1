package graft.tools

import graft.{GraftSession, Tables}
import org.apache.spark.sql.functions._

/** Stage-level timings for the graph_triangles gate shape at sf0.1 —
  * where do the seconds go: edge build, distinct, adjacency, intersect,
  * explode-aggregate? */
object TriangleProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val mode = args.headOption.getOrElse("5000")
    val edges = if (mode == "consec") {
      val li = Tables.lineitem(spark, dir)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey").as("pk"))
      li.as("x").join(li.as("y"),
          col("x.l_orderkey") === col("y.l_orderkey") &&
            col("y.l_linenumber") === col("x.l_linenumber") + 1)
        .select(col("x.pk").as("src"), col("y.pk").as("dst"))
        .filter(col("src") =!= col("dst"))
    } else {
      val mod = mode.toInt
      val li = Tables.lineitem(spark, dir)
        .select(col("l_orderkey"), (col("l_partkey") % mod).as("pk"))
      li.as("x").join(li.as("y"), Seq("l_orderkey"))
        .select(col("x.pk").as("src"), col("y.pk").as("dst"))
        .filter(col("src") =!= col("dst"))
    }
    time("raw edge rows")(println("  n=" + edges.count()))
    val und = edges.select(
        least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
      .filter(col("u") =!= col("v")).distinct()
      .persist()
    val m = time("distinct canonical edges")(und.count())
    println("  m=" + m)
    val deg = und.select(col("u").as("node"))
      .unionAll(und.select(col("v").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg")).persist()
    time("degrees")(println("  nodes=" + deg.count() +
      " maxdeg=" + deg.agg(max("deg")).head().getLong(0)))
    val withDeg = und
      .join(broadcast(deg.select(col("node").as("u"), col("deg").as("du"))), Seq("u"))
      .join(broadcast(deg.select(col("node").as("v"), col("deg").as("dv"))), Seq("v"))
    val uFirst = col("du") < col("dv") ||
      (col("du") === col("dv") && col("u") < col("v"))
    val oriented = withDeg.select(
      when(uFirst, col("u")).otherwise(col("v")).as("src"),
      when(uFirst, col("v")).otherwise(col("u")).as("dst")).persist()
    time("oriented")(oriented.count())
    val adj = oriented.groupBy(col("src"))
      .agg(collect_list(col("dst")).as("nbrs")).persist()
    time("adjacency")(println("  adjrows=" + adj.count() + " maxout=" +
      adj.select(size(col("nbrs"))).agg(max("size(nbrs)")).head().getInt(0)))
    val ws = oriented
      .join(broadcast(adj.select(col("src"), col("nbrs").as("nu"))), Seq("src"))
      .join(broadcast(adj.select(col("src").as("dst"), col("nbrs").as("nv"))),
        Seq("dst"), "left")
      .select(col("src"), col("dst"),
        array_intersect(col("nu"), coalesce(col("nv"), array())).as("ws"))
      .filter(size(col("ws")) > 0).persist()
    time("witness intersect")(println("  wsrows=" + ws.count() +
      " tri=" + ws.agg(sum(size(col("ws")))).head().getLong(0)))
    val perEndpoint = ws.select(explode(array(col("src"), col("dst"))).as("node"),
        size(col("ws")).cast("long").as("n"))
      .groupBy(col("node")).agg(sum(col("n")).as("n"))
    val perWitness = ws.select(explode(col("ws")).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("n"))
    time("final aggregate")(println("  out=" +
      perEndpoint.unionAll(perWitness)
        .groupBy(col("node")).agg(sum(col("n")).as("triangles")).count()))
    spark.stop()
  }
}
