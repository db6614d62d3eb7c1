package graft.operators

import scala.collection.mutable

/**
 * Deterministic in-memory HNSW (Malkov & Yashunin 2016, "Efficient and
 * robust approximate nearest neighbor search using Hierarchical Navigable
 * Small World graphs", arXiv:1603.09320) — the per-partition kernel behind
 * [[Similarity.hnswTopK]]'s "partitioned small-world graph + merge" ANN
 * shape (the one industry-standard ANN family the IVF/LSH/PQ ladder lacked).
 *
 * Made fully deterministic, the same way the rest of the similarity family
 * is: insertion order is ascending id (the caller sorts), the level of a
 * node comes from a SplitMix64 scramble of its id instead of an RNG draw
 * (`floor(-ln(u) · mL)` with u uniform from the hash — the paper's
 * geometric level distribution, reproducible across runs/engines), and
 * every comparison orders by `(distance, insertion index)` so ties never
 * depend on heap internals. Distance is negative cosine similarity,
 * computed with the exact per-element fold of the codegen'd
 * [[graft.functions.SketchExpressions VecCosine]] kernel so scores match
 * the column path bit-for-bit.
 *
 * Scale posture: one graph per PARTITION (executor-local memory, like the
 * per-partition codec work in [[Multimodal]]), queried with beam search
 * and merged by a global top-k — never a driver-side index, never an
 * all-pairs anything. Graph memory is O(n · M); a deployment sizes
 * partitions so n·(dim·4 + M·8) fits the executor, the same arithmetic
 * every sharded HNSW store documents.
 */
final class HnswIndex(m: Int, efConstruction: Int) {
  require(m >= 2, s"HNSW needs M >= 2, got $m")
  require(efConstruction >= m, s"efConstruction must be >= M")

  private val mL = 1.0 / math.log(m.toDouble)
  private val maxM0 = 2 * m // level-0 lists are 2M wide (the paper's Mmax0)

  private val ids = mutable.ArrayBuffer.empty[Long]
  private val vecs = mutable.ArrayBuffer.empty[Array[Float]]
  private val nodeLevel = mutable.ArrayBuffer.empty[Int]
  // neighbors(node)(level) — compact int indices into ids/vecs
  private val neighbors = mutable.ArrayBuffer.empty[Array[mutable.ArrayBuffer[Int]]]
  private var entry = -1
  private var topLevel = -1

  def size: Int = ids.length

  /** SplitMix64 finalizer → uniform (0,1): the deterministic stand-in for
    * the paper's RNG draw. Public-domain mixing constants. */
  private def levelOf(id: Long): Int = {
    var z = id + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z = z ^ (z >>> 31)
    val u = ((z >>> 11).toDouble + 0.5) / 9007199254740992.0 // 2^53
    math.min((-math.log(u) * mL).toInt, 31)
  }

  /** Exact fold of the VecCosine kernel (see SketchExpressions.cosineSim):
    * sequential d/na/nb accumulation in doubles over float elements. */
  private def cos(a: Array[Float], b: Array[Float]): Double = {
    var d = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      val x = a(i).toDouble; val y = b(i).toDouble
      d += x * y; na += x * x; nb += y * y
      i += 1
    }
    d / (math.sqrt(na) * math.sqrt(nb))
  }

  private def dist(q: Array[Float], node: Int): Double = -cos(q, vecs(node))

  /** Beam search in one layer (Algorithm 2): two heaps, candidates by
    * ascending distance, results by descending; ties by node index. */
  private def searchLayer(
      q: Array[Float], eps: Seq[Int], ef: Int, level: Int): mutable.ArrayBuffer[(Double, Int)] = {
    val visited = mutable.HashSet.empty[Int]
    implicit val ascOrd: Ordering[(Double, Int)] = Ordering.Tuple2[Double, Int]
    val cand = mutable.PriorityQueue.empty[(Double, Int)](ascOrd.reverse) // min-heap
    val res = mutable.PriorityQueue.empty[(Double, Int)] // max-heap
    eps.foreach { e =>
      if (visited.add(e)) {
        val d = dist(q, e)
        cand.enqueue((d, e)); res.enqueue((d, e))
      }
    }
    while (res.size > ef) res.dequeue()
    var done = cand.isEmpty
    while (!done) {
      val (dc, c) = cand.dequeue()
      if (res.nonEmpty && dc > res.head._1 && res.size >= ef) done = true
      else {
        neighbors(c)(level).foreach { nb =>
          if (visited.add(nb)) {
            val d = dist(q, nb)
            if (res.size < ef || d < res.head._1 ||
                (d == res.head._1 && nb < res.head._2)) {
              cand.enqueue((d, nb))
              res.enqueue((d, nb))
              if (res.size > ef) res.dequeue()
            }
          }
        }
        done = cand.isEmpty
      }
    }
    val out = mutable.ArrayBuffer.empty[(Double, Int)]
    res.foreach(out += _)
    out.sortInPlace()
    out
  }

  /** Insert. Callers MUST add in ascending id order for determinism. */
  def add(id: Long, v: Array[Float]): Unit = {
    val node = ids.length
    val lvl = levelOf(id)
    ids += id; vecs += v; nodeLevel += lvl
    neighbors += Array.fill(lvl + 1)(mutable.ArrayBuffer.empty[Int])
    if (entry < 0) { entry = node; topLevel = lvl; return }
    var ep = Seq(entry)
    var lc = topLevel
    while (lc > lvl) { // greedy descent above the node's level
      ep = Seq(searchLayer(v, ep, 1, lc).head._2)
      lc -= 1
    }
    while (lc >= 0) {
      val w = searchLayer(v, ep, efConstruction, lc)
      val cap = if (lc == 0) maxM0 else m
      val selected = w.take(m).map(_._2)
      selected.foreach { nb =>
        neighbors(node)(lc) += nb
        val back = neighbors(nb)(lc)
        back += node
        if (back.length > cap) {
          // shrink to the cap closest (deterministic (dist, idx) order)
          val pruned = back.map(x => (dist(vecs(nb), x), x)).sortInPlace()
            .take(cap).map(_._2)
          back.clear(); back ++= pruned
        }
      }
      ep = w.map(_._2).toSeq
      lc -= 1
    }
    if (lvl > topLevel) { topLevel = lvl; entry = node }
  }

  /** Top-k by cosine similarity: (id, sim) best-first, ties to lower id.
    * `excluded` ids are FILTERED FROM THE RESULTS but still traversed —
    * the standard tombstone-delete treatment for graph ANN (removing
    * nodes would tear the small-world connectivity; a periodic rebuild
    * compacts instead, [[Similarity.hnswIndexCompact]]). */
  def searchKnn(
      q: Array[Float], ef: Int, k: Int,
      excluded: Long => Boolean = _ => false): Seq[(Long, Double)] = {
    if (entry < 0) return Seq.empty
    var ep = Seq(entry)
    var lc = topLevel
    while (lc > 0) {
      ep = Seq(searchLayer(q, ep, 1, lc).head._2)
      lc -= 1
    }
    // Tombstones are filtered from the beam OUTPUT, so an ef-sized beam
    // can yield < k live results even when the shard holds >= k live
    // nodes. Widen and re-search until k survive or the beam provably
    // covered every reachable node (beam smaller than requested ef, or
    // ef >= shard size).
    var curEf = math.max(ef, k)
    while (true) {
      val beam = searchLayer(q, ep, curEf, 0)
      val live = beam.iterator.filterNot { case (_, n) => excluded(ids(n)) }
        .take(k).map { case (d, n) => (ids(n), -d) }.toSeq
      if (live.length >= k || beam.length < curEf || curEf >= size)
        return live
      curEf = math.min(math.max(curEf * 2, curEf + k), size)
    }
    throw new IllegalStateException("unreachable")
  }

  /** Serialized view of the graph, one row per node: (id, vector, level,
    * neighbor IDS per level 0..level) — what [[Similarity.hnswIndexWrite]]
    * persists. Neighbor references are by id (stable across reloads), not
    * by in-memory index. */
  def exportNodes(): Iterator[(Long, Array[Float], Int, Seq[Seq[Long]])] =
    (0 until size).iterator.map { n =>
      (ids(n), vecs(n), nodeLevel(n),
        neighbors(n).toSeq.map(_.toSeq.map(ids(_))))
    }

  private[operators] def loadNode(id: Long, v: Array[Float], lvl: Int): Unit = {
    ids += id; vecs += v; nodeLevel += lvl
    neighbors += Array.fill(lvl + 1)(mutable.ArrayBuffer.empty[Int])
  }

  private[operators] def loadEdges(node: Int, nbrs: Seq[Seq[Int]]): Unit =
    nbrs.zipWithIndex.foreach { case (ns, l) => neighbors(node)(l) ++= ns }

  private[operators] def finalizeLoad(): Unit = if (ids.nonEmpty) {
    topLevel = nodeLevel.max
    // the builder's entry is the FIRST node (insertion order) to attain
    // the final top level — i.e. the lowest index at that level
    entry = nodeLevel.indexOf(topLevel)
  }
}

object HnswIndex {
  /** Reconstruct a graph from its serialized adjacency — `rows` MUST be
    * one COMPLETE shard (neighbor ids resolve within it). Deterministic:
    * nodes re-enter in ascending-id order (the build order) and the entry
    * point is re-derived by the builder's own rule, so a reloaded graph
    * answers every search exactly like the one that was exported. */
  def fromAdjacency(
      m: Int,
      efConstruction: Int,
      rows: Seq[(Long, Array[Float], Int, Seq[Seq[Long]])]): HnswIndex = {
    val idx = new HnswIndex(m, efConstruction)
    val sorted = rows.sortBy(_._1)
    val pos = sorted.iterator.map(_._1).zipWithIndex.toMap
    sorted.foreach { case (id, v, lvl, _) => idx.loadNode(id, v, lvl) }
    sorted.iterator.zipWithIndex.foreach { case ((_, _, _, nbrs), n) =>
      idx.loadEdges(n, nbrs.map(_.map(pos)))
    }
    idx.finalizeLoad()
    idx
  }
}
