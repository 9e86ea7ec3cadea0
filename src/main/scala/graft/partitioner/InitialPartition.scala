package graft.partitioner

import scala.collection.mutable
import scala.util.Random

/** Driver-side initial partition of the coarsest graph — the Spark
  * re-expression of the reference's replicate-and-solve stage (P10:
  * par_graph_gather src/graph.c:2501-2597 gathers the coarsest graph to
  * every thread; par_initpart_cut src/initpart.c:30-77 runs
  * `ninitsolutions` seeded serial solves and keeps the minimum cut).
  *
  * By the coarsening stop rule the coarsest graph has ≤ coarsenTo vertices
  * (reference ctrl.c:260: 1000·nparts), so a `collect()` is the gather and
  * plain Scala is the serial solver. Greedy graph-growing (BFS region
  * growing from a seed, the GGP scheme serial METIS uses for initial
  * bisection) + one pass of boundary greedy refinement, best-of-N by cut.
  */
object InitialPartition {

  /** Compact in-driver CSR. */
  final case class LocalGraph(vids: Array[Long], xadj: Array[Int],
                              adjncy: Array[Int], adjwgt: Array[Long],
                              vwgt: Array[Long]) {
    def nvtxs: Int = vids.length
  }

  def fromEdges(edges: Array[(Long, Long, Long)],
                verts: Array[(Long, Long)]): LocalGraph = {
    val vids = verts.map(_._1).sorted
    val idx = vids.zipWithIndex.toMap
    val vwgt = new Array[Long](vids.length)
    verts.foreach { case (v, w) => vwgt(idx(v)) = w }
    val deg = new Array[Int](vids.length)
    edges.foreach { case (s, d, _) => deg(idx(s)) += 1; deg(idx(d)) += 1 }
    val xadj = new Array[Int](vids.length + 1)
    for (i <- vids.indices) xadj(i + 1) = xadj(i) + deg(i)
    val pos = xadj.clone()
    val adjncy = new Array[Int](edges.length * 2)
    val adjwgt = new Array[Long](edges.length * 2)
    edges.foreach { case (s, d, w) =>
      val (si, di) = (idx(s), idx(d))
      adjncy(pos(si)) = di; adjwgt(pos(si)) = w; pos(si) += 1
      adjncy(pos(di)) = si; adjwgt(pos(di)) = w; pos(di) += 1
    }
    LocalGraph(vids, xadj, adjncy, adjwgt, vwgt)
  }

  def cutOf(g: LocalGraph, where: Array[Int]): Long = {
    var cut = 0L
    var i = 0
    while (i < g.nvtxs) {
      var j = g.xadj(i)
      while (j < g.xadj(i + 1)) {
        if (where(g.adjncy(j)) != where(i)) cut += g.adjwgt(j)
        j += 1
      }
      i += 1
    }
    cut / 2
  }

  /** One seeded greedy graph-growing k-way partition + refinement pass. */
  private def growOnce(g: LocalGraph, k: Int, ubFactor: Double,
                       seed: Long): Array[Int] = {
    val rnd = new Random(seed)
    val n = g.nvtxs
    val tvwgt = g.vwgt.sum
    val target = tvwgt.toDouble / k
    val maxW = (target * ubFactor).ceil.toLong
    val where = Array.fill(n)(-1)
    val pwgt = new Array[Long](k)
    var assigned = 0
    // grow parts 0..k-2 by BFS from random unassigned seeds; rest -> k-1
    for (p <- 0 until k - 1) {
      val queue = mutable.Queue.empty[Int]
      while (pwgt(p) < target && assigned < n) {
        if (queue.isEmpty) {
          // new seed: random unassigned vertex
          var s = rnd.nextInt(n)
          var tries = 0
          while (where(s) != -1 && tries < 4 * n) { s = (s + 1) % n; tries += 1 }
          if (where(s) != -1) return fallback(g, k) // shouldn't happen
          queue.enqueue(s)
        }
        val v = queue.dequeue()
        if (where(v) == -1 && pwgt(p) + g.vwgt(v) <= maxW) {
          where(v) = p; pwgt(p) += g.vwgt(v); assigned += 1
          var j = g.xadj(v)
          while (j < g.xadj(v + 1)) {
            if (where(g.adjncy(j)) == -1) queue.enqueue(g.adjncy(j))
            j += 1
          }
        } else if (where(v) == -1 && queue.isEmpty) {
          // vertex too heavy for this part; skip it via a fresh seed
          return refineGreedy(g, k, completeRest(g, k, where, pwgt), ubFactor)
        }
      }
    }
    refineGreedy(g, k, completeRest(g, k, where, pwgt), ubFactor)
  }

  private def completeRest(g: LocalGraph, k: Int, where: Array[Int],
                           pwgt: Array[Long]): Array[Int] = {
    // remaining vertices: lightest part first (island restore F4 flavour,
    // reference par_graph_restoreislands src/graph.c:3271-3382)
    for (i <- 0 until g.nvtxs if where(i) == -1) {
      val p = (0 until k).minBy(pwgt(_))
      where(i) = p; pwgt(p) += g.vwgt(i)
    }
    where
  }

  private def fallback(g: LocalGraph, k: Int): Array[Int] =
    Array.tabulate(g.nvtxs)(i => i % k)

  /** Greedy boundary refinement sweeps (serial flavour of R1,
    * S_par_kwayrefine_GREEDY src/kwayrefine.c:1004-1214): move a vertex to
    * the neighbor part with max positive gain if balance stays feasible;
    * ≤ 8 passes (nrefpass default, ctrl.c:39) or until no move.
    */
  def refineGreedy(g: LocalGraph, k: Int, where: Array[Int],
                   ubFactor: Double, passes: Int = 8): Array[Int] = {
    val tvwgt = g.vwgt.sum
    val maxW = (tvwgt.toDouble / k * ubFactor).ceil.toLong
    val pwgt = new Array[Long](k)
    for (i <- where.indices) pwgt(where(i)) += g.vwgt(i)
    var pass = 0
    var moved = true
    val conn = new Array[Long](k)
    while (pass < passes && moved) {
      moved = false
      var i = 0
      while (i < g.nvtxs) {
        java.util.Arrays.fill(conn, 0L)
        var j = g.xadj(i)
        while (j < g.xadj(i + 1)) {
          conn(where(g.adjncy(j))) += g.adjwgt(j); j += 1
        }
        val home = where(i)
        var best = home
        var bestGain = 0L
        var p = 0
        while (p < k) {
          if (p != home && pwgt(p) + g.vwgt(i) <= maxW) {
            val gain = conn(p) - conn(home)
            if (gain > bestGain || (gain == bestGain && gain > 0 && pwgt(p) < pwgt(best)))
              { best = p; bestGain = gain }
          }
          p += 1
        }
        if (best != home && bestGain > 0) {
          pwgt(home) -= g.vwgt(i); pwgt(best) += g.vwgt(i)
          where(i) = best; moved = true
        }
        i += 1
      }
      pass += 1
    }
    where
  }

  /** Best-of-N seeded solves by cut (reference ninitsolutions=8,
    * src/ctrl.c:41, min-reduce src/initpart.c:70-77).
    */
  def partition(g: LocalGraph, k: Int, ubFactor: Double = 1.03,
                nSolutions: Int = 8, seed: Long = 42L): Array[Int] = {
    if (g.nvtxs == 0) return Array.empty
    if (k <= 1) return new Array[Int](g.nvtxs)
    val candidates = (0 until nSolutions).map { s =>
      val w = growOnce(g, k, ubFactor, seed + s)
      (cutOf(g, w), w)
    }
    candidates.minBy(_._1)._2
  }
}
