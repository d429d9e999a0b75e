package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ancestry depth by pointer doubling (a.k.a. path doubling / pointer
  * jumping): each node tracks SOME ancestor plus the exact distance to
  * it; every round composes the table with itself, so the tracked
  * ancestor's distance doubles — depth D resolves in ceil(log2 D)
  * rounds instead of the D rounds a level-at-a-time recursive walk
  * (e.g. `WITH RECURSIVE`) needs.
  *
  * Scale posture: the per-round self-join shuffles only on the node /
  * ancestor key, each round is one job (`localCheckpoint` flattens
  * lineage — without it the self-referencing plan tree doubles per
  * round), and round count grows with log(depth), not depth. For a
  * BOM / org-chart / part-ancestry walk on a 1000-executor cluster,
  * depth-proportional JOB LAUNCHES are the real cost this removes:
  * a depth-60 hierarchy costs 6 rounds, not 60.
  *
  * Semantics match the recursive-CTE walk from the root: a node is
  * labeled iff its whole parent chain exists in `edges` and reaches
  * `rootKey`; nodes with broken chains (a missing ancestor) drop out,
  * and a cycle can never finish — both leave active rows, which the
  * convergence `require` reports rather than silently mislabeling.
  */
object PointerDoubling {

  /** Depth of every node reachable from `rootKey` through the
    * child→parent relation `edges` (one row per child; `rootKey`
    * itself need not appear as a child). Returns (key, depth) with
    * the root at depth 0.
    *
    * `knownMaxDepth`: when the caller can bound the depth cheaply
    * (e.g. bit-length of the max key for a halving hierarchy), the
    * loop runs exactly ceil(log2 bound) rounds with NO per-round
    * convergence job — one job per round instead of two. Unbounded
    * callers leave it None and pay a cheap count on each round's
    * checkpointed state. Either way a final emptiness check makes an
    * unconverged walk (cycle, bound too small) fail loudly.
    */
  def depths(edges: DataFrame, key: Column, parent: Column,
             rootKey: Long, maxIters: Int = 20,
             knownMaxDepth: Option[Long] = None): DataFrame = {
    val root = lit(rootKey)
    // state invariant: `anc` is an ancestor of `key` at exact distance
    // `d`; a row is DONE when anc == root (then d is the final depth)
    val rootRow = edges.sparkSession.range(1)
      .select(root.as("key"), root.as("anc"), lit(0L).as("d"))
    // deliberately NOT checkpointed: the distance-1 state is one cheap
    // scan; round 1 reads it twice and produces the first materialized
    // state, saving a whole job. Rounds 2+ must checkpoint — the
    // self-referencing compose doubles the plan tree per round.
    var st = edges
      .select(key.cast("long").as("key"), parent.cast("long").as("anc"),
        lit(1L).as("d"))
      .filter(col("key") =!= root)
      .union(rootRow)
    // after r rounds every pointer has jumped 2^r deep (root-capped):
    // a known depth bound D needs exactly ceil(log2 D) rounds
    val plannedRounds = knownMaxDepth.map(d =>
      math.ceil(math.log(math.max(d, 2).toDouble) / math.log(2.0)).toInt)
    // early-exit emptiness probe, not a full count — it runs against
    // checkpointed blocks and stops at the first active row
    def anyActive(): Boolean = !st.filter(col("anc") =!= root).isEmpty
    var active = plannedRounds.isDefined || anyActive()
    var i = 0
    while (active && i < plannedRounds.getOrElse(maxIters)) {
      val done = st.filter(col("anc") === root)
      // jump: replace each active row's ancestor with that ancestor's
      // OWN tracked ancestor, adding the distances — the inner join
      // also drops nodes whose chain leaves the relation (CTE parity)
      val jumped = st.filter(col("anc") =!= root).as("s")
        .join(st.as("a"), col("s.anc") === col("a.key"))
        .select(col("s.key").as("key"), col("a.anc").as("anc"),
          (col("s.d") + col("a.d")).as("d"))
      st = done.union(jumped).localCheckpoint()
      if (plannedRounds.isEmpty) active = anyActive()
      i += 1
    }
    if (plannedRounds.isDefined) active = anyActive()
    require(!active,
      s"PointerDoubling.depths did not converge after $i rounds — " +
        "cycle in the parent relation, or depth exceeds the bound")
    st.select(col("key"), col("d").as("depth"))
  }
}
