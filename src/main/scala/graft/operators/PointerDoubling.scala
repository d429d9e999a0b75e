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
    * convergence job — one job per round instead of two. Since
    * 2^plannedRounds >= bound, every chain within the bound has
    * provably converged, so no post-loop emptiness job runs either:
    * an in-plan row-level guard (`assert_true` in the output filter)
    * throws on the caller's first action if a cycle or a wrong bound
    * left an unconverged row — loud failure at zero extra jobs.
    * Unbounded callers leave it None and pay a cheap emptiness probe
    * on each round's checkpointed state, plus a `require` when
    * `maxIters` runs out.
    *
    * `checkpointInterval`: checkpoint the state every k rounds
    * instead of every round (the final round never checkpoints — its
    * output flows straight into the caller's action). Each
    * unmaterialized round references the previous state ~3x, so the
    * read amplification of the last checkpointed state is 3^k — keep
    * the default 1 when the edge set is large; a floor-bound caller
    * on modest data can pass 2 to halve the job count.
    */
  def depths(edges: DataFrame, key: Column, parent: Column,
             rootKey: Long, maxIters: Int = 20,
             knownMaxDepth: Option[Long] = None,
             checkpointInterval: Int = 1): DataFrame = {
    require(checkpointInterval >= 1, "checkpointInterval must be >= 1")
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
    val rounds = plannedRounds.getOrElse(maxIters)
    while (active && i < rounds) {
      val done = st.filter(col("anc") === root)
      // jump: replace each active row's ancestor with that ancestor's
      // OWN tracked ancestor, adding the distances — the inner join
      // also drops nodes whose chain leaves the relation (CTE parity)
      val jumped = st.filter(col("anc") =!= root).as("s")
        .join(st.as("a"), col("s.anc") === col("a.key"))
        .select(col("s.key").as("key"), col("a.anc").as("anc"),
          (col("s.d") + col("a.d")).as("d"))
      st = done.union(jumped)
      i += 1
      // bounded mode skips the checkpoint on off-interval rounds AND
      // on the final round (that state is consumed exactly once, by
      // the caller); unbounded mode must checkpoint every round — the
      // emptiness probe below would otherwise re-run the whole chain
      val mustCheckpoint =
        if (plannedRounds.isDefined) i % checkpointInterval == 0 && i < rounds
        else true
      if (mustCheckpoint) st = st.localCheckpoint()
      if (plannedRounds.isEmpty) active = anyActive()
    }
    if (plannedRounds.isEmpty) {
      require(!active,
        s"PointerDoubling.depths did not converge after $i rounds — " +
          "cycle in the parent relation, or depth exceeds the bound")
      st.select(col("key"), col("d").as("depth"))
    } else {
      // zero-job convergence guard: 2^rounds >= bound, so any row
      // still pointing below the root means a cycle or a wrong bound.
      // assert_true throws with this message during the caller's
      // action; a Filter is never pruned, so the guard runs even
      // under a bare count(). The LAZY checkpoint below the filter is
      // what keeps the guard sound: Catalyst would otherwise push the
      // deterministic predicate through the final (uncheckpointed)
      // self-join rounds, where the raise_error fires on mid-round
      // rows the join was about to resolve. A LogicalRDD is a
      // pushdown barrier, so the guard only ever sees FINAL rows —
      // and lazy means no extra job: the caller's first action is
      // what materializes the final state.
      st.localCheckpoint(eager = false)
        .filter(assert_true(col("anc") === root,
          lit(s"PointerDoubling.depths did not converge after $i " +
            "rounds — cycle in the parent relation, or depth exceeds " +
            "the knownMaxDepth bound")).isNull)
        .select(col("key"), col("d").as("depth"))
    }
  }
}
