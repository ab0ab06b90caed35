package graft.operators

import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Cols.{rnd, xsum}

/** Link-analysis and sequence-model operators (SURVEY §2.B cont.) —
  * the graph-shaped queries a curation/analytics stack runs once the
  * relational layer is in place: PageRank over an aggregated entity
  * graph and a Markov transition model over event streams.
  *
  * Both are engine-portable by construction (fixed iteration counts,
  * exact decimal accumulation for every order-sensitive sum), so the
  * driver's DuckDB gate replays them exactly — the same determinism
  * discipline as [[KMeansOps]].
  */
object GraphOps {
  import graft.SparkEntry.QueryFn

  /** Damping factor and its teleport complement as independent literal
    * constants — NOT computed as `1 - 0.85`, which is the different
    * double 0.15000000000000002; both engines must start from the same
    * bits (the oracle writes `CAST(0.15 AS DOUBLE)` likewise). */
  val Damping = 0.85
  val Teleport = 0.15
  val PrIters = 5

  /** Weighted PageRank over the nation-to-nation trade graph.
    *
    * The graph is DERIVED at full fact-table scale — supplier nation →
    * customer nation revenue from lineitem ⋈ orders ⋈ customer ⋈
    * supplier — then symmetrized (u↔v carry the combined trade volume)
    * and row-normalized into transition probabilities. That derivation
    * is the 100 TB part of the query: three broadcast dim joins + one
    * fact-fact shuffle + one partial+final agg down to ≤ |nations|²
    * rows. The 5 damped iterations then run as joins against the tiny
    * cached edge frame — each rank vector is |nations| rows, nothing
    * corpus-sized moves, and the whole loop is lazy (no per-round
    * driver action; contrast the CC loop, which needs a fixpoint
    * check). On a billion-node graph (e.g. a web-domain link graph)
    * the identical plan holds with the edge frame partitioned by src —
    * rank joins shuffle O(edges), the Pregel shape.
    *
    * Determinism: edge weights and out-weights are [[xsum]]-exact;
    * transition probs are double divisions of identical bits; each
    * round's inbound mass accumulates per dst in DECIMAL(27,10) (the
    * per-term product is a double, bit-identical in both engines), so
    * ranks are bit-identical at every round. Symmetrization means
    * every node has out-edges — no dangling-mass term. */
  val qPagerank: QueryFn = (s, dir) => {
    import s.implicits._
    val rev = Tables.lineitem(s, dir)
      .join(Tables.supplier(s, dir), $"l_suppkey" === $"s_suppkey")
      .join(Tables.orders(s, dir), $"l_orderkey" === $"o_orderkey")
      .join(Tables.customer(s, dir), $"o_custkey" === $"c_custkey")
      .groupBy($"s_nationkey".cast("long").as("u"), $"c_nationkey".cast("long").as("v"))
      .agg(xsum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("rev"))
      .where($"u" =!= $"v")
    val sym = rev.select($"u", $"v", $"rev")
      .unionByName(rev.select($"v".as("u"), $"u".as("v"), $"rev"))
      .groupBy($"u", $"v").agg(xsum($"rev").as("w"))
    val out = sym.groupBy($"u").agg(xsum($"w").as("wout"))
    // localCheckpoint: the iteration self-joins ranks (derived from p)
    // against p — breaking lineage here avoids 5 rounds of ambiguous-
    // attribute self-join resolution and re-derivation of the edge agg
    val p = sym.join(out, "u")
      .select($"u", $"v", ($"w" / $"wout").as("p"))
      .localCheckpoint(true)
    val n = p.select($"u").distinct().count()
    var ranks = p.select($"u".as("node")).distinct()
      .withColumn("r", lit(1.0) / lit(n.toDouble))
    for (_ <- 1 to PrIters) {
      ranks = p.join(ranks, p("u") === ranks("node"))
        .groupBy(p("v"))
        .agg((lit(Teleport) / lit(n.toDouble) +
          lit(Damping) * xsum(p("p") * ranks("r"))).as("r"))
        .select(col("v").as("node"), col("r"))
    }
    ranks.join(Tables.nation(s, dir), $"node" === $"n_nationkey".cast("long"))
      .select($"n_name".as("nation"), rnd($"r", 6).as("pr"))
      .orderBy($"pr".desc, $"nation")
  }

  /** First-order Markov transition model over per-user event streams:
    * P(next event type | current type), the model behind session
    * simulation and next-action prediction baselines.
    *
    * Shape: one shuffle by user_id for the `lead` window (each user's
    * stream sorts independently — at 100 TB this is the sessionize
    * partitioning, no global sort), then one partial+final agg on the
    * (src, dst) pair — ≤ |types|² rows. Totals per src come from a
    * second tiny agg joined back broadcast-style. Event order is
    * (ts, event_id) — a total order per user, so both engines pair
    * identical transitions. */
  val qMarkovTransitions: QueryFn = (s, dir) => {
    import s.implicits._
    val byUser = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"ts".asc, $"event_id".asc)
    val trans = Tables.events(s, dir)
      .select($"user_id", $"event_id", $"ts", $"event_type".as("src"))
      .withColumn("dst", lead($"src", 1).over(byUser))
      .where($"dst".isNotNull)
      .groupBy($"src", $"dst").agg(count(lit(1)).as("n"))
    val tot = trans.groupBy($"src").agg(sum($"n").as("tn"))
    trans.join(tot, "src")
      .select($"src", $"dst", $"n",
        rnd($"n".cast("double") / $"tn".cast("double"), 6).as("p"))
      .orderBy($"src", $"dst")
  }
}
