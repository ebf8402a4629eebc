package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph analytics block (SURVEY.md §2.9 adjacency): iterative computations
  * over an edge table derived from the relational schema — the Pregel shape
  * (per-iteration keyed join + aggregate) expressed as static DataFrame
  * plans, complementing the connected-components operators in [[Llm]]
  * (`qDedupGroups` / `qEntityGroups`).
  */
object Graph {

  /** §2.9 PageRank (r8) — 5 power-iteration rounds, damping 0.85, over the
    * bipartite supplier↔part graph induced by lineitem (both directions, so
    * every node has out-degree ≥ 1 and the walk has no dangling mass).
    *
    * Cross-engine parity: ranks live as BIGINT nano-units end to end.
    * Init = 1e9 div N; each round's contribution is ((r·17) div 20) div
    * outdeg (0.85 = 17/20 exactly) and the teleport term is 15e7 div N —
    * pure integer arithmetic, so the per-node sum is order-independent and
    * the result is bit-identical to the oracle's unrolled CTEs under any
    * partitioning (the same reasoning as the integer-micro k-means
    * centroids in [[graft.etl.AnnIndex]]).
    *
    * Scale shape: each round is one equi-join of the rank frame against the
    * edge table on src (AQE broadcasts the rank side while it fits — it is
    * node-count-sized, not edge-count-sized) followed by one hash
    * aggregation on dst: the Pregel round shape, O(edges) shuffled per
    * round with map-side partial sums. 5 static rounds keep the lineage
    * shallow; a production run at higher iteration counts would checkpoint
    * every ~10 rounds like the CC operators do. */
  def qPagerank(spark: SparkSession, dir: String): DataFrame = {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val e0 = li.select(concat(lit("S"), col("l_suppkey")).as("src"),
                       concat(lit("P"), col("l_partkey")).as("dst")).distinct()
    val edges = e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
    val od = edges.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val n = od.agg(count(lit(1)).as("n_nodes"))
    var ranks = od.crossJoin(broadcast(n))
      .select(col("src").as("node"), col("outdeg"),
        expr("1000000000L div n_nodes").as("r"))
    for (_ <- 1 to 5) {
      val contrib = ranks.join(edges, col("node") === col("src"))
        .select(col("dst"), expr("r * 17 div 20 div outdeg").as("c"))
        .groupBy("dst").agg(sum("c").as("s"))
      ranks = contrib.join(od, col("dst") === col("src"))
        .crossJoin(broadcast(n))
        .select(col("dst").as("node"), col("outdeg"),
          expr("150000000L div n_nodes + s").as("r"))
    }
    ranks.select(col("node"), col("r").as("rank_nano"))
      .orderBy(col("rank_nano").desc, col("node"))
      .limit(20)
  }
}
