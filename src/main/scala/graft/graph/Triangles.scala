package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed triangle counting by degree orientation (the
  * Suri–Vassilvitskii / "node-iterator++" MPC scheme): orient every
  * undirected edge from its lower-(degree, id) endpoint to the higher
  * one, build wedges only from ORIENTED out-neighbourhoods, and close
  * each wedge against the oriented edge list.
  *
  * Why orientation is the whole game at scale: wedge volume is
  * Σ_v outdeg(v)², and orienting by degree caps every out-degree at
  * O(√m), so wedges are O(m^{3/2}) TOTAL — a hub with 10M neighbours in
  * a raw 100 TB edge list would otherwise emit 10¹⁴ wedges from one key
  * (the canonical straggler), but oriented it only fans out to its
  * few higher-degree peers. Every triangle {a,b,c} is counted exactly
  * once: orientation is a total order (ties broken by id), so the
  * triangle's unique minimum vertex forms the wedge and the edge
  * b→c closes it in one direction only.
  */
object Triangles {

  /** Per-node triangle participation counts from an undirected edge list
    * (`src`, `dst`; duplicates/self-loops tolerated). Output: (node,
    * n_triangles) for nodes in ≥1 triangle.
    *
    * Plan: dedup edges → degree agg → orient (join degrees twice, both
    * sides shuffle on node id) → wedge self-join on the low vertex →
    * close against oriented edges on (b, c). The close join's build side
    * is the oriented edge list itself; at cluster scale both sides hash-
    * partition on the (b, c) pair, and AQE handles residual skew. */
  def triangleCounts(edges: DataFrame): DataFrame = {
    val und = edges.select(col("src").cast("string").as("a"),
        col("dst").cast("string").as("b"))
      .filter(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("u"),
        greatest(col("a"), col("b")).as("v"))
      .distinct()
    val deg = und.select(explode(array(col("u"), col("v"))).as("n"))
      .groupBy("n").agg(count(lit(1)).as("d"))
    // Orient u—v from the (degree, id)-smaller endpoint to the larger.
    val oriented = und
      .join(deg.withColumnRenamed("n", "u").withColumnRenamed("d", "du"), "u")
      .join(deg.withColumnRenamed("n", "v").withColumnRenamed("d", "dv"), "v")
      .select(
        when(col("du") < col("dv") ||
          (col("du") === col("dv") && col("u") < col("v")),
          struct(col("u").as("s"), col("v").as("t")))
          .otherwise(struct(col("v").as("s"), col("u").as("t"))).as("e"))
      .select(col("e.s").as("s"), col("e.t").as("t"))
      // r17: checkpoint the oriented list PRE-PARTITIONED by the wedge
      // key (guide §2.4 — localCheckpoint preserves partitioning, and
      // alias projection carries it to both wedge sides), so the wedge
      // self-join below needs NO exchange on either side and its
      // Σ outdeg² explode runs at the session's parallelism instead of
      // the 1–2 AQE-coalesced partitions the orientation join left.
      // One keyed exchange of the m-row list replaces the join's two.
      .repartition(edges.sparkSession.sparkContext.defaultParallelism,
        col("s"))
      .localCheckpoint() // read 3× below (two wedge sides + the closer)
    // Wedges (a; b, c) from a's oriented out-neighbours, b < c so each
    // unordered pair appears once; close when b—c is an oriented edge
    // (orientation of the closing edge is unknown — match either way is
    // unnecessary: b,c are both degree-above a, and b<c by id does NOT
    // imply orientation b→t, so test both columns via least/greatest
    // normalization at build time instead).
    val e1 = oriented.select(col("s").as("a"), col("t").as("b"))
    val e2 = oriented.select(col("s").as("a"), col("t").as("c"))
    val wedges = e1.join(e2, Seq("a")).filter(col("b") < col("c"))
    val closer = oriented.select(
      least(col("s"), col("t")).as("b"), greatest(col("s"), col("t")).as("c"))
    val tris = wedges.join(closer, Seq("b", "c"))
    tris.select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_triangles"))
  }
}
