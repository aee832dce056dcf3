package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over an edge list — the clustering
  * step. Semantics: exactly the reference's DBSCAN(min_samples=1, eps)
  * over the thresholded pair graph, i.e. transitive closure of the match
  * pairs (`winnow/duplicate_detection/duplicate_detector.py:20-40`);
  * component id = min member id, so cluster ids are content-derived and
  * invariant across partitioning/parallelism (SURVEY.md §7.4(4)).
  *
  * Algorithm: alternating large-star / small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14) expressed as
  * DataFrame joins/aggregations. Converges in O(log^2 n) rounds; each
  * round is two shuffles. Lineage is cut with localCheckpoint() every
  * round so plans stay bounded on deep graphs.
  */
object ConnectedComponents {

  /** edges(src, dst) of any orderable key type ->
    * assignments(id, component) for every node incident to an edge.
    */
  def run(edges: DataFrame, maxIterations: Int = 50): DataFrame = {
    val spark = edges.sparkSession

    // canonical undirected edges as (big, small) with big > small;
    // self-loops dropped
    var e = edges
      .select(
        greatest(col("src"), col("dst")).as("u"),
        least(col("src"), col("dst")).as("v"))
      .where(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint(true)

    var iter = 0
    var converged = false
    while (!converged && iter < maxIterations) {
      // large-star: for each node u, connect every strictly-larger
      // neighbor w to m = min(Gamma(u) ∪ {u})
      val largeNbr = e.select(col("u"), col("v"))
        .union(e.select(col("v").as("u"), col("u").as("v")))
      val lsMin = largeNbr.groupBy("u").agg(min(col("v")).as("mv"))
        .select(col("u"), least(col("mv"), col("u")).as("m"))
      val ls = largeNbr.join(lsMin, "u")
        .where(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v")) // u > v by construction
        .where(col("u") =!= col("v"))
        .distinct()

      // small-star: edges are directed (u -> v, u > v); per u connect all
      // its smaller neighbors and u itself to m = min of them
      val ssMin = ls.groupBy("u").agg(min(col("v")).as("m"))
      val ss = ls.join(ssMin, "u")
        .select(col("v").as("u"), col("m").as("v")) // v >= m
        .union(ssMin.select(col("u"), col("m").as("v")))
        .where(col("u") =!= col("v"))
        .distinct()
        .localCheckpoint(true)

      // convergence: star-shaped forest = every u maps to exactly one v
      // and edge set unchanged
      val changed = ss.except(e).limit(1).count() + e.except(ss).limit(1).count()
      e.unpersist()
      e = ss
      converged = changed == 0
      iter += 1
    }
    require(converged, s"connected components did not converge in $maxIterations rounds")

    // e is now a star forest: (member, root). Add roots themselves.
    e.select(col("u").as("id"), col("v").as("component"))
      .union(e.select(col("v").as("id"), col("v").as("component")))
      .distinct()
  }
}
