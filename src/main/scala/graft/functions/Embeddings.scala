package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (Array[Float]) — the
  * training-data-pipeline ANN operators. Brute-force cosine top-k is the
  * exactness baseline (reference kd-tree k-NN role,
  * `generate_matches.py:57-62`); the SRP-LSH bucketed variant is the
  * scale path (bucket join instead of cross join).
  */
object Embeddings {

  /** Deterministic cosine similarity between two float-array columns,
    * accumulated left-to-right in double precision (kernel-backed,
    * codegen'd).
    */
  def cosine(a: Column, b: Column): Column = Expressions.cosineSim(a, b)

  /** Signed-random-projection signature: `bits` sign bits of dot
    * products with deterministic pseudo-random hyperplanes (kernel).
    */
  def srpSignature(v: Column, bits: Int, table: Int): Column =
    Expressions.srpSig(v, bits, table)

  /** Brute-force exact top-k cosine neighbors for each query row.
    * queries and corpus share schema (id, embedding). The corpus side is
    * broadcast when small; at scale use block-nested loops via
    * repartitioned crossJoin (Spark handles via
    * CartesianProduct/BroadcastNestedLoopJoin).
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = queries.select(col("id").as("query_id"), col("embedding").as("qe"))
    val c = corpus.select(col("id").as("neighbor_id"), col("embedding").as("ne"))
    val scored = q.crossJoin(c)
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosine(col("qe"), col("ne")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"),
        col("cosine"), col("rank"))
  }

  /** SRP-LSH approximate top-k: hash embeddings into `tables`
    * independent sign-bit buckets; candidates = rows sharing any bucket;
    * exact cosine + window top-k within candidates. Recall grows with
    * tables and shrinks with bits; property-tested in AnnSpec.
    */
  def srpTopK(emb: DataFrame, k: Int, bits: Int = 12, tables: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val keyed = emb.select(col("id"), col("embedding"),
      explode(array((0 until tables).map(t =>
        struct(lit(t).as("t"), srpSignature(col("embedding"), bits, t).as("sig"))): _*))
        .as("bucket"))
    val l = keyed.select(col("bucket"), col("id").as("query_id"), col("embedding").as("qe"))
    val r = keyed.select(col("bucket"), col("id").as("neighbor_id"), col("embedding").as("ne"))
    val cands = l.join(r, "bucket")
      .where(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "neighbor_id", "qe", "ne")
      .dropDuplicates("query_id", "neighbor_id")
      .withColumn("cosine", cosine(col("qe"), col("ne")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    cands.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rank"))
  }
}
