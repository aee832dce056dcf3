package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.pipeline.{Dedup, DedupConfig}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in `queries` is a pure (SparkSession, sfDir) => DataFrame
  * over the driver's parquet tables; `oracleSql` carries the equivalent
  * DuckDB SQL over the same tables (column names aligned — the driver
  * sorts columns by name before hashing).
  */
object SparkEntry {
  val cfg: DedupConfig = DedupConfig() // shingleK=3, 128 hashes, 64 bands, tau=0.5

  private def documents(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")

  private def docs(s: SparkSession, dir: String): DataFrame =
    Dedup.fromDocuments(documents(s, dir))

  private def pairsOut(df: DataFrame): DataFrame =
    df.select(col("id_a").as("doc_id_a"), col("id_b").as("doc_id_b"), col("jaccard"))

  /** Flagship query on /root/testdata/sf0.001: full dedup pipeline ->
    * cluster assignments. Driver smoke-checks rows>0.
    */
  def entry(spark: SparkSession): DataFrame =
    Dedup.clusters(Dedup.pairs(docs(spark, "/root/testdata/sf0.001"), cfg))

  // ---------------------------------------------------------------------
  // Shared oracle SQL fragments (DuckDB dialect). The pair CTE mirrors
  // Dedup's word-3-gram exact-Jaccard semantics; both LSH and exact
  // operators must reproduce it above threshold.
  // ---------------------------------------------------------------------
  private val pairsCte: String =
    """toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |sh AS (SELECT DISTINCT doc_id, w[i]||' '||w[i+1]||' '||w[i+2] AS s
      |       FROM toks, LATERAL unnest(range(1, len(w)-1)) AS g(i)),
      |card AS (SELECT doc_id, count(*) AS c FROM sh GROUP BY 1),
      |inter AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS i
      |          FROM sh a JOIN sh b ON a.s=b.s AND a.doc_id<b.doc_id
      |          GROUP BY 1, 2),
      |pairs AS (SELECT da AS doc_id_a, db AS doc_id_b,
      |                 i*1.0/(ca.c+cb.c-i) AS jaccard
      |          FROM inter
      |          JOIN card ca ON ca.doc_id=da JOIN card cb ON cb.doc_id=db
      |          WHERE i*1.0/(ca.c+cb.c-i) >= 0.5)""".stripMargin

  private val clustersCte: String =
    s"""$pairsCte,
       |edges AS (SELECT doc_id_a AS a, doc_id_b AS b FROM pairs
       |          UNION SELECT doc_id_b, doc_id_a FROM pairs),
       |reach(a, b) AS (SELECT a, b FROM edges
       |                UNION
       |                SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
       |clusters AS (SELECT a AS doc_id, least(min(b), a) AS cluster_id
       |             FROM reach GROUP BY a)""".stripMargin

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // J1+F3-F5: LSH banding -> candidate self-join -> exact verify ->
    // canonical dedup'd pairs (the reference generate_matches pipeline)
    "q_minhash_lsh_pairs" -> ((s, dir) => pairsOut(Dedup.pairs(docs(s, dir), cfg))),
    // correctness anchor: complete inverted-index exact-jaccard pairs
    "q_ngram_jaccard_pairs" -> ((s, dir) =>
      pairsOut(Dedup.exactJaccardPairs(docs(s, dir), cfg))),
    // A7: connected components (DBSCAN min_samples=1 semantics)
    "q_dup_clusters" -> ((s, dir) =>
      Dedup.clusters(Dedup.pairs(docs(s, dir), cfg))
        .select(col("id").as("doc_id"), col("cluster_id"))),
    // A6: cluster summary
    "q_cluster_sizes" -> ((s, dir) =>
      Dedup.clusters(Dedup.pairs(docs(s, dir), cfg))
        .groupBy("cluster_id").agg(count(lit(1)).as("n_docs"))),
    // A5: match-count per file (undirected edges, both directions)
    "q_match_counts" -> ((s, dir) => {
      val p = Dedup.pairs(docs(s, dir), cfg)
      p.select(col("id_a").as("doc_id"))
        .union(p.select(col("id_b").as("doc_id")))
        .groupBy("doc_id").agg(count(lit(1)).as("n_matches"))
    }),
    // exact dedup: hash-groupBy on normalized text (sha256 identity analog)
    "q_exact_dedup" -> ((s, dir) =>
      Dedup.exactDuplicates(docs(s, dir))),
    // SimHash near-dup pairs (no SQL-expressible oracle: xxhash64-based;
    // completeness property-tested in DedupPipelineSpec)
    "q_simhash_pairs" -> ((s, dir) => {
      val sigs = Dedup.signatures(Dedup.shingleSets(docs(s, dir), cfg), cfg)
      Dedup.simhashPairs(sigs, hammingMax = 3)
        .select(col("id_a").as("doc_id_a"), col("id_b").as("doc_id_b"), col("hamming"))
    })
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    "q_minhash_lsh_pairs" ->
      s"WITH $pairsCte SELECT doc_id_a, doc_id_b, jaccard FROM pairs",
    "q_ngram_jaccard_pairs" ->
      s"WITH $pairsCte SELECT doc_id_a, doc_id_b, jaccard FROM pairs",
    "q_dup_clusters" ->
      s"WITH RECURSIVE $clustersCte SELECT doc_id, cluster_id FROM clusters",
    "q_cluster_sizes" ->
      s"WITH RECURSIVE $clustersCte SELECT cluster_id, count(*) AS n_docs FROM clusters GROUP BY 1",
    "q_match_counts" ->
      (s"WITH $pairsCte, e AS (SELECT doc_id_a AS doc_id FROM pairs " +
        "UNION ALL SELECT doc_id_b FROM pairs) " +
        "SELECT doc_id, count(*) AS n_matches FROM e GROUP BY 1"),
    "q_exact_dedup" ->
      ("SELECT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS text_hash, " +
        "count(*) AS n_docs, min(doc_id) AS keeper_id FROM documents GROUP BY 1")
  )
}
