package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Expressions

/** Query-by-example template search — the reference's third entry point
  * (`template_matching.py`; engine `winnow/search_engine/template_matching.py:
  * 122-166`): a SMALL set of query templates matched against the whole
  * corpus. The template side is broadcast (J10: "template x frame cross
  * join" -> broadcast join against corpus units); scoring is shingle
  * Jaccard containment (what fraction of the template's shingles occur
  * in the doc) plus an exact-substring flag, thresholded like the
  * reference's 0.07 cosine cutoff (`template_matching.py:16`).
  */
object TemplateSearch {

  /** templates(template_id, text) X docs(id, text) ->
    * (template_id, doc_id, coverage, contained) for coverage >= minCoverage.
    */
  def search(templates: DataFrame, docs: DataFrame, k: Int = 3,
             minCoverage: Double = 0.5): DataFrame = {
    val t = broadcast(templates.select(
      col("template_id"),
      Expressions.shingleHashes(col("text"), k).as("t_sh"),
      col("text").as("t_text")))
    val d = docs.select(col("id").as("doc_id"),
      Expressions.shingleHashes(col("text"), k).as("d_sh"),
      col("text").as("d_text"))
    d.join(t) // broadcast nested loop by design: |templates| is tiny
      .withColumn("inter", size(array_intersect(col("t_sh"), col("d_sh"))))
      .withColumn("coverage",
        when(size(col("t_sh")) === 0, 0.0)
          .otherwise(col("inter").cast("double") / size(col("t_sh"))))
      .where(col("coverage") >= minCoverage)
      .withColumn("contained", col("d_text").contains(col("t_text")))
      .select(col("template_id"), col("doc_id"), col("coverage"), col("contained"))
  }
}
