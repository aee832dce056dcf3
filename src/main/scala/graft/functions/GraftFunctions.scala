package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL registration of the custom expressions so every operator is
  * callable from `spark.sql(...)` as well as the Dataset API
  * (SURVEY.md §2.10: "callable from both Dataset API and spark.sql").
  *
  * Two deployment shapes share one function table:
  *   - [[GraftFunctions.registerAll]] — imperative, session-scoped temp
  *     functions (tests, notebooks, embedded use).
  *   - [[GraftExtensions]] — `--conf spark.sql.extensions=graft.GraftExtensions`
  *     on spark-submit; functions are injected at session build time on
  *     every session of the cluster app, no driver code change needed.
  */
object GraftFunctions {

  /** (name, arity, builder) for every graft SQL function. Int parameters
    * are supplied as foldable literal arguments in SQL, e.g.
    * `SELECT minhash_sig(shingle_hashes(text, 3), 128) FROM pages`.
    */
  private def intArg(e: Expression): Int =
    e.eval(null).toString.toInt // foldable literal

  val functionTable: Seq[(String, Int, Seq[Expression] => Expression)] = Seq(
    ("shingle_hashes", 2, es => Expressions.ShingleHashes(es.head, intArg(es(1)))),
    ("minhash_sig", 2, es => Expressions.MinHashSig(es.head, intArg(es(1)))),
    ("simhash64", 1, es => Expressions.SimHash64(es.head)),
    ("band_keys", 3, es => Expressions.BandKeys(es.head, intArg(es(1)), intArg(es(2)))),
    ("jaccard_sets", 2, es => Expressions.JaccardLongSets(es.head, es(1))),
    ("cosine_sim", 2, es => Expressions.CosineSim(es.head, es(1))),
    ("srp_sig", 3, es => Expressions.SrpSig(es.head, intArg(es(1)), intArg(es(2)))),
    ("winnow_hashes", 3, es => Expressions.WinnowHashes(es.head, intArg(es(1)), intArg(es(2)))),
    ("repetition_stats", 1, es => Expressions.RepetitionStats(es.head)),
    ("intersect_count", 2, es => Expressions.IntersectCountLongSets(es.head, es(1))),
    ("compression_ratio", 1, es => Expressions.CompressionRatio(es.head))
  )

  private[graft] def checked(name: String, arity: Int,
                      builder: Seq[Expression] => Expression): Seq[Expression] => Expression =
    (exprs: Seq[Expression]) => {
      require(exprs.length == arity, s"$name expects $arity arguments")
      builder(exprs)
    }

  /** Register all graft SQL functions on an existing session (temp
    * functions: session-scoped, no catalog persistence).
    */
  def registerAll(spark: SparkSession): Unit =
    functionTable.foreach { case (name, arity, builder) =>
      spark.sessionState.functionRegistry.registerFunction(
        FunctionIdentifier(name),
        new ExpressionInfo("graft.functions.Expressions", name),
        checked(name, arity, builder))
    }
}

