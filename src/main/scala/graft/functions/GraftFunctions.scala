package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL registration of the custom expressions so every operator is
  * callable from `spark.sql(...)` as well as the Dataset API
  * (SURVEY.md §2.10: "callable from both Dataset API and spark.sql").
  * Temp functions: session-scoped, no catalog persistence.
  */
object GraftFunctions {

  private def register(spark: SparkSession, name: String, arity: Int,
                       builder: Seq[Expression] => Expression): Unit = {
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier(name),
      new ExpressionInfo("graft.functions.Expressions", name),
      (exprs: Seq[Expression]) => {
        require(exprs.length == arity, s"$name expects $arity arguments")
        builder(exprs)
      })
  }

  /** Register all graft SQL functions on the session. Int parameters are
    * supplied as literal arguments in SQL, e.g.
    * `SELECT minhash_sig(shingle_hashes(text, 3), 128) FROM pages`.
    */
  def registerAll(spark: SparkSession): Unit = {
    def intArg(e: Expression): Int =
      e.eval(null).toString.toInt // foldable literal

    register(spark, "shingle_hashes", 2,
      es => Expressions.ShingleHashes(es.head, intArg(es(1))))
    register(spark, "minhash_sig", 2,
      es => Expressions.MinHashSig(es.head, intArg(es(1))))
    register(spark, "simhash64", 1,
      es => Expressions.SimHash64(es.head))
    register(spark, "band_keys", 3,
      es => Expressions.BandKeys(es.head, intArg(es(1)), intArg(es(2))))
    register(spark, "jaccard_sets", 2,
      es => Expressions.JaccardLongSets(es.head, es(1)))
    register(spark, "cosine_sim", 2,
      es => Expressions.CosineSim(es.head, es(1)))
    register(spark, "srp_sig", 3,
      es => Expressions.SrpSig(es.head, intArg(es(1)), intArg(es(2))))
    register(spark, "winnow_hashes", 3,
      es => Expressions.WinnowHashes(es.head, intArg(es(1)), intArg(es(2))))
  }
}
