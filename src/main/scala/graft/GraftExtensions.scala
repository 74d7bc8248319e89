package graft

import org.apache.spark.sql.SparkSessionExtensions

/** Session-extension entry point for deployments:
  *
  * {{{
  * spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * }}}
  *
  * installs the engine's planner strategy (native per-group top-k) and all
  * SQL-callable native functions at session build time — the supported way
  * to extend every session of a cluster without code changes. Local code
  * paths get the same setup lazily via [[Sessions.tune]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import GraftExtensions.arity

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectPlannerStrategy(_ => plans.TopKStrategy)
    // discarded-rank window top-k -> native bounded-heap operator
    e.injectOptimizerRule(_ => plans.TopKWindowRewrite)
    e.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("cosine_similarity"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[functions.CosineSimilarity].getName, "cosine_similarity"),
        (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          { arity("cosine_similarity", 2, exprs); functions.CosineSimilarity(exprs(0), exprs(1)) }))
    e.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("dot_product"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[functions.DotProduct].getName, "dot_product"),
        (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          { arity("dot_product", 2, exprs); functions.DotProduct(exprs(0), exprs(1)) }))
    e.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("sign_bits"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[functions.SignBits].getName, "sign_bits"),
        (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          { arity("sign_bits", 1, exprs); functions.SignBits(exprs.head) }))
    e.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("simhash64"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[functions.SimHash64].getName, "simhash64"),
        (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          { arity("simhash64", 1, exprs); functions.SimHash64(exprs.head) }))
    e.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("minhash_signature"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[functions.MinHashSignature].getName, "minhash_signature"),
        (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          { arity("minhash_signature", 1, exprs); functions.MinHashSignature(exprs.head, 16) }))
    e.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("word_shingles"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[functions.WordShingles].getName, "word_shingles"),
        (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          { arity("word_shingles", 1, exprs); functions.WordShingles(exprs.head, 3) }))
    e.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("cdc_boundaries"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[functions.CdcBoundaries].getName, "cdc_boundaries"),
        (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          { arity("cdc_boundaries", 1, exprs); functions.CdcBoundaries(exprs.head, 8, 64) }))
    e.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("jaro_winkler"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[functions.JaroWinkler].getName, "jaro_winkler"),
        (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          { arity("jaro_winkler", 2, exprs); functions.JaroWinkler(exprs(0), exprs(1)) }))
    e.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("winnow_fingerprints"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[functions.WinnowFingerprints].getName, "winnow_fingerprints"),
        (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          { arity("winnow_fingerprints", 1, exprs); functions.WinnowFingerprints(exprs.head, 8, 4) }))
    e.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("kll_agg"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[functions.KllBuildAgg].getName, "kll_agg"),
        (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          { arity("kll_agg", 1, exprs); functions.KllBuildAgg(exprs.head) }))
    e.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("kll_merge"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[functions.KllMergeAgg].getName, "kll_merge"),
        (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          { arity("kll_merge", 1, exprs); functions.KllMergeAgg(exprs.head) }))
    e.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("kll_quantile"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[functions.KllQuantile].getName, "kll_quantile"),
        (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          { arity("kll_quantile", 2, exprs); functions.KllQuantile(exprs(0), exprs(1)) }))
    e.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("kll_n"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[functions.KllN].getName, "kll_n"),
        (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          { arity("kll_n", 1, exprs); functions.KllN(exprs.head) }))
    e.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("theta_agg"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[functions.ThetaBuildAgg].getName, "theta_agg"),
        (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          { arity("theta_agg", 1, exprs); functions.ThetaBuildAgg(exprs.head) }))
    e.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("theta_merge"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[functions.ThetaMergeAgg].getName, "theta_merge"),
        (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          { arity("theta_merge", 1, exprs); functions.ThetaMergeAgg(exprs.head) }))
    e.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("theta_estimate"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[functions.ThetaEstimate].getName, "theta_estimate"),
        (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          { arity("theta_estimate", 1, exprs); functions.ThetaEstimate(exprs.head) }))
    e.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("theta_intersect_est"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[functions.ThetaIntersectEst].getName, "theta_intersect_est"),
        (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          { arity("theta_intersect_est", 2, exprs)
            functions.ThetaIntersectEst(exprs(0), exprs(1)) }))
    e.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("theta_anotb_est"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[functions.ThetaANotBEst].getName, "theta_anotb_est"),
        (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          { arity("theta_anotb_est", 2, exprs)
            functions.ThetaANotBEst(exprs(0), exprs(1)) }))
    e.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("jl_project"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[functions.JlProject].getName, "jl_project"),
        (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          { arity("jl_project", 1, exprs); functions.JlProject(exprs.head) }))
    e.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("sq_dist_long"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[functions.SqDistLong].getName, "sq_dist_long"),
        (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          { arity("sq_dist_long", 2, exprs)
            functions.SqDistLong(exprs(0), exprs(1)) }))
  }
}

object GraftExtensions {
  /** Wrong arity must be a clear analysis-time error, not a silent arg drop
    * or an IndexOutOfBounds at plan time.
    */
  private[graft] def arity(name: String, n: Int,
      exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]): Unit =
    if (exprs.length != n)
      throw new org.apache.spark.sql.AnalysisException(
        errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
        messageParameters = Map(
          "functionName" -> name,
          "expectedNum" -> n.toString,
          "actualNum" -> exprs.length.toString,
          "docroot" -> "https://spark.apache.org/docs/latest"))
}
