package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{BloomMightContain, CmsEstimate, CosineF, CosineQ8, DeletionVariantsExpr, Dist2F, DotF, HashEmbedExpr, HyperplaneSketchExpr, MinHashSigExpr, NearestCellExpr, NearestCellL2Expr, NfcNormalizeExpr, QuantErrI8, QuantizeI8, RollingHash, SimHashExpr, WordShinglesExpr}

/** Session extension installing the engine's native functions into the SQL
  * registry, so `SELECT rolling_hash(text)` works from pure SQL as well as
  * the Column API. Activate with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def register(
      ext: SparkSessionExtensions, name: String, className: String, arity: Int)(
      build: Seq[Expression] => Expression): Unit =
    ext.injectFunction((
      new FunctionIdentifier(name),
      new ExpressionInfo(className, name),
      (children: Seq[Expression]) => {
        require(children.length == arity, s"$name takes exactly $arity argument(s)")
        build(children)
      }))

  override def apply(ext: SparkSessionExtensions): Unit = {
    register(ext, "rolling_hash", classOf[RollingHash].getName, 1)(c => RollingHash(c.head))
    register(ext, "dot_f", classOf[DotF].getName, 2)(c => DotF(c(0), c(1)))
    register(ext, "cosine_f", classOf[CosineF].getName, 2)(c => CosineF(c(0), c(1)))
    register(ext, "hyperplane_sketch", classOf[HyperplaneSketchExpr].getName, 3)(c =>
      HyperplaneSketchExpr(c(0), c(1), c(2)))
    register(ext, "word_shingles", classOf[WordShinglesExpr].getName, 2)(c =>
      WordShinglesExpr(c(0), c(1)))
    register(ext, "word_chunks", classOf[graft.functions.WordChunksExpr].getName, 2)(c =>
      graft.functions.WordChunksExpr(c(0), c(1)))
    register(ext, "sim_hash", classOf[SimHashExpr].getName, 1)(c => SimHashExpr(c.head))
    register(ext, "minhash_sig", classOf[MinHashSigExpr].getName, 3)(c =>
      MinHashSigExpr(c(0), c(1), c(2)))
    register(ext, "deletion_variants", classOf[DeletionVariantsExpr].getName, 2)(c =>
      DeletionVariantsExpr(c(0), c(1)))
    register(ext, "quantize_i8", classOf[QuantizeI8].getName, 1)(c => QuantizeI8(c.head))
    register(ext, "quant_err_i8", classOf[QuantErrI8].getName, 1)(c => QuantErrI8(c.head))
    register(ext, "cosine_q8", classOf[CosineQ8].getName, 4)(c =>
      CosineQ8(c(0), c(1), c(2), c(3)))
    register(ext, "bloom_might_contain", classOf[BloomMightContain].getName, 2)(c =>
      BloomMightContain(c(0), c(1)))
    register(ext, "hash_embed", classOf[HashEmbedExpr].getName, 2)(c =>
      HashEmbedExpr(c(0), c(1)))
    register(ext, "cms_estimate", classOf[CmsEstimate].getName, 2)(c =>
      CmsEstimate(c(0), c(1)))
    register(ext, "nfc_normalize", classOf[NfcNormalizeExpr].getName, 1)(c =>
      NfcNormalizeExpr(c.head))
    register(ext, "stable_lit",
      classOf[graft.functions.StableLitExpr].getName, 1)(c =>
      graft.functions.StableLit.build(c.head))
    register(ext, "nearest_cell", classOf[NearestCellExpr].getName, 3)(c =>
      NearestCellExpr(c(0), c(1), c(2)))
    register(ext, "dist2_f", classOf[Dist2F].getName, 2)(c => Dist2F(c(0), c(1)))
    register(ext, "nearest_cell_l2", classOf[NearestCellL2Expr].getName, 3)(c =>
      NearestCellL2Expr(c(0), c(1), c(2)))
    // mergeable-sketch aggregates + serving probes (SketchAggs.scala);
    // the analyzer wraps the bare AggregateFunction in Complete mode
    register(ext, "kll_agg", classOf[graft.functions.KllAgg].getName, 2)(c =>
      graft.functions.KllAgg(c(0), c(1)))
    register(ext, "theta_agg", classOf[graft.functions.ThetaAgg].getName, 2)(c =>
      graft.functions.ThetaAgg(c(0), c(1)))
    register(ext, "kll_merge_agg", classOf[graft.functions.KllMergeAgg].getName, 2)(c =>
      graft.functions.KllMergeAgg(c(0), c(1)))
    register(ext, "theta_union_agg", classOf[graft.functions.ThetaUnionAgg].getName, 2)(c =>
      graft.functions.ThetaUnionAgg(c(0), c(1)))
    register(ext, "kll_quantile", classOf[graft.functions.KllQuantileExpr].getName, 2)(c =>
      graft.functions.KllQuantileExpr(c(0), c(1)))
    register(ext, "kll_rank", classOf[graft.functions.KllRankExpr].getName, 2)(c =>
      graft.functions.KllRankExpr(c(0), c(1)))
    register(ext, "kll_n", classOf[graft.functions.KllNExpr].getName, 1)(c =>
      graft.functions.KllNExpr(c.head))
    register(ext, "theta_estimate", classOf[graft.functions.ThetaEstimateExpr].getName, 1)(c =>
      graft.functions.ThetaEstimateExpr(c.head))
    register(ext, "theta_intersect_estimate",
      classOf[graft.functions.ThetaIntersectEstimateExpr].getName, 2)(c =>
      graft.functions.ThetaIntersectEstimateExpr(c(0), c(1)))
    register(ext, "theta_anotb_estimate",
      classOf[graft.functions.ThetaAnotBEstimateExpr].getName, 2)(c =>
      graft.functions.ThetaAnotBEstimateExpr(c(0), c(1)))
    register(ext, "cms_merge_agg", classOf[graft.functions.CmsMergeAgg].getName, 1)(c =>
      graft.functions.CmsMergeAgg(c.head))
    register(ext, "cms_estimate_row",
      classOf[graft.functions.CmsEstimateRow].getName, 2)(c =>
      graft.functions.CmsEstimateRow(c(0), c(1)))
  }
}
