package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression, ExpressionInfo, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** SQL registration for the graft custom expressions, two ways:
  *
  *  - [[GraftFunctions.register]]: into an existing session's function
  *    registry (tests, notebooks);
  *  - [[GraftExtensions]]: a `SparkSessionExtensions` installer for
  *    cluster deployments — `spark.sql.extensions=graft.functions.GraftExtensions`
  *    or `SparkSession.builder().withExtensions(new GraftExtensions)`.
  *
  * After either, plain SQL works:
  * {{{
  *   SELECT cosine_sim(a.embedding, b.embedding), simhash(tokens),
  *          minhash_sig(grams, 16), word_ngrams(tokens, 3)
  * }}}
  */
object GraftFunctions {

  private def intArg(e: Expression, fn: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn expects a literal int, got $other")
  }

  private def longArg(e: Expression, fn: String): Long = e match {
    case Literal(v: Int, _) => v.toLong
    case Literal(v: Long, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn expects a literal int/long, got $other")
  }

  /** A literal string-array argument. SQL callers write
    * `array('a', 'b')`, which reaches the builder as an unanalyzed
    * `CreateArray` of string literals (constant folding runs later);
    * a pre-folded array Literal is accepted too. */
  private def stringArrayArg(e: Expression, fn: String): Seq[String] = e match {
    case org.apache.spark.sql.catalyst.expressions.CreateArray(children, _) =>
      children.map {
        case Literal(s: org.apache.spark.unsafe.types.UTF8String, _) => s.toString
        case other => throw new IllegalArgumentException(
          s"$fn expects literal strings in the array, got $other")
      }
    case Literal(arr: org.apache.spark.sql.catalyst.util.ArrayData,
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType, _)) =>
      arr.toArray[org.apache.spark.unsafe.types.UTF8String](
        org.apache.spark.sql.types.StringType).map(_.toString).toSeq
    case other => throw new IllegalArgumentException(
      s"$fn expects a literal string array, got $other")
  }

  /** (name, builder) for every graft SQL function. cosine_sim takes raw
    * args: float/double arrays evaluate natively (same rule as the
    * Column API — other element types are an analysis error; cast
    * explicitly). */
  val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "cosine_sim" -> (es => CosineSimilarity(es(0), es(1))),
    "dot_product" -> (es => DotProduct(es(0), es(1))),
    "simhash" -> (es => SimHash(es.head)),
    "simhash_md5" -> (es => SimHashMd5(es.head)),
    "minhash_sig" -> (es => MinHashSig(es(0), intArg(es(1), "minhash_sig"))),
    "word_ngrams" -> (es => WordNGrams(es(0), intArg(es(1), "word_ngrams"))),
    "srp_sig" -> (es => SrpSig(es(0), intArg(es(1), "srp_sig"))),
    "cosine_sim_q8" -> (es => CosineSimQ8(es(0), es(1), es(2))),
    "quantize_q8" -> (es => QuantizeQ8(es(0))),
    // aggregates: the registry takes the bare AggregateFunction — the
    // analyzer wraps it into an AggregateExpression at resolution
    "space_saving_topk" -> (es => SpaceSavingTopK(es(0),
      intArg(es(1), "space_saving_topk"), intArg(es(2), "space_saving_topk"))),
    // single-quantile SQL form (basis points: 5000 = median); the
    // Column API (KllQuantiles.quantilesBp) takes a quantile list
    "kll_quantile" -> (es => KllQuantiles(es(0),
      Seq(intArg(es(1), "kll_quantile")), intArg(es(2), "kll_quantile"))),
    // bloom membership pair (graft.ops.Sketches' SQL face): the agg
    // builds the serialized filter over xxhash64(key) — same hashing as
    // the Column API — and might_contain probes it. The filter argument
    // must be a constant or scalar subquery (catalyst's own contract
    // for BloomFilterMightContain).
    "bloom_filter_agg" -> (es => new BloomFilterAggregate(
      new XxHash64(Seq(es(0))), longArg(es(1), "bloom_filter_agg"))),
    "bloom_might_contain" -> (es => BloomFilterMightContain(es(0),
      new XxHash64(Seq(es(1))))),
    // read side of Spark's built-in count_min_sketch aggregate
    "cms_estimate" -> (es => CmsEstimate(es(0), es(1))),
    // theta-style KMV distinct sketch: build + read sides (q61)
    "kmv_sketch" -> (es => KmvSketchAgg(es(0), intArg(es(1), "kmv_sketch"))),
    "kmv_estimate" -> (es => KmvEstimate(es(0))),
    "kmv_intersect" -> (es => KmvIntersect(es(0), es(1))),
    // membership count against a literal set (t02's stopword term)
    "token_set_count" -> (es => TokenSetCount(es(0),
      stringArrayArg(es(1), "token_set_count"))),
    // 2-D Morton interleave (q58's layout key)
    "zorder2" -> (es => ZOrder2(es(0), es(1))),
    // exact distinct-id bitmaps: build + re-aggregate + read (q145).
    // `id_`-prefixed throughout: Spark 4 ships its own bitmap_count /
    // bitmap_or_agg family and registry names must not shadow builtins
    "id_bitmap" -> (es => IdBitmapAgg(es(0), longArg(es(1), "id_bitmap"))),
    "id_bitmap_or" -> (es => BitmapOrAgg(es(0))),
    "id_bitmap_count" -> (es => BitmapCount(es(0))),
    "id_bitmap_and_count" -> (es => BitmapAndCount(es(0), es(1))))

  /** Register into an existing session (temp functions). */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
}

/** `SparkSessionExtensions` installer (see [[GraftFunctions]]). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.functions.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name),
        builder))
    }
    // semantics-preserving rewrites (each proves its implication in its
    // own spec): length guards ahead of edit-distance and substring
    // predicates
    ext.injectOptimizerRule(_ => graft.plans.LevenshteinLengthGuard)
    ext.injectOptimizerRule(_ => graft.plans.SubstringLengthGuard)
    // whole-operator extensions (logical node + physical exec)
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}
