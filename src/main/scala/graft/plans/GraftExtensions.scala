package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

/** Session extension wiring for graft's native expressions.
  *
  * Two ways in:
  *  - at session build time: `SparkSession.builder.withExtensions(new
  *    GraftExtensions)` (or config `spark.sql.extensions=graft.plans
  *    .GraftExtensions`) — the idiomatic deployment path;
  *  - post-hoc on a live session: [[GraftExtensions.ensureRegistered]] —
  *    used by query modules so they work against ANY caller-provided session
  *    (the driver contract hands us a session we didn't build).
  *
  * After either, `graft_dot` / `graft_cosine` resolve in SQL text and via
  * `functions.call_function`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.descriptors.foreach(ext.injectFunction)
    ext.injectOptimizerRule(_ => VectorFoldRewrite)
    ext.injectPlannerStrategy(_ => AsOfJoinStrategy)
  }
}

object GraftExtensions {
  private type Builder = Seq[Expression] => Expression

  private def binary(name: String, usage: String, mk: (Expression, Expression) => Expression)
      : (FunctionIdentifier, ExpressionInfo, Builder) =
    (new FunctionIdentifier(name),
      new ExpressionInfo(classOf[GraftExtensions].getName, name, usage),
      { args =>
        require(args.length == 2, s"$name expects 2 arguments, got ${args.length}")
        mk(args(0), args(1))
      })

  val descriptors: Seq[(FunctionIdentifier, ExpressionInfo, Builder)] = Seq(
    binary("graft_dot", "graft_dot(a, b) - double dot product of two numeric arrays",
      DotProduct(_, _)),
    binary("graft_cosine", "graft_cosine(a, b) - cosine similarity of two numeric arrays",
      CosineSimilarity(_, _)),
    (new FunctionIdentifier("graft_simhash16"),
      new ExpressionInfo(classOf[GraftExtensions].getName, "graft_simhash16",
        "graft_simhash16(text) - one-pass 16-bit SimHash of whitespace-tokenized text"),
      { args =>
        require(args.length == 1, s"graft_simhash16 expects 1 argument, got ${args.length}")
        SimHash16(args.head)
      }),
    (new FunctionIdentifier("graft_simhash60"),
      new ExpressionInfo(classOf[GraftExtensions].getName, "graft_simhash60",
        "graft_simhash60(text) - one-pass 60-bit SimHash of whitespace-tokenized text"),
      { args =>
        require(args.length == 1, s"graft_simhash60 expects 1 argument, got ${args.length}")
        SimHash60(args.head)
      }),
    (new FunctionIdentifier("graft_html_stats"),
      new ExpressionInfo(classOf[GraftExtensions].getName, "graft_html_stats",
        "graft_html_stats(html) - one-pass visible-text extraction: " +
          "STRUCT<text, n_links, n_scripts, n_tags>"),
      { args =>
        require(args.length == 1, s"graft_html_stats expects 1 argument, got ${args.length}")
        HtmlStats(args.head)
      }),
    (new FunctionIdentifier("graft_html_links"),
      new ExpressionInfo(classOf[GraftExtensions].getName, "graft_html_links",
        "graft_html_links(html) - one-pass anchor-href outlink extraction: " +
          "ARRAY<STRING> in document order"),
      { args =>
        require(args.length == 1, s"graft_html_links expects 1 argument, got ${args.length}")
        HtmlLinks(args.head)
      }),
    (new FunctionIdentifier("graft_utf8_stats"),
      new ExpressionInfo(classOf[GraftExtensions].getName, "graft_utf8_stats",
        "graft_utf8_stats(bytes) - one-pass UTF-8 well-formedness audit: " +
          "STRUCT<n_valid_chars, n_invalid_bytes, n_multibyte, n_control, is_valid>"),
      { args =>
        require(args.length == 1, s"graft_utf8_stats expects 1 argument, got ${args.length}")
        Utf8Stats(args.head)
      }),
    (new FunctionIdentifier("graft_topk"),
      new ExpressionInfo(classOf[GraftExtensions].getName, "graft_topk",
        "graft_topk(score, id, k) - bounded per-group top-k aggregate, (score DESC, id ASC)"),
      { args =>
        require(args.length == 3, s"graft_topk expects 3 arguments, got ${args.length}")
        val k = args(2) match {
          case Literal(v: Int, IntegerType) if v > 0 => v
          case other => throw new IllegalArgumentException(
            s"graft_topk k must be a positive INT literal, got $other")
        }
        TopKAggregate(args(0), args(1), k)
      }),
    (new FunctionIdentifier("graft_bottomk"),
      new ExpressionInfo(classOf[GraftExtensions].getName, "graft_bottomk",
        "graft_bottomk(hash, value, k) - k smallest distinct hashes with payload, " +
          "ARRAY<STRUCT<h,v>> ASC by h (KMV sketch / deterministic bottom-k sample)"),
      { args =>
        require(args.length == 3, s"graft_bottomk expects 3 arguments, got ${args.length}")
        val k = args(2) match {
          case Literal(v: Int, IntegerType) if v > 0 => v
          case other => throw new IllegalArgumentException(
            s"graft_bottomk k must be a positive INT literal, got $other")
        }
        BottomKAggregate(args(0), args(1), k)
      }),
    (new FunctionIdentifier("graft_qsketch"),
      new ExpressionInfo(classOf[GraftExtensions].getName, "graft_qsketch",
        "graft_qsketch(value) - mergeable log-linear quantile sketch over " +
          "non-negative BIGINT units, ARRAY<STRUCT<b,cnt>> ASC by bucket " +
          "(constant ~8KB state per group, <= 1/32 relative error)"),
      { args =>
        require(args.length == 1, s"graft_qsketch expects 1 argument, got ${args.length}")
        QuantileSketchAggregate(args(0))
      }),
    (new FunctionIdentifier("graft_qsketch_merge"),
      new ExpressionInfo(classOf[GraftExtensions].getName, "graft_qsketch_merge",
        "graft_qsketch_merge(sketch) - merge already-built graft_qsketch " +
          "summaries (rollup without re-reading raw rows; bit-identical to " +
          "sketching the union)"),
      { args =>
        require(args.length == 1,
          s"graft_qsketch_merge expects 1 argument, got ${args.length}")
        QuantileSketchMergeAggregate(args(0))
      }),
    (new FunctionIdentifier("graft_hll"),
      new ExpressionInfo(classOf[GraftExtensions].getName, "graft_hll",
        "graft_hll(hash) - HyperLogLog registers (p=8, constant 256B state) " +
          "over a 60-bit md5-derived hash, ARRAY<STRUCT<b,r>> ASC by bucket"),
      { args =>
        require(args.length == 1, s"graft_hll expects 1 argument, got ${args.length}")
        HllAggregate(args(0))
      }),
    (new FunctionIdentifier("graft_hll_merge"),
      new ExpressionInfo(classOf[GraftExtensions].getName, "graft_hll_merge",
        "graft_hll_merge(sketch) - element-wise-max union of graft_hll " +
          "register sets (rollup without re-reading raw rows; bit-identical " +
          "to sketching the union)"),
      { args =>
        require(args.length == 1,
          s"graft_hll_merge expects 1 argument, got ${args.length}")
        HllMergeAggregate(args(0))
      }),
    (new FunctionIdentifier("graft_bloom"),
      new ExpressionInfo(classOf[GraftExtensions].getName, "graft_bloom",
        "graft_bloom(hash) - 32768-bit Bloom filter (the four 15-bit lanes " +
          "of a 60-bit md5 hash) as ARRAY<BIGINT>[512]; merge is bitwise OR"),
      { args =>
        require(args.length == 1, s"graft_bloom expects 1 argument, got ${args.length}")
        BloomAggregate(args(0))
      }),
    (new FunctionIdentifier("graft_cms"),
      new ExpressionInfo(classOf[GraftExtensions].getName, "graft_cms",
        "graft_cms(hash) - Count-Min sketch (4 rows x 64 buckets, constant " +
          "2KB state) over a 60-bit md5-derived hash, ARRAY<STRUCT<cell,cnt>> " +
          "ASC by cell; estimates never undercount"),
      { args =>
        require(args.length == 1, s"graft_cms expects 1 argument, got ${args.length}")
        CmsAggregate(args.head)
      }),
    (new FunctionIdentifier("graft_cms_merge"),
      new ExpressionInfo(classOf[GraftExtensions].getName, "graft_cms_merge",
        "graft_cms_merge(sketch) - element-wise sum of graft_cms summaries " +
          "(rollup without re-reading raw rows; bit-identical to sketching " +
          "the union)"),
      { args =>
        require(args.length == 1,
          s"graft_cms_merge expects 1 argument, got ${args.length}")
        CmsMergeAggregate(args.head)
      }),
    (new FunctionIdentifier("graft_mgsketch"),
      new ExpressionInfo(classOf[GraftExtensions].getName, "graft_mgsketch",
        "graft_mgsketch(item, k) - Misra-Gries heavy-hitters summary, at " +
          "most k counters; every item with frequency > n/(k+1) is present"),
      { args =>
        require(args.length == 2, s"graft_mgsketch expects 2 arguments, got ${args.length}")
        val k = args(1) match {
          case Literal(v: Int, IntegerType) if v > 0 => v
          case other => throw new IllegalArgumentException(
            s"graft_mgsketch k must be a positive INT literal, got $other")
        }
        MisraGriesAggregate(args(0), k)
      }))

  /** Idempotently register the functions + the HOF→native rewrite on an
    * existing session (builder-time extensions can't be added post-hoc;
    * the optimizer rule goes through the experimental-methods hook instead).
    */
  def ensureRegistered(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    descriptors.foreach { case (id, info, builder) =>
      if (!reg.functionExists(id)) reg.registerFunction(id, info, builder)
    }
    if (!spark.experimental.extraOptimizations.contains(VectorFoldRewrite)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ VectorFoldRewrite
    }
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    }
  }
}
