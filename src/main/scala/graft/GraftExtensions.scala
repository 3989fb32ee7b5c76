package graft

import org.apache.spark.sql.{GraftBridge, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.{IntegerType, LongType}

import graft.functions.expr._

/** SQL surface for graft's custom Catalyst expressions — the idiomatic
  * Spark extension point: add
  * `spark.sql.extensions=graft.GraftExtensions` at session build and
  * every kernel below is callable from `spark.sql(...)` exactly like a
  * built-in, fully inside whole-stage codegen (these are compiled
  * expressions, not UDFs). For a session built without the config,
  * [[GraftExtensions.registerAll]] installs the same registry entries
  * post-hoc.
  *
  * Scalar/structural parameters (k, seed, window, bits, …) must be
  * integer literals — they parameterize the generated code. Learned-state
  * expressions (NearestCells, PqEncode, …) are deliberately NOT here:
  * their codebooks/centroids are runtime arrays with no SQL-literal
  * form; they stay Column-API-only behind their operators.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach(ext.injectFunction)
    GraftExtensions.tableFunctions.foreach(ext.injectTableFunction)
  }
}

object GraftExtensions {
  type Description =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  private def litInt(e: Expression, fn: String, arg: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case Literal(v: Long, LongType) => v.toInt
    case other => throw new IllegalArgumentException(
      s"$fn: $arg must be an integer literal, got $other")
  }

  private def litLong(e: Expression, fn: String, arg: String): Long = e match {
    case Literal(v: Int, IntegerType) => v.toLong
    case Literal(v: Long, LongType) => v
    case other => throw new IllegalArgumentException(
      s"$fn: $arg must be an integer literal, got $other")
  }

  private def arity(fn: String, args: Seq[Expression], n: Int): Unit =
    require(args.size == n, s"$fn expects $n arguments, got ${args.size}")

  private def d(name: String, clazz: Class[_])(
      builder: Seq[Expression] => Expression): Description =
    (FunctionIdentifier(name), new ExpressionInfo(clazz.getCanonicalName, name),
      builder)

  /** Every registered function, name -> builder. */
  val functions: Seq[Description] = Seq(
    d("graft_simhash64", classOf[SimHash64]) { args =>
      arity("graft_simhash64", args, 1); SimHash64(args.head)
    },
    d("graft_minhash", classOf[MinHashSignature]) { args =>
      arity("graft_minhash", args, 3)
      MinHashSignature(args.head,
        litInt(args(1), "graft_minhash", "k"),
        litLong(args(2), "graft_minhash", "seed"))
    },
    d("graft_rolling_fingerprint", classOf[RollingFingerprint]) { args =>
      arity("graft_rolling_fingerprint", args, 2)
      RollingFingerprint(args.head,
        litInt(args(1), "graft_rolling_fingerprint", "window"))
    },
    d("graft_nfc", classOf[NfcNormalize]) { args =>
      arity("graft_nfc", args, 1); NfcNormalize(args.head)
    },
    d("graft_shingles", classOf[ShingleSet]) { args =>
      arity("graft_shingles", args, 2)
      ShingleSet(args.head, litInt(args(1), "graft_shingles", "n"))
    },
    d("graft_shingle_window_hashes", classOf[ShingleWindowHashes]) { args =>
      arity("graft_shingle_window_hashes", args, 2)
      ShingleWindowHashes(args.head,
        litInt(args(1), "graft_shingle_window_hashes", "n"))
    },
    d("graft_cosine", classOf[CosineSimilarity]) { args =>
      arity("graft_cosine", args, 2); CosineSimilarity(args.head, args(1))
    },
    d("graft_dot", classOf[DotProduct]) { args =>
      arity("graft_dot", args, 2); DotProduct(args.head, args(1))
    },
    d("graft_vec_sub", classOf[VectorSub]) { args =>
      arity("graft_vec_sub", args, 2); VectorSub(args.head, args(1))
    },
    d("graft_hyperplane_sigs", classOf[HyperplaneSigs]) { args =>
      arity("graft_hyperplane_sigs", args, 5)
      HyperplaneSigs(args.head,
        litInt(args(1), "graft_hyperplane_sigs", "planes"),
        litInt(args(2), "graft_hyperplane_sigs", "tables"),
        litInt(args(3), "graft_hyperplane_sigs", "dim"),
        litLong(args(4), "graft_hyperplane_sigs", "seed"))
    },
    d("graft_bucket_probes", classOf[BucketProbes]) { args =>
      arity("graft_bucket_probes", args, 2)
      BucketProbes(args.head, litInt(args(1), "graft_bucket_probes", "planes"))
    },
    d("graft_zvalue", classOf[ZValue]) { args =>
      arity("graft_zvalue", args, 3)
      ZValue(args.head, args(1), litInt(args(2), "graft_zvalue", "bitsPer"))
    },
    // variadic: graft_zvalue_n(d1, ..., dn, bitsPer)
    d("graft_zvalue_n", classOf[ZValueN]) { args =>
      require(args.size >= 2,
        s"graft_zvalue_n expects (d1, ..., dn, bitsPer), got ${args.size} args")
      ZValueN(args.init, litInt(args.last, "graft_zvalue_n", "bitsPer"))
    },
    d("graft_string_prefix_key", classOf[StringPrefixKey]) { args =>
      arity("graft_string_prefix_key", args, 1); StringPrefixKey(args.head)
    },
    // aggregates: the analyzer wraps a bare AggregateFunction returned
    // from a registry builder in AggregateExpression (builtin pattern)
    d("graft_bounded_topk", classOf[BoundedTopK]) { args =>
      arity("graft_bounded_topk", args, 2)
      BoundedTopK(args.head, litInt(args(1), "graft_bounded_topk", "k"))
    },
    d("graft_bounded_mink_str", classOf[BoundedMinKString]) { args =>
      arity("graft_bounded_mink_str", args, 2)
      BoundedMinKString(args.head, litInt(args(1), "graft_bounded_mink_str", "k"))
    },
    d("graft_mg_summary", classOf[MisraGriesSummary]) { args =>
      arity("graft_mg_summary", args, 2)
      MisraGriesSummary(args.head, litInt(args(1), "graft_mg_summary", "capacity"))
    },
    d("graft_hash64", classOf[Hash64]) { args =>
      arity("graft_hash64", args, 1); Hash64(args.head)
    },
    d("graft_cms_buckets", classOf[CmsBuckets]) { args =>
      arity("graft_cms_buckets", args, 3)
      CmsBuckets(args.head,
        litInt(args(1), "graft_cms_buckets", "d"),
        litInt(args(2), "graft_cms_buckets", "logW"))
    },
    d("graft_nlz64", classOf[LeadingZeros64]) { args =>
      arity("graft_nlz64", args, 1); LeadingZeros64(args.head)
    })

  /** Install every registered function on an existing session, plus the
    * per-query pruned-sizing rewrite for indexed transactional reads
    * ([[graft.plans.PrunedScanSizing]] — optimizer rules have no
    * post-hoc registry, so they ride the experimental-optimizations
    * seam; install is idempotent).
    */
  def registerAll(spark: SparkSession): Unit = {
    functions.foreach { case (ident, info, builder) =>
      GraftBridge.registerFunction(spark, ident, info, builder)
    }
    tableFunctions.foreach { case (ident, info, builder) =>
      GraftBridge.registerTableFunction(spark, ident, info, builder)
    }
    graft.plans.PrunedScanSizing.install(spark)
  }

  // ------------------------------------------------------------------
  // Table-valued functions: the pure-SQL surface of the transactional
  // table (Delta's table_changes TVF shape) — `SELECT * FROM
  // txtable('/path')` works in spark.sql with zero Scala
  // ------------------------------------------------------------------

  type TableDescription = (FunctionIdentifier, ExpressionInfo,
    Seq[Expression] => org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)

  private def litStr(e: Expression, fn: String, arg: String): String = e match {
    case Literal(v, org.apache.spark.sql.types.StringType) if v != null => v.toString
    case other => throw new IllegalArgumentException(
      s"$fn: $arg must be a string literal, got $other")
  }

  private def t(name: String)(
      builder: Seq[Expression] => org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : TableDescription =
    (FunctionIdentifier(name),
      new ExpressionInfo(GraftExtensions.getClass.getCanonicalName, name), builder)

  /** FROM-clause functions. Arguments must be literals (they select a
    * table and a version, not row data). The returned plan is the
    * engine-built frame's analyzed plan: the snapshot read — through the
    * Catalyst-integrated stats index, so WHERE clauses over stats
    * columns prune directories exactly as in the Column API — or the
    * per-version change feed.
    */
  val tableFunctions: Seq[TableDescription] = Seq(
    // txtable('/path'[, version | TIMESTAMP '...']) — the second literal
    // is either a version number (VERSION AS OF) or a timestamp
    // (TIMESTAMP AS OF, resolved against the log's own in-commit clock
    // via TxTable.versionAt — O(log tip) probes, never a log listing)
    t("txtable") { args =>
      require(args.size == 1 || args.size == 2,
        s"txtable expects (path[, version | timestamp]), got ${args.size} args")
      val path = litStr(args.head, "txtable", "path")
      val version = args.lift(1).map {
        case Literal(micros: Long, org.apache.spark.sql.types.TimestampType) =>
          graft.sources.TxTable.versionAt(SparkSession.active, path,
            Math.floorDiv(micros, 1000L))
        case other => litLong(other, "txtable", "version")
      }
      GraftBridge.planOf(graft.sources.TxFileIndex.snapshotIndexed(
        SparkSession.active, path, version))
    },
    // txgroup('/path', 'table'[, version | TIMESTAMP '...']) — one
    // member table of a multi-table transaction group (TxGroup),
    // snapshot-isolated, with the same VERSION/TIMESTAMP AS OF second
    // literal as txtable (one shared log clock for every member)
    t("txgroup") { args =>
      require(args.size == 2 || args.size == 3,
        s"txgroup expects (path, table[, version | timestamp]), got ${args.size} args")
      val path = litStr(args.head, "txgroup", "path")
      val version = args.lift(2).map {
        case Literal(micros: Long, org.apache.spark.sql.types.TimestampType) =>
          graft.sources.TxTable.versionAt(SparkSession.active, path,
            Math.floorDiv(micros, 1000L))
        case other => litLong(other, "txgroup", "version")
      }
      GraftBridge.planOf(graft.sources.TxGroup.snapshot(
        SparkSession.active, path,
        litStr(args(1), "txgroup", "table"), version))
    },
    // txtable_changes('/path', fromVersion, toVersion) — the Delta
    // table_changes TVF: the net insert/delete feed between versions
    t("txtable_changes") { args =>
      require(args.size == 3,
        s"txtable_changes expects (path, fromVersion, toVersion), got ${args.size} args")
      val path = litStr(args.head, "txtable_changes", "path")
      GraftBridge.planOf(graft.sources.TxTable.tableChangesByVersion(
        SparkSession.active, path,
        litLong(args(1), "txtable_changes", "fromVersion"),
        litLong(args(2), "txtable_changes", "toVersion")))
    })
}
