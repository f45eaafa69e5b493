package graft

/** Inventory-wide plan linter — the scale-killer guards, run as tests.
  *
  * PLANS.md documents each query's intended shape in prose; this spec
  * asserts the two silent plan catastrophes can never re-enter the
  * inventory unnoticed:
  *
  *   - `CartesianProduct`: quadratic row growth; never acceptable.
  *   - `BroadcastNestedLoopJoin`: acceptable ONLY as the physical form of
  *     a crossJoin attaching an O(1)-size broadcast relation (a 1-row
  *     stats/bounds row or a constant-size codebook — the documented
  *     pattern in PLANS.md). Any other appearance means a join lost its
  *     equi-condition or a dimension stopped broadcasting as a hash join.
  *
  * The allowlist is EXPLICIT and justified per query, so a new query (or
  * a regression in an old one) that plans a nested-loop join fails the
  * suite with its plan attached — the review then either fixes the plan
  * or consciously extends the allowlist, mirroring PLANS.md.
  */
class PlanGuardSpec extends SparkTestBase {

  private val dir = sf("sf0.001")

  /** Queries whose plan legitimately contains BroadcastNestedLoopJoin —
    * each is a crossJoin of an O(1)-row broadcast (never corpus-sized):
    * bounds rows, corpus-stat rows, or fixed-size codebooks/centroids.
    */
  private val bnljAllowed: Set[String] = Set(
    // 1-row corpus-stat broadcasts (N docs / total tokens / day bounds)
    "bm25_topdocs", // 1-row (N, avgdl) stats
    "tfidf_topterms", // 1-row doc-count (idf denominator)
    "cooc_pmi", // 1-row corpus token total (lift numerator)
    "active_users", // 1-row (dmin, dmax) bounds for the day spine
    "ewma_daily", // 1-row dmax bound anchoring the decay ages
    "chi2_keywords", // 1-row corpus token total (contingency-table N)
    "basket_rules", // 1-row basket-total broadcast (lift numerator)
    "incremental_merge", // 1-row cut_ns bound splitting base from delta
    "triangle_count", // 1-row edge/triangle stat rows assembling the summary
    "fk_cardinality", // 1-row parent-count × 1-row child-stats assembly
    // constant-size codebook crossJoins (O(K)=64 / O(256) rows per subspace)
    "ann_ivf", "ann_ivf_kmeans", "ann_pq", "ann_ivfpq", "ann_ivfpq_rerank",
    // the scaled-capacity codebook crossJoin is O(√(Nprobe·n)) rows — not
    // constant, but sub-corpus-sized by construction (219 rows at sf0.1,
    // ~2.2k at the sf10 scale-up; ~500 KB per 1k centroids) and the law's
    // own scaladoc records where a production system outgrows the flat
    // broadcast (hierarchical coarse quantization)
    "ann_ivf_scaled",
    // the scaled LLOYD codebook + scaled IVFADC stages: the same
    // O(√(Nprobe·n))-row codebook crossJoin (training iterations and
    // probe selection), plus ann_ivfpq_*'s PqK-row sub-codebook crossJoin
    "ann_ivf_kmeans_scaled", "ann_ivfpq_scaled", "ann_ivfpq_rerank_scaled",
    "pq_distortion", // same PqK-row sub-codebook crossJoin as ann_pq's encoder
    "hard_negatives", // same IvfC-row codebook crossJoin (per-anchor probe selection)
    "hard_negatives_scaled", // the O(√(Nprobe·n))-row scaled codebook crossJoin
    // ivf_balance normally plans two aggregations over disk-cached
    // assignment tables, but with SPARK_GRAFT_INDEX_CACHE set empty (the
    // documented disable switch) or an unwritable cache root, diskCached
    // returns the raw build plan and its constant-size codebook crossJoins
    // surface here — the same safe O(K)-row shape as ann_ivf's, so it
    // stays allowlisted rather than coupling this guard to the caller's
    // environment
    "ivf_balance",
    // bounded-CHUNK broadcast of the query block (cap-sized, never the
    // corpus side; chunk count from parquet footer metadata)
    "ann_topk",
    // composes the SAME allowlisted subplans (ann_topk's chunk broadcast,
    // the ann_* codebook crossJoins) — no new BNLJ shape of its own
    "ann_recall_report",
    // 1-row best-merge broadcast per unrolled training round (the learned
    // merge table is disk-cached, so the BNLJ only surfaces cache-disabled)
    "bpe_train",
    // 1-row ordered-merges array broadcast (the apply stage collapses the
    // cached 10-row merge table to one array row per query)
    "bpe_vocab",
    // the declared non-equi range lookup: a CONSTANT 4-row band table
    // broadcast per-row into the scan stage — the BNLJ here IS the
    // intended operator (see bandJoin's scaladoc), never corpus-sized
    "band_join",
    // same constant-table non-equi shape: the 4-row vocab-budget table
    // (rnk <= k) joins the VOCABULARY, plus a 1-row total crossJoin
    "vocab_coverage")

  test("no query plans a CartesianProduct") {
    SparkEntry.all.foreach { case (name, q) =>
      val plan = q.fn(spark, dir).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"$name plans a cartesian product:\n$plan")
    }
  }

  test("BroadcastNestedLoopJoin appears only in allowlisted O(1)-broadcast plans") {
    val offenders = SparkEntry.all.toSeq.flatMap { case (name, q) =>
      val plan = q.fn(spark, dir).queryExecution.executedPlan.toString
      if (plan.contains("BroadcastNestedLoopJoin") && !bnljAllowed(name))
        Some(name)
      else None
    }
    assert(offenders.isEmpty,
      s"unjustified BroadcastNestedLoopJoin in: ${offenders.mkString(", ")} — " +
        "either restore the equi/broadcast-hash form or extend the allowlist " +
        "with the O(1)-broadcast justification")
  }

  // Allowlisted for an ENVIRONMENT-dependent plan: with the index disk
  // cache enabled (default) the query reads cached parquet and plans no
  // BNLJ, but with SPARK_GRAFT_INDEX_CACHE set empty (the documented
  // disable switch) or an unwritable cache root the raw build plan — and
  // its constant-size codebook crossJoin — surfaces. Exempt from the
  // tightness check; still covered by the allowlist when it matters.
  // ann_topk / ann_recall_report joined the set when the exact truth table
  // became a disk-cached artifact: cache enabled they scan parquet (no
  // BNLJ); cache disabled the bounded chunk-broadcast BNLJ re-surfaces.
  // ann_ivf_kmeans / ann_ivf_kmeans_scaled joined in round 18 when their
  // PROBE tables became disk-cached artifacts too (the lists already
  // were): with the cache enabled every stage that planned the codebook
  // crossJoin reads parquet instead; cache disabled, the raw probe build
  // (and its O(C)-row codebook crossJoin BNLJ) re-surfaces.
  private val bnljEnvDependent =
    Set("ivf_balance", "ann_topk", "ann_recall_report", "bpe_train",
      "ann_ivf_kmeans", "ann_ivf_kmeans_scaled")

  test("env-dependent entries: the cache-enabled plan scans the disk artifact, no BNLJ") {
    // the exemption above must still pin SOMETHING (round-11 advice): in
    // the default cache-enabled environment each exempted query's plan
    // must contain a parquet scan of the cache artifact and no BNLJ —
    // otherwise the entry has gone stale in BOTH environments unnoticed
    val root = sys.env.getOrElse("SPARK_GRAFT_INDEX_CACHE", "/tmp/graft-index-cache")
    assume(root.nonEmpty, "index cache disabled: BNLJ shape is covered by the allowlist test")
    bnljEnvDependent.foreach { name =>
      val exec = SparkEntry.all(name).fn(spark, dir).queryExecution.executedPlan
      if (!exec.toString.contains("BroadcastNestedLoopJoin")) {
        // cache usable (the normal case) — pin the intended shape. The
        // artifact DataFrame is persist()ed, so its parquet scan sits
        // INSIDE an InMemoryTableScan leaf (and possibly an AQE wrapper)
        // — traverse through both.
        def scans(p: org.apache.spark.sql.execution.SparkPlan): Boolean =
          p.collectLeaves().exists {
            case s: org.apache.spark.sql.execution.FileSourceScanExec =>
              s.relation.location.rootPaths.exists(_.toString.contains(root))
            case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
              scans(a.executedPlan)
            case im: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
              scans(im.relation.cachedPlan)
            case _ => false
          }
        val scansArtifact = scans(exec)
        assert(scansArtifact,
          s"$name plans neither a BNLJ nor a parquet scan under $root — " +
            "its bnljEnvDependent exemption (and allowlist entry) is stale; remove both")
      } // else: unwritable cache root fell back to the raw build — the
        // BNLJ itself is covered by the allowlist membership test above
    }
  }

  test("the allowlist itself is tight: every member still plans a BNLJ") {
    // an allowlist entry whose query no longer needs it is stale — shrink
    // it so the guard stays meaningful
    val stale = (bnljAllowed -- bnljEnvDependent).toSeq.filter { name =>
      val plan = SparkEntry.all(name).fn(spark, dir)
        .queryExecution.executedPlan.toString
      !plan.contains("BroadcastNestedLoopJoin")
    }
    assert(stale.isEmpty,
      s"allowlist entries no longer planning BNLJ (remove them): ${stale.mkString(", ")}")
  }
}
