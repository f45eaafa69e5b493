package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** The composed end-to-end pretraining keep-list — the pipeline the
  * individual training-data operators exist to feed, declared as ONE
  * query so the composition itself is oracle-checked.
  *
  * `corpus_keep` evaluates every stage predicate on the FULL corpus and
  * assigns each document the FIRST failing stage in pipeline order as its
  * drop reason:
  *
  *   1. `quality`      — composite quality score below [[QMin]] (or no
  *                       score: empty/token-less docs), cf. quality_score
  *   2. `lang`         — stopword ratio under [[LangMinStop]] → not 'en',
  *                       cf. lang_id
  *   3. `repetition`   — top token frequency above [[RepMax]],
  *                       cf. repetition_score
  *   4. `exact_dup`    — not the min-doc_id keeper of its sha256(text)
  *                       group, cf. dedup_exact
  *   5. `near_dup`     — not the canonical (min-id) member of its MinHash
  *                       near-dup cluster, cf. dedup_cluster
  *   6. `eval`         — the held-out benchmark stand-in (doc_id mod
  *                       EvalMod = 0): never trained on, cf. decontaminate
  *   7. `contaminated` — shares shingles with the eval set,
  *                       cf. decontaminate
  *   8. `mix`          — sampled out by the per-source mixture rates,
  *                       cf. domain_mix
  *   else `keep`, with the train/val/test assignment of data_split.
  *
  * STAGE-ORDER SEMANTICS (what the composition pins, and what a pipeline
  * that ran the stages independently would get wrong):
  *   - Dedup is decided BEFORE mixing: keepers/canonicals are the min ids
  *     of their full-corpus groups. If a cluster's canonical is later
  *     dropped by mix (or contamination), the cluster is simply gone —
  *     no non-canonical member is promoted, because promoting one would
  *     make the kept set depend on the mix sample of OTHER documents
  *     (append-instability: adding a doc could then flip its near-twin's
  *     keep decision through re-canonicalization).
  *   - Decontamination excludes the eval docs themselves first: an eval
  *     doc is 'eval', never 'contaminated' (it trivially overlaps
  *     itself) and never kept.
  *   - Mixing is decided after dedup/decontamination (its hash is salted
  *     independently of the split hash — see domain_mix), so mixture
  *     rates apply to the CLEAN corpus, not raw counts.
  *
  * Scale shape: every stage is a per-doc flag table keyed by doc_id —
  * the score/ratio stages are scan-local aggregations, the dedup stages
  * reuse the memoized shingle/cluster index artifacts, and the final
  * assembly is a chain of doc_id-keyed joins that co-partition after the
  * first exchange. Nothing here adds a new corpus-squared term; the
  * expensive parts (shingle table, minhash clusters, eval-shingle join)
  * are exactly the per-operator costs already bounded in their own
  * queries.
  */
object PipelineQueries {

  /** Keep thresholds — the declared filter config (chosen to be
    * non-degenerate on the synthetic corpus: each stage drops a real
    * slice; see the distribution notes in the spec).
    */
  val QMin = 0.45
  val LangMinStop = 0.04 // = lang_id's 'en' decision boundary
  val RepMax = 0.18

  def corpusKeep(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.docs(spark, dir)
    // Round-17 shape (guide §2.4): the quality/lang signals, the mix
    // decision, and the split assignment are PURE per-row expressions
    // over (doc_id, text, source) — they now evaluate inline on the
    // keep-list's own scan. The round-16 form attached each as a
    // doc_id-keyed self-join (7 joins total), which re-tokenized the
    // corpus once for the quality flags and re-scanned documents twice
    // more for hashes of columns the main scan already holds. The
    // expression trees are the SAME objects the standalone queries use
    // (TextQueries.quality*/mixKeepExpr/splitExpr), so the two forms and
    // the oracle can never drift; `when(qualityValid, …)` reproduces the
    // left-join NULLs for token-less/empty docs exactly.
    //
    // The exact-dup stage drops its window: group the corpus by content
    // hash to (th, keep_id) and join back ON TH — one corpus-sized
    // shuffle replaces two (the window's th-shuffle AND the re-key of
    // its per-doc output back to doc_id), and the per-partition window
    // sort disappears with it.
    val th = sha2(col("text").cast("binary"), 256)
    val keepers = docs
      .groupBy(th.as("th")).agg(min(col("doc_id")).as("keep_id"))
    val rep = TextQueries.repetitionScore(spark, dir)
      .select(col("doc_id"), col("top_token_frac"))
    val clus = DedupQueries.dedupCluster(spark, dir)
      .select(col("doc_id"), col("is_canonical"))
    val cont = DedupQueries.decontaminate(spark, dir) // non-eval docs only
      .select(col("doc_id"), col("contaminated"))

    val reason: Column =
      when(col("score").isNull || col("score") < QMin, "quality")
        .when(col("stop_ratio") < LangMinStop, "lang")
        .when(col("top_token_frac") > RepMax, "repetition")
        .when(col("doc_id") =!= col("keep_id"), "exact_dup")
        .when(!col("is_canonical"), "near_dup")
        .when(col("doc_id") % DedupQueries.EvalMod === 0, "eval")
        .when(coalesce(col("contaminated"), lit(false)), "contaminated")
        .when(!col("mix_ok"), "mix")
        .otherwise("keep")

    docs.select(col("doc_id"), th.as("th"),
        when(TextQueries.qualityValid, TextQueries.qualityScoreExpr).as("score"),
        when(TextQueries.qualityValid, TextQueries.qualityStopRatio).as("stop_ratio"),
        TextQueries.mixKeepExpr.as("mix_ok"),
        TextQueries.splitExpr.as("split_all"))
      // LEFT join (round-18, advice fix): for non-NULL text it is identical
      // to the inner form (every doc's own hash group exists by
      // construction), but sha2(NULL) is NULL and a NULL th equi-join key
      // would DROP a NULL-text doc entirely, where the oracle's
      // window-over-hash form keeps it (score is NULL → reason 'quality',
      // which fires before the exact_dup branch ever reads keep_id).
      .join(keepers, Seq("th"), "left")
      .join(rep, Seq("doc_id"), "left")
      .join(clus, Seq("doc_id"))
      .join(cont, Seq("doc_id"), "left")
      .withColumn("reason", reason)
      .select(col("doc_id"), col("reason"),
        (col("reason") === "keep").as("kept"),
        // dropped docs get a 'none' sentinel, not NULL (no portable NULL
        // sort position in the oracle harness — same call as rollup_agg)
        when(col("reason") === "keep", col("split_all")).otherwise("none").as("split"))
  }

  val corpusKeepSql: String = {
    val mixCases = TextQueries.MixRates
      .map { case (s, t) => s"WHEN '$s' THEN $t" }.mkString(" ")
    s"""WITH RECURSIVE ${DedupQueries.minhashPairsCtes},
       |edges AS (SELECT doc_a AS a, doc_b AS b FROM mhpairs
       |          UNION ALL SELECT doc_b, doc_a FROM mhpairs),
       |reach(id, x) AS (
       |  SELECT DISTINCT a, a FROM edges
       |  UNION
       |  SELECT r.id, e.b FROM reach r JOIN edges e ON e.a = r.x),
       |comp AS (SELECT id, min(x) AS cluster_id FROM reach GROUP BY id),
       |qm AS (SELECT d.doc_id,
       |              CAST(len(t.t) AS BIGINT) AS n_tokens,
       |              CAST(length(d.text) AS BIGINT) AS n_chars,
       |              CAST(length(regexp_replace(d.text, '[^\\p{L}]', '', 'g')) AS BIGINT) AS n_alpha,
       |              CAST(len(list_filter(t.t, w -> list_contains(${TextQueries.stopListSql}, w))) AS BIGINT) AS n_stop
       |       FROM documents d JOIN toks t ON t.doc_id = d.doc_id
       |       WHERE len(t.t) > 0 AND length(d.text) > 0),
       |qs AS (SELECT doc_id,
       |              (CAST(n_alpha AS DOUBLE) / n_chars) * 0.5
       |                + (CAST(n_stop AS DOUBLE) / n_tokens) * 0.3
       |                + least(CAST(n_tokens AS DOUBLE) / 200.0, 1.0) * 0.2 AS score,
       |              CAST(n_stop AS DOUBLE) / n_tokens AS stop_ratio
       |       FROM qm),
       |wtf AS (SELECT doc_id, unnest(t) AS word FROM toks),
       |tf AS (SELECT doc_id, word, count(*) AS tf FROM wtf GROUP BY 1, 2),
       |rep AS (SELECT doc_id, CAST(max(tf) AS DOUBLE) / sum(tf) AS top_token_frac
       |        FROM tf GROUP BY doc_id),
       |exk AS (SELECT doc_id, min(doc_id) OVER (PARTITION BY sha256(text)) AS keep_id
       |        FROM documents),
       |evh AS (SELECT DISTINCT h FROM ex WHERE doc_id % ${DedupQueries.EvalMod} = 0),
       |hits AS (SELECT e.doc_id, count(*) AS hit FROM ex e JOIN evh ON evh.h = e.h
       |         WHERE e.doc_id % ${DedupQueries.EvalMod} <> 0 GROUP BY 1),
       |bkt AS (SELECT doc_id, source,
       |               ${Oracle.hash60("'mix:' || CAST(doc_id AS VARCHAR)")} % ${TextQueries.MixBuckets} AS mix_bucket,
       |               ${Oracle.hash60("CAST(doc_id AS VARCHAR)")} % ${TextQueries.SplitBuckets} AS split_bucket
       |        FROM documents),
       |r1 AS (SELECT d.doc_id, bkt.split_bucket,
       |              CASE WHEN qs.score IS NULL OR qs.score < $QMin THEN 'quality'
       |                   WHEN qs.stop_ratio < $LangMinStop THEN 'lang'
       |                   WHEN rep.top_token_frac > $RepMax THEN 'repetition'
       |                   WHEN d.doc_id <> exk.keep_id THEN 'exact_dup'
       |                   WHEN coalesce(comp.cluster_id, d.doc_id) <> d.doc_id THEN 'near_dup'
       |                   WHEN d.doc_id % ${DedupQueries.EvalMod} = 0 THEN 'eval'
       |                   WHEN coalesce(hits.hit, 0) > 0 THEN 'contaminated'
       |                   WHEN bkt.mix_bucket >= CASE bkt.source $mixCases ELSE ${TextQueries.MixDefaultThreshold} END THEN 'mix'
       |                   ELSE 'keep' END AS reason
       |       FROM documents d
       |       LEFT JOIN qs ON qs.doc_id = d.doc_id
       |       LEFT JOIN rep ON rep.doc_id = d.doc_id
       |       JOIN exk ON exk.doc_id = d.doc_id
       |       LEFT JOIN comp ON comp.id = d.doc_id
       |       LEFT JOIN hits ON hits.doc_id = d.doc_id
       |       JOIN bkt ON bkt.doc_id = d.doc_id)
       |SELECT doc_id, reason, reason = 'keep' AS kept,
       |       CASE WHEN reason = 'keep' THEN
       |              CASE WHEN split_bucket < ${TextQueries.TrainUpto} THEN 'train'
       |                   WHEN split_bucket < ${TextQueries.ValUpto} THEN 'val'
       |                   ELSE 'test' END
       |            ELSE 'none' END AS split
       |FROM r1""".stripMargin
  }

  // ------------------------------------------------------------ shard_manifest
  /** `shard_manifest` — the EXPORT stage's verification artifact: documents
    * hash-assign to [[NShards]] shards and each shard reports its row
    * count, character volume, and an ORDER-FREE content checksum
    * (`bit_xor` of per-doc content fingerprints — XOR is associative,
    * commutative, and overflow-free, so 1000 executors writing a shard's
    * files in any order produce the same checksum, where an integer SUM
    * would wrap differently than the oracle's 128-bit accumulation). A
    * consumer re-derives the manifest after transfer and diffs — the
    * training-data handoff contract between the pipeline and the trainer.
    *
    * Assignment is `hash60(text) mod NShards` — CONTENT-keyed, so exact
    * duplicate documents land in the same shard (dedup locality: a
    * shard-local pass catches them without a global shuffle) and
    * assignment survives doc_id re-numbering across pipeline re-runs.
    *
    * Scale shape: one scan, per-row hashing, ONE partial-final hash
    * aggregation to NShards rows; every aggregate (count, sum, xor)
    * merges associatively map-side. The actual file write is the
    * repartition(shard)+write of LayoutCapabilitySpec's export test; this
    * query is the manifest side.
    */
  val NShards = 16

  def shardManifest(spark: SparkSession, dir: String): DataFrame = {
    val fp = graft.functions.TextFns.hash60(col("text"))
    Tables.docs(spark, dir)
      .select(col("doc_id"), col("n_chars"), fp.as("fp"),
        pmod(fp, lit(NShards.toLong)).as("shard_id"))
      .groupBy(col("shard_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("n_chars"),
        expr("bit_xor(fp)").as("checksum"))
  }

  val shardManifestSql: String = {
    val fp = Oracle.hash60("text")
    s"""WITH d AS (SELECT doc_id, n_chars, $fp AS fp,
       |                  $fp % $NShards AS shard_id
       |           FROM documents)
       |SELECT shard_id, count(*) AS n_docs,
       |       CAST(sum(n_chars) AS BIGINT) AS n_chars,
       |       bit_xor(fp) AS checksum
       |FROM d GROUP BY shard_id""".stripMargin
  }

  // ------------------------------------------------------------ canonical_pick
  /** `canonical_pick` — QUALITY-AWARE canonical selection per near-dup
    * cluster: where `dedup_cluster` (and `corpus_keep`) keep the MIN-ID
    * member — the arbitrary-but-deterministic textbook rule — production
    * pipelines keep the BEST member: argmax quality score, ties to the
    * smaller doc_id, score-less (token-free) members ranked below any
    * scored one. The output re-labels every document with its cluster,
    * its score, and whether it is the kept representative — exactly the
    * `corpus_keep` near-dup stage with the selection rule upgraded, and
    * the min-id/argmax DIFF between the two queries is itself the audit
    * of how much quality the naive rule leaves behind.
    *
    * Engine-exact: the argmax compares the quality score doubles (bit-
    * identical expressions on both engines) with a total tie order, via
    * one `max(struct(score, −doc_id))` hash aggregation — no per-cluster
    * sort; the oracle's row_number mirror picks the same winner because
    * the (score DESC, doc_id ASC) order is total.
    *
    * Scale shape: cluster labels come from the O(log d)-round label
    * propagation the cluster family already computes (memoized); scores
    * are scan-local; the pick is ONE partial-final aggregation on
    * cluster_id plus a key-equi join back — nothing quadratic anywhere.
    */
  def canonicalPick(spark: SparkSession, dir: String): DataFrame = {
    val cl = DedupQueries.dedupCluster(spark, dir)
      .select(col("doc_id"), col("cluster_id"))
    val qs = TextQueries.qualityScore(spark, dir)
      .select(col("doc_id"), col("score"))
    val j = cl.join(qs, Seq("doc_id"), "left")
      .withColumn("sc", coalesce(col("score"), lit(-1.0)))
    val best = j.groupBy(col("cluster_id"))
      .agg(max(struct(col("sc"), (-col("doc_id")).as("nid"))).as("b"))
      .select(col("cluster_id"), (-col("b.nid")).as("keep_id"))
    j.join(best, "cluster_id")
      .select(col("doc_id"), col("cluster_id"), col("score"),
        (col("doc_id") === col("keep_id")).as("is_kept"))
  }

  val canonicalPickSql: String =
    s"""WITH RECURSIVE ${DedupQueries.minhashPairsCtes},
       |edges AS (SELECT doc_a AS a, doc_b AS b FROM mhpairs
       |          UNION ALL SELECT doc_b, doc_a FROM mhpairs),
       |reach(id, x) AS (
       |  SELECT DISTINCT a, a FROM edges
       |  UNION
       |  SELECT r.id, e.b FROM reach r JOIN edges e ON e.a = r.x),
       |comp AS (SELECT id, min(x) AS cluster_id FROM reach GROUP BY id),
       |cl AS (SELECT d.doc_id, coalesce(c.cluster_id, d.doc_id) AS cluster_id
       |       FROM documents d LEFT JOIN comp c ON c.id = d.doc_id),
       |qsc AS (SELECT doc_id, score FROM (${TextQueries.qualityScoreSql})),
       |j AS (SELECT cl.doc_id, cl.cluster_id, q.score,
       |             coalesce(q.score, -1.0) AS sc
       |      FROM cl LEFT JOIN qsc q ON q.doc_id = cl.doc_id),
       |r AS (SELECT doc_id, cluster_id, score,
       |             row_number() OVER (PARTITION BY cluster_id
       |                                ORDER BY sc DESC, doc_id) AS rn
       |      FROM j)
       |SELECT doc_id, cluster_id, score, rn = 1 AS is_kept FROM r""".stripMargin

  // ------------------------------------------------------------- corpus_export
  /** `corpus_export` — the WHOLE pretraining export pipeline as one
    * oracle-checked query: the `corpus_keep` keep-list filters the
    * corpus, survivors chunk into training windows (`chunk_docs`' exact
    * transform), and the chunks land in content-keyed shards with a
    * per-(split, shard) manifest — chunk count, token budget, and the
    * order-free `bit_xor` checksum (`shard_manifest`'s contract, at
    * CHUNK grain). This is the artifact a trainer actually consumes:
    * train/val/test × shard → how many sequences, how many tokens,
    * and a checksum to diff after transfer. Declaring the composition as
    * ONE query pins the stage interfaces against each other — a keep-rule
    * or chunker change that silently shifts the export shows up here as
    * an oracle hash flip even if each stage's own query still passes.
    *
    * Scale shape: strictly the union of its parts — the keep-list's
    * memoized flag tables, one doc_id equi-join to prune the corpus
    * BEFORE tokenization (dropped docs are never chunked), the scan-local
    * chunker, and ONE partial-final aggregation to ≤ splits·shards rows.
    */
  def corpusExport(spark: SparkSession, dir: String): DataFrame = {
    val kept = corpusKeep(spark, dir).filter(col("kept")).select(col("doc_id"))
    val docs = Tables.docs(spark, dir).join(kept, "doc_id")
    // A kept document's split is `data_split`'s pure hash of doc_id
    // (corpus_keep emits split_all = splitExpr for reason = 'keep'), so
    // the chunk rows compute it INLINE instead of joining the keep-list a
    // SECOND time to re-attach it (round-17; the keep-list join above
    // already pruned the corpus — the re-attach join only carried a
    // value derivable from the chunk row's own doc_id).
    TextQueries.chunkOf(docs.select(col("doc_id"), col("text")))
      .select(TextQueries.splitExpr.as("split"),
        pmod(col("chunk_fp"), lit(NShards.toLong)).as("shard_id"),
        col("n_tok"), col("chunk_fp"))
      .groupBy(col("split"), col("shard_id"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(col("n_tok")).as("n_tokens"),
        expr("bit_xor(chunk_fp)").as("checksum"))
  }

  val corpusExportSql: String = {
    val w = TextQueries.ChunkTokens
    val s = TextQueries.ChunkStride
    s"""WITH k AS (SELECT doc_id, split FROM ($corpusKeepSql) WHERE kept),
       |kt AS (SELECT d.doc_id, k.split,
       |              list_filter(string_split_regex(d.text, '[^\\p{L}]+'),
       |                          x -> length(x) > 0) AS t
       |       FROM documents d JOIN k USING (doc_id)),
       |nz AS (SELECT doc_id, split, t FROM kt WHERE len(t) > 0),
       |st AS (SELECT doc_id, split, t,
       |              unnest(generate_series(0, (len(t) - 1) // $s)) AS kk
       |       FROM nz),
       |ch AS (SELECT split,
       |              CAST(len(t[kk * $s + 1 : kk * $s + $w]) AS BIGINT) AS n_tok,
       |              ${Oracle.hash60(s"array_to_string(t[kk * $s + 1 : kk * $s + $w], ' ')")} AS fp
       |       FROM st)
       |SELECT split, fp % $NShards AS shard_id, count(*) AS n_chunks,
       |       CAST(sum(n_tok) AS BIGINT) AS n_tokens,
       |       bit_xor(fp) AS checksum
       |FROM ch GROUP BY 1, 2""".stripMargin
  }

  val entries: Seq[(String, QueryDef)] = Seq(
    "corpus_keep" -> QueryDef(corpusKeep, Some(corpusKeepSql)),
    "shard_manifest" -> QueryDef(shardManifest, Some(shardManifestSql)),
    "canonical_pick" -> QueryDef(canonicalPick, Some(canonicalPickSql)),
    "corpus_export" -> QueryDef(corpusExport, Some(corpusExportSql)))
}
