package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.{DedupQueries, SimilarityQueries}

/** Guard against engine/oracle CONSTANT drift (round-9 verdict task 6):
  * the tunable constants (probe depth, re-rank depth, LSH width, banding
  * shape, thresholds) must appear — at their CURRENT value — inside the
  * oracle SQL of every query whose semantics they parameterize. Today the
  * oracles embed the Scala vals by string interpolation, so the two sides
  * cannot desynchronize; this spec pins that property, so a future edit
  * that replaces an interpolation with a hard-coded literal (and any later
  * retune of the Scala side alone — exactly the failure mode the ANN
  * retune risked) fails here instead of silently shipping an oracle that
  * checks different semantics than the engine runs.
  *
  * Pure string checks — no Spark session needed.
  */
class OracleConstantSpec extends AnyFunSuite {

  import DedupQueries.{Bands, JaccardTau, MaxBandBucket, NgramJaccardTau, RowsPerBand}
  import SimilarityQueries.{CosTau, LshBits, LshRadius, LshTables, Nprobe, QueryMod, RerankR, TopK}

  // (query name, constant, marker that must appear in its oracle SQL)
  private val checks: Seq[(String, String, String)] = Seq(
    ("ann_ivf", "Nprobe", s"cr <= $Nprobe"),
    // the capacity law's shared formula: C = ⌊√(Nprobe·n)⌋ must be derived
    // from the SAME Nprobe val inside the oracle, or the two engines would
    // build different codebooks
    ("ann_ivf_scaled", "Nprobe(capacity)", s"sqrt($Nprobe * count(*))"),
    ("ann_ivf_scaled", "Nprobe", s"cr <= $Nprobe"),
    ("hard_negatives_scaled", "Nprobe(capacity)", s"sqrt($Nprobe * count(*))"),
    ("ivf_balance", "Nprobe(capacity)", s"sqrt($Nprobe * count(*))"),
    ("hard_negatives_scaled", "HardNegProbeScaled",
      s"cr <= ${SimilarityQueries.HardNegProbeScaled}"),
    ("ann_ivf_kmeans", "Nprobe", s"cr <= $Nprobe"),
    ("ann_ivfpq", "Nprobe", s"cr <= $Nprobe"),
    ("ann_ivfpq_rerank", "Nprobe", s"cr <= $Nprobe"),
    ("ann_ivfpq_rerank", "RerankR", s"rn <= $RerankR"),
    // the capacity-law Lloyd/IVFADC twins: same probe depth AND the
    // in-SQL capacity derivation, so law + training loop stay mirrored
    ("ann_ivf_kmeans_scaled", "Nprobe(capacity)", s"sqrt($Nprobe * count(*))"),
    ("ann_ivf_kmeans_scaled", "Nprobe", s"cr <= $Nprobe"),
    ("ann_ivfpq_scaled", "Nprobe(capacity)", s"sqrt($Nprobe * count(*))"),
    ("ann_ivfpq_scaled", "Nprobe", s"cr <= $Nprobe"),
    ("ann_ivfpq_rerank_scaled", "Nprobe(capacity)", s"sqrt($Nprobe * count(*))"),
    ("ann_ivfpq_rerank_scaled", "RerankR", s"rn <= $RerankR"),
    ("ann_topk", "TopK", s"rank <= $TopK"),
    ("ann_topk", "QueryMod", s"% $QueryMod = 0"),
    // bucket width: the highest sign-bit term of the bucket expression
    ("ann_lsh", "LshBits(bucket)", s"THEN ${1L << (LshBits - 1)} ELSE"),
    // probe set: the highest-bit Hamming-1 flip of table 0 must be generated
    ("ann_lsh", "LshBits(probes)", s"xor(q.b0, ${1L << (LshBits - 1)})"),
    // radius: the largest Hamming-2 mask appears iff LshRadius >= 2 —
    // pins the oracle's probe list to the committed radius
    ("ann_lsh", "LshRadius(probes)",
      if (LshRadius >= 2)
        s"xor(q.b0, ${(1L << (LshBits - 1)) | (1L << (LshBits - 2))})"
      else "q.b0"),
    // tables: the last table's probe branch must be generated, and its
    // bucket expression must start at the right axis offset
    ("ann_lsh", "LshTables(probes)", s"${LshTables - 1} AS tbl"),
    ("ann_lsh", "LshTables(bucket-offset)",
      s"CASE WHEN v[${(LshTables - 1) * LshBits + 1}] > 0 THEN 1 ELSE 0 END"),
    ("similar_pairs", "CosTau", s">= $CosTau"),
    ("dedup_embed", "CosTau", s">= $CosTau"),
    // banding shape: the last band select and the last signature row index
    // (guards Bands and Bands×RowsPerBand jointly)
    ("dedup_minhash", "Bands", s"SELECT doc_id, ${Bands - 1} AS band"),
    ("dedup_minhash", "Bands*RowsPerBand", s"mh${Bands * RowsPerBand - 1}"),
    ("dedup_minhash", "MaxBandBucket", s"count(*) > $MaxBandBucket"),
    ("dedup_minhash", "JaccardTau", s">= $JaccardTau"),
    ("ngram_jaccard", "NgramJaccardTau", s">= $NgramJaccardTau"))

  test("oracle SQL embeds the live engine constants (no hard-coded drift)") {
    val sqls = SparkEntry.oracleSql
    val missing = checks.collect {
      case (q, c, marker) if !sqls.get(q).exists(_.contains(marker)) =>
        if (!sqls.contains(q)) s"$q: no oracle SQL registered"
        else s"$q: oracle SQL no longer contains `$marker` ($c) — " +
          "either the constant was hard-coded and drifted, or the SQL " +
          "shape changed; update the engine+oracle TOGETHER, then this marker"
    }
    assert(missing.isEmpty, missing.mkString("\n"))
  }
}
