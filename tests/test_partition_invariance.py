"""Partition-count invariance: a distributed operator's RESULT must not
depend on parallelism. Any dependence on partition order/count (collect_*
without sort, first() without order, float fold order surfacing at the
row level) shows up as a diff between a 2-partition and a 16-partition run
of the same query — the bug class that passes every single-machine test
and corrupts output on a 1000-executor cluster.
"""

from __future__ import annotations

import pytest

from learn_hbase_spark import queries as Q

SF = "/root/testdata/sf0.001"

# order-sensitivity-risk queries: grouped collections, first-wins dedup,
# hash bucketing, window tiebreaks, iterative convergence
CASES = [
    "dedup_first_wins",
    "collect_set_groups",
    "pack_sequences",
    "minhash_lsh_pairs",
    "neardup_clusters",
    "scd2_user_state",
    "domain_mixture",
    "string_agg_nations",
    # round 4: banded Hamming pairing (join-order risk), percentile-band
    # sampling (float threshold risk), iterative k-means (mean-order risk)
    "simhash_hamming_pairs",
    "quality_band_sample",
    "embedding_kmeans",
    # round 4 late: span merge (window-order risk), winnowing selection
    # (tie/order risk), partial-agg merge (float/merge-order risk),
    # full-outer hash classification (join-order risk)
    "substring_dup_spans",
    "winnow_fingerprints",
    "rollup_incremental",
    "snapshot_diff",
    # round 4 late II: in-bucket pair expansion (collect_list order risk),
    # hash-rank selection, float bin edges, power-sum float derivation,
    # verdict case over joined flags
    "winnow_match_pairs",
    "ngram_containment_pairs",
    "reservoir_per_group",
    "histogram_equiwidth",
    "linear_fit_by_type",
    "curation_audit",
    # round 7: count-first capped bucketing (join+collect order risk),
    # batch-kernel cell assignment (argsort-tie risk across batch shapes),
    # one-step pagerank (float sum-order risk), fixed-merge BPE apply
    # (mapInPandas batch-shape risk)
    "minhash_lsh_capped",
    "winnow_match_capped",
    "ivf_cell_assign",
    "pagerank_iter1",
    "bpe_apply_fixed",
    # round 7 late: per-cell BLAS pair kernel (group-order risk), one full
    # BPE train cycle (argmax-tie + fold-order risk), bigram LM scoring
    # (float avg summation-order risk)
    "semantic_pairs_seeded",
    "bpe_pair_counts_round1",
    "bigram_lm_score",
    # round 8: frozen-model LM scoring (left-join + float avg order risk),
    # cluster-keyed splitting (CC round/order risk upstream), tempered
    # rates (Z-sum order risk), file-corpus dedup (min-winner order risk)
    "bigram_lm_score_frozen",
    "leakage_safe_split",
    "temperature_mixture_rates",
    "file_corpus_dedup",
    # round 8 late: DSIR weight sums (float sum-order risk), quantile
    # selection (threshold interpolation risk), classifier mean
    # (left-join + avg order risk)
    "dsir_weights",
    "dsir_select",
    "quality_classifier_score",
    # round 8 late II: rounded-sim band + rank (window order risk),
    # waterfilling level search (running-sum order risk)
    "hard_negative_topk",
    "unimax_mixture_rates",
    # round 11: five-iteration integer-fixed-point pagerank (replay mode
    # claims bit-exactness across ANY execution, so partition count is
    # the cheapest adversary), exact-percentile skew summary
    "pagerank_neardup",
    "skew_report",
]


def _rows(spark, name, parts):
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", str(parts))
        df = Q.queries()[name](spark, SF)
        return sorted(map(tuple, df.collect()))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


@pytest.mark.parametrize("name", CASES)
def test_result_invariant_under_partition_count(spark, name):
    assert _rows(spark, name, 2) == _rows(spark, name, 16), (
        f"{name} result depends on shuffle partition count"
    )
