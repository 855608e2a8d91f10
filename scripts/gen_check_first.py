"""Generate the next round's ``_CHECK_FIRST`` driver window.

The rotation rule recorded in round 13 (r12 VERDICT "Next round" #1/#7),
governing from r14 on:

1. never-driver-checked oracle-backed entries first (there should be
   none unless the current round added some), then
2. strictly oldest driver evidence first, ties alphabetical,

drawing from CHECKED_UNION.json (regenerate it first with
``scripts/gen_checked_union.py``) and restricted to oracle-backed
entries so no window slot burns on an ``err:no_oracle`` row.

Prints the 50-name Python list literal to paste into
``__spark_entry__._CHECK_FIRST`` (the membership/size tests in
tests/test_correctness.py pin the paste).

Run from the repo root:
    python scripts/gen_check_first.py
"""
from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WINDOW = 50

# ONE-TIME override of the oldest-evidence rotation (r14 VERDICT "Next
# round" #1): the r14/r15 optimization rounds rewrote these operators'
# physical plans (driver-side exact-decimal PCA iteration, profile
# buffer discipline, HITS/bpe/dedup restructures) AFTER the r14 window
# was pinned, so no driver run has independently re-hashed any of them.
# They take the head of the r15 window; the remaining slots fall back
# to the standing never-checked-then-oldest rule. Clear this list when
# emitting the r16 window so the rotation resumes.
PRIORITY = [
    # riskiest first: the pca.py driver-side Decimal replication of
    # Spark's BigDecimal ROUND-7 HALF_UP sequence (r14 commit 1499db2)
    "embedding_pca_loadings",
    "embedding_pca_top2",
    "embedding_pca_scores",
    "embedding_pca_top2_scores",
    "pca_axis_drift",
    "pca_explained_variance",
    "streaming_pca_loadings",
    "streaming_pca_top2",
    "streaming_kmeans_centroids",
    "kmeans_pca_assign",
    "kmeans_pca_centroids",
    "kmeans_silhouette",
    "kmeans_elbow",
    "kmeans_label_ari",
    "dbscan_pca_clusters",
    "dbscan_label_ari",
    # same driver-side exact-decimal treatment (k×k matrix)
    "event_stationary_dist",
    # HITS checkpoint restructure + profile/bpe/dedup/textstats rewrites
    "hits_scores",
    "streaming_hits",
    "orders_profile",
    "containment_pairs",
    "winnow_overlap",
    "source_quality_report",
    "bpe_segment_stats",
    "bpe_fertility_by_lang",
    "bpe_token_stats",
    "streaming_bpe_segment",
    "streaming_bpe_fertility",
    # argmax attempts reverted in r14 (b25b19a) — window them anyway:
    # their plans were touched and restored inside one round
    "langid_scores",
    "langid_confusion",
    "streaming_langid_scores",
    "streaming_langid_confusion",
    "lpa_communities",
    "dup_communities",
    # r15 additions: paths REWRITTEN in this round that are not already
    # above — the in-line LM gate, the shared-feature DSIR pass, the
    # partitioned-checkpoint PQ/SemDeDup encodes, and the two merged-
    # replay anchor entries (one per rewritten fold family)
    "lm_perplexity_gate",
    "lm_gate_by_source",
    "dsir_importance_weights",
    "streaming_dsir_weights",
    "semantic_dedup",
    "pq_codes_det",
    "streaming_spacesaving_per_lang",
    "streaming_theta_overlap",
]


def main() -> None:
    import __spark_entry__ as E

    union = json.load(open(os.path.join(REPO, "CHECKED_UNION.json")))
    entries = union["entries"]
    oracle_backed = sorted(set(E.oracle_sql()) & set(E._base_queries()))
    missing = [n for n in oracle_backed if n not in entries]
    if missing:
        print(f"# WARNING: {len(missing)} oracle-backed entries absent "
              f"from CHECKED_UNION.json (regen it / record sweeps "
              f"first): {missing}", file=sys.stderr)
    bad_priority = [n for n in PRIORITY if n not in oracle_backed]
    if bad_priority:
        print(f"# WARNING: PRIORITY names not oracle-backed entries "
              f"(dropped): {bad_priority}", file=sys.stderr)
    head = [n for n in PRIORITY if n in oracle_backed]

    def sort_key(name: str):
        driver = entries.get(name, {}).get("driver", 0)
        return (driver, name)  # 0 (never) sorts first, then oldest

    rest = sorted((n for n in oracle_backed if n not in head), key=sort_key)
    window = (head + rest)[:WINDOW]
    print("_CHECK_FIRST = [")
    for name in window:
        d = entries.get(name, {}).get("driver", 0)
        tag = "never" if d == 0 else f"r{d}"
        mark = ", priority" if name in head else ""
        print(f'    "{name}",  # {tag}{mark}')
    print("    ]")


if __name__ == "__main__":
    main()
