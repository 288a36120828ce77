"""Self-differential gate over the materialization-barrier queries.

The p13 lesson (round 8's one driver-red row): a query that persists or
checkpoints intermediate frames can, in principle, produce different results
across runs if a barrier silently recomputes nondeterministic upstream work —
and the oracle diff cannot catch it, because the engine can agree with the
oracle on run 1 and disagree with ITSELF on run 2. This gate runs every
registry query whose plan goes through an explicit barrier
(persist/localCheckpoint) or an iterative driver loop twice in-session and
diffs the canonicalized results bit-for-bit (plans/differential.run_selfdiff).

The full-registry sweep lives in the CLI (`differential --selfdiff`, 302/302
recorded in SCALE.md round 9); the suite pins the risk class cheaply.
"""

import pytest

from guardian_for_apache_kafka_spark.plans.differential import run_selfdiff

#: queries whose builders (or the operators under them) persist, localCheckpoint,
#: or loop with driver-collected state — the recompute-race risk class
BARRIER_QUERIES = [
    "p13_curation_funnel",        # localCheckpoint x2 (r9 hardening)
    "d4_minhash_lsh_dedup",       # signature frame persist
    "d13_semantic_dedup",         # cluster loop + persisted assignments
    "q47_hierarchy_depths",       # pointer-doubling localCheckpoint rounds
    "q59_pagerank_fixed_point",   # fixed-round localCheckpoint loop
    "q71_label_propagation",      # fixed-round localCheckpoint loop
    "t18_bpe_merges",             # re-segmentation fold, localCheckpointed
    "t26_doc_keywords",           # pair table localCheckpoint
    "s16_ivfpq_rerank",           # residual localCheckpoint + driver-collected training
    "d29_cdc_chunk_dedup",        # chunk fold localCheckpoint
]


@pytest.mark.parametrize("name", BARRIER_QUERIES)
def test_barrier_query_is_run_stable(spark, sf_dir, name):
    res = run_selfdiff(spark, sf_dir, name, repeats=2)
    assert res.ok, res.detail
