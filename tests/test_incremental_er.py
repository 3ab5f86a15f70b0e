"""Incremental ER composition test: resolve a corpus, then land a new
batch and map its records onto the resolved entities using only public
operators — minhash near-dup → connected components for resolution,
union re-blocking for the batch, group_linkage for the cluster-to-
cluster mapping. This is the batch-mode twin of
streaming_block_against_index (dedup_stream.py) and the composition the
round-3 survivorship/canonical operators feed."""
from __future__ import annotations

from pyspark.sql import functions as F

from deepblocker_spark.operators.cluster import connected_components, group_linkage
from deepblocker_spark.operators.dedup import minhash_lsh_pairs

_BASE_A = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
           "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi")
_BASE_B = ("one two three four five six seven eight nine ten eleven "
           "twelve thirteen fourteen fifteen sixteen seventeen eighteen")


def _variant(base: str, i: int) -> str:
    toks = base.split()
    toks[i] = f"edit{i}"
    return " ".join(toks)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _components_with_singletons(docs, pairs_df):
    comp = connected_components(pairs_df.select("a", "b"), src="a", dst="b")
    return (
        docs.select(F.col("doc_id").alias("id"))
        .join(comp, "id", "left")
        .select("id", F.coalesce("component", F.col("id")).alias("component"))
    )


def test_new_batch_maps_onto_resolved_entities(spark):
    v1_rows = [
        (0, _BASE_A),
        (1, _variant(_BASE_A, 3)),
        (10, _BASE_B),
        (11, _variant(_BASE_B, 5)),
        (20, "a completely unrelated single document about nothing shared"),
    ]
    v2_rows = [
        (100, _variant(_BASE_A, 7)),   # new record of entity A
        (101, _variant(_BASE_B, 9)),   # new record of entity B
        (102, "another brand new entity with its own distinct vocabulary"),
    ]
    v1 = _docs(spark, v1_rows)
    both = _docs(spark, v1_rows + v2_rows)

    kw = dict(num_hashes=32, n_bands=16, jaccard_threshold=0.7)
    v1_assign = _components_with_singletons(
        v1, minhash_lsh_pairs(v1, "doc_id", "text", **kw)
    )
    comb_assign = _components_with_singletons(
        both, minhash_lsh_pairs(both, "doc_id", "text", **kw)
    )

    # resolution sanity: v1 resolves to {0,1}, {10,11}, {20}
    v1_map = {r.id: r.component for r in v1_assign.collect()}
    assert v1_map[0] == v1_map[1] and v1_map[10] == v1_map[11]
    assert len({v1_map[0], v1_map[10], v1_map[20]}) == 3

    comb_map = {r.id: r.component for r in comb_assign.collect()}
    # the new records land in the resolved entities...
    assert comb_map[100] == comb_map[0]
    assert comb_map[101] == comb_map[10]
    # ...the brand-new entity stays its own cluster...
    assert comb_map[102] not in {comb_map[0], comb_map[10], comb_map[20]}
    # ...and the batch did not merge or split any v1 entity: group_linkage
    # between the v1 clustering and the combined clustering restricted to
    # v1 ids is a perfect 1:1 (jaccard 1.0 everywhere)
    link = group_linkage(
        v1_assign,
        comb_assign.join(v1.select(F.col("doc_id").alias("id")), "id"),
        left_cluster="component",
        right_cluster="component",
    ).collect()
    assert len(link) == 3
    assert all(r.jaccard == 1.0 for r in link)
