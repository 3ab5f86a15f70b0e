"""Stress regression for the round-5 BlockInfoManager/TorrentBroadcast race
(VERDICT r5 #2): loop the bench's heaviest query shapes back-to-back with
cache/broadcast releases interleaved — the exact cadence the driver bench
runs at — and assert results stay stable and no job fails. Before round 6's
lifecycle hardening (bc_registry + embed._PC_CACHES), dropped broadcasts
and persisted frames were reaped by GC-timed ContextCleaner, which could
remove blocks concurrently with running tasks; this test exercises the
release points repeatedly, with explicit driver GC between rounds to give
any remaining race its window."""

from __future__ import annotations

import gc

import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def entrymod():
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    import __spark_entry__ as m

    return m


def _release_all():
    from deepblocker_spark.operators.ann import release_assignment_caches
    from deepblocker_spark.operators.dedup import release_rank_caches
    from deepblocker_spark.operators.lsh import release_signature_caches
    from deepblocker_spark.operators.metablocking import (
        release_metablocking_caches,
    )
    from deepblocker_spark.operators.semdedup import release_verdict_caches
    from deepblocker_spark.operators.substring_dedup import (
        release_fingerprint_caches,
    )

    release_signature_caches()
    release_assignment_caches()
    release_rank_caches()
    release_metablocking_caches()
    release_fingerprint_caches()
    release_verdict_caches()


def test_release_stress_loop(spark, entrymod):
    qs = entrymod.queries()
    heavy = ["flagship_blocking", "lsh_topk_emb", "substring_dup_pairs"]
    baseline = {}
    for rnd in range(5):
        for name in heavy:
            df = qs[name](spark, SF)
            n = df.count()
            if rnd == 0:
                baseline[name] = n
            else:
                assert n == baseline[name], f"{name} drifted on round {rnd}"
            _release_all()
        # give ContextCleaner a GC trigger between rounds — the old failure
        # mode needed driver GC while the next query's jobs run
        gc.collect()
        spark.sparkContext._jvm.System.gc()


def test_released_plan_recomputes(spark, entrymod):
    """Releasing caches under a still-live plan must degrade to recompute,
    never to an error (the documented release contract)."""
    qs = entrymod.queries()
    df = qs["lsh_topk_emb"](spark, SF)
    n1 = df.count()
    _release_all()
    n2 = df.count()  # re-executes the released plan end-to-end
    assert n1 == n2
