"""Sort-based grouped map: a scale- and overhead-friendly replacement for
``groupBy().applyInPandas()`` when groups are small and numerous.

``applyInPandas`` materializes every group as its own Arrow batch and Python
function call — at ~32k buckets per LSH job that is tens of seconds of pure
per-group overhead (measured: the per-bucket stage dominated wall-clock while
each bucket's matmul was microseconds). Here the same hash shuffle is
expressed as repartition(key) + sortWithinPartitions(key), and ONE
mapInPandas kernel receives frames holding MANY complete groups: per-group
cost collapses to a numpy slice. The kernel contract:

    kernel(pdf) -> pd.DataFrame

where ``pdf`` contains only whole groups (each key's rows contiguous, keys
sorted). Groups spanning Arrow batch boundaries are stitched by buffering
the trailing partial group between batches — correctness does not depend on
Arrow batch sizing.

At 100 TB this shape is strictly better than applyInPandas: identical
shuffle volume, identical skew behavior (same hash partitioning), but the
Python boundary is crossed once per ~10k rows instead of once per group.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def grouped_map_in_pandas(
    df: DataFrame,
    key_cols: list[str],
    kernel,
    out_schema,
    num_partitions: int | None = None,
) -> DataFrame:
    part = (
        df.repartition(*key_cols)
        if num_partitions is None
        else df.repartition(num_partitions, *key_cols)
    )
    part = part.sortWithinPartitions(*key_cols)
    keys = list(key_cols)

    def runner(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        buf: pd.DataFrame | None = None
        for pdf in batches:
            if buf is not None and len(buf):
                pdf = pd.concat([buf, pdf], ignore_index=True)
            buf = None
            if not len(pdf):
                continue
            # the trailing group may continue in the next batch: hold it back
            last = pdf[keys].iloc[-1].to_numpy()
            tail_mask = (pdf[keys].to_numpy() == last).all(axis=1)
            not_tail = np.nonzero(~tail_mask)[0]
            cut = (not_tail[-1] + 1) if len(not_tail) else 0
            buf = pdf.iloc[cut:].reset_index(drop=True)
            head = pdf.iloc[:cut]
            if len(head):
                out = kernel(head)
                if out is not None and len(out):
                    yield out
        if buf is not None and len(buf):
            out = kernel(buf)
            if out is not None and len(out):
                yield out

    return part.mapInPandas(runner, out_schema)


def group_slices(pdf: pd.DataFrame, key_cols: list[str]):
    """Yield (start, stop) row slices of each contiguous key group in a
    frame produced by grouped_map_in_pandas (keys sorted/contiguous)."""
    if not len(pdf):
        return
    keys = pdf[key_cols].to_numpy()
    change = np.any(keys[1:] != keys[:-1], axis=1)
    starts = np.concatenate([[0], np.nonzero(change)[0] + 1, [len(pdf)]])
    for a, b in zip(starts[:-1], starts[1:]):
        yield int(a), int(b)


def topk_per_key(
    pairs: DataFrame,
    k: int,
    key: str = "l_id",
    other: str = "r_id",
    sim: str = "sim",
    num_partitions: int | None = None,
) -> DataFrame:
    """Dedup (key, other) pairs and keep the top-k per key by (sim desc,
    other asc), attaching rank — the fused, single-shuffle replacement for
    ``dropDuplicates([key, other])`` + window row_number (two shuffles).
    Fully vectorized: one lexsort for dedup, one for ranking, no per-group
    Python loop."""
    from pyspark.sql.types import IntegerType, StructField, StructType

    out_schema = StructType(
        list(pairs.select(key, other, sim).schema.fields)
        + [StructField("rank", IntegerType(), False)]
    )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        l = pdf[key].to_numpy()
        r = pdf[other].to_numpy()
        s = pdf[sim].to_numpy()
        # factorize string ids to int codes: np.unique returns lexically
        # sorted uniques, so code order == string order and every sort /
        # comparison below runs on ints instead of Python string objects
        l_uniq = r_uniq = None
        if l.dtype == object:
            l_uniq, l = np.unique(l, return_inverse=True)
        if r.dtype == object:
            r_uniq, r = np.unique(r, return_inverse=True)
        # dedup (key, other) pairs (same pair found in >1 bucket), keeping
        # the MAX sim deterministically — sims of a duplicated pair are
        # normally identical (same vectors), but floating context can
        # differ, and keep-max is the defensible contract
        order = np.lexsort((-s, r, l))
        l, r, s = l[order], r[order], s[order]
        keep = np.ones(len(l), dtype=bool)
        keep[1:] = (l[1:] != l[:-1]) | (r[1:] != r[:-1])
        l, r, s = l[keep], r[keep], s[keep]
        # rank by (key asc, sim desc, other asc); cumcount via group starts
        order = np.lexsort((r, -s, l))
        l, r, s = l[order], r[order], s[order]
        new_grp = np.concatenate([[True], l[1:] != l[:-1]])
        starts = np.nonzero(new_grp)[0]
        sizes = np.diff(np.concatenate([starts, [len(l)]]))
        rank = np.arange(len(l)) - np.repeat(starts, sizes) + 1
        m = rank <= k
        l_out = l_uniq[l[m]] if l_uniq is not None else l[m]
        r_out = r_uniq[r[m]] if r_uniq is not None else r[m]
        return pd.DataFrame(
            {key: l_out, other: r_out, sim: s[m], "rank": rank[m].astype(np.int32)}
        )

    return grouped_map_in_pandas(pairs, [key], kernel, out_schema, num_partitions)
