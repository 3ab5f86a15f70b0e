"""Sequence packing: group documents into token-budget bins (the
padding-waste reducer an LLM training pipeline runs between curation and
batch assembly — docs are concatenated per bin up to the context length).
No reference counterpart (pipeline scope beyond /root/reference).

Bin packing is NP-hard and inherently sequential, so the scale shape is
scatter-pack: documents hash deterministically into ``n_groups`` groups
(one shuffle), and first-fit-decreasing runs independently inside each
group via the sort-based grouped map (operators/grouped.py — whole groups
per kernel slice, no per-group Python call). FFD per group keeps the
classical 11/9·OPT + 1 guarantee group-wise; the global bin count is at
most that bound summed over groups, checked by the derived-property
oracle. Everything is deterministic: group = xxhash64(id) mod n_groups,
FFD order = (n_tokens desc, id asc), so the same input yields the same
bins on any cluster (for a fixed ``n_groups``).

Docs longer than the budget cannot be packed; they come back as
singleton bins flagged ``oversized`` — never silently dropped (the
repo's no-silent-caps rule) and never mixed with packable docs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: bins per group are indexed below this; group g's bins are
#: g * _BIN_STRIDE + local_index
_BIN_STRIDE = 1 << 20


def pack_sequences(
    df: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    n_groups: int = 64,
) -> DataFrame:
    """-> DataFrame(id_col, n_tokens, bin_id, oversized): every input row
    exactly once; Σ n_tokens ≤ budget within every non-oversized bin.
    ``bin_id`` = group * 2^20 + local FFD index (raises in the kernel if a
    group ever exceeds 2^20 bins)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import (
        BooleanType,
        LongType,
        StructField,
        StructType,
    )

    from deepblocker_spark.operators.grouped import (
        group_slices,
        grouped_map_in_pandas,
    )

    if budget <= 0:
        raise ValueError("budget must be positive")
    id_type = df.select(id_col).schema.fields[0].dataType
    src = df.select(
        F.col(id_col).alias("_id"),
        F.col(tokens_col).cast("long").alias("_nt"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_groups)).cast("int").alias("_grp"),
    )
    schema = StructType(
        [
            StructField(id_col, id_type, True),
            StructField("n_tokens", LongType(), True),
            StructField("bin_id", LongType(), False),
            StructField("oversized", BooleanType(), False),
        ]
    )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for a, b in group_slices(pdf, ["_grp"]):
            g = pdf.iloc[a:b]
            grp = int(g["_grp"].iloc[0])
            # FFD order: tokens desc, id asc — deterministic
            g = g.sort_values(["_nt", "_id"], ascending=[False, True])
            nt = g["_nt"].to_numpy()
            ids = g["_id"].to_numpy()
            bins_space: list[int] = []  # remaining capacity per open bin
            assign = np.empty(len(g), dtype=np.int64)
            over = np.zeros(len(g), dtype=bool)
            for i, t in enumerate(nt):
                if t > budget:
                    assign[i] = len(bins_space)
                    # -1 = CLOSED: a zero-token doc would satisfy a
                    # `space >= 0` test and sneak into the singleton
                    bins_space.append(-1)
                    over[i] = True
                    continue
                # first fit over open bins (nt is sorted desc, so linear
                # scan over a short open list; bins close as they fill)
                for bi, space in enumerate(bins_space):
                    if space >= t:
                        assign[i] = bi
                        bins_space[bi] = space - t
                        break
                else:
                    assign[i] = len(bins_space)
                    bins_space.append(budget - int(t))
            if len(bins_space) >= _BIN_STRIDE:
                raise ValueError(
                    f"group {grp}: {len(bins_space)} bins exceeds the "
                    f"2^20 stride — raise n_groups"
                )
            outs.append(
                pd.DataFrame(
                    {
                        id_col: ids,
                        "n_tokens": nt,
                        "bin_id": grp * _BIN_STRIDE + assign,
                        "oversized": over,
                    }
                )
            )
        if not outs:
            return pd.DataFrame(
                {id_col: [], "n_tokens": [], "bin_id": [], "oversized": []}
            )
        return pd.concat(outs, ignore_index=True)

    return grouped_map_in_pandas(src, ["_grp"], kernel, schema)


def packing_summary(packed: DataFrame, budget: int, n_groups: int = 64) -> DataFrame:
    """One-row validity/quality reduction of a ``pack_sequences`` output —
    the derived-property check the oracle recomputes from raw data:
      * valid: every non-oversized bin holds ≤ budget tokens, oversized
        bins are singletons above budget, and no doc is duplicated;
      * n_bins within [LB, 11/9·LB + 3·n_groups] where LB =
        ceil(packable_tokens/budget) (the FFD guarantee, summed over
        groups).
    -> (pack_ok, n_docs)."""
    bins = packed.groupBy("bin_id").agg(
        F.sum("n_tokens").alias("_tok"),
        F.count("*").alias("_cnt"),
        F.max(F.col("oversized").cast("int")).alias("_over"),
    )
    per_bin_ok = (
        (F.col("_over") == 0) & (F.col("_tok") <= budget)
    ) | ((F.col("_over") == 1) & (F.col("_cnt") == 1) & (F.col("_tok") > budget))
    bin_stats = bins.agg(
        F.count("*").alias("_nbins"),
        F.sum(F.when(per_bin_ok, 0).otherwise(1)).alias("_bad_bins"),
        F.sum(F.when(F.col("_over") == 0, F.col("_tok")).otherwise(0)).alias("_packable"),
        F.sum(F.when(F.col("_over") == 0, 1).otherwise(0)).alias("_nbins_packable"),
    )
    doc_stats = packed.agg(
        F.count("*").alias("_ndocs"),
        F.count_distinct(F.col(packed.columns[0])).alias("_ndistinct"),
    )
    lb = F.ceil(F.col("_packable") / F.lit(budget))
    return bin_stats.crossJoin(doc_stats).select(
        (
            (F.col("_bad_bins") == 0)
            & (F.col("_ndocs") == F.col("_ndistinct"))
            & (F.col("_nbins_packable") >= lb)
            & (F.col("_nbins_packable") <= F.ceil(lb * 11 / 9) + 3 * n_groups)
        )
        .cast("bigint")
        .alias("pack_ok"),
        F.col("_ndocs").cast("bigint").alias("n_docs"),
    )
