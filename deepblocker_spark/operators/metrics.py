"""Blocking-quality metrics (SURVEY.md O26-O27).

recall = |candidates ∩ golden| / |golden|
cssr   = |candidates| / (N_left * N_right)    (candidate-set-size ratio)

Formulas from /root/reference/blocking_utils.py:24-31. The golden set is
small relative to candidates, so the intersection is a broadcast-hash join.
Everything stays lazy; the result is a single-row DataFrame so the metric
computation itself is oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def blocking_statistics(
    candidates: DataFrame,
    golden: DataFrame,
    n_left: int,
    n_right: int,
    l_col: str = "l_id",
    r_col: str = "r_id",
    golden_l: str = "ltable_id",
    golden_r: str = "rtable_id",
) -> DataFrame:
    """Single-row DataFrame(left_num_tuples, right_num_tuples, recall, cssr)."""
    g = golden.select(
        F.col(golden_l).alias(l_col), F.col(golden_r).alias(r_col)
    ).dropDuplicates()
    cand = candidates.select(l_col, r_col)
    tp = cand.join(F.broadcast(g), [l_col, r_col], "inner").agg(
        F.count("*").alias("true_positives")
    )
    totals = cand.agg(F.count("*").alias("n_candidates")).crossJoin(
        g.agg(F.count("*").alias("n_golden"))
    )
    return (
        totals.crossJoin(tp)
        .select(
            F.lit(n_left).alias("left_num_tuples"),
            F.lit(n_right).alias("right_num_tuples"),
            (F.col("true_positives") / F.col("n_golden")).alias("recall"),
            (F.col("n_candidates") / (F.lit(n_left) * F.lit(n_right))).alias("cssr"),
            F.col("n_candidates"),
            F.col("n_golden"),
            F.col("true_positives"),
        )
    )


def pairwise_f1(
    predicted: DataFrame,
    golden: DataFrame,
    l_col: str = "l_id",
    r_col: str = "r_id",
) -> DataFrame:
    """Single-row DataFrame(precision, recall, f1) over undirected pairs.
    Target metric per BASELINE.json (pairwise F1 >= 0.99); no reference
    counterpart — the reference only reports blocking recall/cssr."""
    def norm(df: DataFrame) -> DataFrame:
        a, b = F.col(l_col), F.col(r_col)
        return df.select(
            F.least(a, b).alias("a"), F.greatest(a, b).alias("b")
        ).dropDuplicates()

    p = norm(predicted)
    g = norm(golden)
    tp = p.join(g, ["a", "b"], "inner").agg(F.count("*").alias("tp"))
    counts = p.agg(F.count("*").alias("n_pred")).crossJoin(
        g.agg(F.count("*").alias("n_gold"))
    )
    return counts.crossJoin(tp).select(
        (F.col("tp") / F.col("n_pred")).alias("precision"),
        (F.col("tp") / F.col("n_gold")).alias("recall"),
        (
            2
            * F.col("tp")
            / (F.col("n_pred") + F.col("n_gold"))
        ).alias("f1"),
        "tp",
        "n_pred",
        "n_gold",
    )


def clustering_eval(
    predicted: DataFrame,
    gold: DataFrame,
    id_col: str = "id",
    pred_col: str = "component",
    gold_col: str = "gold_cluster",
) -> DataFrame:
    """Cluster-LEVEL evaluation of a predicted clustering against a gold
    clustering over the same id universe: B-cubed precision/recall/F1
    (Bagga & Baldwin 1998 — the standard ER clustering metric, robust to
    cluster-size skew where pairwise F1 is quadratically dominated by big
    clusters) plus Rand index and adjusted Rand index. No reference
    counterpart — the reference stops at candidate pairs; this closes the
    loop for the clustering stage the way ``pairwise_f1`` does for pairs.

    -> single row (n_items, n_pred_clusters, n_gold_clusters,
    bcubed_precision, bcubed_recall, bcubed_f1, rand_index, adjusted_rand,
    homogeneity, completeness, v_measure).

    Everything reduces over the pred×gold CONTINGENCY table: with
    n_ij = |pred cluster i ∩ gold cluster j|, n_i. and n_.j the cluster
    sizes and N the item count,
      B³P = Σ_ij n_ij²/n_i. / N          B³R = Σ_ij n_ij²/n_.j / N
      RI  = (C(N,2) + 2Σ C(n_ij,2) − Σ C(n_i.,2) − Σ C(n_.j,2)) / C(N,2)
      ARI = (Σ C(n_ij,2) − E) / ((Σ C(n_i.,2)+Σ C(n_.j,2))/2 − E),
            E = Σ C(n_i.,2) · Σ C(n_.j,2) / C(N,2)
      homogeneity  = 1 − H(gold|pred)/H(gold)   (1 when H(gold) = 0)
      completeness = 1 − H(pred|gold)/H(pred)   (1 when H(pred) = 0)
      v_measure    = harmonic mean of the two (Rosenberg & Hirschberg '07)
    Scale shape: one equi-join on id (the only row-scale shuffle), then one
    hash agg to the contingency table — everything after runs on ≤
    #clusters² rows. Cluster-size frames join back on the cluster key;
    at realistic cluster counts AQE broadcasts them. No collect, no UDF.
    Zero denominators (empty input; ARI on two identical trivial
    clusterings) yield NULL, mirrored by the oracle's CASE guards.
    """
    p = predicted.select(F.col(id_col).alias("_id"), F.col(pred_col).alias("_pc"))
    g = gold.select(F.col(id_col).alias("_id"), F.col(gold_col).alias("_gc"))
    cont = (
        p.join(g, "_id")
        .groupBy("_pc", "_gc")
        .agg(F.count("*").cast("double").alias("_nij"))
    )
    rows = cont.groupBy("_pc").agg(F.sum("_nij").alias("_ni"))
    cols = cont.groupBy("_gc").agg(F.sum("_nij").alias("_nj"))
    joined = cont.join(rows, "_pc").join(cols, "_gc")
    sums = joined.agg(
        F.sum("_nij").alias("_n"),
        F.sum(F.col("_nij") * F.col("_nij") / F.col("_ni")).alias("_sp"),
        F.sum(F.col("_nij") * F.col("_nij") / F.col("_nj")).alias("_sr"),
        F.sum(F.col("_nij") * (F.col("_nij") - 1) / 2).alias("_aij"),
        # Σ n_ij·ln(n_ij/n_i.) and Σ n_ij·ln(n_ij/n_.j): the un-normalized
        # conditional entropies (÷ −N below); nij >= 1 so ln is safe
        F.sum(F.col("_nij") * F.log(F.col("_nij") / F.col("_ni"))).alias("_eg"),
        F.sum(F.col("_nij") * F.log(F.col("_nij") / F.col("_nj"))).alias("_ep"),
    )
    ai = rows.agg(
        F.sum(F.col("_ni") * (F.col("_ni") - 1) / 2).alias("_ai"),
        F.sum(F.col("_ni") * F.log("_ni")).alias("_sni"),
        F.count("*").alias("_npc"),
    )
    aj = cols.agg(
        F.sum(F.col("_nj") * (F.col("_nj") - 1) / 2).alias("_aj"),
        F.sum(F.col("_nj") * F.log("_nj")).alias("_snj"),
        F.count("*").alias("_ngc"),
    )
    m = sums.crossJoin(ai).crossJoin(aj)
    npairs = F.col("_n") * (F.col("_n") - 1) / 2
    # try_divide: NULL (not an ANSI error) when npairs=0 — this division is
    # the one evaluated OUTSIDE a CASE guard (it feeds the guard itself)
    exp = F.try_divide(F.col("_ai") * F.col("_aj"), npairs)
    ari_den = (F.col("_ai") + F.col("_aj")) / 2 - exp
    # entropies (natural log): H(pred) = ln N − Σ n_i.·ln(n_i.)/N, etc.;
    # a 1e-12 tolerance (not ==0) guards float residue of ln(N)−N·lnN/N —
    # the SAME guard expression is mirrored in the SQL oracle
    h_pred = F.log(F.col("_n")) - F.col("_sni") / F.col("_n")
    h_gold = F.log(F.col("_n")) - F.col("_snj") / F.col("_n")
    h_gold_given_pred = -F.col("_eg") / F.col("_n")
    h_pred_given_gold = -F.col("_ep") / F.col("_n")
    homog = F.when(h_gold > 1e-12, 1 - h_gold_given_pred / h_gold).otherwise(
        F.lit(1.0)
    )
    compl = F.when(h_pred > 1e-12, 1 - h_pred_given_gold / h_pred).otherwise(
        F.lit(1.0)
    )
    return m.select(
        F.col("_n").cast("long").alias("n_items"),
        F.col("_npc").cast("long").alias("n_pred_clusters"),
        F.col("_ngc").cast("long").alias("n_gold_clusters"),
        F.round(
            F.when(F.col("_n") > 0, F.col("_sp") / F.col("_n")), 9
        ).alias("bcubed_precision"),
        F.round(
            F.when(F.col("_n") > 0, F.col("_sr") / F.col("_n")), 9
        ).alias("bcubed_recall"),
        F.round(
            F.when(
                F.col("_sp") + F.col("_sr") > 0,
                2 * F.col("_sp") * F.col("_sr")
                / (F.col("_n") * (F.col("_sp") + F.col("_sr"))),
            ),
            9,
        ).alias("bcubed_f1"),
        F.round(
            F.when(
                npairs > 0,
                (npairs + 2 * F.col("_aij") - F.col("_ai") - F.col("_aj"))
                / npairs,
            ),
            9,
        ).alias("rand_index"),
        F.round(
            F.when(ari_den != 0, (F.col("_aij") - exp) / ari_den), 9
        ).alias("adjusted_rand"),
        F.round(homog, 9).alias("homogeneity"),
        F.round(compl, 9).alias("completeness"),
        F.round(
            F.when(homog + compl > 0, 2 * homog * compl / (homog + compl))
            .otherwise(F.lit(0.0)),
            9,
        ).alias("v_measure"),
    )


def threshold_sweep(
    scored: DataFrame,
    golden: DataFrame,
    thresholds: list[float],
    l_col: str = "l_id",
    r_col: str = "r_id",
    sim_col: str = "sim",
    golden_l: str = "ltable_id",
    golden_r: str = "rtable_id",
) -> DataFrame:
    """Precision/recall/F1 of the scored pair set against ``golden`` at each
    cut in ``thresholds`` — the PR-curve an ER pipeline logs per run to pick
    its operating point. -> one row per threshold: (threshold, n_pred, tp,
    n_gold, precision, recall, f1), counts long, ratios rounded to 9.

    One pass over the scored pairs: normalize to undirected (least/greatest,
    max sim per pair), LEFT-join the golden flag (plain equi-join — golden
    may be large at scale, AQE broadcasts it when it isn't), explode the
    (tiny, broadcast) threshold grid against each pair's sim, and hash-
    aggregate per threshold. Thresholds that no pair clears still appear
    (zero counts): the grid frame is the left side, so no cut is silently
    dropped. Ratios with zero denominators are NULL (never 0/0) —
    identical case-guards on the oracle side keep the engines aligned.

    f1 is computed as 2*tp/(n_pred+n_gold) — algebraically the harmonic
    mean of precision and recall but free of compounded rounding."""
    a, b = F.col(l_col), F.col(r_col)
    p = (
        scored.select(
            F.least(a, b).alias("a"),
            F.greatest(a, b).alias("b"),
            F.col(sim_col).alias("_sim"),
        )
        .groupBy("a", "b")
        .agg(F.max("_sim").alias("_sim"))
    )
    ga, gb = F.col(golden_l), F.col(golden_r)
    g = (
        golden.select(F.least(ga, gb).alias("a"), F.greatest(ga, gb).alias("b"))
        .dropDuplicates()
        .withColumn("_m", F.lit(1))
    )
    joined = p.join(g, ["a", "b"], "left")
    spark = scored.sparkSession
    th = spark.createDataFrame([(float(t),) for t in thresholds], "threshold double")
    hits = (
        joined.join(F.broadcast(th), F.col("_sim") >= F.col("threshold"))
        .groupBy("threshold")
        .agg(
            F.count("*").alias("n_pred"),
            F.coalesce(F.sum("_m"), F.lit(0)).alias("tp"),
        )
    )
    n_gold = g.agg(F.count("*").alias("n_gold"))
    out = (
        th.join(hits, "threshold", "left")
        .crossJoin(F.broadcast(n_gold))
        .select(
            "threshold",
            F.coalesce(F.col("n_pred"), F.lit(0)).cast("long").alias("n_pred"),
            F.coalesce(F.col("tp"), F.lit(0)).cast("long").alias("tp"),
            F.col("n_gold").cast("long").alias("n_gold"),
        )
    )
    return out.select(
        "threshold", "n_pred", "tp", "n_gold",
        F.round(
            F.when(F.col("n_pred") > 0, F.col("tp") / F.col("n_pred")), 9
        ).alias("precision"),
        F.round(
            F.when(F.col("n_gold") > 0, F.col("tp") / F.col("n_gold")), 9
        ).alias("recall"),
        F.round(
            F.when(
                F.col("n_pred") + F.col("n_gold") > 0,
                2 * F.col("tp") / (F.col("n_pred") + F.col("n_gold")),
            ),
            9,
        ).alias("f1"),
    )


def blocking_key_report(
    df: DataFrame,
    key_sets: list[list[str]],
    golden: DataFrame,
    id_col: str = "id",
    golden_l: str = "ltable_id",
    golden_r: str = "rtable_id",
) -> DataFrame:
    """Blocking-scheme advisor: for each candidate key set, the numbers an
    ER practitioner compares before picking a blocker — how many
    candidate pairs the scheme generates (cost) and how much of the
    golden set it keeps (recall). -> one row per key set:
    (key_set, n_blocks, n_candidate_pairs, cssr, recall), cssr =
    pairs / C(N,2), ratios rounded to 9, NULL-keyed rows excluded (SQL
    equality semantics: a NULL key never blocks with anything).

    Cost comes from BLOCK SIZES, never from materialized pairs:
    Σ C(size,2) over a hash agg per key set — the report over a 100 TB
    corpus costs K aggregates, not K pair generations. Recall joins the
    (small) golden set back to the row attributes twice and compares key
    equality per pair — broadcast-friendly. The per-key-set frames union
    into one result (K is a handful; the union is trivial)."""
    spark = df.sparkSession
    n_rows = None
    outs = []
    for keys in key_sets:
        label = "+".join(keys)
        nn = F.col("_sz")
        valid = df.select(id_col, *keys).na.drop(subset=keys)
        sizes = valid.groupBy(*keys).agg(F.count("*").alias("_sz"))
        cost = sizes.agg(
            F.count("*").alias("n_blocks"),
            F.coalesce(F.sum(nn * (nn - 1) / 2), F.lit(0.0)).alias("_pairs"),
        )
        l = valid.select(
            F.col(id_col).alias(golden_l),
            *[F.col(k).alias(f"_l_{k}") for k in keys],
        )
        r = valid.select(
            F.col(id_col).alias(golden_r),
            *[F.col(k).alias(f"_r_{k}") for k in keys],
        )
        same_key = None
        for k in keys:
            c = F.col(f"_l_{k}") == F.col(f"_r_{k}")
            same_key = c if same_key is None else (same_key & c)
        g = golden.select(golden_l, golden_r).dropDuplicates()
        hit = (
            g.join(l, golden_l).join(r, golden_r)
            .agg(
                F.coalesce(F.sum(same_key.cast("int")), F.lit(0)).alias("_tp")
            )
        )
        n_gold = g.agg(F.count("*").alias("_ng"))
        outs.append(
            cost.crossJoin(hit).crossJoin(n_gold).select(
                F.lit(label).alias("key_set"),
                F.col("n_blocks").cast("long").alias("n_blocks"),
                F.col("_pairs").cast("long").alias("n_candidate_pairs"),
                F.col("_tp").cast("long").alias("tp"),
                F.col("_ng").cast("long").alias("n_golden"),
            )
        )
    rep = outs[0]
    for o in outs[1:]:
        rep = rep.unionByName(o)
    total = df.agg(F.count("*").alias("_n"))
    return rep.crossJoin(F.broadcast(total)).select(
        "key_set", "n_blocks", "n_candidate_pairs",
        F.round(
            F.when(
                F.col("_n") > 1,
                F.col("n_candidate_pairs")
                / (F.col("_n") * (F.col("_n") - 1) / 2),
            ),
            9,
        ).alias("cssr"),
        F.round(
            F.when(F.col("n_golden") > 0, F.col("tp") / F.col("n_golden")), 9
        ).alias("recall"),
        "tp", "n_golden",
    )


def rank_biased_overlap(
    a: DataFrame,
    b: DataFrame,
    k: int,
    p: float = 0.9,
    qid_col: str = "qid",
    id_col: str = "id",
    rank_col: str = "rank",
) -> DataFrame:
    """Per-query rank-biased overlap (Webber, Moffat & Zobel, TOIS 2010)
    between two top-k rankings — the ranking-comparison metric for this
    repo's rankers (BM25 variants, LSH/IVF/PQ ANN, exact top-k): how much
    two candidate orderings agree, weighted toward the top.

    Truncated-and-normalized form: with agreement A_d = |A₁..d ∩ B₁..d|/d,

        rbo@k = (1-p)/(1-p^k) · Σ_{d=1..k} p^(d-1) · A_d

    so identical FULL-DEPTH rankings score exactly 1.0 for any (p, k) and
    disjoint ones 0.0; smaller p concentrates the weight nearer rank 1.
    Lists shorter than k are penalized by truncation even when identical
    (agreement at depths past the list length is |list|/d — the standard
    RBO_min behavior; pass k = the actual list depth to avoid it).

    Spark shape — no per-depth loop over the data: a pair appearing at
    ranks (ra, rb) is inside both prefixes for every depth d ≥ max(ra,rb),
    so its total contribution is Σ_{d=max}^{k} p^(d-1)/d — computed ONCE
    per matched pair with a JVM ``aggregate`` over ``sequence(max, k)``
    (k terms, codegen'd), then one hash agg per query. Queries present in
    either ranking but sharing nothing score 0.0 (never dropped).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if not 0.0 < p < 1.0:
        raise ValueError(f"p must be in (0, 1), got {p}")
    ra = a.select(
        F.col(qid_col).alias("qid"), F.col(id_col).alias("id"),
        F.col(rank_col).alias("_ra"),
    ).filter(F.col("_ra") <= k)
    rb = b.select(
        F.col(qid_col).alias("qid"), F.col(id_col).alias("id"),
        F.col(rank_col).alias("_rb"),
    ).filter(F.col("_rb") <= k)
    m = F.greatest("_ra", "_rb")
    pair_w = ra.join(rb, ["qid", "id"]).select(
        "qid",
        F.aggregate(
            F.sequence(m, F.lit(k)),
            F.lit(0.0),
            lambda acc, d: acc + F.pow(F.lit(p), d - 1) / d,
        ).alias("_w"),
    )
    norm = (1.0 - p) / (1.0 - p ** k)
    qids = ra.select("qid").union(rb.select("qid")).distinct()
    scored = pair_w.groupBy("qid").agg(
        F.round(F.lit(norm) * F.sum("_w"), 9).alias("rbo")
    )
    return qids.join(scored, "qid", "left").select(
        "qid", F.coalesce("rbo", F.lit(0.0)).alias("rbo")
    )


def otsu_cut(
    scored: DataFrame,
    score_col: str = "match_weight",
    bins: int = 64,
    lo: float | None = None,
    hi: float | None = None,
) -> DataFrame:
    """Unsupervised decision-threshold selection over a 1-D score column
    (Otsu, IEEE TSMC 1979) — picks the cut that maximizes between-class
    variance of the score histogram, the standard label-free way to split
    a Fellegi-Sunter match-weight distribution into its match / non-match
    modes (the reference stops at candidate sets and has no thresholding;
    Winkler's review discusses weight-histogram cutoffs).

    -> one row per NON-EMPTY histogram bin:
    (bin int, n_pairs long, cum_n long, cum_wsum long, var_between double
    NULL when the cut leaves the upper class empty, is_otsu boolean,
    threshold double non-NULL only on the winning row: the score-space cut
    lo + (bin+1)*width).

    Exactness discipline: Otsu runs on BIN INDICES, not score values — the
    moments cum_n = Σ n_j and cum_wsum = Σ n_j*j are exact BIGINT
    aggregates, so every downstream double (w0, mu0, mu1, the variance) is
    computed from exact integers in a fixed expression order and is
    bit-identical on any engine regardless of aggregation order. Ties in
    the (exact) variance break to the smallest bin. Empty bins carry no
    information Otsu can use (the cut after an empty bin has the same
    moments as the previous non-empty cut), so candidates are the
    non-empty bins — identical on the oracle side (GROUP BY).

    Scale shape: one hash aggregation to <= ``bins`` rows, then windows
    over that bounded histogram (single-partition by construction — the
    frame is at most ``bins`` rows, never the data).

    Choosing the score scale: on a heavily imbalanced candidate set
    (lambda << 1, the usual post-blocking regime) cut the POSTERIOR
    (``match_probability``), not the raw log-weight — the dominant class's
    raw-weight spread rivals the inter-mode gap, so unweighted
    between-class variance cuts inside it (measured in
    tests/test_otsu.py::test_unsupervised_end_to_end_em_plus_otsu: weight
    cut -20.9 / precision 0.004; posterior cut precision >= 0.9 on the
    same pairs). The sigmoid squashes the dominant mode's spread while
    keeping the modes ~1 apart — the geometry Otsu assumes."""
    from pyspark.sql import Window

    w = F.col(score_col).cast("double")
    if lo is None or hi is None:
        rng = scored.agg(
            F.min(w).alias("_lo"), F.max(w).alias("_hi")
        )
        src = scored.crossJoin(F.broadcast(rng))
        lo_c, hi_c = F.col("_lo"), F.col("_hi")
    else:
        src = scored
        lo_c, hi_c = F.lit(float(lo)), F.lit(float(hi))
    width = (hi_c - lo_c) / F.lit(float(bins))
    # clamp BOTH ends (ADVICE r5 #1): with caller-supplied lo/hi, a score
    # below lo would otherwise yield a negative bin index and silently skew
    # the histogram moments. No-op when lo/hi bound the data (the derived-
    # range path always does), so oracle-checked outputs are unchanged.
    bin_c = F.when(width > 0, F.greatest(F.lit(0), F.least(
        F.lit(bins - 1), F.floor((w - lo_c) / width).cast("int")
    ))).otherwise(F.lit(0))
    hist = (
        src.select(
            bin_c.alias("bin"),
            lo_c.alias("_lo2"),
            width.alias("_width"),
        )
        .groupBy("bin", "_lo2", "_width")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )
    ow = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.select(
        "bin",
        "n_pairs",
        "_lo2",
        "_width",
        F.sum("n_pairs").over(ow).alias("cum_n"),
        F.sum(F.col("n_pairs") * F.col("bin")).over(ow).alias("cum_wsum"),
    )
    tot = hist.agg(
        F.sum("n_pairs").alias("_n_total"),
        F.sum(F.col("n_pairs") * F.col("bin")).alias("_wsum_total"),
    )
    j = cum.crossJoin(F.broadcast(tot))
    w0 = F.col("cum_n") / F.col("_n_total")
    mu0 = F.col("cum_wsum").cast("double") / F.col("cum_n")
    mu1 = (F.col("_wsum_total") - F.col("cum_wsum")).cast("double") / (
        F.col("_n_total") - F.col("cum_n")
    )
    var_raw = F.when(
        F.col("cum_n") < F.col("_n_total"),
        w0 * (F.lit(1.0) - w0) * (mu0 - mu1) * (mu0 - mu1),
    )
    ranked = j.withColumn("_var_raw", var_raw).withColumn(
        "_rk",
        F.row_number().over(
            Window.orderBy(F.col("_var_raw").desc_nulls_last(), F.col("bin"))
        ),
    )
    return ranked.select(
        "bin",
        F.col("n_pairs").cast("long").alias("n_pairs"),
        F.col("cum_n").cast("long").alias("cum_n"),
        F.col("cum_wsum").cast("long").alias("cum_wsum"),
        F.round("_var_raw", 9).alias("var_between"),
        (F.col("_rk") == 1).alias("is_otsu"),
        F.when(
            F.col("_rk") == 1,
            F.round(
                F.col("_lo2") + (F.col("bin") + 1) * F.col("_width"), 9
            ),
        ).alias("threshold"),
    )
