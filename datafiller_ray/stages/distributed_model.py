"""Distributed (salted) model fill: reference model semantics at chunk scale.

The per-source model fill trains one ridge per observed-feature pattern on
the source's WHOLE history — a global fit that a (source, time-range) chunk
cannot see. This module distributes it without changing the math, using the
fact that both of its sufficient statistics are sums over rows:

  pass 1 (per chunk, ghost margin = max(|lags|, max_gap+1)):
      - per-column observed (count, sum, sumsq) partials over in-chunk rows
        -> the global standardization stats (``_standardization``,
        reference ``multivariate/imputer.py:421-451``);
      - one RAW-space Gram of Z = [X(zero-filled), y, 1] per distinct
        trainable-row feature pattern over in-chunk trainable rows
        (the reference's mergeable group Grams,
        ``multivariate/_gram.py:80-118``);
      - the set of predict patterns present among in-chunk imputable rows.

  solve (per source, tiny):
      combine stats; sum Grams per pattern; for each predict pattern sum the
      covering group Grams and convert raw -> standardized space
      analytically (E[z_a z_b] = (S_ab - mu_b S_a - mu_a S_b + n mu_a mu_b)
      / (sd_a sd_b), with S_a read off the Gram's ones column) — exact
      algebra, so only float summation order differs from the single-pass
      fit; solve with ``fit_ridge_from_gram``.

  pass 2 (per chunk): rebuild features, standardize with the broadcast
      stats, predict in-chunk imputable rows with the broadcast models,
      apply the mean fallback (= broadcast y mean), emit 1m tier rows.

Equivalence to the per-source path is tolerance-level (the reference's own
standard for Gram-vs-materialized equivalence,
``tests/test_multivariate.py:375-388``); counts/flags/eligibility are exact.

When to use which (measured at sf0.3, 32 cpus): the per-source Gram path
fills a 200k-bucket series in ~2 s, so for retention-bounded series the
plain ``rollup_tiers(strategy="model")`` wall is lower (10.5 s vs 31.5 s —
this path pays two extra small shuffles). The distributed path exists for
mega-series whose single-source fill would bound the wall (multi-year 1m
retention, ~5M+ buckets), where chunk parallelism dominates the extra
shuffle cost.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray

from datafiller_ray.config import FillConfig, RetentionConfig
from datafiller_ray.functions import gapfill
from datafiller_ray.functions.features import build_lag_features, make_time_features
from datafiller_ray.functions.gapfill import METHOD_CODES, _eligible_mask
from datafiller_ray.functions.ridge import fit_ridge_from_gram
from datafiller_ray.stages.fill import TIER_COLUMNS, combine_partials
from datafiller_ray.stages.salted_fill import STEP, chunk_grid_slice

N_TIME = 5


def margin_for(cfg: FillConfig) -> int:
    lag_margin = max(abs(l) for l in cfg.lags) if cfg.lags else 1
    gap_margin = (cfg.max_gap + 1) if cfg.max_gap is not None else 0
    return max(lag_margin, gap_margin, 1)


def _chunk_window(g: pd.DataFrame, bounds: dict, salt_span: int, margin: int):
    """Shared window construction for both passes. Returns None when the
    chunk contributes nothing, else a dict of arrays."""
    source = g["source"].iloc[0]
    salt = int(g["salt"].iloc[0])
    src_lo, src_hi = bounds[source]
    c_lo, c_hi = salt * salt_span, (salt + 1) * salt_span
    in_chunk_grid = chunk_grid_slice(src_lo, src_hi, c_lo, c_hi)
    if in_chunk_grid.size == 0:
        return None
    observed = combine_partials(g.drop(columns=["salt", "ghost"], errors="ignore"))
    ts = observed["bucket_ts"].to_numpy(np.int64)
    counts_obs = observed["count"].to_numpy(np.int64)
    lo = max(src_lo, int(in_chunk_grid[0]) - margin * STEP)
    hi = min(src_hi, int(in_chunk_grid[-1]) + margin * STEP)
    lo = min(lo, int(ts.min()))
    hi = max(hi, int(ts.max()))
    grid = np.arange(lo, hi + STEP, STEP, dtype=np.int64)
    n = grid.size
    pos = (ts - lo) // STEP
    count = np.zeros(n, np.int64)
    y = np.full(n, np.nan)
    mn = np.full(n, np.nan)
    mx = np.full(n, np.nan)
    real = counts_obs > 0  # marker rows (count==0) stay unobserved
    count[pos] = counts_obs
    y[pos[real]] = observed["sum"].to_numpy(np.float64)[real]
    mn[pos[real]] = observed["min"].to_numpy(np.float64)[real]
    mx[pos[real]] = observed["max"].to_numpy(np.float64)[real]
    in_chunk = (grid >= c_lo) & (grid < c_hi)
    return {
        "source": source,
        "grid": grid,
        "count": count,
        "y": y,
        "mn": mn,
        "mx": mx,
        "in_chunk": in_chunk,
        "src_lo": src_lo,
        "src_hi": src_hi,
    }


def _features(win: dict, cfg: FillConfig) -> tuple[np.ndarray, np.ndarray]:
    """Raw feature matrix (lags + calendar) over the window grid, and its
    observed mask. Trend is pinned to the source's global span so chunked
    values equal the whole-series pass."""
    lag = build_lag_features(win["y"], cfg.lags)
    time = make_time_features(
        win["grid"], trend_t0=win["src_lo"], trend_t1=win["src_hi"]
    ).astype(np.float64)
    X = np.concatenate([lag, time], axis=1)
    return X, ~np.isnan(X)


def make_stats_grams_fn(cfg: FillConfig, salt_span: int, bounds_ref):
    """Pass-1 map_groups fn: emit stat / gram / predict-pattern rows."""
    margin = margin_for(cfg)
    n_feats = len(cfg.lags) + N_TIME
    k2 = n_feats + 2
    bitpos = np.uint64(1) << np.arange(n_feats, dtype=np.uint64)

    columns = ["source", "skey", "kind", "col", "cnt", "vsum", "vsumsq", "mask", "n", "gram"]

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        if g["source"].nunique() != 1:
            return pd.concat(
                [fn(sub) for _, sub in g.groupby("source", sort=True)],
                ignore_index=True,
            )
        bounds = bounds_ref if isinstance(bounds_ref, dict) else ray.get(bounds_ref)
        win = _chunk_window(g, bounds, salt_span, margin)
        empty = pd.DataFrame(
            {
                "source": pd.Series([], dtype=object),
                "skey": pd.Series([], dtype=np.int64),
                "kind": pd.Series([], dtype=np.int64),
                "col": pd.Series([], dtype=np.int64),
                "cnt": pd.Series([], dtype=np.int64),
                "vsum": pd.Series([], dtype=np.float64),
                "vsumsq": pd.Series([], dtype=np.float64),
                "mask": pd.Series([], dtype=np.int64),
                "n": pd.Series([], dtype=np.int64),
                "gram": pd.Series([], dtype=object),
            }
        )
        if win is None:
            return empty
        skey = int(g["skey"].iloc[0])
        X, feat_obs = _features(win, cfg)
        y = win["y"]
        in_chunk = win["in_chunk"]
        rows = []

        # per-column stats over in-chunk rows (col n_feats == y itself)
        Xi = X[in_chunk]
        oi = feat_obs[in_chunk]
        yi = y[in_chunk]
        for j in range(n_feats):
            col = Xi[:, j][oi[:, j]]
            rows.append((win["source"], skey, 0, j, col.size, col.sum(), (col**2).sum(), 0, 0, b""))
        yo = yi[~np.isnan(yi)]
        rows.append((win["source"], skey, 0, n_feats, yo.size, yo.sum(), (yo**2).sum(), 0, 0, b""))

        # raw group Grams over in-chunk trainable rows
        masks = (feat_obs @ bitpos).view(np.int64)
        trainable = in_chunk & ~np.isnan(y)
        t_idx = np.flatnonzero(trainable)
        if t_idx.size:
            Xz = np.where(feat_obs, X, 0.0)
            Z = np.column_stack([Xz[t_idx], y[t_idx], np.ones(t_idx.size)])
            t_masks = masks[t_idx]
            uniq, inv, cnts = np.unique(t_masks, return_inverse=True, return_counts=True)
            order = np.argsort(inv, kind="stable")
            bnd = np.searchsorted(inv[order], np.arange(uniq.size + 1))
            for gi in range(uniq.size):
                Zg = Z[order[bnd[gi] : bnd[gi + 1]]]
                gram = np.ascontiguousarray(Zg.T @ Zg).tobytes()
                rows.append(
                    (win["source"], skey, 1, 0, 0, 0.0, 0.0, int(uniq[gi]), int(cnts[gi]), gram)
                )

        # predict patterns among eligible in-chunk gap rows
        eligible = _eligible_mask(y, cfg.max_gap, allow_leading=True) & in_chunk
        e_idx = np.flatnonzero(eligible)
        e_gap = e_idx[np.isnan(y[e_idx])]
        for mk in np.unique(masks[e_gap]) if e_gap.size else []:
            rows.append((win["source"], skey, 2, 0, 0, 0.0, 0.0, int(mk), 0, b""))

        return pd.DataFrame(rows, columns=columns)

    return fn


def _histogram_optimask(
    group_masks: np.ndarray,
    n_by_mask: dict[int, int],
    feats: np.ndarray,
    min_rows: int,
) -> tuple[np.ndarray, int] | None:
    """Approximate the reference optimask rectangle from the merged
    per-pattern mask histogram, tracking the best rows x cols area with the
    reference's >=min_rows preference (``_optimask.py:160-242`` split
    objective). Two complementary trajectories are searched: drop-greedy
    from the full feature set (remove the column whose removal recovers the
    most complete rows) and grow-greedy from EVERY singleton (add the
    column keeping the most rows), plus drop-greedy from EVERY distinct
    group mask (the optimal rectangle's column set can always be widened
    to the intersection of its member groups' masks, so group masks are
    the natural deep-and-narrow seeds — without them a single rich
    pattern's full-width rectangle is invisible to both greedies). The
    singleton starts double as an exact
    feasibility sweep — rows() is antitone in the column set, so any
    feasible subset implies each of its singletons is feasible — hence the
    function returns None iff NO subset reaches ``min_rows``. Area
    optimality is HEURISTIC (the problem is maximum-edge-biclique-shaped,
    NP-hard): the property test asserts exact feasibility plus a measured
    area-ratio floor vs brute force instead of pinning equality
    (tests/test_property_round2.py; the lone-greedy predecessor hit ratio
    0.15 worst-case and missed feasibility 9/300).
    Returns (kept feature columns, training rows) or None."""
    counts = np.array([n_by_mask[int(m)] for m in group_masks], dtype=np.int64)

    def rows_for(cols: np.ndarray) -> int:
        mask = np.uint64(0)
        for f in cols:
            mask |= np.uint64(1) << np.uint64(f)
        return int(counts[(group_masks & mask) == mask].sum())

    feats = np.asarray(feats, dtype=np.int64)
    best: tuple[int, np.ndarray, int] | None = None  # (area, cols, rows)

    def consider(cols: np.ndarray) -> int:
        nonlocal best
        n = rows_for(cols)
        if n >= min_rows:
            area = n * cols.size
            # ties prefer more rows (narrower, better-conditioned train set)
            if best is None or area > best[0] or (area == best[0] and n > best[2]):
                best = (area, cols.copy(), n)
        return n

    cur = feats.copy()
    while cur.size:
        consider(cur)
        if cur.size == 1:
            break
        gains = np.array(
            [rows_for(np.delete(cur, i)) for i in range(cur.size)], dtype=np.int64
        )
        cur = np.delete(cur, int(np.argmax(gains)))
    for s in range(feats.size):
        cur = feats[[s]].copy()
        rest = np.delete(feats, s)
        consider(cur)
        while rest.size:
            cand_rows = np.array([rows_for(np.append(cur, r)) for r in rest])
            j = int(np.argmax(cand_rows))
            cur = np.append(cur, rest[j])
            rest = np.delete(rest, j)
            consider(cur)
    feat_bits = np.array(
        [int(f) for f in feats], dtype=np.uint64
    )
    for gm in np.unique(group_masks):
        cur = feats[((gm >> feat_bits) & np.uint64(1)).astype(bool)]
        while cur.size:
            consider(cur)
            if cur.size == 1:
                break
            gains = np.array(
                [rows_for(np.delete(cur, i)) for i in range(cur.size)],
                dtype=np.int64,
            )
            cur = np.delete(cur, int(np.argmax(gains)))
    if best is None:
        return None
    return best[1], best[2]


def solve_models(g: pd.DataFrame, cfg: FillConfig) -> dict:
    """Per-source solve: stats combine + covering-Gram ridge per predict
    pattern. Returns the broadcastable model record."""
    n_feats = len(cfg.lags) + N_TIME
    k2 = n_feats + 2
    stats = g[g["kind"] == 0]
    agg = stats.groupby("col").agg(
        cnt=("cnt", "sum"), vsum=("vsum", "sum"), vsumsq=("vsumsq", "sum")
    )
    mus = np.zeros(n_feats + 1)
    sds = np.ones(n_feats + 1)
    for col, r in agg.iterrows():
        if r.cnt > 0:
            mu = r.vsum / r.cnt
            var = max(r.vsumsq / r.cnt - mu * mu, 0.0)
            sd = np.sqrt(var)
            mus[col] = mu
            sds[col] = sd if (sd > 0 and np.isfinite(sd)) else 1.0

    grams_df = g[g["kind"] == 1]
    gram_by_mask: dict[int, np.ndarray] = {}
    n_by_mask: dict[int, int] = {}
    for r in grams_df.itertuples():
        m = int(r.mask)
        arr = np.frombuffer(bytes(r.gram), dtype=np.float64).reshape(k2, k2)
        if m in gram_by_mask:
            gram_by_mask[m] += arr
            n_by_mask[m] += int(r.n)
        else:
            gram_by_mask[m] = arr.copy()
            n_by_mask[m] = int(r.n)
    group_masks = np.array(sorted(gram_by_mask), dtype=np.uint64)

    models: dict[int, tuple[np.ndarray, float, np.ndarray]] = {}
    pred_masks = sorted({int(r.mask) for r in g[g["kind"] == 2].itertuples()})
    for p in pred_masks:
        pu = np.uint64(p)
        if pu == 0:
            continue
        covering = group_masks[(group_masks & pu) == pu]
        n_train = sum(n_by_mask[int(m)] for m in covering)
        feats = np.flatnonzero(
            (pu >> np.arange(n_feats, dtype=np.uint64)) & np.uint64(1)
        )
        if n_train < cfg.min_samples_train:
            if not cfg.optimask:
                continue
            # histogram optimask (the distributed analogue of the reference
            # whole-matrix rectangle search, _optimask.py:160-242): a
            # NaN-free rectangle IS "rows complete on a kept-column subset",
            # and per-subset training counts/Grams are exactly the covering
            # sums of the merged per-mask Grams — so the rectangle search
            # runs on the mask histogram, no row data needed. Greedy
            # column-drop maximizing rows x cols, preferring >= min rows
            # (the reference split's objective).
            sel = _histogram_optimask(
                group_masks, n_by_mask, feats, cfg.min_samples_train
            )
            if sel is None:
                continue
            feats, n_train = sel
            pu_fit = np.uint64(0)
            for f in feats:
                pu_fit |= np.uint64(1) << np.uint64(f)
            covering = group_masks[(group_masks & pu_fit) == pu_fit]
        G = np.zeros((k2, k2))
        for m in covering:
            G += gram_by_mask[int(m)]
        idx = np.concatenate([feats, [n_feats]])  # + ones col handled below
        kp = feats.size
        # convert raw Gram -> standardized space for [feats, y, 1]
        mu = np.concatenate([mus[feats], [mus[n_feats]]])
        sd = np.concatenate([sds[feats], [sds[n_feats]]])
        S = G[np.ix_(idx, idx)]  # raw cross sums
        S1 = G[idx, k2 - 1]  # column sums (vs ones)
        n = n_train
        Gs = np.zeros((kp + 2, kp + 2))
        core = (S - np.outer(mu, S1) - np.outer(S1, mu) + n * np.outer(mu, mu)) / np.outer(sd, sd)
        Gs[: kp + 1, : kp + 1] = core
        zsum = (S1 - n * mu) / sd
        Gs[: kp + 1, kp + 1] = zsum
        Gs[kp + 1, : kp + 1] = zsum
        Gs[kp + 1, kp + 1] = n
        coef, intercept = fit_ridge_from_gram(Gs, n, cfg.alpha)
        models[p] = (coef, intercept, feats)
    # global observed-y count: the fallback gate must see the SOURCE's
    # observation count, not a chunk window's (a gap longer than
    # salt_span + 2*margin makes a whole window NaN while the source
    # still has observations elsewhere)
    n_obs_y = int(agg.loc[n_feats, "cnt"]) if n_feats in agg.index else 0
    return {"mus": mus, "sds": sds, "models": models, "n_obs_y": n_obs_y}


def make_solve_fn(cfg: FillConfig):
    """Per-source solve wrapper for map_groups: returns one (source,
    pickled-record) row per source — the small table the driver broadcasts."""
    import pickle

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        if g["source"].nunique() != 1:
            return pd.concat(
                [fn(sub) for _, sub in g.groupby("source", sort=True)],
                ignore_index=True,
            )
        rec = solve_models(g, cfg)
        return pd.DataFrame(
            {"source": [g["source"].iloc[0]], "payload": [pickle.dumps(rec)]}
        )

    return fn


def make_predict_fn(
    cfg: FillConfig,
    salt_span: int,
    bounds_ref,
    models_ref,
    retention: RetentionConfig | None = None,
):
    """Pass-2 map_groups fn: predict in-chunk gap rows, emit 1m tier rows."""
    margin = margin_for(cfg)
    n_feats = len(cfg.lags) + N_TIME
    bitpos = np.uint64(1) << np.arange(n_feats, dtype=np.uint64)
    lut = np.array(
        [gapfill.METHOD_NAMES[c] for c in range(len(gapfill.METHOD_NAMES))],
        dtype=object,
    )

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        if g["source"].nunique() != 1:
            return pd.concat(
                [fn(sub) for _, sub in g.groupby("source", sort=True)],
                ignore_index=True,
            )
        bounds = bounds_ref if isinstance(bounds_ref, dict) else ray.get(bounds_ref)
        all_models = models_ref if isinstance(models_ref, dict) else ray.get(models_ref)
        win = _chunk_window(g, bounds, salt_span, margin)
        if win is None:
            return pd.DataFrame(columns=TIER_COLUMNS)
        source = win["source"]
        rec = all_models.get(source)
        y = win["y"]
        value = y.copy()
        codes = np.zeros(y.size, dtype=np.int8)
        if rec is not None and rec["models"]:
            X, feat_obs = _features(win, cfg)
            mus, sds = rec["mus"], rec["sds"]
            Xs = (X - mus[:n_feats]) / sds[:n_feats]
            masks = (feat_obs @ bitpos).view(np.int64)
            eligible = _eligible_mask(y, cfg.max_gap, allow_leading=True)
            e_idx = np.flatnonzero(eligible)
            y_mu, y_sd = mus[n_feats], sds[n_feats]
            for mk in np.unique(masks[e_idx]) if e_idx.size else []:
                model = rec["models"].get(int(mk))
                if model is None:
                    continue
                coef, intercept, feats = model
                rows = e_idx[masks[e_idx] == mk]
                pred = Xs[np.ix_(rows, feats)] @ coef + intercept
                value[rows] = pred * y_sd + y_mu
                codes[rows] = METHOD_CODES["model"]
        if cfg.fallback == "simple" and rec is not None and rec.get("n_obs_y", 0) > 0:
            still = np.isnan(value)
            value[still] = rec["mus"][n_feats]
            codes[still] = METHOD_CODES["mean"]
        filled = codes != 0
        rounded = np.round(value[filled])
        s = y.copy()
        mn, mx = win["mn"].copy(), win["mx"].copy()
        s[filled] = rounded
        mn[filled] = rounded
        mx[filled] = rounded
        fm = lut[codes]
        fm[(win["count"] == 0) & ~filled] = "none"
        df = pd.DataFrame(
            {
                "source": np.full(y.size, source, dtype=object),
                "tier": np.full(y.size, "1m", dtype=object),
                "bucket_ts": win["grid"],
                "count": win["count"],
                "sum": s,
                "min": mn,
                "max": mx,
                "value": value,
                "filled": filled,
                "fill_method": fm,
            }
        )
        df = df[win["in_chunk"]]
        if retention is not None:
            lo, hi = retention.bounds("1m")
            if lo is not None:
                df = df[df["bucket_ts"] >= lo]
            if hi is not None:
                df = df[df["bucket_ts"] < hi]
        return df

    return fn
