"""Hypothesis property tests for the round-2 kernels: frequency inference,
anchor-based interpolation (events sharded fill), and the categorical
encode/decode round trip."""

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from datafiller_ray.config import EngineValueError
from datafiller_ray.functions.categorical import decode_frame, encode_frame
from datafiller_ray.pipelines.events import _interp_like_sql
from datafiller_ray.stages.infer_freq import infer_step_array


# -- frequency inference -----------------------------------------------------


@st.composite
def regular_grid_with_gaps(draw):
    step = draw(st.integers(min_value=1, max_value=3600))
    start = draw(st.integers(min_value=0, max_value=10**9))
    n = draw(st.integers(min_value=2, max_value=60))
    offsets = draw(
        st.lists(st.integers(0, 500), min_size=n, max_size=n, unique=True)
    )
    offsets = sorted(offsets)
    # guarantee at least one ADJACENT pair so the min delta equals the step
    offsets.append(offsets[-1] + 1)
    return step, np.asarray([start + o * step for o in offsets], np.int64)


@settings(max_examples=200, deadline=None)
@given(grid=regular_grid_with_gaps())
def test_infer_step_recovers_base_step(grid):
    step, ts = grid
    assert infer_step_array(ts) == step


@settings(max_examples=100, deadline=None)
@given(
    ts=st.lists(st.integers(0, 10**6), min_size=2, max_size=40, unique=True),
    shuffle_seed=st.integers(0, 2**16),
)
def test_infer_step_is_order_insensitive(ts, shuffle_seed):
    arr = np.asarray(sorted(ts), np.int64)
    rng = np.random.default_rng(shuffle_seed)
    shuffled = arr.copy()
    rng.shuffle(shuffled)
    try:
        want = infer_step_array(arr)
    except EngineValueError:
        want = None
    try:
        got = infer_step_array(shuffled)
    except EngineValueError:
        got = None
    assert got == want


# -- anchor interpolation ----------------------------------------------------


@st.composite
def anchored_series(draw):
    n = draw(st.integers(min_value=1, max_value=50))
    step = 60
    obs_mask = draw(st.lists(st.booleans(), min_size=n, max_size=n))
    vals = draw(
        st.lists(
            st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False),
            min_size=n,
            max_size=n,
        )
    )
    grid = np.arange(n, dtype=np.int64) * step
    obs_idx = np.flatnonzero(obs_mask)
    return grid, grid[obs_idx], np.asarray(vals)[obs_idx]


@settings(max_examples=200, deadline=None)
@given(data=anchored_series())
def test_interp_like_sql_invariants(data):
    grid, obs_ts, obs_val = data
    for kind in ("locf", "linear"):
        out = _interp_like_sql(grid, obs_ts, obs_val, kind)
        # observed positions pass through exactly
        pos = np.searchsorted(grid, obs_ts)
        in_grid = (pos < grid.size) & np.isin(obs_ts, grid)
        np.testing.assert_array_equal(out[pos[in_grid]], obs_val[in_grid])
        # positions before the first anchor stay NaN
        if obs_ts.size:
            before = grid < obs_ts[0]
            assert np.isnan(out[before]).all()
            after = grid > obs_ts[-1]
            if kind == "locf":
                assert (out[after] == obs_val[-1]).all()
            else:  # trailing clamp
                assert (out[after] == obs_val[-1]).all()
            # linear fills stay within the local anchor envelope
            if kind == "linear" and obs_ts.size >= 2:
                lo, hi = obs_val.min(), obs_val.max()
                mid = (grid >= obs_ts[0]) & (grid <= obs_ts[-1])
                assert (out[mid] >= lo - 1e-6).all() and (out[mid] <= hi + 1e-6).all()
        else:
            assert np.isnan(out).all()


# -- categorical encode/decode round trip ------------------------------------


@st.composite
def mixed_frames(draw):
    n = draw(st.integers(min_value=1, max_value=30))
    cats = draw(
        st.lists(
            st.one_of(st.none(), st.sampled_from(["a", "b", "c", "dd"])),
            min_size=n,
            max_size=n,
        )
    )
    nums = draw(
        st.lists(
            st.one_of(
                st.none(),
                st.floats(min_value=-1e9, max_value=1e9, allow_nan=False, allow_infinity=False),
            ),
            min_size=n,
            max_size=n,
        )
    )
    return pd.DataFrame(
        {
            "c": pd.array(cats, dtype=object),
            "v": [np.nan if x is None else x for x in nums],
        }
    )


@settings(max_examples=200, deadline=None)
@given(df=mixed_frames())
def test_encode_decode_is_identity_on_untouched_cells(df):
    enc = encode_frame(df)
    out = decode_frame(
        enc["data"],
        df.index,
        df.columns,
        enc["main_column_indices"],
        enc["categorical_targets"],
        enc["original_dtypes"],
    )
    # decoding the UNMODIFIED encoded matrix restores every cell
    obs_c = df["c"].notna()
    assert out["c"].isna().equals(df["c"].isna())
    assert (out.loc[obs_c, "c"] == df.loc[obs_c, "c"]).all()
    a = out["v"].to_numpy(np.float64)
    b = df["v"].to_numpy(np.float64)
    assert ((np.isnan(a) & np.isnan(b)) | (a == b)).all()


@settings(max_examples=60, deadline=None)
@given(st.data())
def test_histogram_optimask_soundness(data):
    """The distributed rectangle search must be SOUND: whatever (columns,
    n_train) it returns, recounting complete rows over those columns from
    the raw per-pattern histogram gives exactly n_train, and it is never
    below min_rows. (Parity with the per-source pareto search is pinned
    separately on a realistic fixture.)"""
    from datafiller_ray.stages.distributed_model import _histogram_optimask

    n_feats = data.draw(st.integers(2, 10))
    n_groups = data.draw(st.integers(1, min(12, (1 << n_feats) - 1)))
    masks = data.draw(
        st.lists(
            st.integers(1, (1 << n_feats) - 1),
            min_size=n_groups, max_size=n_groups, unique=True,
        )
    )
    counts = data.draw(
        st.lists(st.integers(1, 50), min_size=n_groups, max_size=n_groups)
    )
    min_rows = data.draw(st.integers(1, 60))
    feats = np.array(
        sorted(data.draw(st.sets(st.integers(0, n_feats - 1), min_size=1))),
        dtype=np.int64,
    )
    group_masks = np.array(masks, dtype=np.uint64)
    n_by_mask = {int(m): int(c) for m, c in zip(masks, counts)}
    sel = _histogram_optimask(group_masks, n_by_mask, feats, min_rows)
    if sel is None:
        return
    cols, n_train = sel
    assert len(cols) >= 1 and set(cols) <= set(feats.tolist())
    assert n_train >= min_rows
    mask = 0
    for f in cols:
        mask |= 1 << int(f)
    recount = sum(
        c for m, c in zip(masks, counts) if (m & mask) == mask
    )
    assert recount == n_train


@settings(max_examples=60, deadline=None)
@given(st.data())
def test_histogram_optimask_matches_bruteforce(data):
    """ADVICE round-3 (distributed_model.py:201): bound the gap between the
    histogram rectangle search and brute-force enumeration over ALL column
    subsets. The three-trajectory search (drop-greedy, grow-greedy from
    every singleton, drop-greedy from every group mask) must (a) agree
    with brute force on FEASIBILITY exactly — guaranteed analytically by
    the singleton sweep since rows() is antitone — and (b) reach >= 0.8
    of the optimal rows x cols area. Exact equality is NOT asserted: the
    problem is maximum-edge-biclique-shaped (NP-hard) and hypothesis
    found a 14/15 gap for the pre-group-seed search; a 40k-instance
    sweep of the current search measured worst ratio 0.9125 with zero
    feasibility mismatches (the lone drop-greedy predecessor bottomed
    out at 0.15 of optimal and missed feasibility on 3% of instances)."""
    from itertools import combinations

    from datafiller_ray.stages.distributed_model import _histogram_optimask

    n_feats = data.draw(st.integers(2, 8))
    n_groups = data.draw(st.integers(1, min(12, (1 << n_feats) - 1)))
    masks = data.draw(
        st.lists(
            st.integers(0, (1 << n_feats) - 1),
            min_size=n_groups, max_size=n_groups, unique=True,
        )
    )
    counts = data.draw(
        st.lists(st.integers(1, 50), min_size=n_groups, max_size=n_groups)
    )
    min_rows = data.draw(st.integers(1, 60))
    feats = np.arange(n_feats, dtype=np.int64)
    group_masks = np.array(masks, dtype=np.uint64)
    n_by_mask = {int(m): int(c) for m, c in zip(masks, counts)}

    best_area = None
    for r in range(1, n_feats + 1):
        for cols in combinations(range(n_feats), r):
            mask = 0
            for f in cols:
                mask |= 1 << f
            n = sum(c for m, c in zip(masks, counts) if (m & mask) == mask)
            if n >= min_rows:
                area = n * r
                if best_area is None or area > best_area:
                    best_area = area

    sel = _histogram_optimask(group_masks, n_by_mask, feats, min_rows)
    if best_area is None:
        assert sel is None
    else:
        assert sel is not None
        cols, n_train = sel
        assert n_train * len(cols) >= 0.8 * best_area


def test_histogram_optimask_group_seed_regression():
    """The hypothesis-found pre-group-seed gap: mask 205's five-column
    single-group rectangle (area 15) beat every greedy trajectory (14).
    The group-mask seeds must now find it exactly."""
    from datafiller_ray.stages.distributed_model import _histogram_optimask

    masks = np.array([11, 205, 0, 1, 148, 96], dtype=np.uint64)
    counts = [3, 3, 1, 1, 4, 4]
    sel = _histogram_optimask(
        masks,
        {int(m): c for m, c in zip(masks, counts)},
        np.arange(8, dtype=np.int64),
        1,
    )
    assert sel is not None
    cols, n_train = sel
    assert n_train * len(cols) == 15
    assert sorted(cols.tolist()) == [0, 2, 3, 6, 7]
