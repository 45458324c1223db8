"""Hypothesis property tests: the gap-fill kernels vs the literal pandas
reference formulation over arbitrary series/max_gap combinations."""

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from datafiller_ray.functions import gapfill
from tests.oracle.reference import interpolate_small_gaps, locf_small_gaps


@st.composite
def gappy_series(draw):
    n = draw(st.integers(min_value=1, max_value=80))
    vals = draw(
        st.lists(
            st.one_of(
                st.none(),
                st.floats(
                    min_value=-1e6, max_value=1e6,
                    allow_nan=False, allow_infinity=False,
                ),
            ),
            min_size=n,
            max_size=n,
        )
    )
    return np.array([np.nan if v is None else v for v in vals])


@settings(max_examples=200, deadline=None)
@given(y=gappy_series(), max_gap=st.one_of(st.none(), st.integers(0, 12)))
def test_linear_matches_pandas_reference(y, max_gap):
    mine, codes = gapfill.fill_linear(y, max_gap)
    oracle = interpolate_small_gaps(pd.Series(y), max_gap).to_numpy()
    np.testing.assert_array_equal(np.isnan(mine), np.isnan(oracle))
    np.testing.assert_allclose(np.nan_to_num(mine), np.nan_to_num(oracle))
    # invariants: observed cells bit-exact, codes mark exactly the new fills
    obs = ~np.isnan(y)
    assert np.array_equal(mine[obs], y[obs])
    assert ((codes != 0) == (np.isnan(y) & ~np.isnan(mine))).all()


@settings(max_examples=200, deadline=None)
@given(y=gappy_series(), max_gap=st.one_of(st.none(), st.integers(0, 12)))
def test_locf_matches_pandas_reference(y, max_gap):
    mine, _ = gapfill.fill_locf(y, max_gap)
    oracle = locf_small_gaps(pd.Series(y), max_gap).to_numpy()
    np.testing.assert_array_equal(np.isnan(mine), np.isnan(oracle))
    np.testing.assert_allclose(np.nan_to_num(mine), np.nan_to_num(oracle))


@settings(max_examples=100, deadline=None)
@given(y=gappy_series(), max_gap=st.integers(0, 8), radius=st.integers(1, 20))
def test_spline_invariants(y, max_gap, radius):
    out, codes = gapfill.fill_spline(y, max_gap, knot_radius=radius)
    obs = ~np.isnan(y)
    assert np.array_equal(out[obs], y[obs])
    # only NaN runs of length <= max_gap (and never the leading run) fill
    starts, lengths, run_id = gapfill.nan_runs(np.isnan(y))
    for r in range(starts.size):
        s, ln = int(starts[r]), int(lengths[r])
        run_filled = ~np.isnan(out[s : s + ln])
        if ln > max_gap or s == 0:
            assert not run_filled.any()
        else:
            assert run_filled.all() == run_filled.any()  # all-or-nothing
