"""Multivariate matrix imputer vs reference semantics (test patterns from
/root/reference/tests/test_multivariate.py — randomized structured inputs
with accuracy bounds, kernel-vs-oracle checks, behavioral pins)."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from datafiller_ray.config import EngineValueError
from datafiller_ray.functions.multivariate import (
    impute_matrix,
    scoring,
    select_features,
)


def latent_factor_matrix(m=800, n=12, rank=3, seed=0, mar=0.15):
    """Correlated panel + MAR mask (reference fixture style,
    tests/test_multivariate.py:34-45)."""
    rng = np.random.default_rng(seed)
    F = rng.standard_normal((m, rank))
    W = rng.standard_normal((rank, n))
    full = F @ W + 0.05 * rng.standard_normal((m, n))
    x = full.copy()
    x[rng.random((m, n)) < mar] = np.nan
    return full, x


def test_scoring_matches_mean_preimputed_oracle():
    # oracle: the literal mean-pre-imputed formulation
    # (reference tests/test_multivariate.py:25-31, 391-407)
    _, x = latent_factor_matrix(seed=1)
    m, n = x.shape
    cols = np.array([0, 3, 7])
    got = scoring(x, cols)
    obs = ~np.isnan(x)
    means = np.nanmean(x, axis=0)
    pre = np.where(obs, x, means)
    want = np.empty((len(cols), n))
    for a, j in enumerate(cols):
        for k in range(n):
            shared = (obs[:, j] & obs[:, k]).mean()
            corr = np.corrcoef(pre[:, j], pre[:, k])[0, 1]
            want[a, k] = shared * abs(corr)
    np.testing.assert_allclose(got, want, atol=1e-10)


def test_scoring_all_nan_column_is_nan():
    _, x = latent_factor_matrix(seed=2)
    x[:, 5] = np.nan
    s = scoring(x, np.array([0]))
    assert np.isnan(s[0, 5])


def test_select_features_deterministic_top_k():
    scores = np.array([0.5, np.nan, 0.9, 0.9, 0.1, 0.7])
    feats = select_features(6, 0, 3, scores)
    # target 0 excluded; ties at 0.9 (cols 2,3) break stably by index
    assert feats.tolist() == [2, 3, 5]
    # NaN never selected before a real score
    assert 1 not in select_features(6, 0, 4, scores).tolist()


def test_impute_recovers_correlated_matrix():
    full, x = latent_factor_matrix()
    out, filled = impute_matrix(x, n_nearest_features=8)
    mask = np.isnan(x)
    assert filled[mask].all()
    mae = np.abs(out[mask] - full[mask]).mean()
    assert mae < 0.2  # reference-style accuracy bound (test_timeseries.py:55-73)


def test_observed_cells_bit_exact():
    _, x = latent_factor_matrix(seed=3)
    out, _ = impute_matrix(x)
    obs = ~np.isnan(x)
    assert np.array_equal(out[obs], x[obs])


def test_selectors_impute_only_what_was_asked():
    # reference pin: tests/test_multivariate.py:136-151
    _, x = latent_factor_matrix(seed=4)
    out, filled = impute_matrix(x, cols_to_impute=np.array([2]))
    other = np.ones(x.shape[1], dtype=bool)
    other[2] = False
    assert not filled[:, other].any()
    assert np.isnan(out[:, other][np.isnan(x[:, other])]).all()
    rows = np.arange(0, 100)
    out2, filled2 = impute_matrix(x, rows_to_impute=rows)
    assert not filled2[100:].any()


def test_all_nan_column_survives():
    _, x = latent_factor_matrix(seed=5)
    x[:, 4] = np.nan
    out, _ = impute_matrix(x, fallback="simple")
    assert np.isnan(out[:, 4]).all()


def test_fallback_is_exact_column_mean():
    # reference pin: tests/test_multivariate.py:215-222
    x = np.array([[1.0, np.nan], [3.0, np.nan], [np.nan, 5.0]])
    out, _ = impute_matrix(x, min_samples_train=100, fallback="simple")
    assert out[2, 0] == 2.0
    assert out[0, 1] == out[1, 1] == 5.0


def test_min_samples_train_threshold():
    _, x = latent_factor_matrix(m=30, seed=6)
    out, filled = impute_matrix(x, min_samples_train=1000, fallback=None)
    assert not filled.any()
    assert np.isnan(out[np.isnan(x)]).all()


def test_rejects_inf_and_1d():
    with pytest.raises(EngineValueError, match="inf"):
        impute_matrix(np.array([[np.inf, 1.0]]))
    with pytest.raises(EngineValueError, match="2D"):
        impute_matrix(np.array([1.0, 2.0]))


def test_knn_fill_pipeline(ray_session, tmp_path):
    """Correlated sources: gaps predicted from neighbor sources."""
    from datafiller_ray.pipelines.panel import knn_fill

    rng = np.random.default_rng(7)
    n_min, n_src = 600, 6
    base = 28_401_120
    latent = np.cumsum(rng.standard_normal(n_min)) + 100
    rows = []
    for s in range(n_src):
        sig = latent * (1 + 0.1 * s) + rng.standard_normal(n_min) * 0.5
        drop = rng.random(n_min) < 0.1
        drop[0] = drop[-1] = False
        for i in range(n_min):
            if not drop[i]:
                rows.append((f"p{s:02d}", base + i, max(1, int(round(sig[i])))))
    df = pd.DataFrame(rows, columns=["source", "minute", "n_tok"])
    df["doc_id"] = df["source"] + ":" + df["minute"].map("{:010d}".format)
    import pyarrow as pa

    table = pa.table(
        {
            "doc_id": df["doc_id"],
            "n_tok": df["n_tok"].astype(np.int32),
            "source": df["source"],
        }
    )
    path = tmp_path / "panel.parquet"
    pq.write_table(table, path)
    out = knn_fill(str(path), n_cohorts=1, n_nearest_features=3).to_pandas()
    assert set(out.columns) == {"source", "bucket_ts", "value", "observed", "filled"}
    gaps = out[~out.observed]
    assert len(gaps) > 0 and gaps.filled.mean() > 0.9
    # filled values close to the latent signal (neighbors are informative)
    merged = gaps.copy()
    merged["i"] = (merged["bucket_ts"] // 60 - base).astype(int)
    merged["s"] = merged["source"].str[1:].astype(int)
    truth = np.array([latent[i] * (1 + 0.1 * s) for i, s in zip(merged.i, merged.s)])
    err = np.abs(merged["value"].to_numpy() - truth)
    assert np.median(err) < 3.0


def test_knn_fill_lags_beat_no_lag_on_shifted_panel(ray_session, tmp_path):
    """Reference TimeSeriesImputer panel semantics: the lag blocks make a
    time-shifted neighbor usable. B(t) = A(t-1): contemporaneous A is
    uninformative white noise, lag-1 A is a perfect predictor."""
    from datafiller_ray.pipelines.panel import knn_fill

    rng = np.random.default_rng(11)
    n_min = 500
    base = 28_401_120
    a = np.round(rng.uniform(50, 150, n_min + 1))
    rows = []
    drop = rng.random(n_min) < 0.15
    drop[0] = drop[-1] = False
    for i in range(n_min):
        rows.append(("srcA", base + i, int(a[i + 1])))
        if not drop[i]:
            rows.append(("srcB", base + i, int(a[i])))  # B(t) = A(t-1)
    df = pd.DataFrame(rows, columns=["source", "minute", "n_tok"])
    df["doc_id"] = df["source"] + ":" + df["minute"].map("{:010d}".format)
    import pyarrow as pa

    table = pa.table(
        {
            "doc_id": df["doc_id"],
            "n_tok": df["n_tok"].astype(np.int32),
            "source": df["source"],
        }
    )
    path = tmp_path / "shifted.parquet"
    pq.write_table(table, path)

    def mae(out):
        gaps = out[(out["source"] == "srcB") & ~out["observed"] & out["filled"]]
        i = (gaps["bucket_ts"] // 60 - base).astype(int).to_numpy()
        return np.abs(gaps["value"].to_numpy() - a[i]).mean(), len(gaps)

    no_lag = knn_fill(str(path), n_cohorts=1, min_samples_train=10).to_pandas()
    with_lag = knn_fill(
        str(path), n_cohorts=1, min_samples_train=10, lags=(1,),
        add_time_features=True,
    ).to_pandas()
    m0, n0 = mae(no_lag)
    m1, n1 = mae(with_lag)
    assert n0 > 20 and n1 > 20
    assert m1 < m0 / 3  # lag-1 feature is a near-perfect predictor
    assert m1 < 2.0
