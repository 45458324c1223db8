import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def small_fixture(tmp_path_factory):
    import pyarrow.parquet as pq

    from datafiller_ray.fixtures import generate_input_table

    path = tmp_path_factory.mktemp("corr") / "in.parquet"
    pq.write_table(generate_input_table(5000, 9, seed=7), path)
    return str(path)


def test_corr_one_source_matches_corrcoef():
    """Pinned integer-moment Pearson equals np.corrcoef on aligned data."""
    from datafiller_ray.pipelines.correlate import _corr_one_source

    rng = np.random.default_rng(3)
    n = 400
    base = rng.integers(50, 150, size=n).astype(np.int64)
    noisy = base + rng.integers(-20, 20, size=n)
    ts = np.arange(n, dtype=np.int64) * 60
    obs = pd.DataFrame({"bucket_ts": ts, "sum": noisy})
    refs = {"r": (ts, base)}
    out = _corr_one_source(obs, "s", refs, min_common=3)
    assert len(out) == 1
    expect = np.corrcoef(noisy.astype(float), base.astype(float))[0, 1]
    assert abs(out["corr"].iloc[0] - expect) < 1e-6
    assert out["n_common"].iloc[0] == n


def test_corr_alignment_and_filters():
    from datafiller_ray.pipelines.correlate import _corr_one_source

    ts = np.array([0, 60, 120, 180], dtype=np.int64)
    obs = pd.DataFrame({"bucket_ts": ts, "sum": np.array([1, 2, 3, 4], np.int64)})
    refs = {
        # only two common buckets -> below min_common
        "few": (np.array([0, 60], np.int64), np.array([5, 6], np.int64)),
        # constant series -> zero variance, dropped
        "flat": (ts, np.full(4, 7, np.int64)),
        # offset grid: buckets 60/120/180 align, perfectly anti-correlated
        "anti": (
            np.array([60, 120, 180, 240], np.int64),
            np.array([30, 20, 10, 0], np.int64),
        ),
        # self is skipped even when present
        "s": (ts, obs["sum"].to_numpy()),
    }
    out = _corr_one_source(obs, "s", refs, min_common=3)
    assert out["ref_source"].tolist() == ["anti"]
    assert out["corr"].iloc[0] == -1.0
    assert out["n_common"].iloc[0] == 3


def test_source_correlation_end_to_end(ray_session, small_fixture):
    from datafiller_ray.pipelines.correlate import source_correlation

    out = source_correlation(
        small_fixture, ref_sources=("src_0000", "src_0001")
    ).to_pandas()
    assert set(out.columns) == {"source", "ref_source", "n_common", "corr"}
    assert set(out["ref_source"]) <= {"src_0000", "src_0001"}
    # no self pairs, bounded corr
    assert not (out["source"] == out["ref_source"]).any()
    assert out["corr"].between(-1.0, 1.0).all()
    # cross-check one pair against pandas on the raw table
    import duckdb

    row = out.sort_values(["source", "ref_source"]).iloc[0]
    q = duckdb.sql(
        f"""
        WITH obs AS (
          SELECT source,
                 CAST(substr(doc_id, length(doc_id)-9, 10) AS BIGINT)*60 b,
                 SUM(n_tok)::BIGINT s
          FROM read_parquet('{small_fixture}') GROUP BY 1,2)
        SELECT corr(a.s::DOUBLE, r.s::DOUBLE)
        FROM obs a JOIN obs r USING (b)
        WHERE a.source = '{row.source}' AND r.source = '{row.ref_source}'
        """
    ).fetchone()[0]
    assert abs(row["corr"] - q) < 1e-6


def test_source_correlation_guards(ray_session, small_fixture):
    from datafiller_ray.config import EngineValueError
    from datafiller_ray.pipelines.correlate import source_correlation

    with pytest.raises(EngineValueError):
        source_correlation(small_fixture, ref_sources=())
    with pytest.raises(EngineValueError):
        source_correlation(
            small_fixture,
            ref_sources=tuple(f"s{i}" for i in range(70)),
            max_refs=64,
        )
    with pytest.raises(EngineValueError):
        source_correlation(small_fixture, ref_sources=("src_0000",), min_common=1)
    with pytest.raises(EngineValueError):
        source_correlation(small_fixture, ref_sources=("no_such_source",))


def test_xcorr_one_source_finds_planted_lag():
    from datafiller_ray.pipelines.correlate import _hourly, _xcorr_one_source

    rng = np.random.default_rng(11)
    n = 48
    base = rng.integers(10, 1000, size=n).astype(np.int64)
    # ref(t) = x(t - 2h): x at hour i matches ref at hour i+2, so the best
    # alignment of x(t) with ref(t + lag) is lag = +2
    hours = np.arange(n, dtype=np.int64) * 3600
    refs = {"ref": (hours + 2 * 3600, base.copy())}
    obs = pd.DataFrame({"bucket_ts": hours, "sum": base})
    out = _xcorr_one_source(
        obs, "s", refs, np.arange(-6, 7, dtype=np.int64), 3600, 3
    )
    assert out["best_lag"].tolist() == [2]
    assert out["corr"].tolist() == [1.0]
    assert out["n_common"].tolist() == [n]


def test_xcorr_rounded_tie_breaks_to_smaller_lag():
    from datafiller_ray.pipelines.correlate import _xcorr_one_source

    # constant-slope series correlate 1.0 at EVERY overlapping lag: the
    # tie must break to the smallest lag
    n = 30
    hours = np.arange(n, dtype=np.int64) * 3600
    y = np.arange(n, dtype=np.int64) * 7 + 3
    refs = {"ref": (hours, y.copy())}
    obs = pd.DataFrame({"bucket_ts": hours, "sum": y})
    out = _xcorr_one_source(
        obs, "s", refs, np.arange(-3, 4, dtype=np.int64), 3600, 3
    )
    assert out["best_lag"].tolist() == [-3]
    assert out["corr"].tolist() == [1.0]


def test_xcorr_skips_self_and_low_overlap():
    from datafiller_ray.pipelines.correlate import _xcorr_one_source

    hours = np.arange(4, dtype=np.int64) * 3600
    y = np.array([1, 5, 2, 9], dtype=np.int64)
    refs = {"s": (hours, y.copy()), "far": (hours + 10**9, y.copy())}
    obs = pd.DataFrame({"bucket_ts": hours, "sum": y})
    out = _xcorr_one_source(
        obs, "s", refs, np.arange(-1, 2, dtype=np.int64), 3600, 3
    )
    # self excluded; "far" never overlaps within +-1h
    assert len(out) == 0
    assert str(out["source"].dtype) == "string"


def test_rolling_corr_tracks_coupling_change():
    import numpy as np
    import pandas as pd

    from datafiller_ray.pipelines.correlate import _rolling_corr_one_source

    rng = np.random.default_rng(6)
    n = 400
    ts = np.arange(n, dtype=np.int64) * 60
    ref = rng.integers(0, 1000, size=n).astype(np.int64)
    # first half tracks the ref, second half is independent noise
    x = ref.copy()
    x[n // 2 :] = rng.integers(0, 1000, size=n // 2)
    obs = pd.DataFrame({"bucket_ts": ts, "sum": x})
    out = _rolling_corr_one_source(obs, "s", {"ref": (ts, ref)}, 60)
    early = out[(out["bucket_ts"] >= 100 * 60) & (out["bucket_ts"] < 200 * 60)]
    late = out[out["bucket_ts"] >= 300 * 60]
    assert early["corr"].min() > 0.99
    assert late["corr"].abs().mean() < 0.4


def test_rolling_corr_head_windows_and_self_skip():
    import numpy as np
    import pandas as pd

    from datafiller_ray.pipelines.correlate import _rolling_corr_one_source

    ts = np.arange(10, dtype=np.int64) * 60
    y = np.arange(10, dtype=np.int64) ** 2
    obs = pd.DataFrame({"bucket_ts": ts, "sum": y})
    out = _rolling_corr_one_source(obs, "s", {"ref": (ts, y), "s": (ts, y)}, 5)
    # the self-pair is skipped entirely
    assert set(out["ref_source"]) == {"ref"}
    # first row (n_win == 1) is dropped; head windows grow 2..5 then cap
    assert out["n_win"].tolist() == [2, 3, 4, 5, 5, 5, 5, 5, 5]
    # identical series: corr == 1 everywhere
    assert (out["corr"] == 1.0).all()


def test_dtw_band_identity_and_warp():
    from datafiller_ray.pipelines.correlate import dtw_band_distance

    # identical sequences -> zero distance
    z = [0.0, 1.0, -1.0, 2.0, 0.5]
    assert dtw_band_distance(z, z, 3) == 0.0

    # a time-shifted copy is closer under DTW than under rigid L1
    x = [0.0, 0.0, 5.0, 0.0, 0.0, 0.0]
    y = [0.0, 0.0, 0.0, 5.0, 0.0, 0.0]
    rigid = sum(abs(a - b) for a, b in zip(x, y))
    assert dtw_band_distance(x, y, 3) < rigid

    # band 0 on equal lengths = diagonal-only = rigid alignment cost
    assert dtw_band_distance(x, y, 0) == rigid


def test_dtw_matches_bruteforce_full_dp():
    import itertools

    from datafiller_ray.pipelines.correlate import dtw_band_distance

    rng = np.random.default_rng(4)
    for n, m in [(6, 6), (5, 8), (9, 4)]:
        x = rng.normal(size=n).tolist()
        y = rng.normal(size=m).tolist()
        w = 20  # wide band == unconstrained DTW
        got = dtw_band_distance(x, y, w)
        # brute force over monotone step paths via full DP
        D = np.full((n, m), np.inf)
        for i in range(n):
            for j in range(m):
                c = abs(x[i] - y[j])
                if i == 0 and j == 0:
                    D[i, j] = c
                else:
                    opts = []
                    if i > 0:
                        opts.append(D[i - 1, j])
                    if j > 0:
                        opts.append(D[i, j - 1])
                    if i > 0 and j > 0:
                        opts.append(D[i - 1, j - 1])
                    D[i, j] = c + min(opts)
        assert abs(got - D[n - 1, m - 1]) < 1e-12


def test_dtw_znorm_pinned():
    from datafiller_ray.pipelines.correlate import _znorm_pinned

    v = np.array([2, 4, 6, 8], dtype=np.int64)
    z = _znorm_pinned(v)
    assert abs(z.mean()) < 1e-12
    assert abs((z * z).mean() - 1.0) < 1e-12
    assert _znorm_pinned(np.array([5, 5, 5], dtype=np.int64)) is None


def _oracle_fills_mod():
    import importlib.util
    import os

    p = os.path.join(os.path.dirname(__file__), "oracle", "fills.py")
    spec = importlib.util.spec_from_file_location("oracle_fills_corr", p)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_granger_engine_matches_gram_schmidt_oracle():
    """Cramer-on-moments F (engine) == Gram-Schmidt-in-Fractions F
    (oracle), bit for bit, on random integer series."""
    from datafiller_ray.pipelines.correlate import (
        _granger_f_from_moments,
        _granger_one_source,
    )

    o = _oracle_fills_mod()
    rng = np.random.default_rng(11)
    for n in (4, 9, 120):
        yv = rng.integers(0, 500, size=n).astype(np.int64)
        av = rng.integers(0, 500, size=n).astype(np.int64)
        bv = rng.integers(0, 500, size=n).astype(np.int64)
        f_eng = _granger_f_from_moments(
            n, int(yv.sum()), int(av.sum()), int(bv.sum()),
            int(np.dot(yv, yv)), int(np.dot(av, av)), int(np.dot(bv, bv)),
            int(np.dot(yv, av)), int(np.dot(yv, bv)), int(np.dot(av, bv)),
        )
        f_or = o.granger_f_exact(yv, av, bv)
        assert f_eng == f_or  # both exact rationals -> identical doubles
    # end-to-end kernel: hourly alignment + the same F
    n_h = 50
    ts = np.arange(n_h * 60, dtype=np.int64) * 60  # dense minutes
    x = rng.integers(1, 100, size=ts.size).astype(np.int64)
    obs = pd.DataFrame({"bucket_ts": ts, "sum": x})
    y_ts = np.arange(n_h, dtype=np.int64) * 3600
    y_sum = rng.integers(1, 5000, size=n_h).astype(np.int64)
    out = _granger_one_source(
        obs, "s", {"r": (y_ts, y_sum)}, 3600, min_common=8
    )
    assert len(out) == 1 and out["n_common"].iloc[0] == n_h - 1
    x_h = x.reshape(n_h, 60).sum(axis=1)
    yv2, av2, bv2 = y_sum[1:], y_sum[:-1], x_h[:-1]
    f_expected = o.granger_f_exact(yv2, av2, bv2)
    assert out["f_stat"].iloc[0] == float(
        np.floor(np.array([f_expected]) * 1e6 + 0.5) / 1e6
    )


def test_granger_detects_planted_lead():
    """x drives y at lag 1 (y_t = x_{t-1} + small noise): the planted
    direction's F dwarfs both the reverse direction and an independent
    control series."""
    from datafiller_ray.pipelines.correlate import _granger_one_source

    rng = np.random.default_rng(23)
    n = 200
    x_h = rng.integers(100, 1000, size=n).astype(np.int64)
    noise = rng.integers(-3, 4, size=n - 1)
    y_h = np.concatenate([[500], x_h[:-1] + noise]).astype(np.int64)
    z_h = rng.integers(100, 1000, size=n).astype(np.int64)  # control
    hours = np.arange(n, dtype=np.int64) * 3600
    refs = {"y": (hours, y_h), "z": (hours, z_h)}
    obs = pd.DataFrame({"bucket_ts": hours, "sum": x_h})
    out = _granger_one_source(obs, "x", refs, 3600, min_common=8)
    f = dict(zip(out["ref_source"], out["f_stat"]))
    assert f["y"] > 100.0  # planted causality
    assert f["y"] > 50.0 * max(f["z"], 1e-9)  # control is noise-level


def test_granger_rank_deficient_and_perfect_fit_omitted():
    from datafiller_ray.pipelines.correlate import _granger_f_from_moments

    # constant A: restricted design singular -> None
    yv = np.array([1, 2, 3, 4, 5], np.int64)
    av = np.full(5, 7, np.int64)
    bv = np.array([2, 4, 6, 8, 10], np.int64)

    def moments(y, a, b):
        return (
            len(y), int(y.sum()), int(a.sum()), int(b.sum()),
            int(np.dot(y, y)), int(np.dot(a, a)), int(np.dot(b, b)),
            int(np.dot(y, a)), int(np.dot(y, b)), int(np.dot(a, b)),
        )

    assert _granger_f_from_moments(*moments(yv, av, bv)) is None
    # B collinear with A: unrestricted singular -> None
    av2 = np.array([1, 3, 5, 7, 9], np.int64)
    assert _granger_f_from_moments(*moments(yv, av2, 2 * av2)) is None
    # y exactly in span(1, A, B): RSS_u == 0 -> None
    av3 = np.array([1, 2, 4, 8, 16], np.int64)
    bv3 = np.array([3, 1, 4, 1, 5], np.int64)
    y3 = 2 * av3 + 3 * bv3 + 7
    assert _granger_f_from_moments(*moments(y3, av3, bv3)) is None


def test_engle_granger_kernel_matches_fraction_oracle():
    """Engine integer-numerator residual path == oracle Fraction path,
    bit for bit, on random integer pairs."""
    from datafiller_ray.pipelines.correlate import _eg_one_source

    o = _oracle_fills_mod()
    rng = np.random.default_rng(17)
    n_h = 40
    ts = np.arange(n_h * 60, dtype=np.int64) * 60
    src_min = rng.integers(1, 100, size=ts.size).astype(np.int64)
    obs = pd.DataFrame({"bucket_ts": ts, "sum": src_min})
    r_ts = np.arange(n_h, dtype=np.int64) * 3600
    r_sum = rng.integers(1, 5000, size=n_h).astype(np.int64)
    out = _eg_one_source(obs, "s", {"r": (r_ts, r_sum)}, 3600, 8)
    assert len(out) == 1 and out["n_common"].iloc[0] == n_h
    y_h = src_min.reshape(n_h, 60).sum(axis=1)
    res = o.engle_granger_pair(
        [int(v) for v in r_sum], [int(v) for v in y_h]
    )
    beta, gamma, t = res
    rh = lambda v: float(np.floor(v * 1e6 + 0.5) / 1e6)
    assert out["beta"].iloc[0] == rh(beta)
    assert out["gamma_hat"].iloc[0] == rh(gamma)
    assert out["eg_t"].iloc[0] == rh(t)


def test_engle_granger_detects_planted_cointegration(ray_session):
    """A pair sharing a random-walk trend must test far more stationary
    (more negative eg_t) than an independent random-walk pair."""
    from datafiller_ray.pipelines.correlate import _eg_one_source

    rng = np.random.default_rng(5)
    n_h = 200
    walk = np.cumsum(rng.integers(-30, 31, size=n_h)).astype(np.int64) + 5000
    coint = 2 * walk + rng.integers(-20, 21, size=n_h)  # shares the trend
    other = np.cumsum(rng.integers(-30, 31, size=n_h)).astype(np.int64) + 5000
    ts_h = np.arange(n_h, dtype=np.int64) * 3600
    obs = pd.DataFrame({"bucket_ts": ts_h, "sum": coint})
    refs = {"walk": (ts_h, walk), "other": (ts_h, other)}
    out = _eg_one_source(obs, "s", refs, 3600, 8).set_index("ref_source")
    assert out.loc["walk", "eg_t"] < -6.0  # residuals are pure noise
    assert out.loc["walk", "eg_t"] < out.loc["other", "eg_t"] - 3.0
    assert abs(out.loc["walk", "beta"] - 2.0) < 0.05


def test_engle_granger_validation(ray_session):
    from datafiller_ray.config import EngineValueError
    from datafiller_ray.pipelines.correlate import engle_granger

    with pytest.raises(EngineValueError):
        engle_granger("/tmp/x", ref_sources=())
    with pytest.raises(EngineValueError):
        engle_granger("/tmp/x", ref_sources=("a",), step=61)
    with pytest.raises(EngineValueError):
        engle_granger("/tmp/x", ref_sources=("a",), min_common=2)


def test_double_ranks_matches_pandas_average():
    from datafiller_ray.pipelines.correlate import _double_ranks

    rng = np.random.default_rng(23)
    for n in (1, 2, 7, 100):
        v = rng.integers(0, 10, size=n).astype(np.int64)  # heavy ties
        got = _double_ranks(v)
        want = (pd.Series(v).rank(method="average") * 2).astype(np.int64)
        np.testing.assert_array_equal(got, want.to_numpy())


def test_spearman_kernel_monotone_and_ties():
    from datafiller_ray.pipelines.correlate import _spearman_one_source

    n_h = 30
    ts_h = np.arange(n_h, dtype=np.int64) * 3600
    base = np.arange(n_h, dtype=np.int64) * 7 + 100
    # a strictly increasing nonlinear transform: Spearman must be exactly 1
    mono = base ** 2
    obs = pd.DataFrame({"bucket_ts": ts_h, "sum": base})
    out = _spearman_one_source(
        obs, "s", {"mono": (ts_h, mono), "anti": (ts_h, -base)}, 3600, 8
    ).set_index("ref_source")
    assert out.loc["mono", "rho"] == 1.0
    assert out.loc["anti", "rho"] == -1.0
    # constant reference: omitted (no rank order)
    out2 = _spearman_one_source(
        obs, "s", {"const": (ts_h, np.full(n_h, 5, dtype=np.int64))}, 3600, 8
    )
    assert len(out2) == 0


def test_spearman_validation(ray_session):
    from datafiller_ray.config import EngineValueError
    from datafiller_ray.pipelines.correlate import spearman_correlation

    with pytest.raises(EngineValueError):
        spearman_correlation("/tmp/x", ref_sources=())
    with pytest.raises(EngineValueError):
        spearman_correlation("/tmp/x", ref_sources=("a",), min_common=1)
