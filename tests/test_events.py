"""Events gap-fill: chunk-sharded anchor exchange invariants.

The sharded fill (pipelines/events.py) must be span-invariant: any chunk
width gives bit-identical output, including empty chunks synthesized inside
gaps longer than a chunk. A tiny span forces many chunks + empty-chunk
synthesis; a huge span degenerates to one chunk per type (the unsharded
shape)."""

import numpy as np
import pandas as pd
import pytest

import ray.data

from datafiller_ray.pipelines.events import (
    events_gapfill_linear,
    events_gapfill_locf,
)


@pytest.fixture(scope="module")
def gappy_events(ray_session):
    rng = np.random.default_rng(7)
    rows = []
    base = 1_700_000_040  # 60-aligned
    for etype, offs in {
        # interior gap much longer than the small test span (16 buckets)
        "alpha": list(range(0, 10)) + list(range(500, 510)),
        # dense, no gaps
        "beta": list(range(0, 40)),
        # single observation
        "gamma": [5],
        # irregular short gaps
        "delta": [0, 1, 4, 9, 17, 33, 64, 65],
    }.items():
        for o in offs:
            for _ in range(int(rng.integers(1, 4))):
                rows.append(
                    {
                        "event_id": len(rows),
                        "ts": pd.Timestamp(base + o * 60 + int(rng.integers(60)), unit="s"),
                        "user_id": int(rng.integers(100)),
                        "event_type": etype,
                        "value": float(np.round(rng.uniform(0, 100), 2)),
                    }
                )
    df = pd.DataFrame(rows)
    df["ts"] = df["ts"].astype("datetime64[us]")  # contract: µs timestamps
    return ray.data.from_pandas(df)


def _norm(ds) -> pd.DataFrame:
    df = ds.to_pandas()
    return df.sort_values(["event_type", "bucket_ts"]).reset_index(drop=True)


@pytest.mark.parametrize("fill", [events_gapfill_locf, events_gapfill_linear])
def test_sharded_fill_is_span_invariant(gappy_events, fill):
    small = _norm(fill(gappy_events, step=60, span_buckets=16))
    huge = _norm(fill(gappy_events, step=60, span_buckets=1_000_000))
    assert len(small) == len(huge) > 0
    for c in ["event_type", "bucket_ts", "n_events"]:
        np.testing.assert_array_equal(small[c].to_numpy(), huge[c].to_numpy(), err_msg=c)
    a = small["fill_value"].to_numpy()
    b = huge["fill_value"].to_numpy()
    both_nan = np.isnan(a) & np.isnan(b)
    assert (both_nan | (a == b)).all()  # bit-exact, not allclose


def test_grid_spans_observed_range_only(gappy_events):
    out = _norm(events_gapfill_locf(gappy_events, step=60, span_buckets=16))
    g = out[out["event_type"] == "alpha"]
    assert g["bucket_ts"].min() == 1_700_000_040
    assert g["bucket_ts"].max() == 1_700_000_040 + 509 * 60
    # every bucket on the dense grid exactly once
    assert len(g) == 510
    # gap interior is filled by LOCF (no NaNs after the first observation)
    assert not g["fill_value"].isna().any()


# ---------------------------------------------------------------------------
# funnel / cohort


def _mk_events(rows):
    import pandas as pd

    df = pd.DataFrame(rows, columns=["user_id", "event_type", "us"])
    df["ts"] = pd.to_datetime(df.pop("us"), unit="us")
    df["event_id"] = np.arange(len(df), dtype=np.int64)
    df["value"] = 1.0
    df["props"] = "{}"
    import ray.data

    return ray.data.from_pandas(df)


def test_funnel_earliest_chain_and_ordering(ray_session):
    from datafiller_ray.pipelines.events import funnel_analysis

    ev = _mk_events(
        [
            # user 1: full funnel in order
            (1, "view", 100), (1, "click", 200), (1, "purchase", 300),
            # user 2: purchase BEFORE click -> stops at click (step 2)
            (2, "view", 100), (2, "purchase", 150), (2, "click", 200),
            # user 3: click only -> step 0 (no view)
            (3, "click", 100),
            # user 4: two views; chain uses the EARLIEST view
            (4, "view", 500), (4, "view", 100), (4, "click", 200),
            # user 5: click at exactly the view timestamp -> strict > fails
            (5, "view", 100), (5, "click", 100),
        ]
    )
    out = funnel_analysis(ev).to_pandas().set_index("user_id")
    assert out.loc[1, "reached_step"] == 3 and out.loc[1, "completed_ts"] == 300
    assert out.loc[2, "reached_step"] == 2 and out.loc[2, "completed_ts"] == -1
    assert out.loc[3, "reached_step"] == 0
    assert out.loc[4, "reached_step"] == 2
    assert out.loc[5, "reached_step"] == 1


def test_funnel_validates_steps(ray_session):
    from datafiller_ray.config import EngineValueError
    from datafiller_ray.pipelines.events import funnel_analysis

    ev = _mk_events([(1, "view", 100)])
    with pytest.raises(EngineValueError):
        funnel_analysis(ev, steps=("view",))
    with pytest.raises(EngineValueError):
        funnel_analysis(ev, steps=("view", "view"))


def test_cohort_retention_matrix(ray_session):
    from datafiller_ray.pipelines.events import cohort_retention

    day = 86_400_000_000  # one day in microseconds
    ev = _mk_events(
        [
            # users 1,2 first active day 0; user 1 returns day 1 and 2
            (1, "view", 0), (1, "view", day + 5), (1, "view", 2 * day + 5),
            (2, "view", 10), (2, "view", 2 * day + 50),
            # user 3 cohort day 1, never returns (two events same day)
            (3, "view", day + 1), (3, "click", day + 2),
        ]
    )
    out = cohort_retention(ev).to_pandas()
    cells = {
        (int(r.cohort_period), int(r.period_offset)): int(r.n_active)
        for r in out.itertuples()
    }
    assert cells == {(0, 0): 2, (0, 1): 1, (0, 2): 2, (1, 0): 1}


def test_time_weighted_avg_matches_scalar_oracle(ray_session):
    """Brute per-row loop oracle: LOCF spans clamped at bucket end,
    duplicate timestamps tie-broken by event_id; sum of weights never
    exceeds the bucket length."""
    import numpy as np
    import pandas as pd
    import ray.data

    from datafiller_ray.pipelines.events import time_weighted_avg

    rng = np.random.default_rng(12)
    n, step = 500, 600
    ts_s = np.sort(rng.integers(0, 5 * step, n))
    ts_s[10] = ts_s[11] = ts_s[12]  # duplicate timestamps
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": pd.to_datetime(ts_s * 1_000_000, unit="us"),
            "user_id": np.zeros(n, dtype=np.int64),
            "event_type": rng.choice(["a", "b"], n),
            "value": rng.normal(scale=3.0, size=n),
            "props": [""] * n,
        }
    )
    got = (
        time_weighted_avg(ray.data.from_pandas(df), step=step)
        .to_pandas()
        .sort_values(["event_type", "bucket_ts"])
        .reset_index(drop=True)
    )

    # scalar oracle
    rows = {}
    for et, sub in df.assign(ts_s=ts_s).groupby("event_type"):
        sub = sub.sort_values(["ts_s", "event_id"])
        t = sub["ts_s"].to_numpy()
        v = np.floor(sub["value"].to_numpy() * 1e6 + 0.5).astype(np.int64)
        b = (t // step) * step
        for i in range(len(sub)):
            end = t[i + 1] if i + 1 < len(sub) and b[i + 1] == b[i] else b[i] + step
            w = int(end - t[i])
            key = (et, int(b[i]))
            num, den, cnt = rows.get(key, (0, 0, 0))
            rows[key] = (num + int(v[i]) * w, den + w, cnt + 1)
    want = pd.DataFrame(
        [
            {
                "event_type": et,
                "bucket_ts": bt,
                "n_obs": cnt,
                "wsum": den,
                "twa": num / (1e6 * den),
            }
            for (et, bt), (num, den, cnt) in sorted(rows.items())
        ]
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert (got["wsum"] <= step).all()


def test_interarrival_stats_matches_brute_force(ray_session):
    import pyarrow as pa

    from datafiller_ray.pipelines.events import interarrival_stats
    from datafiller_ray.pipelines.window import _quantile_pos

    rng = np.random.default_rng(61)
    n = 800
    ts_us = np.sort(rng.integers(0, 3 * 86400 * 10**6, size=n))
    types = rng.choice(["a", "b", "c"], size=n)
    # duplicate timestamps to exercise the event_id tie-break
    ts_us[100] = ts_us[101]
    t = pa.table(
        {
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "ts": pa.array(ts_us, pa.timestamp("us")),
            "user_id": pa.array(np.zeros(n, np.int64)),
            "event_type": pa.array(types.tolist()),
            "value": pa.array(np.zeros(n)),
            "props": pa.array([""] * n),
        }
    )
    # tiny span forces MANY chunks -> exercises the boundary-gap merge
    out = (
        interarrival_stats(ray.data.from_arrow(t), span_seconds=3600)
        .to_pandas()
        .set_index("event_type")
    )
    for et in ("a", "b", "c"):
        sub = np.sort(ts_us[types == et])
        dts = np.sort((sub[1:] - sub[:-1]).astype(np.int64))
        assert out.loc[et, "n_intervals"] == dts.size
        exp_mean = np.floor(
            float(dts.sum()) / float(dts.size) / 1e6 * 1e6 + 0.5
        ) / 1e6
        assert out.loc[et, "mean_s"] == exp_mean
        for q, col in ((0.5, "p0_5_s"), (0.9, "p0_9_s"), (0.99, "p0_99_s")):
            lo, hi, frac = _quantile_pos(dts.size, q)
            v = (float(dts[lo]) + (float(dts[hi]) - float(dts[lo])) * frac) / 1e6
            assert out.loc[et, col] == np.floor(v * 1e6 + 0.5) / 1e6


def test_interarrival_stats_span_invariant(ray_session):
    import pyarrow as pa

    from datafiller_ray.pipelines.events import interarrival_stats

    rng = np.random.default_rng(67)
    n = 300
    t = pa.table(
        {
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "ts": pa.array(
                np.sort(rng.integers(0, 86400 * 10**6, size=n)),
                pa.timestamp("us"),
            ),
            "user_id": pa.array(np.zeros(n, np.int64)),
            "event_type": pa.array(["x"] * n),
            "value": pa.array(np.zeros(n)),
            "props": pa.array([""] * n),
        }
    )
    ds = ray.data.from_arrow(t)
    a = interarrival_stats(ds, span_seconds=60).to_pandas()
    b = interarrival_stats(ds, span_seconds=10**9).to_pandas()
    pd.testing.assert_frame_equal(
        a.sort_values("event_type").reset_index(drop=True),
        b.sort_values("event_type").reset_index(drop=True),
    )


def test_interarrival_stats_validation(ray_session):
    from datafiller_ray.config import EngineValueError
    from datafiller_ray.pipelines.events import interarrival_stats

    with pytest.raises(EngineValueError):
        interarrival_stats(None, qs=())
    with pytest.raises(EngineValueError):
        interarrival_stats(None, qs=(1.5,))
    with pytest.raises(EngineValueError):
        interarrival_stats(None, span_seconds=0)


class TestUserTopEvent:
    def _make(self, ray_session):
        rows = []
        # user 1: tie between "a" and "b" (2 each) -> lexicographic "a" wins
        for et in ("a", "b", "a", "b"):
            rows.append({"event_id": len(rows), "user_id": 1, "event_type": et})
        # user 2: clear winner "z"
        for et in ("z", "z", "z", "y"):
            rows.append({"event_id": len(rows), "user_id": 2, "event_type": et})
        # user 3: single event
        rows.append({"event_id": len(rows), "user_id": 3, "event_type": "solo"})
        df = pd.DataFrame(rows)
        df["ts"] = pd.to_datetime(1_700_000_000 + df["event_id"], unit="s")
        df["value"] = 1.0
        df["props"] = ""
        return df

    def test_mode_and_ties(self, ray_session):
        from datafiller_ray.pipelines.events import user_top_event

        df = self._make(ray_session)
        out = (
            user_top_event(ray.data.from_pandas(df))
            .to_pandas()
            .sort_values("user_id")
            .reset_index(drop=True)
        )
        assert out["user_id"].tolist() == [1, 2, 3]
        assert out["top_event"].tolist() == ["a", "z", "solo"]
        assert out["cnt"].tolist() == [2, 3, 1]

    def test_block_layout_invariance(self, ray_session):
        """Partial counts merge across blocks: a 1-row-per-block layout must
        give the same answer as one block."""
        from datafiller_ray.pipelines.events import user_top_event

        df = self._make(ray_session)
        one = (
            user_top_event(ray.data.from_pandas(df))
            .to_pandas()
            .sort_values("user_id")
            .reset_index(drop=True)
        )
        many = (
            user_top_event(ray.data.from_pandas(df).repartition(len(df)))
            .to_pandas()
            .sort_values("user_id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(one, many)


def test_transition_topk_counts_and_ties(ray_session):
    from datafiller_ray.pipelines.events import transition_topk

    rows = []
    # user 1 timeline: a -> b -> a -> b  (a->b x2, b->a x1)
    for i, et in enumerate(["a", "b", "a", "b"]):
        rows.append(
            {"event_id": i, "user_id": 1, "event_type": et,
             "ts": pd.Timestamp(1_700_000_000 + i, unit="s")}
        )
    # user 2: c -> a  (no cross-user pair with user 1)
    for i, et in enumerate(["c", "a"]):
        rows.append(
            {"event_id": 100 + i, "user_id": 2, "event_type": et,
             "ts": pd.Timestamp(1_700_000_000 + i, unit="s")}
        )
    df = pd.DataFrame(rows)
    df["value"] = 1.0
    df["props"] = ""
    out = transition_topk(ray.data.from_pandas(df), k=10).to_pandas()
    got = {(r.prev, r.nxt): int(r.cnt) for r in out.itertuples()}
    assert got == {("a", "b"): 2, ("b", "a"): 1, ("c", "a"): 1}
    # ranking: count desc then lexicographic
    assert out.iloc[0][["prev", "nxt"]].tolist() == ["a", "b"]

    # same-timestamp ties order by event_id: 0 then 1
    tie = pd.DataFrame(
        {
            "event_id": [1, 0],
            "user_id": [9, 9],
            "event_type": ["y", "x"],
            "ts": [pd.Timestamp(1_700_000_000, unit="s")] * 2,
            "value": [1.0, 1.0],
            "props": ["", ""],
        }
    )
    out2 = transition_topk(ray.data.from_pandas(tie), k=5).to_pandas()
    assert {(r.prev, r.nxt) for r in out2.itertuples()} == {("x", "y")}


def test_events_cube_matches_duckdb(ray_session):
    import duckdb

    from datafiller_ray.pipelines.events import events_cube

    rng = np.random.default_rng(2)
    n = 500
    df = pd.DataFrame(
        {
            "event_id": np.arange(n),
            "user_id": rng.integers(0, 20, n),
            "event_type": rng.choice(["a", "b", "c"], n),
            "ts": pd.to_datetime(
                1_700_000_000 + rng.integers(0, 86400, n), unit="s"
            ),
            "value": rng.normal(10, 3, n),
            "props": "",
        }
    )
    out = (
        events_cube(ray.data.from_pandas(df).repartition(7), step=3600)
        .to_pandas()
        .sort_values(["event_type", "bucket_ts"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("events", df)
    want = con.sql(
        """
        WITH e AS (
          SELECT event_type,
                 (epoch_us(ts) // 1000000 // 3600) * 3600 AS hr,
                 CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS val_u
          FROM events)
        SELECT COALESCE(event_type, '<ALL>') AS event_type,
               COALESCE(hr, -1) AS bucket_ts,
               count(*)::BIGINT AS n_events,
               CAST(SUM(val_u) AS DOUBLE) / 1000000.0 AS sum_value
        FROM e
        GROUP BY GROUPING SETS ((event_type, hr), (event_type), (hr), ())
        ORDER BY event_type, bucket_ts
        """
    ).df()
    pd.testing.assert_frame_equal(
        out.astype({"bucket_ts": "int64", "n_events": "int64"}),
        want.astype({"bucket_ts": "int64", "n_events": "int64"}),
    )
    # margins really are margins
    grand = out[(out["event_type"] == "<ALL>") & (out["bucket_ts"] == -1)]
    assert int(grand["n_events"].iloc[0]) == n


def test_user_lifetime_active_days(ray_session):
    from datafiller_ray.pipelines.events import user_lifetime

    # user 1: 3 events over 2 distinct UTC days; user 2: 1 event
    ts = [
        ("2023-11-14 23:59:59", 1),
        ("2023-11-15 00:00:01", 1),
        ("2023-11-15 12:00:00", 1),
        ("2023-11-15 12:00:00", 2),
    ]
    df = pd.DataFrame(
        {
            "event_id": range(4),
            "user_id": [u for _, u in ts],
            "event_type": "e",
            "ts": pd.to_datetime([t for t, _ in ts]),
            "value": 1.0,
            "props": "",
        }
    )
    out = (
        user_lifetime(ray.data.from_pandas(df).repartition(4))
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    assert out["user_id"].tolist() == [1, 2]
    assert out["n_events"].tolist() == [3, 1]
    assert out["active_days"].tolist() == [2, 1]
    assert out.loc[0, "first_us"] < out.loc[0, "last_us"]


def test_daily_active_users(ray_session):
    from datafiller_ray.pipelines.events import daily_active_users

    ts = [
        ("2023-11-14 10:00:00", 1),
        ("2023-11-14 11:00:00", 1),   # same user same day: dau 1, events 2
        ("2023-11-14 12:00:00", 2),   # second user
        ("2023-11-15 00:00:01", 1),
    ]
    df = pd.DataFrame(
        {
            "event_id": range(4),
            "user_id": [u for _, u in ts],
            "event_type": "e",
            "ts": pd.to_datetime([t for t, _ in ts]),
            "value": 1.0,
            "props": "",
        }
    )
    out = (
        daily_active_users(ray.data.from_pandas(df).repartition(4))
        .to_pandas()
        .sort_values("day")
        .reset_index(drop=True)
    )
    assert out["dau"].tolist() == [2, 1]
    assert out["n_events"].tolist() == [3, 1]


def test_rolling_active_users_window(ray_session):
    from datafiller_ray.pipelines.events import rolling_active_users

    # days 0,1,2 observed; day 10 observed (gap) — windows respect gaps
    ts = [
        ("2023-11-01 10:00", 1), ("2023-11-01 11:00", 2),
        ("2023-11-02 10:00", 2),
        ("2023-11-03 10:00", 3),
        ("2023-11-11 10:00", 1),
    ]
    df = pd.DataFrame(
        {
            "event_id": range(5),
            "user_id": [u for _, u in ts],
            "event_type": "e",
            "ts": pd.to_datetime([t for t, _ in ts]),
            "value": 1.0,
            "props": "",
        }
    )
    out = (
        rolling_active_users(
            ray.data.from_pandas(df).repartition(5), window_days=3
        )
        .to_pandas()
        .sort_values("day")
        .reset_index(drop=True)
    )
    d0 = out["day"].min()
    got = dict(zip(out["day"] - d0, out["wau"]))
    # day0: {1,2}; day1: day0+day1 = {1,2}; day2: {1,2,3};
    # day10: only itself in the trailing-3 window = {1}
    assert got == {0: 2, 1: 2, 2: 3, 10: 1}


def test_calendar_rollup_matches_duckdb_month_and_week(ray_session):
    """Calendar buckets (date_trunc semantics) vs DuckDB over a frame that
    spans month boundaries and a non-epoch-aligned ISO week start — the
    cases fixed-step bucket arithmetic gets wrong."""
    import duckdb

    from datafiller_ray.pipelines.events import events_rollup_calendar

    rng = np.random.default_rng(11)
    ts = pd.to_datetime("2023-11-20") + pd.to_timedelta(
        rng.integers(0, 120 * 86_400, size=600), unit="s"
    )  # ~4 months, crossing a year boundary
    df = pd.DataFrame(
        {
            "event_id": np.arange(600, dtype=np.int64),
            "ts": ts,
            "user_id": rng.integers(0, 20, size=600),
            "event_type": rng.choice(["a", "b", "c"], size=600),
            "value": np.round(rng.normal(10, 3, size=600), 6),
            "props": "",
        }
    )
    con = duckdb.connect()
    con.register("events", df)
    for unit in ("month", "week"):
        got = (
            events_rollup_calendar(ray.data.from_pandas(df), unit=unit)
            .to_pandas()
            .sort_values(["event_type", "bucket_ts"])
            .reset_index(drop=True)
        )
        want = (
            con.execute(
                f"""
            SELECT event_type,
                   CAST(date_trunc('{unit}', ts) AS TIMESTAMP) AS bucket_ts,
                   COUNT(*) AS n_events,
                   round_even(SUM(value), 6) AS sum_value,
                   MIN(value) AS min_value,
                   MAX(value) AS max_value
            FROM events GROUP BY 1, 2 ORDER BY 1, 2
        """
            )
            .df()
            .reset_index(drop=True)
        )
        got["bucket_ts"] = pd.to_datetime(got["bucket_ts"])
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_calendar_rollup_validates_unit(ray_session):
    from datafiller_ray.config import EngineValueError
    from datafiller_ray.pipelines.events import events_rollup_calendar

    df = pd.DataFrame(
        {"event_id": [1], "ts": pd.to_datetime(["2024-01-01"]),
         "user_id": [0], "event_type": ["a"], "value": [1.0], "props": [""]}
    )
    with pytest.raises(EngineValueError):
        events_rollup_calendar(ray.data.from_pandas(df), unit="hour")


def test_session_stats_literal(ray_session):
    import pyarrow as pa
    import ray.data

    from datafiller_ray.pipelines.events import session_stats

    us = 1_000_000
    rows = [
        # user 1: one 3-event session (0s, 10s, 100s) then a lone event
        {"user_id": 1, "ts": 0},
        {"user_id": 1, "ts": 10 * us},
        {"user_id": 1, "ts": 100 * us},
        {"user_id": 1, "ts": 10_000 * us},
        # user 2: one 2-event session, duration 50
        {"user_id": 2, "ts": 0},
        {"user_id": 2, "ts": 50 * us},
    ]
    t = pa.Table.from_pylist(rows).cast(
        pa.schema([("user_id", pa.int64()), ("ts", pa.timestamp("us"))])
    )
    out = (
        session_stats(ray.data.from_arrow(t), gap_seconds=1800, cap=10)
        .to_pandas()
        .sort_values("n_bucket")
        .reset_index(drop=True)
    )
    assert out["n_bucket"].tolist() == [1, 2, 3]
    assert out["n_sessions"].tolist() == [1, 1, 1]
    assert out["total_dur"].tolist() == [0, 50, 100]
    assert out["mean_dur"].tolist() == [0.0, 50.0, 100.0]
    assert out["p50_dur"].tolist() == [0.0, 50.0, 100.0]


def test_session_stats_cap_bucket(ray_session):
    import pyarrow as pa
    import ray.data

    from datafiller_ray.pipelines.events import session_stats

    us = 1_000_000
    rows = [{"user_id": 7, "ts": i * us} for i in range(15)]  # one 15-event session
    t = pa.Table.from_pylist(rows).cast(
        pa.schema([("user_id", pa.int64()), ("ts", pa.timestamp("us"))])
    )
    out = session_stats(ray.data.from_arrow(t), cap=10).to_pandas()
    assert out["n_bucket"].tolist() == [10]
    assert out["total_dur"].tolist() == [14]


def test_user_entropy_literal(ray_session):
    import math

    import ray.data

    from datafiller_ray.pipelines.events import user_entropy

    ts = pd.to_datetime(
        ["2024-01-01 00:00:00"] * 6, utc=False
    )
    df = pd.DataFrame(
        {
            "event_id": np.arange(6, dtype=np.int64),
            "ts": ts,
            "user_id": np.array([1, 1, 1, 1, 2, 2], dtype=np.int64),
            "event_type": ["a", "a", "b", "c", "x", "x"],
            "value": np.zeros(6),
            "props": [""] * 6,
        }
    )
    out = (
        user_entropy(ray.data.from_pandas(df))
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    assert out["user_id"].tolist() == [1, 2]
    assert out["n_events"].tolist() == [4, 2]
    assert out["n_types"].tolist() == [3, 1]
    # user 1: ln(4) - (2 ln 2 + 1 ln 1 + 1 ln 1)/4; user 2: exactly 0
    h1 = math.log(4) - (2 * math.log(2)) / 4
    assert out["entropy"].tolist() == [
        np.floor(h1 * 1e6 + 0.5) / 1e6,
        0.0,
    ]


def test_user_entropy_null_type_is_one_group(ray_session):
    import ray.data

    from datafiller_ray.pipelines.events import user_entropy

    ts = pd.to_datetime(["2024-01-01"] * 4)
    df = pd.DataFrame(
        {
            "event_id": np.arange(4, dtype=np.int64),
            "ts": ts,
            "user_id": np.array([5, 5, 5, 5], dtype=np.int64),
            "event_type": pd.array(["a", None, None, "a"], dtype="string"),
            "value": np.zeros(4),
            "props": [""] * 4,
        }
    )
    out = user_entropy(ray.data.from_pandas(df)).to_pandas()
    assert out["n_types"].tolist() == [2]
    import math

    h = math.log(4) - (2 * 2 * math.log(2)) / 4
    assert out["entropy"].tolist() == [np.floor(h * 1e6 + 0.5) / 1e6]


def test_survival_km_literal_curve(ray_session):
    import ray.data

    from datafiller_ray.pipelines.events import survival_km

    # 4 users: u1 converts at +1h, u2 converts at +3h, u3 censored at +3h,
    # u4 censored at +0h (single event)
    base = pd.Timestamp("2024-01-01").value // 1000  # us
    H = 3_600_000_000
    rows = [
        (1, base, "view"), (1, base + H, "purchase"),
        (2, base, "view"), (2, base + 3 * H, "purchase"),
        (3, base, "view"), (3, base + 3 * H, "click"),
        (4, base, "view"),
    ]
    df = pd.DataFrame(rows, columns=["user_id", "us", "event_type"])
    df["ts"] = pd.to_datetime(df["us"], unit="us")
    ev = ray.data.from_pandas(df[["ts", "user_id", "event_type"]])
    out = (
        survival_km(ev).to_pandas().sort_values("dur_h").reset_index(drop=True)
    )
    # grid: t=0 (u4 censored), t=1 (u1 converts, risk 3), t=3 (u2 converts,
    # u3 censored, risk 2)
    assert out["dur_h"].tolist() == [0, 1, 3]
    assert out["n_risk"].tolist() == [4, 3, 2]
    assert out["n_events"].tolist() == [0, 1, 1]
    assert out["n_censored"].tolist() == [1, 0, 1]
    # S: 1 at t=0; 2/3 at t=1; 2/3 * 1/2 = 1/3 at t=3
    assert out["survival"].tolist() == [1.0, 0.666667, 0.333333]


def test_survival_km_matches_pandas_oracle(ray_session):
    import importlib.util
    import os as _os

    import ray.data

    from datafiller_ray.pipelines.events import survival_km

    p = _os.path.join(_os.path.dirname(__file__), "oracle", "fills.py")
    spec = importlib.util.spec_from_file_location("oracle_fills_km", p)
    o = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(o)

    rng = np.random.default_rng(41)
    n = 3000
    base = pd.Timestamp("2024-01-01").value // 1000
    df = pd.DataFrame(
        {
            "user_id": rng.integers(0, 400, size=n),
            "us": base + rng.integers(0, 200 * 3_600_000_000, size=n),
            "event_type": rng.choice(
                ["view", "click", "purchase"], p=[0.6, 0.3, 0.1], size=n
            ),
        }
    )
    df["ts"] = pd.to_datetime(df["us"], unit="us")
    got = (
        survival_km(ray.data.from_pandas(df[["ts", "user_id", "event_type"]]))
        .to_pandas()
        .sort_values("dur_h")
        .reset_index(drop=True)
    )
    exp = o.km_curve(df[["ts", "user_id", "event_type"]])
    pd.testing.assert_frame_equal(got, exp)
