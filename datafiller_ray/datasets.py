"""Dataset helpers: synthetic-missingness injectors and demo-table loaders.

Mirrors the reference surface ``datafiller.datasets`` (reference
``src/datafiller/datasets/__init__.py``):

- ``add_mar`` / ``add_contiguous_missing`` — DataFrame-level missingness
  injectors (reference ``datasets/_misc.py:7-64``) used to build benchmark
  inputs; semantics (validation message, ratio definition, block shape,
  seed-reproducibility, input immutability) match the reference, the RNG
  stream is this engine's own.
- ``load_titanic`` / ``load_pems_bay`` — the reference's pooch-backed
  download loaders (``datasets/_datasets.py:6-72``). This sandbox has no
  network and no pooch, so the loaders keep the reference's exact
  lazy-import contract (ImportError naming pooch) and the download itself
  only runs where pooch exists; ``synthetic_titanic`` /
  ``synthetic_pems_bay`` are deterministic offline stand-ins producing the
  same schema shape (mixed-dtype table with missing values / wide 5-minute
  sensor panel) for tests and demos.

The Ray-level equivalents of the injectors (MAR ratio + contiguous block
drops applied to the parquet fixture) live in ``datafiller_ray.fixtures``;
this module is the user-facing pandas surface.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from datafiller_ray.config import EngineValueError

__all__ = [
    "add_mar",
    "add_contiguous_missing",
    "load_titanic",
    "load_pems_bay",
    "synthetic_titanic",
    "synthetic_pems_bay",
]


def add_mar(
    df: pd.DataFrame,
    nan_ratio: float,
    rng: "int | np.random.Generator | None" = None,
) -> pd.DataFrame:
    """Return a copy of ``df`` with cells masked to NaN at rate ``nan_ratio``.

    Missing-At-Random: every cell is dropped independently with probability
    ``nan_ratio`` (reference ``datasets/_misc.py:7-28``). The input frame is
    never modified; passing the same ``rng`` seed reproduces the same mask.
    """
    if not 0 <= nan_ratio <= 1:
        raise EngineValueError("nan_ratio must be between 0 and 1")
    gen = np.random.default_rng(rng)
    drop = pd.DataFrame(
        gen.random(df.shape) < nan_ratio, index=df.index, columns=df.columns
    )
    # .mask copies; object/categorical columns take NaN without dtype errors
    return df.mask(drop)


def add_contiguous_missing(
    df: pd.DataFrame,
    frac_columns: float,
    length: "int | float",
    rng: "int | np.random.Generator | None" = None,
) -> pd.DataFrame:
    """Drop one contiguous block of values in a random subset of columns.

    ``frac_columns`` of the columns (``int(n_cols * frac)``, sampled without
    replacement) each get a single run of NaNs; ``length`` is an absolute
    row count when int, a fraction of ``len(df)`` when float, and is capped
    at the frame length (reference ``datasets/_misc.py:31-64``). The block
    start is uniform over the valid range per column. Input is not modified.
    """
    if not 0 <= frac_columns <= 1:
        raise EngineValueError("frac_columns must be between 0 and 1")
    gen = np.random.default_rng(rng)
    out = df.copy()
    n_rows = len(out)
    n_pick = int(len(out.columns) * frac_columns)
    picked = gen.choice(np.asarray(out.columns, dtype=object), size=n_pick, replace=False)
    block = int(n_rows * length) if isinstance(length, float) else int(length)
    block = min(block, n_rows)
    for col in picked:
        start = int(gen.integers(0, n_rows - block + 1))
        out.loc[out.index[start : start + block], col] = np.nan
    return out


_TITANIC_URL = "https://raw.githubusercontent.com/mwaskom/seaborn-data/master/titanic.csv"
_TITANIC_HASH = "md5:56f29cc0b807cb970a914ed075227f94"
_PEMS_BAY_URL = "https://zenodo.org/records/5724362/files/PEMS-BAY.csv"
_PEMS_BAY_HASH = "md5:c8dea58987a5882e946217c22fdb8256"


def _retrieve(url: str, known_hash: str) -> str:
    """pooch retrieve with the reference's lazy-import contract.

    Reference ``datasets/_datasets.py:19-25,50-56``: pooch is imported at
    call time; when absent the loader raises ImportError telling the user to
    ``pip install pooch``. This is the path that runs in-sandbox.
    """
    try:
        import pooch  # noqa: PLC0415 — lazy by contract
    except ImportError:
        raise ImportError(
            "pooch is required to download the dataset. "
            "Please install it with `pip install pooch`."
        ) from None
    return pooch.retrieve(url=url, known_hash=known_hash, progressbar=True)


def load_titanic() -> pd.DataFrame:
    """Download the Titanic demo table (mixed numeric/categorical, has NaNs).

    Reference ``datasets/_datasets.py:6-35``. Requires pooch + network;
    offline, use :func:`synthetic_titanic` (same schema shape).
    """
    return pd.read_csv(_retrieve(_TITANIC_URL, _TITANIC_HASH))


def load_pems_bay() -> pd.DataFrame:
    """Download the PEMS-BAY traffic panel (5-minute DatetimeIndex ``time``).

    Reference ``datasets/_datasets.py:38-72``. Requires pooch + network;
    offline, use :func:`synthetic_pems_bay` (same shape contract).
    """
    df = pd.read_csv(_retrieve(_PEMS_BAY_URL, _PEMS_BAY_HASH), index_col=0, parse_dates=[0])
    df = df.rename_axis(index="time", columns="sensor_id")
    return df.asfreq("5min")


def synthetic_titanic(n_rows: int = 891, rng: int = 0) -> pd.DataFrame:
    """Deterministic offline stand-in for :func:`load_titanic`.

    Same schema shape as the seaborn titanic CSV: numeric columns with NaNs
    (``age``), categorical/object columns with NaNs (``deck``,
    ``embarked``), booleans, and fully-observed covariates — the mixed-dtype
    profile ``impute_mixed`` / ``MultivariateFiller`` demos need.
    """
    gen = np.random.default_rng(rng)
    pclass = gen.choice([1, 2, 3], size=n_rows, p=[0.24, 0.21, 0.55])
    sex = gen.choice(["male", "female"], size=n_rows, p=[0.65, 0.35])
    age = np.round(np.clip(gen.normal(29.7, 14.5, size=n_rows), 0.4, 80.0), 1)
    sibsp = gen.poisson(0.5, size=n_rows)
    parch = gen.poisson(0.4, size=n_rows)
    # fare correlates with class so model-based fills have signal to learn
    fare = np.round(
        np.exp(gen.normal(4.6 - 0.9 * pclass, 0.5, size=n_rows)) + 5.0, 4
    )
    embarked = gen.choice(["S", "C", "Q"], size=n_rows, p=[0.72, 0.19, 0.09])
    deck = gen.choice(list("ABCDEFG"), size=n_rows)
    # survival depends on sex/class to give the classifier a learnable target
    p_surv = 0.2 + 0.5 * (sex == "female") + 0.1 * (pclass == 1)
    survived = (gen.random(n_rows) < p_surv).astype(np.int64)

    df = pd.DataFrame(
        {
            "survived": survived,
            "pclass": pclass.astype(np.int64),
            "sex": sex,
            "age": age,
            "sibsp": sibsp.astype(np.int64),
            "parch": parch.astype(np.int64),
            "fare": fare,
            "embarked": embarked,
            "class": pd.Categorical.from_codes(pclass - 1, ["First", "Second", "Third"]),
            "who": np.where(age < 16, "child", np.where(sex == "male", "man", "woman")),
            "adult_male": (sex == "male") & (age >= 16),
            "deck": deck,
            "alone": (sibsp + parch) == 0,
        }
    )
    # reference dataset's missingness profile: ~20% age, ~77% deck, a few embarked
    df.loc[gen.random(n_rows) < 0.199, "age"] = np.nan
    df.loc[gen.random(n_rows) < 0.772, "deck"] = np.nan
    df.loc[gen.choice(n_rows, size=max(2, n_rows // 445), replace=False), "embarked"] = np.nan
    return df


def synthetic_pems_bay(
    n_sensors: int = 16, n_steps: int = 2016, rng: int = 0
) -> pd.DataFrame:
    """Deterministic offline stand-in for :func:`load_pems_bay`.

    Shape contract of the real panel: DatetimeIndex named ``time`` at a
    strict 5-minute frequency, columns axis named ``sensor_id``, float
    speed readings with a strong daily cycle and correlated sensors —
    the wide-panel profile ``TimeSeriesFiller`` demos need. Default size is
    one week of 5-minute steps.
    """
    gen = np.random.default_rng(rng)
    idx = pd.date_range("2017-01-01", periods=n_steps, freq="5min", name="time")
    minutes = (idx.hour * 60 + idx.minute).to_numpy(dtype=np.float64)
    daily = np.sin(2 * np.pi * minutes / 1440.0)
    # shared daily cycle + per-sensor offset/gain + AR(1)-ish noise
    offset = gen.normal(62.0, 3.0, size=n_sensors)
    gain = gen.normal(8.0, 2.0, size=n_sensors)
    noise = gen.normal(0.0, 1.0, size=(n_steps, n_sensors))
    for t in range(1, n_steps):
        noise[t] += 0.8 * noise[t - 1]
    speeds = offset[None, :] - gain[None, :] * daily[:, None] + noise
    df = pd.DataFrame(
        np.round(speeds, 4),
        index=idx,
        columns=pd.Index([str(400000 + i) for i in range(n_sensors)], name="sensor_id"),
    )
    return df.asfreq("5min")
