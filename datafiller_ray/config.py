"""Engine configuration and error hierarchy.

The dual-inheritance error trick mirrors the reference's exception design
(``/root/reference/src/datafiller/exceptions.py:18-27``): errors are catchable
both as the engine base class and as the builtin they specialize.
"""

from __future__ import annotations

from dataclasses import dataclass, field


class EngineError(Exception):
    """Base class for all engine errors."""


class EngineValueError(EngineError, ValueError):
    """Invalid value (bad input data, bad config)."""


class EngineTypeError(EngineError, TypeError):
    """Invalid type."""


#: Retention tiers: tier name -> bucket step in seconds. Tumbling, aligned,
#: event-time buckets (SURVEY.md §2.9); the cascade from 1m upward is an
#: exact combine because every coarser step is an integer multiple of the
#: finest one. The default pipeline tiers are 1m/1h/1d; the extras are
#: available by passing them in ``tiers=``.
TIER_STEPS: dict[str, int] = {
    "1m": 60,
    "5m": 300,
    "15m": 900,
    "1h": 3600,
    "6h": 21600,
    "1d": 86400,
    "1w": 604800,
}

#: Order in which tiers cascade (finest first).
TIER_ORDER: tuple[str, ...] = ("1m", "1h", "1d")


@dataclass(frozen=True)
class FillConfig:
    """Gap-fill configuration for one pipeline run.

    Semantics follow the reference:

    - ``strategy="linear"`` with ``max_gap=n`` reproduces
      ``interpolate_small_gaps`` (``timeseries/_utils.py:51-67``): only NaN
      runs of length <= n are filled; leading NaN runs are never filled;
      trailing runs (<= n) take the last observed value (pandas
      ``Series.interpolate`` default behavior).
    - ``strategy="locf"``: forward-fill runs of length <= max_gap.
    - ``strategy="spline"``: local natural cubic spline through nearby
      observed knots (window of ``spline_window`` knots per side), bounded by
      ``max_gap`` like linear. The reference delegates to pandas/scipy
      splines; scipy is absent here so the kernel is self-contained.
    - ``strategy="model"``: datafiller's univariate model path — lag matrix
      (``timeseries/_utils.py:8-48``) + calendar features
      (``timeseries/imputer.py:226-256``) + complete-rows training with
      ``min_samples_train`` (default 20, ``multivariate/imputer.py:164``) +
      ``FastRidge`` float32 normal equations (``estimators/ridge.py:42-111``)
      on standardized columns (``multivariate/imputer.py:421-451``).
    - ``strategy="seasonal"``: fill gaps (<= max_gap) with the series' own
      hour-of-day mean over observed buckets — the seasonal imputation a
      neighbor bridge can't express (engine addition; no reference analog).
    - ``strategy="nearest"``: fill runs <= max_gap with the nearest
      observed value (ties to the left neighbor).
    - ``strategy="bfill"``: backward-fill runs <= max_gap with the next
      observed value (the LOCF mirror; leading runs fillable, trailing not).
    - ``strategy=None``: no gap fill (pure rollup; gap buckets stay null).
    - ``fallback="simple"``: remaining gaps take the per-series observed mean
      (``_apply_fallback``, ``multivariate/imputer.py:744-770``);
      ``fallback=None`` leaves them null.
    """

    strategy: str | None = "linear"
    max_gap: int | None = None
    fallback: str | None = None
    # model-fill knobs (reference defaults)
    lags: tuple[int, ...] = (1, 2, 3, -1, -2, -3)
    alpha: float = 1e-2
    min_samples_train: int = 20
    spline_window: int = 8
    #: bound the spline knot search to observed points within this many grid
    #: positions of a gap run (None = unbounded). Required for salted spline
    #: (the ghost margin must cover everything the kernel can read).
    spline_knot_radius: int | None = None
    #: pluggable regressor for strategy="model" — the reference's
    #: ``regressor=`` extension hook (``multivariate/imputer.py:92-95``).
    #: "ridge" uses the exact Gram path; "elm" fits the reference's
    #: ExtremeLearningMachine per pattern (any fit/predict estimator works
    #: via ``make_estimator``).
    estimator: str = "ridge"
    #: reference training path is complete rows -> optimask -> fallback
    #: (``docs/algorithm.rst:22-32``): when a pattern has too few complete
    #: training rows, search a NaN-free sub-rectangle instead. The
    #: distributed (salted) model path cannot run the whole-matrix search
    #: per chunk and requires ``optimask=False`` (explicit, validated).
    optimask: bool = True

    VALID_STRATEGIES = (
        None, "locf", "linear", "spline", "mean", "model", "seasonal",
        "nearest", "bfill",
    )

    def __post_init__(self) -> None:
        if self.strategy not in self.VALID_STRATEGIES:
            raise EngineValueError(
                f"strategy must be one of {self.VALID_STRATEGIES}, got {self.strategy!r}"
            )
        if self.max_gap is not None and (
            not isinstance(self.max_gap, int) or self.max_gap < 0
        ):
            raise EngineTypeError("max_gap must be a non-negative int or None")
        if self.fallback not in (None, "simple"):
            raise EngineValueError("fallback must be 'simple' or None")
        if self.estimator not in ("ridge", "elm"):
            raise EngineValueError("estimator must be 'ridge' or 'elm'")
        if self.spline_window < 1:
            raise EngineValueError("spline_window must be >= 1")
        if self.spline_knot_radius is not None and (
            not isinstance(self.spline_knot_radius, int) or self.spline_knot_radius < 1
        ):
            # radius 0 would leave trailing runs with an empty knot window
            raise EngineValueError("spline_knot_radius must be a positive int or None")


@dataclass(frozen=True)
class RetentionConfig:
    """Per-tier retention window: keep buckets with
    ``start_ts <= bucket_ts < end_ts`` (either bound may be None).

    Engine analogue of the reference's ``before``/``after`` time-window
    selectors (``timeseries/imputer.py:565-595``).
    """

    windows: dict[str, tuple[int | None, int | None]] = field(default_factory=dict)

    def bounds(self, tier: str) -> tuple[int | None, int | None]:
        return self.windows.get(tier, (None, None))
