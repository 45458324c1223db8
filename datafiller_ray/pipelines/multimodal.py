"""Multimodal (image/audio/video) column handling.

Media payloads are opaque ``binary`` columns with typed metadata columns
(``media_type``, ``width``/``height``/``sample_rate``...). Decode /
feature-extract / resize / frame-sample run as actor-pool ``map_batches``
stages: codec state is built once per actor in ``__init__``; batches stay
small because each row carries a large blob (the guide's "large binary
payloads need small batches" rule).

The decode step itself is STUBBED: no image/audio libraries exist in this
container. ``decoder="fake"`` produces a deterministic decode (so the
Ray-side plumbing — schema, batch size, actor signature, output layout — is
real and tested); ``decoder="pillow"``-style real backends raise
NotImplementedError with a clear message until the dependency is present.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("media_type", pa.string()),  # "image" | "audio" | "video"
        ("payload", pa.large_binary()),
        ("width", pa.int32()),
        ("height", pa.int32()),
    ]
)


def synthesize_media_table(n: int, *, seed: int = 42) -> pa.Table:
    """Deterministic fake media rows (binary payload = seeded bytes)."""
    rng = np.random.default_rng(seed)
    sizes = rng.integers(256, 4096, n)
    payloads = [rng.integers(0, 256, s, dtype=np.uint8).tobytes() for s in sizes]
    return pa.table(
        {
            "media_id": pa.array(np.arange(n), pa.int64()),
            "media_type": pa.array(["image"] * n, pa.string()),
            "payload": pa.array(payloads, pa.large_binary()),
            "width": pa.array(rng.integers(16, 256, n, dtype=np.int32), pa.int32()),
            "height": pa.array(rng.integers(16, 256, n, dtype=np.int32), pa.int32()),
        }
    )


class MediaFeatureExtractor:
    """Actor-pool stage: decode -> feature vector per media row.

    ``__init__`` is where a real backend would load codecs / models (once
    per actor). ``__call__`` is vectorized over the batch where possible;
    the per-row decode is inherently per-blob.
    """

    FEATURE_DIM = 16

    def __init__(self, decoder: str = "fake") -> None:
        if decoder == "fake":
            self._decode = self._fake_decode
        else:  # pragma: no cover - real backends absent in this container
            raise NotImplementedError(
                f"media decoder {decoder!r} requires an image/audio library "
                "not present in this environment; use decoder='fake'"
            )

    @staticmethod
    def _fake_decode(payload: bytes, width: int, height: int) -> np.ndarray:
        """Deterministic stand-in for a pixel decode: payload bytes folded
        into a (height-ish) array. Replaced wholesale by a real codec."""
        arr = np.frombuffer(payload, dtype=np.uint8).astype(np.float32)
        return arr

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        feats = np.zeros((len(batch), self.FEATURE_DIM), dtype=np.float32)
        for i, (payload, w, h) in enumerate(
            zip(batch["payload"], batch["width"], batch["height"])
        ):
            px = self._decode(payload, int(w), int(h))
            # 16-bin byte histogram as the stand-in feature
            hist, _ = np.histogram(px, bins=self.FEATURE_DIM, range=(0, 256))
            feats[i] = hist / max(1, px.size)
        out = pd.DataFrame(
            {
                "media_id": batch["media_id"].to_numpy(np.int64),
                "media_type": batch["media_type"].to_numpy(),
            }
        )
        out["features"] = list(feats)
        return out


def media_features(
    media: "object", *, decoder: str = "fake", batch_size: int = 64
) -> "object":
    """Feature-extraction pipeline over a media Dataset. Small batch_size:
    rows carry megabyte-scale blobs at production scale, and batch bytes x
    pool concurrency must fit the worker heap."""
    return media.map_batches(
        MediaFeatureExtractor,
        fn_constructor_kwargs={"decoder": decoder},
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=(1, 8),
        num_cpus=1,
    )
