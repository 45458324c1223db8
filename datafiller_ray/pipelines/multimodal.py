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
        kind, backend = resolve_image_decoder(decoder)
        if kind == "fake":
            self._decode = self._fake_decode
        else:  # pragma: no cover - Pillow absent in this container
            self._backend = backend

            def real_decode(payload: bytes, width: int, height: int) -> np.ndarray:
                import io

                img = self._backend.open(io.BytesIO(payload)).convert("L")
                return np.asarray(img, dtype=np.float32).ravel()

            self._decode = real_decode

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


def synthesize_video_table(n: int, *, seed: int = 43) -> pa.Table:
    """Deterministic fake video rows: payload = n_frames fixed-size frames."""
    rng = np.random.default_rng(seed)
    n_frames = rng.integers(4, 33, n)
    frame_bytes = rng.integers(64, 513, n)
    payloads = [
        rng.integers(0, 256, int(f) * int(b), dtype=np.uint8).tobytes()
        for f, b in zip(n_frames, frame_bytes)
    ]
    return pa.table(
        {
            "media_id": pa.array(np.arange(n), pa.int64()),
            "media_type": pa.array(["video"] * n, pa.string()),
            "payload": pa.array(payloads, pa.large_binary()),
            "n_frames": pa.array(n_frames.astype(np.int32), pa.int32()),
            "frame_bytes": pa.array(frame_bytes.astype(np.int32), pa.int32()),
        }
    )


class MediaResizer:
    """Actor-pool stage: decode -> resize -> re-encode.

    The fake decode tiles the payload bytes into an (h, w) grid; the resize
    itself is REAL vectorized nearest-neighbor index math (what a production
    stage would run after a genuine codec decode). Emits the standard media
    schema with the new dimensions."""

    def __init__(self, target_w: int, target_h: int, decoder: str = "fake") -> None:
        if decoder != "fake":  # pragma: no cover - no codec libs in-sandbox
            raise NotImplementedError(
                f"media decoder {decoder!r} requires an image library not "
                "present in this environment; use decoder='fake'"
            )
        self.tw = int(target_w)
        self.th = int(target_h)

    @staticmethod
    def _fake_decode_grid(payload: bytes, w: int, h: int) -> np.ndarray:
        flat = np.frombuffer(payload, dtype=np.uint8)
        reps = -(-(w * h) // max(1, flat.size))  # ceil; tile then crop
        return np.tile(flat, reps)[: w * h].reshape(h, w)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        out_payload = []
        for payload, w, h in zip(batch["payload"], batch["width"], batch["height"]):
            img = self._fake_decode_grid(payload, int(w), int(h))
            # vectorized nearest-neighbor resample
            ys = (np.arange(self.th) * img.shape[0] // self.th).astype(np.int64)
            xs = (np.arange(self.tw) * img.shape[1] // self.tw).astype(np.int64)
            out_payload.append(img[np.ix_(ys, xs)].tobytes())
        return pd.DataFrame(
            {
                "media_id": batch["media_id"].to_numpy(np.int64),
                "media_type": batch["media_type"].to_numpy(),
                "payload": out_payload,
                "width": np.full(len(batch), self.tw, dtype=np.int32),
                "height": np.full(len(batch), self.th, dtype=np.int32),
            }
        )


def media_resize(
    media: "object", target_w: int, target_h: int, *, decoder: str = "fake",
    batch_size: int = 64,
) -> "object":
    """Resize pipeline (same small-batch / actor-pool discipline as
    media_features)."""
    return media.map_batches(
        MediaResizer,
        fn_constructor_args=(target_w, target_h),
        fn_constructor_kwargs={"decoder": decoder},
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=(1, 8),
        num_cpus=1,
    )


class FrameSampler:
    """Actor-pool stage: sample every k-th frame of a video payload; emits
    one row PER SAMPLED FRAME (a flat-map-shaped batch fn — output row count
    differs from input)."""

    def __init__(self, every_k: int, decoder: str = "fake") -> None:
        if decoder != "fake":  # pragma: no cover
            raise NotImplementedError(
                f"video decoder {decoder!r} requires a codec library not "
                "present in this environment; use decoder='fake'"
            )
        if every_k < 1:
            raise ValueError("every_k must be >= 1")
        self.k = int(every_k)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        ids, types, frames, idxs = [], [], [], []
        for mid, mtype, payload, nf, fb in zip(
            batch["media_id"], batch["media_type"], batch["payload"],
            batch["n_frames"], batch["frame_bytes"],
        ):
            data = np.frombuffer(payload, dtype=np.uint8)
            nf, fb = int(nf), int(fb)
            for fi in range(0, nf, self.k):
                ids.append(int(mid))
                types.append(mtype)
                idxs.append(fi)
                frames.append(data[fi * fb : (fi + 1) * fb].tobytes())
        return pd.DataFrame(
            {
                "media_id": np.asarray(ids, dtype=np.int64),
                "media_type": types,
                "frame_idx": np.asarray(idxs, dtype=np.int64),
                "frame": frames,
            }
        )


def frame_sample(
    videos: "object", *, every_k: int = 4, decoder: str = "fake",
    batch_size: int = 16,
) -> "object":
    """Frame-sampling pipeline: tiny batches (each row fans out to many
    frame rows, and payloads are the large side at production scale)."""
    return videos.map_batches(
        FrameSampler,
        fn_constructor_args=(every_k,),
        fn_constructor_kwargs={"decoder": decoder},
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=(1, 8),
        num_cpus=1,
    )


# ---------------------------------------------------------------------------
# audio: deterministic fake PCM, resample + features


def synthesize_audio_table(n: int, *, seed: int = 44) -> pa.Table:
    """Deterministic fake audio rows: payload = seeded int16 PCM bytes with
    a per-row sine component (so DSP stages act on structured signal, not
    white noise), plus sample-rate/length metadata."""
    rng = np.random.default_rng(seed)
    rates = rng.choice([8_000, 16_000, 44_100], n)
    lengths = rng.integers(400, 4000, n)
    payloads = []
    for i in range(n):
        t = np.arange(int(lengths[i]))
        freq = 0.01 + 0.1 * rng.random()
        wave = 0.6 * np.sin(2 * np.pi * freq * t) + 0.1 * rng.standard_normal(
            int(lengths[i])
        )
        payloads.append((wave * 10_000).astype("<i2").tobytes())
    return pa.table(
        {
            "audio_id": pa.array(np.arange(n), pa.int64()),
            "media_type": pa.array(["audio"] * n, pa.string()),
            "payload": pa.array(payloads, pa.large_binary()),
            "sample_rate": pa.array(rates.astype(np.int32), pa.int32()),
            "n_samples": pa.array(lengths.astype(np.int64), pa.int64()),
        }
    )


class AudioResampler:
    """Actor-pool stage: decode PCM -> linear resample to ``target_rate`` ->
    re-encode. The resampling math is real (vectorized np.interp over the
    time grid); only the CODEC is the deterministic fake (raw little-endian
    int16), since no audio container libs exist here — a real backend slots
    into ``__init__``/``_decode`` exactly like the image stages."""

    def __init__(self, target_rate: int, decoder: str = "fake") -> None:
        if decoder != "fake":
            raise NotImplementedError(
                f"audio decoder {decoder!r} needs an audio library; this "
                "container has none (decode is stubbed by contract)"
            )
        self.target_rate = int(target_rate)

    @staticmethod
    def _decode(payload: bytes) -> np.ndarray:
        return np.frombuffer(payload, dtype="<i2").astype(np.float64)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        out_payload, out_n = [], []
        for payload, rate in zip(batch["payload"], batch["sample_rate"]):
            x = self._decode(bytes(payload))
            rate = int(rate)
            if x.size == 0:  # empty clip passes through empty
                out_payload.append(b"")
                out_n.append(0)
                continue
            n_out = max(1, int(round(x.size * self.target_rate / rate)))
            src_t = np.arange(x.size) / rate
            dst_t = np.arange(n_out) / self.target_rate
            y = np.interp(dst_t, src_t, x)
            out_payload.append(
                np.clip(np.round(y), -32768, 32767).astype("<i2").tobytes()
            )
            out_n.append(n_out)
        return pd.DataFrame(
            {
                "audio_id": batch["audio_id"].to_numpy(np.int64),
                "media_type": "audio",
                "payload": out_payload,
                "sample_rate": np.full(len(batch), self.target_rate, np.int32),
                "n_samples": np.asarray(out_n, dtype=np.int64),
            }
        )


def audio_resample(
    audio: "ray.data.Dataset", *, target_rate: int = 16_000, decoder: str = "fake"
) -> "ray.data.Dataset":
    import ray.data  # noqa: F401  (type only)

    return audio.map_batches(
        AudioResampler,
        fn_constructor_args=(target_rate, decoder),
        batch_format="pandas",
        batch_size=64,  # large blobs per row: keep batches small
        concurrency=(1, 4),
    )


class AudioFeatures:
    """Actor-pool stage: per-clip scalar features over the decoded PCM —
    RMS energy, zero-crossing rate, duration. Real DSP math on the fake
    codec's output."""

    def __init__(self, decoder: str = "fake") -> None:
        if decoder != "fake":
            raise NotImplementedError(
                f"audio decoder {decoder!r} needs an audio library"
            )

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        rms, zcr, dur = [], [], []
        for payload, rate in zip(batch["payload"], batch["sample_rate"]):
            x = AudioResampler._decode(bytes(payload))
            rms.append(float(np.sqrt(np.mean(x * x))) if x.size else 0.0)
            zcr.append(float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1]))) if x.size > 1 else 0.0)
            dur.append(x.size / int(rate))
        return pd.DataFrame(
            {
                "audio_id": batch["audio_id"].to_numpy(np.int64),
                "rms": np.round(rms, 6),
                "zero_cross_rate": np.round(zcr, 6),
                "duration_sec": np.round(dur, 6),
            }
        )


def audio_features(
    audio: "ray.data.Dataset", *, decoder: str = "fake"
) -> "ray.data.Dataset":
    return audio.map_batches(
        AudioFeatures,
        fn_constructor_args=(decoder,),
        batch_format="pandas",
        batch_size=64,
        concurrency=(1, 4),
    )


# ---------------------------------------------------------------------------
# real-codec seam + FIMG container with EXIF-style metadata


def resolve_image_decoder(name: str):
    """Import-try seam for a real image backend.

    - ``"fake"``: always the deterministic fake decode.
    - ``"auto"``: a real backend (Pillow) if importable, else the fake —
      the pipeline runs identically either way, only the decode kernel
      changes.
    - ``"pillow"``: REQUIRE Pillow; raises NotImplementedError with a clear
      message when the library is absent (this container ships no codecs).

    Returns ``(kind, module)`` where kind is "fake" or "pillow".
    """
    if name == "fake":
        return "fake", None
    try:
        import PIL.Image as PILImage  # noqa: N813
    except ImportError:
        PILImage = None
    if name == "auto":
        return ("pillow", PILImage) if PILImage is not None else ("fake", None)
    if name == "pillow":
        if PILImage is None:
            raise NotImplementedError(
                "media decoder 'pillow' requires Pillow, which is not "
                "present in this environment; use decoder='fake' or 'auto'"
            )
        return "pillow", PILImage
    raise ValueError(f"unknown media decoder {name!r}")


FIMG_MAGIC = b"FIMG"
_FIMG_VERSION = 1


def encode_fimg(
    width: int, height: int, channels: int, tags: dict, pixels: bytes
) -> bytes:
    """Serialize the deterministic FIMG container: magic + version +
    dimensions + a TLV metadata section (EXIF-style key/value strings) +
    raw pixel bytes. The format exists so metadata EXTRACTION is real,
    testable plumbing even though genuine EXIF parsing needs a codec lib."""
    head = bytearray()
    head += FIMG_MAGIC
    head.append(_FIMG_VERSION)
    head += int(width).to_bytes(4, "little")
    head += int(height).to_bytes(4, "little")
    head.append(int(channels))
    head += len(tags).to_bytes(2, "little")
    for k, v in tags.items():
        kb, vb = str(k).encode(), str(v).encode()
        head.append(len(kb))
        head += kb
        head += len(vb).to_bytes(2, "little")
        head += vb
    return bytes(head) + pixels


def parse_fimg(payload: bytes) -> dict:
    """Parse an FIMG container header; returns width/height/channels, the
    tag dict and the pixel byte offset. Raises ValueError on bad magic."""
    if payload[:4] != FIMG_MAGIC:
        raise ValueError("not an FIMG payload (bad magic)")
    version = payload[4]
    width = int.from_bytes(payload[5:9], "little")
    height = int.from_bytes(payload[9:13], "little")
    channels = payload[13]
    n_tags = int.from_bytes(payload[14:16], "little")
    pos = 16
    tags: dict[str, str] = {}
    for _ in range(n_tags):
        klen = payload[pos]
        pos += 1
        k = payload[pos : pos + klen].decode()
        pos += klen
        vlen = int.from_bytes(payload[pos : pos + 2], "little")
        pos += 2
        tags[k] = payload[pos : pos + vlen].decode()
        pos += vlen
    return {
        "version": version,
        "width": width,
        "height": height,
        "channels": channels,
        "tags": tags,
        "pixel_offset": pos,
    }


_CAMERA_MAKES = ("acme", "contoso", "globex", "initech")


def synthesize_fimg_table(n: int, *, seed: int = 45) -> pa.Table:
    """Deterministic FIMG-container media rows with EXIF-style tags
    (camera make, capture timestamp, orientation 1-8)."""
    rng = np.random.default_rng(seed)
    payloads = []
    widths = rng.integers(16, 128, n).astype(np.int32)
    heights = rng.integers(16, 128, n).astype(np.int32)
    for i in range(n):
        w, h = int(widths[i]), int(heights[i])
        tags = {
            "camera_make": _CAMERA_MAKES[i % len(_CAMERA_MAKES)],
            "timestamp_utc": str(1_700_000_000 + 60 * i),
            "orientation": str(1 + (i % 8)),
        }
        pixels = rng.integers(0, 256, w * h, dtype=np.uint8).tobytes()
        payloads.append(encode_fimg(w, h, 1, tags, pixels))
    return pa.table(
        {
            "media_id": pa.array(np.arange(n), pa.int64()),
            "media_type": pa.array(["image"] * n, pa.string()),
            "payload": pa.array(payloads, pa.large_binary()),
        }
    )


class MediaMetadata:
    """Actor-pool stage: parse the FIMG header of every payload and emit
    typed metadata columns — the EXIF-extraction shape (header parse only;
    pixels are never touched, so the stage is cheap even on huge blobs).
    Unparseable payloads yield a null row (parse_ok=False) instead of
    failing the batch."""

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for mid, payload in zip(batch["media_id"], batch["payload"]):
            try:
                m = parse_fimg(bytes(payload))
                t = m["tags"]
                rows.append(
                    (
                        int(mid), True, m["width"], m["height"], m["channels"],
                        t.get("camera_make"),
                        int(t["timestamp_utc"]) if "timestamp_utc" in t else None,
                        int(t["orientation"]) if "orientation" in t else None,
                        len(t),
                    )
                )
            except (ValueError, IndexError, UnicodeDecodeError):
                rows.append((int(mid), False, None, None, None, None, None, None, 0))
        return pd.DataFrame(
            rows,
            columns=[
                "media_id", "parse_ok", "width", "height", "channels",
                "camera_make", "timestamp_utc", "orientation", "n_tags",
            ],
        )


def media_metadata(media: "object", *, batch_size: int = 64) -> "object":
    """EXIF-style metadata extraction pipeline over FIMG payloads."""
    return media.map_batches(
        MediaMetadata,
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=(1, 8),
        num_cpus=1,
    )


# ---------------------------------------------------------------------------
# perceptual hash (pHash) + near-duplicate detection over FIMG payloads


PHASH_GRID = 32  # DCT input resolution
PHASH_KEEP = 8  # top-left DCT block -> 64-bit hash


def _dct_matrix(n: int) -> np.ndarray:
    """Orthonormal DCT-II basis matrix (n x n), built once per actor."""
    k = np.arange(n, dtype=np.float64)
    M = np.cos(np.pi * (2.0 * k[None, :] + 1.0) * k[:, None] / (2.0 * n))
    M[0] *= np.sqrt(1.0 / n)
    M[1:] *= np.sqrt(2.0 / n)
    return M


def phash_pixels(gray: np.ndarray, dct: np.ndarray) -> int:
    """64-bit perceptual hash of a 2-D uint8 image: nearest-neighbor
    downsample to PHASH_GRID², 2-D DCT-II, keep the top-left PHASH_KEEP²
    coefficients minus DC, threshold each against their median (strictly
    greater -> 1). Deterministic: fixed index-sampling resize (no codec
    interpolation), fixed float op order, median of an even count is the
    quantile_cont midpoint."""
    h, w = gray.shape
    if h == 0 or w == 0:
        raise ValueError("empty image")
    ry = (np.arange(PHASH_GRID, dtype=np.int64) * h) // PHASH_GRID
    rx = (np.arange(PHASH_GRID, dtype=np.int64) * w) // PHASH_GRID
    small = gray[np.ix_(ry, rx)].astype(np.float64)
    coef = dct @ small @ dct.T
    block = coef[:PHASH_KEEP, :PHASH_KEEP].ravel()[1:]  # drop DC
    med = float(np.median(block))
    bits = block > med
    out = 0
    for i, b in enumerate(bits):  # 63 bits
        if b:
            out |= 1 << i
    return out


class MediaPHash:
    """Actor-pool stage: FIMG payload -> 64-bit perceptual hash. The DCT
    basis is built ONCE per actor (__init__), each payload costs two
    32x32 matmuls; multi-channel images hash the integer-mean channel.
    Unparseable payloads emit parse_ok=False with hash 0."""

    def __init__(self) -> None:
        self.dct = _dct_matrix(PHASH_GRID)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        ids, oks, hashes = [], [], []
        for mid, payload in zip(batch["media_id"], batch["payload"]):
            ids.append(int(mid))
            try:
                raw = bytes(payload)
                m = parse_fimg(raw)
                w, h, c = m["width"], m["height"], m["channels"]
                px = np.frombuffer(
                    raw, np.uint8, count=w * h * c, offset=m["pixel_offset"]
                )
                img = px.reshape(h, w, c).astype(np.int64).sum(axis=2) // c
                hashes.append(phash_pixels(img.astype(np.uint8), self.dct))
                oks.append(True)
            except (ValueError, IndexError, UnicodeDecodeError):
                hashes.append(0)
                oks.append(False)
        return pd.DataFrame(
            {
                "media_id": np.asarray(ids, dtype=np.int64),
                "parse_ok": np.asarray(oks, dtype=bool),
                "phash": np.asarray(hashes, dtype=np.uint64).view(np.int64),
            }
        )


def media_phash(media: "object", *, batch_size: int = 64) -> "object":
    """Perceptual-hash pipeline over FIMG payloads (media_id, parse_ok,
    phash int64). Actor pool with small batches — the big-blob contract."""
    return media.map_batches(
        MediaPHash,
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=(1, 8),
        num_cpus=1,
    )


def media_phash_near_dup(
    media: "object", *, max_hamming: int = 10, batch_size: int = 64
) -> "object":
    """Perceptual near-duplicate image pairs: pHash every payload, then
    the simhash banding trick — the 64-bit hash splits into 8 byte-bands;
    two images within Hamming distance 7 MUST share at least one band
    (pigeonhole), and sharing drops off fast for unrelated hashes, so
    candidate generation is a band-keyed groupby, never all-pairs. Each
    candidate pair is verified with the exact popcount distance; emits
    (media_a < media_b, hamming <= max_hamming). Recall is exact for
    distance <= 7; documented approximation above that (more bands =
    wider exact window, the multi-table LSH pattern)."""
    import ray

    hashed = media_phash(media, batch_size=batch_size)

    def band_rows(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["parse_ok"]]
        hv = b["phash"].to_numpy(np.int64).view(np.uint64)
        ids = b["media_id"].to_numpy(np.int64)
        frames = []
        for band in range(8):
            bits = ((hv >> np.uint64(band * 8)) & np.uint64(0xFF)).astype(
                np.int64
            )
            frames.append(
                pd.DataFrame(
                    {
                        "media_id": ids,
                        "phash": b["phash"].to_numpy(np.int64),
                        "band_key": band * 256 + bits,
                    }
                )
            )
        return pd.concat(frames, ignore_index=True)

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates("media_id")
        m = g.merge(g, on="band_key")
        m = m[m["media_id_x"] < m["media_id_y"]]
        if not len(m):
            out = pd.DataFrame(
                {
                    "media_a": pd.Series([], dtype=np.int64),
                    "media_b": pd.Series([], dtype=np.int64),
                    "hamming": pd.Series([], dtype=np.int64),
                }
            )
            return out
        x = m["phash_x"].to_numpy(np.int64).view(np.uint64)
        y = m["phash_y"].to_numpy(np.int64).view(np.uint64)
        ham = np.zeros(len(m), dtype=np.int64)
        diff = x ^ y
        for _ in range(64):
            ham += (diff & np.uint64(1)).astype(np.int64)
            diff = diff >> np.uint64(1)
        out = pd.DataFrame(
            {
                "media_a": m["media_id_x"].to_numpy(np.int64),
                "media_b": m["media_id_y"].to_numpy(np.int64),
                "hamming": ham,
            }
        )
        return out[out["hamming"] <= max_hamming]

    pairs = (
        hashed.map_batches(band_rows, batch_format="pandas")
        .groupby("band_key")
        .map_groups(bucket_pairs, batch_format="pandas")
    )
    # cross-band dedup through a small keyed exchange (edges, not corpus)
    return pairs.groupby("media_a").map_groups(
        lambda g: g.drop_duplicates(), batch_format="pandas"
    )
