"""Sequence packing: greedy fixed-length packing of pre-tokenized docs.

The canonical pretraining step over this engine's input domain: documents
(doc_id, n_tok, source) are packed per source into training sequences of
at most ``max_len`` tokens. This stage computes the PACK MANIFEST — pack
boundaries, per-pack token/doc counts, fill ratios — from the 16-byte
(doc_id, n_tok) projection only; the heavy ``tokens`` column never moves.
Materializing the packed token arrays is a second, embarrassingly
parallel gather: each manifest row names a contiguous doc_id range of one
source, so a `map_batches` over the manifest can read exactly those rows
(the same partition-pruned pattern as the ANN storage index).

Determinism contract (shared with the vendored scalar oracle):

- docs are packed in ascending ``doc_id`` order within each source;
- greedy rule: a pack takes consecutive docs while total n_tok stays
  <= max_len; a single doc longer than max_len forms its own (oversize)
  pack — nothing is split or dropped;
- all arithmetic is int64 (boundaries via searchsorted on the token
  cumsum, one pack per iteration); only ``fill_ratio`` divides, rounded
  with the engine-wide floor(x*1e6+0.5)/1e6.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import numpy as np
import pandas as pd

if TYPE_CHECKING:
    from ray.data import Dataset


def pack_bounds(n_tok: np.ndarray, max_len: int) -> np.ndarray:
    """Start indices of each pack (greedy; one searchsorted per pack)."""
    n = n_tok.size
    cs = np.concatenate([np.zeros(1, np.int64), np.cumsum(n_tok.astype(np.int64))])
    starts = []
    i = 0
    while i < n:
        starts.append(i)
        j = int(np.searchsorted(cs, cs[i] + max_len, side="right")) - 1
        i = max(j, i + 1)  # an oversize doc advances by one
    return np.asarray(starts, dtype=np.int64)


def _pack_one_source(g: pd.DataFrame, source: str, max_len: int) -> pd.DataFrame:
    order = np.argsort(g["doc_id"].to_numpy(), kind="stable")
    ids = g["doc_id"].to_numpy()[order]
    tok = g["n_tok"].to_numpy(np.int64)[order]
    starts = pack_bounds(tok, max_len)
    ends = np.concatenate([starts[1:], np.array([tok.size], dtype=np.int64)])
    cs = np.concatenate([np.zeros(1, np.int64), np.cumsum(tok)])
    filled = cs[ends] - cs[starts]
    n_packs = starts.size
    return pd.DataFrame(
        {
            "source": np.full(n_packs, source, dtype=object),
            "pack_idx": np.arange(n_packs, dtype=np.int64),
            "n_docs": (ends - starts).astype(np.int64),
            "tok_filled": filled,
            "oversize": filled > max_len,
            "fill_ratio": np.floor(
                filled.astype(np.float64) / float(max_len) * 1e6 + 0.5
            )
            / 1e6,
            "first_doc_id": ids[starts],
            "last_doc_id": ids[ends - 1],
        }
    )


def pack_sequences(
    input_path, *, max_len: int = 2048
) -> "Dataset":
    """Pack manifest per source. The shuffle moves only (doc_id, n_tok,
    source) rows keyed by the int64 source hash — the same exchange shape
    as the flagship, minus the minute pre-aggregation (packing is
    doc-granular by nature)."""
    import ray

    from datafiller_ray.config import EngineValueError
    from datafiller_ray.pipelines.rollup import read_input

    if max_len < 1:
        raise EngineValueError(f"max_len must be >= 1, got {max_len}")

    ds = (
        input_path
        if isinstance(input_path, ray.data.Dataset)
        else read_input(input_path, with_tokens=False)
    )

    def add_skey(t):
        import pyarrow as pa

        from datafiller_ray.functions.hashing import string_hash64

        skey = string_hash64(
            np.asarray(t["source"].to_pandas(), dtype="U")
        ).view(np.int64)
        return t.append_column("skey", pa.array(skey, pa.int64()))

    keyed = ds.map_batches(add_skey, batch_format="pyarrow")

    def group_fn(g: pd.DataFrame) -> pd.DataFrame:
        if g["source"].iloc[0] == g["source"].iloc[-1] and g["source"].nunique() == 1:
            return _pack_one_source(g, g["source"].iloc[0], max_len)
        return pd.concat(
            [
                _pack_one_source(sub, src, max_len)
                for src, sub in g.groupby("source", sort=True)
            ],
            ignore_index=True,
        )

    return keyed.groupby("skey").map_groups(group_fn, batch_format="pandas")


def pack_tokens(
    input_path, *, max_len: int = 2048
) -> "Dataset":
    """Materialize the packed training sequences: same deterministic
    boundaries as :func:`pack_sequences` (both derive from
    ``pack_bounds`` on the doc_id-sorted stream — no manifest join
    needed), emitting one row per pack with the concatenated token array
    as a little-endian int32 blob. This stage is the one that MUST move
    the token payload (it is the output); it rides the same skey exchange,
    and the per-row token-array-equality invariant holds through it:
    decoding ``tokens_blob`` yields exactly the input docs' token arrays
    concatenated in doc_id order (pinned by tests and the driver oracle).
    A source whose token volume exceeds a worker's heap takes the salted
    path upstream (choose_fill_path precedent)."""
    import ray

    from datafiller_ray.config import EngineValueError
    from datafiller_ray.pipelines.rollup import read_input

    if max_len < 1:
        raise EngineValueError(f"max_len must be >= 1, got {max_len}")

    ds = (
        input_path
        if isinstance(input_path, ray.data.Dataset)
        else read_input(input_path, with_tokens=True)
    )

    def add_skey(t):
        import pyarrow as pa

        from datafiller_ray.functions.hashing import string_hash64

        skey = string_hash64(
            np.asarray(t["source"].to_pandas(), dtype="U")
        ).view(np.int64)
        return t.append_column("skey", pa.array(skey, pa.int64()))

    keyed = ds.map_batches(add_skey, batch_format="pyarrow")

    def one_source(g: pd.DataFrame, source: str) -> pd.DataFrame:
        order = np.argsort(g["doc_id"].to_numpy(), kind="stable")
        tok_counts = g["n_tok"].to_numpy(np.int64)[order]
        arrays = g["tokens"].to_numpy()[order]
        flat = (
            np.concatenate([np.asarray(a, dtype=np.int32) for a in arrays])
            if arrays.size
            else np.empty(0, dtype=np.int32)
        )
        starts = pack_bounds(tok_counts, max_len)
        ends = np.concatenate([starts[1:], np.array([tok_counts.size], np.int64)])
        cs = np.concatenate([np.zeros(1, np.int64), np.cumsum(tok_counts)])
        blobs = [
            flat[cs[s] : cs[e]].astype("<i4").tobytes()
            for s, e in zip(starts, ends)
        ]
        return pd.DataFrame(
            {
                "source": np.full(starts.size, source, dtype=object),
                "pack_idx": np.arange(starts.size, dtype=np.int64),
                "tok_filled": (cs[ends] - cs[starts]).astype(np.int64),
                "tokens_blob": np.asarray(blobs, dtype=object),
            }
        )

    def group_fn(g: pd.DataFrame) -> pd.DataFrame:
        if g["source"].iloc[0] == g["source"].iloc[-1] and g["source"].nunique() == 1:
            return one_source(g, g["source"].iloc[0])
        return pd.concat(
            [one_source(sub, src) for src, sub in g.groupby("source", sort=True)],
            ignore_index=True,
        )

    return keyed.groupby("skey").map_groups(group_fn, batch_format="pandas")
