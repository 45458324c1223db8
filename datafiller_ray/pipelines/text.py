"""Training-data text operations over a ``documents`` table
(doc_id:int64, text:string, lang:string, source:string, n_chars:int64).

All hot paths are vectorized (pandas str / numpy) inside ``map_batches``;
stateful pieces (compiled regexes, stopword tables, permutation matrices)
live in callable-class actors initialized once per actor.

These are engine-level additions beyond the reference (which has no text
ops); they follow the same partial+final aggregation discipline as the
rollup pipeline.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from datafiller_ray.functions.hashing import splitmix64, string_hash64

# ---------------------------------------------------------------------------
# exact dedup


def _hash_stage(batch: pd.DataFrame) -> pd.DataFrame:
    batch = batch.copy()
    batch["_h"] = string_hash64(batch["text"].to_numpy(dtype="U")).astype(np.int64)
    return batch


def _dedup_group(g: pd.DataFrame) -> pd.DataFrame:
    # exact-equality check within the hash bucket (collision-proof): keep the
    # min doc_id per distinct text
    keep = g.sort_values("doc_id").drop_duplicates("text", keep="first")
    return keep.drop(columns=["_h"])


def exact_dedup(documents: "ray.data.Dataset") -> "ray.data.Dataset":
    """Exact dedup: content-hash in a vectorized map, hash-partitioned
    groupby, per-group first-by-doc_id. The shuffle key is the 64-bit hash
    (small), never the text payload ordering."""
    return (
        documents.map_batches(_hash_stage, batch_format="pandas")
        .groupby("_h")
        .map_groups(_dedup_group, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# token counting / quality / language id


class TextStats:
    """Whitespace token count + character-class quality ratios.

    Definitions are deliberately SQL-expressible so DuckDB can serve as the
    oracle: tok_count = number of \\s+-separated tokens of trim(text);
    alpha/digit/space ratios over n_chars.
    """

    def __init__(self) -> None:
        import re

        self.ws = re.compile(r"\s+")
        self.alpha = re.compile(r"[A-Za-z]")
        self.digit = re.compile(r"[0-9]")
        self.space = re.compile(r" ")

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        text = batch["text"].fillna("")
        trimmed = text.str.strip()
        n = text.str.len().to_numpy(np.int64)
        tok = trimmed.str.split(self.ws).str.len().to_numpy()
        tok = np.where(trimmed.str.len().to_numpy(np.int64) == 0, 0, tok).astype(
            np.int64
        )
        alpha = text.str.count(self.alpha).to_numpy(np.int64)
        digit = text.str.count(self.digit).to_numpy(np.int64)
        space = text.str.count(self.space).to_numpy(np.int64)
        denom = np.maximum(n, 1).astype(np.float64)
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].to_numpy(np.int64),
                "tok_count": tok,
                "n_chars": n,
                "alpha_ratio": np.round(alpha / denom, 6),
                "digit_ratio": np.round(digit / denom, 6),
                "space_ratio": np.round(space / denom, 6),
            }
        )


def text_stats(documents: "ray.data.Dataset") -> "ray.data.Dataset":
    return documents.map_batches(
        TextStats, batch_format="pandas", concurrency=(1, 4), batch_size=4096
    )


_STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "it", "for"},
    "fr": {"le", "la", "les", "de", "des", "et", "un", "une", "que", "est"},
    "de": {"der", "die", "das", "und", "ist", "ein", "eine", "nicht", "mit", "sich"},
    "es": {"el", "la", "los", "de", "y", "que", "un", "una", "es", "en"},
}


class LangId:
    """N-gram/stopword language heuristic (engine addition; no external
    models). Deterministic: argmax of stopword hit counts, ties -> 'und'."""

    def __init__(self) -> None:
        import re

        self.word = re.compile(r"[a-zà-ÿ]+")
        self.tables = {k: frozenset(v) for k, v in _STOPWORDS.items()}

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        langs = []
        for text in batch["text"].fillna(""):
            words = self.word.findall(text.lower())
            scores = {
                lang: sum(w in table for w in words)
                for lang, table in self.tables.items()
            }
            best = max(scores.items(), key=lambda kv: (kv[1], kv[0]))
            top = [k for k, v in scores.items() if v == best[1]]
            langs.append(best[0] if best[1] > 0 and len(top) == 1 else "und")
        return pd.DataFrame(
            {"doc_id": batch["doc_id"].to_numpy(np.int64), "lang_pred": langs}
        )


def quality_filter(
    documents: "ray.data.Dataset",
    *,
    min_tok: int = 5,
    min_alpha_ratio: float = 0.5,
    max_digit_ratio: float = 0.3,
) -> "ray.data.Dataset":
    """The actionable side of quality scoring: keep documents passing the
    token-count and character-class thresholds (the standard pre-training
    corpus filter shape). Returns the surviving (doc_id, source, n_chars)
    rows; thresholds are compared on the same round-6 ratios the stats op
    emits so the DuckDB oracle matches hash-exactly."""
    stats = documents.map_batches(
        TextStats, batch_format="pandas", concurrency=(1, 4), batch_size=4096
    )

    def keep(batch: pd.DataFrame) -> pd.DataFrame:
        m = (
            (batch["tok_count"] >= min_tok)
            & (batch["alpha_ratio"] >= min_alpha_ratio)
            & (batch["digit_ratio"] <= max_digit_ratio)
        )
        return batch.loc[m, ["doc_id"]]

    kept_ids = stats.map_batches(keep, batch_format="pandas")
    # broadcast semi-join of the (small) surviving id set
    ids = set(kept_ids.to_pandas()["doc_id"])
    ref = ray.put(ids)

    class Semi:
        def __init__(self) -> None:
            self.ids = ray.get(ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            return batch.loc[
                batch["doc_id"].isin(self.ids), ["doc_id", "source", "n_chars"]
            ]

    return documents.map_batches(
        Semi, batch_format="pandas", batch_size=4096, concurrency=(1, 4)
    )


def lang_id(documents: "ray.data.Dataset") -> "ray.data.Dataset":
    return documents.map_batches(
        LangId, batch_format="pandas", concurrency=(1, 4), batch_size=2048
    )


# ---------------------------------------------------------------------------
# fingerprints: simhash + rolling-hash document fingerprint


class SimHash:
    """64-bit SimHash over word unigrams (Charikar 2002)."""

    def __init__(self) -> None:
        import re

        self.word = re.compile(r"\w+")

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        out = np.zeros(len(batch), dtype=np.int64)
        for i, text in enumerate(batch["text"].fillna("")):
            words = self.word.findall(text.lower())
            if not words:
                continue
            h = string_hash64(np.array(words, dtype="U"))
            bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(
                np.int64
            )
            v = np.where(bits.sum(axis=0) * 2 > len(words), 1, 0)
            out[i] = np.int64(
                np.bitwise_or.reduce(v.astype(np.uint64) << np.arange(64, dtype=np.uint64)).astype(np.int64)
            )
        return pd.DataFrame(
            {"doc_id": batch["doc_id"].to_numpy(np.int64), "simhash": out}
        )


def simhash(documents: "ray.data.Dataset") -> "ray.data.Dataset":
    return documents.map_batches(
        SimHash, batch_format="pandas", concurrency=(1, 4), batch_size=2048
    )


class Fingerprint:
    """Rolling-hash (Rabin-Karp style) document fingerprint: min of rolling
    window hashes over the byte stream — a cheap content sketch."""

    WINDOW = 16
    BASE = np.uint64(1_000_003)

    def __init__(self) -> None:
        self.pow_top = self.BASE ** np.uint64(self.WINDOW - 1)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        out = np.zeros(len(batch), dtype=np.int64)
        for i, text in enumerate(batch["text"].fillna("")):
            data = np.frombuffer(text.encode("utf-8", "ignore"), dtype=np.uint8)
            if data.size < self.WINDOW:
                out[i] = np.int64(splitmix64(data.astype(np.uint64)).sum() & 0x7FFFFFFFFFFFFFFF) if data.size else 0
                continue
            w = self.WINDOW
            with np.errstate(over="ignore"):
                # rolling polynomial hash via cumulative products (vectorized)
                n = data.size
                powers = self.BASE ** np.arange(w, dtype=np.uint64)
                windows = np.lib.stride_tricks.sliding_window_view(data, w).astype(
                    np.uint64
                )
                hashes = (windows * powers[::-1]).sum(axis=1)
                out[i] = np.int64(splitmix64(hashes).min() & np.uint64(0x7FFFFFFFFFFFFFFF))
        return pd.DataFrame(
            {"doc_id": batch["doc_id"].to_numpy(np.int64), "fingerprint": out}
        )


def fingerprint(documents: "ray.data.Dataset") -> "ray.data.Dataset":
    return documents.map_batches(
        Fingerprint, batch_format="pandas", concurrency=(1, 4), batch_size=2048
    )


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup


class MinHasher:
    """Char-shingle MinHash signatures (k=5 shingles, 128 permutations via
    universal hashing), banded for LSH (16 bands x 8 rows).

    Permutation parameters are built once per actor in __init__ (stateful
    actor-pool stage)."""

    K = 5
    NUM_PERM = 128
    BANDS = 16

    def __init__(self) -> None:
        rng = np.random.default_rng(1234)
        self.a = rng.integers(1, 2**61 - 1, self.NUM_PERM, dtype=np.uint64) | np.uint64(1)
        self.b = rng.integers(0, 2**61 - 1, self.NUM_PERM, dtype=np.uint64)

    def signature(self, text: str) -> np.ndarray | None:
        data = np.frombuffer(text.lower().encode("utf-8", "ignore"), dtype=np.uint8)
        if data.size < self.K:
            return None
        windows = np.lib.stride_tricks.sliding_window_view(data, self.K).astype(np.uint64)
        with np.errstate(over="ignore"):
            powers = np.uint64(257) ** np.arange(self.K, dtype=np.uint64)
            shingles = np.unique(splitmix64((windows * powers).sum(axis=1)))
            # (num_perm, n_shingles) universal hash, min per row
            hashed = self.a[:, None] * shingles[None, :] + self.b[:, None]
        return hashed.min(axis=1)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        rows_per_band = self.NUM_PERM // self.BANDS
        out_doc, out_band, out_hash = [], [], []
        for doc_id, text in zip(batch["doc_id"], batch["text"].fillna("")):
            sig = self.signature(text)
            if sig is None:
                continue
            bands = sig.reshape(self.BANDS, rows_per_band)
            with np.errstate(over="ignore"):
                band_hash = splitmix64(
                    (bands * (np.uint64(31) ** np.arange(rows_per_band, dtype=np.uint64))).sum(axis=1)
                ).astype(np.int64)
            out_doc.extend([doc_id] * self.BANDS)
            out_band.extend(range(self.BANDS))
            out_hash.extend(band_hash.tolist())
        return pd.DataFrame(
            {
                "doc_id": np.asarray(out_doc, dtype=np.int64),
                "band": np.asarray(out_band, dtype=np.int64),
                "band_hash": np.asarray(out_hash, dtype=np.int64),
            }
        )


def _bucket_to_pairs(g: pd.DataFrame) -> pd.DataFrame:
    ids = np.sort(g["doc_id"].unique())
    if ids.size < 2:
        return pd.DataFrame({"doc_a": [], "doc_b": []})
    # candidate pairs against the bucket minimum (min-label propagation seed);
    # enough for connected-component clustering without quadratic blowup
    return pd.DataFrame({"doc_a": np.full(ids.size - 1, ids[0]), "doc_b": ids[1:]})


def minhash_near_dup(
    documents: "ray.data.Dataset", *, verify_threshold: float = 0.8
) -> "ray.data.Dataset":
    """MinHash-LSH near-duplicate candidate clusters.

    shingle -> minhash -> band -> groupby(band, band_hash) -> candidate pairs
    (ray_guide.md pattern). Returns (doc_a, doc_b) candidate edges with
    doc_a = bucket-min id; exact Jaccard verification is the caller's choice
    (verify_near_dup_pairs) since it needs a second text lookup.
    """
    sigs = documents.map_batches(
        MinHasher, batch_format="pandas", concurrency=(1, 8), batch_size=1024
    )
    pairs = sigs.groupby(["band", "band_hash"]).map_groups(
        _bucket_to_pairs, batch_format="pandas"
    )
    # per-block dedup only: a pair colliding in several bands may survive in
    # different blocks, but duplicate edges are harmless to both Jaccard
    # verification and union-find clustering — not worth a second shuffle
    return pairs.map_batches(
        lambda df: df.drop_duplicates(), batch_format="pandas"
    )


def verify_near_dup_pairs(
    documents: "ray.data.Dataset",
    pairs: "ray.data.Dataset",
    *,
    threshold: float = 0.8,
    k: int = 5,
) -> "ray.data.Dataset":
    """Exact-Jaccard verification of LSH candidate pairs.

    The candidate set is orders of magnitude smaller than the corpus, so the
    texts of candidate doc ids are broadcast once (``ray.put`` of a dict)
    and each verify batch computes char-k-gram Jaccard locally — a broadcast
    semi-join, not a shuffle join (ray_guide.md "Joins and lookups")."""
    pair_df = pairs.to_pandas()  # small by construction
    if len(pair_df) == 0:
        return pairs.filter(lambda row: False)
    need = set(pair_df["doc_a"]) | set(pair_df["doc_b"])
    texts: dict[int, str] = {}
    for batch in documents.select_columns(["doc_id", "text"]).iter_batches(
        batch_size=4096, batch_format="pandas"
    ):
        m = batch["doc_id"].isin(need)
        texts.update(zip(batch.loc[m, "doc_id"], batch.loc[m, "text"]))
    ref = ray.put(texts)

    class Verify:
        def __init__(self) -> None:
            self.texts = ray.get(ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            sims = [
                ngram_jaccard(self.texts.get(a, ""), self.texts.get(b, ""), k)
                for a, b in zip(batch["doc_a"], batch["doc_b"])
            ]
            batch = batch.copy()
            batch["jaccard"] = np.round(sims, 6)
            return batch[batch["jaccard"] >= threshold]

    return ray.data.from_pandas(pair_df).map_batches(
        Verify, batch_format="pandas", batch_size=1024, concurrency=(1, 4)
    )


def near_dup_clusters(verified_pairs: pd.DataFrame) -> pd.DataFrame:
    """Connected components over verified near-dup edges -> (doc_id,
    cluster_id=min id in component). Union-find on the driver — valid only
    because the verified edge set is provably small (candidates that passed
    Jaccard); at corpus scale this becomes iterated min-label propagation
    via groupby (ray_guide.md), which these edges also support."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(verified_pairs["doc_a"], verified_pairs["doc_b"]):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    rows = sorted((doc, find(doc)) for doc in parent)
    return pd.DataFrame(rows, columns=["doc_id", "cluster_id"])


def ngram_jaccard(a: str, b: str, k: int = 5) -> float:
    """Exact char-k-gram Jaccard similarity (verification kernel)."""
    sa = {a[i : i + k] for i in range(max(0, len(a) - k + 1))}
    sb = {b[i : i + k] for i in range(max(0, len(b) - k + 1))}
    if not sa and not sb:
        return 1.0
    if not sa or not sb:
        return 0.0
    return len(sa & sb) / len(sa | sb)
