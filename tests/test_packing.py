"""Sequence packing (pipelines/packing.py): greedy boundary properties and
the end-to-end manifest. Engine-vs-oracle hash parity is covered by
test_entry_contract[pack_sequences]."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from datafiller_ray.pipelines.packing import _pack_one_source, pack_bounds


def test_pack_bounds_basic():
    # max_len 10: [4,5] fits; 6 starts a new pack; [6,3] fits; 2 overflows
    tok = np.array([4, 5, 6, 3, 2], dtype=np.int64)
    np.testing.assert_array_equal(pack_bounds(tok, 10), [0, 2, 4])


def test_pack_bounds_oversize_doc_owns_pack():
    tok = np.array([3, 50, 4], dtype=np.int64)
    np.testing.assert_array_equal(pack_bounds(tok, 10), [0, 1, 2])


def test_pack_bounds_exact_fit_and_singletons():
    tok = np.array([10, 10, 10], dtype=np.int64)
    np.testing.assert_array_equal(pack_bounds(tok, 10), [0, 1, 2])
    tok2 = np.array([5, 5, 5, 5], dtype=np.int64)
    np.testing.assert_array_equal(pack_bounds(tok2, 10), [0, 2])


def test_pack_bounds_greedy_invariants():
    rng = np.random.default_rng(13)
    for _ in range(50):
        n = int(rng.integers(1, 400))
        tok = rng.integers(1, 900, size=n).astype(np.int64)
        L = int(rng.integers(100, 2000))
        starts = pack_bounds(tok, L)
        ends = np.concatenate([starts[1:], [n]])
        cs = np.concatenate([[0], np.cumsum(tok)])
        filled = cs[ends] - cs[starts]
        sizes = ends - starts
        # every pack is either within budget or a single oversize doc
        assert ((filled <= L) | (sizes == 1)).all()
        # greedy maximality: the next doc after each non-final pack would overflow
        for s, e in zip(starts[:-1], ends[:-1]):
            assert filled[starts.tolist().index(s)] + tok[e] > L or tok[s] > L
        # every doc is packed exactly once
        assert sizes.sum() == n


def test_pack_one_source_manifest():
    g = pd.DataFrame(
        {
            "doc_id": ["d3", "d1", "d2"],  # unsorted input; packer sorts
            "n_tok": np.array([4, 5, 6], dtype=np.int64),
        }
    )
    out = _pack_one_source(g, "s", max_len=11)
    # sorted order: d1(5), d2(6), d3(4) -> pack [d1,d2]=11, pack [d3]=4
    assert out["n_docs"].tolist() == [2, 1]
    assert out["tok_filled"].tolist() == [11, 4]
    assert out["first_doc_id"].tolist() == ["d1", "d3"]
    assert out["last_doc_id"].tolist() == ["d2", "d3"]
    assert out["fill_ratio"].tolist() == [1.0, np.floor(4 / 11 * 1e6 + 0.5) / 1e6]
    assert not out["oversize"].any()


def test_pack_sequences_end_to_end(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from datafiller_ray.config import EngineValueError
    from datafiller_ray.fixtures import generate_input_table
    from datafiller_ray.pipelines.packing import pack_sequences

    path = tmp_path / "in.parquet"
    pq.write_table(generate_input_table(6000, 7, seed=21), path)
    out = pack_sequences(str(path), max_len=1024).to_pandas()
    assert len(out) > 0
    # token conservation: packed totals equal the corpus total
    truth = pq.read_table(path, columns=["n_tok"])["n_tok"].to_numpy().sum()
    assert out["tok_filled"].sum() == truth
    # pack indices are dense 0..k-1 per source
    for _, g in out.groupby("source"):
        assert sorted(g["pack_idx"]) == list(range(len(g)))
    with pytest.raises(EngineValueError):
        pack_sequences(str(path), max_len=0)


def test_pack_tokens_round_trip_invariant(ray_session, tmp_path):
    """Token-array equality through packing: decoding each blob yields the
    input docs' token arrays concatenated in doc_id order."""
    import pyarrow.parquet as pq

    from datafiller_ray.fixtures import generate_input_table
    from datafiller_ray.pipelines.packing import pack_tokens

    path = tmp_path / "in.parquet"
    pq.write_table(generate_input_table(3000, 5, seed=9), path)
    out = pack_tokens(str(path), max_len=512).to_pandas()

    src_tab = pq.read_table(path, columns=["doc_id", "tokens", "source"]).to_pandas()
    for src, g in src_tab.groupby("source"):
        g = g.sort_values("doc_id", kind="stable")
        expect = np.concatenate(
            [np.asarray(t, dtype=np.int32) for t in g["tokens"]]
        )
        packs = out[out["source"] == src].sort_values("pack_idx")
        got = np.concatenate(
            [np.frombuffer(b, dtype="<i4") for b in packs["tokens_blob"]]
        )
        np.testing.assert_array_equal(got, expect)
        assert packs["tok_filled"].sum() == expect.size


def test_chunked_packing_semantics(ray_session, tmp_path):
    """chunk_span packs each (source, time-chunk) independently: chunked
    output == running the global packer on each chunk's rows separately,
    and every pack's docs stay within one chunk."""
    import pyarrow.parquet as pq

    from datafiller_ray.fixtures import generate_input_table
    from datafiller_ray.pipelines.packing import pack_sequences, pack_tokens

    path = tmp_path / "in.parquet"
    pq.write_table(generate_input_table(4000, 4, seed=31), path)
    span = 240  # minutes per chunk
    out = pack_sequences(str(path), max_len=512, chunk_span=span).to_pandas()
    assert "chunk" in out.columns

    full = pq.read_table(path, columns=["doc_id", "n_tok", "source"]).to_pandas()
    full["chunk"] = full["doc_id"].str[-10:].astype(np.int64) // span
    from datafiller_ray.pipelines.packing import _pack_one_source

    for (src, ch), g in full.groupby(["source", "chunk"]):
        expect = _pack_one_source(g, src, 512)
        got = (
            out[(out["source"] == src) & (out["chunk"] == ch)]
            .drop(columns=["chunk"])
            .sort_values("pack_idx")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, expect)

    # tokens variant: chunk boundaries respected, token conservation holds
    packed = pack_tokens(str(path), max_len=512, chunk_span=span).to_pandas()
    total = int(full["n_tok"].sum())
    assert int(packed["tok_filled"].sum()) == total


def test_chunk_counts_brute_force():
    from datafiller_ray.pipelines.packing import chunk_counts

    for max_len, ov in ((128, 16), (10, 0), (10, 9), (5, 2)):
        stride = max_len - ov
        for n in range(1, 400):
            # brute force: walk chunk starts
            s, k = 0, 0
            while True:
                k += 1
                if s + max_len >= n:
                    break
                s += stride
            got = chunk_counts(np.array([n]), max_len, ov)[0]
            assert got == k, (n, max_len, ov, got, k)


def test_chunk_sequences_manifest(ray_session):
    import pyarrow as pa

    from datafiller_ray.config import EngineValueError
    from datafiller_ray.pipelines.packing import chunk_sequences

    t = pa.table(
        {
            "doc_id": pa.array(["a", "b", "c"]),
            "source": pa.array(["s", "s", "t"]),
            "n_tok": pa.array([5, 129, 241], type=pa.int32()),
        }
    )
    out = (
        chunk_sequences(ray.data.from_arrow(t), max_len=128, overlap=16)
        .to_pandas()
        .sort_values(["doc_id", "chunk_idx"])
        .reset_index(drop=True)
    )
    assert out[out.doc_id == "a"]["chunk_len"].tolist() == [5]
    assert out[out.doc_id == "b"][["tok_start", "tok_end"]].values.tolist() == [
        [0, 128], [112, 129],
    ]
    assert out[out.doc_id == "c"][["tok_start", "tok_end"]].values.tolist() == [
        [0, 128], [112, 240], [224, 241],
    ]
    # every token position of each doc is covered, consecutive chunks overlap
    for _, g in out.groupby("doc_id"):
        assert g["tok_start"].iloc[0] == 0
        assert (g["tok_start"].iloc[1:].to_numpy() < g["tok_end"].iloc[:-1].to_numpy()).all() or len(g) == 1
    with pytest.raises(EngineValueError):
        chunk_sequences(ray.data.from_arrow(t), max_len=8, overlap=8)


class TestDedupSequences:
    def _write(self, tmp_path, rows):
        import pyarrow as pa
        import pyarrow.parquet as pq

        t = pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], type=pa.string()),
                "tokens": pa.array(
                    [r[1] for r in rows], type=pa.list_(pa.int32())
                ),
                "n_tok": pa.array(
                    [len(r[1]) for r in rows], type=pa.int32()
                ),
                "source": pa.array([r[2] for r in rows], type=pa.string()),
            }
        )
        d = tmp_path / "seqs"
        d.mkdir()
        pq.write_table(t.slice(0, len(rows) // 2), d / "a.parquet")
        pq.write_table(t.slice(len(rows) // 2), d / "b.parquet")
        return str(d)

    def test_dedup_keeps_min_doc_id(self, ray_session, tmp_path):
        from datafiller_ray.pipelines.packing import dedup_sequences

        rows = [
            ("d1", [1, 2, 3], "s1"),
            ("d2", [1, 2, 3], "s2"),      # dup of d1 (cross-source, cross-file)
            ("d3", [3, 2, 1], "s1"),      # same multiset, different order: kept
            ("d4", [], "s1"),             # empty array
            ("d5", [], "s2"),             # dup of empty
            ("d6", [1, 2, 3, 4], "s1"),   # superset: kept
        ]
        path = self._write(tmp_path, rows)
        out = dedup_sequences(path).to_pandas().sort_values("doc_id")
        assert out["doc_id"].tolist() == ["d1", "d3", "d4", "d6"]

    def test_dedup_no_duplicates_identity(self, ray_session, tmp_path):
        from datafiller_ray.pipelines.packing import dedup_sequences

        rows = [(f"d{i}", [i, i + 1], "s") for i in range(10)]
        path = self._write(tmp_path, rows)
        out = dedup_sequences(path).to_pandas()
        assert sorted(out["doc_id"]) == [f"d{i}" for i in range(10)]

    def test_collision_guard_and_exact_compare(self, ray_session, tmp_path):
        """Equal hashes with different bytes must both survive (the phase-2
        byte-exact compare), and the candidate guard raises."""
        import pandas as pd

        from datafiller_ray.config import EngineValueError
        from datafiller_ray.pipelines.packing import (
            _dedup_exact_group,
            dedup_sequences,
        )

        # collision-proofness: one synthetic bucket where three docs share
        # a hash but only two share bytes -> the distinct array survives
        g = pd.DataFrame(
            {
                "doc_id": ["d2", "d1", "d3"],
                "source": ["s", "s", "s"],
                "n_tok": [2, 2, 2],
                "_h": [7, 7, 7],
                "_blob": [b"\x01\x02", b"\x01\x02", b"\x09\x09"],
            }
        )
        out = _dedup_exact_group(g)
        assert sorted(out["doc_id"]) == ["d1", "d3"]

        # guard: force max_candidates=0 with a real duplicate present
        rows = [("d1", [5, 6], "s"), ("d2", [5, 6], "s")]
        path = self._write(tmp_path, rows)
        import pytest as _pytest

        with _pytest.raises(EngineValueError):
            dedup_sequences(path, max_candidates=0)
