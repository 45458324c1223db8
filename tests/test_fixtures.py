"""Fixture generator determinism + contract checks."""

import numpy as np
import pyarrow.compute as pc

from datafiller_ray.fixtures import generate_input_table, tiny_edge_case_table
from datafiller_ray.functions.hashing import (
    expected_tokens_flat,
    row_seed,
    string_hash64,
)
from datafiller_ray.stages.validate import extract_epoch_minute, validate_tokens


def test_deterministic():
    a = generate_input_table(5000, 8)
    b = generate_input_table(5000, 8)
    assert a.equals(b)


def test_contract_schema():
    t = generate_input_table(2000, 5)
    assert t.column_names == ["doc_id", "tokens", "n_tok", "source"]
    assert str(t.schema.field("tokens").type) == "list<item: int32>"
    lengths = pc.list_value_length(t["tokens"])
    assert pc.all(pc.equal(pc.cast(lengths, "int32"), t["n_tok"])).as_py()
    # doc_id unique
    assert pc.count_distinct(t["doc_id"]).as_py() == t.num_rows


def test_doc_id_encodes_minute():
    t = generate_input_table(2000, 5)
    minute = extract_epoch_minute(t["doc_id"]).to_numpy()
    assert (minute > 28_000_000).all()  # ~2024 epoch minutes
    # doc_id == source:zero-padded minute
    recon = [f"{s}:{m:010d}" for s, m in zip(t["source"].to_pylist()[:100], minute[:100])]
    assert recon == t["doc_id"].to_pylist()[:100]


def test_tokens_match_generator_contract():
    t = generate_input_table(1000, 4)
    validate_tokens(t)  # raises on mismatch
    # spot check: recompute one row by hand
    src = np.array(t["source"].to_pylist()[:1])
    minute = extract_epoch_minute(t["doc_id"]).to_numpy()[:1]
    seeds = row_seed(string_hash64(src), minute)
    _, vals = expected_tokens_flat(seeds, np.array(t["n_tok"].to_pylist()[:1]))
    assert vals.tolist() == t["tokens"].to_pylist()[0]
    assert (vals >= 0).all() and (vals < 50_000).all()


def test_skewed_source_sizes():
    t = generate_input_table(20_000, 10)
    counts = t.group_by("source").aggregate([("n_tok", "count")])
    sizes = sorted(counts["n_tok_count"].to_pylist(), reverse=True)
    assert sizes[0] > 3 * sizes[-1]  # Zipf skew present


def test_edge_case_table_sources():
    t = tiny_edge_case_table()
    sources = set(t["source"].to_pylist())
    assert {"edge_single", "edge_nogap", "edge_shortgaps", "edge_daygap"} <= sources
