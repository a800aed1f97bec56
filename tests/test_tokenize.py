"""Tokenizer: engine output must be byte-identical to the DuckDB oracle
expression (the whole correctness gate rests on this parity)."""

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from dataflowkit_ray.tokenize import (
    TOKEN_SQL_EXPR,
    hash_token_lists,
    token_id,
    tokenize_documents,
    tokenize_text,
)


def test_token_id_scalar():
    assert token_id("hello") == (5 * 256 + ord("h")) % 32000
    assert token_id("") == 0
    assert token_id("a") == (256 + 97) % 32000


def test_parity_vs_duckdb(sf_dir):
    t = pq.read_table(f"{sf_dir}/documents.parquet")
    tokens, n_tok = tokenize_text(t["text"])
    con = duckdb.connect()
    o = con.sql(
        f"SELECT {TOKEN_SQL_EXPR} tokens FROM read_parquet('{sf_dir}/documents.parquet')"
    ).fetch_arrow_table()
    assert tokens.to_pylist() == o["tokens"].to_pylist()
    assert n_tok.to_pylist() == [len(x) for x in o["tokens"].to_pylist()]


def test_tokenize_edge_cases():
    text = pa.array(["", "a", "one two", "x  y"])  # empty text, double space
    tokens, n_tok = tokenize_text(text)
    assert tokens.to_pylist()[0] == [0]  # '' splits to ['']
    assert n_tok.to_pylist() == [1, 1, 2, 3]
    assert tokens.to_pylist()[3][1] == 0  # empty middle word -> token 0


def test_tokenize_documents_schema(sf_dir):
    t = pq.read_table(f"{sf_dir}/documents.parquet").slice(0, 10)
    out = tokenize_documents(t)
    assert out.column_names == ["doc_id", "tokens", "n_tok", "source", "event_seq"]
    assert out["doc_id"].type == pa.string()
    assert out["tokens"].type == pa.list_(pa.int32())
    assert out["n_tok"].type == pa.int32()
    assert out["event_seq"].to_pylist() == t["doc_id"].to_pylist()


def test_hash_token_lists_determinism():
    a = pa.array([[1, 2, 3], [1, 2, 3], [3, 2, 1], []], type=pa.list_(pa.int32()))
    h = hash_token_lists(a)
    assert h[0] == h[1]
    assert h[0] != h[2]
    h2 = hash_token_lists(a)
    assert np.array_equal(h, h2)
