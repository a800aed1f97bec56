"""Scalar filter registry — semantics mirror the reference's Filter.Apply
tests (/root/reference/scrape/scrape_test.go:787-803): regex joins all
capture-group matches with ';' and yields '' on no match."""

import pyarrow as pa
import pytest

from dataflowkit_ray.stages.scalars import FILTERS, apply_filters, filters_stage


def _t(vals):
    return pa.table({"text": pa.array(vals, type=pa.string())})


def test_trim_lower_upper_capitalize():
    t = _t(["  Hello World  "])
    assert apply_filters(t, "text", [("trim", None)])["text"].to_pylist() == ["Hello World"]
    assert apply_filters(t, "text", [("lowercase", None)])["text"].to_pylist() == ["  hello world  "]
    assert apply_filters(t, "text", [("uppercase", None)])["text"].to_pylist() == ["  HELLO WORLD  "]
    assert apply_filters(_t(["hello world"]), "text", [("capitalize", None)])["text"].to_pylist() == ["Hello World"]


def test_regex_all_matches_joined():
    t = _t(["a1 b22 c333", "no digits", ""])
    out = apply_filters(t, "text", [("regex", r"([0-9]+)")])
    assert out["text"].to_pylist() == ["1;22;333", "", ""]


def test_regex_no_group_uses_whole_match():
    out = apply_filters(_t(["ab cd"]), "text", [("regex", r"[a-z]+")])
    assert out["text"].to_pylist() == ["ab;cd"]


def test_filter_chain_order():
    out = apply_filters(_t(["  MiXeD  "]), "text", [("trim", None), ("lowercase", None)])
    assert out["text"].to_pylist() == ["mixed"]


def test_unknown_filter_raises():
    with pytest.raises(ValueError, match="unknown filter"):
        apply_filters(_t(["x"]), "text", [("nope", None)])


def test_out_column_and_stage():
    fn = filters_stage("text", [("uppercase", None)], out_column="shout")
    out = fn(_t(["hi"]))
    assert out.column_names == ["text", "shout"]
    assert out["shout"].to_pylist() == ["HI"]


def test_registry_complete():
    assert set(FILTERS) == {"trim", "lowercase", "uppercase", "capitalize", "regex", "relurl"}


def test_relurl_filter():
    """utils.RelUrl analog: absolute stays, relative resolves, '' -> ''."""
    import pyarrow as pa

    from dataflowkit_ray.stages.scalars import f_relurl

    arr = pa.array(
        ["/a/b", "c?x=1", "http://other.io/z", "", None, "../up"],
        pa.string(),
    )
    out = f_relurl(arr, "http://example.com/dir/page.html").to_pylist()
    assert out == [
        "http://example.com/a/b",
        "http://example.com/dir/c?x=1",
        "http://other.io/z",
        "",
        "",
        "http://example.com/up",
    ]
