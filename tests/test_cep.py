"""CEP/NFA stage vs a brute-force python oracle (reference analog: the
selector-chain first-match semantics, SURVEY.md §2.10)."""

import numpy as np
import pyarrow as pa
import pytest

from dataflowkit_ray.stages.cep import (
    Pattern,
    Step,
    StreamingMatcher,
    match_pattern_batch,
)


def _batch(seqs):
    return pa.table(
        {
            "doc_id": pa.array([str(i) for i in range(len(seqs))]),
            "tokens": pa.array(seqs, type=pa.list_(pa.int32())),
            "n_tok": pa.array([len(s) for s in seqs], type=pa.int32()),
            "source": pa.array(["s"] * len(seqs)),
            "event_seq": pa.array(range(len(seqs)), type=pa.int64()),
        }
    )


def brute_force(seq, pattern):
    """Oracle: leftmost-greedy NFA scan, overlapping or not."""
    out = []
    resume = 0
    for s in range(len(seq)):
        if pattern.mode == "nonoverlapping" and s < resume:
            continue
        if not pattern.steps[0].mask(np.array([seq[s]]))[0]:
            continue
        pos, ok = s, True
        for j in range(1, len(pattern.steps)):
            gap = pattern.steps[j].max_gap
            nxt = None
            for p in range(pos + 1, min(pos + 2 + gap, len(seq))):
                if pattern.steps[j].mask(np.array([seq[p]]))[0]:
                    nxt = p
                    break
            if nxt is None:
                ok = False
                break
            pos = nxt
        if ok:
            out.append((s, pos + 1))
            resume = pos + 1
    return out


PATTERNS = [
    Pattern(steps=(Step(literal=3), Step(literal=3))),
    Pattern(steps=(Step(literal=3), Step(literal=3)), mode="nonoverlapping"),
    Pattern(steps=(Step(literal=1), Step(literal=2, max_gap=2), Step(literal=3, max_gap=1))),
    Pattern(steps=(Step(any_of=(1, 2)), Step(residue=(2, 0), max_gap=3))),
    Pattern(steps=(Step(residue=(5, 0)),)),
]


@pytest.mark.parametrize("pattern", PATTERNS)
def test_matches_equal_brute_force(pattern):
    rng = np.random.RandomState(42)
    seqs = [rng.randint(0, 6, size=rng.randint(0, 30)).tolist() for _ in range(50)]
    got = match_pattern_batch(pattern)(_batch(seqs))
    got_by_doc = {}
    for d, s, e in zip(
        got["doc_id"].to_pylist(),
        got["match_start"].to_pylist(),
        got["match_end"].to_pylist(),
    ):
        got_by_doc.setdefault(d, []).append((s, e))
    exp_by_doc = {
        str(i): bf for i, seq in enumerate(seqs) if (bf := brute_force(seq, pattern))
    }
    assert got_by_doc == exp_by_doc


def test_empty_batch_keeps_schema():
    out = match_pattern_batch(PATTERNS[0])(_batch([[1, 2], []]))
    assert out.num_rows == 0
    assert out.column_names == ["doc_id", "source", "event_seq", "match_start", "match_end"]


@pytest.mark.parametrize("pattern", PATTERNS)
def test_streaming_nfa_equivalent_to_batch(pattern):
    """Token-at-a-time StreamingMatcher must reproduce the batch scanner,
    including when the stream is cut at arbitrary batch boundaries (state
    carried across the cut — the cross-epoch CEP case)."""
    rng = np.random.RandomState(7)
    for trial in range(30):
        seq = rng.randint(0, 6, size=rng.randint(0, 40)).tolist()
        m = StreamingMatcher(pattern)
        stream_matches = []
        for i, tok in enumerate(seq):
            stream_matches.extend(m.feed(tok, i))
        assert stream_matches == brute_force(seq, pattern), (trial, seq)
        # cut in half, carry runs across the boundary
        m1 = StreamingMatcher(pattern)
        got = []
        cut = len(seq) // 2
        for i, tok in enumerate(seq[:cut]):
            got.extend(m1.feed(tok, i))
        m2 = StreamingMatcher(pattern, runs=m1.runs)
        for i, tok in enumerate(seq[cut:], start=cut):
            got.extend(m2.feed(tok, i))
        assert got == brute_force(seq, pattern)


def test_custom_predicate_step(ray_session):
    """Plugin predicate steps (the Action-interface analog): an arbitrary
    vectorized token predicate participates in the NFA."""
    import numpy as np

    from dataflowkit_ray.stages.cep import Pattern, Step, match_pattern_batch

    def is_even(tokens):
        return tokens % 2 == 0

    pat = Pattern(
        steps=(Step(predicate=is_even), Step(predicate=lambda t: t > 100, max_gap=1)),
        mode="overlapping",
    )
    t = pa.table(
        {
            "doc_id": ["d"],
            "source": ["s"],
            "event_seq": pa.array([0], pa.int64()),
            "tokens": pa.array([[2, 5, 200, 7, 4, 50, 101]], pa.list_(pa.int32())),
        }
    )
    out = match_pattern_batch(pat)(t)
    got = sorted(zip(out["match_start"].to_pylist(), out["match_end"].to_pylist()))
    # overlapping: every even token that can reach a >100 token within gap 1
    # starts a match — 2@0 -> 200@2; 4@4 -> 101@6; 50@5 -> 101@6
    assert got == [(0, 3), (4, 7), (5, 7)]


def test_custom_predicate_shape_validated():
    import numpy as np

    from dataflowkit_ray.stages.cep import Pattern, Step, _contiguous_starts

    bad = Step(predicate=lambda t: np.array([True]))
    with pytest.raises(ValueError, match="input shape"):
        bad.mask(np.array([1, 2, 3]))


def test_vectorized_gap_scan_equals_scalar_random():
    """The batch scanner's searchsorted advance must equal the per-doc
    scalar _scan_gaps on randomized token streams, patterns and modes."""
    import numpy as np

    from dataflowkit_ray.stages.cep import Pattern, Step, _scan_gaps

    rng = np.random.RandomState(11)
    for trial in range(40):
        n_docs = rng.randint(1, 12)
        seqs = [list(rng.randint(0, 5, rng.randint(0, 30))) for _ in range(n_docs)]
        L = rng.randint(1, 4)
        steps = [Step(literal=int(rng.randint(0, 5)))]
        for _ in range(L - 1):
            steps.append(
                Step(literal=int(rng.randint(0, 5)), max_gap=int(rng.randint(0, 4)))
            )
        mode = ["overlapping", "nonoverlapping"][trial % 2]
        pat = Pattern(steps=tuple(steps), mode=mode)
        got = match_pattern_batch(pat)(_batch(seqs))
        got_rows = sorted(
            zip(
                got["doc_id"].to_pylist(),
                got["match_start"].to_pylist(),
                got["match_end"].to_pylist(),
            )
        )
        exp_rows = []
        for r, seq in enumerate(seqs):
            for s, e in _scan_gaps(np.asarray(seq, dtype=np.int64), pat):
                exp_rows.append((str(r), s, e))
        assert got_rows == sorted(exp_rows), (trial, mode, seqs, steps)


def test_gapped_pattern_with_absent_later_step():
    """Regression: a later step matching NOTHING in the batch must yield
    zero matches, not an IndexError (empty step position array)."""
    pat = Pattern(steps=(Step(literal=1), Step(literal=9, max_gap=2)), mode="nonoverlapping")
    out = match_pattern_batch(pat)(_batch([[1, 2, 3], [1, 1, 2]]))
    assert len(out) == 0
