"""CEP pattern matching: an NFA over per-key token-event sequences.

The reference's extraction is a pattern match over a tree: ``divide``
finds the repeating structural block, then each field's CSS selector
chain matches descendants, first-match-per-block
(``/root/reference/scrape/scrape.go:447-517,28-85``; SURVEY.md §2.10).
The engine recasts it over token sequences:

* a **Pattern** is an ordered list of steps; each step is a predicate on
  one token (literal id / membership set / residue class) plus a
  ``max_gap`` — how many tokens may be skipped before the step matches
  (``max_gap=0`` = contiguous; a descendant-selector analog allows gaps).
* match semantics mirror ``.First()``: scanning left-to-right, either
  ``overlapping`` (every start position tried) or ``nonoverlapping``
  (after a match, scanning resumes past its end — the reference's
  block-at-a-time behavior).

Execution: a stateless ``map_batches`` stage when each row carries a full
sequence (a doc is a complete "page"); contiguous literal patterns run
fully vectorized via shifted numpy masks over the flattened token buffer.
General gap patterns use a compiled per-row scanner over numpy arrays.
Cross-batch partial matches (keyed event streams) keep NFA state in the
state store via ``runner.StreamingCEP``.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


@dataclass(frozen=True)
class Step:
    """One NFA step. Exactly one of literal/any_of/residue/predicate is set.

    ``predicate`` is the plugin hook (the reference's Action interface,
    ``/root/reference/fetch/actions.go:15-52``, as a CEP predicate): any
    picklable ``np.ndarray -> bool ndarray`` vectorized function."""

    literal: int | None = None
    any_of: tuple[int, ...] | None = None
    residue: tuple[int, int] | None = None  # (mod, rest): token % mod == rest
    predicate: object | None = None  # Callable[[np.ndarray], np.ndarray]
    max_gap: int = 0  # tokens allowed to skip BEFORE this step (first step: 0 ignored)

    def mask(self, tokens: np.ndarray) -> np.ndarray:
        if self.literal is not None:
            return tokens == self.literal
        if self.any_of is not None:
            return np.isin(tokens, np.asarray(self.any_of, dtype=tokens.dtype))
        if self.predicate is not None:
            out = np.asarray(self.predicate(tokens), dtype=bool)
            if out.shape != tokens.shape:
                raise ValueError("step predicate must return a mask of input shape")
            return out
        mod, rest = self.residue
        return (tokens % mod) == rest


@dataclass(frozen=True)
class Pattern:
    steps: tuple[Step, ...]
    mode: str = "overlapping"  # or "nonoverlapping" (first-match-per-block)

    def __post_init__(self):
        if not self.steps:
            raise ValueError("pattern needs >= 1 step")
        if self.mode not in ("overlapping", "nonoverlapping"):
            raise ValueError(f"bad mode {self.mode}")

    @property
    def contiguous(self) -> bool:
        return all(s.max_gap == 0 for s in self.steps[1:])


def _contiguous_starts(tokens: np.ndarray, pattern: Pattern) -> np.ndarray:
    """All start positions of a contiguous pattern — vectorized."""
    L = len(pattern.steps)
    n = len(tokens)
    if n < L:
        return np.empty(0, dtype=np.int64)
    ok = pattern.steps[0].mask(tokens[: n - L + 1])
    for j, step in enumerate(pattern.steps[1:], start=1):
        ok &= step.mask(tokens[j : n - L + 1 + j])
    return np.nonzero(ok)[0].astype(np.int64)


def _select_nonoverlapping(starts: np.ndarray, length: int) -> np.ndarray:
    """Greedy left-to-right selection of non-overlapping fixed-length matches."""
    keep = []
    next_free = -1
    for s in starts:
        if s >= next_free:
            keep.append(s)
            next_free = s + length
    return np.asarray(keep, dtype=np.int64)


def _scan_gaps(tokens: np.ndarray, pattern: Pattern) -> list[tuple[int, int]]:
    """General scanner for gap patterns: returns (start, end_exclusive) pairs.

    For each candidate start (first-step match), advance through steps
    taking the *earliest* token satisfying each step within its gap budget
    (deterministic leftmost-greedy semantics, the NFA's single accepting
    run).  Overlapping mode tries every start; nonoverlapping resumes past
    each match end.
    """
    first_mask = pattern.steps[0].mask(tokens)
    starts = np.nonzero(first_mask)[0]
    step_masks = [s.mask(tokens) for s in pattern.steps]
    out: list[tuple[int, int]] = []
    resume = 0
    for s in starts:
        if pattern.mode == "nonoverlapping" and s < resume:
            continue
        pos = s
        ok = True
        for j in range(1, len(pattern.steps)):
            gap = pattern.steps[j].max_gap
            lo, hi = pos + 1, min(pos + 1 + gap + 1, len(tokens))
            window = step_masks[j][lo:hi]
            hit = np.argmax(window) if window.any() else -1
            if hit < 0:
                ok = False
                break
            pos = lo + int(hit)
        if ok:
            out.append((int(s), pos + 1))
            resume = pos + 1
    return out


def match_pattern_batch(pattern: Pattern, carry: tuple[str, ...] = ("doc_id", "source", "event_seq")):
    """map_batches fn: token-stream batch -> match rows.

    Output schema: ``carry`` columns + (match_start:int32,
    match_end:int32).  One row per match, rows with no match emit nothing
    (the reference's skip-with-NotError on zero selector hits,
    ``scrape/scrape.go:75-77``).  ``carry`` lets byte-lean pipelines pass
    an int source id instead of the default string columns.
    """

    L = len(pattern.steps)

    def fn(batch: pa.Table) -> pa.Table:
        tokens = batch["tokens"]
        if isinstance(tokens, pa.ChunkedArray):
            tokens = tokens.combine_chunks()
        flat = tokens.flatten().to_numpy(zero_copy_only=False)
        offsets = tokens.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        offsets = offsets - offsets[0]

        row_ids: list[np.ndarray] = []
        starts_all: list[np.ndarray] = []
        ends_all: list[np.ndarray] = []

        if pattern.contiguous:
            # vectorize across the whole flattened buffer, then drop
            # matches straddling row boundaries
            g_starts = _contiguous_starts(flat, pattern)
            if len(g_starts):
                row_of = np.searchsorted(offsets, g_starts, side="right") - 1
                in_row = g_starts + L <= offsets[row_of + 1]
                g_starts, row_of = g_starts[in_row], row_of[in_row]
                if pattern.mode == "nonoverlapping" and len(g_starts):
                    sel = np.concatenate(
                        [
                            _select_nonoverlapping(g_starts[row_of == r], L)
                            for r in np.unique(row_of)
                        ]
                    )
                    row_of = np.searchsorted(offsets, sel, side="right") - 1
                    g_starts = sel
                row_ids.append(row_of)
                starts_all.append(g_starts - offsets[row_of])
                ends_all.append(g_starts - offsets[row_of] + L)
        else:
            # gapped patterns, vectorized over the whole flat buffer:
            # candidate starts advance through the steps with ONE
            # searchsorted per step (leftmost-token semantics == the
            # per-doc _scan_gaps scalar scanner, asserted in tests);
            # Python touches only the resulting MATCHES (sparse), never
            # every doc
            step_pos = [
                np.nonzero(s.mask(flat))[0].astype(np.int64) for s in pattern.steps
            ]
            pos = step_pos[0].copy()
            gstart = step_pos[0].copy()
            if len(pos):
                row_of = np.searchsorted(offsets, gstart, side="right") - 1
                row_end = offsets[row_of + 1]
                alive = np.ones(len(pos), dtype=bool)
                for j in range(1, L):
                    pj = step_pos[j]
                    if len(pj) == 0:
                        # a later step matches nothing in this batch —
                        # every candidate dies (indexing an empty array
                        # below would raise)
                        alive[:] = False
                        break
                    idx = np.searchsorted(pj, pos, side="right")
                    has = idx < len(pj)
                    nxt = np.where(
                        has, pj[np.minimum(idx, len(pj) - 1)], np.int64(1 << 62)
                    )
                    ok = (
                        has
                        & (nxt <= pos + pattern.steps[j].max_gap + 1)
                        & (nxt < row_end)
                    )
                    alive &= ok
                    pos = np.where(ok, nxt, pos)
                gs, ge, ro = gstart[alive], pos[alive] + 1, row_of[alive]
                if pattern.mode == "nonoverlapping" and len(gs):
                    # greedy left-to-right per row over candidates only
                    sel = np.zeros(len(gs), dtype=bool)
                    resume = -1
                    cur = -1
                    for i in range(len(gs)):
                        if ro[i] != cur:
                            cur = ro[i]
                            resume = -1
                        if gs[i] >= resume:
                            sel[i] = True
                            resume = ge[i]
                    gs, ge, ro = gs[sel], ge[sel], ro[sel]
                if len(gs):
                    row_ids.append(ro)
                    starts_all.append(gs - offsets[ro])
                    ends_all.append(ge - offsets[ro])

        if not row_ids:
            empty = {c: batch[c].slice(0, 0) for c in carry}
            empty["match_start"] = pa.array([], type=pa.int32())
            empty["match_end"] = pa.array([], type=pa.int32())
            return pa.table(empty)
        rows = np.concatenate(row_ids)
        starts = np.concatenate(starts_all)
        ends = np.concatenate(ends_all)
        idx = pa.array(rows)
        take = lambda col: (
            col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        ).take(idx)
        out = {c: take(batch[c]) for c in carry}
        out["match_start"] = pa.array(starts.astype(np.int32))
        out["match_end"] = pa.array(ends.astype(np.int32))
        return pa.table(out)

    return fn


def match_counts(ds, pattern: Pattern, batch_size: int | None = None):
    """Matches per doc: (doc_id, source, event_seq, n_matches) — docs with
    zero matches are absent (NotError-skip semantics).  Bucket aggregate:
    doc_id cardinality is the stream size."""
    from dataflowkit_ray.stages.agg import hash_agg

    matches = ds.map_batches(
        match_pattern_batch(pattern), batch_format="pyarrow", batch_size=batch_size
    )
    return hash_agg(
        matches,
        ("doc_id", "source", "event_seq"),
        [("match_start", "count", "n_matches")],
    )


@dataclass
class NFARun:
    """One in-flight partial match: next step to satisfy + gap budget."""

    step: int
    gap_left: int
    start_seq: int


class StreamingMatcher:
    """True multi-run NFA for keyed event streams (cross-batch mode).

    Token-at-a-time feed with the same leftmost-greedy semantics as the
    batch scanner; every token may both advance existing runs and start a
    new one.  The run list is the per-key state held in the state-store
    actor pool between micro-batches (picklable: plain dataclasses).
    """

    def __init__(self, pattern: Pattern, runs: list[NFARun] | None = None):
        self.pattern = pattern
        self.runs: list[NFARun] = runs or []

    def feed(self, token: int, seq: int) -> list[tuple[int, int]]:
        pat = self.pattern
        one = np.asarray([token])
        survivors: list[NFARun] = []
        completed: list[tuple[int, int]] = []
        for run in self.runs:
            if pat.steps[run.step].mask(one)[0]:
                nxt = run.step + 1
                if nxt == len(pat.steps):
                    completed.append((run.start_seq, seq + 1))
                else:
                    survivors.append(
                        NFARun(step=nxt, gap_left=pat.steps[nxt].max_gap, start_seq=run.start_seq)
                    )
            elif run.gap_left > 0:
                survivors.append(NFARun(run.step, run.gap_left - 1, run.start_seq))
            # else: gap budget exhausted -> run dies
        if pat.steps[0].mask(one)[0]:
            if len(pat.steps) == 1:
                completed.append((seq, seq + 1))
            else:
                survivors.append(
                    NFARun(step=1, gap_left=pat.steps[1].max_gap, start_seq=seq)
                )
        if completed:
            completed.sort()
            if pat.mode == "nonoverlapping":
                # emit earliest start only; all runs (which started before
                # this match's end) are inside it -> drop them
                self.runs = []
                return [completed[0]]
        self.runs = survivors
        return completed
