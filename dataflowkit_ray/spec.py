"""Declarative pipeline specs — the engine's user API.

The reference's whole user surface is one JSON ``Payload``
(``/root/reference/scrape/structure.go:31-76``): a collection name, a
request, extraction fields with filter chains, an output format, and a
paginator.  ``checkPayload`` validates it up front and rejects the job
before any work starts (``scrape/scrape.go:187-207``).

The engine mirrors that: :class:`PipelineSpec` is a plain dataclass tree
(JSON round-trippable), validated eagerly by :func:`validate_spec`, and
compiled to a ``ray.data`` pipeline by :func:`build_pipeline`.  The
recursive ``Field.Details`` of the reference maps to the ``join`` branch;
``Paginator`` maps to the window spec (SURVEY.md §1.2).
"""

from __future__ import annotations

import json
from dataclasses import asdict, dataclass, field

from dataflowkit_ray.errors import BadRequest
from dataflowkit_ray.stages.scalars import FILTERS


class SpecError(BadRequest, ValueError):
    """Invalid pipeline spec (the checkPayload analog) — a
    :class:`~dataflowkit_ray.errors.BadRequest`: never retryable."""


@dataclass
class SourceSpec:
    paths: list[str]
    format: str = "parquet"  # parquet | csv | json
    columns: list[str] | None = None
    tokenize: bool = True  # documents schema -> token stream


@dataclass
class FilterSpec:
    column: str
    chain: list[tuple[str, str | None]]
    out: str | None = None


@dataclass
class WindowSpec:
    kind: str = "tumbling"  # tumbling | sliding | session
    size: int = 32
    slide: int | None = None  # sliding only
    gap: int | None = None  # session only
    key: str = "source"
    clock: str = "event_seq"


@dataclass
class AggSpec:
    column: str
    fn: str  # sum | count | min | max | mean
    out: str


@dataclass
class StepSpec:
    literal: int | None = None
    any_of: list[int] | None = None
    residue: tuple[int, int] | None = None
    max_gap: int = 0


@dataclass
class PatternSpec:
    steps: list[StepSpec]
    mode: str = "nonoverlapping"


@dataclass
class JoinSpec:
    chunk_size: int = 16
    num_partitions: int = 16
    with_struct: bool = False


@dataclass
class DedupSpec:
    """Terminal dedup stage (training-data ops): runs on the RAW document
    stream (``source.tokenize=False``) and replaces the analytic tail —
    exclusive with pattern/join/window/aggregates."""

    kind: str = "exact"  # exact | minhash | ngram | simhash | cluster
    threshold: float = 0.8  # minhash/ngram Jaccard threshold
    max_hamming: int = 3  # simhash distance bound
    text_col: str = "text"
    id_col: str = "doc_id"
    df_cap: int = 512  # ngram only: shingle-universe df cap


@dataclass
class TextSpec:
    """Text-analysis terminal stage over the RAW document stream
    (``source.tokenize=False``), dispatching to the SAME stage builders
    the query registry exposes — no parallel implementation to drift:

    * stats       — words / distinct / stopword ratio / quality / lang
    * lang_id     — character-trigram language ID (profile argmax)
    * pii         — email / IPv4 / long-digit-run redaction
    * tokens      — whitespace, subword-regex and chars/4 token counts
    * quality     — Gopher-style repetition/format gates
    * fingerprint — FNV content hash per document
    * corpus      — the full corpus-prep composition (lang gate ->
      quality gate -> PII redact -> exact dedup -> token budget)
    """

    kind: str = "stats"


@dataclass
class PolicySpec:
    """Per-source policy broadcast (robots-config analog): the distinct-
    source config table loads once per actor; applies on the token
    stream (requires ``source.tokenize=True``)."""

    enabled: bool = True
    concurrency: int = 2


@dataclass
class ThrottleSpec:
    """Politeness rate cap (per-actor rows/sec; identity on data)."""

    rows_per_sec: float = 1000.0
    concurrency: int = 1


@dataclass
class AsofSpec:
    """As-of join branch: the current (left) stream picks up the most
    recent right row with ``right_on <= left_on`` per ``key``.  The right
    side is its own source read (column-pruned), so the spec covers the
    cookie-store / config-lookup shape end-to-end."""

    right_paths: list[str]
    key: str
    left_on: str
    right_on: str
    right_columns: list[str] | None = None


@dataclass
class RangeJoinSpec:
    """Interval (range) join stage: every source row joins each interval
    row whose CLOSED [lo, hi] contains ``value_col`` (timestamps vs
    maintenance windows, IPs vs CIDR ranges).  The intervals table is
    its own (small, broadcast-side) parquet read; the left stream probes
    a shipped elementary-segment index and never shuffles
    (``stages/join.range_join``)."""

    interval_paths: list[str]
    value_col: str
    lo_col: str = "lo"
    hi_col: str = "hi"
    interval_columns: list[str] | None = None


@dataclass
class HeavyHittersSpec:
    """Count-Min heavy-hitters terminal stage over the raw document text
    (``stages/sketch.cms_heavy_hitters``): top-k words by CMS estimate,
    two streaming passes, bounded depth x width sketch broadcast once."""

    k: int = 20
    depth: int = 4
    width: int = 8192


@dataclass
class PackSpec:
    """Sequence-packing manifest terminal (``stages/pack.pack_manifest``):
    per doc, its global token offset in the event-clock-ordered stream
    and the first/last fixed-length pack it occupies.  ``group_size``
    bounds the driver-side bucket-offset array (docs per bucket)."""

    seq_len: int = 2048
    group_size: int = 4096


@dataclass
class DecontaminateSpec:
    """Benchmark-decontamination terminal (``stages/dedup.decontaminate``):
    per source-stream doc, how many of its distinct word w-shingles
    occur anywhere in the benchmark corpus read from ``bench_paths``
    (broadcast once; the stream side probes row-locally, no exchange)."""

    bench_paths: list[str]
    w: int = 3
    text_col: str = "text"
    id_col: str = "doc_id"


@dataclass
class MixtureSampleSpec:
    """Per-source mixture sampling terminal (``stages/policy.mixture_sample``):
    keep each source at its own deterministic per-mille rate (a
    multiplicative 64-bit key hash — replay-identical, oracle-replayable)."""

    rates_pm: dict = field(default_factory=dict)
    default_pm: int = 0


@dataclass
class RelationalSpec:
    """Warehouse-analytics branch: the TPC-H-analog pipelines compiled
    from JSON.  ``source.paths[0]`` is the warehouse directory (tables
    ``lineitem``/``orders``/``customer`` resolved inside); the spec
    dispatches to the SAME pipeline builders the query registry uses, so
    a spec run is bit-identical to the direct call."""

    kind: str = "pricing_summary"  # pricing_summary | top_orders


@dataclass
class AnnSpec:
    """Similarity-search branch over an embeddings table
    (``source.paths[0]``): brute-force cosine top-k (broadcast query
    matrix) or the IVF scale path.  ``query_ids`` select the query rows
    by id from the same table (row-filtered read — only those rows touch
    the driver)."""

    query_ids: list[int]
    kind: str = "brute"  # brute | ivf
    k: int = 5
    n_centroids: int = 16
    n_probe: int | None = None  # ivf only; None = n_centroids (exact)


@dataclass
class QuantilesSpec:
    """Grouped-quantiles terminal stage: exact per-group order stats or
    the mergeable bottom-k-by-hash sketch (bounded shuffle state)."""

    keys: list[str]
    value_col: str
    quantiles: list[float] = field(default_factory=lambda: [0.5, 0.9])
    method: str = "exact"  # exact | sketch
    k: int = 4096  # sketch sample budget per group
    id_col: str = "event_seq"  # sketch sample key (deterministic hash basis)


@dataclass
class SinkSpec:
    path: str
    format: str = "parquet"  # parquet | csv | json | jsonl | xml | xlsx
    compression: str | None = None  # None | "gz" (csv/json*)
    exactly_once: bool = False  # parquet only: manifest-committed parts
    # parquet only: resumable hash-partitioned output — deterministic
    # partition per hash(partition_by) % n_parts with per-partition
    # done-markers; a re-run skips committed partitions
    partition_by: list[str] | None = None
    n_parts: int = 64
    resume: bool = True  # only read when partition_by is set


@dataclass
class StreamingSpec:
    """Micro-batch streaming execution of the spec — the runner knobs
    (epochs, offsets, shard count, session gap, exactly-once work dir)
    that were constructor/CLI-only before.  The reference's entire user
    surface is one declarative JSON payload, so the streaming path is
    reachable from the spec too.

    mode "windowed": ``runner.StreamingRunner`` — windowed metrics + CEP
    over the document token stream; window size/slide come from the
    spec's ``WindowSpec``, the CEP pattern from ``PatternSpec``.
    mode "events": ``event_runner.EventStreamRunner`` — session windows
    (``gap``) + cross-batch CEP over the keyed event stream.
    mode "dedup": ``dedup_runner.DedupStreamRunner`` — streaming exact
    dedup: seen-hash state sharded by content hash across epochs, final
    (doc_id, n_copies) flush equal to the batch operator.

    Streaming writes through its own exactly-once manifest sink under
    ``work_dir`` (checkpoint/resume included), so ``sink`` must be
    omitted."""

    work_dir: str
    mode: str = "windowed"  # windowed | events | dedup
    discover: str | None = None  # glob rescanned between epochs (arrivals)
    chunks_per_epoch: int = 2
    target_rows: int = 512
    n_shards: int | None = None
    gap: int | None = None  # events mode: session gap (clock units)
    max_epochs: int | None = None


@dataclass
class PipelineSpec:
    name: str
    source: SourceSpec
    filters: list[FilterSpec] = field(default_factory=list)
    window: WindowSpec | None = None
    aggregates: list[AggSpec] = field(default_factory=list)
    pattern: PatternSpec | None = None
    join: JoinSpec | None = None
    dedup: DedupSpec | None = None
    text: TextSpec | None = None
    policy: PolicySpec | None = None
    throttle: ThrottleSpec | None = None
    asof: AsofSpec | None = None
    range_join: RangeJoinSpec | None = None
    relational: RelationalSpec | None = None
    heavy_hitters: HeavyHittersSpec | None = None
    decontaminate: DecontaminateSpec | None = None
    sample: MixtureSampleSpec | None = None
    pack: PackSpec | None = None
    ann: AnnSpec | None = None
    quantiles: QuantilesSpec | None = None
    sink: SinkSpec | None = None
    streaming: StreamingSpec | None = None

    # ------------------------------------------------------- serialization

    def to_json(self) -> str:
        return json.dumps(asdict(self), indent=1, sort_keys=True)

    @staticmethod
    def from_json(s: str) -> "PipelineSpec":
        d = json.loads(s)
        return PipelineSpec(
            name=d["name"],
            source=SourceSpec(**d["source"]),
            filters=[
                FilterSpec(
                    column=f["column"],
                    chain=[tuple(c) for c in f["chain"]],
                    out=f.get("out"),
                )
                for f in d.get("filters", [])
            ],
            window=WindowSpec(**d["window"]) if d.get("window") else None,
            aggregates=[AggSpec(**a) for a in d.get("aggregates", [])],
            pattern=(
                PatternSpec(
                    steps=[StepSpec(**{**s, "residue": tuple(s["residue"]) if s.get("residue") else None}) for s in d["pattern"]["steps"]],
                    mode=d["pattern"].get("mode", "nonoverlapping"),
                )
                if d.get("pattern")
                else None
            ),
            join=JoinSpec(**d["join"]) if d.get("join") else None,
            dedup=DedupSpec(**d["dedup"]) if d.get("dedup") else None,
            text=TextSpec(**d["text"]) if d.get("text") else None,
            asof=AsofSpec(**d["asof"]) if d.get("asof") else None,
            range_join=(
                RangeJoinSpec(**d["range_join"]) if d.get("range_join") else None
            ),
            heavy_hitters=(
                HeavyHittersSpec(**d["heavy_hitters"])
                if d.get("heavy_hitters")
                else None
            ),
            policy=PolicySpec(**d["policy"]) if d.get("policy") else None,
            throttle=ThrottleSpec(**d["throttle"]) if d.get("throttle") else None,
            decontaminate=(
                DecontaminateSpec(**d["decontaminate"])
                if d.get("decontaminate")
                else None
            ),
            sample=(
                MixtureSampleSpec(**d["sample"]) if d.get("sample") else None
            ),
            pack=PackSpec(**d["pack"]) if d.get("pack") else None,
            relational=(
                RelationalSpec(**d["relational"]) if d.get("relational") else None
            ),
            ann=AnnSpec(**d["ann"]) if d.get("ann") else None,
            quantiles=(
                QuantilesSpec(**d["quantiles"]) if d.get("quantiles") else None
            ),
            sink=SinkSpec(**d["sink"]) if d.get("sink") else None,
            streaming=(
                StreamingSpec(**d["streaming"]) if d.get("streaming") else None
            ),
        )


_SOURCE_FORMATS = ("parquet", "csv", "json")
_SINK_FORMATS = ("parquet", "csv", "json", "jsonl", "xml", "xlsx")
_WINDOW_KINDS = ("tumbling", "sliding", "session")
_TEXT_KINDS = ("stats", "lang_id", "pii", "tokens", "quality", "fingerprint", "corpus")
_AGG_FNS = ("sum", "count", "min", "max", "mean")


def validate_spec(spec: PipelineSpec) -> None:
    """Eager validation — mirrors ``checkPayload``'s error taxonomy
    (empty name / no fields / bad selector / unsupported format,
    ``scrape/scrape.go:187-207``)."""
    if not spec.name:
        raise SpecError("empty pipeline name")
    if not spec.source.paths:
        raise SpecError("source needs >= 1 path")
    if spec.source.format not in _SOURCE_FORMATS:
        raise SpecError(
            f"unsupported source format {spec.source.format!r}; one of {_SOURCE_FORMATS}"
        )
    for f in spec.filters:
        if not f.chain:
            raise SpecError(f"filter on {f.column!r} has an empty chain")
        for name, _ in f.chain:
            if name not in FILTERS:
                raise SpecError(f"unknown filter {name!r}; known: {sorted(FILTERS)}")
    if spec.window:
        w = spec.window
        if w.kind not in _WINDOW_KINDS:
            raise SpecError(f"unknown window kind {w.kind!r}; one of {_WINDOW_KINDS}")
        if w.size <= 0:
            raise SpecError("window size must be > 0")
        if w.kind == "sliding" and (w.slide is None or w.slide <= 0):
            raise SpecError("sliding window needs slide >= 1")
        if w.kind == "session" and (w.gap is None or w.gap <= 0):
            raise SpecError("session window needs gap >= 1")
    if spec.aggregates and not spec.window:
        raise SpecError("aggregates need a window")
    for a in spec.aggregates:
        if a.fn not in _AGG_FNS:
            raise SpecError(f"unknown aggregate fn {a.fn!r}; one of {_AGG_FNS}")
    if spec.pattern:
        if not spec.pattern.steps:
            raise SpecError("pattern needs >= 1 step")
        if spec.pattern.mode not in ("overlapping", "nonoverlapping"):
            raise SpecError(f"bad pattern mode {spec.pattern.mode!r}")
        for s in spec.pattern.steps:
            set_kinds = sum(x is not None for x in (s.literal, s.any_of, s.residue))
            if set_kinds != 1:
                raise SpecError("each step sets exactly one of literal/any_of/residue")
    if spec.dedup:
        if spec.dedup.kind not in ("exact", "minhash", "ngram", "simhash", "cluster"):
            raise SpecError(f"unknown dedup kind {spec.dedup.kind!r}")
        if spec.dedup.kind in ("minhash", "ngram", "cluster") and not (
            0.0 < spec.dedup.threshold <= 1.0
        ):
            raise SpecError("dedup threshold must lie in (0, 1]")
        if spec.source.tokenize:
            raise SpecError("dedup runs on raw documents: set source.tokenize=false")
        if spec.pattern or spec.join or spec.window or spec.aggregates:
            raise SpecError("dedup is a terminal stage: no pattern/join/window/aggregates")
    if spec.text:
        if spec.text.kind not in _TEXT_KINDS:
            raise SpecError(
                f"unknown text kind {spec.text.kind!r}; one of {_TEXT_KINDS}"
            )
        if spec.source.tokenize:
            raise SpecError("text analysis runs on raw documents: set source.tokenize=false")
        if spec.pattern or spec.join or spec.window or spec.aggregates:
            raise SpecError("text is a terminal stage: no pattern/join/window/aggregates")
    if spec.policy and spec.policy.enabled and not spec.source.tokenize:
        raise SpecError("source policy applies to the token stream: source.tokenize=true")
    if spec.throttle and spec.throttle.rows_per_sec <= 0:
        raise SpecError("throttle rows_per_sec must be > 0")
    if spec.asof:
        if not spec.asof.right_paths:
            raise SpecError("asof needs >= 1 right path")
        if spec.asof.left_on == spec.asof.right_on:
            raise SpecError("asof left_on/right_on must be distinct column names")
    if spec.range_join:
        rj = spec.range_join
        if not rj.interval_paths:
            raise SpecError("range_join needs >= 1 interval path")
        if not rj.value_col:
            raise SpecError("range_join needs a value_col")
        if rj.lo_col == rj.hi_col:
            raise SpecError("range_join lo_col/hi_col must be distinct")
    if spec.heavy_hitters:
        hh = spec.heavy_hitters
        if hh.k <= 0 or hh.depth <= 0 or hh.width <= 0:
            raise SpecError("heavy_hitters k/depth/width must be > 0")
        if spec.source.tokenize:
            raise SpecError(
                "heavy_hitters counts raw words: set source.tokenize=false"
            )
    if spec.decontaminate:
        if not spec.decontaminate.bench_paths:
            raise SpecError("decontaminate needs >= 1 bench path")
        if spec.decontaminate.w <= 0:
            raise SpecError("decontaminate shingle width w must be > 0")
        if spec.source.tokenize:
            raise SpecError(
                "decontaminate shingles raw text: set source.tokenize=false"
            )
    if spec.pack:
        if spec.pack.seq_len <= 0 or spec.pack.group_size <= 0:
            raise SpecError("pack seq_len/group_size must be > 0")
        if not spec.source.tokenize:
            raise SpecError(
                "pack runs on the tokenized stream (needs n_tok/event_seq): "
                "set source.tokenize=true"
            )
    if spec.sample:
        if not spec.source.tokenize:
            raise SpecError(
                "sample runs on the tokenized stream (needs n_tok): "
                "set source.tokenize=true"
            )
        rates = dict(spec.sample.rates_pm)

        def _bad_rate(r) -> bool:
            try:
                return not (0 <= int(r) <= 1000)
            except (TypeError, ValueError):
                # non-numeric rate is an invalid SPEC (BadRequest/400),
                # not an internal error the job service would 500 on
                return True

        bad = {
            s: r
            for s, r in {**rates, "<default>": spec.sample.default_pm}.items()
            if _bad_rate(r)
        }
        if bad:
            raise SpecError(f"sample rates must be 0..1000 per-mille, got {bad}")
    _terminal = {
        "relational": spec.relational,
        "ann": spec.ann,
        "quantiles": spec.quantiles,
        "dedup": spec.dedup,
        "text": spec.text,
        "heavy_hitters": spec.heavy_hitters,
        "decontaminate": spec.decontaminate,
        "sample": spec.sample,
        "pack": spec.pack,
    }
    _set = [n for n, v in _terminal.items() if v]
    if len(_set) > 1:
        raise SpecError(f"branches {_set} are mutually exclusive terminal stages")
    if _set:
        # a terminal returns before the analytic tail is built — declared
        # tail stages would be SILENTLY ignored, so reject them (the
        # streaming validator's convention: reject, don't drop)
        _analytic = {
            "window": spec.window,
            "aggregates": spec.aggregates,
            "pattern": spec.pattern,
            "join": spec.join,
            "asof": spec.asof,
            "range_join": spec.range_join,
        }
        used = [n for n, v in _analytic.items() if v]
        if used:
            raise SpecError(
                f"{_set[0]} is a terminal stage: declared {used} would be "
                "silently ignored — remove them"
            )
    if spec.relational:
        if spec.relational.kind not in ("pricing_summary", "top_orders"):
            raise SpecError(f"unknown relational kind {spec.relational.kind!r}")
        if len(spec.source.paths) != 1:
            raise SpecError("relational source is ONE warehouse directory path")
        if spec.source.tokenize:
            raise SpecError("relational reads warehouse tables: set source.tokenize=false")
        if (
            spec.filters or spec.window or spec.aggregates or spec.pattern
            or spec.join or spec.asof or (spec.policy and spec.policy.enabled)
            or spec.throttle
        ):
            raise SpecError("relational is a self-contained branch: no other stages")
    if spec.ann:
        a = spec.ann
        if a.kind not in ("brute", "ivf"):
            raise SpecError(f"unknown ann kind {a.kind!r}")
        if not a.query_ids:
            raise SpecError("ann needs >= 1 query id")
        if a.k <= 0:
            raise SpecError("ann k must be > 0")
        if a.kind == "ivf" and a.n_centroids <= 0:
            raise SpecError("ivf needs n_centroids > 0")
        if a.kind == "ivf" and a.n_probe is not None and a.n_probe <= 0:
            raise SpecError("ivf n_probe must be > 0 (or None for exact)")
        if len(spec.source.paths) != 1:
            raise SpecError("ann source is ONE embeddings table path")
        if spec.source.tokenize:
            raise SpecError("ann reads an embeddings table: set source.tokenize=false")
        if (
            spec.filters or spec.window or spec.aggregates or spec.pattern
            or spec.join or spec.asof or (spec.policy and spec.policy.enabled)
            or spec.throttle
        ):
            raise SpecError("ann is a self-contained branch: no other stages")
    if spec.quantiles:
        q = spec.quantiles
        if q.method not in ("exact", "sketch"):
            raise SpecError(f"unknown quantiles method {q.method!r}")
        if not q.keys:
            raise SpecError("quantiles needs >= 1 key column")
        if not q.quantiles or not all(0.0 < x < 1.0 for x in q.quantiles):
            raise SpecError("quantiles must all lie in (0, 1)")
        if q.method == "sketch" and q.k <= 0:
            raise SpecError("quantile sketch k must be > 0")
        if spec.window or spec.aggregates or spec.pattern or spec.join:
            raise SpecError("quantiles is a terminal stage: no window/aggregates/pattern/join")
    if spec.sink and spec.sink.format not in _SINK_FORMATS:
        raise SpecError(
            f"unsupported sink format {spec.sink.format!r}; one of {_SINK_FORMATS}"
        )
    if spec.sink and spec.sink.exactly_once and spec.sink.format != "parquet":
        raise SpecError("exactly_once sink requires parquet")
    if spec.sink and spec.sink.compression not in (None, "gz"):
        raise SpecError(f"unsupported compression {spec.sink.compression!r}")
    if spec.sink and spec.sink.partition_by is not None:
        if spec.sink.format != "parquet":
            raise SpecError("partition_by sink requires parquet")
        if spec.sink.exactly_once:
            raise SpecError(
                "partition_by and exactly_once are different sink disciplines; set one"
            )
        if not spec.sink.partition_by:
            raise SpecError("partition_by needs >= 1 key column")
        if spec.sink.n_parts <= 0:
            raise SpecError("sink n_parts must be > 0")
    if spec.streaming:
        st = spec.streaming
        if st.mode not in ("windowed", "events", "dedup"):
            raise SpecError(f"unknown streaming mode {st.mode!r}")
        if st.mode == "dedup" and (spec.window or spec.pattern):
            raise SpecError("dedup streaming takes no window/pattern stages")
        if not st.work_dir:
            raise SpecError("streaming needs a work_dir")
        if st.chunks_per_epoch <= 0 or st.target_rows <= 0:
            raise SpecError("streaming chunks_per_epoch/target_rows must be > 0")
        if spec.sink:
            raise SpecError(
                "streaming writes its own exactly-once sink under work_dir; omit sink"
            )
        if (
            spec.dedup or spec.text or spec.asof or spec.join
            or spec.relational or spec.ann or spec.quantiles
            or spec.heavy_hitters or spec.decontaminate or spec.sample
            or spec.pack
        ):
            raise SpecError("streaming covers window/pattern stages only")
        if (
            spec.filters
            or spec.aggregates
            or (spec.policy and spec.policy.enabled)
            or spec.throttle
        ):
            # reject rather than silently ignore: the streaming runners
            # execute a fixed window+pattern stage-set
            raise SpecError(
                "streaming covers window/pattern stages only; "
                "filters/aggregates/policy/throttle are batch-spec stages"
            )
        if st.mode in ("windowed", "dedup") and st.gap is not None:
            raise SpecError(f"gap is an events-mode knob; {st.mode} mode ignores it")
        if st.mode == "windowed" and spec.window and spec.window.kind == "session":
            raise SpecError(
                "windowed streaming supports tumbling/sliding; use mode=events for sessions"
            )
        if st.mode == "events" and st.gap is not None and st.gap <= 0:
            raise SpecError("events streaming gap must be > 0")


def build_pipeline(spec: PipelineSpec):
    """Compile a validated spec to a lazy ``ray.data`` pipeline.

    Returns the final Dataset; if ``spec.sink`` is set the caller runs
    :func:`run_pipeline` to execute + write instead."""
    import ray.data

    from dataflowkit_ray.stages.cep import Pattern, Step, match_pattern_batch
    from dataflowkit_ray.stages.scalars import filters_stage
    from dataflowkit_ray.stages.windows import (
        assign_sessions,
        assign_sliding,
        assign_tumbling,
    )
    from dataflowkit_ray.tokenize import tokenize_documents

    validate_spec(spec)

    src = spec.source

    if spec.relational:
        # dispatch to the SAME builders the query registry exposes — a
        # spec run is the direct call (no parallel implementation to
        # drift)
        from dataflowkit_ray.pipelines.relational import RELATIONAL_QUERIES

        qname = {
            "pricing_summary": "lineitem_agg",
            "top_orders": "top_orders",
        }[spec.relational.kind]
        return RELATIONAL_QUERIES[qname](src.paths[0])

    if spec.ann:
        import numpy as np
        import pyarrow.parquet as pq

        from dataflowkit_ray.stages.ann import brute_topk, ivf_centroids, ivf_topk
        from dataflowkit_ray.tokenize import blocks_for

        a = spec.ann
        path = src.paths[0]
        qt = pq.read_table(path, filters=[("vec_id", "in", list(a.query_ids))])
        qv = np.asarray(qt["embedding"].to_pylist(), dtype=np.float64)
        qi = np.asarray(qt["vec_id"].to_pylist(), dtype=np.int64)
        emb = ray.data.read_parquet(path, override_num_blocks=blocks_for(path))
        if a.kind == "brute":
            return brute_topk(emb, qv, qi, k=a.k)
        n_rows = pq.read_metadata(path).num_rows
        cent = ivf_centroids(emb, n_centroids=a.n_centroids, n_rows=n_rows)
        return ivf_topk(
            emb, qv, qi, cent, k=a.k,
            n_probe=a.n_probe if a.n_probe is not None else len(cent),
        )

    def read_source():
        if src.format == "parquet":
            from dataflowkit_ray.tokenize import blocks_for

            # volume-derived block count (sum over paths): Ray's
            # CPU-derived default over-fragments small tables and every
            # downstream sort then coordinates near-empty partitions /
            # emits zero-column blocks (the measured r1 pitfall)
            try:
                # directory / glob paths have no single parquet footer —
                # fall back to Ray's own block sizing for those
                nb = min(sum(blocks_for(p) for p in src.paths), 512)
            except Exception:
                nb = None
            out = ray.data.read_parquet(
                src.paths, columns=src.columns, override_num_blocks=nb
            )
        elif src.format == "csv":
            out = ray.data.read_csv(src.paths)
        else:
            out = ray.data.read_json(src.paths)
        if src.columns and src.format != "parquet":
            out = out.select_columns(src.columns)
        return out

    # source catalog for the policy stage, computed ONCE even when the
    # row-stage chain is built twice (heavy_hitters' second pass) — a
    # pruned metadata-scale read; deriving it via token_ds.unique()
    # would re-execute the read+tokenize lineage a second time (the
    # measured branched-lineage pitfall)
    policy_srcs = None
    if spec.policy and spec.policy.enabled and src.format == "parquet":
        policy_srcs = ray.data.read_parquet(src.paths, columns=["source"]).unique(
            "source"
        )

    def prepare():
        """The row-stage chain every terminal consumes: read -> tokenize
        -> policy -> throttle -> filters.  A closure (not a Dataset)
        because a Dataset lineage is single-consume — two-pass terminals
        like heavy_hitters call this twice and each pass re-applies the
        SAME declared stages (a spec's filters apply to its terminal's
        input, whichever terminal that is)."""
        out = read_source()
        if src.tokenize:
            out = out.map_batches(tokenize_documents, batch_format="pyarrow")
        if spec.policy and spec.policy.enabled:
            from dataflowkit_ray.stages.policy import source_policy_filter

            out = source_policy_filter(
                out, sources=policy_srcs, concurrency=spec.policy.concurrency
            )
        if spec.throttle:
            from dataflowkit_ray.stages.policy import throttle as _throttle

            out = _throttle(
                out, spec.throttle.rows_per_sec,
                concurrency=spec.throttle.concurrency,
            )
        for f in spec.filters:
            out = out.map_batches(
                filters_stage(f.column, list(f.chain), f.out),
                batch_format="pyarrow",
            )
        return out

    ds = prepare()

    if spec.heavy_hitters:
        from dataflowkit_ray.stages.sketch import cms_heavy_hitters

        hh = spec.heavy_hitters
        # pass 2 rebuilds the full prepared chain (same two-read shape
        # as the query registry's q_heavy_hitters) so declared policy/
        # throttle/filter stages apply to BOTH passes
        return cms_heavy_hitters(
            ds, prepare(), k=hh.k, depth=hh.depth, width=hh.width
        )

    if spec.decontaminate:
        from dataflowkit_ray.stages.dedup import decontaminate

        dc = spec.decontaminate
        bench = ray.data.read_parquet(
            dc.bench_paths, columns=[dc.id_col, dc.text_col]
        )
        return decontaminate(
            ds, bench, text_col=dc.text_col, id_col=dc.id_col, w=dc.w
        )

    if spec.pack:
        from dataflowkit_ray.stages.pack import pack_manifest

        return pack_manifest(
            ds, seq_len=spec.pack.seq_len, group_size=spec.pack.group_size
        )

    if spec.sample:
        from dataflowkit_ray.stages.policy import mixture_sample

        return mixture_sample(
            ds, dict(spec.sample.rates_pm), default_pm=spec.sample.default_pm
        )

    if spec.dedup:
        from dataflowkit_ray.stages.dedup import (
            exact_dedup,
            minhash_lsh_pairs,
            ngram_jaccard_pairs,
            simhash_pairs,
        )


        dd = spec.dedup
        if dd.kind == "exact":
            return exact_dedup(ds, text_col=dd.text_col, id_col=dd.id_col)
        if dd.kind == "minhash":
            return minhash_lsh_pairs(
                ds, threshold=dd.threshold, text_col=dd.text_col, id_col=dd.id_col
            )
        if dd.kind == "ngram":
            return ngram_jaccard_pairs(
                ds, threshold=dd.threshold, text_col=dd.text_col,
                id_col=dd.id_col, df_cap=dd.df_cap,
            )
        if dd.kind == "cluster":
            from dataflowkit_ray.stages.dedup import dedup_clusters

            pairs = minhash_lsh_pairs(
                ds, threshold=dd.threshold, text_col=dd.text_col, id_col=dd.id_col
            )
            return dedup_clusters(pairs, ds, id_col=dd.id_col)
        return simhash_pairs(
            ds, max_hamming=dd.max_hamming, text_col=dd.text_col, id_col=dd.id_col
        )

    if spec.text:
        from dataflowkit_ray.pipelines.corpus import corpus_prep
        from dataflowkit_ray.stages import textstats as _ts

        return {
            "stats": _ts.text_stats,
            "lang_id": _ts.lang_id,
            "pii": _ts.redact_pii,
            "tokens": _ts.token_counts,
            "quality": _ts.repetition_filter,
            "fingerprint": _ts.doc_fingerprints,
            "corpus": corpus_prep,
        }[spec.text.kind](ds)


    if spec.quantiles:
        from dataflowkit_ray.stages.sketch import grouped_quantiles, quantile_sketch

        q = spec.quantiles
        if q.method == "exact":
            return grouped_quantiles(
                ds, tuple(q.keys), q.value_col, tuple(q.quantiles)
            )
        return quantile_sketch(
            ds, tuple(q.keys), q.value_col, tuple(q.quantiles),
            k=q.k, id_col=q.id_col,
        )

    if spec.asof:
        from dataflowkit_ray.stages.asof import asof_join

        a = spec.asof
        right = ray.data.read_parquet(a.right_paths, columns=a.right_columns)
        ds = asof_join(
            ds, right, key=a.key, left_on=a.left_on, right_on=a.right_on
        )

    if spec.range_join:
        import pyarrow as pa
        import pyarrow.parquet as pq

        from dataflowkit_ray.stages.join import range_join

        rj = spec.range_join
        cols = rj.interval_columns
        ivs = pa.concat_tables(
            [pq.read_table(p, columns=cols) for p in rj.interval_paths]
        )
        ds = range_join(
            ds, ivs, rj.value_col, lo_col=rj.lo_col, hi_col=rj.hi_col
        )

    if spec.pattern:
        pat = _pattern_from_spec(spec.pattern)
        ds = ds.map_batches(match_pattern_batch(pat), batch_format="pyarrow")

    if spec.join:
        from dataflowkit_ray.stages.join import explode_chunks, join_details

        child = ds.map_batches(
            explode_chunks(spec.join.chunk_size), batch_format="pyarrow"
        )
        ds = join_details(
            ds,
            child,
            num_partitions=spec.join.num_partitions,
            with_struct=spec.join.with_struct,
        )

    if spec.window:
        w = spec.window
        if w.kind == "tumbling":
            ds = ds.map_batches(
                lambda b, size=w.size, c=w.clock: assign_tumbling(b, size, c),
                batch_format="pyarrow",
            )
        elif w.kind == "sliding":
            ds = ds.map_batches(
                lambda b, size=w.size, sl=w.slide, c=w.clock: assign_sliding(
                    b, size, sl, c
                ),
                batch_format="pyarrow",
            )
        else:
            ds = assign_sessions(ds, gap=w.gap, key_col=w.key, clock_col=w.clock)

    if spec.aggregates:
        from dataflowkit_ray.stages.agg import hash_agg

        w = spec.window
        wcol = "session_id" if w.kind == "session" else "window_id"
        ds = hash_agg(
            ds,
            (w.key, wcol),
            [(a.column, a.fn, a.out) for a in spec.aggregates],
        )
    return ds


def _pattern_from_spec(ps: PatternSpec):
    from dataflowkit_ray.stages.cep import Pattern, Step

    return Pattern(
        steps=tuple(
            Step(
                literal=s.literal,
                any_of=tuple(s.any_of) if s.any_of else None,
                residue=tuple(s.residue) if s.residue else None,
                max_gap=s.max_gap,
            )
            for s in ps.steps
        ),
        mode=ps.mode,
    )


def run_streaming(spec: PipelineSpec) -> dict:
    """Execute a spec through the micro-batch streaming runners
    (exactly-once sink + checkpoint under ``streaming.work_dir``).
    Called by :func:`run_pipeline` when ``spec.streaming`` is set."""
    import time

    validate_spec(spec)
    st = spec.streaming
    t0 = time.perf_counter()
    if st.mode == "dedup":
        from dataflowkit_ray.dedup_runner import DedupStreamRunner

        r = DedupStreamRunner(
            spec.source.paths,
            st.work_dir,
            n_shards=st.n_shards or 4,
            chunks_per_epoch=st.chunks_per_epoch,
            target_rows=st.target_rows,
            discover=st.discover,
        )
    elif st.mode == "windowed":
        from dataflowkit_ray.runner import StreamingRunner

        w = spec.window
        r = StreamingRunner(
            spec.source.paths,
            st.work_dir,
            window_size=w.size if w else None,
            slide=(w.slide if w and w.kind == "sliding" else None),
            n_shards=st.n_shards,
            pattern=_pattern_from_spec(spec.pattern) if spec.pattern else None,
            chunks_per_epoch=st.chunks_per_epoch,
            target_rows=st.target_rows,
            discover=st.discover,
        )
    else:
        from dataflowkit_ray.event_runner import EventStreamRunner

        pattern = None
        if spec.pattern:
            pattern = (
                [
                    {k: v for k, v in asdict(s).items() if v is not None}
                    for s in spec.pattern.steps
                ],
                spec.pattern.mode,
            )
        kw = {}
        if st.gap is not None:
            kw["gap"] = st.gap
        r = EventStreamRunner(
            spec.source.paths,
            st.work_dir,
            n_shards=st.n_shards or 4,
            pattern=pattern,
            chunks_per_epoch=st.chunks_per_epoch,
            target_rows=st.target_rows,
            discover=st.discover,
            **kw,
        )
    summary = r.run(st.max_epochs)
    return {
        "pipeline": spec.name,
        "mode": st.mode,
        "work_dir": st.work_dir,
        "took_sec": round(time.perf_counter() - t0, 3),
        **summary,
    }


def run_pipeline(spec: PipelineSpec):
    """Execute a spec end-to-end, writing through its sink.  Returns a
    summary dict (the reference returns {Task ID, Requests, Took...},
    ``scrape/scrape.go:257-263``).  A spec with ``streaming`` set runs
    through the micro-batch runners instead (:func:`run_streaming`).
    """
    import time

    from dataflowkit_ray.sinks.encoders import write_sink

    if spec.streaming:
        return run_streaming(spec)

    t0 = time.perf_counter()
    ds = build_pipeline(spec)
    if spec.sink.partition_by is not None:
        from dataflowkit_ray.sinks.resumable import write_partitioned

        summary = write_partitioned(
            ds,
            spec.sink.path,
            list(spec.sink.partition_by),
            n_parts=spec.sink.n_parts,
            resume=spec.sink.resume,
        )
        return {
            "pipeline": spec.name,
            "rows": summary["rows"],
            "partitions_written": summary["processed"],
            "partitions_skipped": summary["skipped"],
            "sink": spec.sink.path,
            "format": spec.sink.format,
            "took_sec": round(time.perf_counter() - t0, 3),
        }
    rows = write_sink(ds, spec.sink)
    return {
        "pipeline": spec.name,
        "rows": rows,
        "sink": spec.sink.path,
        "format": spec.sink.format,
        "took_sec": round(time.perf_counter() - t0, 3),
    }


def pipeline_id(spec: PipelineSpec) -> str:
    """Deterministic content-hash id of a spec — the InitUID analog
    (``/root/reference/scrape/scrape.go:134-155``: canonicalize payload,
    hash, use as job id for checkpoint naming + idempotent sinks).

    Volatile fields (sink path) are stripped before hashing, mirroring
    the reference's canonicalization; same logical job -> same id."""
    import copy

    from dataflowkit_ray.config import fnv1a64

    d = json.loads(spec.to_json())
    if d.get("sink"):
        d["sink"] = {k: v for k, v in d["sink"].items() if k != "path"}
    if d.get("streaming"):
        # work_dir is a scratch/output location, volatile like sink.path
        d["streaming"] = {
            k: v for k, v in d["streaming"].items() if k != "work_dir"
        }
    canon = json.dumps(d, sort_keys=True, separators=(",", ":"))
    return f"{fnv1a64(canon.encode()):016x}"


def main(argv: list[str] | None = None) -> dict:
    """CLI: ``python -m dataflowkit_ray.spec job.json`` — the engine's
    analog of POSTing a JSON payload to the reference's parse daemon
    (``/root/reference/parse/server.go``): validate the spec, run it
    (batch sink or streaming runners), print the run summary as one JSON
    line."""
    import sys

    args = argv if argv is not None else sys.argv[1:]
    if not args:
        print("usage: python -m dataflowkit_ray.spec <job.json>", file=sys.stderr)
        raise SystemExit(2)
    with open(args[0]) as f:
        spec = PipelineSpec.from_json(f.read())
    summary = run_pipeline(spec)
    print(json.dumps(summary))
    return summary


if __name__ == "__main__":
    import ray

    owns = not ray.is_initialized()  # driver contract: never re-init
    if owns:
        ray.init(address="local", include_dashboard=False)
    try:
        main()
    finally:
        if owns:
            ray.shutdown()
