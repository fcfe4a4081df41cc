"""D1/D2: the span-structure validator stage.

A callable CLASS for ``map_batches(SpanValidator, concurrency=N,
batch_format="pyarrow", zero_copy_batch=True)`` — an actor pool: the
broadcast asset key-set is fetched from the object store ONCE per actor
in ``__init__`` (never per batch), per the stateful-stage rule.

Per batch (zero-copy Arrow):
1. vectorized prechecks first — span-count/byte-size limits, offset
   monotonicity (SpanOrder), media_ref membership against the broadcast
   asset set (RefIntegrity), unknown kinds — all numpy/pyarrow kernels;
2. the recursive-descent grammar walk (reference semantics: JSON/JSONC/
   CSV/TOML/YAML/XML parsers from functions/) runs ONLY on spans whose
   kind is a grammar kind and which survived the prechecks;
3. optional round-trip check (D2): parse -> serialize -> reparse ->
   deep-compare (the reference's property-test invariant,
   tests/property_tests.rs:121-156, applied per span);
4. violations + docmeta are written to per-partition parquet files by
   the stage itself (atomic tmp+rename) — the resumable-sink pattern:
   blocks align with input partition files, so the driver can commit a
   partition in the manifest as soon as its expected row count has
   streamed through;
5. the stage RETURNS only tiny per-partition partial rows (counts,
   kind histogram, t-digest / HLL sketch bytes) for the verdict and
   drift phases — the heavy input stream never leaves the stage.

Scale notes: the grammar walk is the workload's irreducible per-payload
compute (same as the reference's single-doc parse); throughput comes
from Ray parallelism. Everything around it is vectorized so the stage
wall-time is parser-bound, not plumbing-bound.
"""

from __future__ import annotations

import json as _json
import os
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..functions import errors as E
from ..functions.convert import (
    serialize_csv,
    serialize_json,
    serialize_toml,
    serialize_xml,
    serialize_yaml,
    xml_to_value,
)
from ..functions.csv_parser import parse_csv
from ..functions.errors import ParseError
from ..functions.json_parser import parse_json, parse_jsonc
from ..functions.sketches import HyperLogLog, TDigest
from ..functions.toml_parser import parse_toml
from ..functions.xml_parser import parse_xml
from ..functions.yaml_parser import parse_yaml
from ..schema import GRAMMAR_KINDS, MEDIA_KINDS, SPAN_KINDS, VIOLATIONS_SCHEMA
from ..value import values_equal

DEFAULT_MAX_SPAN_BYTES = 10 * 1024 * 1024  # reference default max_size

_PARSERS = {
    "json": parse_json,
    "jsonc": parse_jsonc,
    "csv": parse_csv,
    "toml": parse_toml,
    "yaml": parse_yaml,
    "xml": parse_xml,
}

_SERIALIZERS = {
    "json": serialize_json,
    "jsonc": serialize_json,
    "csv": serialize_csv,
    "toml": serialize_toml,
    "yaml": serialize_yaml,
}

PARTIALS_SCHEMA = pa.schema(
    [
        ("partition_id", pa.int32()),
        ("n_docs", pa.int64()),
        ("n_spans", pa.int64()),
        ("n_violations", pa.int64()),
        ("checks_failed", pa.string()),
        ("kind_hist", pa.string()),
        ("textlen_tdigest", pa.binary()),
        ("spans_tdigest", pa.binary()),
        ("doc_hll", pa.binary()),
        ("ref_hll", pa.binary()),
        # uint64 doc_id hashes (tobytes), present only when the driver
        # opted in (docmeta small enough for the driver dup path): lets
        # phase 2a count dup candidates from the partials stream with no
        # docmeta re-read. Empty at 10^12 scale (distributed dup path).
        ("doc_hashes", pa.binary()),
    ]
)

DOCMETA_SCHEMA = pa.schema(
    [
        ("partition_id", pa.int32()),
        ("doc_id", pa.string()),
        ("doc_hash", pa.int64()),  # hash64(doc_id): dup detection scans
        # this int column instead of the strings (phase 2a fast path)
        ("n_spans", pa.int32()),
        ("n_violations", pa.int32()),
    ]
)


def validate_payloads(
    kinds: np.ndarray,
    texts: np.ndarray,
    idxs: np.ndarray,
    round_trip: bool,
    parser_configs: dict | None = None,
):
    """Grammar walk over the selected spans; yields (flat_idx, check_id,
    detail, line, col) — grammar errors carry the parser's 1-based
    position (reference Pos, error.rs:8-44); round-trip violations carry
    (0, 0) since their position would be in the RESERIALIZED text, not
    the input. ``parser_configs`` maps kind -> per-format Config object
    (JsonConfig/TomlConfig/... — the reference's resource-limit guards,
    json/parser.rs:14-23, csv/parser.rs:8-11, exposed per job per
    SURVEY §1.2)."""
    cfgs = parser_configs or {}
    out = []
    for i in idxs:
        kind = kinds[i]
        parse = _PARSERS[kind]
        cfg = cfgs.get(kind)
        try:
            value = parse(texts[i], cfg) if cfg is not None else parse(texts[i])
        except ParseError as e:
            out.append((i, e.check_id, e.message, e.line, e.col))
            continue
        except RecursionError:
            out.append((i, E.MAX_DEPTH_EXCEEDED, "recursion limit", 0, 0))
            continue
        if round_trip:
            if kind == "xml":
                # D2 for XML (ref convert.rs:492-659 semantics): reserialize
                # the parsed document, reparse, and compare at the VALUE
                # level (xml_to_value merges contiguous text runs, so a
                # comment splitting a text node — which the doc model keeps
                # as two str children — doesn't false-positive; whitespace-
                # only text is dropped by the parser on both legs).
                try:
                    back = parse(serialize_xml(value))
                except ParseError as e:
                    out.append((i, E.ROUND_TRIP, f"reparse failed: {e.check_id}", 0, 0))
                    continue
                if not values_equal(xml_to_value(back), xml_to_value(value)):
                    out.append((i, E.ROUND_TRIP, "value mismatch after round-trip", 0, 0))
                continue
            ser = _SERIALIZERS[kind]
            try:
                back = parse(ser(value))
            except ParseError as e:
                out.append((i, E.ROUND_TRIP, f"reparse failed: {e.check_id}", 0, 0))
                continue
            if not values_equal(back, value):
                out.append((i, E.ROUND_TRIP, "value mismatch after round-trip", 0, 0))
    return out


def build_parser_configs(
    *,
    max_depth: int | None = None,
    allow_comments: bool = False,
    csv_delimiter: str | None = None,
) -> dict | None:
    """Job-level helper: build the kind -> Config map from the common
    per-run knobs (reference Config guards as constraint PARAMETERS,
    SURVEY §1.2). Returns None when everything is default."""
    if max_depth is None and not allow_comments and csv_delimiter is None:
        return None
    from ..functions.csv_parser import CsvConfig
    from ..functions.json_parser import JsonConfig
    from ..functions.toml_parser import TomlConfig
    from ..functions.yaml_parser import YamlConfig

    cfgs: dict = {}
    jkw = {}
    if max_depth is not None:
        jkw["max_depth"] = max_depth
    if allow_comments:
        jkw["allow_comments"] = True
        jkw["allow_trailing_commas"] = True
    if jkw:
        cfgs["json"] = JsonConfig(**jkw)
        cfgs["jsonc"] = JsonConfig(
            **{**jkw, "allow_comments": True, "allow_trailing_commas": True}
        )
    if max_depth is not None:
        cfgs["toml"] = TomlConfig(max_depth=max_depth)
        cfgs["yaml"] = YamlConfig(max_depth=max_depth)
    if csv_delimiter is not None:
        cfgs["csv"] = CsvConfig(delimiter=csv_delimiter)
    return cfgs


class SpanValidator:
    """map_batches actor: validates one Arrow batch of spans rows."""

    def __init__(
        self,
        assets_ref=None,
        out_dir: str | None = None,
        round_trip: bool = False,
        max_span_bytes: int = DEFAULT_MAX_SPAN_BYTES,
        assets_sorted: bool = False,
        quarantine: bool = False,
        parser_configs: dict | None = None,
        carry_doc_hashes: bool = False,
    ):
        # broadcast key set: ray.put once on the driver, ray.get here
        # (zero-copy plasma read — never re-shipped per batch)
        self.assets: np.ndarray | None = None
        if assets_ref is not None:
            import ray

            assets = ray.get(assets_ref) if not isinstance(assets_ref, np.ndarray) else assets_ref
            self.assets = assets if assets_sorted else np.sort(np.asarray(assets, dtype=object))
        self.out_dir = out_dir
        self.round_trip = round_trip
        self.max_span_bytes = max_span_bytes
        self.valid_kinds = frozenset(SPAN_KINDS)
        self.quarantine = quarantine
        self.parser_configs = parser_configs
        self.carry_doc_hashes = carry_doc_hashes
        if out_dir:
            os.makedirs(os.path.join(out_dir, "violations"), exist_ok=True)
            os.makedirs(os.path.join(out_dir, "docmeta"), exist_ok=True)
            if quarantine:
                os.makedirs(os.path.join(out_dir, "quarantine"), exist_ok=True)

    # -- core ------------------------------------------------------------
    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return PARTIALS_SCHEMA.empty_table()
        doc_ids = pc.fill_null(batch["doc_id"].combine_chunks(), "")
        spans = batch["spans"].combine_chunks()
        pids = batch["partition_id"].combine_chunks().to_numpy()

        list_offsets = spans.offsets.to_numpy()  # n+1
        sv = spans.values
        if list_offsets[0] != 0 or len(sv) != list_offsets[-1]:
            # sliced ListArray: values cover the whole parent buffer and
            # offsets don't start at 0 — rebase so flat indices align
            base = int(list_offsets[0])
            sv = sv.slice(base, int(list_offsets[-1]) - base)
            list_offsets = list_offsets - base
        # null normalization (nulls never appear in our own layout but can
        # in foreign data): null kind/text/media_ref read as "" — a null
        # kind is then UnknownKind, a null grammar payload parses as the
        # empty document (a deterministic grammar error), a null media_ref
        # fails RefIntegrity; a null offset sorts as -1. The oracle
        # applies the SAME normalization.
        kind_np = pc.fill_null(sv.field("kind"), "").to_numpy(zero_copy_only=False)
        text_arr = pc.fill_null(sv.field("text"), "")
        media_np = pc.fill_null(sv.field("media_ref"), "").to_numpy(zero_copy_only=False)
        off_np = pc.fill_null(sv.field("offset"), -1).to_numpy()
        n_rows = batch.num_rows
        n_spans_total = len(kind_np)
        # row index of each flattened span
        row_of = np.repeat(np.arange(n_rows), np.diff(list_offsets))
        text_bytes = pc.binary_length(pc.cast(text_arr, pa.binary())).to_numpy()

        # (flat_idx or -1, row_idx, span_idx_in_row, check_id, detail)
        violations: list[tuple[int, int, str, str, int, int]] = []  # (flat_idx, row, check, detail, line, col)
        span_index_flat = np.arange(n_spans_total) - list_offsets[:-1][row_of]

        # 1. unknown kinds (vectorized membership)
        import pandas as pd

        kind_ser = pd.Series(kind_np)
        bad_kind = ~kind_ser.isin(self.valid_kinds).to_numpy()
        for i in np.flatnonzero(bad_kind):
            violations.append((i, int(row_of[i]), E.UNKNOWN_KIND, f"kind={kind_np[i]!r}", 0, 0))

        # 2. size limit (vectorized)
        too_big = text_bytes > self.max_span_bytes
        for i in np.flatnonzero(too_big):
            violations.append(
                (i, int(row_of[i]), E.MAX_SIZE_EXCEEDED, f"span bytes {text_bytes[i]}", 0, 0)
            )

        # 3. span offset order: strictly increasing within each row
        if n_spans_total > 1:
            inc = off_np[1:] <= off_np[:-1]
            same_row = row_of[1:] == row_of[:-1]
            bad_pos = np.flatnonzero(inc & same_row) + 1
            for i in bad_pos:
                violations.append(
                    (int(i), int(row_of[i]), E.SPAN_ORDER, f"offset {off_np[i]} after {off_np[i-1]}", 0, 0)
                )

        # 4. media_ref referential integrity (broadcast set, searchsorted)
        is_media = kind_ser.isin(MEDIA_KINDS).to_numpy()
        if self.assets is not None and is_media.any():
            media_idx = np.flatnonzero(is_media)
            refs = media_np[media_idx]
            pos = np.searchsorted(self.assets, refs)
            pos = np.clip(pos, 0, len(self.assets) - 1)
            found = self.assets[pos] == refs
            missing = media_idx[(~found) | (refs == "")]
            for i in missing:
                violations.append((int(i), int(row_of[i]), E.REF_INTEGRITY, f"media_ref={media_np[i]!r}", 0, 0))

        # 5. grammar walk on surviving grammar spans
        is_grammar = kind_ser.isin(GRAMMAR_KINDS).to_numpy()
        skip = bad_kind | too_big
        gram_idx = np.flatnonzero(is_grammar & ~skip)
        if len(gram_idx):
            # materialize ONLY the grammar spans as Python strings — text/
            # media spans (~40%) never enter the walk, so skipping their
            # str allocation cuts memory traffic at full-box occupancy
            texts_np = np.empty(n_spans_total, dtype=object)
            texts_np[gram_idx] = text_arr.take(
                pa.array(gram_idx, pa.int64())
            ).to_pylist()
            for i, check_id, detail, line, col in validate_payloads(
                kind_np, texts_np, gram_idx, self.round_trip, self.parser_configs
            ):
                violations.append((int(i), int(row_of[i]), check_id, detail, int(line), int(col)))

        # -- assemble outputs ---------------------------------------------
        doc_np = doc_ids.to_numpy(zero_copy_only=False)
        viol_count_per_row = np.zeros(n_rows, dtype=np.int32)
        if violations:
            violations.sort(key=lambda v: (doc_np[v[1]], span_index_flat[v[0]], v[2]))
            for v in violations:
                viol_count_per_row[v[1]] += 1

        viol_table = pa.table(
            {
                "partition_id": pa.array(
                    [int(pids[v[1]]) for v in violations], pa.int32()
                ),
                "doc_id": pa.array([doc_np[v[1]] for v in violations], pa.string()),
                "span_index": pa.array(
                    [int(span_index_flat[v[0]]) for v in violations], pa.int32()
                ),
                "check_id": pa.array([v[2] for v in violations], pa.string()),
                "detail": pa.array([v[3] for v in violations], pa.string()),
                "offset": pa.array([int(off_np[v[0]]) for v in violations], pa.int32()),
                "line": pa.array([v[4] for v in violations], pa.int32()),
                "col": pa.array([v[5] for v in violations], pa.int32()),
            },
            schema=VIOLATIONS_SCHEMA,
        )

        from ..functions.sketches import hash64 as _h64

        doc_hashes = _h64(doc_np).astype(np.int64)
        # per-partition partials (a batch usually holds exactly one pid)
        partial_rows = []
        for pid in np.unique(pids):
            rmask = pids == pid
            smask = rmask[row_of]
            n_docs = int(rmask.sum())
            n_sp = int(smask.sum())
            n_viol = int(viol_count_per_row[rmask].sum())
            checks = sorted({v[2] for v in violations if pids[v[1]] == pid})
            td_text = TDigest()
            td_text.add(text_bytes[smask].astype(np.float64))
            td_spans = TDigest()
            td_spans.add(np.diff(list_offsets)[rmask].astype(np.float64))
            hll_doc = HyperLogLog()
            hll_doc.add(doc_np[rmask])
            hll_ref = HyperLogLog()
            refs_here = media_np[smask & is_media]
            if len(refs_here):
                hll_ref.add(refs_here)
            hist = pd.Series(kind_np[smask]).value_counts().to_dict()
            partial_rows.append(
                {
                    "partition_id": int(pid),
                    "n_docs": n_docs,
                    "n_spans": n_sp,
                    "n_violations": n_viol,
                    "checks_failed": ",".join(checks),
                    "kind_hist": _json.dumps({k: int(v) for k, v in hist.items()}, sort_keys=True),
                    "textlen_tdigest": td_text.to_bytes(),
                    "spans_tdigest": td_spans.to_bytes(),
                    "doc_hll": hll_doc.to_bytes(),
                    "ref_hll": hll_ref.to_bytes(),
                    "doc_hashes": (
                        doc_hashes[rmask].tobytes() if self.carry_doc_hashes else b""
                    ),
                }
            )

        # resumable sink: write this batch's violations + docmeta per pid
        if self.out_dir:
            tag = uuid.uuid4().hex[:12]
            for pid in np.unique(pids):
                pid = int(pid)
                pv = viol_table.filter(pc.equal(viol_table["partition_id"], pid))
                self._atomic_write(
                    pv, os.path.join(self.out_dir, "violations", f"part-{pid:05d}-{tag}.parquet")
                )
                rmask = pids == pid
                dm = pa.table(
                    {
                        "partition_id": pa.array(pids[rmask].astype(np.int32)),
                        "doc_id": pa.array(doc_np[rmask], pa.string()),
                        "doc_hash": pa.array(doc_hashes[rmask], pa.int64()),
                        "n_spans": pa.array(np.diff(list_offsets)[rmask].astype(np.int32)),
                        "n_violations": pa.array(viol_count_per_row[rmask]),
                    },
                    schema=DOCMETA_SCHEMA,
                )
                self._atomic_write(
                    dm, os.path.join(self.out_dir, "docmeta", f"part-{pid:05d}-{tag}.parquet")
                )
                if self.quarantine:
                    # quarantine sink: keep the FULL failing rows so a
                    # cleanup pipeline can inspect/repair them; clean
                    # rows flow on untouched (failing docs are the rare
                    # case, so this writes little)
                    qmask = rmask & (viol_count_per_row > 0)
                    if qmask.any():
                        self._atomic_write(
                            batch.filter(pa.array(qmask)),
                            os.path.join(
                                self.out_dir, "quarantine", f"part-{pid:05d}-{tag}.parquet"
                            ),
                        )

        return pa.Table.from_pylist(partial_rows, schema=PARTIALS_SCHEMA)

    @staticmethod
    def _atomic_write(table: pa.Table, path: str) -> None:
        tmp = path + ".tmp"
        pq.write_table(table, tmp, compression="zstd")
        os.replace(tmp, path)


_GC_TUNED = False


def _tune_gc_once() -> None:
    """Per-worker-process GC tuning: freeze the post-import baseline and
    raise the gen-0 threshold — the grammar walk allocates millions of
    short-lived objects and default thresholds trigger collections that
    thrash caches under full-machine concurrency."""
    global _GC_TUNED
    if not _GC_TUNED:
        import gc

        gc.collect()
        gc.freeze()
        gc.set_threshold(100_000, 50, 50)
        _GC_TUNED = True


def validate_task(
    batch: pa.Table,
    *,
    assets_ref=None,
    out_dir: str | None = None,
    round_trip: bool = False,
    max_span_bytes: int = DEFAULT_MAX_SPAN_BYTES,
    quarantine: bool = False,
    parser_configs: dict | None = None,
    carry_doc_hashes: bool = False,
) -> pa.Table:
    """Plain-function form for ``map_batches(validate_task,
    fn_kwargs=...)`` — stateless Ray tasks instead of an actor pool.

    Per the stateful-stage rule the state here is only the broadcast
    asset ref: ``ray.get`` is a zero-copy plasma read cached per worker
    process, and the driver pre-sorts the array, so per-task setup is
    O(1). Tasks scale elastically and skip actor-pool spin-up — ~2x
    faster end-to-end than the actor form for this stage.
    """
    _tune_gc_once()
    v = SpanValidator(
        assets_ref=assets_ref,
        out_dir=out_dir,
        round_trip=round_trip,
        max_span_bytes=max_span_bytes,
        assets_sorted=True,
        quarantine=quarantine,
        parser_configs=parser_configs,
        carry_doc_hashes=carry_doc_hashes,
    )
    return v(batch)
