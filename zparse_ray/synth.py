"""Deterministic synthetic generator for the interleaved spans table.

Generates the BASELINE.json input_hint shape (doc_id, spans[], plus a
partition_id lineage column) with seeded, planted violations per
FIXTURES.md §3:

- grammar violations: a seeded fraction of structured spans carry a
  payload invalid in a KNOWN way (one check_id each)
- doc_id duplicates: a seeded fraction of ids repeat an earlier id,
  concentrated in hot ranges (exercises salting)
- media_ref dangling refs: a seeded fraction of media spans point at
  absent assets, plus one hot bad key
- span-order violations: a seeded fraction of rows have two offsets
  swapped

Everything is a pure function of (seed, partition_id) so partitions can
be generated in parallel (plain processes or a Ray map) and runs are
reproducible. One parquet file per partition → the resume unit.
"""

from __future__ import annotations

import hashlib
import json as _json
import os
import random
from dataclasses import asdict, dataclass

import pyarrow as pa
import pyarrow.parquet as pq

from .functions.convert import (
    serialize_csv,
    serialize_json,
    serialize_toml,
    serialize_yaml,
    serialize_xml,
    value_to_xml,
)
from .schema import ASSETS_SCHEMA, SPANS_SCHEMA


@dataclass(frozen=True)
class SynthConfig:
    n_docs: int = 10_000
    n_partitions: int = 8
    n_assets: int = 2_000
    seed: int = 42
    invalid_rate: float = 0.02  # fraction of grammar spans with a planted violation
    dup_rate: float = 0.005  # fraction of docs reusing an earlier doc_id
    dangling_rate: float = 0.01  # fraction of media spans with absent asset
    span_order_rate: float = 0.005  # fraction of docs with swapped offsets
    mean_spans: int = 6


_WORDS = (
    "lorem ipsum dolor sit amet consectetur adipiscing elit sed do eiusmod tempor "
    "incididunt ut labore et dolore magna aliqua data pipeline span valid schema "
    "check engine stream batch arrow block shard merge digest"
).split()

# (payload, check_id) menus of known-invalid documents per grammar kind
_INVALID_MENU = {
    "json": (
        ('{"a": 1,}', "TrailingComma"),
        ('{"a": 1', "Expected"),
        ('"abc', "UnterminatedString"),
        ('"\\q"', "InvalidEscapeSequence"),
        ("01", "InvalidNumber"),
        ('{"a" 1}', "Expected"),
        ("[" * 129 + "1" + "]" * 129, "MaxDepthExceeded"),
    ),
    "jsonc": (
        ('{"a": 1 /* oops', "InvalidToken"),
        ('{"a": ', "Expected"),
    ),
    "csv": (
        ('a,b\n"x"y,2\n', "InvalidToken"),
        ('a,b\n"unterm\n', "InvalidToken"),
    ),
    "toml": (
        ('name "value"', "Expected"),
        ("[bad\nk = 1", "InvalidKey"),
        ('a = "unterm', "UnterminatedString"),
        ("p = { x = 1\n, y = 2 }", "InvalidInlineTable"),
        ("v = [1, 2", "InvalidArray"),
        ("a = 1\na = 2", "DuplicateKey"),
    ),
    "yaml": (
        ("root:\n   a: 1\n  b: 2", "InvalidToken"),
        ("k: 1\nk: 2", "DuplicateKey"),
        ('n: "unterm', "UnterminatedString"),
        ("a: 1\n\tb: 2", "InvalidToken"),
    ),
    "xml": (
        ("<a><b></a></b>", "InvalidToken"),
        ("<a><b>", "InvalidToken"),
        ('<a x="1" x="2"/>', "InvalidToken"),
        ("<a>&bogus;</a>", "InvalidToken"),
    ),
}

_KIND_WEIGHTS = (
    ("text", 40),
    ("json", 18),
    ("csv", 8),
    ("toml", 8),
    ("yaml", 8),
    ("xml", 6),
    ("jsonc", 2),
    ("image", 8),
    ("audio", 2),
)
_KINDS = [k for k, _ in _KIND_WEIGHTS]
_CUM = []
_t = 0
for _, w in _KIND_WEIGHTS:
    _t += w
    _CUM.append(_t)


def _pick_kind(rng: random.Random) -> str:
    r = rng.random() * _CUM[-1]
    for kind, c in zip(_KINDS, _CUM):
        if r < c:
            return kind
    return "text"


def _rand_scalar(rng: random.Random):
    r = rng.random()
    if r < 0.15:
        return None
    if r < 0.3:
        return rng.random() < 0.5
    if r < 0.6:
        return round(rng.uniform(-1e6, 1e6), rng.randint(0, 4))
    return " ".join(rng.choice(_WORDS) for _ in range(rng.randint(1, 4)))


def _rand_value(rng: random.Random, depth: int = 0):
    r = rng.random()
    if depth >= 3 or r < 0.55:
        return _rand_scalar(rng)
    if r < 0.75:
        return [_rand_value(rng, depth + 1) for _ in range(rng.randint(1, 4))]
    return {f"k{i}": _rand_value(rng, depth + 1) for i in range(rng.randint(1, 4))}


def _rand_flat_obj(rng: random.Random) -> dict:
    return {f"c{i}": _rand_scalar(rng) for i in range(rng.randint(1, 5))}


def _valid_payload(kind: str, rng: random.Random) -> str:
    if kind in ("json", "jsonc"):
        return serialize_json(_rand_value(rng))
    if kind == "csv":
        return serialize_csv([_rand_flat_obj(rng) for _ in range(rng.randint(1, 5))])
    if kind == "toml":
        obj = {f"k{i}": _rand_value(rng, 1) for i in range(rng.randint(1, 4))}
        return serialize_toml(obj)
    if kind == "yaml":
        obj = {f"k{i}": _rand_value(rng, 2) or "x" for i in range(rng.randint(1, 4))}
        return serialize_yaml(obj)
    if kind == "xml":
        return serialize_xml(value_to_xml({"d": _rand_flat_obj(rng)}))
    return " ".join(rng.choice(_WORDS) for _ in range(rng.randint(3, 30)))


def gen_partition(cfg: SynthConfig, partition_id: int) -> pa.Table:
    """Generate one partition's rows — pure function of (cfg, pid)."""
    rng = random.Random((cfg.seed << 20) ^ partition_id)
    per = cfg.n_docs // cfg.n_partitions
    start = partition_id * per
    end = cfg.n_docs if partition_id == cfg.n_partitions - 1 else start + per

    doc_ids: list[str] = []
    spans_col: list[list[dict]] = []
    hot_bad_asset = "asset-missing-hot"

    for idx in range(start, end):
        if idx > 0 and rng.random() < cfg.dup_rate:
            # duplicates concentrated in a hot range near the partition start
            dup_of = start + int(abs(rng.gauss(0, 0.05)) * per) if rng.random() < 0.5 else rng.randint(0, idx - 1)
            doc_id = f"doc-{min(dup_of, idx - 1):012d}"
        else:
            doc_id = f"doc-{idx:012d}"
        n_spans = max(1, min(24, int(rng.expovariate(1.0 / cfg.mean_spans)) + 1))
        spans = []
        offset = 0
        for _ in range(n_spans):
            kind = _pick_kind(rng)
            media_ref = ""
            if kind in ("image", "audio"):
                text = " ".join(rng.choice(_WORDS) for _ in range(rng.randint(0, 6)))
                if rng.random() < cfg.dangling_rate:
                    media_ref = hot_bad_asset if rng.random() < 0.3 else f"asset-{cfg.n_assets + rng.randint(0, 999):06d}"
                else:
                    media_ref = f"asset-{rng.randint(0, cfg.n_assets - 1):06d}"
            elif kind in _INVALID_MENU and rng.random() < cfg.invalid_rate:
                text, _check = _INVALID_MENU[kind][rng.randrange(len(_INVALID_MENU[kind]))]
            else:
                text = _valid_payload(kind, rng)
            spans.append({"kind": kind, "text": text, "media_ref": media_ref, "offset": offset})
            offset += len(text.encode("utf-8")) + 1
        if len(spans) >= 2 and rng.random() < cfg.span_order_rate:
            i = rng.randrange(len(spans) - 1)
            spans[i]["offset"], spans[i + 1]["offset"] = spans[i + 1]["offset"], spans[i]["offset"]
        doc_ids.append(doc_id)
        spans_col.append(spans)

    return pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.string()),
            "spans": pa.array(spans_col, SPANS_SCHEMA.field("spans").type),
            "partition_id": pa.array([partition_id] * len(doc_ids), pa.int32()),
        },
        schema=SPANS_SCHEMA,
    )


def gen_assets(cfg: SynthConfig) -> pa.Table:
    rng = random.Random(cfg.seed ^ 0xA55E75)
    ids = [f"asset-{i:06d}" for i in range(cfg.n_assets)]
    lens = [rng.randint(1_000, 5_000_000) for _ in range(cfg.n_assets)]
    return pa.table({"asset_id": ids, "bytes_len": lens}, schema=ASSETS_SCHEMA)


def _cfg_digest(cfg: SynthConfig) -> str:
    return hashlib.sha256(_json.dumps(asdict(cfg), sort_keys=True).encode()).hexdigest()[:16]


def ensure_dataset(cfg: SynthConfig, base_dir: str = "/tmp/zparse_ray_synth") -> str:
    """Write (or reuse cached) spans dataset: one parquet file per
    partition under <dir>/spans/, plus assets.parquet. Returns the dir.

    Generation parallelizes over partitions with Ray tasks when a Ray
    session is live (bench-scale), else runs serially (tests).
    """
    out = os.path.join(base_dir, _cfg_digest(cfg))
    done_marker = os.path.join(out, "_SYNTH_DONE")
    if os.path.exists(done_marker):
        return out
    os.makedirs(os.path.join(out, "spans"), exist_ok=True)

    def _write(pid: int) -> None:
        t = gen_partition(cfg, pid)
        tmp = os.path.join(out, "spans", f".part-{pid:05d}.tmp")
        pq.write_table(t, tmp, compression="zstd")
        os.replace(tmp, os.path.join(out, "spans", f"part-{pid:05d}.parquet"))

    use_ray = False
    try:
        import ray

        use_ray = ray.is_initialized() and cfg.n_docs >= 50_000
    except Exception:
        pass

    if use_ray:
        import ray

        @ray.remote
        def _w(pid: int, cfg_dict: dict) -> None:
            from zparse_ray.synth import SynthConfig as _SC, gen_partition as _gp

            c = _SC(**cfg_dict)
            t = _gp(c, pid)
            tmp = os.path.join(out, "spans", f".part-{pid:05d}.tmp")
            pq.write_table(t, tmp, compression="zstd")
            os.replace(tmp, os.path.join(out, "spans", f"part-{pid:05d}.parquet"))

        ray.get([_w.remote(pid, asdict(cfg)) for pid in range(cfg.n_partitions)])
    else:
        for pid in range(cfg.n_partitions):
            _write(pid)

    pq.write_table(gen_assets(cfg), os.path.join(out, "assets.parquet"))
    with open(done_marker, "w") as f:
        f.write(_cfg_digest(cfg))
    return out
