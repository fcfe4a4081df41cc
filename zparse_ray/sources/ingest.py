"""Ingest: raw files -> the interleaved spans table.

How user data gets INTO the engine (the distributed analog of the
reference CLI's read_input + format sniff, zparse-cli/src/main.rs:261-331):

- ``ingest_text_files``: one document per file via
  ``read_binary_files(include_paths=True)``; the file extension picks
  the span kind (format sniff, lib.rs:43-54), unknown extensions become
  plain text spans.
- ``ingest_documents_table``: wrap an existing text table (e.g. the
  testdata ``documents``) into spans rows — one text span per doc, or
  paragraph-split into multiple spans.

Both emit the canonical SPANS_SCHEMA with partition ids assigned by
stable hash so downstream partition semantics (verdicts, resume) hold.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.convert import detect_format_from_path
from ..functions.sketches import hash64
from ..schema import SPANS_SCHEMA


def _spans_rows(doc_ids, kinds, texts, n_partitions: int) -> pa.Table:
    pids = (hash64(np.asarray(doc_ids, dtype=object), seed=3) % np.uint64(n_partitions)).astype(
        np.int32
    )
    spans = [
        [{"kind": k, "text": t, "media_ref": "", "offset": 0}]
        for k, t in zip(kinds, texts)
    ]
    return pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.string()),
            "spans": pa.array(spans, SPANS_SCHEMA.field("spans").type),
            "partition_id": pa.array(pids, pa.int32()),
        },
        schema=SPANS_SCHEMA,
    )


def ingest_text_files(paths, *, n_partitions: int = 64):
    """Dataset of spans rows from raw files (one doc per file); kind
    from the extension sniff, text decoded as UTF-8 (replacement on
    invalid bytes — the validator flags the payload downstream)."""
    import ray.data as rd

    files = rd.read_binary_files(paths, include_paths=True)

    def to_spans(batch: pa.Table) -> pa.Table:
        out_ids, out_kinds, out_texts = [], [], []
        for path, data in zip(batch["path"].to_pylist(), batch["bytes"].to_pylist()):
            kind = detect_format_from_path(path) or "text"
            if kind == "json" and path.lower().endswith(".jsonc"):
                kind = "jsonc"
            out_ids.append(path)
            out_kinds.append(kind)
            out_texts.append(data.decode("utf-8", "replace"))
        return _spans_rows(out_ids, out_kinds, out_texts, n_partitions)

    return files.map_batches(to_spans, batch_format="pyarrow")


def ingest_documents_table(sf_dir: str, *, n_partitions: int = 64, split_paragraphs: bool = False):
    """Spans rows from the testdata ``documents`` table (doc_id:int64,
    text); optional paragraph splitting into multiple text spans with
    byte offsets."""
    import os

    import ray.data as rd

    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"])

    def to_spans(batch: pa.Table) -> pa.Table:
        ids = [f"doc-{i:012d}" for i in batch["doc_id"].to_pylist()]
        texts = batch["text"].to_pylist()
        if not split_paragraphs:
            return _spans_rows(ids, ["text"] * len(ids), texts, n_partitions)
        pids = (hash64(np.asarray(ids, dtype=object), seed=3) % np.uint64(n_partitions)).astype(np.int32)
        spans_col = []
        for t in texts:
            spans = []
            offset = 0
            for para in (t or "").split("\n\n"):
                spans.append({"kind": "text", "text": para, "media_ref": "", "offset": offset})
                offset += len(para.encode("utf-8")) + 2
            spans_col.append(spans)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.string()),
                "spans": pa.array(spans_col, SPANS_SCHEMA.field("spans").type),
                "partition_id": pa.array(pids, pa.int32()),
            },
            schema=SPANS_SCHEMA,
        )

    return ds.map_batches(to_spans, batch_format="pyarrow")


def write_spans_dataset(ds, out_dir: str) -> str:
    """Materialize an ingested Dataset as the canonical one-file-per-
    partition layout (the resume/verdict unit) under out_dir/spans/."""
    import os

    import pyarrow.parquet as pq

    os.makedirs(os.path.join(out_dir, "spans"), exist_ok=True)

    # repartition by the partition_id column so each output file holds
    # exactly one partition (groupby keeps this a single shuffle);
    # pyarrow batch format throughout — nested list<struct> columns do
    # not survive a pandas round-trip
    def write_group(group: pa.Table) -> pa.Table:
        pid = int(group["partition_id"][0].as_py())
        t = group.select(["doc_id", "spans", "partition_id"]).cast(SPANS_SCHEMA)
        tmp = os.path.join(out_dir, "spans", f".part-{pid:05d}.tmp")
        pq.write_table(t, tmp, compression="zstd")
        os.replace(tmp, os.path.join(out_dir, "spans", f"part-{pid:05d}.parquet"))
        return pa.table({"partition_id": pa.array([pid], pa.int32()), "n_docs": pa.array([group.num_rows], pa.int64())})

    stats = ds.groupby("partition_id").map_groups(write_group, batch_format="pyarrow")
    stats.materialize()
    return out_dir
