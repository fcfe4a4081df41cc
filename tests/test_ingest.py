"""Ingest sources: raw files / documents table -> spans table -> full
validation pipeline end-to-end."""

import glob
import os

import pyarrow.parquet as pq
import pytest

from zparse_ray.schema import SPANS_SCHEMA
from zparse_ray.sources.ingest import (
    ingest_documents_table,
    ingest_text_files,
    write_spans_dataset,
)


def test_ingest_text_files(ray_session, tmp_path):
    (tmp_path / "a.json").write_text('{"ok": true}')
    (tmp_path / "b.toml").write_text("x = 1\n")
    (tmp_path / "c.txt").write_text("plain prose here")
    (tmp_path / "d.yaml").write_text("k: v\n")
    ds = ingest_text_files(str(tmp_path), n_partitions=4)
    rows = ds.take_all()
    assert len(rows) == 4
    kinds = {os.path.basename(r["doc_id"]): r["spans"][0]["kind"] for r in rows}
    assert kinds == {"a.json": "json", "b.toml": "toml", "c.txt": "text", "d.yaml": "yaml"}
    assert all(0 <= r["partition_id"] < 4 for r in rows)


def test_ingest_documents_and_validate(ray_session, tmp_path):
    from zparse_ray.oracle import read_pipeline_outputs
    from zparse_ray.pipelines.validate import run_validation

    ds = ingest_documents_table("/root/testdata/sf0.001", n_partitions=8)
    spans_dir = str(tmp_path / "ingested")
    write_spans_dataset(ds, spans_dir)
    files = sorted(glob.glob(spans_dir + "/spans/part-*.parquet"))
    assert files
    total = sum(pq.ParquetFile(f).metadata.num_rows for f in files)
    assert total == 500  # documents table rows
    t = pq.read_table(files[0])
    assert t.schema.equals(SPANS_SCHEMA)

    out = str(tmp_path / "out")
    run_validation(spans_dir, out)
    viols, verdicts = read_pipeline_outputs(out)
    # plain text spans with unique ids: everything passes
    assert viols == []
    assert all(v["passed"] for v in verdicts)
    assert sum(v["n_docs"] for v in verdicts) == 500


def test_ingest_paragraph_split(ray_session):
    ds = ingest_documents_table("/root/testdata/sf0.001", n_partitions=4, split_paragraphs=True)
    row = ds.take(1)[0]
    assert row["spans"][0]["kind"] == "text"
    offsets = [s["offset"] for s in row["spans"]]
    assert offsets == sorted(offsets)
