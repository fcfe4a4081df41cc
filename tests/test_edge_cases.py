"""Edge-case robustness: degenerate partitions, size limits at the
boundary, unicode-heavy payloads, empty spans lists."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from zparse_ray.schema import SPANS_SCHEMA
from zparse_ray.stages.spancheck import SpanValidator


def _table(rows):
    return pa.Table.from_pylist(rows, schema=SPANS_SCHEMA)


def _row(doc_id, spans, pid=0):
    return {"doc_id": doc_id, "spans": spans, "partition_id": pid}


def _span(kind="text", text="x", media_ref="", offset=0):
    return {"kind": kind, "text": text, "media_ref": media_ref, "offset": offset}


def run(rows, **kw):
    v = SpanValidator(**kw)
    return v(_table(rows))


def test_empty_batch():
    out = run([])
    assert out.num_rows == 0


def test_doc_with_zero_spans():
    out = run([_row("d0", [])])
    p = out.to_pylist()[0]
    assert p["n_docs"] == 1 and p["n_spans"] == 0 and p["n_violations"] == 0


def test_single_span_no_order_violation():
    out = run([_row("d0", [_span(offset=5)])])
    assert out.to_pylist()[0]["n_violations"] == 0


def test_equal_offsets_are_violations():
    out = run([_row("d0", [_span(offset=3), _span(offset=3)])])
    assert out.to_pylist()[0]["n_violations"] == 1


def test_size_limit_boundary():
    at = run([_row("d0", [_span(kind="json", text='"' + "a" * 6 + '"')])], max_span_bytes=8)
    assert at.to_pylist()[0]["n_violations"] == 0
    over = run([_row("d0", [_span(kind="json", text='"' + "a" * 7 + '"')])], max_span_bytes=8)
    assert over.to_pylist()[0]["n_violations"] == 1


def test_size_limit_counts_utf8_bytes():
    # 3 snowmen = 3 chars but 9 utf-8 bytes
    out = run([_row("d0", [_span(kind="text", text="☃☃☃")])], max_span_bytes=8)
    assert out.to_pylist()[0]["n_violations"] == 1


def test_unicode_payloads_validate():
    out = run(
        [
            _row(
                "d0",
                [
                    _span(kind="json", text='{"é": "☃", "日本": [1, 2]}'),
                    _span(kind="yaml", text='clé: "végétal"', offset=30),
                ],
            )
        ]
    )
    assert out.to_pylist()[0]["n_violations"] == 0


def test_unknown_kind_flagged():
    out = run([_row("d0", [_span(kind="video")])])
    assert out.to_pylist()[0]["checks_failed"] == "UnknownKind"


def test_media_without_assets_set_not_checked():
    # no broadcast asset set -> ref-integrity is skipped (matches oracle)
    out = run([_row("d0", [_span(kind="image", media_ref="asset-nope")])])
    assert out.to_pylist()[0]["n_violations"] == 0


def test_round_trip_flag_catches_nothing_on_valid(tmp_path):
    out = run(
        [_row("d0", [_span(kind="toml", text='a = 1\nb = "x"')])],
        round_trip=True,
    )
    assert out.to_pylist()[0]["n_violations"] == 0


def test_validation_pipeline_single_doc_partition(ray_session, tmp_path):
    import shutil

    from zparse_ray.oracle import oracle_validate, read_pipeline_outputs
    from zparse_ray.pipelines.validate import run_validation

    spans_dir = str(tmp_path / "tiny")
    import os

    os.makedirs(spans_dir + "/spans")
    for pid in range(3):
        t = _table([_row(f"d{pid}", [_span(kind="json", text="{bad")], pid=pid)])
        pq.write_table(t, f"{spans_dir}/spans/part-{pid:05d}.parquet")
    out = str(tmp_path / "out")
    shutil.rmtree(out, ignore_errors=True)
    run_validation(spans_dir, out)
    p_viols, p_verdicts = read_pipeline_outputs(out)
    o_viols, o_verdicts = oracle_validate(spans_dir)
    assert p_viols == o_viols
    assert p_verdicts == o_verdicts
    assert len(p_verdicts) == 3 and all(not v["passed"] for v in p_verdicts)
