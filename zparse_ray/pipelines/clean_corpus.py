"""End-to-end corpus cleaning: documents parquet in → cleaned,
annotated, partitioned parquet out, with a per-run stats dict — the
hygiene pipeline a pre-training data run executes, composed from the
engine's cleaning operators in their canonical order:

1. **PII redaction** (``stages/redact.py``) — per-batch RE2 passes,
   placeholders + per-doc counts. Runs FIRST so that PII-varying
   boilerplate ("Contact us at <EMAIL>") collapses to identical lines
   before the boilerplate counter sees it.
2. **Line-level dedup** (``stages/line_dedup.py``) — cross-document
   repeated-line removal at ``line_min_docs``.
3. **Repetition filter** (``stages/textops.repetition_batch``) —
   Gopher-style duplicate-word / top-word fractions; docs above
   ``max_dup_word_frac`` are dropped. Zero-word documents are dropped
   by this filter too (they are junk under any quality policy).
3b. **N-gram repetition gates** (``stages/textops.ngram_repetition_batch``)
   — optional ``ngram_caps`` dict of per-signal maxima over the
   top-2/3/4-gram and dup-5..10-gram fractions; only the requested n's
   are computed. Docs too short to have n-windows score NULL and are
   KEPT (no repetition evidence — unlike the word filter's
   zero-word-drop rule).
4. **LM perplexity filter** (``stages/lm_score.py``) — optional;
   trains the trigram LM on ``lm_reference`` (a separate trusted
   corpus path) or, failing that, on the input itself, then drops docs
   with perplexity above ``max_perplexity``.

Every stage is a streaming per-batch map; the only shuffles are the
line-dedup count ``groupby`` and (when enabled) the LM training count
``groupby`` — both move compact (hash, count) partials, never text.
The redaction stage is re-executed by the line-dedup count pass (the
lazy-pipeline re-traversal trade documented in ``stages/line_dedup``).

Stats come from the WRITTEN output, not a third traversal of the
input: ``n_docs_out`` reads parquet footers only; aggregate redaction /
line-drop counts re-read just the narrow count columns of the (already
filtered, much smaller) output directory.

Annotation columns survive in the output (``n_redactions``,
``n_lines_dropped``, ``dup_word_frac``, ``top_word_frac``, and
``perplexity`` when enabled) so downstream jobs can re-stratify
without recomputing.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .dedup_corpus import read_documents


def clean_corpus(
    input_path: str,
    out_dir: str,
    *,
    text_column: str = "text",
    normalize_text: bool = False,
    redact_pii: bool = True,
    line_min_docs: int = 2,
    max_dup_word_frac: float | None = None,
    ngram_caps: dict[str, float] | None = None,
    max_perplexity: float | None = None,
    lm_reference: str | None = None,
    concurrency: int = 2,
    persist_intermediate: bool = False,
) -> dict:
    """Run the cleaning pipeline; write survivors under ``out_dir``
    (must be empty — mixing runs corrupts stats) and return stats.
    Set ``line_min_docs=0`` to skip boilerplate removal; leave
    ``max_dup_word_frac`` / ``max_perplexity`` as None to skip those
    filters (annotations are still written when their stage ran).

    ``persist_intermediate`` materializes the normalized/redacted
    stream into the object store (Ray spills to disk past memory)
    before the line-dedup count pass, so redaction runs ONCE instead
    of being re-executed by that pass's second traversal — the
    storage-for-CPU side of the trade ``stages/line_dedup`` documents
    (both are valid at 100 TB; default stays recompute). Output is
    byte-identical either way (pinned by test)."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from ..stages.line_dedup import line_dedup
    from ..stages.redact import redact
    from ..stages.textops import repetition_batch

    if os.path.isdir(out_dir) and os.listdir(out_dir):
        raise ValueError(f"out_dir {out_dir!r} is not empty — refusing to mix runs")

    # actor pools must leave >= 1 CPU for the task-pool stages feeding
    # them (2 actors on a 2-CPU cluster deadlock the whole pipeline:
    # the actors hold every CPU while waiting for input that the
    # starved read/map tasks can never produce)
    import ray

    total_cpus = int(ray.cluster_resources().get("CPU", concurrency + 1))
    concurrency = max(1, min(concurrency, total_cpus - 1))

    docs = read_documents(input_path)
    n_in = docs.count()

    if normalize_text:
        from ..stages.normalize import normalize

        docs = normalize(docs, column=text_column)
    ds = redact(docs, column=text_column) if redact_pii else docs
    if persist_intermediate and line_min_docs and (redact_pii or normalize_text):
        # pay object-store/disk for the normalized+redacted blocks so
        # the line-dedup count pass reads them instead of re-running
        # the upstream maps (lineage is cut; spilling bounds memory)
        ds = ds.materialize()
    if line_min_docs:
        ds = line_dedup(
            ds, column=text_column, min_docs=line_min_docs, concurrency=concurrency
        )

    if max_dup_word_frac is not None:
        cap = float(max_dup_word_frac)

        def rep_filter(t: pa.Table) -> pa.Table:
            t = repetition_batch(t, text_column)  # drops zero-word rows
            return t.filter(pc.less_equal(t["dup_word_frac"], cap))

        ds = ds.map_batches(rep_filter, batch_format="pyarrow")

    if ngram_caps:
        # Gopher n-gram repetition gates: keys are signal columns
        # (top_{2,3,4}gram_frac / dup_{5..10}gram_frac), values the max
        # allowed fraction. Only the needed n's are computed. A doc too
        # short to have n-windows scores NULL for that n and is KEPT
        # (no repetition evidence), unlike the word filter's
        # zero-word-drop rule — word-less docs are junk, short docs
        # aren't.
        import re

        from ..stages.textops import ngram_repetition_batch

        key_re = re.compile(r"^(top|dup)_(\d+)gram_frac$")
        parsed = {k: key_re.match(k) for k in ngram_caps}
        bad = sorted(k for k, m in parsed.items() if m is None)
        if bad:
            raise ValueError(
                f"ngram_caps keys must be top_Ngram_frac/dup_Ngram_frac, got {bad}"
            )
        top_ns = tuple(
            sorted(int(m.group(2)) for m in parsed.values() if m.group(1) == "top")
        )
        dup_ns = tuple(
            sorted(int(m.group(2)) for m in parsed.values() if m.group(1) == "dup")
        )
        caps = {k: float(v) for k, v in ngram_caps.items()}

        def ngram_filter(t: pa.Table) -> pa.Table:
            t = ngram_repetition_batch(
                t, text_column, top_ns=top_ns, dup_ns=dup_ns
            )
            mask = pa.array(np.ones(t.num_rows, bool))
            for col, cap_v in caps.items():
                ok = pc.fill_null(pc.less_equal(t[col], cap_v), True)
                mask = pc.and_(mask, ok)
            return t.filter(mask)

        ds = ds.map_batches(ngram_filter, batch_format="pyarrow")

    if max_perplexity is not None:
        from ..stages.lm_score import score_perplexity, train_ngram_lm

        ref = read_documents(lm_reference) if lm_reference else docs
        model = train_ngram_lm(ref, column=text_column)
        ds = score_perplexity(ds, model, concurrency=concurrency, text_col=text_column)
        capp = float(max_perplexity)

        def ppl_filter(t: pa.Table) -> pa.Table:
            keep = pc.and_kleene(
                pc.is_valid(t["perplexity"]), pc.less_equal(t["perplexity"], capp)
            )
            return t.filter(pc.fill_null(keep, False))

        ds = ds.map_batches(ppl_filter, batch_format="pyarrow")

    ds.write_parquet(out_dir)

    # stats from the written output: footers for the row count, one
    # narrow columnar read for the aggregate counters. When every doc
    # was filtered, write_parquet may not have created out_dir at all —
    # an empty result is a valid outcome, not a crash.
    files = (
        [
            os.path.join(out_dir, f)
            for f in os.listdir(out_dir)
            if f.endswith(".parquet")
        ]
        if os.path.isdir(out_dir)
        else []
    )
    n_out = sum(pq.read_metadata(f).num_rows for f in files)
    stats = {
        "n_docs_in": int(n_in),
        "n_docs_out": int(n_out),
        "n_dropped": int(n_in - n_out),
        "out_dir": out_dir,
    }
    if n_out:
        schema_names = pq.read_schema(files[0]).names
        want = [c for c in ("n_redactions", "n_lines_dropped") if c in schema_names]
        if want:
            tallies = pq.ParquetDataset(files).read(columns=want)
            for c in want:
                stats[f"total_{c}"] = int(pc.sum(tallies[c]).as_py() or 0)
    return stats
