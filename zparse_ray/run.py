"""CLI entry point (the engine's analog of the reference CLI,
zparse-cli/src/main.rs — and the `ray job submit` target).

  python -m zparse_ray.run validate --input DIR --output DIR [--round-trip]
      [--drift-profile FILE] [--no-resume] [--num-cpus N]
  python -m zparse_ray.run synth --docs N --partitions P --out-base DIR
  python -m zparse_ray.run dedup|clean|chunk|pack|sample --input PATH --output DIR [...]
  python -m zparse_ray.run stats --input PATH
  python -m zparse_ray.run convert --from FMT --to FMT [--input FILE] [--output FILE]
  python -m zparse_ray.run parse [--from FMT] [--input FILE]

`convert`/`parse` mirror the reference CLI semantics on single
documents (format sniffing from extension, "ok" on successful parse —
zparse-cli/src/main.rs:195-259); `validate` runs the distributed
pipeline. Only this module owns the Ray session.
"""

from __future__ import annotations

import argparse
import json
import sys


def _read_input(path: str | None) -> str:
    if path is None or path == "-":
        return sys.stdin.read()
    with open(path, encoding="utf-8") as f:
        return f.read()


def _write_output(path: str | None, data: str) -> None:
    if path is None or path == "-":
        sys.stdout.write(data)
    else:
        with open(path, "w", encoding="utf-8") as f:
            f.write(data)



def _require_clean_dir(out_dir: str) -> None:
    """Refuse a non-empty output dir (the dedup/clean pipelines' rule):
    write_parquet adds uniquely-named files BESIDE stale ones, so a
    reused dir would silently mix two runs and inflate the footer-based
    counts."""
    import os

    if os.path.isdir(out_dir) and os.listdir(out_dir):
        raise SystemExit(f"error: output dir {out_dir!r} is not empty — refusing to mix runs")


def _parquet_rows(out_dir: str) -> int:
    """Row count of a written parquet directory from file footers (no
    data read)."""
    import glob

    import pyarrow.parquet as pq

    return sum(
        pq.read_metadata(f).num_rows
        for f in glob.glob(f"{out_dir}/*.parquet")
    )


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="zparse_ray")
    sub = ap.add_subparsers(dest="cmd", required=True)

    v = sub.add_parser("validate", help="run the distributed validation pipeline")
    v.add_argument("--input", required=True, help="spans dataset dir (spans/ + assets.parquet)")
    v.add_argument("--output", required=True, help="output dir (violations/verdicts/manifest)")
    v.add_argument("--round-trip", action="store_true")
    v.add_argument("--drift-profile", default=None)
    v.add_argument("--no-resume", action="store_true")
    v.add_argument("--num-cpus", type=int, default=None)
    v.add_argument(
        "--max-depth",
        type=int,
        default=None,
        help="per-format parser depth limit (reference Config.max_depth, default 128)",
    )
    v.add_argument(
        "--max-span-bytes",
        type=int,
        default=None,
        help="per-span byte limit (reference Config.max_size, default 10 MiB)",
    )
    v.add_argument(
        "--allow-comments",
        action="store_true",
        help="treat json spans permissively (JSONC comments + trailing commas)",
    )
    v.add_argument(
        "--csv-delimiter",
        default=None,
        help="CSV field delimiter for csv spans (default ',')",
    )
    v.add_argument(
        "--quarantine",
        action="store_true",
        help="capture full failing rows per partition under output/quarantine/",
    )
    v.add_argument(
        "--build-profile",
        default=None,
        metavar="PATH",
        help="after validating, freeze a drift reference profile to PATH",
    )

    s = sub.add_parser("synth", help="generate a synthetic spans dataset")
    s.add_argument("--docs", type=int, default=100_000)
    s.add_argument("--partitions", type=int, default=32)
    s.add_argument("--seed", type=int, default=42)
    s.add_argument("--out-base", default="/tmp/zparse_ray_synth")

    d = sub.add_parser("dedup", help="deduplicate a documents parquet corpus")
    d.add_argument("--input", required=True, help="documents parquet file or directory")
    d.add_argument("--output", required=True, help="output directory (partitioned parquet)")
    d.add_argument("--mode", choices=("exact", "minhash"), default="exact")
    d.add_argument("--id-column", default="doc_id")
    d.add_argument("--text-column", default="text")
    d.add_argument("--threshold", type=float, default=0.8,
                   help="minhash mode: exact-Jaccard keep threshold")
    d.add_argument("--minhash-perms", type=int, default=128,
                   help="minhash mode: signature permutations (divisible by bands)")
    d.add_argument("--minhash-bands", type=int, default=16,
                   help="minhash mode: LSH bands (more = higher recall)")
    d.add_argument("--shingle-k", type=int, default=5,
                   help="minhash mode: tokens per shingle")
    d.add_argument("--minhash-bucket-cap", type=int, default=64,
                   help="minhash mode: max docs per LSH bucket before "
                        "non-silent truncation")
    d.add_argument("--reference", default=None,
                   help="existing corpus: drop docs already present in it first")
    d.add_argument("--cross-method", choices=("broadcast", "bloom", "shuffle"),
                   default="broadcast",
                   help="membership shape for --reference (see stages/dedup.py)")
    d.add_argument("--num-cpus", type=int, default=None)

    cl = sub.add_parser("clean", help="clean a documents corpus (redact/boilerplate/quality)")
    cl.add_argument("--input", required=True, help="documents parquet/jsonl/csv")
    cl.add_argument("--output", required=True, help="output directory (partitioned parquet)")
    cl.add_argument("--text-column", default="text")
    cl.add_argument("--no-redact", action="store_true", help="skip PII redaction")
    cl.add_argument("--normalize", action="store_true",
                    help="NFC + control-char strip + whitespace collapse first")
    cl.add_argument("--line-min-docs", type=int, default=2,
                    help="drop lines appearing in >= N docs (0 disables)")
    cl.add_argument("--max-dup-word-frac", type=float, default=None,
                    help="drop docs above this duplicate-word fraction")
    cl.add_argument("--ngram-caps", default=None,
                    help="Gopher n-gram repetition gates, e.g. "
                         "'dup_5gram_frac=0.15,top_2gram_frac=0.2'")
    cl.add_argument("--max-perplexity", type=float, default=None,
                    help="drop docs above this trigram-LM perplexity")
    cl.add_argument("--lm-reference", default=None,
                    help="trusted corpus to train the LM on (default: the input)")
    cl.add_argument("--persist-intermediate", action="store_true",
                    help="materialize the redacted stream (object store, "
                         "spills to disk) so the line-dedup count pass "
                         "does not re-run redaction — storage-for-CPU trade")
    cl.add_argument("--num-cpus", type=int, default=None)

    ch = sub.add_parser("chunk", help="split documents into token-window chunks")
    ch.add_argument("--input", required=True, help="documents parquet/jsonl/csv")
    ch.add_argument("--output", required=True, help="output directory (partitioned parquet)")
    ch.add_argument("--chunk-tokens", type=int, default=512)
    ch.add_argument("--overlap-tokens", type=int, default=0)
    ch.add_argument("--text-column", default="text")
    ch.add_argument("--id-column", default="doc_id")
    ch.add_argument("--num-cpus", type=int, default=None)

    pk = sub.add_parser("pack", help="pack documents/chunks into fixed-token training sequences")
    pk.add_argument("--input", required=True, help="documents parquet/jsonl/csv")
    pk.add_argument("--output", required=True, help="output directory (partitioned parquet)")
    pk.add_argument("--seq-tokens", type=int, default=4096)
    pk.add_argument("--mode", choices=("split", "whole"), default="split",
                    help="split: concat-and-slice, zero padding; whole: docs stay intact")
    pk.add_argument("--chunk-tokens", type=int, default=None,
                    help="whole mode: pre-chunk docs longer than this first")
    pk.add_argument("--text-column", default="text")
    pk.add_argument("--id-column", default="doc_id")
    pk.add_argument("--num-cpus", type=int, default=None)

    sa = sub.add_parser("sample", help="deterministic corpus sampling")
    sa.add_argument("--input", required=True, help="documents parquet/jsonl/csv")
    sa.add_argument("--output", required=True, help="output directory (partitioned parquet)")
    g = sa.add_mutually_exclusive_group(required=True)
    g.add_argument("--rate", type=float, default=None,
                   help="Bernoulli keep rate in [0,1] (hash rule, deterministic)")
    g.add_argument("--k", type=int, default=None,
                   help="exact-k uniform sample (bottom-k by hash)")
    g.add_argument("--rate-by", default=None, metavar="G=R,G=R",
                   help="stratified per-group rates, e.g. en=0.5,de=0.1")
    g.add_argument("--cap", type=int, default=None,
                   help="keep at most K rows per --group-column group "
                        "(deterministic per-domain cap)")
    sa.add_argument("--default-rate", type=float, default=0.0,
                    help="rate for groups not listed in --rate-by")
    sa.add_argument("--group-column", default="lang")
    sa.add_argument("--id-column", default="doc_id")
    sa.add_argument("--seed", type=int, default=0)
    sa.add_argument("--num-cpus", type=int, default=None)

    mx = sub.add_parser("mix", help="compose corpora into a token-budget mixture")
    mx.add_argument("--source", action="append", required=True, metavar="NAME=PATH",
                    help="repeatable: corpus name and parquet/jsonl/csv path")
    mx.add_argument("--weights", default=None, metavar="NAME=W,NAME=W",
                    help="relative mixture weights (default: equal)")
    mx.add_argument("--token-budget", type=float, required=True)
    mx.add_argument("--max-epochs", type=int, default=1,
                    help="allow repeating a too-small source up to N passes")
    mx.add_argument("--output", required=True, help="output directory (partitioned parquet)")
    mx.add_argument("--id-column", default="doc_id")
    mx.add_argument("--text-column", default="text")
    mx.add_argument("--seed", type=int, default=0)
    mx.add_argument("--no-shuffle", action="store_true",
                    help="skip the deterministic training-order shuffle")
    mx.add_argument("--num-cpus", type=int, default=None)

    st = sub.add_parser("stats", help="profile a documents corpus (one JSON report)")
    st.add_argument("--input", required=True, help="documents parquet/jsonl/csv")
    st.add_argument("--text-column", default="text")
    st.add_argument("--lang-column", default="lang")
    st.add_argument("--num-cpus", type=int, default=None)

    c = sub.add_parser("convert", help="convert one document between formats")
    c.add_argument("--from", dest="from_fmt", default=None)
    c.add_argument("--to", dest="to_fmt", required=True)
    c.add_argument("--input", default=None)
    c.add_argument("--output", default=None)

    p = sub.add_parser("parse", help="parse/validate one document; prints 'ok'")
    p.add_argument("--from", dest="from_fmt", default=None)
    p.add_argument("--input", default=None)
    p.add_argument("--print-output", action="store_true")

    args = ap.parse_args(argv)

    if args.cmd in ("convert", "parse"):
        from .functions.convert import (
            convert,
            detect_format_from_path,
            parse_value,
            serialize_json,
            xml_to_value,
        )
        from .functions.errors import ParseError
        from .functions.xml_parser import parse_xml

        fmt = args.from_fmt or (args.input and detect_format_from_path(args.input))
        if not fmt:
            print("error: cannot determine input format (use --from)", file=sys.stderr)
            return 2
        text = _read_input(args.input)
        try:
            if args.cmd == "convert":
                _write_output(args.output, convert(text, fmt, args.to_fmt))
            else:
                value = xml_to_value(parse_xml(text)) if fmt == "xml" else parse_value(text, fmt)
                if args.print_output:
                    _write_output(None, serialize_json(value) + "\n")
                else:
                    print("ok")
        except ParseError as e:
            print(str(e), file=sys.stderr)
            return 1
        return 0

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=getattr(args, "num_cpus", None),
            include_dashboard=False,
            logging_level="ERROR",
        )
    import ray.data as rd

    rd.DataContext.get_current().enable_progress_bars = False
    try:
        if args.cmd == "synth":
            from .synth import SynthConfig, ensure_dataset

            cfg = SynthConfig(n_docs=args.docs, n_partitions=args.partitions, seed=args.seed)
            print(ensure_dataset(cfg, args.out_base))
            return 0
        if args.cmd == "clean":
            from .pipelines.clean_corpus import clean_corpus

            print(json.dumps(clean_corpus(
                args.input,
                args.output,
                text_column=args.text_column,
                normalize_text=args.normalize,
                redact_pii=not args.no_redact,
                line_min_docs=args.line_min_docs,
                max_dup_word_frac=args.max_dup_word_frac,
                ngram_caps=(
                    {
                        k: float(v)
                        for k, v in (
                            kv.split("=", 1) for kv in args.ngram_caps.split(",")
                        )
                    }
                    if args.ngram_caps
                    else None
                ),
                max_perplexity=args.max_perplexity,
                lm_reference=args.lm_reference,
                persist_intermediate=args.persist_intermediate,
            )))
            return 0
        if args.cmd == "mix":
            from .pipelines.dedup_corpus import read_documents
            from .pipelines.mix_corpora import mix_corpora

            _require_clean_dir(args.output)
            sources = {}
            for spec in args.source:
                name, _, path = spec.partition("=")
                if not name or not path:
                    print(f"error: --source expects NAME=PATH, got {spec!r}",
                          file=sys.stderr)
                    return 2
                sources[name] = read_documents(path)
            weights = None
            if args.weights:
                weights = {}
                for part in args.weights.split(","):
                    key, _, val = part.partition("=")
                    weights[key.strip()] = float(val)
            out, stats = mix_corpora(
                sources, args.token_budget,
                weights=weights,
                max_epochs=args.max_epochs,
                id_column=args.id_column,
                text_column=args.text_column,
                seed=args.seed,
                shuffle=not args.no_shuffle,
            )
            out.write_parquet(args.output)
            stats["n_rows"] = _parquet_rows(args.output)
            print(json.dumps(stats))
            return 0
        if args.cmd == "stats":
            from .pipelines.corpus_stats import corpus_stats
            from .pipelines.dedup_corpus import read_documents

            print(json.dumps(corpus_stats(
                read_documents(args.input),
                text_column=args.text_column,
                lang_column=args.lang_column,
            )))
            return 0
        if args.cmd == "chunk":
            from .pipelines.dedup_corpus import read_documents
            from .stages.chunk import chunk_documents

            _require_clean_dir(args.output)
            docs = read_documents(args.input)
            n_docs = docs.count()
            out = chunk_documents(
                docs,
                chunk_tokens=args.chunk_tokens,
                overlap_tokens=args.overlap_tokens,
                column=args.text_column,
                id_column=args.id_column,
            )
            out.write_parquet(args.output)
            n_chunks = _parquet_rows(args.output)
            print(json.dumps({"n_docs": n_docs, "n_chunks": n_chunks,
                              "chunk_tokens": args.chunk_tokens,
                              "overlap_tokens": args.overlap_tokens}))
            return 0
        if args.cmd == "pack":
            from ray.data.aggregate import Count, Sum

            from .pipelines.dedup_corpus import read_documents
            from .stages.chunk import chunk_documents
            from .stages.pack import pack_sequences

            _require_clean_dir(args.output)
            docs = read_documents(args.input)
            if args.mode == "whole" and args.chunk_tokens:
                docs = chunk_documents(
                    docs, chunk_tokens=args.chunk_tokens,
                    column=args.text_column, id_column=args.id_column,
                )
            out = pack_sequences(
                docs, seq_tokens=args.seq_tokens, mode=args.mode,
                column=args.text_column, id_column=args.id_column,
            )
            out.write_parquet(args.output)
            import glob as _glob

            import ray.data as rd

            # an all-empty/whitespace corpus packs to zero rows and may
            # write no parquet files — a valid outcome, not a crash
            # (the clean_corpus precedent; ADVICE r4)
            if _glob.glob(f"{args.output}/*.parquet"):
                agg = rd.read_parquet(
                    args.output, columns=["n_tokens", "pad_tokens"]
                ).aggregate(
                    Count(alias_name="n_sequences"),
                    Sum("n_tokens", alias_name="total_tokens"),
                    Sum("pad_tokens", alias_name="pad_tokens"),
                )
            else:
                agg = {"n_sequences": 0, "total_tokens": 0, "pad_tokens": 0}
            agg.update({"seq_tokens": args.seq_tokens, "mode": args.mode})
            print(json.dumps(agg))
            return 0
        if args.cmd == "sample":
            from .pipelines.dedup_corpus import read_documents
            from .stages.sample import (
                hash_sample,
                hash_topk_sample,
                stratified_hash_sample,
            )

            _require_clean_dir(args.output)
            docs = read_documents(args.input)
            if args.cap is not None:
                from .stages.sample import grouped_cap_sample

                out = grouped_cap_sample(
                    docs, args.cap,
                    group_column=args.group_column,
                    id_column=args.id_column, seed=args.seed,
                )
                out.write_parquet(args.output)
                n_kept = _parquet_rows(args.output)
            elif args.k is not None:
                tab = hash_topk_sample(
                    docs, args.k, id_column=args.id_column, seed=args.seed
                )
                rd.from_arrow(tab).write_parquet(args.output)
                n_kept = tab.num_rows
            else:
                if args.rate_by is not None:
                    rates = {}
                    for part in args.rate_by.split(","):
                        key, _, val = part.partition("=")
                        rates[key.strip()] = float(val)
                    out = stratified_hash_sample(
                        docs, rates,
                        group_column=args.group_column,
                        id_column=args.id_column,
                        default_rate=args.default_rate,
                        seed=args.seed,
                    )
                else:
                    out = hash_sample(
                        docs, args.rate, id_column=args.id_column, seed=args.seed
                    )
                out.write_parquet(args.output)
                n_kept = _parquet_rows(args.output)
            print(json.dumps({"n_kept": n_kept, "seed": args.seed}))
            return 0
        if args.cmd == "dedup":
            from .pipelines.dedup_corpus import dedup_corpus

            print(json.dumps(dedup_corpus(
                args.input,
                args.output,
                mode=args.mode,
                id_column=args.id_column,
                text_column=args.text_column,
                threshold=args.threshold,
                reference=args.reference,
                cross_method=args.cross_method,
                n_perm=args.minhash_perms,
                n_bands=args.minhash_bands,
                shingle_k=args.shingle_k,
                bucket_cap=args.minhash_bucket_cap,
            )))
            return 0
        from .pipelines.validate import run_validation
        from .stages.spancheck import build_parser_configs

        parser_configs = build_parser_configs(
            max_depth=args.max_depth,
            allow_comments=args.allow_comments,
            csv_delimiter=args.csv_delimiter,
        )
        res = run_validation(
            args.input,
            args.output,
            round_trip=args.round_trip,
            resume=not args.no_resume,
            drift_profile=args.drift_profile,
            max_span_bytes=args.max_span_bytes,
            parser_configs=parser_configs,
            quarantine=args.quarantine,
        )
        if args.build_profile:
            from .pipelines.validate import build_profile

            build_profile(args.output, args.build_profile)
            res["profile_path"] = args.build_profile
        print(json.dumps(res))
        return 0
    finally:
        ray.shutdown()


if __name__ == "__main__":
    raise SystemExit(main())
