"""CLI entry point (the engine's analog of the reference CLI,
zparse-cli/src/main.rs — and the `ray job submit` target).

  python -m zparse_ray.run validate --input DIR --output DIR [--round-trip]
      [--drift-profile FILE] [--no-resume] [--num-cpus N]
  python -m zparse_ray.run synth --docs N --partitions P --out-base DIR
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
    d.add_argument("--num-cpus", type=int, default=None)

    cl = sub.add_parser("clean", help="clean a documents corpus (redact/boilerplate/quality)")
    cl.add_argument("--input", required=True, help="documents parquet/jsonl/csv")
    cl.add_argument("--output", required=True, help="output directory (partitioned parquet)")
    cl.add_argument("--text-column", default="text")
    cl.add_argument("--no-redact", action="store_true", help="skip PII redaction")
    cl.add_argument("--line-min-docs", type=int, default=2,
                    help="drop lines appearing in >= N docs (0 disables)")
    cl.add_argument("--max-dup-word-frac", type=float, default=None,
                    help="drop docs above this duplicate-word fraction")
    cl.add_argument("--max-perplexity", type=float, default=None,
                    help="drop docs above this trigram-LM perplexity")
    cl.add_argument("--lm-reference", default=None,
                    help="trusted corpus to train the LM on (default: the input)")
    cl.add_argument("--num-cpus", type=int, default=None)

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
                redact_pii=not args.no_redact,
                line_min_docs=args.line_min_docs,
                max_dup_word_frac=args.max_dup_word_frac,
                max_perplexity=args.max_perplexity,
                lm_reference=args.lm_reference,
            )))
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
