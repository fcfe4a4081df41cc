"""CLI tests for the parse/convert single-document modes (mirrors the
reference CLI semantics, zparse-cli/src/main.rs) — run in-process."""

import io
import sys

import pytest

from zparse_ray.run import main


def run_cli(argv, stdin=""):
    old_in, old_out, old_err = sys.stdin, sys.stdout, sys.stderr
    sys.stdin = io.StringIO(stdin)
    sys.stdout, sys.stderr = io.StringIO(), io.StringIO()
    try:
        code = main(argv)
        return code, sys.stdout.getvalue(), sys.stderr.getvalue()
    finally:
        sys.stdin, sys.stdout, sys.stderr = old_in, old_out, old_err


def test_parse_ok():
    code, out, _ = run_cli(["parse", "--from", "json"], '{"a": 1}')
    assert code == 0
    assert out.strip() == "ok"


def test_parse_error_position():
    code, _, err = run_cli(["parse", "--from", "json"], '{"a": 1,}')
    assert code == 1
    assert "error at" in err and "trailing comma" in err


def test_parse_print_output():
    code, out, _ = run_cli(["parse", "--from", "yaml", "--print-output"], "a: 1\nb: x\n")
    assert code == 0
    assert out.strip() == '{"a":1,"b":"x"}'


def test_convert_stdin_stdout():
    code, out, _ = run_cli(["convert", "--from", "toml", "--to", "json"], 'a = 1\n')
    assert code == 0
    assert out == '{"a":1}'


def test_convert_format_sniffing(tmp_path):
    p = tmp_path / "doc.TOML"
    p.write_text("x = true\n")
    code, out, _ = run_cli(["convert", "--to", "yaml", "--input", str(p)])
    assert code == 0
    assert out == "x: true"


def test_missing_format():
    code, _, err = run_cli(["parse"], "{}")
    assert code == 2
    assert "cannot determine" in err


def test_convert_output_file(tmp_path):
    outp = tmp_path / "out.json"
    code, _, _ = run_cli(["convert", "--from", "csv", "--to", "json", "--output", str(outp)], "a\n1\n")
    assert code == 0
    assert outp.read_text() == '[{"a":1}]'


def test_cli_validate_subprocess(ray_session, tmp_path):
    # the validate subcommand end-to-end in a real subprocess (owns its
    # own Ray session per the CLI contract)
    import json
    import os
    import subprocess
    import sys

    from zparse_ray.synth import SynthConfig, ensure_dataset

    d = ensure_dataset(SynthConfig(n_docs=400, n_partitions=2, seed=61))
    out = str(tmp_path / "cli_out")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, "-m", "zparse_ray.run", "validate", "--input", d,
         "--output", out, "--num-cpus", "2"],
        cwd=repo, capture_output=True, text=True, timeout=240,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    res = json.loads(r.stdout.strip().splitlines()[-1])
    assert res["n_docs"] == 400
    assert os.path.exists(os.path.join(out, "verdicts.parquet"))


def test_cli_validate_quarantine_and_profile(tmp_path):
    # subprocess: owns its own Ray session; exercises --quarantine,
    # --build-profile and the parser-config flags end-to-end
    import json
    import os
    import subprocess
    import sys

    synth = subprocess.run(
        [sys.executable, "-m", "zparse_ray.run", "synth", "--docs", "400",
         "--partitions", "2", "--seed", "5", "--out-base", str(tmp_path / "synth")],
        capture_output=True, text=True, cwd="/root/repo", timeout=300,
    )
    assert synth.returncode == 0, synth.stderr[-500:]
    d = synth.stdout.strip().splitlines()[-1]
    out = str(tmp_path / "out")
    prof = str(tmp_path / "profile.json")
    r = subprocess.run(
        [sys.executable, "-m", "zparse_ray.run", "validate", "--input", d,
         "--output", out, "--quarantine", "--build-profile", prof,
         "--max-depth", "64"],
        capture_output=True, text=True, cwd="/root/repo", timeout=300,
    )
    assert r.returncode == 0, r.stderr[-500:]
    res = json.loads(r.stdout.strip().splitlines()[-1])
    assert res["profile_path"] == prof and os.path.exists(prof)
    assert os.path.isdir(os.path.join(out, "quarantine"))
    assert json.load(open(prof))["kind_hist"]


def test_cli_clean_subprocess(tmp_path):
    # the clean subcommand end-to-end in a real subprocess
    import json
    import os
    import subprocess
    import sys

    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    df = pd.DataFrame(
        {
            "doc_id": np.arange(6, dtype=np.int64),
            "text": [
                "normal words in a line",
                "more normal words here",
                "footer line\nbody one",
                "footer line\nbody two",
                " ".join(["spam"] * 30),
                "reach me at x@y.org today",
            ],
        }
    )
    src = str(tmp_path / "docs.parquet")
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False), src)
    out = str(tmp_path / "cleaned")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, "-m", "zparse_ray.run", "clean", "--input", src,
         "--output", out, "--max-dup-word-frac", "0.5", "--num-cpus", "2"],
        cwd=repo, capture_output=True, text=True, timeout=240,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    res = json.loads(r.stdout.strip().splitlines()[-1])
    assert res["n_docs_in"] == 6 and res["n_docs_out"] == 5  # spam doc dropped
    assert res["total_n_lines_dropped"] == 2  # the shared footer, both docs
    assert res["total_n_redactions"] == 1     # the email
    got = pq.ParquetDataset(out).read().to_pylist()
    by_id = {r["doc_id"]: r for r in got}
    assert "x@y.org" not in by_id[5]["text"] and "<EMAIL>" in by_id[5]["text"]


def test_cli_chunk_and_sample_subprocess(tmp_path):
    import json
    import os
    import subprocess
    import sys

    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    df = pd.DataFrame(
        {
            "doc_id": np.arange(40, dtype=np.int64),
            "lang": (["en", "de"] * 20),
            "text": [" ".join(f"w{i}_{j}" for j in range(11)) for i in range(40)],
        }
    )
    src = str(tmp_path / "docs.parquet")
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False), src)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    out_c = str(tmp_path / "chunks")
    r = subprocess.run(
        [sys.executable, "-m", "zparse_ray.run", "chunk", "--input", src,
         "--output", out_c, "--chunk-tokens", "5", "--overlap-tokens", "1",
         "--num-cpus", "2"],
        cwd=repo, capture_output=True, text=True, timeout=240,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    res = json.loads(r.stdout.strip().splitlines()[-1])
    # 11 tokens, chunk 5 stride 4 -> ceil((11-5)/4)+1 = 3 chunks per doc
    assert res == {"n_docs": 40, "n_chunks": 120, "chunk_tokens": 5,
                   "overlap_tokens": 1}
    tab = pq.ParquetDataset(out_c).read()
    assert sorted(tab.column_names) == ["chunk_id", "doc_id", "n_tokens", "text"]

    out_s = str(tmp_path / "sampled")
    r = subprocess.run(
        [sys.executable, "-m", "zparse_ray.run", "sample", "--input", src,
         "--output", out_s, "--k", "7", "--num-cpus", "2"],
        cwd=repo, capture_output=True, text=True, timeout=240,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert json.loads(r.stdout.strip().splitlines()[-1])["n_kept"] == 7
    assert pq.ParquetDataset(out_s).read().num_rows == 7


def test_cli_chunk_refuses_dirty_output(tmp_path):
    import os
    import subprocess
    import sys

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = str(tmp_path / "docs.parquet")
    pq.write_table(
        pa.Table.from_pandas(
            pd.DataFrame({"doc_id": [0], "text": ["a b c"]}), preserve_index=False
        ),
        src,
    )
    out = str(tmp_path / "chunks")
    os.makedirs(out)
    with open(os.path.join(out, "stale.parquet"), "w") as f:
        f.write("stale")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, "-m", "zparse_ray.run", "chunk", "--input", src,
         "--output", out, "--num-cpus", "2"],
        cwd=repo, capture_output=True, text=True, timeout=240,
    )
    assert r.returncode != 0 and "not empty" in (r.stderr + r.stdout)


def test_cli_mix_subprocess(tmp_path):
    import json
    import os
    import subprocess
    import sys

    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    def write(path, n, wpd, tag):
        df = pd.DataFrame({
            "doc_id": np.arange(n, dtype=np.int64),
            "text": [" ".join(f"{tag}{i}_{j}" for j in range(wpd))
                     for i in range(n)],
        })
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False), path)

    a, b = str(tmp_path / "a.parquet"), str(tmp_path / "b.parquet")
    write(a, 50, 10, "a")   # 500 tokens
    write(b, 20, 5, "b")    # 100 tokens
    out = str(tmp_path / "mix")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, "-m", "zparse_ray.run", "mix",
         "--source", f"a={a}", "--source", f"b={b}",
         "--weights", "a=1,b=1", "--token-budget", "300",
         "--output", out, "--num-cpus", "2"],
        cwd=repo, capture_output=True, text=True, timeout=240,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    res = json.loads(r.stdout.strip().splitlines()[-1])
    # b (100 tokens) can't fill its 150-token share: taken whole,
    # slack refills a -> rate 200/500
    assert res["sources"]["b"]["taken_whole"] is True
    assert res["sources"]["b"]["epochs_whole"] == 1
    assert res["sources"]["a"]["frac_ppm"] == 400_000
    assert res["shortfall_tokens"] == 0.0
    tab = pq.ParquetDataset(out).read()
    assert res["n_rows"] == tab.num_rows
    srcs = set(tab["mix_source"].to_pylist())
    assert srcs == {"a", "b"}
    assert sorted(tab.column_names) == ["doc_id", "mix_epoch", "mix_source",
                                        "text"]
