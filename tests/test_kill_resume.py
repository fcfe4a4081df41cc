"""Real kill-mid-run resume: SIGKILL a validation subprocess partway
through, then resume and require output identical to an uninterrupted
run (the north rule's 'killed run restarts at the last committed
partition' — tested with an actual kill, not manifest surgery)."""

import json
import os
import shutil
import signal
import subprocess
import sys
import time

from zparse_ray.oracle import read_pipeline_outputs
from zparse_ray.pipelines.validate import run_validation
from zparse_ray.synth import SynthConfig, ensure_dataset

CFG = SynthConfig(n_docs=24_000, n_partitions=24, seed=17)

_RUNNER = """
import sys
sys.path.insert(0, {repo!r})
import ray
ray.init(address="local", num_cpus=2, include_dashboard=False, logging_level="ERROR")
import ray.data as rd
rd.DataContext.get_current().enable_progress_bars = False
from zparse_ray.pipelines.validate import run_validation
run_validation({spans!r}, {out!r}, round_trip=False)
"""


def test_kill_and_resume(ray_session, tmp_path):
    spans_dir = ensure_dataset(CFG)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    # uninterrupted reference run (in-process, current session)
    ref_out = str(tmp_path / "ref")
    run_validation(spans_dir, ref_out, round_trip=False)
    ref = read_pipeline_outputs(ref_out)

    # subprocess run, killed once a few partitions have committed
    kill_out = str(tmp_path / "killed")
    script = _RUNNER.format(repo=repo, spans=spans_dir, out=kill_out)
    proc = subprocess.Popen(
        [sys.executable, "-c", script],
        cwd=repo,
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
        start_new_session=True,  # isolate its ray session's process group
    )
    manifest = os.path.join(kill_out, "manifest.json")
    deadline = time.time() + 120
    committed_at_kill = 0
    while time.time() < deadline:
        if os.path.exists(manifest):
            try:
                committed_at_kill = len(json.load(open(manifest))["partitions"])
            except (json.JSONDecodeError, KeyError):
                committed_at_kill = 0
            if committed_at_kill >= 4:
                break
        if proc.poll() is not None:
            break
        time.sleep(0.05)
    os.killpg(proc.pid, signal.SIGKILL)
    proc.wait()
    assert proc.poll() is not None
    assert committed_at_kill >= 1, "subprocess never committed a partition before kill"
    assert committed_at_kill < CFG.n_partitions, "run finished before the kill; raise n_docs"

    # resume in the current session
    res = run_validation(spans_dir, kill_out, round_trip=False)
    assert res["n_docs"] == CFG.n_docs
    resumed = read_pipeline_outputs(kill_out)
    assert resumed == ref
    m = json.load(open(manifest))
    assert len(m["partitions"]) == CFG.n_partitions
