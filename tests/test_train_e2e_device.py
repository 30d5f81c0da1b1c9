"""Gated device end-to-end training test (round-4 verdict item 2).

Runs the REAL `run_training` loop on the real accelerator — world on disk,
host JPEG ingest, adversarial steps, in-loop evals, best-NDKL export — via
`benchmarks/train_e2e_device.py` in a SUBPROCESS (this suite's conftest
pins the in-process jax platform to CPU; the subprocess gets the default
platform, i.e. the TPU under the axon shim).

Gate: set ``DEBIAS_VLT_DEVICE_E2E=1`` to enable (it holds the accelerator
for ~2-4 minutes; the full-scale measured record lives in PERF.md "Device
end-to-end training" / benchmarks/records/train_e2e_device_r5.json).
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

device_gate = pytest.mark.skipif(
    os.environ.get("DEBIAS_VLT_DEVICE_E2E") != "1",
    reason="device e2e training gated behind DEBIAS_VLT_DEVICE_E2E=1 "
           "(holds the accelerator for minutes)",
)


@device_gate
def test_run_training_end_to_end_on_device(tmp_path):
    out_json = tmp_path / "e2e.json"
    env = {k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "benchmarks",
                                      "train_e2e_device.py"),
         "--rungs", "bf16", "--root", str(tmp_path / "work"),
         "--n-train", "512", "--n-val", "128", "--epochs", "1",
         "--batch", "128", "--eval-every", "2",
         "--json-out", str(out_json)],
        env=env, capture_output=True, text=True, timeout=1800)
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]

    (rec,) = json.loads(out_json.read_text())
    assert rec["rung"] == "bf16"
    # FairFace's gen_labels drops a small fraction of rows (reference
    # parity), so a 512-image world yields ~505 → 3 full 128-batches
    assert rec["steps"] >= 3
    for key in ("best_ndkl", "final_ndkl", "e2e_img_per_s"):
        assert np.isfinite(rec[key]), rec
    # best-NDKL selection can only improve on (or match) the final state
    assert rec["best_ndkl"] <= rec["final_ndkl"] + 1e-9, rec

def test_steady_state_ms_excludes_eval_gaps(tmp_path):
    """A gap that spans an eval record carries val-embed + checkpoint cost,
    not step cost — it must not contaminate the steady-step median (at
    --eval-every 2, HALF the gaps span one)."""
    sys.path.insert(0, os.path.join(REPO, "benchmarks"))
    try:
        from train_e2e_device import steady_state_ms
    finally:
        sys.path.pop(0)

    log = tmp_path / "metrics.jsonl"
    t, recs = 0.0, []
    for step in range(1, 9):
        t += 5.0 if step == 1 else 0.1  # first step bears the compile
        recs.append({"time": t, "loss": 1.0, "step": step})
        if step % 2 == 0:  # eval point: a 2 s val pass between steps
            t += 2.0
            recs.append({"time": t, "ndkl_eq_opp": 0.5, "step": step})
    log.write_text("".join(json.dumps(r) + "\n" for r in recs))
    # clean gaps are exactly the 0.1 s step-to-step ones
    assert abs(steady_state_ms(str(log)) - 100.0) < 1e-6
