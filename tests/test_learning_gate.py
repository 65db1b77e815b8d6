"""Closed-loop learning gate (VERDICT round-1 item 1).

Proves the pipeline *learns* — not merely runs — with no SID data mounted:
synthesise a miniature SID tree from a known Poisson-Gaussian noise model
(the reference's own synthesis, dataset_denoising.py:331-345), run BOTH
stages through the real CLIs, and gate on statistics under the reference
protocols:

  * noise realism: symmetric KLD of generated vs held-out real noise
    (reference utils/util.py:188-256) must improve by >=2x over the
    untrained-model baseline;
  * downstream utility: LSID trained on the generated pairs must beat the
    noisy input's PSNR on held-out frames (reference test protocol,
    test_denoising.py:516).

The tiny scale runs the identical code path as `--scale tpu` (whose
numbers live in LEARNING_GATE.json / BENCH_NOTES.md), just with reduced
frames/dims/budgets so it finishes in ~15 min on the 1-core CPU box.
"""
import json
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_closed_loop_learning_gate(tmp_path):
    out = tmp_path / "gate.json"
    # subprocess (not in-process): the gate drives the real CLI mains,
    # which parse argv and configure logging/backends globally.
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "learning_gate.py"),
         "--workdir", str(tmp_path / "work"), "--scale", "tiny",
         "--out", str(out), "--platform", "cpu"],
        capture_output=True, text=True, timeout=3600,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    result = json.loads(out.read_text())

    # stage 1 learned the noise distribution: trained KLD well below the
    # untrained (N(0,1)-prior) baseline.  Measured on this box:
    # 2.02 -> 0.43 symmetric (4.7x); gate at 2x for seed robustness.
    kld0 = result["kld_untrained"]["kld_symmetric"]
    kld1 = result["kld_trained"]["kld_symmetric"]
    assert kld1 < kld0 / 2.0, (kld0, kld1)

    # the generations left the prior: std near the real residual's
    # (~0.03-0.07 at this noise model), far from N(0,1)'s 1.0
    assert result["generated_noise_std"] < 0.3, result["generated_noise_std"]

    # stage 2 denoises: PSNR gain over the noisy input on held-out frames.
    # Measured: +2.74 dB; gate at +1 dB.
    assert result["psnr_gain"] > 1.0, result
