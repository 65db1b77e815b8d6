"""Fast plumbing tests for the learning-gate harness (scripts/learning_gate.py).

The closed-loop gate itself is slow-tier (test_learning_gate.py); these pin
the argv-level contracts cheaply: the generation helper forwards sampler /
steps / spacing to the real CLI flags, and --restamp_dpm patches exactly the
dpm_* fields of an existing artifact from a re-run of only the DPM leg.
"""
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))


def test_run_generation_forwards_sampler_flags(monkeypatch, tmp_path):
    import learning_gate as lg

    seen = {}

    def fake_main(argv):
        seen["argv"] = list(argv)

    from noisediff_tpu.cli import test_diffusion as td

    monkeypatch.setattr(td, "main", fake_main)
    # common_flags imports jax for the backend probe; stub it out so this
    # stays a no-backend test
    monkeypatch.setattr(lg, "common_flags", lambda wd, sid: ["--num_workers", "1"])

    lg.run_generation(
        dict(lg.SCALES["tiny"]), str(tmp_path), str(tmp_path / "SID"),
        "gen_x", resume="", sampler="dpm", steps=12, spacing="lambda",
    )
    argv = seen["argv"]
    for flag, val in (("--sampler", "dpm"), ("--sampling_timesteps", "12"),
                      ("--dpm_spacing", "lambda")):
        assert flag in argv, argv
        assert argv[argv.index(flag) + 1] == val, argv

    # spacing omitted -> the flag is absent (CLI default applies)
    lg.run_generation(
        dict(lg.SCALES["tiny"]), str(tmp_path), str(tmp_path / "SID"),
        "gen_y", resume="", sampler="dpm", steps=12,
    )
    assert "--dpm_spacing" not in seen["argv"]


def test_step_sweep_merge_preserves_other_grid_and_production(tmp_path):
    """dpm_step_sweep --out must MERGE into an existing artifact: rows of
    the other grid and the hand-certified 'production' block survive a
    re-run; same-(steps, spacing) rows are replaced."""
    import json

    import dpm_step_sweep as dss

    out = tmp_path / "sweep.json"
    out.write_text(json.dumps({
        "scale": "tpu",
        "resume_time": "/old/ckpt",
        "ddim_kld_symmetric": 0.031,
        "sweep": [
            {"dpm_steps": 15, "spacing": "time", "kld_symmetric": 0.026},
            {"dpm_steps": 10, "spacing": "lambda", "kld_symmetric": 0.011},
        ],
        "production": {"dpm_steps": 10, "spacing": "lambda"},
    }))
    result = {
        "scale": "tpu", "resume": "/new/ckpt", "spacing": "lambda",
        "ddim_kld_symmetric": 0.032,
        "sweep": [
            {"dpm_steps": 10, "spacing": "lambda", "kld_symmetric": 0.012},
            {"dpm_steps": 8, "spacing": "lambda", "kld_symmetric": 0.030},
        ],
    }
    merged = dss.merge_into(str(out), result, "lambda")
    keyed = {(r["dpm_steps"], r["spacing"]): r for r in merged["sweep"]}
    assert keyed[(15, "time")]["kld_symmetric"] == 0.026  # other grid kept
    assert keyed[(10, "lambda")]["kld_symmetric"] == 0.012  # replaced
    assert keyed[(8, "lambda")]["kld_symmetric"] == 0.030  # appended
    assert merged["production"] == {"dpm_steps": 10, "spacing": "lambda"}
    assert merged["resume_lambda"] == "/new/ckpt"
    assert merged["resume_time"] == "/old/ckpt"
    assert merged["ddim_kld_symmetric"] == 0.032

    # fresh path: plain result with the per-spacing resume key
    fresh = dss.merge_into(str(tmp_path / "none.json"), dict(result), "lambda")
    assert fresh["resume_lambda"] == "/new/ckpt" and "resume" not in fresh


def test_restamp_dpm_patches_only_dpm_fields(monkeypatch, tmp_path):
    import learning_gate as lg

    # an existing gate workdir: SID tree + snapshot + artifact
    wd = tmp_path / "work"
    (wd / "SID").mkdir(parents=True)
    snap = wd / "logs" / "weights" / "gate_diff" / "snapshot"
    snap.mkdir(parents=True)
    (snap / "ema_final").mkdir()
    artifact = {
        "scale": "small",
        "kld_untrained": {"kld_symmetric": 2.0},
        "kld_trained": {"kld_symmetric": 0.04},
        "kld_trained_dpm": {"kld_symmetric": 0.05},
        "dpm_steps": 15,
        "dpm_spacing": "time",
        "dpm_vs_ddim_kld_ratio": 1.25,
        "psnr_gain": 11.5,
    }
    out = tmp_path / "gate.json"
    out.write_text(json.dumps(artifact))

    calls = {}

    def fake_gen(cfg, workdir, sid, name, resume, sampler=None, steps=None,
                 spacing=None):
        calls["gen"] = dict(name=name, sampler=sampler, steps=steps,
                            spacing=spacing, resume=resume)
        return os.path.join(workdir, name)

    def fake_kld(workdir, sid, gen_dir):
        return {"kld_symmetric": 0.03, "kld_forward": 0.03,
                "kld_inverse": 0.03}

    monkeypatch.setattr(lg, "run_generation", fake_gen)
    monkeypatch.setattr(lg, "run_kld", fake_kld)

    result = lg.main([
        "--workdir", str(wd), "--scale", "small", "--restamp_dpm",
        "--out", str(out),
        "--set", "dpm=10", "--set", "dpm_spacing=lambda",
    ])

    assert calls["gen"]["sampler"] == "dpm"
    assert calls["gen"]["steps"] == 10
    assert calls["gen"]["spacing"] == "lambda"
    assert calls["gen"]["resume"].endswith("ema_final")

    # the artifact on disk: dpm_* fields replaced, everything else intact
    patched = json.loads(out.read_text())
    assert patched["dpm_steps"] == 10
    assert patched["dpm_spacing"] == "lambda"
    assert patched["kld_trained_dpm"]["kld_symmetric"] == 0.03
    assert abs(patched["dpm_vs_ddim_kld_ratio"] - 0.03 / 0.04) < 1e-12
    assert patched["psnr_gain"] == 11.5
    assert patched["kld_trained"]["kld_symmetric"] == 0.04
    assert result["dpm_spacing"] == "lambda"
