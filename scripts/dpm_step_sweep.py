"""Certify DPM-Solver++(2M) at fewer steps from an existing gate checkpoint.

The learning gate (scripts/learning_gate.py) certifies the production
DPM-25 fast path by regenerating the gate's (ISO, ratio) noise from the
trained checkpoint and scoring it under the reference KLD protocol
(/root/reference/utils/util.py:188-256). Round 4's run left ~2x of
quality headroom (DPM-25 KLD 0.61x of DDIM-50's, bar <=1.2x) — this
sweep reuses the SAME trained checkpoint and synthetic SID tree to score
DPM at fewer step counts, i.e. higher certified production rates, with
zero retraining.

Usage (after a --keep'd or still-present learning_gate run):
    python scripts/dpm_step_sweep.py --workdir /tmp/gate_r4 \
        --steps 20,15,10 --out DPM_STEP_SWEEP.json
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from learning_gate import SCALES, run_generation, run_kld  # noqa: E402


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", required=True,
                    help="an existing learning_gate workdir (trained "
                         "snapshot + synthetic SID tree)")
    ap.add_argument("--scale", default="tpu", choices=sorted(SCALES))
    ap.add_argument("--steps", default="20,15,10")
    ap.add_argument("--spacing", default="time", choices=("time", "lambda"),
                    help="DPM step grid (see gaussian.dpm_solver_sample)")
    ap.add_argument("--out", default="")
    args = ap.parse_args(argv)

    cfg = dict(SCALES[args.scale])
    sid = os.path.join(args.workdir, "SID")
    snap = os.path.join(args.workdir, "logs", "weights", "gate_diff", "snapshot")
    ema = os.path.join(snap, "ema_final")
    resume = ema if os.path.isdir(ema) or os.path.exists(ema + ".npz") else \
        os.path.join(snap, "net_final")
    assert os.path.isdir(sid), f"no SID tree under {args.workdir}"
    assert os.path.exists(resume) or os.path.isdir(resume), resume

    # reference KLD of the checkpoint's certified samplers, for the ratios
    gate_json = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "..", "LEARNING_GATE_TPU.json")
    ddim_kld = None
    if os.path.exists(gate_json):
        with open(gate_json) as f:
            g = json.load(f)
        ddim_kld = g.get("kld_trained", {}).get("kld_symmetric")

    result = {"scale": args.scale, "resume": resume, "spacing": args.spacing,
              "ddim_kld_symmetric": ddim_kld, "sweep": []}
    for n in [int(s) for s in args.steps.split(",") if s]:
        gen = run_generation(cfg, args.workdir, sid,
                             f"gen_dpm{n}_{args.spacing}",
                             resume=resume, sampler="dpm", steps=n,
                             spacing=args.spacing)
        kld = run_kld(args.workdir, sid, gen)
        row = {"dpm_steps": n, "spacing": args.spacing, "kld": kld,
               "kld_symmetric": kld["kld_symmetric"]}
        if ddim_kld:
            row["vs_ddim_ratio"] = kld["kld_symmetric"] / ddim_kld
        result["sweep"].append(row)
        print(json.dumps(row), flush=True)

    print(json.dumps(result))
    if args.out:
        merged = merge_into(args.out, result, args.spacing)
        with open(args.out, "w") as f:
            json.dump(merged, f, indent=1)
    return result


def merge_into(out_path, result, spacing):
    """Merge a single-spacing sweep into an existing artifact in place of
    overwriting it: rows are keyed by (dpm_steps, spacing) — same-key rows
    are replaced, other grids' rows and any hand-written top-level fields
    (e.g. the 'production' block) are preserved. A fresh path just gets
    `result` (with the per-spacing resume key)."""
    result = dict(result)
    resume = result.pop("resume", None)
    result[f"resume_{spacing}"] = resume
    if not os.path.exists(out_path):
        return result
    with open(out_path) as f:
        old = json.load(f)
    merged = dict(old)
    rows = {}
    for r in old.get("sweep", []):
        rows[(r["dpm_steps"], r.get("spacing", "time"))] = r
    for r in result["sweep"]:
        rows[(r["dpm_steps"], r.get("spacing", "time"))] = r
    merged["sweep"] = sorted(
        rows.values(), key=lambda r: (r.get("spacing", "time"), -r["dpm_steps"])
    )
    merged[f"resume_{spacing}"] = resume
    if result.get("ddim_kld_symmetric") is not None:
        merged["ddim_kld_symmetric"] = result["ddim_kld_symmetric"]
    return merged


if __name__ == "__main__":
    main()
