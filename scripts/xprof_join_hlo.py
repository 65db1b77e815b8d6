"""Join a jax.profiler Chrome trace with the compiled HLO text: for each hot
fusion, show its root instruction (kind + output shape) and metadata op_name
(the JAX source path), then aggregate time by model-layer prefix.

Usage:
    python scripts/xprof_join_hlo.py /tmp/xtrace /tmp/hlo.txt [--top 40] [--evals 20]
"""
import argparse
import collections
import re
import sys

sys.path.insert(0, __file__.rsplit("/", 1)[0])
from xprof_summary import load_events, newest_trace  # noqa: E402


def parse_hlo(path: str):
    """fusion name -> (root line, op_name metadata) from an HLO text dump."""
    info = {}
    cur = None
    for line in open(path):
        m = re.match(r"%?(fused_computation[^\s]*|[\w.-]+)\s+\([^)]*\)\s+->", line)
        # computation header like: %fused_computation.123 (param_0: ...) -> ...
        if line.startswith("%fused_computation") or line.startswith("fused_computation"):
            cur = line.split()[0].lstrip("%")
            continue
        s = line.strip()
        mm = re.match(r"ROOT\s+%?([\w.-]+)\s+=\s+(\S+)\s+(\w+)\(", s)
        if mm and cur:
            meta = re.search(r'op_name="([^"]+)"', s)
            info.setdefault(cur, []).append(
                (mm.group(3), mm.group(2), meta.group(1) if meta else "")
            )
        # top-level instruction lines: %name = <shape> kind(...); tuple
        # shapes contain spaces, so capture lazily up to the op kind.
        mm = re.match(
            r"\s+%?([\w.-]+)\s+=\s+(.+?)\s+"
            r"(fusion|convolution|dot|custom-call|reduce|copy|transpose|all-reduce)\(",
            line,
        )
        if mm:
            meta = re.search(r'op_name="([^"]+)"', line)
            kind = mm.group(3)
            emitter = re.search(r'"emitter":"(\w+)"', line)
            if emitter:
                kind += ":" + emitter.group(1).replace("Emit", "")
            info.setdefault(mm.group(1), []).append(
                (kind, mm.group(2), meta.group(1) if meta else "")
            )
    return info


def layer_of(op_name: str) -> str:
    """Collapse a jax op_name path to the model-layer component."""
    m = re.search(r"NoiseDiffNet[^/]*/([\w.]+(?:/[\w.]+)?)", op_name)
    if m:
        return m.group(1)
    m = re.search(r"jit\(\w+\)/(\w+)", op_name)
    return m.group(1) if m else (op_name[:40] or "?")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_root")
    ap.add_argument("hlo")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--evals", type=int, default=20)
    args = ap.parse_args()

    events, names = load_events(newest_trace(args.trace_root))
    dev_pids = {p for p, n in names.items() if "TPU" in n or "device" in n.lower()}
    tot = collections.Counter()
    cnt = collections.Counter()
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        n = e["name"]
        if n.startswith(("jit_", "while")):  # enclosing frames, not ops
            continue
        tot[n] += float(e.get("dur", 0.0))
        cnt[n] += 1

    info = parse_hlo(args.hlo)
    by_layer = collections.Counter()
    print(f"{'us/eval':>9} {'kind':>22}  shape / layer")
    shown = 0
    for name, us in tot.most_common():
        meta = info.get(name) or info.get(name.replace("_fusion", "")) or []
        kind, shape, op_name = meta[0] if meta else ("?", "?", "")
        lay = layer_of(op_name)
        by_layer[lay] += us
        if shown < args.top:
            print(f"{us/args.evals:9.1f} {kind[:22]:>22}  {shape[:40]:40} {lay[:44]} [{name}]")
            shown += 1
    print("\n# by layer (us/eval):")
    for lay, us in by_layer.most_common(40):
        print(f"{us/args.evals:9.1f}  {lay}")


if __name__ == "__main__":
    main()
