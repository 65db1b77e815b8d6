"""Two-process jax.distributed test: the real multi-host path (the virtual
8-device mesh tests cover the mesh math but run one process). Two CPU
processes rendezvous through jax.distributed.initialize, each feeds its
ShardedIterSampler shard into one data-parallel diffusion train step over a
2-device global mesh, and both must observe the identical global loss
(gradient all-reduce across hosts). Reference counterpart: NCCL DDP +
DistIterSampler (train_diffusion.py:18-25, data_sampler.py:12-62)."""
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

WORKER = r"""
import json, os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
import jax
jax.config.update("jax_platforms", "cpu")
pid = int(sys.argv[1]); coord = sys.argv[2]
jax.distributed.initialize(coordinator_address=coord, num_processes=2, process_id=pid)
import jax.numpy as jnp, numpy as np
from flax import linen as nn
sys.path.insert(0, os.getcwd())  # launched with cwd = repo root
from noisediff_tpu.diffusion import GaussianDiffusion
from noisediff_tpu.ops.schedules import make_schedule
from noisediff_tpu.parallel import make_mesh, replicated, shard_batch
from noisediff_tpu.data.sampler import ShardedIterSampler
from noisediff_tpu.train.state import create_train_state, make_diffusion_train_step, make_optimizer

assert jax.process_count() == 2 and jax.device_count() == 2
mesh = make_mesh({"data": 2})

sampler = ShardedIterSampler(12, num_replicas=2, rank=pid, seed=0)
sampler.set_epoch(0)
local_idx = list(sampler)

s, gb = 16, 4  # crop, GLOBAL batch; per-rank 2

class TinyNet(nn.Module):
    # compile-cheap stand-in with the flagship's condition interface: the
    # test certifies the multi-host mechanics (rendezvous, per-rank batch
    # assembly, cross-host gradient all-reduce), not the UNet
    @nn.compact
    def __call__(self, x, t, cond):
        emb = nn.Dense(8)(jnp.sin(t[:, None].astype(jnp.float32)))
        h = nn.Conv(8, (3, 3), padding="SAME")(
            jnp.concatenate([x, cond["clean_img"]], -1)
        )
        h = jax.nn.silu(h + emb[:, None, None, :])
        return nn.Conv(4, (1, 1))(h)

model = TinyNet()
x = jnp.zeros((1, s, s, 4)); t = jnp.zeros((1,), jnp.int32)
cond = {"clean_img": x, "position": jnp.zeros((1, s, s, 2)),
        "iso_ratio_idx": jnp.zeros((1,), jnp.int32)}
params = jax.jit(model.init)(jax.random.PRNGKey(0), x, t, cond)["params"]
def apply_fn(p, xx, tt, c): return model.apply({"params": p}, xx, tt, c)
gd = GaussianDiffusion(apply_fn=apply_fn, schedule=make_schedule("sigmoid2", 8),
                       image_size=s, objective="pred_v")
opt = make_optimizer()
params = jax.device_put(params, replicated(mesh))
state = jax.device_put(create_train_state(params, opt, with_ema=True), replicated(mesh))
step = make_diffusion_train_step(gd, opt, donate=False)

# per-rank local half of a DETERMINISTIC global batch (so the loss is
# host-order independent): global sample i is seeded by i
rng_np = [np.random.default_rng(1000 + i) for i in local_idx[:2]]
local = {
    "noise": np.stack([r.normal(size=(s, s, 4)).astype(np.float32) * 0.1 for r in rng_np]),
    "clean_img": np.stack([r.uniform(size=(s, s, 4)).astype(np.float32) for r in rng_np]),
    "coord": np.stack([r.uniform(size=(s, s, 2)).astype(np.float32) for r in rng_np]),
    "iso_ratio_idx": np.zeros((2,), np.int32),
}
batch = shard_batch(mesh, local)
state2, metrics = step(state, batch, jax.random.PRNGKey(0))
loss = float(metrics["diffusion_loss"])
print(json.dumps({"pid": pid, "local_idx": local_idx, "loss": loss,
                  "grad_norm": float(metrics["grad_norm"])}), flush=True)
"""


@pytest.mark.slow
def test_two_process_data_parallel(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER)

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/noisediff_jax_cache")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(pid), coord],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, cwd=repo,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=850)
        assert p.returncode == 0, err.decode()[-2000:]
        outs.append(json.loads(out.decode().strip().splitlines()[-1]))

    r0, r1 = sorted(outs, key=lambda r: r["pid"])
    # disjoint strided shards (DistIterSampler semantics)
    assert not set(r0["local_idx"]) & set(r1["local_idx"])
    assert len(r0["local_idx"]) == len(r1["local_idx"]) == 6
    # both hosts observe the identical all-reduced loss/grad-norm
    assert r0["loss"] == pytest.approx(r1["loss"], rel=1e-6)
    assert r0["grad_norm"] == pytest.approx(r1["grad_norm"], rel=1e-6)
    assert np.isfinite(r0["loss"])
