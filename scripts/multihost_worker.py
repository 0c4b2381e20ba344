"""Multi-host worker: join the jax.distributed cluster (PLVIO_* env)
and run one cross-process chain-partitioned BA solve on the GLOBAL
mesh.  Launched by tests/test_multihost_smoke.py with 2 local
processes; the identical entry works across real hosts (same env vars,
coordinator on host 0).

Usage: PLVIO_COORDINATOR=host:port PLVIO_NUM_PROCS=N PLVIO_PROC_ID=i \
       python scripts/multihost_worker.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
if "xla_force_host_platform_device_count" not in \
        os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=2"
                               ).strip()

import jax
jax.config.update("jax_platforms", "cpu")

from plvio_tpu.parallel import multihost as MH

assert MH.init_from_env(), "PLVIO_COORDINATOR env missing"

import numpy as np
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from plvio_tpu.parallel import chain_ba as CB
from plvio_tpu.solver.residuals import PinholeK
from plvio_tpu.utils import lie


def main():
    mesh = MH.global_mesh("lm")
    n_dev = int(np.prod(mesh.devices.shape))
    pid = jax.process_index()
    print(f"[proc {pid}] {n_dev} global devices "
          f"({jax.local_device_count()} local)", flush=True)

    K = PinholeK(fx=100.0, fy=100.0, cx=64.0, cy=48.0)
    rng = np.random.default_rng(0)
    C = 2 * n_dev
    chain_poses, pts, okf, opt, ouv = [], [], [], [], []
    for c in range(C):
        chain_poses.append(np.concatenate(
            [np.eye(3, dtype=np.float32),
             np.array([[0.3 * c], [0.0], [0.0]], np.float32)], 1))
    chain_poses = np.stack(chain_poses)
    for c in range(C):
        for k in range(6):
            X = np.array([0.3 * c + rng.uniform(-1, 1),
                          rng.uniform(-1, 1), rng.uniform(2, 4)],
                         np.float32)
            pid_ = len(pts)
            pts.append(X)
            for c2 in range(max(0, c - 1), min(C, c + 2)):
                pc = chain_poses[c2, :, :3] @ X + chain_poses[c2, :, 3]
                okf.append(c2)
                opt.append(pid_)
                ouv.append([K.fx * pc[0] / pc[2] + K.cx,
                            K.fy * pc[1] / pc[2] + K.cy])

    cdata, layout = CB.partition_chain(
        n_dev, 1, np.arange(C), chain_poses,
        np.asarray(okf), np.asarray(opt),
        np.asarray(ouv, np.float32), np.ones(len(okf), np.float32),
        np.asarray(pts, np.float32), fixed_kf=np.array([0, 1]))
    # globalize the host-built shard tables (each process transfers
    # only its own shards)
    spec = P("lm")
    cdata = CB.ChainBAData(*[
        MH.host_local_view(np.asarray(f), mesh, spec) for f in cdata])
    run = CB.make_chain_ba(K, mesh, "lm", layout["Wh"],
                           cdata.pt_xyz.shape[1], cdata.obs_kf.shape[1],
                           outer_iters=2, halo=1)
    poses_out, pts_out = run(cdata)
    jax.block_until_ready(poses_out)
    cs = MH.addressable_checksum(poses_out)
    assert np.isfinite(cs), cs
    print(f"[proc {pid}] MULTIHOST_OK checksum={cs:.3f}", flush=True)


if __name__ == "__main__":
    main()
