"""End-to-end verify drive (see .claude/skills/verify): real data, real
chip, GT comparison + the three cheap invariants.  Prints PASS/FAIL
lines and exits nonzero on any failure."""
import sys

import numpy as np

from cvo_rgbd_tpu import MATLAB_PARAMS, align_jit, pad_cloud
from cvo_rgbd_tpu.io import read_pcd
from cvo_rgbd_tpu.io.tum import read_trajectory
from cvo_rgbd_tpu.utils import grid_downsample, range_filter

DS = "/root/reference/data/rgbd_dataset/freiburg1_desk"
ts = ["1305031453.359684", "1305031453.391690"]
clouds = []
for t in ts:
    d = read_pcd(f"{DS}/pcd_ds/{t}.pcd")
    pos, col = range_filter(d["positions"], d["colors"])
    pos, col = grid_downsample(pos, col, 0.05)
    clouds.append((pos, col * 255.0))
cap = 128 * ((max(c[0].shape[0] for c in clouds) + 127) // 128)
pads = [pad_cloud(p, c, capacity=cap) for p, c in clouds]

fails = []


def check(name, ok, detail=""):
    print(f"{'PASS' if ok else 'FAIL'} {name} {detail}")
    if not ok:
        fails.append(name)


import jax

print("backend:", jax.default_backend(), jax.devices())

# canonical drive
res = align_jit(MATLAB_PARAMS, pads[0], pads[1])
tf, iters, conv = np.asarray(res.tf), int(res.iterations), bool(res.converged)
gt = read_trajectory(f"{DS}/groundtruth.txt")
keys = np.array(sorted(gt))


def nearest(t):
    return gt[keys[np.argmin(np.abs(keys - float(t)))]]


rel_gt = np.linalg.inv(nearest(ts[0])) @ nearest(ts[1])
terr = np.linalg.norm(tf[:3, 3] - rel_gt[:3, 3])
dR = tf[:3, :3].T @ rel_gt[:3, :3]
ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
check("canonical_pair", terr <= 0.008 and ang < 1.0 and conv,
      f"terr={terr*1000:.2f}mm ang={ang:.3f}deg iters={iters} conv={conv}")

# self-registration: exact identity at iteration 0
res0 = align_jit(MATLAB_PARAMS, pads[0], pads[0])
check("self_registration",
      int(res0.iterations) == 0
      and np.array_equal(np.asarray(res0.tf), np.eye(4, dtype=np.float32)),
      f"iters={int(res0.iterations)} "
      f"max|tf-I|={np.abs(np.asarray(res0.tf)-np.eye(4)).max():.2e}")

# known-transform recovery
from cvo_rgbd_tpu import se3 as _se3

w = np.array([0.02, -0.015, 0.01], np.float32)
u = np.array([0.01, 0.02, -0.015], np.float32)
Hk = np.asarray(_se3.exp_se3(np.concatenate([w, u])))
Rk, Tk = Hk[:3, :3], Hk[:3, 3]
pos1, col1 = clouds[0]
moved = pad_cloud(pos1 @ Rk.T + Tk, col1, capacity=cap)
# exact-recovery check runs at the C++ shipped stops (cvo.cpp:40-41):
# the MATLAB eps=5e-4 set converges ~7mm out on this pair by design
import dataclasses

TIGHT = dataclasses.replace(MATLAB_PARAMS, eps=5e-5, eps_2=1e-5)
resk = align_jit(TIGHT, pads[0], moved)
tfk = np.asarray(resk.tf)
terr_k = np.linalg.norm(tfk[:3, 3] - (-Rk.T @ Tk))
ang_k = np.degrees(np.arccos(np.clip(
    (np.trace(tfk[:3, :3].T @ Rk.T) - 1) / 2, -1, 1)))
check("known_transform", terr_k < 0.004 and ang_k < 0.5,
      f"terr={terr_k*1000:.2f}mm ang={ang_k:.3f}deg "
      f"iters={int(resk.iterations)}")

# empty moving cloud: converge at iter 0 with finite tf
import jax.numpy as jnp

empty = pads[1]._replace(mask=jnp.zeros_like(pads[1].mask))
rese = align_jit(MATLAB_PARAMS, pads[0], empty)
check("empty_cloud",
      int(rese.iterations) == 0 and np.isfinite(np.asarray(rese.tf)).all(),
      f"iters={int(rese.iterations)}")

print("VERIFY", "FAIL" if fails else "OK", fails)
sys.exit(1 if fails else 0)
