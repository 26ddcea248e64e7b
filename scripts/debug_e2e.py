"""Instrumented end-to-end debug run on the synthetic world."""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
from vina_slam_tpu.sensor import synth
from vina_slam_tpu.pipeline.runner import SlamRunner
from tests.test_pipeline_e2e import small_cfg

NAZ = int(os.environ.get("NAZ", "180"))
NEL = int(os.environ.get("NEL", "12"))
DUR = float(os.environ.get("DUR", "4.0"))
frames, gts = synth.simulate_sequence(
    duration=DUR, n_az=NAZ, n_el=NEL, noise=0.005,
    imu_noise_gyr=1e-3, imu_noise_acc=1e-3, seed=4)
print(f"{len(frames)} frames  naz={NAZ} nel={NEL}")

runner = SlamRunner(small_cfg(), npad_map=8192, verbose=True)
print("fused:", runner.use_fused)
gtd = {i: g for i, g in enumerate(gts)}
for i, f in enumerate(frames):
    out = runner.process_frame(f)
    p = np.asarray(runner.x_curr.p)
    gt_p = gts[i][2] if i < len(gts) else None
    err = np.linalg.norm(p - gt_p) if gt_p is not None else -1
    phase = "INIT" if runner.motion_init_flag else "RUN "
    extra = ""
    if out:
        extra = f"match={out.get('match_num','-')} deg={out.get('degenerate','-')}"
    print(f"[{i:03d}] {phase} p=({p[0]:+8.3f},{p[1]:+8.3f},{p[2]:+8.3f}) "
          f"gt_err={err:7.3f} {extra}", flush=True)
    if not np.isfinite(p).all():
        print("NaN position! stopping")
        break

print("stats:", vars(runner.stats))
# in fused mode the modular fields are _enter_fused()-time snapshots whose
# buffers the donated step has already consumed — mirror the live state back
runner.sync_from_fused()
print("map entries:", int((np.asarray(runner.map.keys) != -1).sum()),
      "dropped:", int(runner.map.n_dropped))
traj = runner.trajectory()
print("traj finite:", np.isfinite(traj).all())

from vina_slam_tpu.platform.metrics import ate_rmse, associate
ref_t = np.asarray([t for (t, R, p) in gts])
ref_p = np.asarray([p for (t, R, p) in gts])
tr = runner.trajectory()
ie, ir = associate(tr[:, 0], ref_t)
print("assoc:", len(ie), "ATE:", ate_rmse(tr[ie, 1:4], ref_p[ir]))
print("last est:", tr[-1, 1:4], "last gt:", ref_p[ir[-1]] if len(ir) else None)
