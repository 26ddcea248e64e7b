"""Checkpoint / resume of the full SLAM state.

The reference has no resume capability (SURVEY.md section 5.4) — its state
lives in pointer-chased octrees. Here the entire system state (voxel map,
fixed pool, window buffers, navigation states, preintegration factors,
trajectory) is explicit arrays, so checkpointing is a flat npz dump and
resume reconstructs a SlamRunner bit-identically.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from vina_slam_tpu.core.state import NavState

# Bump whenever the saved layout or the semantics of a restored field change:
# stale-format checkpoints are refused by loaders that pin it (bench.py's
# warm-start keys include it) instead of silently restoring garbage.
CKPT_FORMAT = 2


def _flat(prefix: str, nt) -> dict:
    return {f"{prefix}.{name}": np.asarray(v) for name, v in nt._asdict().items()}


def _unflat(prefix: str, cls, d: dict):
    return cls(**{name: jnp.asarray(d[f"{prefix}.{name}"])
                  for name in cls._fields})


def save_checkpoint(path: str, runner, extra: dict | None = None) -> None:
    """Dump the full runner state; `extra` entries (small numeric arrays or
    scalars) ride along under `extra.<key>` and come back from
    load_checkpoint — bench.py uses them for warm-start bookkeeping
    (world seed / resume frame index)."""
    # in fused mode the modular fields are stale _enter_fused()-time
    # snapshots; pull the live device state back first
    runner.sync_from_fused()
    out = {}
    out.update(_flat("map", runner.map))
    out.update(_flat("pool", runner.pool))
    out["win_pts"] = np.asarray(runner.win_pts)
    out["win_var"] = np.asarray(runner.win_var)
    out["win_valid"] = np.asarray(runner.win_valid)
    out.update(_flat("x_curr", runner.x_curr))
    for i, x in enumerate(runner.x_buf):
        out.update(_flat(f"x_buf{i}", x))
    for i, f in enumerate(runner.pre_buf):
        out.update(_flat(f"pre{i}", f))
    out["meta"] = np.asarray([
        runner.win_count, runner.win_base, int(runner.motion_init_flag),
        len(runner.x_buf), len(runner.pre_buf)])
    out["jour"] = np.asarray([runner.jour])
    out["last_pos"] = runner.last_pos
    out["imupre_scale_gravity"] = np.asarray([runner.imupre_scale_gravity])
    out["ekf"] = np.concatenate([
        [float(runner.ekf.init_flag), runner.ekf.init_num,
         runner.ekf.scale_gravity, runner.ekf.last_pcl_end_time],
        runner.ekf.mean_acc, runner.ekf.mean_gyr,
    ])
    if runner.ekf.last_imu is not None:
        out["ekf_last_imu"] = np.concatenate([
            [runner.ekf.last_imu[0]], runner.ekf.last_imu[1], runner.ekf.last_imu[2]])
    out["traj_t"] = np.asarray([r[0] for r in runner.traj])
    out["traj_R"] = np.asarray([r[1] for r in runner.traj]).reshape(-1, 9)
    out["traj_p"] = np.asarray([r[2] for r in runner.traj])
    out["traj_d"] = np.asarray([bool(r[3]) if len(r) > 3 else False
                                for r in runner.traj])
    out["format"] = np.asarray([CKPT_FORMAT])
    # sticky IMU pad bucket: restoring it keeps the resumed fused step on the
    # SAME compiled program shape the checkpointing run used
    out["imu_sticky"] = np.asarray([runner._imu_sticky])
    for k, v in (extra or {}).items():
        out[f"extra.{k}"] = np.asarray(v)
    np.savez_compressed(path, **out)


def load_checkpoint(path: str, runner) -> dict:
    """Restore `runner` from `path`; returns the `extra` dict saved with it
    (empty for checkpoints written without one)."""
    from vina_slam_tpu.estimation.preintegration import PreintFactor
    from vina_slam_tpu.mapping.voxel_map import FixPool, VoxelMap

    d = dict(np.load(path, allow_pickle=False))
    runner.map = _unflat("map", VoxelMap, d)
    runner.pool = _unflat("pool", FixPool, d)
    runner.win_pts = jnp.asarray(d["win_pts"])
    runner.win_var = jnp.asarray(d["win_var"])
    runner.win_valid = jnp.asarray(d["win_valid"])
    runner.x_curr = _unflat("x_curr", NavState, d)
    wc, wb, mi, nx, npre = d["meta"].tolist()
    runner.win_count, runner.win_base = int(wc), int(wb)
    runner.motion_init_flag = bool(mi)
    runner.x_buf = [_unflat(f"x_buf{i}", NavState, d) for i in range(int(nx))]
    runner.pre_buf = [_unflat(f"pre{i}", PreintFactor, d) for i in range(int(npre))]
    runner.jour = float(d["jour"][0])
    runner.last_pos = d["last_pos"]
    runner.imupre_scale_gravity = float(d["imupre_scale_gravity"][0])
    e = d["ekf"]
    runner.ekf.init_flag = bool(e[0])
    runner.ekf.init_num = int(e[1])
    runner.ekf.scale_gravity = float(e[2])
    runner.ekf.last_pcl_end_time = float(e[3])
    runner.ekf.mean_acc = e[4:7]
    runner.ekf.mean_gyr = e[7:10]
    if "ekf_last_imu" in d:
        li = d["ekf_last_imu"]
        runner.ekf.last_imu = (float(li[0]), li[1:4], li[4:7])
    traj_d = d.get("traj_d", np.zeros(len(d["traj_t"]), bool))
    runner.traj = [
        [float(t), R.reshape(3, 3), p, bool(dg)]
        for t, R, p, dg in zip(d["traj_t"], d["traj_R"], d["traj_p"], traj_d)
    ]
    if "imu_sticky" in d:
        runner._imu_sticky = int(d["imu_sticky"][0])
    # a runner that was checkpointed mid-run in fused mode resumes fused:
    # rebuild the device-resident SteadyState from the restored fields
    runner._fused = None
    runner._pending_rows = 0
    if runner.use_fused and not runner.motion_init_flag and runner.x_buf:
        runner._enter_fused()
    return {k[len("extra."):]: v for k, v in d.items()
            if k.startswith("extra.")}
