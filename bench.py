#!/usr/bin/env python
"""Benchmark: steady-state scan-to-map odometry throughput on one chip.

Runs the full pipeline (deskew -> VNC IEKF -> voxel map recut -> windowed
BA -> marginalization) over a synthetic indoor sequence, times the
steady-state frames (compile + initialization excluded), and checks ATE
against ground truth.

Baseline (BASELINE.md): >= 10x real-time at the reference's 10 Hz scan
rate => 100 scans/s/chip. vs_baseline = scans_per_sec / 100.
"""

import json
import os
import sys
import time

import numpy as np


def main():
    import jax

    jax.config.update("jax_enable_x64", True)
    # persistent compile cache: the fused pipeline program is large and its
    # (remote) compile dominates cold-start; cache it across runs
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from vina_slam_tpu.core.config import SlamConfig
    from vina_slam_tpu.pipeline.runner import SlamRunner
    from vina_slam_tpu.platform.metrics import ate_rmse
    from vina_slam_tpu.sensor import synth

    duration = float(os.environ.get("BENCH_DURATION", "12.0"))
    n_az = int(os.environ.get("BENCH_NAZ", "360"))
    n_el = int(os.environ.get("BENCH_NEL", "16"))
    # BENCH_SEQS > 1 drives N sequences through ONE batched fused step.
    # With multiple devices, multiseq.make_sharded_step runs one sequence
    # per device with native control flow (production form); on a single
    # chip it falls back to the vmapped step, which does NOT pay (vmapped
    # conds execute both branches). The default single-chip bench stays 1.
    n_seqs = int(os.environ.get("BENCH_SEQS", "1"))

    cfg = SlamConfig()
    cfg.odometry.voxel_size = 1.0
    cfg.odometry.down_size = 0.1
    cfg.local_ba.win_size = 10
    cfg.local_ba.max_layer = 2
    cfg.local_ba.plane_eigen_value_thre = [4.0, 4.0, 4.0, 4.0]
    cfg.local_ba.imu_coef = 2e-4
    cfg.general.if_BA = 1
    # size the table to the synthetic world (~10k voxels) like the
    # reference sizes its hash map; map-wide ops cost per CAPACITY row
    cfg.tpu.map_capacity = 1 << 15
    cfg.tpu.fix_pool_capacity = 1 << 15
    cfg.tpu.max_voxels_ba = 1024
    cfg.tpu.max_new_voxels = 1024

    from vina_slam_tpu.platform.metrics import associate

    def warm_runner(seed):
        """Build a runner + sequence, run init + 3 steady frames; return
        (runner, remaining frames, all frames, gts) or None when the
        sequence never reaches the fused steady state (init-unfriendly
        trajectory for this seed)."""
        frames, gts = synth.simulate_sequence(
            duration=duration, n_az=n_az, n_el=n_el, noise=0.005,
            imu_noise_gyr=1e-3, imu_noise_acc=1e-3, seed=seed)
        # map-push bucket: the downsampled cloud is ~2-3k points at these
        # settings; 4096 halves every (W, Np) window op vs the 8192 default
        runner = SlamRunner(cfg, npad_map=4096)
        warmup = 0
        split = len(frames)
        for i, f in enumerate(frames):
            out = runner.process_frame(f)
            if not runner.motion_init_flag and out is not None:
                warmup += 1
            if warmup >= 3:
                split = i + 1
                break
        if runner._fused is None or warmup < 3 or len(frames) - split < 3:
            return None
        return runner, frames[split:], frames, gts

    def seq_ate(traj, gts):
        ref_t = np.asarray([t for (t, R, p) in gts])
        ref_p = np.asarray([p for (t, R, p) in gts])
        if traj.shape[0] < 3:
            return float("nan")
        ie, ir = associate(traj[:, 0], ref_t)
        return ate_rmse(traj[ie, 1:4], ref_p[ir]) if len(ie) >= 3 else float("nan")

    if n_seqs <= 1:
        pack = None
        seed = 4
        while pack is None:
            pack = warm_runner(seed)
            seed += 1
        runner, rest, frames, gts = pack
        runner.sync()
        t0 = time.perf_counter()
        n_timed = 0
        for f in rest:
            runner.process_frame(f)
            n_timed += 1
        runner.sync()
        elapsed = time.perf_counter() - t0
        scans_per_sec = n_timed / elapsed if n_timed else 0.0
        ate = seq_ate(runner.trajectory(), gts)
        extras = {}
    else:
        # multi-sequence throughput: n_seqs independent pipelines advance in
        # lockstep through ONE vmapped fused step (parallel/multiseq.py) —
        # the production form for multi-robot / multi-session mapping, and
        # how small per-stage kernels saturate the chip.
        import jax.numpy as jnp
        from vina_slam_tpu.parallel import multiseq

        packs = []
        seed = 4
        while len(packs) < n_seqs and seed < 4 + 4 * n_seqs:
            p = warm_runner(seed)
            seed += 1
            if p is not None:
                packs.append(p)
        n_seqs = len(packs)
        runners = [p[0] for p in packs]
        rests = [p[1] for p in packs]
        all_frames = [p[2] for p in packs]
        gts_list = [p[3] for p in packs]
        r0 = runners[0]
        stacked = multiseq.stack_states([r._fused for r in runners])
        if len(jax.devices()) >= n_seqs > 1:
            from vina_slam_tpu.parallel import mesh as pmesh
            msh = pmesh.make_mesh(n_seqs)
            stacked = multiseq.shard_states(stacked, msh)
            step = multiseq.make_sharded_step(
                msh, r0.ms, r0.W, cfg.tpu.max_voxels_ba, r0._cfgs)
        else:
            step = multiseq.make_batched_step(
                r0.ms, r0.W, cfg.tpu.max_voxels_ba, r0._cfgs)

        def batch_args(i):
            # force one bucket so per-sequence IMU arrays stack
            from vina_slam_tpu.core.constants import IMU_BUCKET
            per = [r.fused_args(fl[i], imu_bucket=IMU_BUCKET)
                   for r, fl in zip(runners, rests)]
            assert all(a is not None for a in per)
            return jax.tree_util.tree_map(lambda *x: jnp.stack(x), *per)

        n_avail = min(len(fl) for fl in rests)
        # untimed first batched step: pays the vmapped compile
        stacked = step(stacked, batch_args(0))
        jax.block_until_ready(stacked.traj_head)
        t0 = time.perf_counter()
        n_timed = 0
        for i in range(1, n_avail):
            stacked = step(stacked, batch_args(i))
            n_timed += 1
        jax.block_until_ready(stacked.traj_head)
        elapsed = time.perf_counter() - t0
        scans_per_sec = n_seqs * n_timed / elapsed if n_timed else 0.0

        # per-sequence ATE from the device trajectory rings
        from vina_slam_tpu.pipeline import fused as fmod
        heads = np.asarray(stacked.traj_head)
        rings = np.asarray(stacked.traj)
        ates = []
        for b in range(n_seqs):
            head = int(heads[b])
            n_rows = min(head, fmod.TRAJ_CAP)
            rows = [rings[b][k % fmod.TRAJ_CAP] for k in range(head - n_rows, head)]
            traj = np.asarray([[r[0], r[1], r[2], r[3]] for r in rows])
            ates.append(seq_ate(traj, gts_list[b]))
        ate = float(np.nanmean(ates))
        frames = all_frames[0]
        extras = {
            "sequences": n_seqs,
            "scans_per_sec_per_seq": round(scans_per_sec / n_seqs, 3),
            "ate_per_seq_mm": [round(a * 1e3, 2) for a in ates],
        }

    print(json.dumps({
        "metric": "scans_per_sec_per_chip",
        "value": round(scans_per_sec, 3),
        "unit": "scans/s",
        "vs_baseline": round(scans_per_sec / 100.0, 4),
        "ate_rmse_m": round(ate, 5),
        "frames_timed": n_timed,
        "points_per_scan": int(np.mean([f.scan.pts.shape[0] for f in frames])),
        "device": str(jax.devices()[0]),
        **extras,
    }))


if __name__ == "__main__":
    main()
