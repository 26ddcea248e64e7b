#!/usr/bin/env python
"""Benchmark: steady-state scan-to-map odometry throughput on one chip.

Runs the full pipeline (deskew -> VNC IEKF -> voxel map recut -> windowed
BA -> marginalization) over a synthetic indoor sequence, times the
steady-state frames (compile + initialization excluded), and checks ATE
against ground truth.

Baseline (BASELINE.md): >= 10x real-time at the reference's 10 Hz scan
rate => 100 scans/s/chip. vs_baseline = scans_per_sec / 100.

Un-timeout-able by construction: a watchdog thread emits the best
available (possibly partial) JSON line and exits 0 when the internal
budget (BENCH_BUDGET_S, default 1500 s) is near, and SIGTERM/SIGINT do
the same — so a driver-side `timeout` always sees a parsable result.
Progress goes to stderr. Defaults are the verify-skill-healthy world
(DURATION=4, NAZ=180, NEL=12); BENCH_BIG=1 opts into the large world.
"""

import json
import os
import signal
import sys
import threading
import time

import numpy as np

_T0 = time.perf_counter()

# shared progress state the watchdog reads; the main loop keeps it honest
# by refreshing at device-sync points only
STATE = {
    "phase": "startup",
    "value": 0.0,
    "ate": float("nan"),
    "frames_timed": 0,
    "points_per_scan": 0,
    "device": "",
    "extras": {},
}
_emit_lock = threading.Lock()
_emitted = False


def log(msg):
    print(f"[bench +{time.perf_counter() - _T0:.1f}s] {msg}",
          file=sys.stderr, flush=True)


def emit(partial):
    global _emitted
    with _emit_lock:
        if _emitted:
            return
        _emitted = True
    rec = {
        "metric": "scans_per_sec_per_chip",
        "value": round(float(STATE["value"]), 3),
        "unit": "scans/s",
        "vs_baseline": round(float(STATE["value"]) / 100.0, 4),
        "ate_rmse_m": (round(float(STATE["ate"]), 5)
                       if STATE["ate"] == STATE["ate"] else None),
        "frames_timed": int(STATE["frames_timed"]),
        "points_per_scan": int(STATE["points_per_scan"]),
        "device": STATE["device"],
        **STATE["extras"],
    }
    if partial:
        rec["partial"] = True
        rec["phase_at_emit"] = STATE["phase"]
    print(json.dumps(rec), flush=True)


def _watchdog(budget_s):
    while True:
        time.sleep(1.0)
        if _emitted:
            return
        if time.perf_counter() - _T0 >= budget_s:
            log(f"watchdog: budget {budget_s}s reached in phase "
                f"{STATE['phase']}; emitting partial result")
            emit(partial=True)
            os._exit(0)


def _on_signal(signum, frame):
    log(f"signal {signum} in phase {STATE['phase']}; emitting partial result")
    emit(partial=True)
    os._exit(0)


def _probe_backend(probe_s):
    """Probe TPU attach in a subprocess with a bounded wait.

    The axon attach can HANG indefinitely during a backend outage (observed:
    >20 min), which would burn the whole bench budget in `import jax`. Probe
    in a child; if it does not report success within probe_s, leave it
    running (never signal a TPU-attaching process — the device claim wedges
    server-side) and fall back to CPU so the driver still records an honest,
    labeled number.
    """
    import subprocess
    try:
        p = subprocess.Popen(
            [sys.executable, "-c",
             "import jax; d = jax.devices(); print('OK', d[0].platform)"],
            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True)
        t_end = time.perf_counter() + probe_s
        while time.perf_counter() < t_end:
            if p.poll() is not None:
                out = (p.stdout.read() or "").strip()
                return p.returncode == 0 and out.startswith("OK")
            time.sleep(2.0)
        log(f"attach probe still running after {probe_s:.0f}s; abandoning it "
            f"(not killed: a signaled TPU attach wedges the device claim)")
        return False
    except Exception as e:  # noqa: BLE001 - any probe failure means no TPU
        log(f"attach probe error: {e}")
        return False


def _attach_monitor(limit_s, budget_s):
    """Re-exec on CPU if the in-process jax init hangs.

    Observed failure mode: the subprocess probe attaches fine, then the main
    process's own attach hangs (flapping backend). A hung attach cannot be
    interrupted in-process, so replace the whole process image with a CPU
    run carrying the remaining budget. The limit is generous (healthy attach
    is well under a minute) so a merely-slow attach is never cut off.
    """
    t_arm = time.perf_counter()
    while True:
        time.sleep(2.0)
        if STATE["phase"] != "jax-init":
            return
        if time.perf_counter() - t_arm > limit_s:
            remaining = max(120.0, budget_s - (time.perf_counter() - _T0))
            log(f"jax init still hung after {limit_s:.0f}s; re-exec on CPU "
                f"with {remaining:.0f}s budget")
            env = dict(os.environ, BENCH_CPU_FALLBACK="1",
                       BENCH_BUDGET_S=str(remaining))
            os.execve(sys.executable,
                      [sys.executable, os.path.abspath(__file__)], env)


def main():
    budget_s = float(os.environ.get("BENCH_BUDGET_S", "1500"))
    threading.Thread(target=_watchdog, args=(budget_s,), daemon=True).start()
    signal.signal(signal.SIGTERM, _on_signal)
    signal.signal(signal.SIGINT, _on_signal)

    cpu_fallback = os.environ.get("BENCH_CPU_FALLBACK", "0") == "1"
    if (not cpu_fallback
            and os.environ.get("JAX_PLATFORMS", "") == ""
            and os.environ.get("BENCH_ALLOW_CPU", "1") == "1"):
        probe_s = float(os.environ.get("BENCH_ATTACH_PROBE_S", "300"))
        STATE["phase"] = "attach-probe"
        if not _probe_backend(min(probe_s, budget_s * 0.3)):
            log("TPU backend unavailable; falling back to CPU "
                "(set BENCH_ALLOW_CPU=0 to refuse instead)")
            cpu_fallback = True

    STATE["phase"] = "jax-init"
    if not cpu_fallback and os.environ.get("BENCH_ALLOW_CPU", "1") == "1":
        limit = float(os.environ.get("BENCH_ATTACH_MAIN_S", "360"))
        threading.Thread(target=_attach_monitor, args=(limit, budget_s),
                         daemon=True).start()

    import jax

    # NOTE: the axon TPU plugin ignores the JAX_PLATFORMS env var; the
    # config update is the only honored way to pick a backend, so re-apply
    # an explicit env request here as well as the outage fallback
    env_plat = os.environ.get("JAX_PLATFORMS", "")
    if cpu_fallback:
        jax.config.update("jax_platforms", "cpu")
    elif env_plat:
        jax.config.update("jax_platforms", env_plat)

    jax.config.update("jax_enable_x64", True)
    # persistent compile cache: the fused pipeline program is large and its
    # (remote) compile dominates cold-start; cache it across runs
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    # cache EVERYTHING: the axon remote compile costs ~0.5 s RTT per
    # program, and the init path dispatches hundreds of small programs
    # that a 5 s write-threshold re-pays on every run
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    from vina_slam_tpu.core.config import SlamConfig
    from vina_slam_tpu.pipeline.runner import SlamRunner
    from vina_slam_tpu.platform.metrics import ate_rmse, associate
    from vina_slam_tpu.sensor import synth

    big = os.environ.get("BENCH_BIG", "0") == "1"
    if cpu_fallback:
        # emergency-fallback world: small enough that CPU compile + warmup +
        # a timed stretch fit the budget (120x8 clears the init gates the
        # known-rejected 96x8 world trips; see verify SKILL.md)
        d_dur, d_az, d_el = "2.5", "120", "8"
    else:
        # BENCH_BIG: realistic Mid-360-class scan density (>=20k raw pts/
        # scan through the FULL-RES odometry cloud — the reference keeps
        # both the full and downsampled clouds, local_mapping.cpp:396-410)
        d_dur, d_az, d_el = (("8.0", "1024", "20") if big
                             else ("4.0", "180", "12"))
    duration = float(os.environ.get("BENCH_DURATION", d_dur))
    n_az = int(os.environ.get("BENCH_NAZ", d_az))
    n_el = int(os.environ.get("BENCH_NEL", d_el))
    # BENCH_SEQS > 1 drives N sequences through ONE sharded step, one
    # sequence per device with native control flow (production form).
    n_seqs = int(os.environ.get("BENCH_SEQS", "1"))
    # BENCH_VMAP >= 2 batches N sequences on ONE chip via the vmapped step
    # (multiseq.make_batched_step): the single-chip batched-deployment
    # number. Honest in steady state — the window-full branch is taken
    # every step once the window fills, so vmap's cond->select costs only
    # the identity-branch copy (which penalizes, never inflates, the
    # number). Reported with mode/per-seq labels so it can't be confused
    # with single-sequence latency.
    n_vmap = int(os.environ.get("BENCH_VMAP", "0"))

    STATE["device"] = str(jax.devices()[0])
    STATE["phase"] = "setup"
    log(f"device: {STATE['device']}")
    if cpu_fallback:
        STATE["extras"]["fallback"] = "cpu_tpu_unavailable"
    if n_vmap >= 2 and n_seqs > 1:
        log("ERROR: BENCH_VMAP and BENCH_SEQS are mutually exclusive")
        sys.exit(2)
    if n_seqs > 1 and len(jax.devices()) < n_seqs:
        # a vmapped fallback would SILENTLY execute both cond branches and
        # mis-measure; refuse instead of reporting a wrong number (use
        # BENCH_VMAP to opt into the labeled batched mode)
        log(f"ERROR: BENCH_SEQS={n_seqs} needs {n_seqs} devices, "
            f"have {len(jax.devices())}. Refusing the vmapped fallback "
            f"(it executes both cond branches and under-reports); "
            f"set BENCH_VMAP={n_seqs} for the labeled single-chip "
            f"batched mode.")
        sys.exit(2)

    def make_cfg(big_cfg):
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
        # BA factor pad: measured fill on this world is ~420 mean / 523 max
        # of 1024 (scripts/lm_stats.py); BENCH_MAX_VOXELS_BA trials sizing
        cfg.tpu.max_voxels_ba = int(
            os.environ.get("BENCH_MAX_VOXELS_BA", "1024"))
        cfg.tpu.max_new_voxels = 1024
        npad = "3072"
        if big_cfg:
            # a 20k-ray sweep of the room resolves ~8k unique 0.1 m surface
            # voxels; larger tables + BA pad to match
            cfg.tpu.map_capacity = 1 << 16
            cfg.tpu.fix_pool_capacity = 1 << 16
            cfg.tpu.max_new_voxels = 4096
            cfg.tpu.max_voxels_ba = int(os.environ.get("BENCH_MAX_VOXELS_BA",
                                                       "2048"))
            # the freshly pushed frame re-descends ALL its npad points in
            # recut's verify wave; a cap below npad+movers forces straggler
            # waves EVERY scan (2-3x recut cost — measured via
            # scripts/micro_big.py)
            cfg.tpu.refind_cap = 12288
            npad = "8192"
        return cfg, npad

    cfg, d_npad = make_cfg(big)

    import hashlib

    from vina_slam_tpu.platform import checkpoint as ck

    ckpt_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "bench_ckpt")
    use_ckpt = os.environ.get("BENCH_CKPT", "1") == "1"

    def make_world(seed, w_dur, w_az, w_el):
        if os.environ.get("BENCH_WORLD", "room") == "yard":
            # second world family (sensor/worldgen.py): curved + cluttered
            # outdoor yard; BENCH_MOVER=1 adds the dynamic box
            from vina_slam_tpu.sensor import worldgen
            frames, gts = worldgen.simulate_yard_sequence(
                duration=w_dur, n_az=w_az, n_el=w_el, noise=0.005,
                seed=seed, mover=os.environ.get("BENCH_MOVER", "0") == "1")
            STATE["extras"]["world"] = "yard"
        else:
            frames, gts = synth.simulate_sequence(
                duration=w_dur, n_az=w_az, n_el=w_el, noise=0.005,
                imu_noise_gyr=1e-3, imu_noise_acc=1e-3, seed=seed)
        return frames, gts

    def warm_runner(seed, w_cfg=None, w_npad=None, w_dur=None, w_az=None,
                    w_el=None, name="small"):
        """Build a runner + sequence and reach the fused steady state; return
        (runner, remaining frames, all frames, gts) or None when the
        sequence never gets there (init-unfriendly trajectory for this
        seed). Warm-starts from a committed bench_ckpt/ checkpoint when one
        matches (format, world, program key, jax version, platform) — the
        full init phase is a ~1,100 s compile storm through the remote
        tunnel (BENCH.md cold-start section) and is the reason BENCH_r04
        recorded 0.0; with a checkpoint only the fused step compiles, and
        .jax_cache (committed) covers even that."""
        w_cfg = cfg if w_cfg is None else w_cfg
        w_npad = (int(os.environ.get("BENCH_NPAD_MAP", d_npad))
                  if w_npad is None else int(w_npad))
        w_dur = duration if w_dur is None else w_dur
        w_az = n_az if w_az is None else w_az
        w_el = n_el if w_el is None else w_el
        STATE["phase"] = f"synth({name},seed={seed})"
        frames, gts = make_world(seed, w_dur, w_az, w_el)
        STATE["points_per_scan"] = int(
            np.mean([f.scan.pts.shape[0] for f in frames]))
        # map-push bucket (small world): the downsampled cloud is ~2.2k
        # points at these settings (the <2000 half-size retry fires and
        # lands ~2160); 3072 cuts every (W, Np) window op 25% vs 4096
        runner = SlamRunner(w_cfg, npad_map=w_npad)
        # key on STATE-shape-relevant structure only (ms / W / npad), not the
        # full fused_program_key: the checkpoint payload is program-agnostic
        # (load_checkpoint restores plain arrays), so cfgs-tuning changes
        # (e.g. recut_defer) keep warm-starts valid; a genuine shape
        # mismatch still fails the load and falls back to full warmup
        key_src = repr((ck.CKPT_FORMAT, name, w_dur, w_az, w_el, seed,
                        os.environ.get("BENCH_WORLD", "room"),
                        runner.ms, runner.W, runner.npad_map,
                        jax.__version__, jax.devices()[0].platform))
        key = hashlib.sha1(key_src.encode()).hexdigest()[:10]
        path = os.path.join(ckpt_dir, f"{name}_s{seed}_{key}.npz")

        if use_ckpt and os.path.exists(path):
            try:
                STATE["phase"] = f"ckpt-load({name},seed={seed})"
                extras = ck.load_checkpoint(path, runner)
                split = int(extras["split"])
                assert int(extras["seed"]) == seed
                assert runner._fused is not None
                assert len(frames) - split >= 5
                # two untimed frames pay the fused-step compile (cached)
                STATE["phase"] = f"ckpt-warm({name},seed={seed})"
                for f in frames[split:split + 2]:
                    runner.process_frame(f)
                runner.sync()
                STATE["extras"].setdefault("warm_start", {})[name] = "ckpt"
                log(f"{name}: warm-start from {os.path.basename(path)} "
                    f"(resume at frame {split}, "
                    f"{len(frames) - split - 2} to time)")
                return runner, frames[split + 2:], frames, gts
            except Exception as e:  # noqa: BLE001 — any mismatch => full path
                log(f"{name}: checkpoint load failed ({e!r}); full warmup")
                runner = SlamRunner(w_cfg, npad_map=w_npad)

        warmup = 0
        split = len(frames)
        t_steady0 = None
        STATE["phase"] = f"warmup({name},seed={seed})"
        for i, f in enumerate(frames):
            out = runner.process_frame(f)
            if not runner.motion_init_flag and out is not None:
                if warmup == 0:
                    runner.sync()
                    t_steady0 = time.perf_counter()
                warmup += 1
                STATE["phase"] = (f"warmup({name},seed={seed},frame={i},"
                                  f"steady={warmup})")
                if warmup >= 2 and name == "small":
                    # provisional rate so a watchdog partial is never 0.0
                    # (the real timed loop overwrites these)
                    runner.sync()
                    el = time.perf_counter() - t_steady0
                    STATE["value"] = (warmup - 1) / el
                    STATE["frames_timed"] = warmup - 1
                    STATE["extras"]["provisional"] = "warmup_estimate"
            if i % 5 == 0:
                log(f"warmup {name} seed={seed} frame={i} steady={warmup}")
            if warmup >= 3:
                split = i + 1
                break
            if time.perf_counter() > _T0 + budget_s - 60.0:
                log(f"warmup {name} seed={seed}: budget nearly exhausted")
                break
        if runner._fused is None or warmup < 3 or len(frames) - split < 3:
            return None
        if use_ckpt:
            try:
                os.makedirs(ckpt_dir, exist_ok=True)
                ck.save_checkpoint(path, runner,
                                   extra={"seed": seed, "split": split})
                log(f"{name}: saved warm-start checkpoint "
                    f"{os.path.basename(path)}")
            except Exception as e:  # noqa: BLE001 — saving is best-effort
                log(f"{name}: checkpoint save failed: {e!r}")
        STATE["extras"].setdefault("warm_start", {})[name] = "full"
        return runner, frames[split:], frames, gts

    def seq_ate(traj, gts):
        ref_t = np.asarray([t for (t, R, p) in gts])
        ref_p = np.asarray([p for (t, R, p) in gts])
        if traj.shape[0] < 3:
            return float("nan")
        ie, ir = associate(traj[:, 0], ref_t)
        return ate_rmse(traj[ie, 1:4], ref_p[ir]) if len(ie) >= 3 else float("nan")

    # leave headroom for the final sync + ATE bookkeeping
    deadline = _T0 + budget_s - 30.0

    if n_seqs <= 1 and n_vmap < 2:
        pack = None
        seed = 4
        while pack is None and seed < 12:
            pack = warm_runner(seed)
            seed += 1
        if pack is None:
            log("ERROR: no seed reached steady state")
            emit(partial=True)
            return
        runner, rest, frames, gts = pack
        STATE["points_per_scan"] = int(
            np.mean([f.scan.pts.shape[0] for f in frames]))
        log(f"warmup done ({len(rest)} frames to time)")
        runner.sync()
        STATE["phase"] = "timed"
        t0 = time.perf_counter()
        n_timed = 0
        # sync every SYNC_EVERY frames so the watchdog's running rate is
        # real compute, not dispatch run-ahead
        SYNC_EVERY = 8
        for f in rest:
            runner.process_frame(f)
            n_timed += 1
            if n_timed % SYNC_EVERY == 0:
                runner.sync()
                el = time.perf_counter() - t0
                STATE["frames_timed"] = n_timed
                STATE["value"] = n_timed / el
                if time.perf_counter() > deadline:
                    log(f"deadline: stopping after {n_timed} timed frames")
                    break
        runner.sync()
        elapsed = time.perf_counter() - t0
        scans_per_sec = n_timed / elapsed if n_timed else 0.0
        STATE["phase"] = "ate"
        ate = seq_ate(runner.trajectory(), gts)
        extras = {}
        # publish the primary result before the secondary capture so a
        # budget/driver kill still records the headline number
        STATE["extras"].pop("provisional", None)
        STATE.update({"value": scans_per_sec, "ate": ate,
                      "frames_timed": n_timed,
                      "points_per_scan": int(np.mean(
                          [f.scan.pts.shape[0] for f in frames]))})

        # ---- secondary capture at realistic Mid-360-class density ----
        # >=20k raw pts/scan through the FULL-RES odometry cloud (the
        # reference keeps both clouds, local_mapping.cpp:396-410): the
        # 2.2k-pt small-world number alone says little about 10x real-time
        # on real sensors. Runs only when enough budget remains after the
        # primary; its program shapes compile once and persist in the cache.
        min_s = float(os.environ.get("BENCH_BIG_MIN_S", "420"))
        if (not big and os.environ.get("BENCH_SKIP_BIG", "0") != "1"
                and not cpu_fallback
                and time.perf_counter() + min_s < _T0 + budget_s - 30.0):
            STATE["phase"] = "big-world"
            log("secondary capture: big world (>=20k pts/scan)")
            big_cfg, big_npad = make_cfg(True)
            try:
                # points_per_scan is shared watchdog state; restore the
                # primary's value after the big-world warm_runner touches it
                pps_primary = STATE["points_per_scan"]
                b_pack = warm_runner(4, w_cfg=big_cfg, w_npad=big_npad,
                                     w_dur=8.0, w_az=1024, w_el=20,
                                     name="big")
                STATE["points_per_scan"] = pps_primary
                if b_pack is not None:
                    b_runner, b_rest, b_frames, b_gts = b_pack
                    b_runner.sync()
                    STATE["phase"] = "big-world-timed"
                    t0b = time.perf_counter()
                    nb = 0
                    for f in b_rest:
                        b_runner.process_frame(f)
                        nb += 1
                        if nb % 4 == 0:
                            b_runner.sync()
                            if time.perf_counter() > _T0 + budget_s - 45.0:
                                break
                    b_runner.sync()
                    elb = time.perf_counter() - t0b
                    b_ate = seq_ate(b_runner.trajectory(), b_gts)
                    extras["big_world"] = {
                        "points_per_scan": int(np.mean(
                            [f.scan.pts.shape[0] for f in b_frames])),
                        "scans_per_sec": round(nb / elb, 3) if nb else 0.0,
                        "frames_timed": nb,
                        "ate_rmse_m": round(float(b_ate), 5),
                    }
                    log(f"big world: {nb} frames at "
                        f"{nb / elb:.2f} scans/s, ate={b_ate * 1e3:.2f} mm")
                else:
                    extras["big_world"] = {"error": "no steady state reached"}
            except Exception as e:  # noqa: BLE001 — never kill the primary
                log(f"big-world capture failed: {e}")
                extras["big_world"] = {"error": str(e)[:200]}
    else:
        # multi-sequence throughput: n_seqs independent pipelines advance in
        # lockstep, one sequence per device (parallel/multiseq.py) — the
        # production form for multi-robot / multi-session mapping.
        import jax.numpy as jnp
        from vina_slam_tpu.parallel import multiseq

        n_want = n_vmap if n_vmap >= 2 else n_seqs
        packs = []
        seed = 4
        while len(packs) < n_want and seed < 4 + 4 * n_want:
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
        if n_vmap >= 2:
            step = multiseq.make_batched_step(
                r0.ms, r0.W, cfg.tpu.max_voxels_ba, r0._cfgs)
        else:
            from vina_slam_tpu.parallel import mesh as pmesh
            msh = pmesh.make_mesh(n_seqs)
            stacked = multiseq.shard_states(stacked, msh)
            step = multiseq.make_sharded_step(
                msh, r0.ms, r0.W, cfg.tpu.max_voxels_ba, r0._cfgs)

        def batch_args(i):
            # force one bucket so per-sequence IMU arrays stack
            from vina_slam_tpu.core.constants import IMU_BUCKET
            per = [r.fused_args(fl[i], imu_bucket=IMU_BUCKET)
                   for r, fl in zip(runners, rests)]
            assert all(a is not None for a in per)
            return jax.tree_util.tree_map(lambda *x: jnp.stack(x), *per)

        n_avail = min(len(fl) for fl in rests)
        # untimed first batched step: pays the sharded compile
        STATE["phase"] = "multiseq-compile"
        stacked = step(stacked, batch_args(0))
        jax.block_until_ready(stacked.traj_head)
        STATE["phase"] = "timed"
        t0 = time.perf_counter()
        n_timed = 0
        for i in range(1, n_avail):
            stacked = step(stacked, batch_args(i))
            n_timed += 1
            if n_timed % 8 == 0:
                jax.block_until_ready(stacked.traj_head)
                el = time.perf_counter() - t0
                STATE["frames_timed"] = n_timed
                STATE["value"] = n_seqs * n_timed / el
                if time.perf_counter() > deadline:
                    break
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
            "mode": "vmap_single_chip" if n_vmap >= 2 else "sharded_multichip",
            "sequences": n_seqs,
            "scans_per_sec_per_seq": round(scans_per_sec / n_seqs, 3),
            "ate_per_seq_mm": [round(a * 1e3, 2) for a in ates],
        }

    STATE.update({
        "value": scans_per_sec,
        "ate": ate,
        "frames_timed": n_timed,
        "points_per_scan": int(np.mean([f.scan.pts.shape[0] for f in frames])),
        "extras": {**STATE["extras"], **extras},
    })
    emit(partial=False)


if __name__ == "__main__":
    main()
