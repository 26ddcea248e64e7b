"""Lifecycle behaviors: eviction cadence, degeneracy-flag plumbing, and
fused-mode checkpoint/resume (VERDICT round-1 items 1/6/7 + ADVICE high)."""

from types import SimpleNamespace

import jax.numpy as jnp
import numpy as np
import pytest

from vina_slam_tpu.core.config import SlamConfig
from vina_slam_tpu.mapping import voxel_hash as vh
from vina_slam_tpu.pipeline import fused as fmod
from vina_slam_tpu.pipeline.runner import SlamRunner


def tiny_cfg():
    cfg = SlamConfig()
    cfg.tpu.map_capacity = 1 << 10
    cfg.tpu.fix_pool_capacity = 1 << 10
    cfg.tpu.max_voxels_ba = 256
    cfg.tpu.max_new_voxels = 512
    return cfg


class TestEvictionCadence:
    def test_no_rebuild_without_stale_entries(self):
        """jour past 700 alone must NOT trigger the full-table rebuild
        (reference frees only voxels >700 behind, local_mapping.cpp:317-344);
        a rebuild requires entries whose stamp is actually stale."""
        r = SlamRunner(tiny_cfg(), npad_map=256)
        r.jour = 800.0
        # one voxel visited RECENTLY (jour stamp 750 -> age 50 < 700)
        r.map = r.map._replace(
            keys=r.map.keys.at[0].set(jnp.int64(123)),
            jour=r.map.jour.at[0].set(750.0))
        r.release_flag = True
        r._journey_update()
        assert r.stats.evictions == 0

    def test_rebuild_when_stale(self):
        r = SlamRunner(tiny_cfg(), npad_map=256)
        r.jour = 800.0
        # stale voxel: stamped at jour 0, now 800 behind
        r.map = r.map._replace(
            keys=r.map.keys.at[0].set(vh.encode(
                0, jnp.asarray([[1, 2, 3]], jnp.int32))[0]),
            jour=r.map.jour.at[0].set(0.0))
        r.release_flag = True
        r._journey_update()
        assert r.stats.evictions == 1
        # the stale entry is gone from the rebuilt table
        assert int(jnp.sum(r.map.keys != vh.EMPTY_KEY)) == 0


class TestDegenerateFlag:
    def test_drain_traj_reads_ring_column_13(self):
        """The fused traj ring stores the per-scan degeneracy verdict in
        column 13 (odometry.cpp:244-254); drain_traj must surface it."""
        r = SlamRunner(tiny_cfg(), npad_map=256)
        ring = np.zeros((fmod.TRAJ_CAP, fmod.TRAJ_COLS))
        for k, (t, deg) in enumerate([(1.0, 1.0), (2.0, 0.0), (3.0, 1.0)]):
            ring[k, 0] = t
            ring[k, 1:4] = [k, 0, 0]
            ring[k, 4:13] = np.eye(3).ravel()
            ring[k, 13] = deg
        r._fused = SimpleNamespace(
            traj=jnp.asarray(ring), traj_head=jnp.asarray(3),
            x=r.x_curr, degrade_cnt=jnp.asarray(2))
        r._pending_rows = 3
        r._traj_base = 0
        r.drain_traj()
        assert [row[3] for row in r.traj] == [True, False, True]
        np.testing.assert_array_equal(
            r.degenerate_flags(), [True, False, True])
        assert r.stats.degrade_cnt == 2


@pytest.mark.slow
class TestFusedCheckpoint:
    def test_fused_roundtrip_resumes_identically(self, tmp_path):
        """Checkpoint taken IN FUSED MODE mid-run must capture the live
        device state (not the _enter_fused()-time snapshot) and resume to
        the same trajectory as the uninterrupted run."""
        from vina_slam_tpu.platform import checkpoint as ck
        from vina_slam_tpu.sensor import synth
        from tests.test_pipeline_e2e import small_cfg

        frames, _ = synth.simulate_sequence(
            duration=3.0, n_az=180, n_el=12, noise=0.005,
            imu_noise_gyr=1e-3, imu_noise_acc=1e-3, seed=4)

        # uninterrupted run
        r_full = SlamRunner(small_cfg(), npad_map=8192)
        for f in frames:
            r_full.process_frame(f)
        assert not r_full.motion_init_flag
        ref = r_full.trajectory()

        # interrupted at 2/3 through the steady phase
        cut = (len(frames) * 2) // 3
        r1 = SlamRunner(small_cfg(), npad_map=8192)
        for f in frames[:cut]:
            r1.process_frame(f)
        assert r1._fused is not None, "must checkpoint in fused mode"
        path = str(tmp_path / "fused.npz")
        ck.save_checkpoint(path, r1)

        r2 = SlamRunner(small_cfg(), npad_map=8192)
        ck.load_checkpoint(path, r2)
        assert r2._fused is not None, "resume must re-enter fused mode"
        # the checkpoint captured LIVE state: map keys match the running map
        np.testing.assert_array_equal(
            np.asarray(r1._fused.m.keys), np.asarray(r2._fused.m.keys))
        for f in frames[cut:]:
            r2.process_frame(f)
        out = r2.trajectory()

        # the resumed trajectory tracks the uninterrupted one closely (the
        # win_slots cache and traj ring are rebuilt, so allow small slack)
        n = min(len(ref), len(out))
        assert n >= len(frames) - 12
        np.testing.assert_allclose(out[-1, 1:4], ref[-1, 1:4], atol=5e-3)


class TestDonatedStateReadout:
    def test_modular_views_live_after_donated_steps(self, tmp_path):
        """The fused step donates its SteadyState, so the runner's modular
        fields become DELETED buffers, not merely stale ones. Every exporter
        (markers JSON, trajectory, map reads) must go through
        sync_from_fused(); this pins the read-out path working after real
        donated steps (the raw read crashed with 'Array has been deleted')."""
        from vina_slam_tpu.platform.viz import save_markers_json
        from vina_slam_tpu.sensor import synth
        from tests.test_pipeline_e2e import small_cfg

        frames, _ = synth.simulate_sequence(
            duration=2.0, n_az=180, n_el=12, noise=0.005,
            imu_noise_gyr=1e-3, imu_noise_acc=1e-3, seed=4)
        r = SlamRunner(small_cfg(), npad_map=8192)
        for f in frames:
            r.process_frame(f)
        assert r._fused is not None, "must be in fused (donating) mode"

        r.sync_from_fused()
        n_entries = int((np.asarray(r.map.keys) != vh.EMPTY_KEY).sum())
        assert n_entries > 0
        path = str(tmp_path / "markers.json")
        save_markers_json(path, r.map, r.params)
        import json
        with open(path) as fh:
            doc = json.load(fh)
        assert doc["planes"]
        traj = r.trajectory()
        assert np.isfinite(traj).all()


class TestProfileProgramSharing:
    """Profiles that differ only in float tuning must select the SAME
    compiled fused-step program (round-2 review: every profile paid its own
    minutes-long compile because tuning floats were baked in as statics)."""

    def test_shipped_profiles_collapse_to_structural_keys(self):
        import pathlib

        from vina_slam_tpu.core.config import load_config

        root = pathlib.Path(__file__).resolve().parent.parent / "configs"
        keys = {}
        structs = {}
        for y in sorted(root.glob("*.yaml")):
            cfg = load_config(str(y))
            r = SlamRunner(cfg, npad_map=4096)
            keys[y.stem] = r.fused_program_key()
            structs[y.stem] = (int(cfg.local_ba.max_layer),
                               bool(cfg.odometry.point_notime))
        # every profile with the same STRUCTURE (max_layer; point_notime,
        # which adds/removes the deskew stage) shares ONE program key —
        # down_size (outdoor_fly: 0.5 vs 0.1), error model, and plane gates
        # are traced, not static
        by_struct = {}
        for name, k in keys.items():
            by_struct.setdefault(structs[name], set()).add(k)
        assert len(keys) >= 6
        for struct, ks in by_struct.items():
            assert len(ks) == 1, f"structure={struct} profiles diverge: {ks}"
        # the 8 shipped profiles collapse to at most 3 compiled programs
        assert len(set(keys.values())) <= 3
        # and the tuning knobs really are traced: the static tuple contains
        # no floats
        for k in keys.values():
            assert not any(isinstance(v, float) for v in k[3])
