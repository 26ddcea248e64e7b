"""Voxel hash map tests: hash-table invariants, insert/descend, plane
fitting + subdivision (recut), matching gates, and marginalization."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vina_slam_tpu.mapping import voxel_hash as vh
from vina_slam_tpu.mapping import voxel_map as vm

rng = np.random.default_rng(3)

MS = vm.MapStatic(capacity=1 << 14, levels=3, probe=16, max_new=1024,
                  pool_capacity=1 << 14)


def params(**kw):
    return vm.default_params(**kw)


class TestHash:
    def test_encode_decode_roundtrip(self):
        coords = jnp.asarray(rng.integers(-100000, 100000, size=(500, 3)), jnp.int32)
        for lv in range(4):
            key = vh.encode(lv, coords)
            l2, c2 = vh.decode(key)
            np.testing.assert_array_equal(np.asarray(c2), np.asarray(coords))
            assert (np.asarray(l2) == lv).all()

    def test_insert_then_find(self):
        C = 1 << 12
        keys = jnp.full((C,), vh.EMPTY_KEY, jnp.int64)
        coords = jnp.asarray(rng.integers(-50, 50, size=(300, 3)), jnp.int32)
        new = vh.encode(0, coords)
        uniq, uvalid = vh.unique_keys(new, jnp.ones(300, bool), 512)
        keys, slots, placed = vh.insert_keys(keys, uniq, uvalid)
        assert bool(jnp.all(placed | ~uvalid))
        found = vh.find_slots(keys, uniq)
        got = np.asarray(found)[np.asarray(uvalid)]
        assert (got >= 0).all()
        np.testing.assert_array_equal(got, np.asarray(slots)[np.asarray(uvalid)])

    def test_duplicate_keys_one_slot(self):
        C = 1 << 10
        keys = jnp.full((C,), vh.EMPTY_KEY, jnp.int64)
        k = vh.encode(0, jnp.asarray([[1, 2, 3]], jnp.int32))
        dup = jnp.tile(k, (8,))
        keys, slots, placed = vh.insert_keys(keys, dup, jnp.ones(8, bool))
        # all instances resolve to the same slot
        assert len(set(np.asarray(slots).tolist())) == 1
        assert int(jnp.sum(keys != vh.EMPTY_KEY)) == 1

    def test_near_capacity_drops(self):
        C = 64
        keys = jnp.full((C,), vh.EMPTY_KEY, jnp.int64)
        coords = jnp.asarray(np.stack([np.arange(100), np.zeros(100), np.zeros(100)], -1), jnp.int32)
        new = vh.encode(0, coords)
        keys, slots, placed = vh.insert_keys(keys, new, jnp.ones(100, bool))
        n_placed = int(jnp.sum(placed))
        assert n_placed <= C
        assert n_placed >= 40  # probe window limits fill, but most land

    def test_unique_keys_strips_invalid(self):
        keys = jnp.asarray([5, 5, 7, 9, 9, 9], jnp.int64)
        valid = jnp.asarray([1, 1, 1, 0, 0, 0], bool)
        uniq, uvalid = vh.unique_keys(keys, valid, 4)
        got = sorted(np.asarray(uniq)[np.asarray(uvalid)].tolist())
        assert got == [5, 7]

    def test_compact_indices_matches_nonzero(self):
        rng = np.random.default_rng(7)
        for n, size in [(64, 16), (20480, 4096), (1 << 16, 1 << 14), (1000, 8)]:
            mask = jnp.asarray(rng.random(n) < 0.03)
            got = np.asarray(vh.compact_indices(mask, size, -1))
            want = np.asarray(
                jnp.nonzero(mask, size=size, fill_value=-1)[0])
            np.testing.assert_array_equal(got, want)

    def test_compact_indices_overflow_drops(self):
        mask = jnp.ones(256, bool)
        got = np.asarray(vh.compact_indices(mask, 16, -1))
        np.testing.assert_array_equal(got, np.arange(16))

    def test_compact_indices_size_exceeds_n(self):
        mask = jnp.asarray([True, False, True])
        got = np.asarray(vh.compact_indices(mask, 8, -1))
        np.testing.assert_array_equal(got, [0, 2, -1, -1, -1, -1, -1, -1])

    def test_find_slots_fp_matches_exact(self):
        """The fingerprint row-gather lookup agrees with the exact int64
        probe on present keys, absent keys, and empty-window detection."""
        rng = np.random.default_rng(11)
        for probe in (8, 16):
            C = 1 << 12
            keys = jnp.full((C,), vh.EMPTY_KEY, jnp.int64)
            fkeys = jnp.zeros(C, jnp.int32)
            coords = jnp.asarray(rng.integers(-80, 80, size=(900, 3)),
                                 jnp.int32)
            new = vh.encode(0, coords)
            uniq, uvalid = vh.unique_keys(new, jnp.ones(900, bool), 1024)
            keys, slots, placed = vh.insert_keys(keys, uniq, uvalid,
                                                 probe, rounds=probe)
            tgt = jnp.where(placed, slots, C)
            fkeys = fkeys.at[tgt].set(vh.fingerprint32(uniq), mode="drop")
            # present + absent queries (exclude the EMPTY_KEY padding rows
            # of uniq: find_slots "finds" EMPTY_KEY in any empty slot,
            # which callers always mask out)
            absent = vh.encode(1, coords[:200])
            q = jnp.concatenate([uniq, absent])
            qvalid = np.concatenate(
                [np.asarray(uvalid), np.ones(200, bool)])
            exact = np.asarray(vh.find_slots(keys, q, probe))[qvalid]
            fp = np.asarray(vh.find_slots_fp(fkeys, q, probe))[qvalid]
            np.testing.assert_array_equal(exact, fp)


def _insert_cloud(m, pts, par, jour=0.0):
    pts = jnp.asarray(pts, jnp.float32)
    m, slots = vm.assign_insert(m, pts, jnp.ones(pts.shape[0], bool), par, MS,
                                jnp.asarray(jour, jnp.float32))
    return m, slots


class TestMapInsert:
    def test_root_creation_and_descend(self):
        m = vm.make_map(MS)
        par = params(voxel_size=1.0)
        pts = rng.uniform(-5, 5, (1000, 3))
        m, slots = _insert_cloud(m, pts, par)
        assert (np.asarray(slots) >= 0).all()
        # same points descend to the same slots
        s2, lv, _ = vm.descend(m, jnp.asarray(pts, jnp.float32), par, MS)
        np.testing.assert_array_equal(np.asarray(s2), np.asarray(slots))
        assert (np.asarray(lv) == 0).all()
        # voxel count matches numpy floor-grid count
        expect = len({tuple(c) for c in np.floor(pts / 1.0).astype(int)})
        assert int(jnp.sum(m.keys != vh.EMPTY_KEY)) == expect

    def test_split_descends_children(self):
        m = vm.make_map(MS)
        par = params(voxel_size=2.0)
        pts = rng.uniform(0, 2.0, (500, 3))
        m, slots = _insert_cloud(m, pts, par)
        root = int(np.asarray(slots)[0])
        assert (np.asarray(slots) == root).all()
        # split the root manually; re-insert must create/find children
        m = m._replace(state=m.state.at[root].set(1))
        m, slots2 = _insert_cloud(m, pts, par)
        lv, coords = vh.decode(m.keys[jnp.maximum(jnp.asarray(slots2), 0)])
        assert (np.asarray(slots2) >= 0).all()
        assert (np.asarray(lv) == 1).all()
        # octant correctness: child coord = floor(p / 1.0)
        np.testing.assert_array_equal(np.asarray(coords), np.floor(pts / 1.0).astype(np.int32))


class TestRecut:
    def _plane_cloud(self, n, normal, d, extent=4.0, noise=1e-3, offset=(0, 0, 0)):
        """points on plane n.x = d"""
        normal = np.asarray(normal, float)
        normal /= np.linalg.norm(normal)
        b1 = np.cross(normal, [1, 0.3, 0.2]); b1 /= np.linalg.norm(b1)
        b2 = np.cross(normal, b1)
        uv = rng.uniform(-extent, extent, (n, 2))
        pts = d * normal + uv[:, :1] * b1 + uv[:, 1:] * b2
        pts += rng.normal(scale=noise, size=(n, 3)) * normal
        return pts + np.asarray(offset)

    def test_plane_detected(self):
        m = vm.make_map(MS)
        pool = vm.make_pool(MS)
        par = params(voxel_size=2.0, min_eigen_value=0.01)
        pts = self._plane_cloud(4000, [0, 0, 1], 0.5)
        win = jnp.asarray(pts, jnp.float32)[None]  # (1, N, 3)
        valid = jnp.ones((1, pts.shape[0]), bool)
        m, pool, slots, lvs = vm.recut(m, pool, win, valid, par, MS, 1, jnp.asarray(0.0, jnp.float32))
        sl = np.asarray(slots).ravel()
        s, counts = np.unique(sl[sl >= 0], return_counts=True)
        assert len(s) > 0
        # voxels with enough points must be planes (min_point gate spares the
        # sparse edge voxels, octree.cpp:354-358)
        rich = s[counts > 30]
        ip = np.asarray(m.is_plane)[rich]
        assert ip.all()
        normals = np.asarray(m.eig_vec)[rich][:, :, 0]
        dots = np.abs(normals @ [0, 0, 1])
        assert (dots > 0.99).all()

    def test_cached_recut_matches_fresh(self):
        """The cached-slot fast path must agree with the full descent: same
        slot assignment and identical map plane state, including for points
        that MOVED to another voxel (cache miss) and a fresh -1 row."""
        rng = np.random.default_rng(11)
        m = vm.make_map(MS)
        pool = vm.make_pool(MS)
        par = params(voxel_size=2.0, min_eigen_value=0.01)
        pts = self._plane_cloud(3000, [0, 0, 1], 0.5)
        win = jnp.asarray(pts, jnp.float32)[None]
        valid = jnp.ones((1, pts.shape[0]), bool)
        m, pool, slots, lvs = vm.recut(m, pool, win, valid, par, MS, 1,
                                       jnp.asarray(0.0, jnp.float32))
        # move 5% of points far enough to change voxel; invalidate 10% of cache
        moved = rng.random(pts.shape[0]) < 0.05
        pts2 = pts + moved[:, None] * 4.0
        win2 = jnp.asarray(pts2, jnp.float32)[None]
        hint = np.asarray(slots).copy()
        hint[0, rng.random(pts.shape[0]) < 0.1] = -1
        m_c, _, slots_c, lvs_c = vm.recut(m, pool, win2, valid, par, MS, 1,
                                          jnp.asarray(0.0, jnp.float32),
                                          cached=jnp.asarray(hint))
        m_f, _, slots_f, lvs_f = vm.recut(m, pool, win2, valid, par, MS, 1,
                                          jnp.asarray(0.0, jnp.float32))
        np.testing.assert_array_equal(np.asarray(slots_c), np.asarray(slots_f))
        np.testing.assert_array_equal(np.asarray(lvs_c), np.asarray(lvs_f))
        np.testing.assert_array_equal(np.asarray(m_c.is_plane), np.asarray(m_f.is_plane))
        np.testing.assert_allclose(np.asarray(m_c.eig_val), np.asarray(m_f.eig_val))

    def test_subdivision_on_corner(self):
        """Two orthogonal planes through one voxel: root is not planar, must
        subdivide, children become planar."""
        m = vm.make_map(MS)
        pool = vm.make_pool(MS)
        par = params(voxel_size=4.0, min_eigen_value=0.01)
        ptsA = self._plane_cloud(3000, [0, 0, 1], 0.4, extent=1.9, offset=(2, 2, 0))
        ptsB = self._plane_cloud(3000, [1, 0, 0], 0.4, extent=1.9, offset=(0, 2, 2))
        pts = np.concatenate([ptsA, ptsB])
        keep = (pts > 0.05).all(1) & (pts < 3.95).all(1)
        pts = pts[keep]
        win = jnp.asarray(pts, jnp.float32)[None]
        valid = jnp.ones((1, pts.shape[0]), bool)
        m, pool, slots, lvs = vm.recut(m, pool, win, valid, par, MS, 1, jnp.asarray(0.0, jnp.float32))
        # root must be split
        root_key = vh.encode(0, jnp.asarray([[0, 0, 0]], jnp.int32))
        root_slot = int(vh.find_slots(m.keys, root_key)[0])
        assert root_slot >= 0
        assert int(m.state[root_slot]) == 1
        # most points now live in deeper, planar leaves
        lv = np.asarray(lvs)
        assert (lv > 0).mean() > 0.9
        s = np.unique(np.asarray(slots)); s = s[s >= 0]
        deep = s[np.asarray(m.state)[s] == 0]
        assert np.asarray(m.is_plane)[deep].mean() > 0.5

    def test_min_point_gate(self):
        """Sparse voxels (N <= min_point) must not become planes."""
        m = vm.make_map(MS)
        pool = vm.make_pool(MS)
        par = params(voxel_size=1.0)
        pts = self._plane_cloud(10, [0, 0, 1], 0.2, extent=0.4)
        win = jnp.asarray(pts, jnp.float32)[None]
        valid = jnp.ones((1, pts.shape[0]), bool)
        m, pool, slots, _ = vm.recut(m, pool, win, valid, par, MS, 1, jnp.asarray(0.0, jnp.float32))
        s = np.unique(np.asarray(slots)); s = s[s >= 0]
        assert not np.asarray(m.is_plane)[s].any()


class TestMatch:
    def _build_plane_map(self):
        m = vm.make_map(MS)
        pool = vm.make_pool(MS)
        par = params(voxel_size=2.0, min_eigen_value=0.01)
        pts = TestRecut._plane_cloud(TestRecut(), 6000, [0, 0, 1], 0.5, extent=6.0)
        W = 1
        win_w = jnp.asarray(pts, jnp.float32)[None]
        valid = jnp.ones((W, pts.shape[0]), bool)
        m, pool, slots, _ = vm.recut(m, pool, win_w, valid, par, MS, W, jnp.asarray(0.0, jnp.float32))
        # plane params come from margi's plane_update
        var = jnp.tile(jnp.eye(3, dtype=jnp.float32)[None] * 1e-4, (pts.shape[0], 1, 1))[None]
        m = vm.accumulate_cov(m, slots, win_w, var, valid, par, MS)
        m, pool = vm.margi(m, pool, slots, win_w, var, valid, par, MS, jnp.asarray(0.0, jnp.float32), mgsize=0)
        return m, pool, par

    def test_match_on_plane(self):
        m, pool, par = self._build_plane_map()
        q = rng.uniform(-4, 4, (200, 2))
        wld = np.concatenate([q, np.full((200, 1), 0.5)], -1).astype(np.float32)
        var = jnp.tile(jnp.eye(3, dtype=jnp.float32)[None] * 1e-4, (200, 1, 1))
        ok, n, c, sig = vm.match_points(m, jnp.asarray(wld), var, par, MS)
        assert np.asarray(ok).mean() > 0.9
        dots = np.abs(np.asarray(n) @ [0, 0, 1])
        assert (dots[np.asarray(ok)] > 0.99).all()

    def test_match_rejects_off_plane(self):
        m, pool, par = self._build_plane_map()
        wld = np.concatenate([rng.uniform(-4, 4, (200, 2)),
                              np.full((200, 1), 1.4)], -1).astype(np.float32)
        var = jnp.tile(jnp.eye(3, dtype=jnp.float32)[None] * 1e-4, (200, 1, 1))
        ok, n, c, sig = vm.match_points(m, jnp.asarray(wld), var, par, MS)
        assert np.asarray(ok).mean() < 0.05

    def test_neighbor_match(self):
        m, pool, par = self._build_plane_map()
        # query centers slightly above the plane, still should find neighbors
        wld = np.concatenate([rng.uniform(-3, 3, (50, 2)),
                              np.full((50, 1), 0.52)], -1).astype(np.float32)
        ok, n, c, sig = vm.match_neighbors(m, jnp.asarray(wld), par, MS)
        assert np.asarray(ok).mean() > 0.8


class TestMargi:
    def test_fix_accumulation_and_seal(self):
        MS2 = vm.MapStatic(capacity=1 << 12, levels=2, probe=16, max_new=512,
                           pool_capacity=1 << 12)
        m = vm.make_map(MS2)
        pool = vm.make_pool(MS2)
        par = params(voxel_size=2.0, min_eigen_value=0.05, max_points=50)
        pts = TestRecut._plane_cloud(TestRecut(), 40, [0, 0, 1], 0.5, extent=0.8, offset=(1, 1, 0))
        win = jnp.asarray(pts, jnp.float32)[None]
        valid = jnp.ones((1, pts.shape[0]), bool)
        var = jnp.tile(jnp.eye(3, dtype=jnp.float32)[None] * 1e-4, (pts.shape[0], 1, 1))[None]
        m, pool, slots, _ = vm.recut(m, pool, win, valid, par, MS2, 1, jnp.asarray(0.0, jnp.float32))
        m = vm.accumulate_cov(m, slots, win, var, valid, par, MS2)
        m, pool = vm.margi(m, pool, slots, win, var, valid, par, MS2, jnp.asarray(0.0, jnp.float32), mgsize=1)
        s = int(np.asarray(slots)[0, 0])
        assert float(m.fix_N[s]) == pytest.approx(pts.shape[0])
        assert int(jnp.sum(pool.valid)) == pts.shape[0]
        # second margi of another 40 points seals the voxel (>= 50)
        pts2 = TestRecut._plane_cloud(TestRecut(), 40, [0, 0, 1], 0.5, extent=0.8, offset=(1, 1, 0))
        win2 = jnp.asarray(pts2, jnp.float32)[None]
        m, pool, slots2, _ = vm.recut(m, pool, win2, valid, par, MS2, 1, jnp.asarray(0.0, jnp.float32))
        m = vm.accumulate_cov(m, slots2, win2, var, valid, par, MS2)
        m, pool = vm.margi(m, pool, slots2, win2, var, valid, par, MS2, jnp.asarray(0.0, jnp.float32), mgsize=1)
        assert bool(m.sealed[s])
        assert float(m.fix_N[s]) == pytest.approx(80)
        # pool points of sealed voxels are dropped the next time margi sees
        # them (reference clears point_fix on the NEXT visit after sealing,
        # octree.cpp:448-469); a third pass flushes the remainder
        m, pool = vm.margi(m, pool, slots2, win2, var,
                           jnp.zeros_like(valid), par, MS2,
                           jnp.asarray(0.0, jnp.float32), mgsize=0)
        assert int(jnp.sum(pool.valid)) == 0
        # sealed stats stay frozen at 80
        assert float(m.fix_N[s]) == pytest.approx(80)

    def test_evict(self):
        m = vm.make_map(MS)
        pool = vm.make_pool(MS)
        par = params(voxel_size=1.0)
        pts = rng.uniform(-5, 5, (500, 3))
        m, slots = _insert_cloud(m, pts, par, jour=0.0)
        n0 = int(jnp.sum(m.keys != vh.EMPTY_KEY))
        m2, pool2 = vm.evict(m, pool, jnp.asarray(800.0, jnp.float32), par, MS)
        assert int(jnp.sum(m2.keys != vh.EMPTY_KEY)) == 0
        m3, pool3 = vm.evict(m, pool, jnp.asarray(100.0, jnp.float32), par, MS)
        assert int(jnp.sum(m3.keys != vh.EMPTY_KEY)) == n0
        # surviving entries still findable
        s3, _, _ = vm.descend(m3, jnp.asarray(pts, jnp.float32), par, MS)
        assert (np.asarray(s3) >= 0).all()


class TestPackedSymmetric:
    """SYM6/SYM9 packed storage must agree with the dense symmetric forms
    (plane_var rows consumed by sym6_quadform; cov_add rows produced by
    _bf_var45 — octree.cpp:83-92 Bf_var)."""

    def test_bf_var45_matches_dense(self):
        r = np.random.default_rng(3)
        A = r.normal(size=(64, 3, 3)).astype(np.float32)
        from vina_slam_tpu.core.pointcov import sym3_pack

        var = jnp.asarray(A @ A.transpose(0, 2, 1))  # SPD
        rel = jnp.asarray(r.normal(size=(64, 3)).astype(np.float32))
        dense = np.asarray(vm._bf_var(var, rel))                 # (64, 9, 9)
        packed = np.asarray(vm._bf_var45(sym3_pack(var), rel))   # (64, 45)
        for a in range(9):
            for b in range(9):
                np.testing.assert_allclose(
                    packed[:, vm.SYM9[a][b]], dense[:, a, b],
                    rtol=1e-5, atol=1e-5)

    def test_sym6_quadform_matches_dense(self):
        r = np.random.default_rng(4)
        A = r.normal(size=(32, 6, 6)).astype(np.float32)
        S = A @ A.transpose(0, 2, 1)
        p21 = np.stack([S[:, a, b] for a in range(6) for b in range(a, 6)],
                       axis=-1)
        # sanity: the comprehension order IS the SYM6 order
        k = 0
        for a in range(6):
            for b in range(a, 6):
                assert vm.SYM6[a][b] == k
                k += 1
        j = r.normal(size=(32, 6)).astype(np.float32)
        want = np.einsum("na,nab,nb->n", j, S, j)
        got = np.asarray(vm.sym6_quadform(
            jnp.asarray(p21), tuple(jnp.asarray(j[:, a]) for a in range(6))))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


class TestChildLinks:
    """The child_slots link walk must agree exactly with a fingerprint-probe
    walk (the original _walk), across subdivision waves, late child creation,
    and the evict rebuild."""

    @staticmethod
    def _walk_probe(m, root_coords, wld, par, ms):
        """Original probe-based descent as the oracle (absent children map
        to -1 for comparison; the link walk never reports -2)."""
        key0 = vh.encode(0, root_coords)
        slot = vh.find_slots_fp(m.fkeys, key0, ms.probe)
        coords = root_coords
        level = jnp.zeros(wld.shape[:-1], jnp.int32)
        for l in range(1, ms.levels):
            edge = par.voxel_size / (2.0 ** (l - 1))
            ok = slot >= 0
            split = ok & (m.state[jnp.maximum(slot, 0)] == 1)
            center = (coords.astype(jnp.float32) + 0.5) * edge
            oct_up = (wld > center).astype(jnp.int32)
            child_coords = 2 * coords + oct_up
            ckey = vh.encode(l, child_coords)
            cslot = vh.find_slots_fp(m.fkeys, ckey, ms.probe)
            slot = jnp.where(split, cslot, slot)
            coords = jnp.where(split[..., None], child_coords, coords)
            level = jnp.where(split, l, level)
        return slot, level, coords

    def _assert_walks_agree(self, m, par, queries):
        root = vh.coords_of(queries, par.voxel_size)
        s1, l1, c1 = vm._walk(m, root, queries, par, MS)
        s0, l0, c0 = self._walk_probe(m, root, queries, par, MS)
        np.testing.assert_array_equal(np.asarray(s1),
                                      np.maximum(np.asarray(s0), -1))
        hit = np.asarray(s0) >= 0
        np.testing.assert_array_equal(np.asarray(l1)[hit], np.asarray(l0)[hit])
        np.testing.assert_array_equal(np.asarray(c1)[hit], np.asarray(c0)[hit])

    def _assert_invariant(self, m):
        occ = np.asarray(m.keys) != np.int64(vh.EMPTY_KEY)
        st = np.asarray(m.state)
        rows = np.asarray(m.child_slots)
        # leaves (and free rows) carry all -1; split rows carry no -1
        assert (rows[occ & (st == 0)] == -1).all()
        assert (rows[~occ] == -1).all()
        assert (rows[occ & (st == 1)] != -1).all()
        # every linked child really is the child (level/coords match)
        lv = np.asarray(m.vox_level)
        crd = np.asarray(m.vox_coords)
        for r in np.nonzero(occ & (st == 1))[0]:
            for o in range(8):
                cs = rows[r, o]
                if cs < 0:
                    continue
                assert lv[cs] == lv[r] + 1
                np.testing.assert_array_equal(
                    crd[cs] >> 1, crd[r])
                assert ((crd[cs][0] & 1) * 4 + (crd[cs][1] & 1) * 2
                        + (crd[cs][2] & 1)) == o

    def test_link_walk_matches_probe_walk(self):
        r = np.random.default_rng(7)
        m = vm.make_map(MS)
        pool = vm.make_pool(MS)
        par = params(voxel_size=2.0, min_eigen_value=0.01)
        # frame 1: a plane (planar voxels stay leaves) + a corner cloud
        # (forces subdivision down the levels)
        plane = TestRecut._plane_cloud(TestRecut(), 3000, [0, 0, 1], 0.5)
        corner = np.stack([
            np.abs(r.normal(0, 0.6, 2000)),
            np.abs(r.normal(0, 0.6, 2000)),
            np.abs(r.normal(0, 0.6, 2000))], -1)
        pts1 = np.concatenate([plane, corner]).astype(np.float32)
        win = jnp.asarray(pts1)[None]
        valid = jnp.ones((1, len(pts1)), bool)
        m, pool, _, _ = vm.recut(m, pool, win, valid, par, MS, 1,
                                 jnp.asarray(0.0, jnp.float32))
        self._assert_invariant(m)

        # frame 2 reaches NEW territory of already-split parents (late child
        # creation must link correctly)
        pts2 = (corner * np.asarray([-1.0, 1.0, 1.0])).astype(np.float32)
        m, pool, _, _ = vm.recut(m, pool, jnp.asarray(pts2)[None],
                                 jnp.ones((1, len(pts2)), bool), par, MS, 1,
                                 jnp.asarray(0.0, jnp.float32))
        self._assert_invariant(m)

        qs = jnp.asarray(np.concatenate([
            pts1, pts2,
            r.uniform(-4, 4, (2000, 3)).astype(np.float32)]))
        self._assert_walks_agree(m, par, qs)

        # the VNC neighbor form: queries walked under OFFSET roots (clamped
        # octant descent) — exercise _walk with root != query's own root
        off = jnp.asarray([[1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, -1]],
                          jnp.int32)
        sub = qs[:512]
        root = vh.coords_of(sub, par.voxel_size)
        for k in range(4):
            ro = root + off[k]
            s1, l1, c1 = vm._walk(m, ro, sub, par, MS)
            s0, l0, c0 = self._walk_probe(m, ro, sub, par, MS)
            np.testing.assert_array_equal(np.asarray(s1),
                                          np.maximum(np.asarray(s0), -1))

        # evict rebuild: drop nothing (dist large) -> same structure, moved
        # slots; links must be rebuilt consistently
        m2, pool2 = vm.evict(m, pool, jnp.asarray(1000.0, jnp.float32), par,
                             MS, dist=1e6)
        self._assert_invariant(m2)
        self._assert_walks_agree(m2, par, qs)


class TestRecutCounts:
    def test_extract_reuses_recut_window_counts(self):
        """recut(return_counts=True)'s final-wave per-slot window counts must
        reproduce extract_factors' own segment sum exactly (the fused step
        passes them to skip that full-capacity reduction)."""
        from vina_slam_tpu.mapping import factors as fx

        r = np.random.default_rng(5)
        m = vm.make_map(MS)
        pool = vm.make_pool(MS)
        par = params(voxel_size=2.0, min_eigen_value=0.01)
        W, Np = 3, 1024
        base = TestRecut._plane_cloud(TestRecut(), Np, [0, 0, 1], 0.5)
        win = jnp.asarray(np.stack([base + [0.01 * k, 0, 0] for k in range(W)]),
                          jnp.float32)
        valid = jnp.asarray(r.random((W, Np)) > 0.1)
        m, pool, slots, _, win_n = vm.recut(
            m, pool, win, valid, par, MS, W, jnp.asarray(0.0, jnp.float32),
            return_counts=True)

        Rs = jnp.tile(jnp.eye(3, dtype=jnp.float64)[None], (W, 1, 1))
        ps = jnp.zeros((W, 3), jnp.float64)
        f_own = fx.extract_factors(m, slots, win, valid, Rs, ps, par, MS,
                                   V=64, W=W)
        f_pre = fx.extract_factors(m, slots, win, valid, Rs, ps, par, MS,
                                   V=64, W=W, win_count=win_n)
        assert int(f_own.n_valid) == int(f_pre.n_valid) > 0
        for a, b in zip(f_own, f_pre):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    @pytest.mark.parametrize("thick", [0.02, 0.8])
    def test_extract_reuses_recut_frame_moments(self, thick):
        """recut(return_frame_moments=True)'s per-(frame, slot) moment table
        must reproduce the standalone extract_factors payload, so the fused
        step's extraction does no per-point work at all. thick=0.8 makes the
        cloud non-planar so split waves run and accf flows through the
        while_loop carry."""
        from vina_slam_tpu.mapping import factors as fx

        r = np.random.default_rng(7)
        m = vm.make_map(MS)
        pool = vm.make_pool(MS)
        par = params(voxel_size=2.0, min_eigen_value=0.01)
        W, Np = 3, 1024
        base = TestRecut._plane_cloud(TestRecut(), Np, [0, 0, 1], thick)
        win = jnp.asarray(
            np.stack([base + [0.01 * k, 0, 0] for k in range(W)]),
            jnp.float32)
        valid = jnp.asarray(r.random((W, Np)) > 0.1)
        m, pool, slots, _, win_n, accf = vm.recut(
            m, pool, win, valid, par, MS, W, jnp.asarray(0.0, jnp.float32),
            return_counts=True, return_frame_moments=True)

        Rs = jnp.tile(jnp.eye(3, dtype=jnp.float64)[None], (W, 1, 1))
        ps = jnp.zeros((W, 3), jnp.float64)
        f_own = fx.extract_factors(m, slots, win, valid, Rs, ps, par, MS,
                                   V=64, W=W)
        f_fm = fx.extract_factors(m, slots, win, valid, Rs, ps, par, MS,
                                  V=64, W=W, win_count=win_n,
                                  frame_moments=accf)
        assert int(f_own.n_valid) == int(f_fm.n_valid) > 0
        for name, a, b in zip(f_own._fields, f_own, f_fm):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-5, atol=2e-6, err_msg=name)


class TestWinMoments:
    """The persistent per-(frame, slot) moment table (vm.WinMoments) must
    track the from-scratch segment-sum across pose nudges, window shifts,
    reassignments, and subdivisions — the incremental recut path's whole
    correctness story."""

    def _world(self, r, n):
        a = TestRecut._plane_cloud(TestRecut(), n // 2, [0, 0, 1], 0.4,
                                   extent=5.0)
        b = TestRecut._plane_cloud(TestRecut(), n - n // 2, [1, 0, 0], 4.4,
                                   extent=5.0)
        return np.concatenate([a, b]).astype(np.float32)

    def test_incremental_matches_scratch(self):
        from vina_slam_tpu.core import so3

        r = np.random.default_rng(7)
        W, Np = 3, 600
        ms = vm.MapStatic(capacity=1 << 12, levels=3, probe=16,
                          max_new=1024, pool_capacity=1 << 12)
        par = params(voxel_size=2.0, min_eigen_value=0.01)
        m = vm.make_map(ms)
        pool = vm.make_pool(ms)

        bodies = [self._world(r, Np) for _ in range(W)]
        Rs = np.tile(np.eye(3), (W, 1, 1))
        ps = np.zeros((W, 3))
        valid = np.ones((W, Np), bool)
        valid[:, :: 17] = False          # some padding rows
        win_var = jnp.tile(jnp.asarray(
            [1e-4, 0, 0, 1e-4, 0, 1e-4], jnp.float32)[None, None],
            (W, Np, 1))

        mom = vm.make_win_moments(W, ms)
        cached = np.full((W, Np), -1, np.int32)
        jour = jnp.asarray(0.0, jnp.float32)

        for step in range(5):
            # BA-like nudge of every pose + a fresh last frame
            dR = so3.exp(jnp.asarray(r.normal(0, 2e-3, (W, 3))))
            Rs_new = np.asarray(jnp.asarray(Rs) @ dR)
            ps_new = ps + r.normal(0, 5e-3, (W, 3))
            # the fused step re-tags right after BA; mimic that here
            mom = vm._mom_retag(
                vm.WinMoments(cols=mom.cols, R=jnp.asarray(Rs),
                              p=jnp.asarray(ps)),
                m, par, jnp.asarray(Rs_new), jnp.asarray(ps_new))
            Rs, ps = Rs_new, ps_new
            win_w = np.einsum("wij,wnj->wni", Rs, np.stack(bodies)) + ps[:, None, :]
            win_w = np.where(valid[..., None], win_w, 1e7).astype(np.float32)
            new_mask = np.zeros((W, Np), bool)
            new_mask[W - 1] = step == 0  # frames enter via the roll below

            args = (m, pool, jnp.asarray(win_w), jnp.asarray(valid), par,
                    ms, W, jour)
            kw = dict(cached=jnp.asarray(cached), win_var=win_var,
                      new_mask=jnp.asarray(new_mask), return_counts=True,
                      return_frame_moments=True)
            m_i, pool_i, slots_i, _, win_n_i, accf_i = vm.recut(
                *args, **kw, mom=mom.cols)
            m_s, pool_s, slots_s, _, win_n_s, accf_s = vm.recut(*args, **kw)

            np.testing.assert_array_equal(np.asarray(slots_i),
                                          np.asarray(slots_s))
            np.testing.assert_allclose(np.asarray(accf_i), np.asarray(accf_s),
                                       rtol=3e-3, atol=3e-3)
            np.testing.assert_array_equal(np.asarray(m_i.is_plane),
                                          np.asarray(m_s.is_plane))
            np.testing.assert_allclose(np.asarray(m_i.eig_val),
                                       np.asarray(m_s.eig_val),
                                       rtol=5e-3, atol=5e-4)
            # carry the INCREMENTAL outputs forward
            m, pool = m_i, pool_i
            mom = vm.WinMoments(cols=accf_i, R=jnp.asarray(Rs),
                                p=jnp.asarray(ps))
            cached = np.asarray(slots_i)

            # window shift: drop frame 0, append a new frame
            bodies = bodies[1:] + [self._world(r, Np)]
            Rs = np.roll(Rs, -1, axis=0)
            ps = np.roll(ps, -1, axis=0)
            ps[W - 1] = ps[W - 2] + [0.05, 0.02, 0.0]
            valid = np.roll(valid, -1, axis=0)
            cached = np.roll(cached, -1, axis=0)
            cached[W - 1] = -1
            mom = vm.WinMoments(
                cols=jnp.roll(mom.cols, -1, axis=0).at[W - 1].set(0.0),
                R=jnp.roll(mom.R, -1, axis=0), p=jnp.roll(mom.p, -1, axis=0))

    def test_evict_remaps_table(self):
        """evict(win_slots=..., win_mom=...) must relocate both so the
        invariant (table cell <-> assignment) survives the rebuild."""
        r = np.random.default_rng(9)
        W, Np = 2, 400
        ms = vm.MapStatic(capacity=1 << 12, levels=2, probe=16,
                          max_new=1024, pool_capacity=1 << 12,
                          evict_dist=10.0)
        par = params(voxel_size=2.0, min_eigen_value=0.01)
        m = vm.make_map(ms)
        pool = vm.make_pool(ms)
        pts = self._world(r, Np)
        win = jnp.asarray(np.stack([pts, pts + [0.01, 0, 0]]), jnp.float32)
        valid = jnp.ones((W, Np), bool)
        m, pool, slots, _, _, accf = vm.recut(
            m, pool, win, valid, par, ms, W, jnp.asarray(0.0, jnp.float32),
            return_counts=True, return_frame_moments=True)
        # nothing is stale at jour=5 < 10: rebuild keeps every voxel
        m2, pool2, slots2, mom2 = vm.evict(
            m, pool, jnp.asarray(5.0, jnp.float32), par, ms,
            win_slots=slots, win_mom=accf)
        ok = np.asarray(slots) >= 0
        assert (np.asarray(slots2)[ok] >= 0).all()
        # the moved table row contents must follow their voxels
        old = np.asarray(accf)
        new = np.asarray(mom2)
        s_old = np.asarray(slots)
        s_new = np.asarray(slots2)
        for f in range(W):
            sel = s_old[f] >= 0
            np.testing.assert_allclose(new[f][s_new[f][sel]],
                                       old[f][s_old[f][sel]], rtol=1e-6)

    def test_margi_with_table_matches_pointwise(self):
        """margi(tbl=...) must equal the per-point segment-sum margi when the
        table is re-tagged to the same (post-BA) poses."""
        from vina_slam_tpu.core import so3

        r = np.random.default_rng(13)
        W, Np = 3, 500
        ms = vm.MapStatic(capacity=1 << 12, levels=2, probe=16,
                          max_new=1024, pool_capacity=1 << 12)
        par = params(voxel_size=2.0, min_eigen_value=0.01)
        m = vm.make_map(ms)
        pool = vm.make_pool(ms)
        bodies = np.stack([self._world(r, Np) for _ in range(W)])
        R0 = np.tile(np.eye(3), (W, 1, 1))
        p0 = np.cumsum(r.normal(0, 0.02, (W, 3)), axis=0)
        valid = jnp.ones((W, Np), bool)
        win0 = jnp.asarray(np.einsum("wij,wnj->wni", R0, bodies)
                           + p0[:, None, :], jnp.float32)
        m, pool, slots, _, _, accf = vm.recut(
            m, pool, win0, valid, par, ms, W, jnp.asarray(0.0, jnp.float32),
            return_counts=True, return_frame_moments=True)

        # BA-like nudge, then world points + table under the NEW poses
        dR = np.asarray(so3.exp(jnp.asarray(r.normal(0, 1e-3, (W, 3)))))
        R1 = np.einsum("wij,wjk->wik", R0, dR)
        p1 = p0 + r.normal(0, 2e-3, (W, 3))
        win1 = jnp.asarray(np.einsum("wij,wnj->wni", R1, bodies)
                           + p1[:, None, :], jnp.float32)
        tbl1 = vm._mom_retag(
            vm.WinMoments(cols=accf, R=jnp.asarray(R0), p=jnp.asarray(p0)),
            m, par, jnp.asarray(R1), jnp.asarray(p1)).cols
        wvar = jnp.tile(jnp.asarray(
            [1e-4, 0, 0, 1e-4, 0, 1e-4], jnp.float32)[None, None], (W, Np, 1))
        jour = jnp.asarray(0.0, jnp.float32)
        m_t, pool_t = vm.margi(m, pool, slots, win1, wvar, valid, par, ms,
                               jour, mgsize=1, tbl=tbl1)
        m_p, pool_p = vm.margi(m, pool, slots, win1, wvar, valid, par, ms,
                               jour, mgsize=1)
        np.testing.assert_allclose(np.asarray(m_t.fix_N),
                                   np.asarray(m_p.fix_N), atol=1e-3)
        np.testing.assert_allclose(np.asarray(m_t.fix_P),
                                   np.asarray(m_p.fix_P), rtol=2e-3, atol=2e-3)
        np.testing.assert_allclose(np.asarray(m_t.plane_normal),
                                   np.asarray(m_p.plane_normal),
                                   rtol=1e-2, atol=1e-2)
        np.testing.assert_allclose(np.asarray(m_t.plane_var),
                                   np.asarray(m_p.plane_var),
                                   rtol=2e-2, atol=1e-4)
        np.testing.assert_array_equal(np.asarray(m_t.sealed),
                                      np.asarray(m_p.sealed))
        np.testing.assert_array_equal(np.asarray(pool_t.valid),
                                      np.asarray(pool_p.valid))
