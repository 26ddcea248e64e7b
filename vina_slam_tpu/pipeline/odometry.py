"""Iterated error-state Kalman odometry (scan-to-map) with VNC.

Reference: src/pipeline/odometry.cpp::LioStateEstimation (cpp:64-255).
The per-point sequential match/accumulate loop becomes a batched
match + einsum normal-equation reduction; the IEKF iteration with the
rematch-twice stopping protocol (cpp:205-230) runs as a lax.while_loop.
The VNC scan-plane extraction (generate_voxel + fitScanPlane +
collectScanPlanes, cpp:14-96) is a per-scan multi-level unique/segment
plane fit with fixed output shapes.

Also provides the kdtree-bootstrap odometry used before motion_init
succeeds (cpp:267-439), with the PCL KdTree 5-NN replaced by a brute-force
distance matmul + top_k on the MXU.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from vina_slam_tpu.core import so3
from vina_slam_tpu.core.constants import DIM, NMATCH
from vina_slam_tpu.core.mat3 import bmm, bmv, sandwich
from vina_slam_tpu.core.eigh3 import eigh3, eigh3c
from vina_slam_tpu.core.state import NavState
from vina_slam_tpu.core.linalg import inv_psd_refined as inv_psd
from vina_slam_tpu.mapping import voxel_hash as vh
from vina_slam_tpu.mapping import voxel_map as vm


class ScanPlanes(NamedTuple):
    """collectScanPlanes output (odometry.cpp:14-61), padded."""
    center: jnp.ndarray   # (S, 3) body frame
    normal: jnp.ndarray   # (S, 3) body frame, unit
    quality: jnp.ndarray  # (S,) 1 - l0/(l0+l1+l2)
    sigma_n: jnp.ndarray  # (S,) sqrt(l0/sum)
    valid: jnp.ndarray    # (S,)


def empty_scan_planes(max_out: int = 512) -> ScanPlanes:
    """All-invalid ScanPlanes placeholder for the plain (use_vnc=0) IEKF
    path, where the reference never builds the scan-voxel map
    (odometry.cpp:64-68 vs :85-96)."""
    f32 = jnp.float32
    return ScanPlanes(
        center=jnp.zeros((max_out, 3), f32),
        normal=jnp.zeros((max_out, 3), f32),
        quality=jnp.zeros((max_out,), f32),
        sigma_n=jnp.zeros((max_out,), f32),
        valid=jnp.zeros((max_out,), bool),
    )


@partial(jax.jit, static_argnames=("levels", "caps", "max_out"))
def extract_scan_planes(pts, valid, voxel_size, min_eigen_value, plane_thre,
                        levels: int = 3, caps=(2048, 4096, 8192),
                        max_out: int = 512) -> ScanPlanes:
    """generate_voxel + fitScanPlane (voxel_map.cpp:169-200 +
    octree.cpp:628-684): voxelize the body-frame scan, fit planes, subdivide
    non-planar voxels (N >= 6) up to max_layer; keep planes passing the
    quality gates of collectScanPlanes (odometry.cpp:27-50)."""
    N = pts.shape[0]
    f32 = pts.dtype
    outs = []
    # levels > 0 only see points whose parent voxel subdivided; for large
    # scans those are COMPACTED to half the previous level's rows (rooms are
    # mostly planar at level 0, so the deep levels otherwise re-pay the full
    # 24k-row insert + segment-sum for a handful of split corners). Small
    # scans (< 8192) skip the compaction so the reference-oracle surface is
    # bit-identical there.
    cur_pts, cur_valid = pts, valid

    def _pow2_ceil(v):
        p = 1
        while p < v:
            p *= 2
        return p

    for l in range(levels):
        pts_l, valid_l = cur_pts, cur_valid
        Ncur = pts_l.shape[0]
        # a level can never hold more occupied voxels than there are scan
        # points, so cap the (insert table + eigh3 + plane-gate) row count
        # at the padded scan size — the configured caps were sized for
        # 8k-16k-point scans and dominate this stage at smaller buckets
        cap = min(caps[min(l, len(caps) - 1)], _pow2_ceil(Ncur))
        edge = voxel_size / (2.0 ** l)
        coords = vh.coords_of(pts_l, edge)
        vmask = valid_l
        # per-scan voxelization via a throwaway int32-fingerprint table
        # (claim-and-verify insert; vh.fingerprint32 for the collision
        # tradeoff): segment ids are hash slots. Replaces jnp.unique +
        # searchsorted — int64 sorts are emulated bitonic sorts on TPU and
        # dominated this stage (~3 ms/level). Voxel coords are recovered
        # from a winner-scatter, not by decoding the key.
        fp = vh.fingerprint32(vh.encode(l, coords))
        tbl, slots, placed = vh.insert_keys32(
            jnp.full((cap,), vh.EMPTY32, jnp.int32), fp, vmask,
            probe=8, rounds=8, quadratic=True)
        seg = jnp.where(vmask & (slots >= 0), slots, cap)
        inb = seg < cap
        ucoords = jnp.zeros((cap, 3), jnp.int32).at[
            jnp.where(inb, seg, cap)].set(coords, mode="drop")
        # flat-column moments + componentwise eigensolve (the recut-refit
        # redesign): no (cap, 3, 3) tables, no matrix eigh — every per-voxel
        # quantity is a lane-packed (cap,) vector
        w = inb.astype(f32)
        centers_vox = (coords.astype(f32) + 0.5) * edge
        rel = (pts_l - centers_vox) * w[:, None]
        rx, ry, rz = rel[..., 0], rel[..., 1], rel[..., 2]
        flat = jnp.stack([rx * rx, rx * ry, rx * rz, ry * ry, ry * rz,
                          rz * rz, rx, ry, rz, w], axis=-1)
        accT = jax.ops.segment_sum(flat, seg, num_segments=cap + 1)[:cap].T

        n = accT[9]
        nn = jnp.maximum(n, 1.0)
        inv = 1.0 / nn
        mx, my, mz = accT[6] * inv, accT[7] * inv, accT[8] * inv
        (l0, l1, l2), U = eigh3c(
            accT[0] * inv - mx * mx, accT[1] * inv - mx * my,
            accT[2] * inv - mx * mz, accT[3] * inv - my * my,
            accT[4] * inv - my * mz, accT[5] * inv - mz * mz)
        u0 = U[0]

        occupied = tbl != vh.EMPTY32
        ratio2 = l0 / jnp.maximum(l2, 1e-20)
        is_pl = occupied & (n >= 3) & (l0 < min_eigen_value) & (
            ratio2 < plane_thre[min(l, 3)])

        # voxel centers back to absolute (ucoords from the winner-scatter)
        ucenter = (ucoords.astype(f32) + 0.5) * edge
        center_abs = ucenter + jnp.stack([mx, my, mz], axis=-1)

        lsum = l0 + l1 + l2 + 1e-10
        quality = 1.0 - l0 / lsum
        keep = (
            is_pl
            & (l1 > 1e-12)
            & (l0 / jnp.maximum(l1, 1e-20) <= 0.12)
            & (quality > 0.5)
        )
        outs.append(ScanPlanes(
            center=center_abs,
            normal=jnp.stack([u0[0], u0[1], u0[2]], axis=-1),
            quality=quality,
            sigma_n=jnp.sqrt(jnp.maximum(l0 / lsum, 0.0)),
            valid=keep,
        ))

        if l < levels - 1:
            # subdivide: not a plane, populated enough (octree.cpp:664-668)
            split_vox = occupied & ~is_pl & (n >= 6)
            psplit = valid_l & inb & split_vox[jnp.minimum(seg, cap - 1)]
            if Ncur >= 8192:
                rows = vh.compact_indices(psplit, Ncur // 2, -1)
                cur_pts = pts_l[jnp.maximum(rows, 0)]
                cur_valid = rows >= 0
            else:
                cur_pts, cur_valid = pts_l, psplit

    allp = ScanPlanes(
        center=jnp.concatenate([o.center for o in outs]),
        normal=jnp.concatenate([o.normal for o in outs]),
        quality=jnp.concatenate([o.quality for o in outs]),
        sigma_n=jnp.concatenate([o.sigma_n for o in outs]),
        valid=jnp.concatenate([o.valid for o in outs]),
    )
    # compact to a small fixed cap: the VNC 27-neighbor walk costs per
    # PADDED slot, and real scans yield only O(100) planes
    nz = vh.compact_indices(allp.valid, max_out, -1)
    ok = nz >= 0
    safe = jnp.maximum(nz, 0)
    return ScanPlanes(
        center=allp.center[safe], normal=allp.normal[safe],
        quality=allp.quality[safe], sigma_n=allp.sigma_n[safe], valid=ok)


class IekfResult(NamedTuple):
    x: NavState
    ok: jnp.ndarray          # degeneracy verdict: lambda_min(nn^T) >= 14
    match_num: jnp.ndarray
    nnt_min: jnp.ndarray
    iters: jnp.ndarray


def iekf_iteration_math(x_prop: NavState, cov_inv, x_c: NavState, pts_body,
                        wld, ok, nrm, ctr, sigma_d, scan_planes,
                        vnc_found, vnc_n_map):
    """One IEKF iteration's pure solver math GIVEN the match results
    (odometry.cpp:100-207): per-point point-to-plane accumulation, the VNC
    normal-consistency block, and the DIM-state gain/solution algebra.
    Factored out of the update loop so tests/test_reference_oracle.py can
    cross-check it against the reference's own equations on a fixture
    (precomputed matches stand in for the map lookups).

    Returns (sol (DIM,), G6 (DIM, 6), nnt (3, 3), match_num); the caller
    applies boxplus, the convergence/rematch protocol, and the posterior
    covariance (I - G) P."""
    f32 = pts_body.dtype
    R32 = x_c.R.astype(f32)

    w_r = jnp.where(ok, 1.0 / (0.0005 + sigma_d), 0.0)
    resi = jnp.sum(nrm * (wld - ctr), axis=-1)
    # [p]x (R^T n) as a cross product: keeps the loop free of a
    # captured (N, 3, 3) skew table (a full (8,128) tile per point)
    jac_rot = jnp.cross(pts_body, nrm @ R32)
    jac = jnp.concatenate([jac_rot, nrm], axis=-1)
    # the big per-point reductions run in f32 on the MXU (at 20k+ points the
    # f64-einsum form was the hottest op of the whole IEKF: f64 dots are
    # software-emulated on TPU). f32-true accumulation over N~2e4 terms
    # carries ~sqrt(N)*2^-24 ~ 1e-5 relative error into the 6x6 normal
    # equations — absorbed by the f64 solve + refined inverse downstream
    # (same split as the BA's f32-Cholesky + f64-refinement). ATE parity
    # re-pinned on both bench worlds + the stairwell init after the change.
    jw = jac * w_r[:, None]
    HTH = (jw.T @ jac).astype(jnp.float64)
    HTz = -(jw.T @ resi).astype(jnp.float64)
    nok = jnp.where(ok[:, None], nrm, 0.0)
    nnt = (nok.T @ nok).astype(jnp.float64)
    match_num = jnp.sum(ok, dtype=jnp.int32)

    if scan_planes is not None:
        sp = scan_planes
        n_w = sp.normal @ R32.T
        n_w = n_w / jnp.maximum(
            jnp.linalg.norm(n_w, axis=-1, keepdims=True), 1e-12)
        found, n_map = vnc_found, vnc_n_map
        dot = jnp.abs(jnp.sum(n_w * n_map, axis=-1))
        use = sp.valid & found & (dot >= 0.7)
        S = jnp.eye(3, dtype=f32) - n_map[:, :, None] * n_map[:, None, :]
        r = bmv(S, n_w)
        hn = so3.hat(sp.normal)
        Jr = -bmm(S, bmm(jnp.broadcast_to(R32, hn.shape), hn))
        wv = 0.1 * sp.quality / (sp.sigma_n * sp.sigma_n + 0.01)
        wv = jnp.where(use & jnp.isfinite(wv), wv, 0.0).astype(jnp.float64)
        # J_pos = 0 (cpp:179-182): VNC only informs the rotation block
        Jr64 = Jr.astype(jnp.float64)
        HTH = HTH.at[0:3, 0:3].add(jnp.einsum("s,sia,sib->ab", wv, Jr64, Jr64))
        HTz = HTz.at[0:3].add(-jnp.einsum("s,sia,si->a", wv, Jr64,
                                          r.astype(jnp.float64)))

    H_T_H = jnp.zeros((DIM, DIM), jnp.float64).at[0:6, 0:6].set(HTH)
    K_1 = inv_psd(H_T_H + cov_inv)
    G6 = K_1[:, 0:6] @ HTH                      # (DIM, 6)
    from vina_slam_tpu.core.state import boxminus
    vec = boxminus(x_prop, x_c)
    sol = K_1[:, 0:6] @ HTz + vec - G6 @ vec[0:6]
    return sol, G6, nnt, match_num


@partial(jax.jit, static_argnames=("ms", "max_iter", "use_vnc"))
def iekf_update(x: NavState, m: vm.VoxelMap, pts_body, var_body, valid,
                scan_planes: ScanPlanes, params: vm.MapParams, ms: vm.MapStatic,
                max_iter: int, use_vnc: bool) -> IekfResult:
    """LioStateEstimation (odometry.cpp:64-255). x in f64; points f32.

    Stopping protocol: converged (|drot|<0.01 deg, |dp|<0.015 cm) or
    next-to-last iteration bumps rematch_num; rematch_num>=2 or last
    iteration stops and applies the posterior cov (I-G)P (cpp:205-230)."""
    x_prop = x
    cov_inv = inv_psd(x.cov)
    f32 = pts_body.dtype
    refind_cap = max(512, pts_body.shape[0] // 8)

    # descend once at the prior pose; iterations verify + re-walk movers
    # only (the reference's cached-octree fast path, odometry.cpp:124-132)
    R0 = x.R.astype(f32)
    p0 = x.p.astype(f32)
    wld0 = pts_body @ R0.T + p0
    slot0, lv0, crd0 = vm.descend(m, wld0, params, ms)

    # world-frame point covariance at the PRIOR pose, reused across
    # iterations: it enters only the 3-sigma gate and the 1/(5e-4+sigma)
    # weights, and rotating a covariance by the <0.01-degree per-iteration
    # pose updates changes it at the 1e-4 relative level (the reference
    # recomputes per iteration; documented deviation, PARITY.md)
    rot_var0 = x.cov[0:3, 0:3].astype(f32)
    tsl_var0 = x.cov[3:6, 3:6].astype(f32)
    # SYM3-packed: the while_loop captures this (N,) x 6-lane constant in
    # HBM; a (N, 3, 3) form would occupy a full (8, 128) tile per point
    from vina_slam_tpu.core.pointcov import sym3_pack
    phat0 = so3.hat(pts_body)           # loop-free: fused into var_world0
    var_world0 = sym3_pack(
        sandwich(jnp.broadcast_to(R0, var_body.shape), var_body)
        + sandwich(phat0, jnp.broadcast_to(rot_var0, var_body.shape))
        + tsl_var0
    )

    if use_vnc:
        # 27-neighbor map-plane match for the scan planes ONCE per update:
        # plane centers move sub-mm between IEKF iterations, so the
        # best-neighbor selection is stable; the residual/Jacobian still
        # re-evaluate with the current rotation every iteration. (The
        # reference re-runs matchVoxelMap per iteration; its match output
        # is equally stable — documented deviation, PARITY.md.)
        sp = scan_planes
        c_w0 = sp.center @ R0.T + p0
        vnc_found, vnc_n_map, _, _ = vm.match_neighbors(m, c_w0, params, ms)
        vnc_n_map = vnc_n_map / jnp.maximum(
            jnp.linalg.norm(vnc_n_map, axis=-1, keepdims=True), 1e-12)

    def one_iter(carry):
        it, rematch, stop, x_c, nnt_last, match_last, slot, lv, crd = carry
        R32 = x_c.R.astype(f32)
        p32 = x_c.p.astype(f32)
        var_world = var_world0
        wld = pts_body @ R32.T + p32
        slot, lv, crd = vm.refresh_slots(m, wld, slot, lv, crd, params, ms,
                                         refind_cap)
        ok, nrm, ctr, sigma_d = vm.match_with_slots(m, wld, var_world, slot,
                                                    params)
        ok = ok & valid

        sol, G6, nnt, match_num = iekf_iteration_math(
            x_prop, cov_inv, x_c, pts_body, wld, ok, nrm, ctr, sigma_d,
            scan_planes if use_vnc else None,
            vnc_found if use_vnc else None,
            vnc_n_map if use_vnc else None)
        from vina_slam_tpu.core.state import boxplus
        x_n = boxplus(x_c, sol)

        rot_add = jnp.linalg.norm(sol[0:3])
        tra_add = jnp.linalg.norm(sol[3:6])
        converged = (rot_add * 57.3 < 0.01) & (tra_add * 100 < 0.015)
        bump = converged | ((rematch == 0) & (it == max_iter - 2))
        rematch_n = rematch + bump.astype(rematch.dtype)
        stop_n = (rematch_n >= 2) | (it == max_iter - 1)

        G = jnp.zeros((DIM, DIM), jnp.float64).at[:, 0:6].set(G6)
        cov_post = (jnp.eye(DIM, dtype=jnp.float64) - G) @ x_c.cov
        x_n = x_n._replace(cov=jnp.where(stop_n, cov_post, x_c.cov))
        return (it + 1, rematch_n, stop_n, x_n, nnt, match_num, slot, lv, crd)

    def cond(carry):
        it, rematch, stop, *_ = carry
        return (it < max_iter) & ~stop

    init = (jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32),
            jnp.asarray(False), x,
            jnp.zeros((3, 3), jnp.float64), jnp.asarray(0, jnp.int32),
            slot0, lv0, crd0)
    (it, rematch, stop, x_out, nnt, match_num, _, _, _) = jax.lax.while_loop(
        cond, one_iter, init)

    evals, _ = eigh3(nnt)
    return IekfResult(x=x_out, ok=evals[0] >= 14.0, match_num=match_num,
                      nnt_min=evals[0], iters=it)


# ------------------------------------------------------------ kdtree boot

@partial(jax.jit, static_argnames=("max_iter",))
def iekf_update_knn(x: NavState, map_pts, map_valid, pts_body, valid,
                    max_iter: int = 4):
    """lio_state_estimation_kdtree (odometry.cpp:267-439): bootstrap odometry
    against an accumulated downsampled cloud. The PCL KdTree 5-NN is a
    brute-force [N, M] distance matmul + top_k (MXU-friendly); plane fit via
    the A x = -1 solve with the 0.1 residual gate; prior deweighted by 1000.
    """
    x_prop = x
    cov_inv = inv_psd(x.cov) / 1000.0
    f32 = pts_body.dtype
    bigdist = jnp.asarray(1e12, f32)

    def knn_planes(x_c):
        R32, p32 = x_c.R.astype(f32), x_c.p.astype(f32)
        wld = pts_body @ R32.T + p32
        d2 = (
            jnp.sum(wld * wld, axis=-1, keepdims=True)
            - 2.0 * wld @ map_pts.T
            + jnp.sum(map_pts * map_pts, axis=-1)[None, :]
        )
        d2 = jnp.where(map_valid[None, :], d2, bigdist)
        _, idx = jax.lax.top_k(-d2, NMATCH)
        A = map_pts[idx]                       # (N, 5, 3)
        ones = -jnp.ones((NMATCH,), f32)
        AtA = jnp.sum(A[..., :, :, None] * A[..., :, None, :], axis=-3)
        Atb = jnp.sum(A * ones[:, None], axis=-2)
        direct = jnp.linalg.solve(
            AtA + 1e-6 * jnp.eye(3, dtype=f32), Atb[..., None])[..., 0]
        fit_ok = jnp.all(
            jnp.abs(jnp.einsum("nki,ni->nk", A, direct) + 1.0) <= 0.1, axis=-1)
        fit_ok = fit_ok & jnp.all(jnp.isfinite(direct), axis=-1)
        # zero rejected fits entirely: a 0-weight times NaN still poisons
        # the einsum reductions downstream
        direct = jnp.where(fit_ok[:, None], direct, 0.0)
        dnorm = jnp.linalg.norm(direct, axis=-1)
        d = jnp.where(fit_ok, 1.0 / jnp.maximum(dnorm, 1e-12), 0.0)
        normal = direct * d[:, None]
        return fit_ok & valid, normal, d

    def one_iter(carry):
        it, rematch, stop, refind, x_c, ok, normal, dconst = carry
        ok2, normal2, d2 = knn_planes(x_c)
        ok = jnp.where(refind, ok2, ok)
        normal = jnp.where(refind, normal2, normal)
        dconst = jnp.where(refind, d2, dconst)

        R32, p32 = x_c.R.astype(f32), x_c.p.astype(f32)
        wld = pts_body @ R32.T + p32
        pd2 = jnp.sum(normal * wld, axis=-1) + dconst
        jac_rot = jnp.cross(pts_body, normal @ R32)
        jac = jnp.concatenate([jac_rot, normal], axis=-1).astype(jnp.float64)
        w = ok.astype(jnp.float64)
        HTH = jnp.einsum("n,ni,nj->ij", w, jac, jac)
        HTz = -jnp.einsum("n,ni,n->i", w, jac, pd2.astype(jnp.float64))

        H_T_H = jnp.zeros((DIM, DIM), jnp.float64).at[0:6, 0:6].set(HTH)
        K_1 = inv_psd(H_T_H + cov_inv)
        G6 = K_1[:, 0:6] @ HTH
        from vina_slam_tpu.core.state import boxminus, boxplus
        vec = boxminus(x_prop, x_c)
        sol = K_1[:, 0:6] @ HTz + vec - G6 @ vec[0:6]
        x_n = boxplus(x_c, sol)

        rot_add = jnp.linalg.norm(sol[0:3])
        tra_add = jnp.linalg.norm(sol[3:6])
        converged = (rot_add * 57.3 < 0.01) & (tra_add * 100 < 0.015)
        rematch_n = rematch + converged.astype(rematch.dtype)
        refind_n = converged | ((it == max_iter - 2) & (rematch == 0))
        stop_n = (rematch_n >= 2) | (it == max_iter - 1)
        G = jnp.zeros((DIM, DIM), jnp.float64).at[:, 0:6].set(G6)
        cov_post = (jnp.eye(DIM, dtype=jnp.float64) - G) @ x_c.cov
        x_n = x_n._replace(cov=jnp.where(stop_n, cov_post, x_c.cov))
        return (it + 1, rematch_n, stop_n, refind_n, x_n, ok, normal, dconst)

    def cond(carry):
        it, rematch, stop, *_ = carry
        return (it < max_iter) & ~stop

    N = pts_body.shape[0]
    init = (jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32), jnp.asarray(False), jnp.asarray(True),
            x, jnp.zeros(N, bool), jnp.zeros((N, 3), f32), jnp.zeros(N, f32))
    out = jax.lax.while_loop(cond, one_iter, init)
    return out[4]
