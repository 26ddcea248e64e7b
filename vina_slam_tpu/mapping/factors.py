"""Windowed-BA factors, batched over voxels.

Reference: src/mapping/factors.cpp.
  * LidarFactor (cpp:7-168): residual = coe * lambda_min of the pose-
    transformed aggregate point covariance per voxel; analytic gradient and
    Gauss-Newton Hessian w.r.t. all window poses including cross-frame
    blocks, via the eigenvector perturbation umumT = sum_{i!=k}
    2/(lk-li) u_i u_i^T (cpp:22-126).
  * NormalFactor (cpp:171-355): VNC residual r = (I - n_ref n_ref^T) u_min
    with Gauss-Newton Hessian via the J_i = S Tn Auk_i chain (cpp:239-298).

TPU design: the per-voxel thread fan-out (optimizers.cpp:36-56) becomes one
batched evaluation over a padded voxel array [V]; the full 6Wx6W Hessian
assembles as big matmuls:
  H = Abig^T umumT Abig  -  (2 coe / N^2) g g^T  +  block-diag extras
where Abig stacks the per-frame 3x6 Auk blocks into [V, 3, 6W] and
g[V, 6W] stacks (v_i x (R_i^T u_k) ; n_i u_k) per frame — the cross-frame
correction blocks of cpp:100-118 are exactly this rank-1 outer product.

Precision design: factor math runs in f32 on TPU (f64 is emulated ~20x
slower) using a cancellation-free CENTRAL-MOMENT parameterization: per
(voxel, frame) we store the central body moments P_c = sum (p-mean)(p-mean)^T
and the mean; the world-frame per-frame moments are then exactly
  P_w = R P_c R^T + N u u^T,   v_w = N u,   u = R mean + (p_i - c_v)
with u small (sensor-to-voxel offsets), so the aggregate covariance and its
lambda_min carry NO catastrophic cancellation in f32. Only the Auk
derivative terms reconstruct the raw moments (P_c + N mean mean^T) and pick
up ~1e-4 relative noise — harmless to LM. Extraction computes the segment
sums in f64 once, centralizes, and stores f32.

Unlike the reference, which caches eig state from the last
evaluate_only_residual (factors.cpp:152-154) and reuses it in
acc_evaluate2, we recompute the aggregate + eigendecomposition from the
CURRENT poses inside each evaluation — semantically identical (the cached
state always corresponds to the accepted = current poses) and stateless.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from vina_slam_tpu.core.eigh3 import eigh3, eigh3c, eigvals3c
from vina_slam_tpu.core.mat3 import bmm, bmv, bvm, sandwich
from vina_slam_tpu.mapping import voxel_hash as vh
from vina_slam_tpu.mapping.voxel_map import MapParams, MapStatic, VoxelMap, slot_meta


class BAFactors(NamedTuple):
    """Per-voxel factor payload (push_voxel analog, factors.cpp:11-20),
    padded to a static V. All f32; `coe` is 0 on padding rows."""
    Pb: jnp.ndarray      # (V, W, 3, 3) CENTRAL body-frame second moments
    vb: jnp.ndarray      # (V, W, 3) body-frame cluster MEAN
    Nb: jnp.ndarray      # (V, W)
    fix_P: jnp.ndarray   # (V, 3, 3)  fixed cluster, voxel-center frame
    fix_v: jnp.ndarray   # (V, 3)
    fix_N: jnp.ndarray   # (V,)
    centers: jnp.ndarray  # (V, 3) world voxel centers (per-voxel shift)
    n_ref: jnp.ndarray   # (V, 3) reference normals (VNC factor)
    coe: jnp.ndarray     # (V,)
    n_valid: jnp.ndarray  # () i32 — number of real voxels


@partial(jax.jit, static_argnames=("ms", "V", "W"))
def extract_factors(m: VoxelMap, slots, win_pts_w, win_valid, Rs, ps,
                    params: MapParams, ms: MapStatic, V: int, W: int,
                    win_count=None, frame_moments=None) -> BAFactors:
    """tras_opt analog (octree.cpp:498-549): gather every active planar leaf
    (ratio gate lambda0/lambda1 <= 0.12, with window data) into padded
    factor arrays.

    slots: (W, Np) leaf assignment from recut; win_pts_w: (W, Np, 3) WORLD
    positions under the current window poses (Rs, ps): the per-(voxel,frame)
    moments accumulate voxel-center-relative in f32 (|rel| ~ voxel edge, so
    centralizing is cancellation-free — no emulated-f64 segment sums), then
    the exact covariant transform recovers the body-frame central moments:
    P_c,body = R_i^T P_c,world R_i, mean_body = R_i^T (mean_world - p_i).

    frame_moments: optional (W, C, 10) per-(frame, slot) moment columns from
    recut's final refit wave (recut(..., return_frame_moments=True)) — the
    same quantities this function would accumulate, so the whole per-point
    pipeline (slot_meta gather, outer products, full-window segment-sum)
    collapses to a (V, W, 10) gather of selected rows."""
    C = ms.capacity

    flat_slots = slots.reshape(-1)
    flat_valid = (win_valid & (slots >= 0)).reshape(-1)
    if win_count is None:
        if frame_moments is not None:
            win_count = frame_moments[:, :, 9].sum(axis=0)
        else:
            # f32 accumulate: integer segment_sum takes a slow scatter path
            # on TPU. The fused step passes recut's final-wave counts
            # instead (recut(..., return_counts=True)) — same
            # (slots, valid) set, so this full-capacity segment sum is
            # skipped there.
            sid = jnp.where(flat_valid, flat_slots, C)
            win_count = jax.ops.segment_sum(
                flat_valid.astype(jnp.float32), sid, num_segments=C + 1)[:C]

    ratio = m.eig_val[:, 0] / jnp.maximum(m.eig_val[:, 1], 1e-20)
    cond = (
        (m.keys != vh.EMPTY_KEY) & (m.state == 0) & m.is_plane
        & (ratio <= 0.12) & (win_count > 0)
    )
    idx = vh.compact_indices(cond, V, -1)
    vvalid = idx >= 0
    safe = jnp.maximum(idx, 0)

    from vina_slam_tpu.core.pointcov import sym3_unpack

    if frame_moments is not None:
        sub = jnp.swapaxes(jnp.take(frame_moments, safe, axis=1), 0, 1)
        Pr = sym3_unpack(sub[..., 0:6])        # (V, W, 3, 3)
        vr = sub[..., 6:9]
        Nb = sub[..., 9]
    else:
        # inverse index slot -> compact position
        inv = jnp.full(C + 1, -1, jnp.int32)
        inv = inv.at[safe].set(
            jnp.where(vvalid, jnp.arange(V, dtype=jnp.int32), -1),
            mode="drop")

        frame_id = jnp.broadcast_to(
            jnp.arange(W)[:, None], slots.shape).reshape(-1)
        pos = inv[jnp.where(flat_valid, flat_slots, C)]
        seg = jnp.where(flat_valid & (pos >= 0), pos * W + frame_id, V * W)
        from vina_slam_tpu.mapping.voxel_map import _outer9
        _, centers_pt, _ = slot_meta(m, flat_slots, params)
        rel = (win_pts_w.reshape(-1, 3) - centers_pt).astype(jnp.float32)
        w = (seg < V * W).astype(jnp.float32)
        p = rel * w[:, None]
        flat = jnp.concatenate([_outer9(p), p, w[:, None]], axis=-1)
        acc = jax.ops.segment_sum(flat, seg, num_segments=V * W + 1)[: V * W]
        Pr = acc[:, 0:9].reshape(V, W, 3, 3)
        vr = acc[:, 9:12].reshape(V, W, 3)
        Nb = acc[:, 12].reshape(V, W)

    _, centers, _ = slot_meta(m, safe, params)
    nrm = m.plane_normal[safe].astype(jnp.float32)
    nrm = nrm / jnp.maximum(jnp.linalg.norm(nrm, axis=-1, keepdims=True), 1e-12)

    # centralize in the world voxel-center frame, then rotate to body axes
    mean_rel = vr / jnp.maximum(Nb, 1.0)[..., None]
    Pc_w = Pr - Nb[..., None, None] * mean_rel[..., :, None] * mean_rel[..., None, :]
    R32 = Rs.astype(jnp.float32)
    p32 = ps.astype(jnp.float32)
    RT = jnp.swapaxes(R32, -1, -2)
    Pc_b = sandwich(RT[None], Pc_w)                       # R^T Pc R
    mean_w = mean_rel + centers[:, None, :] - p32[None, :, :]
    mean_b = bvm(mean_w, R32[None])                       # R^T mean

    return BAFactors(
        Pb=Pc_b, vb=mean_b,
        Nb=Nb,
        # map storage is SYM3-packed; factors carry the full (V, 3, 3) —
        # V is small (<= max_voxels_ba) so the unpack is negligible
        fix_P=sym3_unpack(m.fix_P[safe]),
        fix_v=m.fix_v[safe],
        fix_N=m.fix_N[safe],
        centers=centers,
        n_ref=nrm,
        coe=jnp.where(vvalid, jnp.float32(1.0), jnp.float32(0.0)),
        n_valid=jnp.sum(vvalid).astype(jnp.int32),
    )


def _hat(v):
    z = jnp.zeros_like(v[..., 0])
    return jnp.stack([
        jnp.stack([z, -v[..., 2], v[..., 1]], -1),
        jnp.stack([v[..., 2], z, -v[..., 0]], -1),
        jnp.stack([-v[..., 1], v[..., 0], z], -1),
    ], -2)


def _aggregate(f: BAFactors, Rs, ps):
    """Pose-transformed per-voxel aggregate in the voxel-center frame from
    CENTRAL moments (exact, cancellation-free in f32):
      u_i = R_i mean_i + (p_i - c_v)
      P_w = R P_c R^T + N u u^T,  v_w = N u
    (equivalent to PointCluster::transform, types.hpp:168-174).
    Returns (P, v, N, t) with t = p_i - c_v (the shifted translations)."""
    t = ps[None, :, :] - f.centers[:, None, :]            # (V, W, 3)
    u = bmv(Rs[None], f.vb) + t                           # (V, W, 3), small
    v_w = f.Nb[..., None] * u
    P_w = (
        sandwich(Rs[None], f.Pb)
        + f.Nb[..., None, None] * u[..., :, None] * u[..., None, :]
    )
    P = f.fix_P + jnp.sum(P_w, axis=1)
    v = f.fix_v + jnp.sum(v_w, axis=1)
    N = f.fix_N + jnp.sum(f.Nb, axis=1)
    return P, v, N, t


def _eig_state(P, v, N):
    Ns = jnp.maximum(N, 1.0)
    vbar = v / Ns[:, None]
    Cov = P / Ns[:, None, None] - vbar[:, None, :] * vbar[:, :, None]
    lmbd, U = eigh3(Cov)
    return lmbd, U, vbar, Ns


def _auk(f: BAFactors, Rs, t, uk, vbar, NN):
    """Auk blocks (factors.cpp:79-83): the 3x6 derivative of the aggregate
    covariance action on u_k w.r.t. pose i. Raw body moments are
    reconstructed from the central parameterization (Pi = P_c + N m m^T,
    vi = N m) — derivative-only terms, tolerant of f32 rounding. Returns
    (Auk (V,W,3,6), x=(v_i x R_i^T u_k), RiTuk, RiTukhat, combo1, Pi)."""
    dtype = f.Pb.dtype
    m_ = f.vb                                             # body mean
    Ni = f.Nb
    vi = Ni[..., None] * m_                               # raw first moment
    RiTuk = bvm(uk[:, None, :], Rs[None])                 # R_i^T u_k
    x = jnp.cross(vi, RiTuk)                              # vihat @ RiTuk
    # Pi RiTuk = Pc RiTuk + N m (m . RiTuk)
    PiRiTuk = (bmv(f.Pb, RiTuk)
               + vi * jnp.sum(m_ * RiTuk, axis=-1)[..., None])
    ti_v = t - vbar[:, None, :]                           # (V, W, 3)
    ukTti_v = jnp.sum(uk[:, None, :] * ti_v, axis=-1)
    combo1 = _hat(PiRiTuk) + _hat(vi) * ukTti_v[..., None, None]
    combo2 = bmv(Rs[None], vi) + Ni[..., None] * ti_v
    RiTukhat = _hat(RiTuk)
    # (Ri Pi + ti_v vi^T) = Ri Pc + (Ri m) (N m)^T + ti_v vi^T
    Rm = bmv(Rs[None], m_)
    RiPi_plus = (bmm(jnp.broadcast_to(Rs[None], f.Pb.shape), f.Pb)
                 + Rm[..., :, None] * vi[..., None, :]
                 + ti_v[..., :, None] * vi[..., None, :])
    A_rot = (bmm(RiPi_plus, RiTukhat)
             - bmm(jnp.broadcast_to(Rs[None], combo1.shape), combo1))
    A_tsl = (
        combo2[..., :, None] * uk[:, None, None, :]
        + jnp.sum(combo2 * uk[:, None, :], axis=-1)[..., None, None]
        * jnp.eye(3, dtype=dtype)
    )
    Auk = jnp.concatenate([A_rot, A_tsl], axis=-1) / NN[:, None, None, None]
    return Auk, x, RiTuk, RiTukhat, combo1

# ------------------------------------------------- flat-column fast path
#
# The (V, W, 3, 3) forms above keep the tiny matrix dims minor-most, so on
# TPU every VPU op uses 3 (or 9) of a tile's 128 lanes — at V=1024, W=10 the
# whole acc_evaluate2 chain ran at ~2% lane efficiency (micro_ba.py: 1.03 ms
# for ~20 MFLOP). The componentwise forms below put the voxel dim minor-most
# ((W, V) columns, V lane-dense) and reduce the dense Hessian assembly to
# plain MXU matmuls via the rank-2 decomposition
#   Abig^T umumT Abig = sum_{k=1,2} cgap_k (u_k^T Auk)^T (u_k^T Auk)
# so only the 6W-wide b_e = u_e^T Auk projections are ever materialized.
# _aggregate/_eig_state/_auk above remain the reference forms (used by the
# f64 init path and as test oracles for these).

def _sym6_cols(M):
    """(V, W, 3, 3) symmetric -> 6 (W, V) columns (00, 01, 02, 11, 12, 22)."""
    return (M[..., 0, 0].T, M[..., 0, 1].T, M[..., 0, 2].T,
            M[..., 1, 1].T, M[..., 1, 2].T, M[..., 2, 2].T)


def _R_cols(Rs):
    """(W, 3, 3) -> 9 broadcastable (W, 1) columns; index 3a+b = R[a, b]."""
    return tuple(Rs[:, a, b][:, None] for a in range(3) for b in range(3))


def _mxhat(M, w):
    """Columns of M @ hat(w): M as 9 row-major columns, w as 3 columns."""
    m00, m01, m02, m10, m11, m12, m20, m21, m22 = M
    wx, wy, wz = w
    return (m01 * wz - m02 * wy, m02 * wx - m00 * wz, m00 * wy - m01 * wx,
            m11 * wz - m12 * wy, m12 * wx - m10 * wz, m10 * wy - m11 * wx,
            m21 * wz - m22 * wy, m22 * wx - m20 * wz, m20 * wy - m21 * wx)


def _stack60(cols6):
    """6 columns of (W, V) -> (6W, V) with row index w*6 + j (frame-major,
    matching the Abig layout of the reference assembly)."""
    return jnp.stack(cols6, axis=1).reshape(-1, cols6[0].shape[-1])


def _agg_cols(f: BAFactors, Rs, ps):
    """Componentwise _aggregate: per-voxel aggregate second moments (6 (V,)
    columns), first moments, counts, plus the per-(frame, voxel) columns the
    derivative terms reuse."""
    p00, p01, p02, p11, p12, p22 = _sym6_cols(f.Pb)
    mx, my, mz = f.vb[..., 0].T, f.vb[..., 1].T, f.vb[..., 2].T
    Nb = f.Nb.T                                            # (W, V)
    R = _R_cols(Rs)
    tx = ps[:, 0][:, None] - f.centers[:, 0][None, :]
    ty = ps[:, 1][:, None] - f.centers[:, 1][None, :]
    tz = ps[:, 2][:, None] - f.centers[:, 2][None, :]
    ux = R[0] * mx + R[1] * my + R[2] * mz + tx
    uy = R[3] * mx + R[4] * my + R[5] * mz + ty
    uz = R[6] * mx + R[7] * my + R[8] * mz + tz
    # T = Pc @ R^T (9 cols), then S = R @ T (6 unique cols of R Pc R^T)
    T00 = p00 * R[0] + p01 * R[1] + p02 * R[2]
    T01 = p00 * R[3] + p01 * R[4] + p02 * R[5]
    T02 = p00 * R[6] + p01 * R[7] + p02 * R[8]
    T10 = p01 * R[0] + p11 * R[1] + p12 * R[2]
    T11 = p01 * R[3] + p11 * R[4] + p12 * R[5]
    T12 = p01 * R[6] + p11 * R[7] + p12 * R[8]
    T20 = p02 * R[0] + p12 * R[1] + p22 * R[2]
    T21 = p02 * R[3] + p12 * R[4] + p22 * R[5]
    T22 = p02 * R[6] + p12 * R[7] + p22 * R[8]
    S00 = R[0] * T00 + R[1] * T10 + R[2] * T20
    S01 = R[0] * T01 + R[1] * T11 + R[2] * T21
    S02 = R[0] * T02 + R[1] * T12 + R[2] * T22
    S11 = R[3] * T01 + R[4] * T11 + R[5] * T21
    S12 = R[3] * T02 + R[4] * T12 + R[5] * T22
    S22 = R[6] * T02 + R[7] * T12 + R[8] * T22
    A00 = f.fix_P[:, 0, 0] + jnp.sum(S00 + Nb * ux * ux, axis=0)
    A01 = f.fix_P[:, 0, 1] + jnp.sum(S01 + Nb * ux * uy, axis=0)
    A02 = f.fix_P[:, 0, 2] + jnp.sum(S02 + Nb * ux * uz, axis=0)
    A11 = f.fix_P[:, 1, 1] + jnp.sum(S11 + Nb * uy * uy, axis=0)
    A12 = f.fix_P[:, 1, 2] + jnp.sum(S12 + Nb * uy * uz, axis=0)
    A22 = f.fix_P[:, 2, 2] + jnp.sum(S22 + Nb * uz * uz, axis=0)
    vx = f.fix_v[:, 0] + jnp.sum(Nb * ux, axis=0)
    vy = f.fix_v[:, 1] + jnp.sum(Nb * uy, axis=0)
    vz = f.fix_v[:, 2] + jnp.sum(Nb * uz, axis=0)
    N = f.fix_N + jnp.sum(Nb, axis=0)
    return dict(P6=(p00, p01, p02, p11, p12, p22), m=(mx, my, mz), Nb=Nb,
                R=R, t=(tx, ty, tz), A6=(A00, A01, A02, A11, A12, A22),
                v3=(vx, vy, vz), N=N)


def _eig_cols(A6, v3, N):
    """Componentwise _eig_state: (lam, U, vbar, NN) as columns."""
    NN = jnp.maximum(N, 1.0)
    inv = 1.0 / NN
    vbx, vby, vbz = v3[0] * inv, v3[1] * inv, v3[2] * inv
    c00 = A6[0] * inv - vbx * vbx
    c01 = A6[1] * inv - vbx * vby
    c02 = A6[2] * inv - vbx * vbz
    c11 = A6[3] * inv - vby * vby
    c12 = A6[4] * inv - vby * vbz
    c22 = A6[5] * inv - vbz * vbz
    lam, U = eigh3c(c00, c01, c02, c11, c12, c22)
    return lam, U, (vbx, vby, vbz), NN


def _proj_cols(Arot, Atsl, ue, s):
    """b = s * (u_e^T [Arot | Atsl]): project the Auk columns onto an
    eigenvector; s folds the 1/NN scale and the activity mask."""
    ux, uy, uz = ue
    return (
        (ux * Arot[0] + uy * Arot[3] + uz * Arot[6]) * s,
        (ux * Arot[1] + uy * Arot[4] + uz * Arot[7]) * s,
        (ux * Arot[2] + uy * Arot[5] + uz * Arot[8]) * s,
        (ux * Atsl[0] + uy * Atsl[3] + uz * Atsl[6]) * s,
        (ux * Atsl[1] + uy * Atsl[4] + uz * Atsl[7]) * s,
        (ux * Atsl[2] + uy * Atsl[5] + uz * Atsl[8]) * s,
    )


def _auk_cols(cols, uk, vbar, NN):
    """Columns of Auk(u_k) = [A_rot | A_tsl] (WITHOUT the 1/NN scale) plus
    the per-frame pieces the diagonal extras reuse. uk is the lambda_min
    eigenvector; Auk per factors.cpp:79-83 (the _auk reference form)."""
    p00, p01, p02, p11, p12, p22 = cols["P6"]
    mx, my, mz = cols["m"]
    Nb, R = cols["Nb"], cols["R"]
    tx, ty, tz = cols["t"]
    ukx, uky, ukz = uk
    # r = R^T u
    rx = R[0] * ukx + R[3] * uky + R[6] * ukz
    ry = R[1] * ukx + R[4] * uky + R[7] * ukz
    rz = R[2] * ukx + R[5] * uky + R[8] * ukz
    vix, viy, viz = Nb * mx, Nb * my, Nb * mz
    xx = viy * rz - viz * ry
    xy = viz * rx - vix * rz
    xz = vix * ry - viy * rx
    mdr = mx * rx + my * ry + mz * rz
    P0 = p00 * rx + p01 * ry + p02 * rz + vix * mdr
    P1 = p01 * rx + p11 * ry + p12 * rz + viy * mdr
    P2 = p02 * rx + p12 * ry + p22 * rz + viz * mdr
    tvx, tvy, tvz = tx - vbar[0], ty - vbar[1], tz - vbar[2]
    ukttv = ukx * tvx + uky * tvy + ukz * tvz
    c1x, c1y, c1z = P0 + vix * ukttv, P1 + viy * ukttv, P2 + viz * ukttv
    c2x = R[0] * vix + R[1] * viy + R[2] * viz + Nb * tvx
    c2y = R[3] * vix + R[4] * viy + R[5] * viz + Nb * tvy
    c2z = R[6] * vix + R[7] * viy + R[8] * viz + Nb * tvz
    # RiPi_plus = R Pc + (R m + ti_v) vi^T  (9 cols)
    q0 = R[0] * mx + R[1] * my + R[2] * mz + tvx
    q1 = R[3] * mx + R[4] * my + R[5] * mz + tvy
    q2 = R[6] * mx + R[7] * my + R[8] * mz + tvz
    RP0 = R[0] * p00 + R[1] * p01 + R[2] * p02
    RP1 = R[0] * p01 + R[1] * p11 + R[2] * p12
    RP2 = R[0] * p02 + R[1] * p12 + R[2] * p22
    RP3 = R[3] * p00 + R[4] * p01 + R[5] * p02
    RP4 = R[3] * p01 + R[4] * p11 + R[5] * p12
    RP5 = R[3] * p02 + R[4] * p12 + R[5] * p22
    RP6 = R[6] * p00 + R[7] * p01 + R[8] * p02
    RP7 = R[6] * p01 + R[7] * p11 + R[8] * p12
    RP8 = R[6] * p02 + R[7] * p12 + R[8] * p22
    G = (RP0 + q0 * vix, RP1 + q0 * viy, RP2 + q0 * viz,
         RP3 + q1 * vix, RP4 + q1 * viy, RP5 + q1 * viz,
         RP6 + q2 * vix, RP7 + q2 * viy, RP8 + q2 * viz)
    Gh = _mxhat(G, (rx, ry, rz))
    Rh = _mxhat(R, (c1x, c1y, c1z))
    Arot = tuple(g - r_ for g, r_ in zip(Gh, Rh))          # 9 cols
    c2u = c2x * ukx + c2y * uky + c2z * ukz
    Atsl = (c2x * ukx + c2u, c2x * uky, c2x * ukz,
            c2y * ukx, c2y * uky + c2u, c2y * ukz,
            c2z * ukx, c2z * uky, c2z * ukz + c2u)
    return Arot, Atsl, dict(r=(rx, ry, rz), x=(xx, xy, xz),
                            c1=(c1x, c1y, c1z))


@partial(jax.jit, static_argnames=("W",))
def lidar_acc(f: BAFactors, Rs, ps, W: int):
    """acc_evaluate2 (factors.cpp:22-126): residual, gradient (6W,), and the
    full Gauss-Newton Hessian (6W, 6W) of sum_v coe_v * lambda_min.
    Internally f32 flat columns (see the fast-path note above); outputs f64.
    """
    Rs = Rs.astype(jnp.float32)
    ps = ps.astype(jnp.float32)
    cols = _agg_cols(f, Rs, ps)
    lam, U, vbar, NN = _eig_cols(cols["A6"], cols["v3"], cols["N"])
    w0, w1, w2 = lam
    coe = f.coe
    act = (cols["Nb"] > 0).astype(jnp.float32)             # (W, V)

    Arot, Atsl, pieces = _auk_cols(cols, U[0], vbar, NN)
    s = act / NN                                           # mask * 1/NN
    b0 = _proj_cols(Arot, Atsl, U[0], s)
    b1 = _proj_cols(Arot, Atsl, U[1], s)
    b2 = _proj_cols(Arot, Atsl, U[2], s)

    # gradient (cpp:85-86): JacT_wj = sum_v coe * b0
    JacT = jnp.sum(_stack60(b0) * coe[None, :], axis=-1)   # (6W,)

    # main Hessian: sum_k cgap_k (b_k)^T (b_k), cgap_k = 2/(l0 - lk)
    def cgap(lk):
        g = w0 - lk
        return 2.0 / jnp.where(jnp.abs(g) < 1e-20, -1e-20, g)

    B1, B2 = _stack60(b1), _stack60(b2)                    # (6W, V)
    Bcat = jnp.concatenate([B1, B2], axis=-1)              # (6W, 2V)
    Bscl = jnp.concatenate([B1 * (coe * cgap(w1))[None, :],
                            B2 * (coe * cgap(w2))[None, :]], axis=-1)
    H = jax.lax.dot_general(Bscl, Bcat, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)

    # rank-1 cross correction -(2 coe / NN^2) g g^T (cpp:109-113)
    xx, xy, xz = (c * act for c in pieces["x"])
    ukx, uky, ukz = U[0]
    Nb = cols["Nb"]
    Gv = _stack60((xx, xy, xz, Nb * ukx * act, Nb * uky * act,
                   Nb * ukz * act))                        # (6W, V)
    cg = -2.0 * coe / (NN * NN)
    H = H + jax.lax.dot_general(Gv * cg[None, :], Gv, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)

    # block-diagonal extras (cpp:88-94): all in columns, reduced over V
    p00, p01, p02, p11, p12, p22 = cols["P6"]
    mx, my, mz = cols["m"]
    rx, ry, rz = pieces["r"]
    c1x, c1y, c1z = pieces["c1"]
    xx0, xy0, xz0 = pieces["x"]                            # unmasked x
    # hat(r) Pc - x m^T (9 cols)
    hp = (-rz * p01 + ry * p02 - xx0 * mx, -rz * p11 + ry * p12 - xx0 * my,
          -rz * p12 + ry * p22 - xx0 * mz,
          rz * p00 - rx * p02 - xy0 * mx, rz * p01 - rx * p12 - xy0 * my,
          rz * p02 - rx * p22 - xy0 * mz,
          -ry * p00 + rx * p01 - xz0 * mx, -ry * p01 + rx * p11 - xz0 * my,
          -ry * p02 + rx * p12 - xz0 * mz)
    # K = combo1 - hat(r) Pi = hat(c1) - hp
    K = (-hp[0], -c1z - hp[1], c1y - hp[2],
         c1z - hp[3], -hp[4], -c1x - hp[5],
         -c1y - hp[6], c1x - hp[7], -hp[8])
    Kh = _mxhat(K, (rx, ry, rz))
    inv2 = 2.0 / NN
    # d_rot = (2/NN) Kh - 0.5 hat(b0_rot)  (b0 already masked)
    b0x, b0y, b0z = b0[0], b0[1], b0[2]
    d = [[None] * 6 for _ in range(6)]
    d[0][0] = inv2 * Kh[0]
    d[0][1] = inv2 * Kh[1] + 0.5 * b0z
    d[0][2] = inv2 * Kh[2] - 0.5 * b0y
    d[1][0] = inv2 * Kh[3] - 0.5 * b0z
    d[1][1] = inv2 * Kh[4]
    d[1][2] = inv2 * Kh[5] + 0.5 * b0x
    d[2][0] = inv2 * Kh[6] + 0.5 * b0y
    d[2][1] = inv2 * Kh[7] - 0.5 * b0x
    d[2][2] = inv2 * Kh[8]
    uk3 = (ukx, uky, ukz)
    x3 = (xx0, xy0, xz0)
    for a in range(3):
        for bb in range(3):
            d[a][3 + bb] = inv2 * x3[a] * uk3[bb]
            d[3 + a][bb] = inv2 * x3[bb] * uk3[a]
            d[3 + a][3 + bb] = inv2 * Nb * uk3[a] * uk3[bb]
    wcoe = coe[None, :] * act
    Hd_w = jnp.stack([jnp.stack([jnp.sum(d[a][bb] * wcoe, axis=-1)
                                 for bb in range(6)], axis=-1)
                      for a in range(6)], axis=-2)         # (W, 6, 6)
    Hd = jnp.zeros((W, 6, W, 6), jnp.float32).at[
        jnp.arange(W), :, jnp.arange(W), :].add(Hd_w.astype(jnp.float32))
    H = H + Hd.reshape(W * 6, W * 6)

    residual = jnp.sum((coe * w0).astype(jnp.float64))
    return residual, JacT.astype(jnp.float64), H.astype(jnp.float64)


@jax.jit
def lidar_residual(f: BAFactors, Rs, ps):
    """evaluate_only_residual (factors.cpp:128-158): sum coe * lambda_min."""
    cols = _agg_cols(f, Rs.astype(jnp.float32), ps.astype(jnp.float32))
    A6, v3, N = cols["A6"], cols["v3"], cols["N"]
    NN = jnp.maximum(N, 1.0)
    inv = 1.0 / NN
    vbx, vby, vbz = v3[0] * inv, v3[1] * inv, v3[2] * inv
    w0, _, _ = eigvals3c(A6[0] * inv - vbx * vbx, A6[1] * inv - vbx * vby,
                         A6[2] * inv - vbx * vbz, A6[3] * inv - vby * vby,
                         A6[4] * inv - vby * vbz, A6[5] * inv - vbz * vbz)
    return jnp.sum((f.coe * w0).astype(jnp.float64))


def _Su_cols(n3, u3):
    """(I - n n^T) u in columns: u - n (n . u)."""
    nd = n3[0] * u3[0] + n3[1] * u3[1] + n3[2] * u3[2]
    return (u3[0] - n3[0] * nd, u3[1] - n3[1] * nd, u3[2] - n3[2] * nd)


@partial(jax.jit, static_argnames=("W",))
def normal_acc(f: BAFactors, Rs, ps, W: int):
    """NormalFactor::acc_evaluate2 (factors.cpp:185-304): VNC cost
    0.5 * coe * |(I - n n^T) u_min|^2 with GN Hessian J^T J.

    Flat-column fast path: with Tn = sum_{k=1,2} (1/gap_k) u_k u_k^T the
    Jacobian factorizes as J = S Tn Auk = sum_k (1/gap_k) (S u_k) (u_k^T Auk)
    = sum_k (1/gap_k) (S u_k) b_k, so J^T J needs only the b_k projections
    and the 2x2 Gram of the S u_k vectors — two MXU matmuls total."""
    Rs = Rs.astype(jnp.float32)
    ps = ps.astype(jnp.float32)
    cols = _agg_cols(f, Rs, ps)
    lam, U, vbar, NN = _eig_cols(cols["A6"], cols["v3"], cols["N"])
    w0, w1, w2 = lam
    has = cols["N"] > 0  # sig.N == 0 guard (factors.cpp:220-221)
    coe = f.coe * has.astype(jnp.float32)
    act = (cols["Nb"] > 0).astype(jnp.float32)

    n3 = (f.n_ref[:, 0], f.n_ref[:, 1], f.n_ref[:, 2])
    r3 = _Su_cols(n3, U[0])
    residual = 0.5 * jnp.sum(
        coe * (r3[0] * r3[0] + r3[1] * r3[1] + r3[2] * r3[2]))

    eps = 1e-9

    def igap(lk):
        g = w0 - lk
        g = jnp.where(jnp.abs(g) < eps, jnp.where(g >= 0, eps, -eps), g)
        return 1.0 / g

    ig1, ig2 = igap(w1), igap(w2)
    Su1 = _Su_cols(n3, U[1])
    Su2 = _Su_cols(n3, U[2])

    Arot, Atsl, _ = _auk_cols(cols, U[0], vbar, NN)
    s = act / NN
    b1 = _proj_cols(Arot, Atsl, U[1], s)
    b2 = _proj_cols(Arot, Atsl, U[2], s)
    B1, B2 = _stack60(b1), _stack60(b2)                   # (6W, V)

    # gradient: Jr = sum_k ig_k (S u_k . r) b_k
    s1 = ig1 * (Su1[0] * r3[0] + Su1[1] * r3[1] + Su1[2] * r3[2])
    s2 = ig2 * (Su2[0] * r3[0] + Su2[1] * r3[1] + Su2[2] * r3[2])
    JacT = jnp.sum((B1 * s1[None, :] + B2 * s2[None, :]) * coe[None, :],
                   axis=-1)

    # Hessian: sum_kl ig_k ig_l (S u_k . S u_l) b_k^T b_l
    c11 = ig1 * ig1 * (Su1[0] ** 2 + Su1[1] ** 2 + Su1[2] ** 2)
    c12 = ig1 * ig2 * (Su1[0] * Su2[0] + Su1[1] * Su2[1] + Su1[2] * Su2[2])
    c22 = ig2 * ig2 * (Su2[0] ** 2 + Su2[1] ** 2 + Su2[2] ** 2)
    D1 = B1 * (coe * c11)[None, :] + B2 * (coe * c12)[None, :]
    D2 = B1 * (coe * c12)[None, :] + B2 * (coe * c22)[None, :]
    Dcat = jnp.concatenate([D1, D2], axis=-1)             # (6W, 2V)
    Bcat = jnp.concatenate([B1, B2], axis=-1)
    H = jax.lax.dot_general(Dcat, Bcat, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    return (residual.astype(jnp.float64), JacT.astype(jnp.float64),
            H.astype(jnp.float64))


@jax.jit
def normal_residual(f: BAFactors, Rs, ps):
    cols = _agg_cols(f, Rs.astype(jnp.float32), ps.astype(jnp.float32))
    lam, U, _, _ = _eig_cols(cols["A6"], cols["v3"], cols["N"])
    has = cols["N"] > 0
    coe = f.coe * has.astype(jnp.float32)
    n3 = (f.n_ref[:, 0], f.n_ref[:, 1], f.n_ref[:, 2])
    r3 = _Su_cols(n3, U[0])
    return (0.5 * jnp.sum(
        coe * (r3[0] * r3[0] + r3[1] * r3[1] + r3[2] * r3[2]))
    ).astype(jnp.float64)
