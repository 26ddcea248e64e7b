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

from vina_slam_tpu.core.eigh3 import eigh3
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
                    params: MapParams, ms: MapStatic, V: int, W: int) -> BAFactors:
    """tras_opt analog (octree.cpp:498-549): gather every active planar leaf
    (ratio gate lambda0/lambda1 <= 0.12, with window data) into padded
    factor arrays.

    slots: (W, Np) leaf assignment from recut; win_pts_w: (W, Np, 3) WORLD
    positions under the current window poses (Rs, ps): the per-(voxel,frame)
    moments accumulate voxel-center-relative in f32 (|rel| ~ voxel edge, so
    centralizing is cancellation-free — no emulated-f64 segment sums), then
    the exact covariant transform recovers the body-frame central moments:
    P_c,body = R_i^T P_c,world R_i, mean_body = R_i^T (mean_world - p_i)."""
    C = ms.capacity

    flat_slots = slots.reshape(-1)
    flat_valid = (win_valid & (slots >= 0)).reshape(-1)
    sid = jnp.where(flat_valid, flat_slots, C)
    # f32 accumulate: integer segment_sum takes a slow scatter path on TPU
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

    # inverse index slot -> compact position
    inv = jnp.full(C + 1, -1, jnp.int32)
    inv = inv.at[safe].set(
        jnp.where(vvalid, jnp.arange(V, dtype=jnp.int32), -1), mode="drop")

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
        fix_P=m.fix_P[safe],
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

@partial(jax.jit, static_argnames=("W",))
def lidar_acc(f: BAFactors, Rs, ps, W: int):
    """acc_evaluate2 (factors.cpp:22-126): residual, gradient (6W,), and the
    full Gauss-Newton Hessian (6W, 6W) of sum_v coe_v * lambda_min.
    Internally f32 (central moments, see module docstring); outputs f64."""
    Rs = Rs.astype(jnp.float32)
    ps = ps.astype(jnp.float32)
    P, v, N, t = _aggregate(f, Rs, ps)
    lmbd, U, vbar, NN = _eig_state(P, v, N)
    uk = U[..., :, 0]
    active = (f.Nb > 0)
    coe = f.coe

    gaps = lmbd[:, 0:1] - lmbd[:, 1:3]
    cgap = 2.0 / jnp.where(jnp.abs(gaps) < 1e-20, -1e-20, gaps)   # (V, 2)
    Usub = U[..., :, 1:3]
    umumT = jnp.sum(cgap[:, None, None, :]
                    * Usub[..., :, None, :] * Usub[..., None, :, :], axis=-1)

    Auk, x, RiTuk, RiTukhat, combo1 = _auk(f, Rs, t, uk, vbar, NN)
    mask = active[..., None, None].astype(jnp.float32)
    Auk = Auk * mask
    x = x * active[..., None]

    # gradient: jjt = Auk^T uk per frame (cpp:85-86)
    jjt = jnp.sum(Auk * uk[:, None, :, None], axis=-2)    # (V, W, 6)
    JacT = jnp.einsum("v,vwa->wa", coe, jjt).reshape(W * 6)

    # main Hessian term over all frame pairs
    Abig = jnp.swapaxes(Auk, 1, 2).reshape(-1, 3, W * 6)  # (V, 3, 6W)
    tmp = bmm(umumT, Abig) * coe[:, None, None]
    H = jnp.einsum("via,vib->ab", Abig, tmp)

    # rank-1 cross correction  -(2 coe / NN^2) g g^T  (cpp:109-113 incl. the
    # i==j parts, which reappear inside the diagonal extras below)
    nuk = f.Nb[..., None] * uk[:, None, :] * active[..., None]
    g = jnp.concatenate([x, nuk], axis=-1).reshape(-1, W * 6)  # (V, 6W)
    cg = -2.0 * coe / (NN * NN)
    H = H + jnp.einsum("v,va,vb->ab", cg, g, g)

    # block-diagonal extras (cpp:88-94 minus the cross-form i==j parts);
    # RiTukhat @ Pi reconstructed: RiTukhat Pc - x m^T (since
    # hat(RiTuk) N m m^T = N (RiTuk x m) m^T = -x m^T)
    ukukT = uk[:, :, None] * uk[:, None, :]
    RiTukhatPi = (bmm(RiTukhat, f.Pb)
                  - x[..., :, None] * f.vb[..., None, :])
    d_rot = (2.0 / NN[:, None, None, None]) * (
        bmm(combo1 - RiTukhatPi, RiTukhat)
    ) - 0.5 * _hat(jjt[..., 0:3])
    d_rt = (2.0 / NN[:, None, None, None]) * x[..., :, None] * uk[:, None, None, :]
    d_tt = (2.0 * f.Nb / NN[:, None])[..., None, None] * ukukT[:, None]
    top = jnp.concatenate([d_rot, d_rt], axis=-1)
    bot = jnp.concatenate([jnp.swapaxes(d_rt, -1, -2), d_tt], axis=-1)
    dblk = jnp.concatenate([top, bot], axis=-2) * mask    # (V, W, 6, 6)
    dblk = jnp.einsum("v,vwab->wab", coe, dblk)
    Hd = jnp.zeros((W, 6, W, 6), jnp.float32).at[
        jnp.arange(W), :, jnp.arange(W), :].add(dblk)
    H = H + Hd.reshape(W * 6, W * 6)

    residual = jnp.sum((coe * lmbd[:, 0]).astype(jnp.float64))
    return residual, JacT.astype(jnp.float64), H.astype(jnp.float64)


@jax.jit
def lidar_residual(f: BAFactors, Rs, ps):
    """evaluate_only_residual (factors.cpp:128-158): sum coe * lambda_min."""
    P, v, N, _ = _aggregate(f, Rs.astype(jnp.float32), ps.astype(jnp.float32))
    lmbd, _, _, _ = _eig_state(P, v, N)
    return jnp.sum((f.coe * lmbd[:, 0]).astype(jnp.float64))


@partial(jax.jit, static_argnames=("W",))
def normal_acc(f: BAFactors, Rs, ps, W: int):
    """NormalFactor::acc_evaluate2 (factors.cpp:185-304): VNC cost
    0.5 * coe * |(I - n n^T) u_min|^2 with GN Hessian J^T J."""
    Rs = Rs.astype(jnp.float32)
    ps = ps.astype(jnp.float32)
    P, v, N, t = _aggregate(f, Rs, ps)
    lmbd, U, vbar, NN = _eig_state(P, v, N)
    uk = U[..., :, 0]
    has = N > 0  # sig.N == 0 guard (factors.cpp:220-221)
    coe = f.coe * has.astype(jnp.float32)

    S = jnp.eye(3, dtype=jnp.float32) - f.n_ref[:, :, None] * f.n_ref[:, None, :]
    r = bmv(S, uk)
    residual = 0.5 * jnp.sum(coe * jnp.sum(r * r, axis=-1))

    eps = 1e-9
    gaps = lmbd[:, 0:1] - lmbd[:, 1:3]
    gaps = jnp.where(jnp.abs(gaps) < eps, jnp.where(gaps >= 0, eps, -eps), gaps)
    Usub = U[..., :, 1:3]
    Tn = jnp.sum((1.0 / gaps)[:, None, None, :]
                 * Usub[..., :, None, :] * Usub[..., None, :, :], axis=-1)

    Auk, _, _, _, _ = _auk(f, Rs, t, uk, vbar, NN)
    Auk = Auk * (f.Nb > 0)[..., None, None].astype(jnp.float32)
    STn = bmm(S, Tn)
    J = bmm(jnp.broadcast_to(STn[:, None], Auk.shape[:2] + (3, 3)), Auk)

    Jr = jnp.sum(J * r[:, None, :, None], axis=-2)        # (V, W, 6)
    JacT = jnp.einsum("v,vwa->wa", coe, Jr).reshape(W * 6)
    Jbig = jnp.swapaxes(J, 1, 2).reshape(-1, 3, W * 6)
    H = jnp.einsum("via,vib->ab", Jbig * coe[:, None, None], Jbig)
    return (residual.astype(jnp.float64), JacT.astype(jnp.float64),
            H.astype(jnp.float64))


@jax.jit
def normal_residual(f: BAFactors, Rs, ps):
    P, v, N, _ = _aggregate(f, Rs.astype(jnp.float32), ps.astype(jnp.float32))
    lmbd, U, _, _ = _eig_state(P, v, N)
    uk = U[..., :, 0]
    has = N > 0
    coe = f.coe * has.astype(jnp.float32)
    S = jnp.eye(3, dtype=jnp.float32) - f.n_ref[:, :, None] * f.n_ref[:, None, :]
    r = bmv(S, uk)
    return (0.5 * jnp.sum(coe * jnp.sum(r * r, axis=-1))).astype(jnp.float64)
