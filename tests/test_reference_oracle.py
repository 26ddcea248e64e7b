"""Cross-check the JAX kernels against the REFERENCE IMPLEMENTATION itself.

csrc/oracle compiles the unmodified reference sources
(src/mapping/factors.cpp, src/estimation/imu_preintegration.cpp) in place
against minimal PCL/ROS stand-ins (csrc/stubs/) — so these tests compare
vina_slam_tpu's factor/preintegration math against the actual C++ the
reference ships, not against a same-author Python re-derivation
(the correlated-oracle risk flagged in round-2 review).

Skipped when the oracle binary cannot be built (no reference checkout or
no toolchain)."""

import os
import subprocess

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ORACLE = os.path.join(REPO, "csrc", "oracle")


@pytest.fixture(scope="module")
def oracle_bin():
    if not os.path.exists(ORACLE):
        r = subprocess.run(["make", "-C", os.path.join(REPO, "csrc"), "oracle"],
                           capture_output=True, text=True, timeout=900)
        if r.returncode != 0 or not os.path.exists(ORACLE):
            pytest.skip(f"oracle build unavailable: {r.stderr[-400:]}")
    return ORACLE


def _run_oracle(oracle_bin, mode, fixture_text, tmp_path):
    fix = tmp_path / f"{mode}.txt"
    fix.write_text(fixture_text)
    r = subprocess.run([oracle_bin, mode, str(fix)], capture_output=True,
                       text=True, timeout=300)
    assert r.returncode == 0, r.stderr
    return np.asarray([float(x) for x in r.stdout.split()])


def _fmt(*arrays):
    out = []
    for a in arrays:
        out.extend(f"{float(x):.17g}" for x in np.asarray(a, float).reshape(-1))
    return " ".join(out) + "\n"


def _rand_state(rng, i):
    from vina_slam_tpu.core import so3
    R = np.asarray(so3.exp(rng.normal(scale=0.2, size=3)))
    return dict(
        t=0.1 * i, R=R, p=rng.normal(scale=0.5, size=3) + [0, 0, 1],
        v=rng.normal(scale=0.3, size=3), bg=rng.normal(scale=0.01, size=3),
        ba=rng.normal(scale=0.05, size=3), g=np.asarray([0.0, 0.0, -9.8]),
    )


def _state_txt(s):
    return _fmt([s["t"]], s["R"], s["p"], s["v"], s["bg"], s["ba"], s["g"])


def _make_clusters(rng, W, V, empty_frames=()):
    """Random per-(voxel, frame) BODY clusters from actual near-planar
    points (PSD by construction), plus a world-frame fixed cluster."""
    per = np.zeros((V, W, 3, 3))
    vb = np.zeros((V, W, 3))
    Nb = np.zeros((V, W))
    fixP = np.zeros((V, 3, 3))
    fixv = np.zeros((V, 3))
    fixN = np.zeros(V)
    for a in range(V):
        nrm = rng.normal(size=3)
        nrm /= np.linalg.norm(nrm)
        base = rng.normal(scale=1.5, size=3)
        for i in range(W):
            if i in empty_frames:
                continue
            n = int(rng.integers(6, 15))
            pts = base + rng.normal(scale=0.5, size=(n, 3))
            pts -= 0.95 * np.outer(pts @ nrm, nrm)  # squash onto a plane
            per[a, i] = pts.T @ pts
            vb[a, i] = pts.sum(0)
            Nb[a, i] = n
        nfix = int(rng.integers(5, 12))
        fpts = base + rng.normal(scale=0.5, size=(nfix, 3))
        fpts -= 0.95 * np.outer(fpts @ nrm, nrm)
        fixP[a] = fpts.T @ fpts
        fixv[a] = fpts.sum(0)
        fixN[a] = nfix
    return per, vb, Nb, fixP, fixv, fixN


def _ba_factors_from_raw(per, vb, Nb, fixP, fixv, fixN, n_ref):
    """Convert raw body clusters to the repo's central parameterization
    (factors.BAFactors) with voxel centers at the origin, so the fixed
    cluster is shared verbatim with the oracle."""
    import jax.numpy as jnp

    from vina_slam_tpu.mapping.factors import BAFactors

    V, W = Nb.shape
    mean = vb / np.maximum(Nb, 1.0)[..., None]
    Pc = per - Nb[..., None, None] * mean[..., :, None] * mean[..., None, :]
    return BAFactors(
        Pb=jnp.asarray(Pc, jnp.float32), vb=jnp.asarray(mean, jnp.float32),
        Nb=jnp.asarray(Nb, jnp.float32),
        fix_P=jnp.asarray(fixP, jnp.float32),
        fix_v=jnp.asarray(fixv, jnp.float32),
        fix_N=jnp.asarray(fixN, jnp.float32),
        centers=jnp.zeros((V, 3), jnp.float32),
        n_ref=jnp.asarray(n_ref, jnp.float32),
        coe=jnp.ones(V, jnp.float32),
        n_valid=jnp.asarray(V, jnp.int32),
    )


def _lidar_fixture(rng, W=4, V=3, empty_frames=(2,)):
    per, vb, Nb, fixP, fixv, fixN = _make_clusters(rng, W, V, empty_frames)
    n_ref = rng.normal(size=(V, 3))
    n_ref /= np.linalg.norm(n_ref, axis=1, keepdims=True)
    states = [_rand_state(rng, i) for i in range(W)]
    txt = _fmt([W], [V]) + "".join(_state_txt(s) for s in states)
    for a in range(V):
        txt += _fmt([1.0], n_ref[a], fixP[a], fixv[a], [fixN[a]])
        for i in range(W):
            txt += _fmt(per[a, i], vb[a, i], [Nb[a, i]])
    Rs = np.stack([s["R"] for s in states])
    ps = np.stack([s["p"] for s in states])
    f = _ba_factors_from_raw(per, vb, Nb, fixP, fixv, fixN, n_ref)
    return txt, f, Rs, ps


def test_lidar_factor_matches_reference(oracle_bin, tmp_path):
    """lidar_acc vs LidarFactor::acc_evaluate2 (factors.cpp:22-126)."""
    import jax.numpy as jnp

    from vina_slam_tpu.mapping.factors import lidar_acc, lidar_residual

    rng = np.random.default_rng(7)
    W, V = 4, 3
    txt, f, Rs, ps = _lidar_fixture(rng, W, V)
    out = _run_oracle(oracle_bin, "lidar", txt, tmp_path)
    res_ref = out[0]
    jac_ref = out[1:1 + 6 * W]
    hess_ref = out[1 + 6 * W:].reshape(6 * W, 6 * W)

    res, jac, hess = lidar_acc(f, jnp.asarray(Rs), jnp.asarray(ps), W)
    res2 = lidar_residual(f, jnp.asarray(Rs), jnp.asarray(ps))
    np.testing.assert_allclose(float(res), res_ref, rtol=5e-4)
    np.testing.assert_allclose(float(res2), res_ref, rtol=5e-4)
    scale = np.abs(jac_ref).max()
    np.testing.assert_allclose(np.asarray(jac), jac_ref,
                               rtol=3e-3, atol=3e-3 * scale)
    hscale = np.abs(hess_ref).max()
    np.testing.assert_allclose(np.asarray(hess), hess_ref,
                               rtol=3e-3, atol=3e-3 * hscale)


def test_normal_factor_matches_reference(oracle_bin, tmp_path):
    """normal_acc vs NormalFactor::acc_evaluate2 (factors.cpp:185-304)."""
    import jax.numpy as jnp

    from vina_slam_tpu.mapping.factors import normal_acc, normal_residual

    rng = np.random.default_rng(11)
    W, V = 4, 3
    txt, f, Rs, ps = _lidar_fixture(rng, W, V, )
    out = _run_oracle(oracle_bin, "normal", txt, tmp_path)
    res_ref = out[0]
    jac_ref = out[1:1 + 6 * W]
    hess_ref = out[1 + 6 * W:].reshape(6 * W, 6 * W)

    res, jac, hess = normal_acc(f, jnp.asarray(Rs), jnp.asarray(ps), W)
    res2 = normal_residual(f, jnp.asarray(Rs), jnp.asarray(ps))
    np.testing.assert_allclose(float(res), res_ref, rtol=2e-3, atol=1e-9)
    np.testing.assert_allclose(float(res2), res_ref, rtol=2e-3, atol=1e-9)
    scale = max(np.abs(jac_ref).max(), 1e-9)
    np.testing.assert_allclose(np.asarray(jac), jac_ref,
                               rtol=5e-3, atol=5e-3 * scale)
    hscale = max(np.abs(hess_ref).max(), 1e-9)
    np.testing.assert_allclose(np.asarray(hess), hess_ref,
                               rtol=5e-3, atol=5e-3 * hscale)


def test_preintegration_matches_reference(oracle_bin, tmp_path):
    """build_factor + evaluate vs IMU_PRE::push_imu + give_evaluate[_g]
    (imu_preintegration.cpp:31-237), including nonzero first-order bias
    corrections dbg/dba."""
    import jax.numpy as jnp

    from vina_slam_tpu.core.state import NavState
    from vina_slam_tpu.estimation import preintegration as pre

    rng = np.random.default_rng(3)
    n = 12
    t = np.cumsum(rng.uniform(0.004, 0.012, n))
    gyr = rng.normal(scale=0.4, size=(n, 3))
    acc = rng.normal(scale=0.5, size=(n, 3)) + [0, 0, 9.8]
    # quantize stamps to ns exactly like the oracle's sec/nanosec roundtrip
    t = np.round(t * 1e9) / 1e9
    nm = np.diag(rng.uniform(1e-4, 5e-4, 6))
    nw = np.diag(rng.uniform(1e-6, 5e-6, 6))
    scale_g = 1.0
    bg = rng.normal(scale=0.01, size=3)
    ba = rng.normal(scale=0.05, size=3)
    dbg = rng.normal(scale=0.002, size=3)
    dba = rng.normal(scale=0.01, size=3)
    s1 = _rand_state(rng, 0)
    s2 = _rand_state(rng, 1)

    txt = _fmt(nm, nw, [scale_g], bg, ba, [n])
    for i in range(n):
        txt += _fmt([t[i]], gyr[i], acc[i])
    txt += _fmt(dbg, dba) + _state_txt(s1) + _state_txt(s2)
    out = _run_oracle(oracle_bin, "preint", txt, tmp_path)
    D = 15
    k = 0
    res_ref = out[k]; k += 1
    gg_ref = out[k:k + 2 * D]; k += 2 * D
    jtj_ref = out[k:k + 4 * D * D].reshape(2 * D, 2 * D); k += 4 * D * D
    resg_ref = out[k]; k += 1
    ggg_ref = out[k:k + 2 * D + 3]; k += 2 * D + 3
    jtjg_ref = out[k:].reshape(2 * D + 3, 2 * D + 3)

    # my side: midpoint arrays from the raw samples (push_imu, cpp:36-49)
    gm = 0.5 * (gyr[:-1] + gyr[1:])
    am = 0.5 * (acc[:-1] + acc[1:])
    dt = t[1:] - t[:-1]
    valid = np.ones(n - 1, bool)
    f = pre.build_factor(jnp.asarray(gm), jnp.asarray(am), jnp.asarray(dt),
                         jnp.asarray(valid), jnp.asarray(bg), jnp.asarray(ba),
                         jnp.asarray(nm), jnp.asarray(nw),
                         jnp.asarray(scale_g))
    f = f._replace(dbg=jnp.asarray(dbg), dba=jnp.asarray(dba))

    def nav(s):
        return NavState(R=jnp.asarray(s["R"]), p=jnp.asarray(s["p"]),
                        v=jnp.asarray(s["v"]), bg=jnp.asarray(s["bg"]),
                        ba=jnp.asarray(s["ba"]), g=jnp.asarray(s["g"]),
                        t=jnp.asarray(s["t"]),
                        cov=jnp.zeros((15, 15), jnp.float64))

    # NB: the reference inverts cov fresh inside give_evaluate; my factor
    # caches cov_inv at build. The covariance recursion runs in f32 on my
    # side (documented choice) so allow a looser tolerance on the weighted
    # quantities but compare the residual geometry tightly.
    cost, joca, jocb, jocg, rr, cov_inv = pre.evaluate(f, nav(s1), nav(s2),
                                                       with_gravity=False)
    joc = np.concatenate([np.asarray(joca), np.asarray(jocb)], axis=1)
    jtj = joc.T @ np.asarray(cov_inv) @ joc
    gg = joc.T @ np.asarray(cov_inv) @ np.asarray(rr)
    np.testing.assert_allclose(float(cost), res_ref, rtol=2e-3)
    np.testing.assert_allclose(gg, gg_ref, rtol=2e-3,
                               atol=2e-3 * np.abs(gg_ref).max())
    np.testing.assert_allclose(jtj, jtj_ref, rtol=2e-3,
                               atol=2e-3 * np.abs(jtj_ref).max())

    costg, joca, jocb, jocg, rr, cov_inv = pre.evaluate(
        f, nav(s1), nav(s2), with_gravity=True)
    jocg_full = np.concatenate(
        [np.asarray(joca), np.asarray(jocb), np.asarray(jocg)], axis=1)
    jtjg = jocg_full.T @ np.asarray(cov_inv) @ jocg_full
    ggg = jocg_full.T @ np.asarray(cov_inv) @ np.asarray(rr)
    np.testing.assert_allclose(float(costg), resg_ref, rtol=2e-3)
    np.testing.assert_allclose(ggg, ggg_ref, rtol=2e-3,
                               atol=2e-3 * np.abs(ggg_ref).max())
    np.testing.assert_allclose(jtjg, jtjg_ref, rtol=2e-3,
                               atol=2e-3 * np.abs(jtjg_ref).max())


def test_iekf_iteration_matches_reference(oracle_bin, tmp_path):
    """iekf_iteration_math vs the VNC-IEKF solver equations transliterated
    from odometry.cpp:100-207 into csrc/oracle.cpp (run_iekf), evaluated on
    precomputed match results with the reference's own IMUST boxminus/
    boxplus (types.hpp:67-88): per-point point-to-plane accumulation, the
    VNC normal-consistency block, the DIM-state gain/solution, the state
    update, and the posterior covariance (I - G) P."""
    import jax.numpy as jnp

    from vina_slam_tpu.core.linalg import inv_psd
    from vina_slam_tpu.core.state import NavState, boxplus
    from vina_slam_tpu.pipeline.odometry import (ScanPlanes,
                                                 iekf_iteration_math)

    rng = np.random.default_rng(19)
    sp_prop = _rand_state(rng, 0)
    sp_curr = dict(sp_prop)
    # x_curr a small retraction away from x_prop, like a mid-update iterate
    from vina_slam_tpu.core import so3
    sp_curr["R"] = sp_prop["R"] @ np.asarray(so3.exp(rng.normal(scale=5e-3, size=3)))
    sp_curr["p"] = sp_prop["p"] + rng.normal(scale=5e-3, size=3)
    A = rng.normal(size=(15, 15))
    cov = A @ A.T / 15.0 + np.eye(15) * 0.05

    N, S = 48, 6
    pnt = rng.normal(scale=3.0, size=(N, 3))
    flag = (rng.random(N) < 0.75).astype(int)
    nrm = rng.normal(size=(N, 3))
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    wld_ref = pnt @ sp_curr["R"].T + sp_curr["p"]
    ctr = wld_ref + rng.normal(scale=0.02, size=(N, 3))
    sigma_d = rng.uniform(0.001, 0.05, N)

    n_body = rng.normal(size=(S, 3))
    n_body /= np.linalg.norm(n_body, axis=1, keepdims=True)
    quality = rng.uniform(0.5, 1.0, S)
    sigma_n = rng.uniform(0.01, 0.2, S)
    found = (rng.random(S) < 0.8).astype(int)
    # map normals near the world-frame scan normals so the 0.7 dot gate
    # passes for some and fails for others (exercise both branches)
    n_map = (n_body @ sp_curr["R"].T
             + rng.normal(scale=[[0.05]] * (S - 2) + [[2.0]] * 2, size=(S, 3)))
    n_map /= np.linalg.norm(n_map, axis=1, keepdims=True)

    txt = _state_txt(sp_prop) + _state_txt(sp_curr) + _fmt(cov) + _fmt([N])
    for i in range(N):
        txt += _fmt(pnt[i], [flag[i]], nrm[i], ctr[i], [sigma_d[i]])
    txt += _fmt([S])
    for i in range(S):
        txt += _fmt(n_body[i], [quality[i]], [sigma_n[i]], [found[i]],
                    n_map[i])
    out = _run_oracle(oracle_bin, "iekf", txt, tmp_path)
    k = 0
    match_ref = out[k]; k += 1
    sol_ref = out[k:k + 15]; k += 15
    nnt_ref = out[k:k + 9].reshape(3, 3); k += 9
    Rn_ref = out[k:k + 9].reshape(3, 3); k += 9
    pn_ref = out[k:k + 3]; k += 3
    vn_ref = out[k:k + 3]; k += 3
    cov_ref = out[k:k + 225].reshape(15, 15)

    def nav(s):
        return NavState(
            t=jnp.asarray(s["t"]), R=jnp.asarray(s["R"]),
            p=jnp.asarray(s["p"]), v=jnp.asarray(s["v"]),
            bg=jnp.asarray(s["bg"]), ba=jnp.asarray(s["ba"]),
            g=jnp.asarray(s["g"]), cov=jnp.asarray(cov))

    x_prop, x_c = nav(sp_prop), nav(sp_curr)
    f32 = jnp.float32
    pts32 = jnp.asarray(pnt, f32)
    wld = pts32 @ x_c.R.astype(f32).T + x_c.p.astype(f32)
    planes = ScanPlanes(
        center=jnp.zeros((S, 3), f32), normal=jnp.asarray(n_body, f32),
        quality=jnp.asarray(quality, f32), sigma_n=jnp.asarray(sigma_n, f32),
        valid=jnp.ones((S,), bool))
    sol, G6, nnt, match_num = iekf_iteration_math(
        x_prop, inv_psd(jnp.asarray(cov)), x_c, pts32, wld,
        jnp.asarray(flag, bool), jnp.asarray(nrm, f32), jnp.asarray(ctr, f32),
        jnp.asarray(sigma_d, f32), planes,
        jnp.asarray(found, bool), jnp.asarray(n_map, f32))

    assert int(match_num) == int(match_ref)
    np.testing.assert_allclose(np.asarray(nnt), nnt_ref, rtol=1e-5, atol=1e-5)
    sscale = max(np.abs(sol_ref).max(), 1e-9)
    np.testing.assert_allclose(np.asarray(sol), sol_ref,
                               rtol=1e-4, atol=1e-4 * sscale)
    x_n = boxplus(x_c, sol)
    np.testing.assert_allclose(np.asarray(x_n.R), Rn_ref, atol=2e-8)
    np.testing.assert_allclose(np.asarray(x_n.p), pn_ref, atol=2e-8)
    np.testing.assert_allclose(np.asarray(x_n.v), vn_ref, atol=2e-8)
    G = jnp.zeros((15, 15), jnp.float64).at[:, 0:6].set(G6)
    cov_post = np.asarray((jnp.eye(15) - G) @ x_c.cov)
    cscale = max(np.abs(cov_ref).max(), 1e-9)
    np.testing.assert_allclose(cov_post, cov_ref,
                               rtol=1e-4, atol=1e-4 * cscale)


def test_ekf_propagation_deskew_matches_reference(oracle_bin, tmp_path):
    """_propagate (associative-scan) + _deskew vs IMUEKF::motion_blur
    COMPILED FROM THE REFERENCE SOURCE (imu_ekf.cpp:13-148): terminal
    state, full DIM covariance propagation, and the backward per-point
    deskew through the pose table, on one real-shaped 0.1 s sweep."""
    import jax.numpy as jnp

    from vina_slam_tpu.estimation import ekf as ekf_mod
    from vina_slam_tpu.sensor.sync import ImuBlock
    from vina_slam_tpu.core import so3

    rng = np.random.default_rng(23)
    beg, end = 10.0, 10.1
    last_pcl_end = beg
    # ns-quantized IMU stamps straddling the sweep, like the stub roundtrip
    t_raw = beg - 0.004 + np.cumsum(rng.uniform(0.004, 0.0062, 22))
    t = np.round(t_raw * 1e9) / 1e9
    gyr = rng.normal(scale=0.5, size=(22, 3))
    acc = rng.normal(scale=0.6, size=(22, 3)) + [0, 0, 9.8]
    last = (t[0], gyr[0], acc[0])

    st = _rand_state(rng, 0)
    A = rng.normal(size=(15, 15))
    cov = A @ A.T * 1e-4 + np.eye(15) * 1e-5
    ext_R = np.asarray(so3.exp(rng.normal(scale=0.1, size=3)))
    ext_p = rng.normal(scale=0.05, size=3)
    cg, ca = np.full(3, 0.01), np.full(3, 0.04)
    cbg, cba = np.full(3, 1e-4), np.full(3, 2e-4)

    Np = 64
    pts = rng.uniform(-8, 8, size=(Np, 3)).astype(np.float32)
    rel = np.sort(rng.uniform(0.002, 0.098, Np)).astype(np.float32)

    txt = _fmt([1.0], cg, ca, cbg, cba, ext_R, ext_p,
               [beg], [end], [last_pcl_end])
    txt += _state_txt(st) + _fmt(cov)
    txt += _fmt([last[0]], last[1], last[2])
    txt += _fmt([len(t) - 1])
    for i in range(1, len(t)):
        txt += _fmt([t[i]], gyr[i], acc[i])
    txt += _fmt([Np])
    for i in range(Np):
        txt += _fmt(pts[i], [rel[i]])
    out = _run_oracle(oracle_bin, "ekf", txt, tmp_path)
    k = 0
    t_ref = out[k]; k += 1
    R_ref = out[k:k + 9].reshape(3, 3); k += 9
    p_ref = out[k:k + 3]; k += 3
    v_ref = out[k:k + 3]; k += 3
    cov_ref = out[k:k + 225].reshape(15, 15); k += 225
    pts_ref = out[k:].reshape(Np, 3)

    arrays, _, n = ekf_mod.build_intervals(
        last, last_pcl_end, beg, end, ImuBlock(t[1:], gyr[1:], acc[1:]))
    assert n >= 20
    R_e, p_e, v_e, cov_e, pose_table = ekf_mod._propagate(
        jnp.asarray(st["R"]), jnp.asarray(st["p"]), jnp.asarray(st["v"]),
        jnp.asarray(cov), jnp.asarray(st["bg"]), jnp.asarray(st["ba"]),
        jnp.asarray(st["g"]),
        jnp.asarray(arrays["avr_gyr"]), jnp.asarray(arrays["avr_acc"]),
        jnp.asarray(arrays["dt"]), jnp.asarray(arrays["offt"]),
        jnp.asarray(arrays["valid"]),
        jnp.asarray(cg), jnp.asarray(ca), jnp.asarray(cbg), jnp.asarray(cba),
        jnp.asarray(1.0), jnp.asarray(arrays["end_minus_last"]))

    np.testing.assert_allclose(np.asarray(R_e), R_ref, atol=1e-10)
    np.testing.assert_allclose(np.asarray(p_e), p_ref, atol=1e-9)
    np.testing.assert_allclose(np.asarray(v_e), v_ref, atol=1e-9)
    # covariance propagates in f32 (documented); compare at f32 fidelity
    cscale = max(np.abs(cov_ref).max(), 1e-12)
    np.testing.assert_allclose(np.asarray(cov_e), cov_ref,
                               rtol=2e-4, atol=2e-5 * cscale)

    deskewed = ekf_mod._deskew(
        jnp.asarray(pts), jnp.asarray(rel), jnp.ones(Np, bool), pose_table,
        jnp.asarray(arrays["offt"]), jnp.asarray(n), R_e, p_e,
        jnp.asarray(ext_R), jnp.asarray(ext_p))
    # per-point deskew math runs in f32 on ~10 m coordinates (~1e-5 m).
    # Index 0 is excluded: the reference's backward cursor breaks at
    # begin() but every EARLIER pose whose t is below the first point's
    # stamp re-enters the loop and compensates pcl_in[0] AGAIN on its
    # already-deskewed coordinates (imu_ekf.cpp:128-141) — a first-point
    # double-deskew we intentionally do not reproduce (documented
    # deviation, PARITY.md).
    np.testing.assert_allclose(np.asarray(deskewed)[1:], pts_ref[1:],
                               atol=5e-5)


def _lm_window_fixture(rng, W, V, imu_coef, nm, nw):
    """Production-like near-converged window + planar voxel clusters + IMU
    edges, as BOTH an oracle fixture text block (states/voxels/edges — the
    caller prepends the mode header) and the repo-side (factors, stacked
    preintegration edges, WindowPoses) triple."""
    import jax
    import jax.numpy as jnp

    from vina_slam_tpu.core import so3
    from vina_slam_tpu.estimation import preintegration as pre
    from vina_slam_tpu.mapping import ba

    # true window trajectory; entry states = true + small perturbation so
    # the LM runs in its production regime (small steps, mostly accepts)
    true_states = []
    for i in range(W):
        R = np.asarray(so3.exp(np.asarray([0.02, -0.01, 0.03]) * i
                               + rng.normal(scale=0.01, size=3)))
        p = np.asarray([0.4 * i, 0.05 * i, 1.0]) + rng.normal(scale=0.02, size=3)
        true_states.append((R, p))
    states = []
    for i, (R, p) in enumerate(true_states):
        s = _rand_state(rng, i)
        s["R"] = R @ np.asarray(so3.exp(rng.normal(scale=2e-3, size=3)))
        s["p"] = p + rng.normal(scale=5e-3, size=3)
        s["v"] = rng.normal(scale=0.2, size=3)
        states.append(s)

    # per-voxel world planes observed from every frame, back-projected to
    # body clusters with the TRUE poses
    per = np.zeros((V, W, 3, 3))
    vb = np.zeros((V, W, 3))
    Nb = np.zeros((V, W))
    fixP = np.zeros((V, 3, 3))
    fixv = np.zeros((V, 3))
    fixN = np.zeros(V)
    for a in range(V):
        nrm = rng.normal(size=3)
        nrm /= np.linalg.norm(nrm)
        base = rng.normal(scale=2.0, size=3) + [1.0, 0.0, 1.0]
        for i in range(W):
            n = int(rng.integers(8, 16))
            w = base + rng.normal(scale=0.6, size=(n, 3))
            w -= np.outer((w - base) @ nrm, nrm)  # exactly planar in world
            w += rng.normal(scale=0.01, size=w.shape)
            Rt, pt = true_states[i]
            b = (w - pt) @ Rt  # R^T (w - p)
            per[a, i] = b.T @ b
            vb[a, i] = b.sum(0)
            Nb[a, i] = n
        nfix = int(rng.integers(6, 12))
        wf = base + rng.normal(scale=0.6, size=(nfix, 3))
        wf -= np.outer((wf - base) @ nrm, nrm)
        fixP[a] = wf.T @ wf
        fixv[a] = wf.sum(0)
        fixN[a] = nfix

    # IMU edges: small motion consistent in scale with the window
    edges = []
    for e in range(W - 1):
        n = 12
        t0 = 0.1 * e
        t = t0 + np.cumsum(rng.uniform(0.006, 0.010, n))
        t = np.round(t * 1e9) / 1e9
        gyr = rng.normal(scale=0.2, size=(n, 3))
        acc = rng.normal(scale=0.3, size=(n, 3)) + [0, 0, 9.8]
        bg = rng.normal(scale=0.005, size=3)
        ba_ = rng.normal(scale=0.02, size=3)
        edges.append((t, gyr, acc, bg, ba_))

    txt = "".join(_state_txt(s) for s in states)
    for a in range(V):
        txt += _fmt([1.0], fixP[a], fixv[a], [fixN[a]])
        for i in range(W):
            txt += _fmt(per[a, i], vb[a, i], [Nb[a, i]])
    for (t, gyr, acc, bg, ba_) in edges:
        txt += _fmt(bg, ba_, [len(t)])
        for i in range(len(t)):
            txt += _fmt([t[i]], gyr[i], acc[i])

    f = _ba_factors_from_raw(per, vb, Nb, fixP, fixv, fixN,
                             np.zeros((V, 3)))
    pre_list = []
    for (t, gyr, acc, bg, ba_) in edges:
        gm = 0.5 * (gyr[:-1] + gyr[1:])
        am = 0.5 * (acc[:-1] + acc[1:])
        dt = t[1:] - t[:-1]
        pre_list.append(pre.build_factor(
            jnp.asarray(gm), jnp.asarray(am), jnp.asarray(dt),
            jnp.ones(len(dt), bool), jnp.asarray(bg), jnp.asarray(ba_),
            jnp.asarray(nm), jnp.asarray(nw), jnp.asarray(1.0)))
    pre_st = jax.tree_util.tree_map(lambda *a: jnp.stack(a), *pre_list)

    w0 = ba.WindowPoses(
        R=jnp.asarray(np.stack([s["R"] for s in states])),
        p=jnp.asarray(np.stack([s["p"] for s in states])),
        v=jnp.asarray(np.stack([s["v"] for s in states])),
        bg=jnp.asarray(np.stack([s["bg"] for s in states])),
        ba=jnp.asarray(np.stack([s["ba"] for s in states])),
        g=jnp.asarray(states[-1]["g"]))
    return txt, f, pre_st, w0


def test_lm_damping_iter_matches_reference(oracle_bin, tmp_path):
    """ba.damping_iter vs LI_BA_Optimizer::damping_iter COMPILED FROM THE
    REFERENCE SOURCE (optimizers.cpp:430-517): the full 10-iteration LM
    loop — gauge fixing, Nielsen trust region, bias-correction rollback,
    1e-6 relative-residual break — on a production-like near-converged
    window. Also pins the iteration/accept trajectory via the Clock-probe
    count (2 per Hessian eval + 2 per iteration, optimizers.cpp:454-484)."""
    import jax.numpy as jnp

    from vina_slam_tpu.mapping import ba

    rng = np.random.default_rng(31)
    W, V = 6, 4
    imu_coef = 1e-4
    nm = np.diag(rng.uniform(1e-4, 5e-4, 6))
    nw = np.diag(rng.uniform(1e-6, 5e-6, 6))
    core, f, pre_st, w0 = _lm_window_fixture(rng, W, V, imu_coef, nm, nw)
    txt = _fmt(nm, nw, [1.0], [imu_coef], [W], [V]) + core

    out = _run_oracle(oracle_bin, "lm", txt, tmp_path)
    k = 0
    res0_ref = out[k]; k += 1
    ref = {}
    for key, d in (("R", 9), ("p", 3), ("v", 3), ("bg", 3), ("ba", 3)):
        ref[key] = np.zeros((W, d))
    for i in range(W):
        for key, d in (("R", 9), ("p", 3), ("v", 3), ("bg", 3), ("ba", 3)):
            ref[key][i] = out[k:k + d]; k += d
    dbg_ref = np.zeros((W - 1, 3))
    dba_ref = np.zeros((W - 1, 3))
    for e in range(W - 1):
        dbg_ref[e] = out[k:k + 3]; k += 3
        dba_ref[e] = out[k:k + 3]; k += 3
    hess_ref = out[k:k + (15 * W) ** 2].reshape(15 * W, 15 * W)
    k += (15 * W) ** 2
    clock_calls = int(out[k])

    lm = ba.damping_iter(w0, f, pre_st, jnp.asarray(imu_coef), W,
                         max_iter=10, use_normal=False)

    # iteration-trajectory pin: clock calls = 2*H + 2*I; ours exposes I
    iters = int(lm.iters)
    print(f"lm oracle: ref clock_calls={clock_calls} "
          f"(=2H+2I), ours iters={iters}")
    lo, hi = 2 * (1 + 1), 4 * 10  # 1 hess + 1 iter .. all-accept 10 iters
    assert lo <= clock_calls <= hi
    # I_ref bounds: H in [1, I] -> I in [C/4, C/2 - 1]
    i_lo, i_hi = clock_calls / 4.0, clock_calls / 2.0 - 1.0
    assert i_lo - 1 <= iters <= i_hi + 3, (
        f"iteration count mismatch: ours {iters}, "
        f"ref in [{i_lo:.1f}, {i_hi:.1f}] from {clock_calls} probes")

    # final window states: f32 factor noise bounds the match scale
    np.testing.assert_allclose(np.asarray(lm.poses.R).reshape(W, 9),
                               ref["R"], atol=2e-4)
    np.testing.assert_allclose(np.asarray(lm.poses.p), ref["p"], atol=2e-4)
    np.testing.assert_allclose(np.asarray(lm.poses.v), ref["v"], atol=2e-3)
    np.testing.assert_allclose(np.asarray(lm.poses.bg), ref["bg"], atol=2e-3)
    np.testing.assert_allclose(np.asarray(lm.poses.ba), ref["ba"], atol=5e-3)
    np.testing.assert_allclose(np.asarray(lm.pre_f.dbg), dbg_ref, atol=2e-3)
    np.testing.assert_allclose(np.asarray(lm.pre_f.dba), dba_ref, atol=5e-3)
    hd = np.abs(np.asarray(lm.hess) - hess_ref).max() / max(
        np.abs(hess_ref).max(), 1e-9)
    print(f"lm oracle: hess rel diff {hd:.2e} (informational; the ref "
          f"returns the hessian from the LAST is_calc_hess entry, ours "
          f"from the last ACCEPT)")


def test_lm_gravity_damping_iter_matches_reference(oracle_bin, tmp_path):
    """ba.damping_iter(with_gravity=True) vs
    LI_BA_OptimizerGravity::damping_iter COMPILED FROM THE REFERENCE SOURCE
    (optimizers.cpp:746-826): the motion_init gravity-refining LM — shared
    3-dim gravity column, 6-DoF gauge (cpp:772-775), give_evaluate_g edges
    — at the init call's max_iter=3 (initialization.cpp:257-260)."""
    import jax.numpy as jnp

    from vina_slam_tpu.mapping import ba

    rng = np.random.default_rng(41)
    W, V = 6, 4
    imu_coef = 1e-4
    max_iter = 3
    nm = np.diag(rng.uniform(1e-4, 5e-4, 6))
    nw = np.diag(rng.uniform(1e-6, 5e-6, 6))
    core, f, pre_st, w0 = _lm_window_fixture(rng, W, V, imu_coef, nm, nw)
    txt = _fmt(nm, nw, [1.0], [imu_coef], [max_iter], [W], [V]) + core

    out = _run_oracle(oracle_bin, "lmg", txt, tmp_path)
    k = 0
    res0_ref = out[k]; k += 1
    ref = {}
    for key, d in (("R", 9), ("p", 3), ("v", 3), ("bg", 3), ("ba", 3),
                   ("g", 3)):
        ref[key] = np.zeros((W, d))
    for i in range(W):
        for key, d in (("R", 9), ("p", 3), ("v", 3), ("bg", 3), ("ba", 3),
                       ("g", 3)):
            ref[key][i] = out[k:k + d]; k += d
    dbg_ref = np.zeros((W - 1, 3))
    dba_ref = np.zeros((W - 1, 3))
    for e in range(W - 1):
        dbg_ref[e] = out[k:k + 3]; k += 3
        dba_ref[e] = out[k:k + 3]; k += 3
    res_last_ref = out[k]

    lm = ba.damping_iter(w0, f, pre_st, jnp.asarray(imu_coef), W,
                         max_iter=max_iter, with_gravity=True)

    # residuals: f32 factor noise scale
    np.testing.assert_allclose(float(lm.residual0), res0_ref, rtol=5e-4)
    np.testing.assert_allclose(float(lm.residual1), res_last_ref, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(lm.poses.R).reshape(W, 9),
                               ref["R"], atol=5e-4)
    np.testing.assert_allclose(np.asarray(lm.poses.p), ref["p"], atol=5e-4)
    np.testing.assert_allclose(np.asarray(lm.poses.v), ref["v"], atol=2e-3)
    np.testing.assert_allclose(np.asarray(lm.poses.bg), ref["bg"], atol=2e-3)
    np.testing.assert_allclose(np.asarray(lm.poses.ba), ref["ba"], atol=5e-3)
    # shared gravity column: all frames carry the same refined g
    np.testing.assert_allclose(ref["g"], np.broadcast_to(ref["g"][0], (W, 3)))
    np.testing.assert_allclose(np.asarray(lm.poses.g), ref["g"][0], atol=2e-3)
    np.testing.assert_allclose(np.asarray(lm.pre_f.dbg), dbg_ref, atol=2e-3)
    np.testing.assert_allclose(np.asarray(lm.pre_f.dba), dba_ref, atol=5e-3)


# ------------------------------------------------------------------ map
# Cross-check the WHOLE voxel map against the reference octree: csrc/oracle's
# `map` mode links the unmodified src/mapping/octree.cpp + voxel_map.cpp and
# drives the runner's per-scan sequence (cut_voxel -> recut each scan, one
# margi which refreshes eigens and calls plane_update, octree.cpp:415-450),
# then the odometry-path match() (voxel_map.cpp:287-312). The same frames
# drive vina_slam_tpu's flat-hash recompute-based map; per-query match
# verdicts, plane centers/normals, and sigma_d (which embeds the 6x6
# plane_var through the J_nq quadform) must agree.

def _map_world(rng, n_floor=800, n_wall=300, n_slant=400, noise=0.01):
    """World points on three patches inside a few 1 m voxels: a floor
    (planar roots), a wall crossing the floor voxel at x in [1,2) (corner
    -> that root must SUBDIVIDE), and a slanted plane (non-axis normal)."""
    pts = []
    f = np.stack([rng.uniform(0.05, 1.95, n_floor),
                  rng.uniform(0.05, 1.95, n_floor),
                  np.full(n_floor, 0.30)], 1)
    w = np.stack([np.full(n_wall, 1.50),
                  rng.uniform(0.05, 0.95, n_wall),
                  rng.uniform(0.05, 0.95, n_wall)], 1)
    sx = rng.uniform(0.05, 0.95, n_slant)
    sy = rng.uniform(1.05, 1.95, n_slant)
    sz = 0.55 - 0.5 * (sx - 0.5)
    s = np.stack([sx, sy, sz], 1)
    pts = np.concatenate([f, w, s])
    pts += rng.normal(scale=noise, size=pts.shape)
    return pts


def test_voxel_map_matches_reference(oracle_bin, tmp_path):
    import jax.numpy as jnp

    from vina_slam_tpu.core import so3
    from vina_slam_tpu.mapping import voxel_map as vm

    rng = np.random.default_rng(11)
    W = 4
    world = [_map_world(rng) for _ in range(W)]
    Np = world[0].shape[0]
    # fixed small-motion poses; body = R^T (world - p) so both sides
    # reconstruct the same world coordinates
    Rs = np.stack([np.asarray(so3.exp(np.asarray([0.02, -0.015, 0.03]) * i))
                   for i in range(W)])
    ps = np.stack([np.asarray([0.01, -0.02, 0.005]) * i for i in range(W)])
    var_w = np.tile(np.eye(3) * 1e-4, (Np, 1, 1))

    # queries: exactly on each patch (robust matches) + far off-plane
    qf = np.stack([rng.uniform(0.2, 1.8, 50), rng.uniform(0.2, 1.8, 50),
                   np.full(50, 0.30)], 1)
    qw = np.stack([np.full(20, 1.50), rng.uniform(0.2, 0.8, 20),
                   rng.uniform(0.2, 0.8, 20)], 1)
    qx = rng.uniform(0.2, 0.8, 20)
    qs = np.stack([qx, rng.uniform(1.2, 1.8, 20), 0.55 - 0.5 * (qx - 0.5)], 1)
    qo = np.stack([rng.uniform(0.2, 0.8, 20), rng.uniform(0.2, 0.8, 20),
                   np.full(20, 0.80)], 1)
    Q = np.concatenate([qf, qw, qs, qo])
    qvar = np.tile(np.eye(3) * 1e-4, (len(Q), 1, 1))

    # ---- oracle fixture
    min_point = [5.0, 5.0, 5.0, 5.0]
    thre = [0.25, 0.25, 0.25, 0.25]
    txt = _fmt([1.0, 2, 0.01, 100, 5], min_point, thre, [W, W, 1, 1])
    for i in range(W):
        txt += _fmt(Rs[i], ps[i])
    for i in range(W):
        body = (world[i] - ps[i]) @ Rs[i]  # R^T (w - p)
        txt += _fmt([Np])
        for k in range(Np):
            txt += _fmt(body[k], var_w[k])
    txt += _fmt([len(Q)])
    for k in range(len(Q)):
        txt += _fmt(Q[k], qvar[k])
    out = _run_oracle(oracle_bin, "map", txt, tmp_path)

    k = 1  # out[0] = root count
    M = len(Q)
    ref = dict(flag=np.zeros(M), sigma=np.zeros(M), center=np.zeros((M, 3)),
               normal=np.zeros((M, 3)), radius=np.zeros(M),
               eig=np.zeros((M, 3)), N=np.zeros(M), pvar=np.zeros((M, 36)))
    for q in range(M):
        ref["flag"][q] = out[k]; k += 1
        ref["sigma"][q] = out[k]; k += 1
        ref["center"][q] = out[k:k + 3]; k += 3
        ref["normal"][q] = out[k:k + 3]; k += 3
        ref["radius"][q] = out[k]; k += 1
        ref["eig"][q] = out[k:k + 3]; k += 3
        ref["N"][q] = out[k]; k += 1
        ref["pvar"][q] = out[k:k + 36]; k += 36

    # ---- our side: same frames through the flat-hash map
    ms = vm.MapStatic(capacity=1 << 12, levels=3, probe=16, max_new=4096,
                      pool_capacity=1 << 14, active_cap=1 << 12,
                      refind_cap=1 << 12, pool_move_cap=1 << 12)
    par = vm.MapParams(
        voxel_size=jnp.asarray(1.0, jnp.float32),
        min_eigen_value=jnp.asarray(0.01, jnp.float32),
        plane_thre=jnp.asarray(thre, jnp.float32),
        min_point=jnp.asarray(min_point, jnp.float32),
        max_points=jnp.asarray(100.0, jnp.float32))
    m = vm.make_map(ms)
    pool = vm.make_pool(ms)
    jour = jnp.asarray(0.0, jnp.float32)
    win_w = np.zeros((W, Np, 3), np.float32)
    win_valid = np.zeros((W, Np), bool)
    win_var = np.tile(np.asarray(var_w, np.float32)[None], (W, 1, 1, 1))
    slots = None
    for i in range(W):
        win_w[i] = world[i]
        win_valid[i] = True
        new_mask = np.zeros((W, Np), bool)
        new_mask[i] = True
        m, pool, slots, _ = vm.recut(
            m, pool, jnp.asarray(win_w), jnp.asarray(win_valid), par, ms, W,
            jour, win_var=jnp.asarray(win_var), new_mask=jnp.asarray(new_mask))
    m, pool = vm.margi(m, pool, slots, jnp.asarray(win_w),
                       jnp.asarray(win_var), jnp.asarray(win_valid), par, ms,
                       jour, mgsize=1)
    ok, n, c, sig = vm.match_points(m, jnp.asarray(Q, jnp.float32),
                                    jnp.asarray(qvar, jnp.float32), par, ms)
    ok = np.asarray(ok); n = np.asarray(n); c = np.asarray(c)
    sig = np.asarray(sig)

    # verdicts agree (queries sit far from every gate boundary)
    agree = (ok == (ref["flag"] > 0.5))
    assert agree.mean() >= 0.97, (
        f"match verdicts disagree on {np.where(~agree)[0]}")
    # queries near patch-intersection lines legitimately land in
    # non-planar subdivided leaves (floor x wall, floor x slant) — BOTH
    # sides reject them identically; ~60/90 on-plane queries match
    both = ok & (ref["flag"] > 0.5) & agree
    assert both.sum() >= 50
    # off-plane queries never match on either side
    assert not ok[-20:].any() and not (ref["flag"][-20:] > 0.5).any()

    # matched plane geometry agrees (f32 map vs f64 reference)
    np.testing.assert_allclose(c[both], ref["center"][both], atol=2e-3)
    dots = np.abs(np.sum(n[both] * ref["normal"][both], axis=1))
    assert (dots > 1 - 5e-5).all(), f"normal mismatch: min dot {dots.min()}"
    np.testing.assert_allclose(sig[both], ref["sigma"][both], rtol=0.05,
                               atol=1e-7)


def test_scan_plane_extraction_matches_reference(oracle_bin, tmp_path):
    """VNC scan-voxel planes: the reference generate_voxel + fitScanPlane +
    collectScanPlanes chain (voxel_map.cpp:169-200, octree.cpp:628-684,
    odometry.cpp:22-60, compiled/transliterated in csrc/oracle 'scanplane')
    vs extract_scan_planes (pipeline/odometry.py) on the same scan."""
    import jax.numpy as jnp

    from vina_slam_tpu.pipeline import odometry as odom

    rng = np.random.default_rng(13)
    pts = _map_world(rng, n_floor=700, n_wall=250, n_slant=350)

    thre = [0.25, 0.25, 0.25, 0.25]
    txt = _fmt([1.0, 2, 0.01], thre, [len(pts)])
    for p in pts:
        txt += _fmt(p)
    out = _run_oracle(oracle_bin, "scanplane", txt, tmp_path)
    n_ref = int(out[0])
    ref = out[1:1 + 8 * n_ref].reshape(n_ref, 8)

    sp = odom.extract_scan_planes(
        jnp.asarray(pts, jnp.float32), jnp.ones(len(pts), bool),
        jnp.asarray(1.0, jnp.float32), jnp.asarray(0.01, jnp.float32),
        tuple(thre), levels=3)
    v = np.asarray(sp.valid)
    ours_c = np.asarray(sp.center)[v]
    ours_n = np.asarray(sp.normal)[v]
    ours_q = np.asarray(sp.quality)[v]
    ours_s = np.asarray(sp.sigma_n)[v]

    # same plane count (f32 vs f64 may flip a gate-boundary voxel)
    assert abs(len(ours_c) - n_ref) <= 1, (len(ours_c), n_ref)

    # every reference plane has our plane at the same center
    matched = 0
    for r in ref:
        d = np.linalg.norm(ours_c - r[:3], axis=1)
        i = int(np.argmin(d))
        if d[i] > 5e-3:
            continue
        matched += 1
        assert abs(ours_n[i] @ r[3:6]) > 1 - 1e-4
        np.testing.assert_allclose(ours_q[i], r[6], rtol=2e-3)
        np.testing.assert_allclose(ours_s[i], r[7], rtol=5e-2, atol=1e-5)
    assert matched >= n_ref - 1, f"only {matched}/{n_ref} planes matched"
