"""Second synthetic world family: curved + dynamic geometry.

The primary raycaster (sensor/synth.py) builds worlds exclusively from
finite plane patches — the exact primitive the pipeline's plane-fitting map
is optimized for — so every accuracy number it produces shares one
structural bias (everything the sensor sees IS a plane). This module
provides a structurally different scene family for de-correlated accuracy
evidence:

  * vertical cylinders (analytic ray-quadric; only locally planar — plane
    fits see curvature residuals that grow with voxel size),
  * spheres, including fields of small clutter spheres (vegetation-like
    returns that should be REJECTED by the planarity gates, the regime the
    reference's eigenvalue ratio test exists for, octree.cpp:302-333),
  * a rigid moving box (dynamic outliers violating the static-world
    assumption: its returns are internally consistent planes that move
    between — and within — sweeps),
  * outward-facing buildings + ground (reusing synth.PlanePatch).

A Scene casts with the ABSOLUTE firing time of each lidar column
(synth.simulate_scan calls scene.cast(origins, dirs, t, max_range)), so
dynamic geometry moves within a single sweep exactly like a real scene.
Everything is pure NumPy on the host — generation only, never in the jit
path.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Sequence

import numpy as np

from vina_slam_tpu.sensor.synth import (
    PlanePatch, Trajectory, box_room, raycast, simulate_sequence,
)

__all__ = [
    "Cylinder", "Sphere", "MovingBox", "Scene",
    "box_outside", "yard_world", "simulate_yard_sequence",
]


@dataclass
class Cylinder:
    """Vertical (z-axis) cylinder shell between z0 and z1."""
    cx: float
    cy: float
    r: float
    z0: float
    z1: float

    def cast(self, origins: np.ndarray, dirs: np.ndarray,
             max_range: float) -> np.ndarray:
        # |o_xy + t d_xy - c|^2 = r^2  ->  a t^2 + 2 b t + c0 = 0
        ox = origins[:, 0] - self.cx
        oy = origins[:, 1] - self.cy
        dx, dy = dirs[:, 0], dirs[:, 1]
        a = dx * dx + dy * dy
        b = ox * dx + oy * dy
        c0 = ox * ox + oy * oy - self.r * self.r
        disc = b * b - a * c0
        with np.errstate(divide="ignore", invalid="ignore"):
            sq = np.sqrt(np.maximum(disc, 0.0))
            t1 = (-b - sq) / a          # near root (outside hit)
            t2 = (-b + sq) / a          # far root (inside hit)
            tt = np.where(t1 > 0.05, t1, t2)
            z = origins[:, 2] + tt * dirs[:, 2]
            ok = ((disc > 0) & (a > 1e-12) & (tt > 0.05) & (tt < max_range)
                  & (z >= self.z0) & (z <= self.z1) & np.isfinite(tt))
        return np.where(ok, tt, np.inf)


@dataclass
class Sphere:
    c: np.ndarray
    r: float

    def cast(self, origins: np.ndarray, dirs: np.ndarray,
             max_range: float) -> np.ndarray:
        oc = origins - np.asarray(self.c)[None, :]
        b = np.einsum("nd,nd->n", oc, dirs)
        c0 = np.einsum("nd,nd->n", oc, oc) - self.r * self.r
        disc = b * b - c0
        with np.errstate(invalid="ignore"):
            sq = np.sqrt(np.maximum(disc, 0.0))
            t1 = -b - sq
            t2 = -b + sq
            tt = np.where(t1 > 0.05, t1, t2)
            ok = (disc > 0) & (tt > 0.05) & (tt < max_range) & np.isfinite(tt)
        return np.where(ok, tt, np.inf)


class SphereField:
    """Many small spheres cast as one vectorized batch (clutter)."""

    def __init__(self, centers: np.ndarray, radii: np.ndarray):
        self.centers = np.asarray(centers, np.float64)     # (M, 3)
        self.radii = np.asarray(radii, np.float64)         # (M,)

    def cast(self, origins: np.ndarray, dirs: np.ndarray,
             max_range: float) -> np.ndarray:
        oc = origins[:, None, :] - self.centers[None, :, :]       # (N, M, 3)
        b = np.einsum("nmd,nd->nm", oc, dirs)
        c0 = np.einsum("nmd,nmd->nm", oc, oc) - self.radii[None, :] ** 2
        disc = b * b - c0
        with np.errstate(invalid="ignore"):
            sq = np.sqrt(np.maximum(disc, 0.0))
            t1 = -b - sq
            ok = (disc > 0) & (t1 > 0.05) & (t1 < max_range)
        tt = np.where(ok, t1, np.inf)
        return tt.min(axis=1)


class MovingBox:
    """Rigid box translating at constant velocity: dynamic-outlier source.

    Its six faces are internally-consistent planes, so the pipeline sees
    geometrically plausible surfaces that are simply NOT where they were a
    frame (or a column) ago — the hard kind of dynamic object."""

    def __init__(self, center0, size, velocity, t0: float = 0.0):
        self.center0 = np.asarray(center0, np.float64)
        self.size = np.asarray(size, np.float64)
        self.velocity = np.asarray(velocity, np.float64)
        self.t0 = t0

    def center(self, t: float) -> np.ndarray:
        return self.center0 + self.velocity * (t - self.t0)

    def patches(self, t: float) -> List[PlanePatch]:
        return box_room(self.center(t), self.size)

    def cast(self, origins: np.ndarray, dirs: np.ndarray, t: float,
             max_range: float) -> np.ndarray:
        return raycast(origins, dirs, self.patches(t), max_range)


class Scene:
    """Static patches + quadric primitives + movers, cast at a firing time."""

    def __init__(self, patches: Sequence[PlanePatch] = (),
                 quadrics: Sequence = (), movers: Sequence[MovingBox] = ()):
        self.patches = list(patches)
        self.quadrics = list(quadrics)
        self.movers = list(movers)

    def cast(self, origins: np.ndarray, dirs: np.ndarray, t: float,
             max_range: float = 80.0) -> np.ndarray:
        best = raycast(origins, dirs, self.patches, max_range)
        for q in self.quadrics:
            best = np.minimum(best, q.cast(origins, dirs, max_range))
        for mv in self.movers:
            best = np.minimum(best, mv.cast(origins, dirs, t, max_range))
        return best


def box_outside(center, size) -> List[PlanePatch]:
    """Outward-facing box (a building seen from outside). synth.raycast is
    two-sided, so this is box_room with flipped normals for documentation
    value — the patch set is what matters."""
    out = box_room(center, size)
    return [PlanePatch(q=p.q, n=-p.n, u=p.u, v=p.v, hu=p.hu, hv=p.hv)
            for p in out]


def yard_world(seed: int = 0, clutter: int = 150,
               mover: bool = False) -> Scene:
    """An outdoor yard ~30 m across: ground plane, three buildings,
    cylindrical tanks/pillars, a field of small clutter spheres, and
    (optionally) a box driving through at 1.5 m/s."""
    rng = np.random.default_rng(seed)
    ex, ey, ez = np.eye(3)
    patches = [
        # ground
        PlanePatch(q=np.zeros(3), n=ez.copy(), u=ex.copy(), v=ey.copy(),
                   hu=30.0, hv=30.0),
    ]
    patches += box_outside([10.0, 6.0, 2.5], [6.0, 8.0, 5.0])
    patches += box_outside([-9.0, -5.0, 2.0], [8.0, 5.0, 4.0])
    patches += box_outside([-4.0, 9.0, 1.5], [5.0, 4.0, 3.0])
    # shipping containers near the start area: close-range x/y-normal
    # diversity so the init normal-spread gate (eigvalue[0] >= 15,
    # initialization.cpp:285) sees more than ground + distant walls
    patches += box_outside([5.5, -1.5, 1.25], [2.4, 6.0, 2.5])
    patches += box_outside([-5.0, 4.5, 1.25], [6.0, 2.4, 2.5])
    c, s = np.cos(0.6), np.sin(0.6)
    Rz = np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])
    patches += [
        PlanePatch(q=Rz @ (p.q - np.array([0, -6.5, 0])) + np.array([0, -6.5, 0]),
                   n=Rz @ p.n, u=Rz @ p.u, v=Rz @ p.v, hu=p.hu, hv=p.hv)
        for p in box_outside([0.0, -6.5, 1.1], [2.2, 5.0, 2.2])
    ]
    quadrics = [
        Cylinder(6.0, -6.0, 1.2, 0.0, 4.0),
        Cylinder(3.5, -8.5, 0.8, 0.0, 3.0),
        Cylinder(-2.0, -9.0, 1.5, 0.0, 5.0),
        Cylinder(12.0, -2.0, 0.4, 0.0, 3.5),
        Cylinder(-12.0, 3.0, 0.6, 0.0, 4.0),
        Sphere(np.array([0.0, -4.0, 1.0]), 1.0),
    ]
    if clutter > 0:
        centers = np.stack([
            rng.uniform(-14.0, 14.0, clutter),
            rng.uniform(-12.0, 12.0, clutter),
            rng.uniform(0.1, 2.2, clutter),
        ], axis=1)
        # keep clutter off the sensor path (|p| < 4 m stays clear)
        keep = np.linalg.norm(centers[:, :2], axis=1) > 4.0
        quadrics.append(SphereField(centers[keep],
                                    rng.uniform(0.04, 0.15, keep.sum())))
    movers = []
    if mover:
        # crosses the yard south-to-north through the x≈2.8 lane (clear of
        # the containers), passing within ~3 m of the trajectory origin
        movers.append(MovingBox(center0=[2.8, -11.0, 0.75],
                                size=[2.0, 1.2, 1.5],
                                velocity=[0.0, 3.0, 0.0]))
    return Scene(patches, quadrics, movers)


def simulate_yard_sequence(duration: float = 4.0, n_az: int = 240,
                           n_el: int = 16, noise: float = 0.005,
                           seed: int = 7, mover: bool = False,
                           clutter: int = 150, **kw):
    """frames + ground truth on the yard world with an outdoor-scale sweep
    trajectory (≈ 12 m excursion) — the de-correlated counterpart of
    synth.simulate_sequence's indoor room."""
    scene = yard_world(seed=seed, clutter=clutter, mover=mover)
    traj = Trajectory(amp=(5.0, 3.5, 0.25), freq=(0.11, 0.15, 0.3),
                      yaw_rate=0.35)
    return simulate_sequence(
        duration=duration, traj=traj, patches=scene, n_az=n_az, n_el=n_el,
        noise=noise, imu_noise_gyr=1e-3, imu_noise_acc=1e-3, seed=seed,
        el_range=(-0.45, 0.15), **kw)
