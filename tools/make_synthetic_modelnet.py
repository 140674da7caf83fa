#!/usr/bin/env python
"""Generate a synthetic ModelNet40-format dataset (HDF5).

This machine has no network egress, so the real modelnet40_ply_hdf5_2048
archive cannot be downloaded. This tool procedurally generates a
format-identical stand-in — 40 parametric shape categories, 2048
surface points + analytic normals per cloud, unit-sphere normalized,
written as ply_data_{train,test}N.h5 with shape_names.txt /
{train,test}_files.txt — so the ENTIRE real pipeline (ModelNetHdf
loader, RPMNet crop transforms, train.py, test.py, the RPMNet metric
protocol; reference data_loaders/modelnet.py:124-231) runs unchanged.

Category split mirrors the reference's unseen-category protocol
(conf/modelnet.yaml: train on half1, test on half2): categories 0-19
train/val, 20-39 test.

Every cloud gets 2-4 random surface bumps: pure quadrics (spheres,
cylinders, tori) have continuous rotational symmetry, which makes the
GT registration pose ill-defined — bumps break the symmetry so RRE/RTE
against GT is meaningful.

Usage: python tools/make_synthetic_modelnet.py [--root datasets/modelnet40_synth]
         [--train-per-cat 96] [--test-per-cat 32] [--seed 0]
"""
from __future__ import annotations

import argparse
import os

import numpy as np

# ---------------------------------------------------------------------------
# primitive surface samplers: each returns (points (n,3), normals (n,3))
# ---------------------------------------------------------------------------


def _unit(v, axis=-1):
    return v / np.maximum(np.linalg.norm(v, axis=axis, keepdims=True), 1e-12)


def sample_box(rng, n, lx=1.0, ly=1.0, lz=1.0):
    half = np.array([lx, ly, lz]) / 2
    areas = np.array([ly * lz, ly * lz, lx * lz, lx * lz, lx * ly, lx * ly])
    face = rng.choice(6, n, p=areas / areas.sum())
    u = rng.uniform(-1, 1, (n, 2))
    pts = np.empty((n, 3))
    nrm = np.zeros((n, 3))
    axis = face // 2                  # 0:x, 1:y, 2:z
    sign = np.where(face % 2 == 0, 1.0, -1.0)
    for a in range(3):
        m = axis == a
        others = [i for i in range(3) if i != a]
        pts[m, a] = sign[m] * half[a]
        pts[np.ix_(m, others)] = u[m] * half[others]
        nrm[m, a] = sign[m]
    return pts, nrm


def sample_cylinder(rng, n, r=0.5, h=1.0, caps=True):
    a_side = 2 * np.pi * r * h
    a_cap = np.pi * r * r if caps else 0.0
    areas = np.array([a_side, a_cap, a_cap])
    part = rng.choice(3, n, p=areas / areas.sum())
    theta = rng.uniform(0, 2 * np.pi, n)
    pts = np.empty((n, 3))
    nrm = np.zeros((n, 3))
    m = part == 0
    pts[m] = np.stack([r * np.cos(theta[m]), r * np.sin(theta[m]),
                       rng.uniform(-h / 2, h / 2, m.sum())], 1)
    nrm[m] = np.stack([np.cos(theta[m]), np.sin(theta[m]),
                       np.zeros(m.sum())], 1)
    for p, z, nz in ((1, h / 2, 1.0), (2, -h / 2, -1.0)):
        m = part == p
        rad = r * np.sqrt(rng.uniform(0, 1, m.sum()))
        pts[m] = np.stack([rad * np.cos(theta[m]), rad * np.sin(theta[m]),
                           np.full(m.sum(), z)], 1)
        nrm[m, 2] = nz
    return pts, nrm


def sample_cone(rng, n, r=0.5, h=1.0):
    slant = np.sqrt(r * r + h * h)
    a_side = np.pi * r * slant
    a_base = np.pi * r * r
    side = rng.uniform(0, 1, n) < a_side / (a_side + a_base)
    theta = rng.uniform(0, 2 * np.pi, n)
    pts = np.empty((n, 3))
    nrm = np.empty((n, 3))
    t = np.sqrt(rng.uniform(0, 1, n))     # area-uniform along slant
    m = side
    rad = r * t[m]
    pts[m] = np.stack([rad * np.cos(theta[m]), rad * np.sin(theta[m]),
                       h / 2 - h * t[m]], 1)
    nrm[m] = _unit(np.stack([h * np.cos(theta[m]), h * np.sin(theta[m]),
                             np.full(m.sum(), r)], 1))
    m = ~side
    rad = r * np.sqrt(rng.uniform(0, 1, m.sum()))
    pts[m] = np.stack([rad * np.cos(theta[m]), rad * np.sin(theta[m]),
                       np.full(m.sum(), -h / 2)], 1)
    nrm[m] = np.tile([0.0, 0.0, -1.0], (m.sum(), 1))
    return pts, nrm


def sample_ellipsoid(rng, n, a=0.5, b=0.5, c=0.5):
    # rejection for area uniformity
    pts, nrm = [], []
    need = n
    while need > 0:
        v = _unit(rng.normal(size=(2 * need + 16, 3)))
        p = v * [a, b, c]
        g = p / np.array([a * a, b * b, c * c])          # gradient
        dens = np.linalg.norm(g, axis=1)                 # dA ∝ |grad|
        keep = rng.uniform(0, dens.max(), len(p)) < dens
        p, gk = p[keep][:need], g[keep][:need]
        pts.append(p)
        nrm.append(_unit(gk))
        need -= len(p)
    return np.concatenate(pts), np.concatenate(nrm)


def sample_torus(rng, n, R=0.5, r=0.2):
    # area element ∝ (R + r cos φ): rejection on φ
    phi = rng.uniform(0, 2 * np.pi, 3 * n + 16)
    keep = rng.uniform(0, R + r, len(phi)) < (R + r * np.cos(phi))
    phi = phi[keep][:n]
    while len(phi) < n:
        extra = rng.uniform(0, 2 * np.pi, n)
        k = rng.uniform(0, R + r, n) < (R + r * np.cos(extra))
        phi = np.concatenate([phi, extra[k]])[:n]
    theta = rng.uniform(0, 2 * np.pi, n)
    cx = np.stack([R * np.cos(theta), R * np.sin(theta), np.zeros(n)], 1)
    nrm = np.stack([np.cos(phi) * np.cos(theta), np.cos(phi) * np.sin(theta),
                    np.sin(phi)], 1)
    return cx + r * nrm, nrm


# ---------------------------------------------------------------------------
# composition
# ---------------------------------------------------------------------------


def _rot_z(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])


def _rot_x(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[1.0, 0, 0], [0, c, -s], [0, s, c]])


def _rot_y(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, 0, s], [0, 1.0, 0], [-s, 0, c]])


class Part:
    """One primitive instance placed in the composite frame."""

    def __init__(self, fn, area, offset=(0, 0, 0), rot=None, **kw):
        self.fn, self.kw, self.area = fn, kw, area
        self.offset = np.asarray(offset, float)
        self.rot = np.eye(3) if rot is None else rot

    def sample(self, rng, n):
        p, m = self.fn(rng, n, **self.kw)
        return p @ self.rot.T + self.offset, m @ self.rot.T


def sample_composite(rng, n, parts):
    areas = np.array([p.area for p in parts], float)
    counts = rng.multinomial(n, areas / areas.sum())
    ps, ns = [], []
    for part, c in zip(parts, counts):
        if c == 0:
            continue
        p, m = part.sample(rng, c)
        ps.append(p)
        ns.append(m)
    return np.concatenate(ps), np.concatenate(ns)


def box_part(center, size, rot=None):
    lx, ly, lz = size
    area = 2 * (lx * ly + ly * lz + lx * lz)
    return Part(sample_box, area, center, rot, lx=lx, ly=ly, lz=lz)


def cyl_part(center, r, h, rot=None, caps=True):
    area = 2 * np.pi * r * h + (2 * np.pi * r * r if caps else 0)
    return Part(sample_cylinder, area, center, rot, r=r, h=h, caps=caps)


def sph_part(center, r):
    return Part(sample_ellipsoid, 4 * np.pi * r * r, center, a=r, b=r, c=r)


def cone_part(center, r, h, rot=None):
    area = np.pi * r * (r + np.sqrt(r * r + h * h))
    return Part(sample_cone, area, center, rot, r=r, h=h)


def torus_part(center, R, r, rot=None):
    return Part(sample_torus, 4 * np.pi ** 2 * R * r, center, rot, R=R, r=r)


# ---------------------------------------------------------------------------
# 40 categories: (name, builder(rng) -> parts). `u` jitters a scalar.
# ---------------------------------------------------------------------------


def _u(rng, lo, hi):
    return rng.uniform(lo, hi)


def _make_categories():
    C = {}

    def add(name, build):
        C[name] = build

    # --- single primitives (asymmetrized later by bumps) ---
    add("box_cube", lambda r: [box_part((0, 0, 0), (_u(r, .8, 1.1),) * 3)])
    add("box_flat", lambda r: [box_part((0, 0, 0),
        (_u(r, 1.0, 1.4), _u(r, .8, 1.2), _u(r, .1, .25)))])
    add("box_tall", lambda r: [box_part((0, 0, 0),
        (_u(r, .25, .45), _u(r, .25, .45), _u(r, 1.2, 1.6)))])
    add("cyl_squat", lambda r: [cyl_part((0, 0, 0), _u(r, .5, .7), _u(r, .3, .5))])
    add("cyl_tall", lambda r: [cyl_part((0, 0, 0), _u(r, .2, .35), _u(r, 1.2, 1.6))])
    add("cone_sharp", lambda r: [cone_part((0, 0, 0), _u(r, .35, .5), _u(r, 1.1, 1.5))])
    add("ellipsoid_prolate", lambda r: [Part(sample_ellipsoid, 1,
        a=_u(r, .2, .3), b=_u(r, .25, .35), c=_u(r, .6, .8))])
    add("torus_thin", lambda r: [torus_part((0, 0, 0), _u(r, .55, .65), _u(r, .07, .12))])

    # --- two/three-primitive composites ---
    def lshape(r):
        t = _u(r, .25, .4)
        return [box_part((0, 0, 0), (_u(r, 1.0, 1.3), t, t)),
                box_part((-.5, 0, .45), (t, t, _u(r, .8, 1.1)))]
    add("lshape", lshape)

    def tshape(r):
        t = _u(r, .22, .35)
        return [box_part((0, 0, .5), (_u(r, 1.0, 1.3), t, t)),
                box_part((0, 0, -.1), (t, t, _u(r, .9, 1.2)))]
    add("tshape", tshape)

    def cross3(r):
        t = _u(r, .2, .3)
        L = _u(r, 1.1, 1.4)
        return [box_part((0, 0, 0), (L, t, t)),
                box_part((0, 0, 0), (t, L, t)),
                box_part((0, 0, 0), (t, t, L))]
    add("cross3", cross3)

    def dumbbell(r):
        rr = _u(r, .28, .38)
        return [sph_part((0, 0, .55), rr), sph_part((0, 0, -.55), rr),
                cyl_part((0, 0, 0), _u(r, .09, .14), 1.1)]
    add("dumbbell", dumbbell)

    def mushroom(r):
        return [cone_part((0, 0, .45), _u(r, .5, .7), _u(r, .4, .6)),
                cyl_part((0, 0, -.25), _u(r, .12, .2), _u(r, .8, 1.0))]
    add("mushroom", mushroom)

    def bottle(r):
        rb = _u(r, .3, .4)
        return [cyl_part((0, 0, -.3), rb, _u(r, .8, 1.0)),
                cone_part((0, 0, .35), rb, .4),
                cyl_part((0, 0, .6), _u(r, .08, .13), _u(r, .3, .45))]
    add("bottle", bottle)

    def snowman(r):
        return [sph_part((0, 0, -.45), _u(r, .4, .5)),
                sph_part((0, 0, .25), _u(r, .28, .36)),
                sph_part((0, 0, .75), _u(r, .18, .24))]
    add("snowman", snowman)

    def capsule(r):
        rr = _u(r, .25, .35)
        h = _u(r, .8, 1.1)
        return [cyl_part((0, 0, 0), rr, h, caps=False),
                sph_part((0, 0, h / 2), rr), sph_part((0, 0, -h / 2), rr)]
    add("capsule", capsule)

    # --- furniture-like ---
    def table(r):
        w, d = _u(r, 1.1, 1.4), _u(r, .7, 1.0)
        lh = _u(r, .7, .9)
        t = _u(r, .06, .1)
        legs = [box_part((sx * (w / 2 - .08), sy * (d / 2 - .08), -lh / 2),
                         (t, t, lh))
                for sx in (-1, 1) for sy in (-1, 1)]
        return [box_part((0, 0, .04), (w, d, .08))] + legs
    add("table", table)

    def chair(r):
        s = _u(r, .5, .65)
        lh = _u(r, .4, .5)
        t = .06
        legs = [box_part((sx * (s / 2 - .05), sy * (s / 2 - .05), -lh / 2),
                         (t, t, lh))
                for sx in (-1, 1) for sy in (-1, 1)]
        return ([box_part((0, 0, 0), (s, s, .07)),
                 box_part((0, -s / 2 + .03, lh), (s, .06, _u(r, .7, .9)))]
                + legs)
    add("chair", chair)

    def bench(r):
        w = _u(r, 1.4, 1.7)
        return [box_part((0, 0, 0), (w, _u(r, .35, .5), .08)),
                box_part((-w / 2 + .1, 0, -.25), (.08, .3, .5)),
                box_part((w / 2 - .1, 0, -.25), (.08, .3, .5))]

    def stool(r):
        return [cyl_part((0, 0, .3), _u(r, .35, .45), .08),
                cyl_part((0, 0, -.15), _u(r, .07, .12), .8),
                cyl_part((0, 0, -.55), _u(r, .3, .4), .06)]
    add("stool", stool)

    def shelf(r):
        w, d, h = _u(r, .9, 1.2), _u(r, .3, .4), _u(r, 1.2, 1.5)
        boards = [box_part((0, 0, z), (w, d, .05))
                  for z in np.linspace(-h / 2, h / 2, 4)]
        sides = [box_part((sx * w / 2, 0, 0), (.05, d, h)) for sx in (-1, 1)]
        return boards + sides
    add("shelf", shelf)

    def bed(r):
        w, L = _u(r, .9, 1.1), _u(r, 1.5, 1.8)
        return [box_part((0, 0, 0), (w, L, .25)),
                box_part((0, -L / 2 + .04, .3), (w, .08, .6)),
                box_part((0, L / 2 - .04, .2), (w, .08, .4))]
    add("bed", bed)

    def lamp(r):
        return [cyl_part((0, 0, -.65), _u(r, .3, .4), .07),
                cyl_part((0, 0, 0), .05, _u(r, 1.1, 1.4)),
                cone_part((0, 0, .65), _u(r, .3, .42), _u(r, .35, .5))]
    add("lamp", lamp)

    # --- structures ---
    def stairs(r):
        k = 4
        t = _u(r, .22, .3)
        return [box_part((0, (i - k / 2 + .5) * t, (i - k / 2 + .5) * t),
                         (_u(r, .9, 1.2), t, t)) for i in range(k)]
    add("stairs", stairs)

    def arch(r):
        h = _u(r, .9, 1.2)
        return [box_part((-.45, 0, 0), (.18, .3, h)),
                box_part((.45, 0, 0), (.18, .3, h)),
                box_part((0, 0, h / 2), (1.1, .3, .2))]
    add("arch", arch)

    def frame(r):
        L = _u(r, 1.0, 1.3)
        t = _u(r, .1, .16)
        return [box_part((0, sy * L / 2, 0), (L, t, t)) for sy in (-1, 1)] + \
               [box_part((sx * L / 2, 0, 0), (t, L, t)) for sx in (-1, 1)]
    add("frame", frame)

    def hbeam(r):
        return [box_part((0, 0, .45), (_u(r, .9, 1.2), .35, .12)),
                box_part((0, 0, -.45), (_u(r, .9, 1.2), .35, .12)),
                box_part((0, 0, 0), (.12, .3, .85))]
    add("hbeam", hbeam)

    def tower(r):
        sizes = sorted([_u(r, .4, 1.1) for _ in range(3)], reverse=True)
        z = -0.6
        parts = []
        for s in sizes:
            parts.append(box_part((0, 0, z + s * .18), (s, s, s * .36)))
            z += s * .36
        return parts
    add("tower", tower)

    def gate(r):
        return [cyl_part((-.5, 0, 0), .1, _u(r, 1.0, 1.3)),
                cyl_part((.5, 0, 0), .1, _u(r, 1.0, 1.3)),
                cyl_part((0, 0, .55), .08, 1.1, rot=_rot_y(np.pi / 2))]
    add("gate", gate)

    def ringstack(r):
        return [torus_part((0, 0, z), _u(r, .4, .5), _u(r, .08, .12))
                for z in (-.4, 0, .4)]
    add("ringstack", ringstack)

    def barbell(r):
        return [cyl_part((0, 0, .5), _u(r, .35, .45), .15),
                cyl_part((0, 0, -.5), _u(r, .35, .45), .15),
                cyl_part((0, 0, 0), .07, 1.0)]

    # --- vehicle/instrument-like ---
    def rocket(r):
        rb = _u(r, .22, .3)
        fins = [box_part((np.cos(a) * rb, np.sin(a) * rb, -.55),
                         (.3, .04, .35), rot=_rot_z(a))
                for a in np.linspace(0, 2 * np.pi, 3, endpoint=False)]
        return [cyl_part((0, 0, -.1), rb, 1.0),
                cone_part((0, 0, .6), rb, .45)] + fins
    add("rocket", rocket)

    def plane(r):
        return [cyl_part((0, 0, 0), .14, _u(r, 1.2, 1.5), rot=_rot_x(np.pi / 2)),
                box_part((0, .1, 0), (_u(r, 1.2, 1.5), .3, .05)),
                box_part((0, -.6, .12), (.5, .2, .05)),
                box_part((0, -.62, .22), (.05, .18, .25))]
    add("plane", plane)

    def car(r):
        return [box_part((0, 0, -.1), (_u(r, 1.2, 1.5), .6, .3)),
                box_part((0, 0, .2), (.7, .55, .3)),
                cyl_part((-.4, .3, -.25), .14, .08, rot=_rot_x(np.pi / 2)),
                cyl_part((.4, .3, -.25), .14, .08, rot=_rot_x(np.pi / 2)),
                cyl_part((-.4, -.3, -.25), .14, .08, rot=_rot_x(np.pi / 2)),
                cyl_part((.4, -.3, -.25), .14, .08, rot=_rot_x(np.pi / 2))]
    add("car", car)

    def boat(r):
        return [box_part((0, 0, -.2), (_u(r, 1.3, 1.6), .5, .25)),
                cone_part((.75, 0, -.2), .25, .45, rot=_rot_y(np.pi / 2)),
                cyl_part((0, 0, .25), .05, .7),
                box_part((.15, 0, .35), (.35, .03, .35))]
    add("boat", boat)

    def guitar(r):
        return [Part(sample_ellipsoid, 2.2, (0, 0, -.35),
                     a=_u(r, .42, .52), b=.15, c=.55),
                Part(sample_ellipsoid, 1.4, (0, 0, .1),
                     a=_u(r, .3, .38), b=.14, c=.35),
                box_part((0, 0, .65), (.09, .08, .8))]
    add("guitar", guitar)

    def cup(r):
        rr = _u(r, .3, .4)
        return [cyl_part((0, 0, 0), rr, _u(r, .7, .9), caps=False),
                cyl_part((0, 0, -.4), rr, .05),
                torus_part((rr + .12, 0, 0), .16, .05, rot=_rot_x(np.pi / 2))]
    add("cup", cup)

    def teapot(r):
        return [sph_part((0, 0, 0), _u(r, .42, .52)),
                cone_part((.55, 0, .1), .12, .5, rot=_rot_y(np.pi / 2.5)),
                torus_part((-.5, 0, .05), .22, .05, rot=_rot_x(np.pi / 2)),
                cyl_part((0, 0, .5), .1, .12)]
    add("teapot", teapot)

    def hourglass(r):
        return [cone_part((0, 0, .3), _u(r, .4, .5), .6,
                          rot=_rot_x(np.pi)),
                cone_part((0, 0, -.3), _u(r, .4, .5), .6),
                cyl_part((0, 0, .62), .45, .06),
                cyl_part((0, 0, -.62), .45, .06)]
    add("hourglass", hourglass)

    def antenna(r):
        return [box_part((0, 0, -.55), (.5, .5, .1)),
                cyl_part((0, 0, 0), .05, 1.0),
                Part(sample_ellipsoid, 1.0, (0, 0, .55),
                     a=.35, b=.35, c=.12)]
    add("antenna", antenna)

    def wedge(r):
        # stacked shrinking slabs approximate a wedge
        k = 5
        L = _u(r, 1.0, 1.3)
        return [box_part((0, (i * .5) * L / k - L * .2, (i + .5) * .5 / k - .25),
                         (L * .8, L * (1 - i / k), .5 / k)) for i in range(k)]
    add("wedge", wedge)

    def fan(r):
        blades = [Part(sample_ellipsoid, 1.0,
                       (np.cos(a) * .45, np.sin(a) * .45, 0),
                       rot=_rot_z(a), a=.35, b=.12, c=.03)
                  for a in np.linspace(0, 2 * np.pi, 4, endpoint=False)]
        return [cyl_part((0, 0, 0), .12, .15)] + blades
    add("fan", fan)

    assert len(C) == 40, f"expected 40 categories, have {len(C)}"
    return C


# ---------------------------------------------------------------------------
# cloud assembly
# ---------------------------------------------------------------------------


def make_cloud(rng, build, n=2048):
    parts = build(rng)
    pts, nrm = sample_composite(rng, n, parts)

    # asymmetrizing bumps: 2-4 small spheres glued at random surface pts
    k = rng.integers(2, 5)
    anchors = pts[rng.choice(len(pts), k, replace=False)]
    n_b = n // 16
    for a in anchors:
        bump_r = rng.uniform(0.06, 0.12) * float(np.abs(pts).max())
        bp, bn = sample_ellipsoid(rng, n_b, bump_r, bump_r, bump_r)
        repl = rng.choice(len(pts), n_b, replace=False)
        pts[repl] = bp + a
        nrm[repl] = bn

    # mild anisotropic scale + upright z-rotation (ModelNet-style poses)
    scale = rng.uniform(0.85, 1.15, 3)
    pts *= scale
    nrm = _unit(nrm / scale)
    rot = _rot_z(rng.uniform(0, 2 * np.pi))
    pts = pts @ rot.T
    nrm = nrm @ rot.T

    # unit-sphere normalization (modelnet40_ply_hdf5_2048 convention)
    pts -= pts.mean(0)
    pts /= np.linalg.norm(pts, axis=1).max()
    return pts.astype(np.float32), nrm.astype(np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="datasets/modelnet40_synth")
    ap.add_argument("--train-per-cat", type=int, default=96)
    ap.add_argument("--test-per-cat", type=int, default=32)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import h5py

    cats = _make_categories()
    names = list(cats.keys())
    os.makedirs(args.root, exist_ok=True)

    with open(os.path.join(args.root, "shape_names.txt"), "w") as f:
        f.write("\n".join(names) + "\n")
    half1, half2 = names[:20], names[20:]
    with open(os.path.join(args.root, "synth_half1.txt"), "w") as f:
        f.write("\n".join(half1) + "\n")
    with open(os.path.join(args.root, "synth_half2.txt"), "w") as f:
        f.write("\n".join(half2) + "\n")

    for subset, per_cat in (("train", args.train_per_cat),
                            ("test", args.test_per_cat)):
        rng = np.random.default_rng((args.seed, subset == "test"))
        data, normal, label = [], [], []
        for ci, name in enumerate(names):
            for _ in range(per_cat):
                p, m = make_cloud(rng, cats[name])
                data.append(p)
                normal.append(m)
                label.append(ci)
        order = rng.permutation(len(data))
        data = np.stack(data)[order]
        normal = np.stack(normal)[order]
        label = np.asarray(label, np.int64)[order]

        fname = f"ply_data_{subset}0.h5"
        with h5py.File(os.path.join(args.root, fname), "w") as f:
            f.create_dataset("data", data=data)
            f.create_dataset("normal", data=normal)
            f.create_dataset("label", data=label[:, None].astype(np.uint8))
        with open(os.path.join(args.root, f"{subset}_files.txt"), "w") as f:
            f.write(f"data/modelnet40_ply_hdf5_2048/{fname}\n")
        print(f"{subset}: {len(data)} clouds -> {fname}")


if __name__ == "__main__":
    main()
