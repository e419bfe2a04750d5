"""Small computational-geometry utilities — parity with the vendored
GCOPTER stack the reference carries (`src/utils/include/utils/
geo_utils.hpp`, `quickhull.hpp`, `sdlp.hpp`; SURVEY.md §2.3: available
utilities, no live call site in the planner hot path).

Host-side numpy: these are setup/visualization helpers (hull of a
footprint, polytope vertex enumeration), not device kernels.
"""

from __future__ import annotations

import numpy as np


def convex_hull_2d(points: np.ndarray) -> np.ndarray:
    """Convex hull of 2-D points (Andrew's monotone chain), returned as
    CCW-ordered hull vertices (H, 2) — quickhull.hpp's role for the
    planar footprints this framework plans with."""
    pts = np.unique(np.asarray(points, float)[:, :2], axis=0)
    if len(pts) <= 2:
        return pts
    pts = pts[np.lexsort((pts[:, 1], pts[:, 0]))]

    def half(seq):
        out = []
        for p in seq:
            while len(out) >= 2 and np.cross(out[-1] - out[-2],
                                             p - out[-2]) <= 0:
                out.pop()
            out.append(p)
        return out

    lower = half(pts)
    upper = half(pts[::-1])
    return np.asarray(lower[:-1] + upper[:-1])


def polygon_area(verts: np.ndarray) -> float:
    """Signed area of a 2-D polygon (CCW positive)."""
    v = np.asarray(verts, float)
    x, y = v[:, 0], v[:, 1]
    return 0.5 * float(np.dot(x, np.roll(y, -1)) -
                       np.dot(y, np.roll(x, -1)))


def point_in_convex_2d(hull: np.ndarray, p) -> bool:
    """Point-in-CCW-convex-polygon test."""
    h = np.asarray(hull, float)
    p = np.asarray(p, float)
    e = np.roll(h, -1, axis=0) - h
    w = p[None, :] - h
    return bool(np.all(e[:, 0] * w[:, 1] - e[:, 1] * w[:, 0] >= -1e-12))


def seidel_lp(c: np.ndarray, A: np.ndarray, b: np.ndarray,
              bound: float = 1e7, seed: int = 0) -> np.ndarray:
    """Linear program  min c.x  s.t.  A x <= b  in d <= 3 dims —
    Seidel's randomized incremental algorithm (sdlp.hpp:24-40's job).
    Expected O(n) for fixed d. Returns the optimal x; raises
    ValueError if infeasible. A box |x_i| <= bound keeps the LP
    bounded like sdlp's implicit bound."""
    c = np.asarray(c, float)
    A = np.asarray(A, float)
    b = np.asarray(b, float)
    d = c.shape[0]
    if d < 1 or d > 3:
        raise ValueError("seidel_lp supports 1 <= dim <= 3")
    rng = np.random.default_rng(seed)

    def solve(c, A, b, bound):
        """Seidel's incremental LP with an implicit |x_i| <= bound box.
        Invariant: x is OPTIMAL for the box + all constraints seen so
        far (a merely feasible x breaks the recursion's correctness)."""
        d = c.shape[0]
        if d == 1:
            lo, hi = -bound, bound
            for ai, bi in zip(A[:, 0], b):
                if ai > 1e-30:
                    hi = min(hi, bi / ai)
                elif ai < -1e-30:
                    lo = max(lo, bi / ai)
                elif bi < -1e-9:
                    raise ValueError("infeasible")
            if lo > hi + 1e-9:
                raise ValueError("infeasible")
            return np.array([hi if c[0] < 0 else lo])
        # box optimum: minimize c over the cube
        x = -bound * np.sign(c)
        order = rng.permutation(len(A))
        for pos, idx in enumerate(order):
            ai, bi = A[idx], b[idx]
            if ai @ x <= bi + 1e-9:
                continue
            # optimum moved: it lies ON this constraint's hyperplane.
            # Eliminate x_k and recurse over the previously seen
            # constraints (+ box faces) in d-1 dims.
            k = int(np.argmax(np.abs(ai)))
            if abs(ai[k]) < 1e-30:
                raise ValueError("infeasible")
            keep = [j for j in range(d) if j != k]
            prev = list(order[:pos])
            sub_A, sub_b = [], []
            for jdx in prev:
                aj, bj = A[jdx], b[jdx]
                sub_A.append(aj[keep] - aj[k] / ai[k] * ai[keep])
                sub_b.append(bj - aj[k] / ai[k] * bi)
            # the eliminated variable's box faces become constraints:
            # |x_k| <= bound with x_k = (bi - ai[keep].xs) / ai[k]
            sub_A.append(-ai[keep] / ai[k])
            sub_b.append(bound - bi / ai[k])
            sub_A.append(ai[keep] / ai[k])
            sub_b.append(bound + bi / ai[k])
            cc = c[keep] - c[k] / ai[k] * ai[keep]
            xs = solve(cc, np.asarray(sub_A), np.asarray(sub_b), bound)
            x = np.zeros(d)
            x[keep] = xs
            x[k] = (bi - ai[keep] @ xs) / ai[k]
        return x

    return solve(c, A, b, bound)


def halfspace_polytope_vertices_2d(A: np.ndarray,
                                   b: np.ndarray) -> np.ndarray:
    """Vertex enumeration of {x : A x <= b} in 2-D (geo_utils
    enumerateVs role, used by visPolytope). Returns CCW vertices."""
    A = np.asarray(A, float)
    b = np.asarray(b, float)
    n = len(A)
    verts = []
    for i in range(n):
        for j in range(i + 1, n):
            M = np.stack([A[i], A[j]])
            if abs(np.linalg.det(M)) < 1e-12:
                continue
            v = np.linalg.solve(M, np.array([b[i], b[j]]))
            if np.all(A @ v <= b + 1e-8):
                verts.append(v)
    if not verts:
        return np.zeros((0, 2))
    return convex_hull_2d(np.asarray(verts))
