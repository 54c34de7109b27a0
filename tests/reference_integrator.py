"""Independent float64 NumPy reference dynamics (SURVEY.md section 4(b)).

Deliberately does NOT import the engine: every trajectory here is derived
from the analytic equations of motion (closed forms where they exist,
Lagrangian ODEs + RK4 elsewhere) in float64. The golden tests compare the
float32 engine against these with stated error bounds.

Error-bound rationale (documented for the "bitwise vs our own CPU
reference" gate in BASELINE.json): the engine integrates semi-implicit
Euler at slice size h = dt / (substeps * solver_iterations), a first-order
method, so against an (effectively exact) RK4/closed-form reference the
global trajectory error is O(h * t * d(state)/dt); the per-case tolerances
below are ~2-3x the measured worst case at the test operating points.
Cross-backend BITWISE equality is unattainable by construction (XLA:TPU
fuses/reorders float32 reductions differently from XLA:CPU), so the gate
is: bitwise reproducibility SAME-backend (tests/test_determinism.py) +
bounded divergence vs this independent float64 reference.
"""
from __future__ import annotations

import numpy as np

G = 9.81


def rk4(f, y0, h, n):
    """Classic RK4 on dy/dt = f(y); returns (n+1, ...) trajectory."""
    ys = [np.asarray(y0, np.float64)]
    y = ys[0]
    for _ in range(n):
        k1 = f(y)
        k2 = f(y + 0.5 * h * k1)
        k3 = f(y + 0.5 * h * k2)
        k4 = f(y + h * k3)
        y = y + (h / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)
        ys.append(y)
    return np.stack(ys)


def pendulum_trajectory(theta0, omega0, length, dt, n, gravity=G):
    """Planar rigid pendulum (point mass at distance `length` from a
    frictionless hinge): theta'' = -(g/L) sin(theta)."""

    def f(y):
        th, om = y
        return np.array([om, -(gravity / length) * np.sin(th)], np.float64)

    return rk4(f, np.array([theta0, omega0], np.float64), dt, n)


def double_pendulum_trajectory(y0, l1, l2, m1, m2, dt, n, gravity=G):
    """Standard double pendulum (point masses, absolute angles from the
    downward vertical): Lagrangian equations of motion."""

    def f(y):
        t1, t2, w1, w2 = y
        d = t2 - t1
        den = m1 + m2 * np.sin(d) ** 2
        a1 = (
            m2 * l1 * w1**2 * np.sin(d) * np.cos(d)
            + m2 * gravity * np.sin(t2) * np.cos(d)
            + m2 * l2 * w2**2 * np.sin(d)
            - (m1 + m2) * gravity * np.sin(t1)
        ) / (l1 * den)
        a2 = (
            -m2 * l2 * w2**2 * np.sin(d) * np.cos(d)
            + (m1 + m2)
            * (
                gravity * np.sin(t1) * np.cos(d)
                - l1 * w1**2 * np.sin(d)
                - gravity * np.sin(t2)
            )
        ) / (l2 * den)
        return np.array([w1, w2, a1, a2], np.float64)

    return rk4(f, np.asarray(y0, np.float64), dt, n)


def ballistic(p0, v0, t, gravity=(0.0, 0.0, -G)):
    """Closed-form free-body translation under constant gravity."""
    p0 = np.asarray(p0, np.float64)
    v0 = np.asarray(v0, np.float64)
    g = np.asarray(gravity, np.float64)
    return p0 + v0 * t + 0.5 * g * t * t, v0 + g * t


def spinning_quat(omega, t, q0=(0.0, 0.0, 0.0, 1.0)):
    """Closed-form attitude for torque-free rotation about a PRINCIPAL
    axis at constant body rate `omega` (3,): q(t) = exp(t*omega/2) * q0,
    xyzw convention."""
    w = np.asarray(omega, np.float64)
    q0 = np.asarray(q0, np.float64)
    ang = np.linalg.norm(w) * t
    if ang < 1e-12:
        return q0
    axis = w / np.linalg.norm(w)
    dq = np.concatenate([axis * np.sin(ang / 2.0), [np.cos(ang / 2.0)]])
    # quat multiply dq * q0 (xyzw)
    x1, y1, z1, w1 = dq
    x2, y2, z2, w2 = q0
    return np.array(
        [
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        ],
        np.float64,
    )


def bounce_apex(v_impact, restitution, gravity=G):
    """Rebound apex height above the contact plane for an elastic bounce."""
    vr = restitution * v_impact
    return vr * vr / (2.0 * gravity)
