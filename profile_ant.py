#!/usr/bin/env python
"""Profile one Ant step: where does the time go?

Times each phase of the pipeline separately (physics substep pieces, obs,
reward) by jitting them standalone over the same 4096-env batch.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

from isaacgymenvs_tpu.tasks import task_map
from isaacgymenvs_tpu.engine import step as estep
from isaacgymenvs_tpu.engine import dynamics as dyn
from isaacgymenvs_tpu.engine import contacts as ctc

NUM = 4096


def timeit(name, fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:38s} {dt*1e3:8.3f} ms")
    return dt


def main():
    cfg = {"env": {"numEnvs": NUM, "clipActions": 1.0},
           "sim": {"dt": 1 / 60, "substeps": 2}}
    env = task_map["Ant"](cfg)
    state, obs = env.reset(jax.random.PRNGKey(0))
    model = env.model
    params = env.sim_params
    print("nbody", model.nbody, "nv", model.nv, "nq", model.nq,
          "ncon", ctc.num_constraints(model), "substeps", params.substeps,
          "solver_iters", params.solver_iterations,
          "apgd_iters", params.solver_apgd_iterations)

    actions = jnp.zeros((NUM, env.num_acts))

    # full env.step
    stepf = jax.jit(env.step)
    timeit("env.step (full)", stepf, state, actions)

    q = state.sim.q
    qd = state.sim.qd
    qfrc = jnp.zeros((NUM, model.nv))

    masks, sq_adr, meta = estep._masks(model)
    anc = masks[0]

    # FK alone
    fk = jax.jit(jax.vmap(lambda q, qd: dyn.forward_kinematics(model, q, qd, meta)))
    timeit("forward_kinematics", fk, q, qd)
    kin = fk(q, qd)

    # forward dynamics (M, C, cholesky inverse)
    h = params.dt / (params.substeps * params.solver_iterations)
    def fd(q, qd, qfrc, kin):
        f_ext = jnp.zeros((model.nbody, 6))
        qdd, _, _ = dyn.forward_dynamics(model, q, qd, qfrc, f_ext, params,
                                         masks, sq_adr, kin=kin, h=h)
        return qdd
    fdj = jax.jit(jax.vmap(fd, in_axes=(0, 0, 0, 0)))
    timeit("forward_dynamics (M,C,chol)", fdj, q, qd, qfrc, kin)

    # constraint assembly
    ca = jax.jit(jax.vmap(lambda kin: ctc.constraint_data(model, kin, anc, 1.0)))
    timeit("constraint_data", ca, kin)
    con = ca(kin)

    # contact solve (with fresh Minv per env)
    def solve(q, qd, qfrc, kin, con):
        f_ext = jnp.zeros((model.nbody, 6))
        qdd, minv_mul, _ = dyn.forward_dynamics(model, q, qd, qfrc, f_ext, params,
                                                masks, sq_adr, kin=kin, h=h)
        qd_free = qd + h * qdd
        return ctc.solve_contacts(model, con, minv_mul, qd_free, h, params).qd
    sj = jax.jit(jax.vmap(solve, in_axes=(0, 0, 0, 0, 0)))
    timeit("fd + solve_contacts", sj, q, qd, qfrc, kin, con)

    # full physics step
    ps = jax.jit(jax.vmap(
        lambda s, f: estep.physics_step(model, s, f, params).state,
        in_axes=(0, 0)))
    timeit("physics_step (2 substeps)", ps, state.sim, qfrc)

    # obs+reward by subtraction
    print("\n(obs/reward/reset overhead = env.step - physics_step)")


if __name__ == "__main__":
    main()
