"""The physics step: substeps of (FK -> free dynamics -> contact-impulse
solve -> integrate), as one pure function suitable for jit/vmap/scan.

This is the TPU equivalent of the reference's
`for _ in range(control_freq_inv): gym.simulate(sim)` inner loop
(vec_task.py:375-386) with `substeps` PhysX sub-integrations per dt
(cfg/task/Ant.yaml:43-44).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..model.spec import Model
from . import contacts as _contacts
from . import dynamics as _dyn
from .dynamics import Kin, SimParams, SimState


class StepOut(NamedTuple):
    state: SimState
    kin: Kin  # kinematics at the END of the step (for obs)
    body_force: jax.Array  # (nbody, 3) last-substep contact force per body
    body_torque: jax.Array  # (nbody, 3)
    dof_force: jax.Array  # (nv,) last-substep generalized contact force
    # (the dof-force-sensor quantity, reference enable_actor_dof_force_sensors)


def _masks(model: Model):
    anc = jnp.asarray(_dyn.ancestor_matrix(model))
    dof_mask = jnp.asarray(_dyn.dof_ancestor_mask(model))
    sq_adr = jnp.asarray(_dyn.scalar_dof_q_adr(model))
    return (anc, dof_mask), sq_adr, _dyn.kin_meta(model)


def physics_step(
    model: Model,
    state: SimState,
    qfrc: jax.Array,
    params: SimParams,
    xfrc: jax.Array | None = None,
    plane_friction: jax.Array | float = 1.0,
    q_target: jax.Array | None = None,
    terrain=None,
) -> StepOut:
    """Advance one env-step dt = params.dt (substeps * solver_iterations
    internal slices). qfrc: (nv,) applied generalized forces, held constant
    across substeps (matching set_dof_actuation_force_tensor semantics,
    reference ant.py:281-285). xfrc: optional (nbody, 6) external spatial
    forces (origin-referenced world coords), e.g. random pushes.
    q_target: optional (nq,) spring/PD-drive setpoints re-evaluated every
    substep (set_dof_position_target_tensor semantics).
    """
    masks, sq_adr, meta = _masks(model)
    anc = masks[0]
    n_slices = params.substeps * params.solver_iterations
    h = params.dt / n_slices

    def substep(carry, _):
        q, qd, warm = carry
        kin = _dyn.forward_kinematics(model, q, qd, meta)
        f_ext = jnp.zeros((model.nbody, 6)) if xfrc is None else xfrc
        qdd, minv_mul, _ = _dyn.forward_dynamics(
            model, q, qd, qfrc, f_ext, params, masks, sq_adr, kin=kin, h=h,
            q_spring=q_target,
        )
        qd_free = qd + h * qdd
        con = _contacts.constraint_data(
            model, kin, anc, plane_friction, terrain=terrain
        )
        sol = _contacts.solve_contacts(
            model, con, minv_mul, qd_free, h, params, warm=warm
        )
        bf, bt = _contacts.accumulate_body_wrench(model, con, sol, kin, h)
        qd_new = jnp.clip(
            sol.qd, -params.max_dof_velocity, params.max_dof_velocity
        )
        q2 = _dyn.integrate_positions(model, q, qd_new, h, meta)
        return (q2, qd_new, sol.impulse), (bf, bt, sol.qfrc / h)

    ncon = _contacts.num_constraints(model)
    warm0 = jnp.zeros((ncon, 3))
    (q, qd, _), (bf, bt, qf) = jax.lax.scan(
        substep, (state.q, state.qd, warm0), None, length=n_slices
    )
    kin = _dyn.forward_kinematics(model, q, qd, meta)
    return StepOut(
        state=SimState(q=q, qd=qd),
        kin=kin,
        body_force=bf[-1],
        body_torque=bt[-1],
        dof_force=qf[-1],
    )
