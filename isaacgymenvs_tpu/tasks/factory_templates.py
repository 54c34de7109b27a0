"""FactoryTaskInsertion + FactoryTaskGears: environment-only templates.

Parity targets: reference isaacgymenvs/tasks/factory/factory_task_insertion.py
and factory_task_gears.py -- both ship ONLY the environment ("training a
successful RL policy is an open research problem left to the user", their
module docstrings): observations stay zero (`compute_observations` returns
the untouched obs_buf), reward is zero (`_update_rew_buf`: pass), actions
are stored but never applied as control targets, and resets place the
Franka at mid-range joints + `joint_noise` with objects dropped at biased
random poses (factory_task_insertion.py _reset_franka/_reset_object;
factory_task_gears.py likewise). cfgs: FactoryTaskInsertion.yaml /
FactoryTaskGears.yaml (+ FactoryEnvInsertion.yaml / FactoryEnvGears.yaml).

TPU design notes: the Franka holds its reset pose through the joint PD
drive (gym_default joint_prop_gains 40 / deriv 8 -- the reference's DOF
position targets); the plug/gears are free bodies with mesh-sampled
contact points against the table plane and the fixed socket/base SDF.

Documented divergences:
  * one subassembly per run (round_peg_hole_16mm_tight; gear base tight)
    instead of per-env random subassembly mixing (static single-program
    model; selectable via cfg env.desired_subassembly);
  * gear-vs-gear collision between the three dropped gears is unmodeled
    (they spawn apart; the template has no reward to exploit it).
"""
from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from ..envcore.vec_task import VecTask
from ..model import load_urdf
from ..model.compose import compose
from ..model.spec import FIXED, FREE, GEOM_CYLINDER, ModelBuilder
from ..sdf.builder import (
    add_contact_points,
    attach_sdf,
    load_obj,
    mesh_to_sdf,
    pair_points_with_sdf,
)
from ..utils.assets import asset_path
from .factory_nut_bolt import _stratified_pick, _strip_points

_INS = "factory/mesh/factory_insertion"
_GEARS = "factory/mesh/factory_gears"

# factory_asset_info_insertion.yaml round_peg_hole_16mm_tight
PEG_DIAMETER = 0.015994
PEG_LENGTH = 0.050
HOLE_HEIGHT = 0.0089916
DENSITY = 8000.0


@lru_cache(maxsize=None)
def _peg_mesh():
    return load_obj(asset_path(f"{_INS}/factory_round_peg_16mm_tight.obj"))


@lru_cache(maxsize=None)
def hole_sdf_grid(resolution: int = 128):
    v, t = load_obj(
        asset_path(f"{_INS}/factory_round_hole_16mm_subdiv_3x.obj")
    )
    return mesh_to_sdf(v, t, resolution=resolution, padding=0.1)


@lru_cache(maxsize=None)
def gear_base_sdf_grid(resolution: int = 192):
    v, t = load_obj(
        asset_path(f"{_GEARS}/factory_gear_base_tight_space_5e-4_subdiv_4x.obj")
    )
    return mesh_to_sdf(v, t, resolution=resolution, padding=0.05)


def _free_mesh_body(name, mass, ipos, inertia, start_pos):
    b = ModelBuilder()
    body = b.add_body(
        parent=-1, name=name, pos=(0, 0, 0), quat=(0, 0, 0, 1),
        jnt_type=FREE, mass=mass, ipos=ipos, inertia=inertia,
    )
    b.qpos0_free[body] = (
        np.asarray(start_pos, np.float32),
        np.array([0, 0, 0, 1], np.float32),
    )
    # inert proxy geom (mass metadata only; real contact = sampled points)
    b.add_geom(
        body, GEOM_CYLINDER, tuple(ipos), (0, 0, 0, 1),
        (0.01, 0.01, 0.0), friction=0.5,
    )
    return b.finalize()


def build_peg():
    r, h = PEG_DIAMETER / 2, PEG_LENGTH
    m = np.pi * r * r * h * DENSITY
    izz = 0.5 * m * r * r
    ixx = m / 12.0 * (3 * r * r + h * h)
    return _free_mesh_body(
        "plug", m, (0, 0, h / 2), np.diag([ixx, ixx, izz]),
        (0.0, -0.1, 0.0),
    )


def _fixed_body(name):
    b = ModelBuilder()
    b.add_body(
        parent=-1, name=name, pos=(0, 0, 0), quat=(0, 0, 0, 1),
        jnt_type=FIXED, mass=1.0, ipos=(0, 0, 0.005),
        inertia=np.eye(3) * 1e-4,
    )
    return b.finalize()


@lru_cache(maxsize=None)
def peg_contact_points():
    v, _ = _peg_mesh()
    return _stratified_pick(v.astype(np.float32), n_z=8, n_ang=8)


@lru_cache(maxsize=None)
def gear_template_points(size):
    if size == "large":
        # factory_gear_large_space_5e-4.obj is MISSING from the reference
        # asset tree (its .mtl and URDF exist, the .obj does not); the
        # industreal large gear shares the same assembly frame (small gear
        # spans x [0.0395,0.0615] vs industreal's [0.0398,0.0617]) and
        # stands in for it.
        v, _ = load_obj(
            asset_path("industreal/mesh/industreal_gears/industreal_gear_large.obj")
        )
    else:
        v, _ = load_obj(
            asset_path(f"{_GEARS}/factory_gear_{size}_space_5e-4.obj")
        )
    v = v.astype(np.float32)
    # bin the angle about the gear's own centroid: the assembly-frame
    # meshes sit far off the origin (small gear at x~0.05), so
    # origin-centered angular bins would collapse to one bin and sample
    # a lopsided, plane-penetrating point set
    c = v.mean(0)
    shifted = v - np.array([c[0], c[1], 0.0], np.float32)
    picked = _stratified_pick(shifted, n_z=4, n_ang=10)
    return picked + np.array([c[0], c[1], 0.0], np.float32)


class _FactoryTemplate(VecTask):
    """Shared env-only template machinery (see module docstring)."""

    use_pd_targets = True

    def __init__(self, cfg):
        env = cfg.get("env", {})
        rl = cfg.get("rl", {})
        r = cfg.get("randomize", {})
        self.num_obs = int(env.get("numObservations", 32))
        self.num_acts = int(env.get("numActions", 12))
        self.num_states = 0
        env.setdefault(
            "episodeLength", int(rl.get("max_episode_length", 1024))
        )
        self.joint_noise = float(r.get("joint_noise", 0.0))
        self.initial_state = str(r.get("initial_state", "random"))
        self.rand = r
        super().__init__(cfg)
        m = self.model
        fr = [
            d for d in self.scalar_dof_indices
            if m.dof_body[d] < self._first_object_body
        ]
        self.q_idx = jnp.asarray(
            np.asarray([m.q_adr[m.dof_body[d]] for d in fr])
        )
        lo = np.asarray(m.dof_limit_lower)[np.asarray(fr)]
        hi = np.asarray(m.dof_limit_upper)[np.asarray(fr)]
        self.q_mid = jnp.asarray((lo + hi) * 0.5)
        # franka gravity compensation (factory_base.py:132
        # disable_gravity=True on the robot)
        from ..engine import dynamics as _dyn

        self._meta = _dyn.kin_meta(m)
        self.franka_mass = jnp.asarray(
            np.where(
                np.arange(m.nbody) < self._first_object_body,
                np.asarray(m.body_mass), 0.0,
            ),
            jnp.float32,
        )

    def _franka(self):
        franka = load_urdf(
            asset_path("urdf/franka_description/robots/franka_panda.urdf"),
            fix_base=True,
        )
        # base at (0.5, 0, floor) facing the table center, yaw pi
        bp = np.asarray(franka.body_pos).copy()
        bq = np.asarray(franka.body_quat).copy()
        bp[0] = [0.5, 0.0, -0.4]
        bq[0] = [0.0, 0.0, 1.0, 0.0]
        nv = franka.nv
        # gym_default joint PD (holds the reset pose; the template applies
        # no task-space control -- reference pre_physics_step only stores
        # actions)
        stiff = np.full(nv, 40.0, np.float32)
        damp = np.full(nv, 8.0, np.float32)
        stiff[nv - 2:] = 500.0
        damp[nv - 2:] = 20.0
        return franka.replace(
            body_pos=jnp.asarray(bp), body_quat=jnp.asarray(bq),
            dof_stiffness=jnp.asarray(stiff), dof_damping=jnp.asarray(damp),
        )

    # ---- zero-control / zero-obs / zero-reward contract ----------------
    def compute_force(self, action, q, qd, task):
        from .. import maths
        from ..engine import dynamics as _dyn

        m = self.model
        q_target = jnp.zeros(m.nq).at[self.q_idx].set(task["q_ref"])
        kin = _dyn.forward_kinematics(m, q, qd, self._meta)
        com = kin.x + maths.quat_rotate(kin.quat, m.body_ipos)
        f = -self.franka_mass[:, None] * self.sim_params.gravity[None, :]
        xfrc = jnp.concatenate([jnp.cross(com, f), f], axis=-1)
        return jnp.zeros(m.nv), xfrc, q_target

    def observe(self, q, qd, kin, sensors, task, actions, progress):
        return jnp.zeros(self.num_obs)

    def reward_done(self, obs, q, qd, kin, sensors, task, actions, progress):
        done = progress >= self.max_episode_length - 1
        return jnp.zeros(()), done, task

    def _franka_reset_q(self, rng):
        noise = (jax.random.uniform(rng, self.q_mid.shape) * 2.0 - 1.0) * (
            self.joint_noise * np.pi / 180.0
        )
        return self.q_mid + noise


class FactoryTaskInsertion(_FactoryTemplate):
    """Peg + hole template (reference factory_task_insertion.py)."""

    def build_model(self):
        model, refs = compose(
            [self._franka(), build_peg(), _fixed_body("socket")],
            ["", "plug:", "socket:"],
        )
        self.franka_ref, self.plug_ref, self.socket_ref = refs
        self._first_object_body = self.plug_ref.body0
        plug_body = self.plug_ref.body0
        model = _strip_points(model, set(range(model.nbody)))
        model, cp = add_contact_points(
            model, plug_body, peg_contact_points(), friction=0.5
        )
        model, g = attach_sdf(
            model, self.socket_ref.body0, hole_sdf_grid()
        )
        model = pair_points_with_sdf(model, cp, g)
        return model, self.sim_params_from_cfg()

    def sample_init(self, rng):
        m = self.model
        kq, kp = jax.random.split(rng)
        q = m.qpos0
        q_ref = self._franka_reset_q(kq)
        q = q.at[self.q_idx].set(q_ref)
        pq = m.q_adr[self.plug_ref.body0]
        noise = float(self.rand.get("plug_noise_xy", 0.05))
        bias_y = float(self.rand.get("plug_bias_y", -0.1))
        bias_z = float(self.rand.get("plug_bias_z", 0.0))
        xy = (jax.random.uniform(kp, (2,)) * 2.0 - 1.0) * noise
        pos = jnp.array([xy[0], bias_y + xy[1], bias_z])
        if self.initial_state == "goal":
            pos = jnp.zeros(3)
        q = q.at[pq: pq + 3].set(pos)
        q = q.at[pq + 3: pq + 7].set(jnp.array([0.0, 0, 0, 1.0]))
        return q, jnp.zeros(m.nv), {"q_ref": q_ref}


class FactoryTaskGears(_FactoryTemplate):
    """Three gears + base template (reference factory_task_gears.py)."""

    def build_model(self):
        gears = []
        # per-gear radius + axis x-offset in the shared assembly frame
        # (small at x~0.05, medium ~0.02, large ~-0.03); a mis-centered
        # com makes the free disc tip over on the table
        for size, y0, r, cx in (
            ("small", 0.1, 0.011, 0.0508),
            ("medium", -0.1, 0.021, 0.0202),
            ("large", 0.1, 0.031, -0.0302),
        ):
            h = 0.02
            m = np.pi * r * r * h * 1000.0 * 0.7
            izz = 0.5 * m * r * r
            ixx = m / 12.0 * (3 * r * r + h * h)
            gears.append(_free_mesh_body(
                f"gear_{size}", m, (cx, 0, 0.015),
                np.diag([ixx, ixx, izz]), (0.0, y0, 0.0),
            ))
        model, refs = compose(
            [self._franka()] + gears + [_fixed_body("base")],
            ["", "gsmall:", "gmed:", "glarge:", "base:"],
        )
        self.franka_ref = refs[0]
        self.gear_refs = refs[1:4]
        self.base_ref = refs[4]
        self._first_object_body = self.gear_refs[0].body0
        model = _strip_points(model, set(range(model.nbody)))
        model, g = attach_sdf(model, self.base_ref.body0, gear_base_sdf_grid())
        for ref, size in zip(self.gear_refs, ("small", "medium", "large")):
            model, cp = add_contact_points(
                model, ref.body0, gear_template_points(size), friction=0.5
            )
            model = pair_points_with_sdf(model, cp, g)
        return model, self.sim_params_from_cfg()

    def sample_init(self, rng):
        m = self.model
        keys = jax.random.split(rng, 4)
        q = m.qpos0
        q_ref = self._franka_reset_q(keys[0])
        q = q.at[self.q_idx].set(q_ref)
        noise = float(self.rand.get("gears_noise_xy", 0.05))
        bias_y = float(self.rand.get("gears_bias_y", -0.1))
        bias_z = float(self.rand.get("gears_bias_z", 0.0))
        # small/large at -gears_bias_y, medium at +gears_bias_y
        # (reference factory_task_gears.py _reset_object)
        for ref, k, ysign in zip(self.gear_refs, keys[1:], (-1.0, 1.0, -1.0)):
            gq = m.q_adr[ref.body0]
            xy = (jax.random.uniform(k, (2,)) * 2.0 - 1.0) * noise
            pos = jnp.array([xy[0], ysign * bias_y + xy[1], bias_z])
            if self.initial_state == "goal":
                pos = jnp.zeros(3)
            q = q.at[gq: gq + 3].set(pos)
            q = q.at[gq + 3: gq + 7].set(jnp.array([0.0, 0, 0, 1.0]))
        return q, jnp.zeros(m.nv), {"q_ref": q_ref}
