"""FrankaCubeStack: stack cube A on cube B with OSC or joint-torque control.

Parity target: reference isaacgymenvs/tasks/franka_cube_stack.py (obs 19
osc / 26 joint_tor :105-107, OSC with task-space mass matrix + nullspace
posture _compute_osc_torques :601-630, staged reward compute_franka_reward
:758-806, scene: table 1.2x1.2 at z=1.0 + 5cm/7cm cubes :209-228, franka
at (-0.45, 0, 1.125) :269-271) and cfg/task/FrankaCubeStack.yaml.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .. import controllers, maths
from ..engine import dynamics as _dyn
from ..envcore.vec_task import VecTask
from ..model import load_urdf
from ..model.compose import compose
from ..model.spec import FREE, GEOM_BOX, FIXED, ModelBuilder, box_inertia
from ..utils.assets import asset_path


def _box_actor(name: str, size, density: float, fixed: bool, pos):
    b = ModelBuilder()
    half = np.asarray(size) / 2.0
    mass, inertia = box_inertia(density, half)
    body = b.add_body(
        parent=-1, name=name, pos=(0, 0, 0), quat=(0, 0, 0, 1),
        jnt_type=FIXED if fixed else FREE, mass=mass, inertia=inertia,
    )
    if fixed:
        b.body_pos[body] = np.asarray(pos, np.float32)
    else:
        b.qpos0_free[body] = (
            np.asarray(pos, np.float32),
            np.array([0, 0, 0, 1], np.float32),
        )
    b.add_geom(body, GEOM_BOX, (0, 0, 0), (0, 0, 0, 1), half, 1.0)
    return b.finalize()


class FrankaCubeStack(VecTask):
    use_pd_targets = True

    def __init__(self, cfg):
        env = cfg["env"]
        self.control_type = str(env.get("controlType", "osc"))
        self.action_scale = float(env.get("actionScale", 1.0))
        self.start_position_noise = float(env.get("startPositionNoise", 0.25))
        self.start_rotation_noise = float(env.get("startRotationNoise", 0.785))
        self.r_dist_scale = float(env.get("distRewardScale", 0.1))
        self.r_lift_scale = float(env.get("liftRewardScale", 1.5))
        self.r_align_scale = float(env.get("alignRewardScale", 2.0))
        self.r_stack_scale = float(env.get("stackRewardScale", 16.0))
        env.setdefault("episodeLength", 300)
        self.num_obs = 19 if self.control_type == "osc" else 26
        self.num_acts = 7 if self.control_type == "osc" else 8
        self.cubeA_size = 0.050
        self.cubeB_size = 0.070
        self.table_height = 1.0 + 0.05 / 2
        super().__init__(cfg)
        self._setup()

    def build_model(self):
        franka = load_urdf(
            asset_path("urdf/franka_description/robots/franka_panda.urdf"),
            fix_base=True,
        )
        stiff = np.zeros(9, np.float32)
        damp = np.zeros(9, np.float32)
        stiff[7:] = 800.0  # gripper position servos (reference uses drives)
        damp[:7] = 0.0
        damp[7:] = 40.0
        franka = franka.replace(
            dof_stiffness=jnp.asarray(stiff), dof_damping=jnp.asarray(damp)
        )
        table = _box_actor("table", [1.2, 1.2, 0.05], 1000.0, True, [0, 0, 1.0])
        cubeA = _box_actor(
            "cubeA", [self.cubeA_size] * 3, 555.0, False,
            [0.0, -0.2, self.table_height + self.cubeA_size / 2],
        )
        cubeB = _box_actor(
            "cubeB", [self.cubeB_size] * 3, 555.0, False,
            [0.0, 0.2, self.table_height + self.cubeB_size / 2],
        )
        model, refs = compose(
            [franka, table, cubeA, cubeB], ["", "table:", "A:", "B:"]
        )
        self.franka_ref, self.table_ref, self.cubeA_ref, self.cubeB_ref = refs
        # franka base on its stand (franka_cube_stack.py:269-271)
        model = model.replace(
            body_pos=model.body_pos.at[0].set(jnp.array([-0.45, 0.0, 1.125]))
        )
        # contact pairs: cube corners vs table top, A vs B, fingers vs A
        table_geom = self.table_ref.geom0
        a_geom = self.cubeA_ref.geom0
        b_geom = self.cubeB_ref.geom0
        a_body = self.cubeA_ref.body0
        b_body = self.cubeB_ref.body0
        fingers = {
            model.body_names.index("panda_leftfinger"),
            model.body_names.index("panda_rightfinger"),
        }
        ppp, ppg = [], []
        for c in range(model.ncp):
            body = model.cpoint_body[c]
            if body == a_body:
                ppp += [c, c]
                ppg += [table_geom, b_geom]
            elif body == b_body:
                ppp.append(c)
                ppg.append(table_geom)
            elif body in fingers:
                ppp.append(c)
                ppg.append(a_geom)
        model = model.replace(
            ppair_point=tuple(ppp), ppair_geom=tuple(ppg), plane_contacts=False
        )
        return model, self.sim_params_from_cfg()

    def _setup(self):
        m = self.model
        sdofs = self.scalar_dof_indices  # 9 franka dofs
        sq = np.asarray([m.q_adr[m.dof_body[d]] for d in sdofs])
        self.q_idx = jnp.asarray(sq)
        self.v_idx = jnp.asarray(sdofs)
        self.v_idx_np = np.asarray(sdofs)
        self.default_dof = jnp.asarray(
            [0.0, 0.1963, 0.0, -2.6180, 0.0, 2.9416, 0.7854, 0.035, 0.035]
        )
        lo = np.asarray(m.dof_limit_lower)[sdofs]
        hi = np.asarray(m.dof_limit_upper)[sdofs]
        self.dof_lower = jnp.asarray(lo)
        self.dof_upper = jnp.asarray(hi)
        self.effort_limit = jnp.asarray(np.asarray(m.dof_max_effort)[sdofs][:7])
        self.hand_body = m.body_names.index("panda_hand")
        self.lf_body = m.body_names.index("panda_leftfinger")
        self.rf_body = m.body_names.index("panda_rightfinger")
        self.eef_offset = jnp.array([0.0, 0.0, 0.1])  # grip site in hand frame
        self.aq = m.q_adr[self.cubeA_ref.body0]
        self.bq = m.q_adr[self.cubeB_ref.body0]
        self.kp = 150.0
        self.kd = 2.0 * np.sqrt(150.0)
        self.kp_null = 10.0
        self.kd_null = 2.0 * np.sqrt(10.0)
        self.cmd_limit = jnp.asarray([0.1, 0.1, 0.1, 0.5, 0.5, 0.5])
        self._anc = jnp.asarray(_dyn.ancestor_matrix(m))
        self._dof_mask = jnp.asarray(_dyn.dof_ancestor_mask(m))
        self._meta = _dyn.kin_meta(m)
        self._dof_body = np.asarray(m.dof_body)

    # ---- init -----------------------------------------------------------
    def sample_init(self, rng):
        m = self.model
        kq, ka, kb, kya, kyb = jax.random.split(rng, 5)
        noise = 0.25 * (jax.random.uniform(kq, (9,)) - 0.5)
        dof = jnp.clip(self.default_dof + noise * 0.0, self.dof_lower, self.dof_upper)
        q = m.qpos0.at[self.q_idx].set(dof)
        # cube placement: random xy around the table center, random yaw
        pa = jax.random.uniform(ka, (2,), minval=-0.15, maxval=0.15) + jnp.array(
            [0.0, -0.15]
        )
        pb = jax.random.uniform(kb, (2,), minval=-0.1, maxval=0.1) + jnp.array(
            [0.0, 0.2]
        )
        yaw_a = jax.random.uniform(kya, (), minval=-0.785, maxval=0.785)
        yaw_b = jax.random.uniform(kyb, (), minval=-0.785, maxval=0.785)
        qa = maths.quat_from_angle_axis(yaw_a, jnp.array([0.0, 0, 1]))
        qb = maths.quat_from_angle_axis(yaw_b, jnp.array([0.0, 0, 1]))
        q = q.at[self.aq : self.aq + 3].set(
            jnp.concatenate([pa, jnp.array([self.table_height + self.cubeA_size / 2])])
        )
        q = q.at[self.aq + 3 : self.aq + 7].set(qa)
        q = q.at[self.bq : self.bq + 3].set(
            jnp.concatenate([pb, jnp.array([self.table_height + self.cubeB_size / 2])])
        )
        q = q.at[self.bq + 3 : self.bq + 7].set(qb)
        return q, jnp.zeros(m.nv), {"stack": jnp.zeros((), bool)}

    # ---- OSC control ----------------------------------------------------
    def compute_force(self, action, q, qd, task):
        m = self.model
        kin = _dyn.forward_kinematics(m, q, qd, self._meta)
        eef = kin.x[self.hand_body] + maths.quat_rotate(
            kin.quat[self.hand_body], self.eef_offset
        )
        if self.control_type == "osc":
            dpose = action[:6] * self.cmd_limit * self.action_scale
            arm = self.v_idx_np[:7]
            J = controllers.body_jacobian(
                kin, self._anc, self._dof_body, self.hand_body, eef
            )[:, arm]
            M = _dyn.mass_matrix(m, kin, (self._anc, self._dof_mask))
            M77 = M[np.ix_(arm, arm)]
            Minv = _dyn.spd_inverse(M77 + 1e-6 * jnp.eye(7))
            # eef spatial velocity (angular, linear at eef point)
            v = kin.v[self.hand_body]
            eef_vel = jnp.concatenate([v[:3], v[3:] + jnp.cross(v[:3], eef)])
            # reference orders dpose (linear, angular); ours (ang, lin)
            err = jnp.concatenate([dpose[3:6], dpose[0:3]])
            vel6 = eef_vel
            q_err = maths.normalize_angle(
                self.default_dof[:7] - q[self.q_idx[:7]]
            )
            tau = controllers.operational_space_control(
                J, Minv, err, vel6, qd[self.v_idx[:7]],
                kp=self.kp, kd=self.kd,
                null_kp=self.kp_null, null_kd=self.kd_null, q_err=q_err,
            )
            tau = jnp.clip(tau, -self.effort_limit, self.effort_limit)
            grip = action[6]
        else:
            tau = action[:7] * self.effort_limit * self.action_scale
            grip = action[7]
        qfrc = jnp.zeros(m.nv).at[self.v_idx[:7]].set(tau)
        finger_target = jnp.where(grip >= 0.0, 0.04, 0.0)
        q_target = jnp.zeros(m.nq).at[self.q_idx[7:]].set(
            jnp.full(2, finger_target)
        )
        return qfrc, jnp.zeros((m.nbody, 6)), q_target

    # ---- observations ---------------------------------------------------
    def observe(self, q, qd, kin, sensors, task, actions, progress):
        eef = kin.x[self.hand_body] + maths.quat_rotate(
            kin.quat[self.hand_body], self.eef_offset
        )
        cubeA_pos = q[self.aq : self.aq + 3]
        cubeA_quat = q[self.aq + 3 : self.aq + 7]
        cubeB_pos = q[self.bq : self.bq + 3]
        parts = [
            cubeA_quat,
            cubeA_pos,
            cubeB_pos - cubeA_pos,
            eef,
            kin.quat[self.hand_body],
        ]
        if self.control_type == "osc":
            parts.append(q[self.q_idx[7:]])
        else:
            parts.append(q[self.q_idx])
        return jnp.concatenate(parts)

    # ---- reward ---------------------------------------------------------
    def reward_done(self, obs, q, qd, kin, sensors, task, actions, progress):
        eef = kin.x[self.hand_body] + maths.quat_rotate(
            kin.quat[self.hand_body], self.eef_offset
        )
        cubeA_pos = q[self.aq : self.aq + 3]
        cubeB_pos = q[self.bq : self.bq + 3]
        lf = kin.x[self.lf_body]
        rf = kin.x[self.rf_body]

        d = jnp.linalg.norm(cubeA_pos - eef)
        d_lf = jnp.linalg.norm(cubeA_pos - lf)
        d_rf = jnp.linalg.norm(cubeA_pos - rf)
        dist_reward = 1.0 - jnp.tanh(10.0 * (d + d_lf + d_rf) / 3.0)

        cubeA_height = cubeA_pos[2] - self.table_height
        lifted = (cubeA_height - self.cubeA_size) > 0.04
        lift_reward = lifted.astype(jnp.float32)

        offset = jnp.array([0.0, 0.0, (self.cubeA_size + self.cubeB_size) / 2])
        d_ab = jnp.linalg.norm(cubeB_pos - cubeA_pos + offset)
        align_reward = (1.0 - jnp.tanh(10.0 * d_ab)) * lifted
        dist_reward = jnp.maximum(dist_reward, align_reward)

        target_height = self.cubeB_size + self.cubeA_size / 2
        aligned = jnp.linalg.norm((cubeB_pos - cubeA_pos)[:2]) < 0.02
        on_top = jnp.abs(cubeA_height - target_height) < 0.02
        away = d > 0.04
        stack = aligned & on_top & away

        rewards = jnp.where(
            stack,
            self.r_stack_scale,
            self.r_dist_scale * dist_reward
            + self.r_lift_scale * lift_reward
            + self.r_align_scale * align_reward,
        )
        done = stack | (progress >= self.max_episode_length - 1)
        return rewards, done, {"stack": stack}

    def extra_outputs(self, q, qd, kin, sensors, task, actions, progress):
        """Stack-success flag (the reference ends the episode on stack,
        franka_cube_stack.py compute_franka_reward; exposing it as
        `successes` feeds the success-keyed parity eval)."""
        return {"successes": task["stack"].astype(jnp.float32)}

    def true_objective(self, q, qd):
        return q[self.aq + 2]
