"""Cartpole: the minimal exemplar task.

Parity target: reference isaacgymenvs/tasks/cartpole.py (obs layout :139-151,
reward/reset :180-196 compute_cartpole_reward, reset sampling :153-160,
effort control :162-168) and cfg/task/Cartpole.yaml.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..engine import SimParams
from ..envcore.vec_task import VecTask
from ..model import load_urdf
from ..utils.assets import asset_path


class Cartpole(VecTask):
    def __init__(self, cfg):
        self.reset_dist = float(cfg["env"].get("resetDist", 3.0))
        self.max_push_effort = float(cfg["env"].get("maxEffort", 400.0))
        cfg.setdefault("env", {}).setdefault("episodeLength", 500)
        self.num_obs = 4
        self.num_acts = 1
        super().__init__(cfg)

    def build_model(self):
        asset = self.cfg["env"].get("asset", {}).get(
            "assetFileName", "urdf/cartpole.urdf"
        )
        model = load_urdf(asset_path(asset), fix_base=True)
        # actor placed at z=2 (reference cartpole.py:97-99 pose.p.z = 2.0)
        model = model.replace(body_pos=model.body_pos.at[0, 2].set(2.0))
        return model, self.sim_params_from_cfg()

    def sample_init(self, rng):
        """positions ~ 0.2*(U-0.5), velocities ~ 0.5*(U-0.5) on both dofs
        (reference cartpole.py:154-156)."""
        kq, kv = jax.random.split(rng)
        q = 0.2 * (jax.random.uniform(kq, (2,)) - 0.5)
        qd = 0.5 * (jax.random.uniform(kv, (2,)) - 0.5)
        return q, qd, ()

    def compute_force(self, action, q, qd, task):
        # effort drive on the cart dof only (cartpole.py:162-168)
        qfrc = jnp.zeros(self.model.nv).at[0].set(action[0] * self.max_push_effort)
        return qfrc, jnp.zeros((self.model.nbody, 6))

    def observe(self, q, qd, kin, sensors, task, actions, progress):
        # [cart_pos, cart_vel, pole_angle, pole_vel] (cartpole.py:146-149)
        return jnp.stack([q[0], qd[0], q[1], qd[1]])

    def reward_done(self, obs, q, qd, kin, sensors, task, actions, progress):
        cart_pos, cart_vel, pole_angle, pole_vel = obs[0], obs[1], obs[2], obs[3]
        reward = (
            1.0
            - pole_angle * pole_angle
            - 0.01 * jnp.abs(cart_vel)
            - 0.005 * jnp.abs(pole_vel)
        )
        out = (jnp.abs(cart_pos) > self.reset_dist) | (
            jnp.abs(pole_angle) > jnp.pi / 2
        )
        reward = jnp.where(out, -2.0, reward)
        done = out | (progress >= self.max_episode_length - 1)
        return reward, done, task
