"""ShadowHand-specific checks: hand pose, object-on-palm settling, goal
resampling on success, obs schemes."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isaacgymenvs_tpu.tasks import task_map


def make(obs_type="full_state", n=2, **env_kw):
    cfg = {
        "env": {
            "numEnvs": n,
            "clipActions": 1.0,
            "clipObservations": 5.0,
            "observationType": obs_type,
            **env_kw,
        },
        "sim": {"dt": 1 / 60, "substeps": 2},
    }
    return task_map["ShadowHand"](cfg)


@pytest.mark.parametrize(
    "obs_type,dim",
    [("openai", 42), ("full_no_vel", 77), ("full", 157), ("full_state", 211)],
)
def test_obs_schemes(obs_type, dim):
    env = make(obs_type)
    assert env.num_obs == dim
    state, obs = env.reset(jax.random.PRNGKey(0))
    assert obs.shape == (2, dim)
    assert np.isfinite(np.asarray(obs)).all()


def test_object_rests_on_palm():
    env = make()
    state, obs = env.reset(jax.random.PRNGKey(1))
    step = jax.jit(env.step)
    for _ in range(60):
        state, obs, rew, done, ex = step(state, jnp.zeros((2, 20)))
    oq = env.obj_q
    z = np.asarray(state.sim.q[:, oq + 2])
    # falls from 0.6 onto the palm (~0.51-0.55), not through it
    assert (z > 0.45).all() and (z < 0.58).all(), z
    assert not bool(np.asarray(done).any())


def test_goal_resampled_on_success():
    env = make()
    state, obs = env.reset(jax.random.PRNGKey(2))
    # force object orientation to exactly match the goal -> success
    goal = state.task["goal_rot"]
    oq = env.obj_q
    q = state.sim.q.at[:, oq + 3 : oq + 7].set(goal)
    state = state.replace(sim=state.sim.replace(q=q))
    step = jax.jit(env.step)
    state, obs, rew, done, ex = step(state, jnp.zeros((2, 20)))
    # big reach-goal bonus in the reward
    assert (np.asarray(rew) > 100).all()
    assert np.asarray(state.task["successes"]).min() >= 1
    # goal was re-sampled (differs from the matched one)
    new_goal = np.asarray(state.task["goal_rot"])
    dot = np.abs(np.sum(new_goal * np.asarray(goal), axis=-1))
    assert (dot < 0.999).all()


def test_fall_triggers_reset():
    env = make()
    state, obs = env.reset(jax.random.PRNGKey(3))
    oq = env.obj_q
    q = state.sim.q.at[:, oq + 2].set(0.2)  # far below the goal
    state = state.replace(sim=state.sim.replace(q=q))
    step = jax.jit(env.step)
    state, obs, rew, done, ex = step(state, jnp.zeros((2, 20)))
    assert bool(np.asarray(done).all())


def test_consecutive_success_counting_and_max_reset():
    """Consecutive successes accumulate across goal-only resets and the
    episode ends at maxConsecutiveSuccesses (reference
    compute_hand_reward shadow_hand.py:746 + :380-384 semantics)."""
    env = make(maxConsecutiveSuccesses=2)
    state, obs = env.reset(jax.random.PRNGKey(5))
    step = jax.jit(env.step)
    oq = env.obj_q

    def force_goal(state):
        goal = state.task["goal_rot"]
        q = state.sim.q.at[:, oq + 3: oq + 7].set(goal)
        return state.replace(sim=state.sim.replace(q=q))

    # success #1: counts, episode continues (goal-only reset)
    state = force_goal(state)
    state, obs, rew, done, ex = step(state, jnp.zeros((2, 20)))
    assert np.asarray(state.task["successes"]).min() >= 1
    assert not bool(np.asarray(done).any())
    # success #2: hits maxConsecutiveSuccesses -> episode ends
    state = force_goal(state)
    state, obs, rew, done, ex = step(state, jnp.zeros((2, 20)))
    assert bool(np.asarray(done).all()), np.asarray(state.task["successes"])
    # the consecutive-success stat is surfaced for the eval printer
    assert "consecutive_successes" in ex
    # after the full reset the counter starts over
    state, obs, rew, done, ex = step(state, jnp.zeros((2, 20)))
    assert np.asarray(state.task["successes"]).max() == 0
