"""AnymalTerrain curriculum behavior: level promotion/demotion across
episode boundaries (reference update_terrain_level
anymal_terrain.py:427-435)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isaacgymenvs_tpu.tasks import task_map
from isaacgymenvs_tpu.utils.config import load_config


def make(num_envs=8, episode_len=6):
    cfg = load_config(["task=AnymalTerrain", f"num_envs={num_envs}"])["task"]
    cfg["env"]["episodeLength"] = episode_len
    return task_map["AnymalTerrain"](cfg)


@pytest.mark.slow
def test_level_promotion_and_demotion_across_episodes():
    env = make()
    state, obs = env.reset(jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    lvl0 = np.asarray(state.task["level"]).copy()

    # teleport every robot a full terrain-cell away from its spawn: the
    # walked-distance check must PROMOTE on episode end
    far = state.task["origin"][:, :2] + jnp.array([env.grid.env_length, 0.0])
    q = state.sim.q.at[:, 0:2].set(far)
    state = state.replace(sim=state.sim.replace(q=q))
    done_seen = np.zeros(8, bool)
    lvl_after = np.asarray(state.task["level"]).copy()
    for _ in range(env.max_episode_length + 1):
        state, obs, rew, done, ex = step(state, jnp.zeros((8, 12)))
        d = np.asarray(done)
        # the level is promoted/demoted AT the done step (then carried
        # through resample_init); capture each env's first episode end
        post = np.asarray(state.task["level"])
        lvl_after = np.where(d & ~done_seen, post, lvl_after)
        done_seen |= d
    assert done_seen.all()
    expect = np.clip(lvl0 + 1, 0, env.num_levels - 1)
    assert (lvl_after == expect).all(), (lvl0, lvl_after)

    # second episode: robots stand still -> walked distance ~0 -> DEMOTE
    state2, obs = env.reset(jax.random.PRNGKey(1))
    lvl0 = np.asarray(state2.task["level"]).copy()
    done_seen = np.zeros(8, bool)
    lvl_after = lvl0.copy()
    for _ in range(env.max_episode_length + 1):
        state2, obs, rew, done, ex = step(state2, jnp.zeros((8, 12)))
        d = np.asarray(done)
        post = np.asarray(state2.task["level"])
        lvl_after = np.where(d & ~done_seen, post, lvl_after)
        done_seen |= d
    assert done_seen.all()
    # standing still can't promote; any env with a nonzero command and a
    # level > 0 demotes (clipped at 0)
    assert (lvl_after <= lvl0).all(), (lvl0, lvl_after)
    # the curriculum stat is surfaced for logging
    assert "terrain_level" in ex


@pytest.mark.slow
def test_push_robots_overwrites_base_velocity():
    """Every pushInterval global steps the base xy velocity is replaced
    with a U[-1,1] draw (reference push_robots anymal_terrain.py:437-439)."""
    cfg = load_config(["task=AnymalTerrain", "num_envs=4"])["task"]
    cfg["env"]["learn"]["pushInterval_s"] = (
        3 * cfg["sim"]["dt"] * 4  # push every 3rd env step (decimation 4)
    )
    env = task_map["AnymalTerrain"](cfg)
    assert env.push_interval == 3
    state, obs = env.reset(jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    a = jnp.zeros((4, env.num_acts))
    seen_push = False
    for i in range(1, 8):
        prev_qd = np.asarray(state.sim.qd[:, 0:2])
        state, obs, rew, done, ex = step(state, a)
        cur = np.asarray(state.sim.qd[:, 0:2])
        if int(np.asarray(state.frames)) % 3 == 0:
            # pushed this step: base xy velocity is a fresh U[-1,1] draw,
            # uncorrelated with physics -- check it is inside [-1,1]
            assert (np.abs(cur) <= 1.0 + 1e-6).all()
            seen_push = True
    assert seen_push
