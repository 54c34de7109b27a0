"""Multi-chip sharding test on the virtual 8-device CPU mesh
(SURVEY.md section 4 item d): the FULL train step compiles and executes
with real env-axis sharding."""
import jax
import jax.numpy as jnp
import numpy as np

from isaacgymenvs_tpu.learn import PPO
from isaacgymenvs_tpu.parallel import make_mesh, shard_train_state
from isaacgymenvs_tpu.tasks import task_map


def test_sharded_train_epoch_runs():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    cfg = {
        "env": {"numEnvs": 32, "clipActions": 1.0},
        "sim": {"dt": 1 / 60, "substeps": 2},
    }
    env = task_map["Cartpole"](cfg)
    tp = {
        "network": {"mlp": {"units": [32, 32]}},
        "config": {"horizon_length": 4, "minibatch_size": 64, "mini_epochs": 2},
    }
    agent = PPO(env, tp, seed=0)
    mesh = make_mesh(8)
    ts = shard_train_state(agent.init(), mesh)
    # env-batched leaves sharded over 8 devices
    assert len(ts.obs.sharding.device_set) == 8
    with mesh:
        ts, metrics = agent._train_epoch(ts)
    kl = float(metrics["kl"])
    assert np.isfinite(kl)
    # params stay replicated after the update
    leaf = jax.tree.leaves(ts.params)[0]
    assert leaf.sharding.is_fully_replicated


def test_adr_env_state_shards():
    """EnvState.adr (AdrState): ranges replicate, worker modes shard."""
    from isaacgymenvs_tpu.parallel.sharding import env_state_sharding
    from isaacgymenvs_tpu.utils.config import load_config

    cfg = load_config(
        ["task=AllegroHandDextremeADR", "num_envs=32"]
    )["task"]
    env = task_map["AllegroHandDextremeADR"](cfg)
    state, obs = env.reset(jax.random.PRNGKey(0))
    mesh = make_mesh(8)
    state = jax.device_put(state, env_state_sharding(state, mesh))
    assert len(state.adr.worker_boundary.sharding.device_set) == 8
    assert state.adr.lo.sharding.is_fully_replicated
    with mesh:
        step = jax.jit(env.step)
        state, obs, rew, done, ex = step(state, jnp.zeros((32, 16)))
    assert np.isfinite(np.asarray(rew)).all()


def test_local_shuffle_sharded_epoch_no_rollout_allgather():
    """cfg local_shuffle: True -- the shard-local minibatch permutation
    (SCALING.md follow-up): the sharded epoch runs, learns on finite
    metrics, and its optimized HLO moves no rollout-sized all-gather
    (the global shuffle's dominant cross-device payload)."""
    cfg = {
        "env": {"numEnvs": 32, "clipActions": 1.0},
        "sim": {"dt": 1 / 60, "substeps": 2},
    }
    env = task_map["Cartpole"](cfg)
    tp = {
        "network": {"mlp": {"units": [32, 32]}},
        "config": {
            "horizon_length": 4,
            "minibatch_size": 64,
            "mini_epochs": 2,
            "local_shuffle": True,
        },
    }
    agent = PPO(env, tp, seed=0)
    mesh = make_mesh(8)
    agent._shuffle_shards = 8  # what train(mesh=...) sets
    ts = shard_train_state(agent.init(), mesh)
    with mesh:
        ts, metrics = agent._train_epoch(ts)
    assert np.isfinite(float(metrics["kl"]))
    assert jax.tree.leaves(ts.params)[0].sharding.is_fully_replicated

    # compare compiled collective traffic vs the global-shuffle epoch:
    # the local-shuffle program must not all-gather the rollout
    def allgather_bytes(local):
        tp2 = {
            "network": {"mlp": {"units": [32, 32]}},
            "config": {
                "horizon_length": 4,
                "minibatch_size": 64,
                "mini_epochs": 2,
                "local_shuffle": local,
            },
        }
        a = PPO(env, tp2, seed=0)
        a._shuffle_shards = 8 if local else 1
        t0 = shard_train_state(a.init(), mesh)
        with mesh:
            compiled = jax.jit(a.train_epoch).lower(t0).compile()
        txt = compiled.as_text()
        import re

        total = 0
        for m in re.finditer(r"f32\[([\d,]+)\][^\n]*all-gather", txt):
            dims = [int(d) for d in m.group(1).split(",") if d]
            n = 4
            for d in dims:
                n *= d
            total += n
        return total

    local_b = allgather_bytes(True)
    global_b = allgather_bytes(False)
    assert local_b < global_b / 4, (
        f"local shuffle should slash all-gather traffic: "
        f"{local_b} vs {global_b}"
    )


def test_local_shuffle_recurrent_epoch():
    """local_shuffle through the RECURRENT epoch (round-4 review fix:
    the flag was accepted but silently ignored): the shard-blocked
    permutation path is actually taken (different minibatch order than
    the global shuffle under the same seed), trains to finite metrics
    on a sharded mesh, and rejects non-divisible seq_minibatch."""
    import pytest
    from isaacgymenvs_tpu.learn import PPORecurrent

    cfg = {
        "env": {"numEnvs": 32, "clipActions": 1.0, "episodeLength": 50},
        "sim": {"dt": 1 / 60, "substeps": 2},
    }
    env = task_map["Cartpole"](cfg)

    def mk(local, shards):
        tp = {
            "network": {"mlp": {"units": [16]},
                        "rnn": {"units": 32, "before_mlp": False}},
            "config": {"horizon_length": 8, "minibatch_size": 64,
                       "mini_epochs": 2, "seq_length": 4,
                       "local_shuffle": local},
        }
        a = PPORecurrent(env, tp, seed=0)
        a._shuffle_shards = shards
        return a

    # sharded run with the blocked permutation: finite metrics
    mesh = make_mesh(8)
    agent = mk(True, 8)
    ts = shard_train_state(agent.init(), mesh)
    with mesh:
        ts, metrics = agent._train_epoch(ts)
    assert np.isfinite(float(jax.device_get(metrics)["kl"]))
    assert jax.tree.leaves(ts.params)[0].sharding.is_fully_replicated

    # the blocked path really is taken: same seed, different minibatch
    # order -> different params than the global-shuffle epoch
    a_loc, a_glob = mk(True, 8), mk(False, 1)
    t_loc, _ = a_loc._train_epoch(a_loc.init())
    t_glob, _ = a_glob._train_epoch(a_glob.init())
    diff = max(
        float(np.abs(np.asarray(x) - np.asarray(y)).max())
        for x, y in zip(
            jax.tree.leaves(t_loc.params), jax.tree.leaves(t_glob.params)
        )
    )
    assert diff > 0.0

    # divisibility validation: 8 shards cannot split seq_minibatch
    bad = mk(True, 5)  # 64/4 = 16 seqs per mb; 16 % 5 != 0
    with pytest.raises(ValueError, match="local_shuffle"):
        bad._train_epoch(bad.init())


def test_sharded_step_terrain_and_sdf_samplers():
    """Entry-sampled dyn paths under an env-sharded mesh: the
    heightfield (AnymalTerrain) and SDF (NutBoltPick) samplers run
    inside the sharded jitted step -- replicated grids, sharded query
    points -- and produce finite sharded outputs."""
    from isaacgymenvs_tpu.parallel.sharding import env_state_sharding
    from isaacgymenvs_tpu.utils.config import load_config

    mesh = make_mesh(8)
    for task, n in (("AnymalTerrain", 32), ("FactoryTaskNutBoltPick", 32)):
        cfg = load_config([f"task={task}", f"num_envs={n}"])["task"]
        cfg.setdefault("sim", {})["use_fused"] = True  # force fused math
        env = task_map[task](cfg)
        state, obs = env.reset(jax.random.PRNGKey(0))
        state = jax.device_put(state, env_state_sharding(state, mesh))
        with mesh:
            step = jax.jit(env.step)
            state, obs, rew, done, ex = step(
                state, jnp.zeros((n, env.num_acts)))
        assert np.isfinite(np.asarray(rew)).all()
        assert len(state.sim.q.sharding.device_set) == 8
