"""HRL agent tests (reference learning/hrl_continuous.py): latent action
space, frozen LLC execution, llc_steps macro-transitions, training step."""
import jax
import jax.numpy as jnp
import numpy as np

from isaacgymenvs_tpu.learn import HRL, PPO
from isaacgymenvs_tpu.tasks import task_map


def _env(n=16):
    cfg = {
        "env": {"numEnvs": n, "clipActions": 1.0},
        "sim": {"dt": 1 / 60, "substeps": 2},
    }
    return task_map["Cartpole"](cfg)


TP = {
    "algo": {"name": "hrl_continuous"},
    "network": {"mlp": {"units": [32, 32]}},
    "config": {
        "horizon_length": 4,
        "minibatch_size": 32,
        "mini_epochs": 2,
        "llc_steps": 3,
        "latent_dim": 5,
        "llc_network": {"mlp": {"units": [16]}},
    },
}


def test_hrl_latent_action_space_and_macro_steps():
    env = _env()
    agent = HRL(env, TP, seed=0)
    ts = agent.init()
    # high-level policy emits latents, not env actions
    mu, log_sigma, v = agent.network.apply(ts.params["policy"], ts.obs)
    assert mu.shape == (16, 5)
    # one macro transition advances the env llc_steps times
    p0 = np.asarray(ts.env_state.progress).copy()
    es, obs, rew, done, ex = agent.env_step(
        ts.env_state, ts.obs, jnp.zeros((16, 5))
    )
    assert (np.asarray(es.progress) - p0 == 3).all() or bool(done.any())
    assert rew.shape == (16,) and "time_outs" in ex


def test_hrl_llc_checkpoint_roundtrip(tmp_path):
    # train a tiny PPO on cartpole, save, load as frozen LLC
    env = _env()
    llc_tp = {
        "network": {"mlp": {"units": [16]}},
        "config": {"horizon_length": 4, "minibatch_size": 32,
                   "mini_epochs": 1},
    }
    llc = PPO(env, llc_tp, seed=1)
    llc_ts = llc.init()
    path = str(tmp_path / "llc.ckpt")
    llc.save(path, llc_ts)
    # llc input = llc_obs_dim + latent_dim must match the checkpoint net:
    # cartpole obs 4 -> llc_obs_dim 4, so latent_dim must be 0-padded;
    # use a latent_dim that the saved net was NOT built with -> restrict
    # llc_obs_dim so dims line up: 4(obs trained) = llc_obs_dim + latent
    tp = {k: (dict(v) if isinstance(v, dict) else v) for k, v in TP.items()}
    tp["config"] = dict(TP["config"])
    tp["config"].update(
        llc_checkpoint=path, latent_dim=2, llc_obs_dim=2,
        llc_network={"mlp": {"units": [16]}},
        # a plain-PPO checkpoint is an ActorCritic on obs++latent: use the
        # concat LLC style (amp_latent checkpoints come from a
        # latent-conditioned trainer)
        llc_style="concat",
    )
    agent = HRL(env, tp, seed=0)
    ts = agent.init()
    es, obs, rew, done, ex = agent.env_step(
        ts.env_state, ts.obs, jnp.zeros((16, 2))
    )
    assert np.isfinite(np.asarray(rew)).all()


def test_hrl_train_epoch_runs():
    env = _env()
    agent = HRL(env, TP, seed=0)
    ts = agent.init()
    ts, metrics = agent._train_epoch(ts)
    assert np.isfinite(float(metrics["kl"]))
    assert np.isfinite(float(metrics["a_loss"]))


def test_amp_latent_llc_is_style_conditioned():
    """The default LLC is the ASE-style latent-conditioned actor: its
    output depends on the (normalized) latent direction, and latents are
    unit-normalized before conditioning (reference hrl_continuous.py:148
    z = normalize(actions))."""
    env = _env(4)
    agent = HRL(env, TP, seed=0)
    obs = jnp.ones((4, env.num_obs))
    z1 = jnp.zeros((4, 5)).at[:, 0].set(1.0)
    z2 = jnp.zeros((4, 5)).at[:, 1].set(1.0)
    a1 = agent._llc_action(obs, z1)
    a2 = agent._llc_action(obs, z2)
    assert not np.allclose(np.asarray(a1), np.asarray(a2))
    # scale invariance: z and 10z give the same action (normalization)
    a3 = agent._llc_action(obs, 10.0 * z1)
    assert np.allclose(np.asarray(a1), np.asarray(a3), atol=1e-6)
