"""rl_games checkpoint import (utils/rlgames_compat.py): a synthetic
.pth with the rl_games A2C naming/layout converts onto our ActorCritic
and produces identical policy outputs to a torch forward pass."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from isaacgymenvs_tpu.learn import PPO
from isaacgymenvs_tpu.tasks import task_map
from isaacgymenvs_tpu.utils.rlgames_compat import (
    convert_into_train_state,
    load_rlgames_state_dict,
)

UNITS = (32, 16)
OBS, ACTS = 4, 1  # Cartpole


def _torch_a2c(units, obs_dim, act_dim):
    """The stock rl_games continuous A2C MLP (fixed sigma, shared trunk)
    with its state-dict naming."""
    import torch.nn as nn

    class Net(nn.Module):
        def __init__(self):
            super().__init__()
            layers, inp = [], obs_dim
            for u in units:
                layers += [nn.Linear(inp, u), nn.ELU()]
                inp = u
            self.actor_mlp = nn.Sequential(*layers)
            self.mu = nn.Linear(inp, act_dim)
            self.value = nn.Linear(inp, 1)
            self.sigma = nn.Parameter(torch.full((act_dim,), -0.7))

        def forward(self, x):
            t = self.actor_mlp(x)
            return self.mu(t), self.sigma, self.value(t)

    return Net()


def test_roundtrip_matches_torch_forward(tmp_path):
    torch.manual_seed(3)
    net = _torch_a2c(UNITS, OBS, ACTS)
    n_count = 12345.0
    sd = {f"a2c_network.{k}": v for k, v in net.state_dict().items()}
    sd["running_mean_std.running_mean"] = torch.arange(OBS).float()
    sd["running_mean_std.running_var"] = torch.ones(OBS) * 2.0
    sd["running_mean_std.count"] = torch.tensor(n_count)
    sd["value_mean_std.running_mean"] = torch.tensor([1.5])
    sd["value_mean_std.running_var"] = torch.tensor([4.0])
    sd["value_mean_std.count"] = torch.tensor(n_count)
    pth = str(tmp_path / "Cartpole.pth")
    torch.save({"model": sd, "epoch": 7, "frame": 9000}, pth)

    cfg = {
        "env": {"numEnvs": 2, "clipActions": 1.0},
        "sim": {"dt": 1 / 60, "substeps": 2},
    }
    env = task_map["Cartpole"](cfg)
    agent = PPO(
        env,
        {"network": {"mlp": {"units": list(UNITS)}},
         "config": {"horizon_length": 4, "minibatch_size": 8}},
        seed=0,
    )
    ts = agent.init()
    loaded = load_rlgames_state_dict(pth)
    ts, epoch = convert_into_train_state(agent, ts, loaded)
    assert epoch == 7

    x = np.random.RandomState(0).randn(5, OBS).astype(np.float32)
    with torch.no_grad():
        t_mu, t_sigma, t_val = net(torch.from_numpy(x))
    j_mu, j_logsig, j_val = agent.network.apply(
        ts.params["policy"], jnp.asarray(x)
    )
    np.testing.assert_allclose(np.asarray(j_mu), t_mu.numpy(), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(j_logsig)[0], t_sigma.detach().numpy(), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(j_val), t_val.numpy()[:, 0], atol=1e-5
    )
    # normalizer stats carried over
    np.testing.assert_allclose(np.asarray(ts.obs_rms.mean), np.arange(OBS))
    np.testing.assert_allclose(float(ts.value_rms.mean), 1.5)
    np.testing.assert_allclose(float(ts.obs_rms.count), n_count)


def test_shape_mismatch_raises(tmp_path):
    torch.manual_seed(0)
    net = _torch_a2c((8,), OBS, ACTS)  # wrong width
    sd = {f"a2c_network.{k}": v for k, v in net.state_dict().items()}
    pth = str(tmp_path / "bad.pth")
    torch.save({"model": sd, "epoch": 1}, pth)

    cfg = {
        "env": {"numEnvs": 2, "clipActions": 1.0},
        "sim": {"dt": 1 / 60, "substeps": 2},
    }
    env = task_map["Cartpole"](cfg)
    agent = PPO(
        env,
        {"network": {"mlp": {"units": list(UNITS)}},
         "config": {"horizon_length": 4, "minibatch_size": 8}},
        seed=0,
    )
    ts = agent.init()
    loaded = load_rlgames_state_dict(pth)
    with pytest.raises(ValueError, match="linear layers|shape"):
        convert_into_train_state(agent, ts, loaded)
