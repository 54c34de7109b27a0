"""rl_games checkpoint import: migrate reference-trained policies.

A user of the reference trains with rl_games and holds `.pth` checkpoints
(saved by rl_games' A2CAgent: {'model': state_dict, 'epoch', 'frame', ...};
resumed via `checkpoint=` -- reference train.py:106-108). This module maps
that state dict onto this framework's flax parameters + running-stat
normalizers so the policy can be evaluated (`test=True`) or fine-tuned
here without retraining.

Covered: the stock continuous A2C MLP network (rl_games builder
`a2c_network`: actor_mlp trunk [+ separate critic_mlp], mu/value heads,
fixed-sigma parameter, running_mean_std + value_mean_std normalizers) --
the architecture every reference *PPO.yaml trains. Recurrent (LSTM) and
central-value networks raise with a clear message.

Torch is used only to deserialize the file (CPU); no torch code runs in
the training path.
"""
from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
import numpy as np

from ..learn.running_stats import RunningMeanStd

__all__ = [
    "load_rlgames_state_dict",
    "map_a2c_params",
    "map_rms",
    "convert_into_train_state",
]


def load_rlgames_state_dict(pth_path: str) -> Dict[str, Any]:
    """Load an rl_games .pth checkpoint to numpy (CPU, weights only)."""
    import torch

    ck = torch.load(pth_path, map_location="cpu", weights_only=False)
    if not isinstance(ck, dict) or "model" not in ck:
        raise ValueError(
            f"{pth_path} is not an rl_games checkpoint (no 'model' key); "
            f"got keys {sorted(ck) if isinstance(ck, dict) else type(ck)}"
        )
    sd = {k: v.detach().cpu().numpy() for k, v in ck["model"].items()}
    meta = {k: ck.get(k) for k in ("epoch", "frame") if k in ck}
    return {"state_dict": sd, **meta}


def _mlp_layers(sd: Dict[str, np.ndarray], prefix: str):
    """Ordered (weight, bias) pairs of `<prefix>.<idx>.weight` torch
    Linear entries (rl_games MLPs are nn.Sequential with activations at
    odd indices, so only .weight-bearing indices count)."""
    idxs = sorted(
        int(k[len(prefix) + 1 :].split(".")[0])
        for k in sd
        if k.startswith(prefix + ".") and k.endswith(".weight")
    )
    return [
        (sd[f"{prefix}.{i}.weight"], sd[f"{prefix}.{i}.bias"]) for i in idxs
    ]


def _fill_mlp(tree: Dict[str, Any], layers, where: str):
    # numeric sort: lexicographic order breaks at fc10 (fc0, fc1, fc10,
    # fc2, ...) and would silently scramble uniform-width networks
    fcs = sorted(
        (k for k in tree if k.startswith("fc")),
        key=lambda k: int(k[2:] or 0),
    )
    if len(fcs) != len(layers):
        raise ValueError(
            f"{where}: checkpoint has {len(layers)} linear layers, the "
            f"configured network has {len(fcs)} ({fcs}) -- pass the train "
            f"config the policy was trained with"
        )
    for name, (w, b) in zip(fcs, layers):
        kern = tree[name]["kernel"]
        if kern.shape != w.T.shape:
            raise ValueError(
                f"{where}.{name}: shape {w.T.shape} in checkpoint vs "
                f"{kern.shape} configured"
            )
        tree[name]["kernel"] = jnp.asarray(w.T)
        tree[name]["bias"] = jnp.asarray(b)


def map_a2c_params(sd: Dict[str, np.ndarray], params: Dict[str, Any]):
    """Map rl_games `a2c_network.*` entries onto an ActorCritic params
    pytree (learn/networks.py naming). Returns a new params dict."""
    import copy

    if any(".rnn" in k or "a2c_network.lstm" in k for k in sd):
        raise NotImplementedError(
            "recurrent rl_games checkpoints are not supported by the "
            "converter (retrain with train=<Task>PPOLSTM here)"
        )
    if "central" in params:
        # asymmetric-critic agents carry a separate central-value net the
        # rl_games checkpoint stores OUTSIDE a2c_network.* -- converting
        # only the policy would silently resume with a random critic
        raise NotImplementedError(
            "central-value (asymmetric critic) checkpoints are not "
            "supported by the converter: the agent's central value net "
            "would be left randomly initialized. Import for test/play "
            "with a symmetric train config, or retrain here."
        )
    params = copy.deepcopy(
        {"policy": {"params": _to_mutable(params["policy"]["params"])}}
    )
    tree = params["policy"]["params"]

    _fill_mlp(tree["actor_mlp"], _mlp_layers(sd, "a2c_network.actor_mlp"),
              "actor_mlp")
    if "critic_mlp" in tree:
        crit = _mlp_layers(sd, "a2c_network.critic_mlp")
        if not crit:
            raise ValueError(
                "configured network is separate=True but the checkpoint "
                "has no critic_mlp"
            )
        _fill_mlp(tree["critic_mlp"], crit, "critic_mlp")

    for head in ("mu", "value"):
        w = sd[f"a2c_network.{head}.weight"]
        b = sd[f"a2c_network.{head}.bias"]
        if tree[head]["kernel"].shape != w.T.shape:
            raise ValueError(
                f"{head}: shape {w.T.shape} in checkpoint vs "
                f"{tree[head]['kernel'].shape} configured"
            )
        tree[head]["kernel"] = jnp.asarray(w.T)
        tree[head]["bias"] = jnp.asarray(b)

    if "log_sigma" in tree:
        sig = sd.get("a2c_network.sigma")
        if sig is None:
            raise ValueError("checkpoint has no a2c_network.sigma")
        tree["log_sigma"] = jnp.asarray(sig)
    return params


def map_rms(sd: Dict[str, np.ndarray], prefix: str) -> RunningMeanStd:
    """rl_games RunningMeanStd buffers -> our struct (same semantics)."""
    mean = sd[f"{prefix}.running_mean"]
    var = sd[f"{prefix}.running_var"]
    count = sd[f"{prefix}.count"]
    squeeze = mean.shape == (1,)
    return RunningMeanStd(
        mean=jnp.asarray(mean[0] if squeeze else mean, jnp.float32),
        var=jnp.asarray(var[0] if squeeze else var, jnp.float32),
        count=jnp.asarray(np.float32(count)).reshape(()),
    )


def _to_mutable(tree):
    if isinstance(tree, dict) or hasattr(tree, "items"):
        return {k: _to_mutable(v) for k, v in tree.items()}
    return tree


def convert_into_train_state(agent, ts, loaded: Dict[str, Any]):
    """Fill a freshly-initialized PPOTrainState with the rl_games policy:
    params + obs/value normalizers (optimizer state stays fresh -- Adam
    moments don't transfer across frameworks). Returns (ts, epoch)."""
    sd = loaded["state_dict"]
    new_params = map_a2c_params(sd, ts.params)
    ts = ts.replace(params={**_to_mutable(ts.params), **new_params})
    if any(k.startswith("running_mean_std.") for k in sd):
        ts = ts.replace(obs_rms=map_rms(sd, "running_mean_std"))
    if any(k.startswith("value_mean_std.") for k in sd):
        ts = ts.replace(value_rms=map_rms(sd, "value_mean_std"))
    return ts, int(loaded.get("epoch", 0) or 0)
