"""Config-system tests: resolver subset + overrides (reference schema,
SURVEY.md section 2.10)."""
import pytest

from isaacgymenvs_tpu.utils.config import apply_overrides, load_config, resolve


def test_interpolation_and_resolvers():
    cfg = {
        "seed": 42,
        "num_envs": "",
        "checkpoint": "",
        "task": {
            "env": {"numEnvs": "${resolve_default:512,${...num_envs}}"},
            "physics_engine": "${..physics_engine}",
        },
        "physics_engine": "physx",
        "train": {
            "params": {
                "seed": "${...seed}",
                "load_checkpoint": "${if:${...checkpoint},True,False}",
                "config": {"num_actors": "${....task.env.numEnvs}"},
            }
        },
    }
    out = resolve(cfg)
    assert out["task"]["env"]["numEnvs"] == 512
    assert out["task"]["physics_engine"] == "physx"
    assert out["train"]["params"]["seed"] == 42
    assert out["train"]["params"]["load_checkpoint"] is False
    assert out["train"]["params"]["config"]["num_actors"] == 512


def test_override_beats_default():
    cfg = load_config(["task=Ant", "num_envs=128", "seed=7"])
    assert cfg["task"]["env"]["numEnvs"] == 128
    assert cfg["train"]["params"]["seed"] == 7
    assert cfg["train"]["params"]["config"]["num_actors"] == 128
    # train config group resolved to AntPPO
    assert cfg["train"]["params"]["config"]["name"] == "Ant"


def test_dotted_override():
    cfg = load_config(
        ["task=Cartpole", "train.params.config.minibatch_size=1024",
         "task.env.episodeLength=123"]
    )
    assert cfg["train"]["params"]["config"]["minibatch_size"] == 1024
    assert cfg["task"]["env"]["episodeLength"] == 123


def test_unknown_task_raises():
    with pytest.raises(FileNotFoundError):
        load_config(["task=NoSuchTask"])


def test_defaults_merging_variants():
    """Hydra-style `defaults:` lists compose thin variant configs
    (reference AntSAC.yaml / AllegroHandFF.yaml / ShadowHandOpenAI_*)."""
    from isaacgymenvs_tpu.utils.config import load_config

    cfg = load_config(["task=ShadowHandOpenAI_FF", "num_envs=4"])
    t = cfg["task"]
    # base ShadowHand keys survive, variant deltas override
    assert t["name"] == "ShadowHand"
    assert t["env"]["observationType"] == "openai"
    assert t["env"]["controlFrequencyInv"] == 3
    assert t["env"]["objectType"] == "block"  # inherited from the base
    # chained defaults: LSTM variant on top of FF
    cfg2 = load_config(["task=ShadowHandOpenAI_LSTM"])
    assert cfg2["task"]["env"]["observationType"] == "openai"
    # train fallback: task=AntSAC resolves train/AntSAC.yaml (no AntSACPPO)
    cfg3 = load_config(["task=AntSAC"])
    assert cfg3["train"]["params"]["algo"]["name"] == "sac"
    # train defaults chain: OpenAI FF train inherits ShadowHandPPO + asym
    cfg4 = load_config(["task=ShadowHand", "train=ShadowHandOpenAI_FFPPO"])
    p = cfg4["train"]["params"]
    assert p["network"]["mlp"]["units"] == [400, 400, 200, 100]
    assert "central_value_config" in p["config"]
