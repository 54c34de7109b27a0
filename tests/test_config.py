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
