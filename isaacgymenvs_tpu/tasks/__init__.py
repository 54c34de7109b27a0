"""Task registry: string -> VecTask subclass.

Mirrors the reference's isaacgym_task_map
(reference isaacgymenvs/tasks/__init__.py:88-114).
"""
from __future__ import annotations

from typing import Dict, Type

from ..envcore.vec_task import VecTask
from .allegro_hand import AllegroHand
from .allegro_kuka import (
    AllegroKukaRegrasping,
    AllegroKukaReorientation,
    AllegroKukaThrow,
)
from .allegro_hand_dextreme import (
    AllegroHandDextremeADR,
    AllegroHandDextremeManualDR,
)
from .ant import Ant
from .anymal import Anymal
from .anymal_terrain import AnymalTerrain
from .ball_balance import BallBalance
from .cartpole import Cartpole
from .factory_nut_bolt import (
    FactoryTaskNutBoltPick,
    FactoryTaskNutBoltPlace,
    FactoryTaskNutBoltScrew,
)
from .franka_cabinet import FrankaCabinet
from .franka_cube_stack import FrankaCubeStack
from .humanoid import Humanoid
from .humanoid_amp import HumanoidAMP
from .allegro_kuka_two_arms import (
    AllegroKukaTwoArmsRegrasping,
    AllegroKukaTwoArmsReorientation,
)
from .factory_templates import FactoryTaskGears, FactoryTaskInsertion
from .industreal_gears_insert import IndustRealTaskGearsInsert
from .industreal_pegs_insert import IndustRealTaskPegsInsert
from .ingenuity import Ingenuity
from .quadcopter import Quadcopter
from .trifinger import Trifinger
from .shadow_hand import ShadowHand

def resolve_allegro_kuka(cfg, *args, **kwargs):
    """Reference resolve_allegro_kuka (tasks/__init__.py:60-72):
    `task=AllegroKuka` dispatches on cfg.env.subtask."""
    subtask_map = dict(
        reorientation=AllegroKukaReorientation,
        regrasping=AllegroKukaRegrasping,
        throw=AllegroKukaThrow,
    )
    name = (cfg.get("env") or {}).get("subtask") or "reorientation"
    if name not in subtask_map:
        raise ValueError(f"Unknown subtask={name} in {sorted(subtask_map)}")
    return subtask_map[name](cfg, *args, **kwargs)


def resolve_allegro_kuka_two_arms(cfg, *args, **kwargs):
    """Reference resolve_allegro_kuka_two_arms (tasks/__init__.py:74-85)."""
    subtask_map = dict(
        reorientation=AllegroKukaTwoArmsReorientation,
        regrasping=AllegroKukaTwoArmsRegrasping,
    )
    name = (cfg.get("env") or {}).get("subtask") or "reorientation"
    if name not in subtask_map:
        raise ValueError(f"Unknown subtask={name} in {sorted(subtask_map)}")
    return subtask_map[name](cfg, *args, **kwargs)


task_map: Dict[str, Type[VecTask]] = {
    "AllegroHand": AllegroHand,
    # reference registry entries resolving the subtask from cfg.env.subtask
    "AllegroKuka": resolve_allegro_kuka,
    "AllegroKukaTwoArms": resolve_allegro_kuka_two_arms,
    "AllegroKukaReorientation": AllegroKukaReorientation,
    "AllegroKukaRegrasping": AllegroKukaRegrasping,
    "AllegroKukaThrow": AllegroKukaThrow,
    "AllegroHandDextremeADR": AllegroHandDextremeADR,
    "AllegroHandDextremeManualDR": AllegroHandDextremeManualDR,
    # reference registry aliases (tasks/__init__.py:92-93)
    "AllegroHandADR": AllegroHandDextremeADR,
    "AllegroHandManualDR": AllegroHandDextremeManualDR,
    "Cartpole": Cartpole,
    "FactoryTaskNutBoltPick": FactoryTaskNutBoltPick,
    "FactoryTaskNutBoltPlace": FactoryTaskNutBoltPlace,
    "FactoryTaskNutBoltScrew": FactoryTaskNutBoltScrew,
    "FrankaCabinet": FrankaCabinet,
    "FrankaCubeStack": FrankaCubeStack,
    "AllegroKukaTwoArmsReorientation": AllegroKukaTwoArmsReorientation,
    "AllegroKukaTwoArmsRegrasping": AllegroKukaTwoArmsRegrasping,
    "FactoryTaskGears": FactoryTaskGears,
    "FactoryTaskInsertion": FactoryTaskInsertion,
    "IndustRealTaskGearsInsert": IndustRealTaskGearsInsert,
    "IndustRealTaskPegsInsert": IndustRealTaskPegsInsert,
    "Ant": Ant,
    "BallBalance": BallBalance,
    "Anymal": Anymal,
    "AnymalTerrain": AnymalTerrain,
    "Humanoid": Humanoid,
    "HumanoidAMP": HumanoidAMP,
    "Ingenuity": Ingenuity,
    "Quadcopter": Quadcopter,
    "ShadowHand": ShadowHand,
    "Trifinger": Trifinger,
}


def register(name: str):
    def deco(cls):
        task_map[name] = cls
        return cls

    return deco
