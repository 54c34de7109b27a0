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
from .factory_nut_bolt import FactoryTaskNutBoltPlace, FactoryTaskNutBoltScrew
from .factory_nut_bolt_pick import FactoryTaskNutBoltPick
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

task_map: Dict[str, Type[VecTask]] = {
    "AllegroHand": AllegroHand,
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
