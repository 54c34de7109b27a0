"""PBT hyperparameter mutation.

Mirrors reference isaacgymenvs/pbt/mutation.py:33-103: multiply/divide by
U[change_min, change_max] with special-cased clamps for e_clip,
mini_epochs and discount factors; the mutation scheme is a YAML mapping
param-path -> mutation function name (cfg/pbt/mutation/*.yaml).
"""
from __future__ import annotations

import copy
import random
from typing import Any, Dict


def mutate_float(x, change_min=1.1, change_max=1.5):
    perturb = random.uniform(change_min, change_max)
    return x / perturb if random.random() < 0.5 else x * perturb


def mutate_float_min_1(x, **kwargs):
    return max(1.0, mutate_float(x, **kwargs))


def mutate_eps_clip(x, **kwargs):
    return min(0.3, max(0.01, mutate_float(x, **kwargs)))


def mutate_mini_epochs(x, **kwargs):
    new = x + 1 if random.random() < 0.5 else x - 1
    return int(min(8, max(1, new)))


def mutate_discount(x, **kwargs):
    """Mutate 1-gamma conservatively (reference mutation.py:64-72)."""
    return 1.0 - mutate_float(1.0 - x, change_min=1.1, change_max=1.2)


_FUNCS = {
    "mutate_float": mutate_float,
    "mutate_float_min_1": mutate_float_min_1,
    "mutate_eps_clip": mutate_eps_clip,
    "mutate_mini_epochs": mutate_mini_epochs,
    "mutate_discount": mutate_discount,
}


def get_mutation_func(name: str):
    return _FUNCS[name]


def mutate(
    params: Dict[str, Any],
    mutations: Dict[str, str],
    mutation_rate: float,
    change_min: float,
    change_max: float,
) -> Dict[str, Any]:
    """(reference mutation.py:81-103)"""
    out = copy.deepcopy(params)
    for param, value in params.items():
        if random.random() > mutation_rate:
            continue
        if isinstance(value, str):
            # YAML 1.1 parses bare scientific notation (3e-4) as a string
            try:
                value = float(value)
            except ValueError:
                continue
        fn = get_mutation_func(mutations[param])
        out[param] = fn(value, change_min=change_min, change_max=change_max)
    return out
