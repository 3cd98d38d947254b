"""Generator registry: name -> (config class, init, apply, from_torch).

The analogue of the reference's hydra `model/generator` config group
(configs/model/generator/*.yaml) as a typed Python registry.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable


@dataclasses.dataclass(frozen=True)
class GeneratorDef:
    config_cls: type
    init: Callable
    apply: Callable
    from_torch: Callable | None = None
    # Optional explicit tensor-parallel PartitionSpec tree (mirrors init()'s
    # params); models without one fall back to the per-leaf heuristic
    # (parallel/mesh.py::infer_param_specs).
    param_specs: Callable | None = None


def _build() -> dict[str, GeneratorDef]:
    from vocoder_tpu.models import hifigan, vocos

    defs = {
        "hifigan": GeneratorDef(
            hifigan.HiFiGANConfig, hifigan.init, hifigan.apply, hifigan.from_torch_state_dict, hifigan.param_specs
        ),
        "vocos": GeneratorDef(
            vocos.VocosConfig, vocos.init, vocos.apply, vocos.from_torch_state_dict, vocos.param_specs
        ),
    }
    try:
        from vocoder_tpu.models import bigvgan

        defs["bigvgan"] = GeneratorDef(
            bigvgan.BigVGANConfig, bigvgan.init, bigvgan.apply, bigvgan.from_torch_state_dict, bigvgan.param_specs
        )
    except ImportError:
        pass
    try:
        from vocoder_tpu.models import refinegan

        defs["refinegan"] = GeneratorDef(
            refinegan.RefineGANConfig, refinegan.init, refinegan.apply, refinegan.from_torch_state_dict
        )
    except ImportError:
        pass
    try:
        from vocoder_tpu.models import firefly

        defs["firefly_gan_base"] = GeneratorDef(
            firefly.FireflyConfig, firefly.init, firefly.apply, firefly.from_torch_state_dict
        )
    except ImportError:
        pass
    return defs


_REGISTRY: dict[str, GeneratorDef] | None = None


def get_generator(name: str) -> GeneratorDef:
    global _REGISTRY
    if _REGISTRY is None:
        _REGISTRY = _build()
    if name not in _REGISTRY:
        raise KeyError(f"unknown generator {name!r}; available: {sorted(_REGISTRY)}")
    return _REGISTRY[name]


def available() -> list[str]:
    global _REGISTRY
    if _REGISTRY is None:
        _REGISTRY = _build()
    return sorted(_REGISTRY)
