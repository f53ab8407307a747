"""Registry-by-name dispatch.

The reference drives module construction from python-dict configs with a
``type=`` key resolved through per-category registries
(cf. /root/reference/mmdet/utils/registry.py, mmdet/models/registry.py:3-11).
We keep that public behavior — configs say ``dict(type='ResNet', depth=50)``
— with a fresh, minimal implementation.
"""

from __future__ import annotations

import inspect
from typing import Any, Callable, Dict, Optional


class Registry:
    """Maps a string name to a class (or factory callable)."""

    def __init__(self, name: str):
        self._name = name
        self._items: Dict[str, Callable] = {}

    @property
    def name(self) -> str:
        return self._name

    @property
    def items(self) -> Dict[str, Callable]:
        return dict(self._items)

    def get(self, key: str) -> Optional[Callable]:
        return self._items.get(key)

    def __contains__(self, key: str) -> bool:
        return key in self._items

    def __repr__(self) -> str:
        return f"Registry({self._name}, items={sorted(self._items)})"

    def register(self, obj: Callable = None, *, name: str = None):
        """Use as ``@REG.register`` or ``@REG.register(name='Alias')``."""
        if obj is None:
            return lambda o: self.register(o, name=name)
        key = name or obj.__name__
        if key in self._items:
            raise KeyError(f"{key} already registered in {self._name}")
        self._items[key] = obj
        return obj

    # The reference calls this decorator `register_module`; keep the alias.
    def register_module(self, obj: Callable = None, *, name: str = None):
        return self.register(obj, name=name)


def build_from_cfg(cfg: Dict[str, Any], registry: Registry, default_args: Dict = None):
    """Instantiate ``registry[cfg['type']](**cfg_without_type, **default_args)``."""
    if not isinstance(cfg, dict) or "type" not in cfg:
        raise TypeError(f"cfg must be a dict with a 'type' key, got {cfg!r}")
    args = dict(cfg)
    obj_type = args.pop("type")
    if isinstance(obj_type, str):
        obj_cls = registry.get(obj_type)
        if obj_cls is None:
            raise KeyError(f"{obj_type} is not registered in {registry.name}")
    elif inspect.isclass(obj_type) or callable(obj_type):
        obj_cls = obj_type
    else:
        raise TypeError(f"type must be a str or callable, got {type(obj_type)}")
    if default_args:
        for k, v in default_args.items():
            args.setdefault(k, v)
    return obj_cls(**args)


# Global registries mirroring the reference's category split
# (/root/reference/mmdet/models/registry.py:3-11).
BACKBONES = Registry("backbone")
NECKS = Registry("neck")
EXTRA_NECKS = Registry("extra_neck")
PANOPTIC = Registry("panoptic")
ROI_EXTRACTORS = Registry("roi_extractor")
SHARED_HEADS = Registry("shared_head")
HEADS = Registry("head")
LOSSES = Registry("loss")
DETECTORS = Registry("detector")
DATASETS = Registry("dataset")
PIPELINES = Registry("pipeline")
