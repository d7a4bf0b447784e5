"""Name -> factory registries for models and datasets.

Equivalent capability to the reference's decorator registries
(`/root/reference/models/models.py:7-23`, `/root/reference/datasets/datasets.py:7-21`)
but with explicit error messages and introspection.
"""

from __future__ import annotations

import copy
from typing import Any, Callable, Dict


class Registry:
    def __init__(self, name: str):
        self.name = name
        self._entries: Dict[str, Callable[..., Any]] = {}

    def register(self, name: str) -> Callable[[Callable], Callable]:
        def deco(fn: Callable) -> Callable:
            if name in self._entries:
                raise KeyError(f"{self.name} registry already has an entry '{name}'")
            self._entries[name] = fn
            return fn

        return deco

    def get(self, name: str) -> Callable[..., Any]:
        if name not in self._entries:
            known = ", ".join(sorted(self._entries))
            raise KeyError(f"unknown {self.name} '{name}'; known: [{known}]")
        return self._entries[name]

    def make(self, spec: Dict[str, Any], **extra_args: Any) -> Any:
        """Build from a config spec ``{"name": ..., "args": {...}}``."""
        args = copy.deepcopy(spec.get("args", {}))
        args.update(extra_args)
        return self.get(spec["name"])(**args)

    def names(self):
        return sorted(self._entries)


MODELS = Registry("model")
DATASETS = Registry("dataset")
