"""Minimal yacs/fvcore-style CfgNode: a dict with attribute access, nested
auto-conversion, YAML merge, opts merge, and freeze semantics — the surface
the reference's config layer uses (architecture/utils/config.py,
projects/TemporalStereo/config.py)."""
from __future__ import annotations

import copy
from typing import Any


class CfgNode(dict):
    def __init__(self, init_dict=None):
        init_dict = {} if init_dict is None else dict(init_dict)
        for k, v in init_dict.items():
            if isinstance(v, dict) and not isinstance(v, CfgNode):
                init_dict[k] = type(self)(v)
        super().__init__(init_dict)
        object.__setattr__(self, "_frozen", False)

    # ------------------------------------------------------- attribute API
    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError:
            raise AttributeError(name)

    def __setattr__(self, name: str, value: Any) -> None:
        if getattr(self, "_frozen", False):
            raise AttributeError(
                f"CfgNode is frozen; cannot set {name}")
        if isinstance(value, dict) and not isinstance(value, CfgNode):
            value = type(self)(value)
        self[name] = value

    # --------------------------------------------------------------- merge
    def merge_from_file(self, filename: str) -> None:
        import yaml

        with open(filename) as f:
            loaded = yaml.safe_load(f)
        self._merge(type(self)(loaded or {}))

    def merge_from_other_cfg(self, other: "CfgNode") -> None:
        self._merge(other)

    def merge_from_list(self, opts) -> None:
        assert len(opts) % 2 == 0, opts
        for key, value in zip(opts[0::2], opts[1::2]):
            node = self
            parts = key.split(".")
            for p in parts[:-1]:
                node = node[p]
            old = node.get(parts[-1])
            if isinstance(value, str) and old is not None \
                    and not isinstance(old, str):
                import ast

                value = ast.literal_eval(value)
            node[parts[-1]] = value

    def _merge(self, other: "CfgNode") -> None:
        for k, v in other.items():
            if (k in self and isinstance(self[k], CfgNode)
                    and isinstance(v, dict)):
                self[k]._merge(type(self)(v))
            else:
                self[k] = v

    # -------------------------------------------------------------- freeze
    def freeze(self) -> None:
        object.__setattr__(self, "_frozen", True)
        for v in self.values():
            if isinstance(v, CfgNode):
                v.freeze()

    def defrost(self) -> None:
        object.__setattr__(self, "_frozen", False)
        for v in self.values():
            if isinstance(v, CfgNode):
                v.defrost()

    def is_frozen(self) -> bool:
        return getattr(self, "_frozen", False)

    def clone(self) -> "CfgNode":
        return copy.deepcopy(self)

    def __deepcopy__(self, memo):
        new = type(self)()
        memo[id(self)] = new
        for k, v in self.items():
            dict.__setitem__(new, k, copy.deepcopy(v, memo))
        return new

    def __repr__(self) -> str:
        return f"CfgNode({dict.__repr__(self)})"
