"""yacs-style config system with detectron2-compatible key names.

The reference configures everything through detectron2's CfgNode + YAML
`_BASE_` inheritance + CLI `KEY VALUE` overrides (SURVEY §5.6; reference
cubercnn/config/config.py and configs/*.yaml). We keep the exact key schema
so the reference's YAML files and CLI commands carry over unchanged, but the
implementation is a small self-contained attribute-dict (no yacs/detectron2
dependency).
"""
from __future__ import annotations

import ast
import copy
import os
from typing import Any, List

import yaml

_FROZEN = "__frozen__"


class CfgNode(dict):
    """Attribute-access dict with freeze, YAML merge and _BASE_ inheritance."""

    def __init__(self, init: dict | None = None):
        super().__init__()
        object.__setattr__(self, _FROZEN, False)
        if init:
            for k, v in init.items():
                self[k] = CfgNode(v) if isinstance(v, dict) else v

    # -- attribute protocol -------------------------------------------------
    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name: str, value: Any) -> None:
        if getattr(self, _FROZEN):
            raise AttributeError(f"CfgNode is frozen; cannot set {name}")
        self[name] = CfgNode(value) if isinstance(value, dict) and not isinstance(value, CfgNode) else value

    # -- freezing ------------------------------------------------------------
    def freeze(self) -> "CfgNode":
        object.__setattr__(self, _FROZEN, True)
        for v in self.values():
            if isinstance(v, CfgNode):
                v.freeze()
        return self

    def defrost(self) -> "CfgNode":
        object.__setattr__(self, _FROZEN, False)
        for v in self.values():
            if isinstance(v, CfgNode):
                v.defrost()
        return self

    def clone(self) -> "CfgNode":
        return copy.deepcopy(self)

    # -- merging ---------------------------------------------------------
    def merge_from_other(self, other: dict) -> None:
        for k, v in other.items():
            if isinstance(v, dict) and isinstance(self.get(k), CfgNode):
                self[k].merge_from_other(v)
            else:
                self[k] = CfgNode(v) if isinstance(v, dict) else v

    def merge_from_file(self, path: str, allow_unsafe: bool = True) -> None:
        with open(path) as f:
            loaded = yaml.safe_load(f) or {}
        base = loaded.pop("_BASE_", None)
        if base:
            base_path = base if os.path.isabs(base) else os.path.join(os.path.dirname(path), base)
            self.merge_from_file(base_path)
        loaded.pop("VERSION", None)
        self.merge_from_other(_parse_strings(loaded))

    def merge_from_list(self, opts: List[str]) -> None:
        assert len(opts) % 2 == 0, f"override list must be key value pairs, got {opts}"
        for key, value in zip(opts[0::2], opts[1::2]):
            node = self
            parts = key.split(".")
            for p in parts[:-1]:
                node = node[p]
            node[parts[-1]] = _coerce(value)

    def dump(self) -> str:
        def plain(n):
            return {k: plain(v) if isinstance(v, CfgNode) else v for k, v in n.items()}
        return yaml.safe_dump(plain(self), sort_keys=True)


def _coerce(value: Any) -> Any:
    """Parse CLI string values: numbers, bools, tuples, python-list-strings
    (the reference passes e.g. loss_functions "['iou','z']" on the CLI)."""
    if not isinstance(value, str):
        return value
    try:
        return ast.literal_eval(value)
    except (ValueError, SyntaxError):
        return value


def _parse_strings(tree: Any) -> Any:
    """Recursively literal-eval string leaves that encode python values —
    yacs does this for tuple-valued YAML entries like "(a, b)" and the
    reference relies on it for DATASETS.TRAIN / IGNORE_NAMES."""
    if isinstance(tree, dict):
        return {k: _parse_strings(v) for k, v in tree.items()}
    if isinstance(tree, str) and tree[:1] in "([{'\"":
        return _coerce(tree)
    return tree


def get_cfg() -> CfgNode:
    """Default config tree: the detectron2 keys the reference exercises plus
    the Cube R-CNN extensions (reference cubercnn/config/config.py:4-187)."""
    from .defaults import build_default_cfg
    return build_default_cfg()


class StaticCfg:
    """Opaque config holder for flax module attributes.

    flax.linen converts dict-typed module attributes into FrozenDict, which
    loses CfgNode's attribute access. This wrapper is a plain object (flax
    treats it as a static leaf) that proxies attribute access to the
    underlying CfgNode. Hash/eq are by content digest so jit caching works.
    """

    def __init__(self, cfg):
        node = cfg._node if isinstance(cfg, StaticCfg) else cfg
        object.__setattr__(self, "_node", node)
        object.__setattr__(self, "_digest", node.dump() if hasattr(node, "dump") else repr(node))

    def __getattr__(self, name):
        val = getattr(self._node, name)
        if isinstance(val, CfgNode):
            return StaticCfg(val)
        return val

    def __contains__(self, k):
        return k in self._node

    def __hash__(self):
        return hash(self._digest)

    def __eq__(self, other):
        return isinstance(other, StaticCfg) and self._digest == other._digest
