"""A minimal yacs-compatible configuration node.

The reference stacks ~90 YAML files with ``_BASE_`` inheritance on top of a
yacs ``CfgNode`` (reference: mask2former/config.py, detectron2 yacs usage).
This is a dependency-free re-implementation of the subset the configs use:
attribute access, ``_BASE_`` file inheritance, ``merge_from_file``,
``merge_from_list`` CLI overrides, ``freeze``/``defrost`` and ``clone``.
"""

from __future__ import annotations

import ast
import copy
import os
from typing import Any, List

import yaml

_FROZEN = "__frozen__"
BASE_KEY = "_BASE_"


class CfgNode(dict):
    """dict with attribute access and yacs-style merge semantics."""

    def __init__(self, init_dict=None):
        super().__init__()
        object.__setattr__(self, _FROZEN, False)
        init_dict = init_dict or {}
        for k, v in init_dict.items():
            self[k] = self._to_node(v)

    @classmethod
    def _to_node(cls, v):
        if isinstance(v, dict) and not isinstance(v, CfgNode):
            return cls(v)
        return v

    # -- attribute access ----------------------------------------------------
    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError:
            raise AttributeError(name)

    def __setattr__(self, name: str, value: Any) -> None:
        if object.__getattribute__(self, _FROZEN):
            raise AttributeError(
                f"Attempted to set {name} to {value}, but CfgNode is frozen"
            )
        self[name] = self._to_node(value)

    # -- freeze --------------------------------------------------------------
    def freeze(self) -> None:
        object.__setattr__(self, _FROZEN, True)
        for v in self.values():
            if isinstance(v, CfgNode):
                v.freeze()

    def defrost(self) -> None:
        object.__setattr__(self, _FROZEN, False)
        for v in self.values():
            if isinstance(v, CfgNode):
                v.defrost()

    def is_frozen(self) -> bool:
        return object.__getattribute__(self, _FROZEN)

    def clone(self) -> "CfgNode":
        return copy.deepcopy(self)

    def __deepcopy__(self, memo):
        out = CfgNode()
        for k, v in self.items():
            out[k] = copy.deepcopy(v, memo)
        return out

    # -- merging -------------------------------------------------------------
    def merge_from_other_cfg(self, other: "CfgNode") -> None:
        _merge_a_into_b(other, self)

    def merge_from_file(self, cfg_filename: str, allow_unsafe: bool = True) -> None:
        loaded = _load_yaml_with_base(cfg_filename)
        _merge_a_into_b(CfgNode(loaded), self)

    def merge_from_list(self, cfg_list: List[str]) -> None:
        assert len(cfg_list) % 2 == 0, f"Override list has odd length: {cfg_list}"
        for full_key, v in zip(cfg_list[0::2], cfg_list[1::2]):
            keys = full_key.split(".")
            d = self
            for sub in keys[:-1]:
                assert sub in d, f"Non-existent key: {full_key}"
                d = d[sub]
            last = keys[-1]
            assert last in d, f"Non-existent key: {full_key}"
            d[last] = _decode_value(v, d[last], full_key)

    def dump(self) -> str:
        return yaml.safe_dump(_to_plain(self), sort_keys=True)

    def __repr__(self) -> str:  # pragma: no cover - debug helper
        return f"CfgNode({dict.__repr__(self)})"


def _to_plain(node):
    if isinstance(node, CfgNode):
        return {k: _to_plain(v) for k, v in node.items()}
    if isinstance(node, (list, tuple)):
        return [_to_plain(v) for v in node]
    return node


def _decode_value(value: str, original: Any, full_key: str) -> Any:
    try:
        parsed = ast.literal_eval(value)
    except (ValueError, SyntaxError):
        parsed = value
    if original is None:
        return parsed
    if isinstance(parsed, type(original)) or original is None:
        return parsed
    # permissive numeric / sequence coercions (yacs behavior)
    if isinstance(original, bool) and isinstance(parsed, int):
        return bool(parsed)
    if isinstance(original, float) and isinstance(parsed, int):
        return float(parsed)
    if isinstance(original, tuple) and isinstance(parsed, list):
        return tuple(parsed)
    if isinstance(original, list) and isinstance(parsed, tuple):
        return list(parsed)
    raise ValueError(
        f"Type mismatch ({type(original)} vs {type(parsed)}) for key {full_key}"
    )


def _merge_a_into_b(a: CfgNode, b: CfgNode) -> None:
    for k, v_a in a.items():
        if k in b and isinstance(b[k], CfgNode) and isinstance(v_a, (dict, CfgNode)):
            _merge_a_into_b(CfgNode._to_node(v_a), b[k])
        else:
            b[k] = CfgNode._to_node(copy.deepcopy(v_a))


class _CfgLoader(yaml.SafeLoader):
    """SafeLoader extended with the detectron2 ``!!python/object/apply:eval``
    idiom used by e.g. Base-ADE20K yaml (MIN_SIZE_TRAIN)."""


def _eval_constructor(loader, node):
    args = loader.construct_sequence(node)
    return eval(args[0])  # noqa: S307 - mirrors detectron2's config loader


_CfgLoader.add_constructor(
    "tag:yaml.org,2002:python/object/apply:eval", _eval_constructor
)


def _decode_leaves(obj):
    """yacs semantics: every string leaf loaded from yaml is literal_eval'd if
    possible, so '(512, 512)' becomes a tuple while 'RGB' stays a string."""
    if isinstance(obj, dict):
        return {k: _decode_leaves(v) for k, v in obj.items()}
    if isinstance(obj, str):
        try:
            return ast.literal_eval(obj)
        except (ValueError, SyntaxError):
            return obj
    return obj


def _load_yaml_with_base(filename: str) -> dict:
    with open(filename, "r") as f:
        cfg = _decode_leaves(yaml.load(f, Loader=_CfgLoader) or {})
    base_cfg: dict = {}
    if BASE_KEY in cfg:
        base_files = cfg.pop(BASE_KEY)
        if isinstance(base_files, str):
            base_files = [base_files]
        for base in base_files:
            if not os.path.isabs(base):
                base = os.path.join(os.path.dirname(filename), base)
            merged = _load_yaml_with_base(base)
            _merge_plain(merged, base_cfg)
    _merge_plain(cfg, base_cfg)
    return base_cfg


def _merge_plain(src: dict, dst: dict) -> None:
    for k, v in src.items():
        if k in dst and isinstance(dst[k], dict) and isinstance(v, dict):
            _merge_plain(v, dst[k])
        else:
            dst[k] = copy.deepcopy(v)
