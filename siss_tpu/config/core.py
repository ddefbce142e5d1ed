"""Hydra-compatible config system (self-contained; hydra/omegaconf-free).

The reference is driven by Hydra configs (``main.py:14``,
``config/*.yaml``); this module reproduces the subset of Hydra/OmegaConf
semantics those configs use so the exact same config surface
(``--config-name=delete_celeb`` etc., SURVEY.md §5 "Config / flag system")
works on TPU deployments without the dependency:

* YAML config files resolved by name from a config directory
* defaults-list inheritance with ``_self_`` ordering
  (``config/delete_tshirt.yaml:1-3``)
* ``${a.b}`` / ``${a.b[0]}`` interpolation, incl. inside strings
  (``config/delete_celeb.yaml:64-66``)
* dotted CLI overrides ``a.b=value`` (+``+a.b=value`` to add new keys)
* ``_target_`` instantiation and ``get_object`` import-by-path
* attribute-style access and runtime mutation (superfactor decay,
  ``fill_cfg``-style patching)
"""

from __future__ import annotations

import importlib
import os
import re
from typing import Any, Dict, List, Optional

import yaml

_INTERP_RE = re.compile(r"\$\{([^}]+)\}")


class _YamlLoader(yaml.SafeLoader):
    """SafeLoader with a fixed float resolver: pyyaml's YAML-1.1 regex
    rejects '1e-4' (no dot), which Hydra configs use everywhere."""


_YamlLoader.add_implicit_resolver(
    "tag:yaml.org,2002:float",
    re.compile(
        r"""^(?:[-+]?(?:[0-9][0-9_]*)\.[0-9_]*(?:[eE][-+]?[0-9]+)?
        |[-+]?(?:[0-9][0-9_]*)(?:[eE][-+]?[0-9]+)
        |\.[0-9_]+(?:[eE][-+][0-9]+)?
        |[-+]?\.(?:inf|Inf|INF)
        |\.(?:nan|NaN|NAN))$""",
        re.X,
    ),
    list("-+0123456789."),
)


def _yaml_load(text: str) -> Any:
    return yaml.load(text, Loader=_YamlLoader)


class Config:
    """Attribute-accessible, mutable config node (dict-backed)."""

    def __init__(self, data: Optional[Dict[str, Any]] = None):
        object.__setattr__(self, "_data", {})
        for k, v in (data or {}).items():
            self._data[k] = _wrap(v)

    # -- mapping protocol ------------------------------------------------
    def __getitem__(self, key):
        return self._data[key]

    def __setitem__(self, key, value):
        self._data[key] = _wrap(value)

    def __contains__(self, key):
        return key in self._data

    def __iter__(self):
        return iter(self._data)

    def keys(self):
        return self._data.keys()

    def items(self):
        return self._data.items()

    def values(self):
        return self._data.values()

    def get(self, key, default=None):
        return self._data.get(key, default)

    def setdefault(self, key, default=None):
        if key not in self._data:
            self._data[key] = _wrap(default)
        return self._data[key]

    def __len__(self):
        return len(self._data)

    # -- attribute protocol ----------------------------------------------
    def __getattr__(self, key):
        if key.startswith("__") or key == "_data":
            raise AttributeError(key)  # keep pickling/copy probes sane
        try:
            return self._data[key]
        except KeyError as e:
            raise AttributeError(f"Config has no key {key!r}") from e

    def __setattr__(self, key, value):
        self._data[key] = _wrap(value)

    def __repr__(self):
        return f"Config({self._data!r})"

    def __eq__(self, other):
        if isinstance(other, Config):
            return self._data == other._data
        if isinstance(other, dict):
            return to_dict(self) == other
        return NotImplemented


def _wrap(v):
    if isinstance(v, dict):
        return Config(v)
    if isinstance(v, Config):
        return v
    if isinstance(v, (list, tuple)):
        return [_wrap(x) for x in v]
    return v


def to_dict(node) -> Any:
    if isinstance(node, Config):
        return {k: to_dict(v) for k, v in node.items()}
    if isinstance(node, list):
        return [to_dict(v) for v in node]
    return node


# --------------------------------------------------------------------- merge

def _deep_merge(base: Dict[str, Any], over: Dict[str, Any]) -> Dict[str, Any]:
    out = dict(base)
    for k, v in over.items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = _deep_merge(out[k], v)
        else:
            out[k] = v
    return out


# -------------------------------------------------------------- interpolation

def _select(root: Dict[str, Any], path: str) -> Any:
    """Resolve 'a.b[0].c' against the raw dict tree."""
    cur: Any = root
    for part in re.split(r"\.", path.strip()):
        m = re.match(r"^([^\[\]]+)((\[\d+\])*)$", part)
        if not m:
            raise KeyError(f"Bad interpolation path: {path!r}")
        key, idxs = m.group(1), m.group(2)
        cur = cur[key]
        for idx in re.findall(r"\[(\d+)\]", idxs):
            cur = cur[int(idx)]
    return cur


def _resolve(node: Any, root: Dict[str, Any], depth: int = 0) -> Any:
    if depth > 20:
        raise RecursionError("Interpolation cycle detected")
    if isinstance(node, dict):
        return {k: _resolve(v, root, depth) for k, v in node.items()}
    if isinstance(node, list):
        return [_resolve(v, root, depth) for v in node]
    if isinstance(node, str):
        full = _INTERP_RE.fullmatch(node)
        if full:
            return _resolve(_select(root, full.group(1)), root, depth + 1)
        def sub(m):
            val = _resolve(_select(root, m.group(1)), root, depth + 1)
            return str(val)
        return _INTERP_RE.sub(sub, node)
    return node


# ------------------------------------------------------------------ overrides

def _parse_override_value(raw: str) -> Any:
    return _yaml_load(raw) if raw != "" else None


def _apply_override(tree: Dict[str, Any], dotted: str, value: Any, allow_new: bool):
    parts = dotted.split(".")
    cur = tree
    for p in parts[:-1]:
        if p in cur and not isinstance(cur[p], dict):
            raise KeyError(
                f"Override path {dotted!r}: {p!r} holds a value, not a section")
        if p not in cur:
            if not allow_new:
                raise KeyError(f"Override path {dotted!r}: unknown key {p!r} (prefix with + to add)")
            cur[p] = {}
        cur = cur[p]
    last = parts[-1]
    if not allow_new and last not in cur:
        raise KeyError(f"Override {dotted!r}: unknown key {last!r} (prefix with + to add)")
    cur[last] = value


# ------------------------------------------------------------------- loading

def _load_raw(name: str, config_dir: str, _stack=()) -> Dict[str, Any]:
    if name in _stack:
        raise ValueError(f"defaults cycle: {' -> '.join(_stack + (name,))}")
    path = os.path.join(config_dir, f"{name}.yaml")
    with open(path) as f:
        data = _yaml_load(f.read()) or {}
    defaults: List[Any] = data.pop("defaults", None) or []
    merged: Dict[str, Any] = {}
    self_seen = False
    for entry in defaults:
        if entry == "_self_":
            merged = _deep_merge(merged, data)
            self_seen = True
        else:
            merged = _deep_merge(merged, _load_raw(str(entry), config_dir, _stack + (name,)))
    if not self_seen:
        merged = _deep_merge(merged, data)
    return merged


def load_config(
    config_name: str,
    overrides: Optional[List[str]] = None,
    config_dir: Optional[str] = None,
) -> Config:
    """Load ``<config_dir>/<config_name>.yaml`` with defaults-list merging,
    apply CLI-style overrides, resolve interpolations."""
    config_dir = config_dir or os.path.join(os.path.dirname(__file__), "..", "..", "configs")
    tree = _load_raw(config_name, config_dir)
    for ov in overrides or []:
        if "=" not in ov:
            raise ValueError(f"Override must be key=value: {ov!r}")
        key, raw = ov.split("=", 1)
        allow_new = key.startswith("+")
        key = key.lstrip("+")
        _apply_override(tree, key, _parse_override_value(raw), allow_new)
    tree = _resolve(tree, tree)
    return Config(tree)


# -------------------------------------------------------------- instantiation

def get_object(path: str) -> Any:
    """Import ``pkg.mod.attr`` (hydra.utils.get_object/get_class equivalent)."""
    module_path, _, attr = path.rpartition(".")
    if not module_path:
        raise ImportError(f"Not a dotted path: {path!r}")
    try:
        module = importlib.import_module(module_path)
        return getattr(module, attr)
    except (ImportError, AttributeError) as first_err:
        # path may point at a nested attribute: pkg.mod.Class.method
        try:
            parent = get_object(module_path)
            return getattr(parent, attr)
        except (ImportError, AttributeError):
            raise first_err  # surface the real import failure, not the fallback's


def instantiate(node: Any, _recursive_: bool = False, **kwargs) -> Any:
    """Instantiate a ``_target_`` node (hydra.utils.instantiate subset).

    Like the reference driver (``main.py:30-35``) we default to
    non-recursive: nested ``_target_`` nodes are passed through as Config
    for the object to instantiate itself.
    """
    if isinstance(node, Config):
        node = to_dict(node)
    if not isinstance(node, dict) or "_target_" not in node:
        raise ValueError(f"instantiate() needs a dict with _target_, got {node!r}")
    node = dict(node)
    target = node.pop("_target_")
    node.pop("_type", None)
    if node.pop("_partial_", False):
        import functools
        fn = get_object(target)
        return functools.partial(fn, **{**node, **kwargs})
    if _recursive_:
        node = {
            k: instantiate(v, _recursive_=True) if isinstance(v, dict) and "_target_" in v else v
            for k, v in node.items()
        }
    fn = get_object(target)
    merged = {**node, **kwargs}
    # Re-wrap plain dicts so targets get attribute-style access.
    merged = {k: Config(v) if isinstance(v, dict) else v for k, v in merged.items()}
    return fn(**merged)
