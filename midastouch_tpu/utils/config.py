"""Minimal hydra-compatible config system (yaml groups + dotted overrides).

The reference composes `config/config.yaml` with groups expt/tcn/tdn via
hydra (`midastouch/config/config.yaml:8-10`) and documents CLI overrides
like `expt=ycb expt.obj_model=004_sugar_box` (README.md:102-113). hydra is
not a dependency here; this module reproduces exactly that composition and
override grammar over plain yaml files.
"""

from __future__ import annotations

import copy
import os
from typing import Any

import yaml

CONFIG_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "config")


class Config(dict):
    """Dict with attribute access, recursive over nested dicts."""

    def __getattr__(self, name: str) -> Any:
        try:
            v = self[name]
        except KeyError as e:
            raise AttributeError(name) from e
        return v

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = value

    @staticmethod
    def wrap(obj: Any) -> Any:
        if isinstance(obj, dict):
            return Config({k: Config.wrap(v) for k, v in obj.items()})
        if isinstance(obj, list):
            return [Config.wrap(v) for v in obj]
        return obj

    def to_dict(self) -> dict:
        def unwrap(o):
            if isinstance(o, dict):
                return {k: unwrap(v) for k, v in o.items()}
            if isinstance(o, list):
                return [unwrap(v) for v in o]
            return o

        return unwrap(self)

    def to_yaml(self) -> str:
        return yaml.safe_dump(self.to_dict(), sort_keys=False)


def _load_yaml(path: str) -> dict:
    with open(path) as fh:
        return yaml.safe_load(fh) or {}


def _parse_value(text: str) -> Any:
    out = yaml.safe_load(text)
    if isinstance(out, str):
        # YAML 1.1 misses bare scientific notation ("3e-4"); hydra accepts it
        try:
            return float(out)
        except ValueError:
            return out
    return out


def _set_dotted(cfg: dict, dotted: str, value: Any) -> None:
    keys = dotted.split(".")
    node = cfg
    for k in keys[:-1]:
        if k not in node or not isinstance(node[k], dict):
            node[k] = {}
        node = node[k]
    node[keys[-1]] = value


def compose(
    overrides: list[str] | None = None,
    config_name: str = "config",
    config_dir: str | None = None,
) -> Config:
    """Compose the root config with its default groups, then apply CLI-style
    overrides. `group=option` swaps a group file; `a.b.c=value` sets a leaf.
    """
    config_dir = config_dir or CONFIG_DIR
    overrides = list(overrides or [])

    root = _load_yaml(os.path.join(config_dir, config_name + ".yaml"))
    defaults = root.pop("defaults", [])

    # group swaps may override default group choices before loading
    group_choice: dict[str, str] = {}
    for d in defaults:
        if isinstance(d, dict):
            group_choice.update({str(k): str(v) for k, v in d.items()})

    leaf_overrides: list[tuple[str, Any]] = []
    for ov in overrides:
        if "=" not in ov:
            raise ValueError(f"override must be key=value, got {ov!r}")
        k, v = ov.split("=", 1)
        if k in group_choice and "." not in k:
            group_choice[k] = v
        else:
            leaf_overrides.append((k, _parse_value(v)))

    cfg: dict = copy.deepcopy(root)
    for group, option in group_choice.items():
        path = os.path.join(config_dir, group, option + ".yaml")
        cfg[group] = _load_yaml(path)

    for k, v in leaf_overrides:
        _set_dotted(cfg, k, v)

    return Config.wrap(cfg)


def load_config_file(path: str) -> Config:
    return Config.wrap(_load_yaml(path))
