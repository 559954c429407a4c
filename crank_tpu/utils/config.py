"""Layered YAML configuration.

Mirrors the reference semantics (crank/utils/utils.py:67-84): a recipe YAML is
recursively dict-merged *over* the default YAML named by the
``CRANK_TPU_DEFAULT_YAML`` environment variable (``CRANK_DEFAULT_YAML`` is also
honoured for drop-in compatibility with reference recipes).
"""

import copy
import os
from pathlib import Path

import yaml


def _dictupdate(default: dict, new: dict) -> None:
    for k, v in new.items():
        if isinstance(v, dict) and k in default and isinstance(default[k], dict):
            _dictupdate(default[k], v)
        else:
            default[k] = v


def load_yaml(ymlf, default_ymlf=None):
    """Load a YAML config, merged over the default config if one is set.

    Args:
        ymlf: path to the recipe-level YAML.
        default_ymlf: explicit default YAML path; if None, the
            ``CRANK_TPU_DEFAULT_YAML`` / ``CRANK_DEFAULT_YAML`` env vars are used.

    Returns:
        dict config (recipe values win over defaults, merged recursively).
    """
    with open(ymlf) as fp:
        yml = yaml.load(fp, Loader=yaml.SafeLoader)
    if default_ymlf is None:
        default_ymlf = os.environ.get("CRANK_TPU_DEFAULT_YAML") or os.environ.get(
            "CRANK_DEFAULT_YAML"
        )
    if default_ymlf is None or not Path(default_ymlf).exists():
        return yml
    with open(default_ymlf) as fp:
        default_yml = yaml.load(fp, Loader=yaml.SafeLoader)
    _dictupdate(default_yml, yml if yml is not None else {})
    return default_yml


def merge_conf(default: dict, override: dict) -> dict:
    """Pure-dict variant of the recursive merge (override wins)."""
    out = copy.deepcopy(default)
    _dictupdate(out, override)
    return out
