"""YAML config loading with OmegaConf-style `${}` interpolation.

The reference uses OmegaConf (`/root/reference/train.py:443`), which is
not installed in this image; this implements the subset the configs use:
absolute (`${train.tag}`) and relative (`${.tag}`) references.
"""

import re
from typing import Any, Dict, List, Union

import yaml

_PATTERN = re.compile(r"\$\{([^}]+)\}")


def _resolve(root, node, path):
    if isinstance(node, dict):
        return {k: _resolve(root, v, path + [k]) for k, v in node.items()}
    if isinstance(node, list):
        return [_resolve(root, v, path) for v in node]
    if isinstance(node, str) and "${" in node:
        def sub(m):
            ref = m.group(1)
            if ref.startswith("."):
                # relative to the containing mapping
                target = path[:-1]
                ref = ref[1:]
                while ref.startswith("."):
                    target = target[:-1]
                    ref = ref[1:]
                keys = target + ref.split(".")
            else:
                keys = ref.split(".")
            cur = root
            for k in keys:
                cur = cur[k]
            # recursively resolve nested interpolations
            if isinstance(cur, str) and "${" in cur:
                cur = _PATTERN.sub(sub, cur)
            return str(cur)

        return _PATTERN.sub(sub, node)
    return node


def load_yaml_config(path: str) -> Dict[str, Any]:
    with open(path) as f:
        raw = yaml.safe_load(f)
    return _resolve(raw, raw, [])
