"""Native parameter persistence (.npz pytrees).

The reference can only *load* checkpoints (torch zip; SURVEY.md §5
"checkpoint/resume: load-only"). The rebuild persists its own training
output as flat .npz archives: nested dict/list pytrees flatten to
dot-joined key paths ("lstm.0.w_ih"); integers in a path are list indices.
No pickle anywhere — plain arrays only.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict

import numpy as np

_SEP = "."


def _flatten(prefix: str, tree: Any, out: Dict[str, np.ndarray]) -> None:
    if isinstance(tree, dict):
        for k, v in tree.items():
            if _SEP in str(k):
                raise ValueError(f"key {k!r} may not contain {_SEP!r}")
            _flatten(f"{prefix}{_SEP}{k}" if prefix else str(k), v, out)
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            _flatten(f"{prefix}{_SEP}{i}" if prefix else str(i), v, out)
    else:
        out[prefix] = np.asarray(tree)


def save_params_npz(path, params: Any) -> None:
    flat: Dict[str, np.ndarray] = {}
    _flatten("", params, flat)
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(path, **flat)


def load_params_npz(path) -> Any:
    with np.load(path, allow_pickle=False) as z:
        flat = {k: z[k] for k in z.files}

    root: Dict[str, Any] = {}
    for key, value in flat.items():
        parts = key.split(_SEP)
        node = root
        for p, nxt in zip(parts[:-1], parts[1:]):
            node = node.setdefault(p, {})
        node[parts[-1]] = value

    def listify(node):
        if not isinstance(node, dict):
            return node
        keys = list(node.keys())
        if keys and all(k.isdigit() for k in keys):
            return [listify(node[str(i)]) for i in range(len(keys))]
        return {k: listify(v) for k, v in node.items()}

    return listify(root)
