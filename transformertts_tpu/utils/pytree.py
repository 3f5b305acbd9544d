"""Parameter pytree helpers: flatten to path-keyed dicts for npz storage."""
from typing import Dict

import jax.numpy as jnp
import numpy as np


def flatten_params(params, prefix: str = '') -> Dict[str, np.ndarray]:
    flat = {}
    if isinstance(params, dict):
        for k, v in params.items():
            flat.update(flatten_params(v, f'{prefix}{k}/'))
    else:
        flat[prefix[:-1]] = np.asarray(params)
    return flat


def unflatten_params(flat: Dict[str, np.ndarray]) -> dict:
    tree = {}
    for path, value in flat.items():
        parts = path.split('/')
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(value)
    return tree


def tree_size(params) -> int:
    """Total number of parameters."""
    return sum(int(np.prod(v.shape)) for v in flatten_params(params).values())


class HostArray(np.ndarray):
    """np.ndarray that also answers TF-style ``.numpy()`` — lets reference
    user code like ``out['mel'].numpy().T`` run unchanged."""

    def numpy(self) -> np.ndarray:
        return np.asarray(self)


def host_array(x) -> HostArray:
    return np.asarray(x).view(HostArray)
