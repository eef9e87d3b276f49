"""Parameter checkpoint IO.

Native format: a flat .npz ('<key>.w' / '<key>.b' arrays) — deterministic,
dependency-free, mmap-friendly. Torch-format checkpoints (the reference's
pickles) load through models.params.load_torch_checkpoint.
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def save_params(params: Dict, path: str) -> None:
    flat = {}
    for key, p in params.items():
        for f, v in p.items():
            flat[f"{key}.{f}"] = np.asarray(v)
    np.savez_compressed(path, **flat)


def load_params(path: str) -> Dict:
    out: Dict[str, Dict[str, np.ndarray]] = {}
    with np.load(path) as z:
        for name in z.files:
            key, f = name.rsplit(".", 1)
            out.setdefault(key, {})[f] = z[name]
    return out


def save_params_orbax(params: Dict, path: str) -> None:
    """Orbax checkpoint (for integration with orbax-managed training/eval
    setups); the .npz format remains the default."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, params)
    ckptr.wait_until_finished()


def load_params_orbax(path: str) -> Dict:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path)
