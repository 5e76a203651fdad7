"""Runtime glue for running inside an externally-initialised Ray session.

The driver calls ``ray.init`` itself (possibly from a cwd where this repo is
not importable) before importing ``__ray_entry__``.  Ray workers then
deserialize our stage callables by module reference — which fails if the
worker processes can't import ``bano_ray``.  :func:`ensure_worker_importable`
registers every loaded ``bano_ray`` module for by-value cloudpickle
serialization, so stage code travels with the task instead of requiring a
worker-side install.  Idempotent; call after importing the modules a
pipeline uses.
"""

from __future__ import annotations

import sys

_registered: set[str] = set()


def ensure_worker_importable() -> None:
    try:
        from ray import cloudpickle as rcp
    except Exception:  # pragma: no cover - ray always present in this env
        return
    for name, mod in list(sys.modules.items()):
        if mod is not None and name.split(".")[0] == "bano_ray" and name not in _registered:
            try:
                rcp.register_pickle_by_value(mod)
                _registered.add(name)
            except Exception:
                pass
