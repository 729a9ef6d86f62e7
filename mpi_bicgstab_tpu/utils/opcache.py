"""Persistent operator-layout cache.

Host-side layout construction is the expensive part of starting a
solve: butterfly routing is ~27 s at Transport scale even with the
native router, windowed-ELL window assignment and DIA analysis scan
the whole matrix. The reference pays an analogous startup cost on
every run — each rank fscanf's the entire .mtx twice
(matrix.c:315-393) and prints it as "IO time" (main.c:90-93). This
cache removes the rebuild for repeat solves of the same matrix: the
built operator is serialized to one .npz keyed by a content hash of
the (padded, reordered) CSR plus every build option, so a stale or
mismatched cache entry is impossible to hit — a changed value, shape,
option, or layout-code version changes the key.

Serialization is a whitelist-based recursive walk of the operator
dataclasses (DIA / ELL / hybrid / windowed-ELL / butterfly, with DF
pairs for df32) — arrays into the npz payload, static metadata into a
JSON sidecar entry. No pickle anywhere.
"""
from __future__ import annotations

import dataclasses
import hashlib
import json
import os

import numpy as np

# bump when any layout builder's OUTPUT format changes (fields,
# padding rules, routing algorithm) — invalidates old cache entries
LAYOUT_VERSION = 3   # r5: ButterflyMatrix K3 tables kernel-ready 4D

_ARRAY_KIND_JAX = "jax"
_ARRAY_KIND_NP = "np"


def enable_compile_cache(path: str | None = None) -> str | None:
    """Point JAX's persistent compilation cache at a stable directory
    (default ~/.cache/mpi_bicgstab_tpu/xla; MBT_COMPILE_CACHE overrides,
    '0'/'off' disables). Complements the layout cache: repeat
    invocations skip XLA/Mosaic recompilation, which costs 10-250 s per
    distinct solver config on relay-tunneled TPU backends. Returns the
    directory in use, or None when disabled/unsupported.

    TPU-only: on XLA:CPU the persistent cache stores AOT machine code
    whose feature list the loader re-checks on every load, spraying
    'could lead to SIGILL' warnings (observed with the +prefer-no-*
    pseudo-features even on the SAME machine) — and CPU compiles are
    cheap anyway. NOTE: checking the backend initializes it, so call
    this only after the platform choice (jax_platforms / --platform)
    is final."""
    p = path or os.environ.get("MBT_COMPILE_CACHE") or os.path.join(
        os.path.expanduser("~"), ".cache", "mpi_bicgstab_tpu", "xla")
    if p.lower() in ("0", "off"):
        return None
    try:
        import jax
        if jax.default_backend() != "tpu":
            return None
        jax.config.update("jax_compilation_cache_dir", p)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # noqa: BLE001 — older jax: run uncached
        return None
    return p


def _registry():
    """name -> class map of everything the cache may reconstruct.
    Imported lazily: ops modules pull in jax."""
    from mpi_bicgstab_tpu.ops.butterfly import ButterflyMatrix
    from mpi_bicgstab_tpu.ops.dia import DiaMatrix
    from mpi_bicgstab_tpu.ops.ell import EllMatrix
    from mpi_bicgstab_tpu.ops.layout import HybridMatrix
    from mpi_bicgstab_tpu.ops.precision import DF
    from mpi_bicgstab_tpu.ops.window_ell import WindowEllMatrix
    from mpi_bicgstab_tpu.parallel.partition import PartitionedMatrix
    classes = (DiaMatrix, EllMatrix, HybridMatrix, WindowEllMatrix,
               ButterflyMatrix, DF, PartitionedMatrix)
    return {c.__name__: c for c in classes}


def operator_key(csr, **options) -> str:
    """Content hash of the CSR plus the build options (sorted) plus
    LAYOUT_VERSION. Any difference in values, structure, shape, or
    build configuration produces a different key."""
    h = hashlib.blake2b(digest_size=20)
    h.update(f"v{LAYOUT_VERSION};{csr.shape};".encode())
    for arr in (csr.ptr, csr.col, csr.val):
        a = np.ascontiguousarray(arr)
        h.update(str(a.dtype).encode())
        h.update(a.tobytes())
    h.update(json.dumps(options, sort_keys=True, default=str).encode())
    return h.hexdigest()


def _walk_save(obj, path, arrays, registry):
    """obj -> JSON-able meta node; array leaves land in `arrays`."""
    import jax
    if dataclasses.is_dataclass(obj) and not isinstance(obj, type):
        cname = type(obj).__name__
        if cname not in registry:
            raise TypeError(f"operator cache: unsupported class {cname}")
        fields = {}
        for f in dataclasses.fields(obj):
            fields[f.name] = _walk_save(getattr(obj, f.name),
                                        f"{path}.{f.name}", arrays,
                                        registry)
        return {"__class__": cname, "fields": fields}
    if isinstance(obj, jax.Array):
        arrays[path] = np.asarray(obj)
        return {"__array__": _ARRAY_KIND_JAX, "key": path}
    if isinstance(obj, np.ndarray):
        arrays[path] = obj
        return {"__array__": _ARRAY_KIND_NP, "key": path}
    if isinstance(obj, tuple):
        return {"__tuple__": [_walk_save(v, f"{path}[{i}]", arrays,
                                         registry)
                              for i, v in enumerate(obj)]}
    if isinstance(obj, (np.integer,)):
        return int(obj)
    if isinstance(obj, (np.floating,)):
        return float(obj)
    if obj is None or isinstance(obj, (bool, int, float, str)):
        return obj
    raise TypeError(f"operator cache: unsupported value at {path}: "
                    f"{type(obj).__name__}")


def _walk_load(node, arrays, registry):
    import jax.numpy as jnp
    if isinstance(node, dict):
        if "__class__" in node:
            cls = registry[node["__class__"]]
            kw = {k: _walk_load(v, arrays, registry)
                  for k, v in node["fields"].items()}
            return cls(**kw)
        if "__array__" in node:
            a = arrays[node["key"]]
            if node["__array__"] == _ARRAY_KIND_JAX:
                return jnp.asarray(a)
            return a
        if "__tuple__" in node:
            return tuple(_walk_load(v, arrays, registry)
                         for v in node["__tuple__"])
    return node


def save_operator(cache_dir: str, key: str, op) -> str | None:
    """Best-effort: a failed save (read-only dir, disk full, an
    operator class the serializer doesn't know) must never kill a
    solve whose operator ALREADY built — warn and run uncached."""
    try:
        os.makedirs(cache_dir, exist_ok=True)
        arrays: dict[str, np.ndarray] = {}
        meta = _walk_save(op, "op", arrays, _registry())
        path = os.path.join(cache_dir, f"layout_{key}.npz")
        # atomic publish: a crashed/parallel writer never leaves a
        # torn file
        tmp = os.path.join(cache_dir, f".tmp_{key}_{os.getpid()}.npz")
        np.savez(tmp, __meta__=np.asarray(json.dumps(meta)), **arrays)
        os.replace(tmp, path)
        return path
    except Exception as e:  # noqa: BLE001
        import warnings
        warnings.warn(f"layout cache write failed ({e}); "
                      f"continuing uncached", stacklevel=2)
        return None


def load_operator(cache_dir: str, key: str):
    """Returns the cached operator or None (missing / unreadable)."""
    path = os.path.join(cache_dir, f"layout_{key}.npz")
    if not os.path.exists(path):
        return None
    try:
        with np.load(path, allow_pickle=False) as z:
            meta = json.loads(str(z["__meta__"]))
            arrays = {k: z[k] for k in z.files if k != "__meta__"}
        return _walk_load(meta, arrays, _registry())
    except Exception:  # noqa: BLE001 — corrupt entry: rebuild instead
        return None
