"""On-disk cache of exported (pre-traced) device programs.

The persistent XLA compilation cache removes backend COMPILES from warm
starts, but every process still pays the Python TRACE of each program
(~1-2 s each; the 10k LRT lowers ~9 programs at entry, ~10-13 s of its
warm wall-clock).  ``jax.export`` serializes a traced program to a
StableHLO artifact that later processes can deserialize in ~0 s and
compile straight from — skipping tracing entirely, and making the
compilation-cache key trivially stable (the artifact bytes on disk are
the single source of the program).

Keying and staleness: an artifact is valid only for the exact program
the current source would trace, so the key includes a fingerprint of
the package's own source files (content hash — any edit to the package
invalidates every artifact), the jax/jaxlib versions, the default
backend, the x64 flag, and a caller-supplied signature (program name +
shapes/dtypes/static config).  Artifacts live next to the XLA cache
(``~/.cache/mind_the_gaps_tpu/programs``); ``MTG_TPU_NO_PROGRAM_CACHE=1``
disables the tier, ``MTG_TPU_PROGRAM_CACHE=<dir>`` relocates it.

Scope: single-device programs only — exported artifacts do not carry
the mesh/sharding context our multi-device paths close over, so callers
must bypass this tier when running under a mesh (they all gate on it).
Any failure (version skew, corrupt file, unexportable program) falls
back to tracing; the cache is an accelerator, never a correctness
dependency.
"""
from __future__ import annotations

import hashlib
import os
import threading
from typing import Optional

import jax

__all__ = ["exported_or_trace", "lower_via_cache", "program_cache_dir"]

_FINGERPRINT: Optional[str] = None
_FP_LOCK = threading.Lock()


def _package_fingerprint() -> str:
    """Content hash of every .py file in the package (memoized)."""
    global _FINGERPRINT
    with _FP_LOCK:
        if _FINGERPRINT is None:
            root = os.path.dirname(os.path.abspath(__file__))
            h = hashlib.sha256()
            for dirpath, dirnames, filenames in sorted(os.walk(root)):
                dirnames.sort()
                for fn in sorted(filenames):
                    if fn.endswith(".py"):
                        p = os.path.join(dirpath, fn)
                        h.update(os.path.relpath(p, root).encode())
                        with open(p, "rb") as f:
                            h.update(f.read())
            _FINGERPRINT = h.hexdigest()[:24]
    return _FINGERPRINT


def program_cache_dir() -> Optional[str]:
    if os.environ.get("MTG_TPU_NO_PROGRAM_CACHE"):
        return None
    d = os.environ.get("MTG_TPU_PROGRAM_CACHE")
    if not d:
        d = os.path.join(
            os.path.expanduser("~"), ".cache", "mind_the_gaps_tpu", "programs"
        )
    return d


def _artifact_path(signature: str) -> Optional[str]:
    d = program_cache_dir()
    if d is None:
        return None
    try:
        import jaxlib

        jaxlib_version = getattr(jaxlib, "__version__", "unknown")
    except ImportError:  # pragma: no cover
        jaxlib_version = "none"
    key = hashlib.sha256(
        "|".join(
            [
                signature,
                _package_fingerprint(),
                jax.__version__,
                jaxlib_version,
                jax.default_backend(),
                str(len(jax.devices())),
                str(jax.config.jax_enable_x64),
            ]
        ).encode()
    ).hexdigest()[:40]
    return os.path.join(d, key + ".jaxprog")


def exported_or_trace(signature: str, export_thunk):
    """Return a callable equivalent to the program ``export_thunk`` would
    trace: a deserialized on-disk artifact when one exists for this
    source/backend/signature, else the freshly exported program (written
    back to disk for the next process).

    ``export_thunk()`` must return a ``jax.export.Exported``.  The
    returned object's ``.call`` is the jit-able entry point.  Callers
    gate on single-device execution themselves.
    """
    from jax import export as jexport

    path = _artifact_path(signature)
    if path is not None and os.path.exists(path):
        try:
            with open(path, "rb") as f:
                return jexport.deserialize(bytearray(f.read()))
        except Exception:
            try:
                os.remove(path)
            except OSError:
                pass
    exported = export_thunk()
    if path is not None:
        try:
            blob = exported.serialize()
            os.makedirs(os.path.dirname(path), exist_ok=True)
            tmp = path + f".tmp.{os.getpid()}"
            with open(tmp, "wb") as f:
                f.write(blob)
            os.replace(tmp, path)
            _prune(os.path.dirname(path))
        except Exception:
            pass  # cache write failures never break the pipeline
    return exported


_MAX_ARTIFACTS = 256


def _prune(d: str) -> None:
    """Bound the artifact directory: artifacts key on data hashes, so a
    survey over many lightcurves would grow it without bound.  Keep the
    newest _MAX_ARTIFACTS by mtime."""
    entries = [e for e in os.listdir(d) if e.endswith(".jaxprog")]
    if len(entries) <= _MAX_ARTIFACTS:
        return
    paths = [os.path.join(d, e) for e in entries]
    paths.sort(key=lambda p: os.path.getmtime(p), reverse=True)
    for p in paths[_MAX_ARTIFACTS:]:
        try:
            os.remove(p)
        except OSError:
            pass


class _CompilableExported:
    """Duck-types the ``.compile()`` of a ``jax.stages.Lowered`` over an
    exported artifact: wrapping the artifact's ``.call`` in jit and
    lowering it is cheap (the StableHLO module already exists — no
    retracing of the original program).  An artifact that fails to
    re-lower/compile (version or device-context skew that survived
    deserialization) is deleted and the program retraced."""

    def __init__(self, exported, args, fallback, path):
        self._exported = exported
        self._args = args
        self._fallback = fallback
        self._path = path

    def compile(self):
        try:
            return jax.jit(self._exported.call).lower(*self._args).compile()
        except Exception:
            if self._path:
                try:
                    os.remove(self._path)
                except OSError:
                    pass
            return self._fallback().compile()


def lower_via_cache(signature: str, jit_fn, args, static_kwargs=None):
    """A Lowered-like object for ``jit_fn(*args, **static_kwargs)``.

    Loads the pre-traced artifact for ``signature`` when one matches,
    else traces via ``jax.export`` (persisting the artifact).  The
    ``signature`` must describe every closure constant of the program
    (argument shapes/dtypes are appended here defensively).  Any
    export/deserialize/replay failure falls back to a plain
    ``.lower()``.

    Single-device processes only: exported artifacts bake in the
    exporting process's device context (SDY mesh attributes), and
    replaying one under a different device count fails MLIR
    verification — multi-device processes always trace.
    """
    import numpy as _np

    kw = dict(static_kwargs or {})
    if len(jax.devices()) != 1:
        return jit_fn.lower(*args, **kw)
    aval_sig = ";".join(
        f"{tuple(_np.shape(a))}:{getattr(a, 'dtype', type(a).__name__)}" for a in args
    )
    full_sig = signature + "|" + aval_sig
    try:
        from jax import export as jexport

        exported = exported_or_trace(
            full_sig, lambda: jexport.export(jit_fn)(*args, **kw)
        )
        return _CompilableExported(
            exported, args,
            fallback=lambda: jit_fn.lower(*args, **kw),
            path=_artifact_path(full_sig),
        )
    except Exception:
        return jit_fn.lower(*args, **kw)
