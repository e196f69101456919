"""Disk-backed AOT executable cache (persistent_jit).

JAX's built-in persistent compilation cache does not capture compiles on
remote-compile backends (observed: every process pays ~2 s per distinct
program shape). XLA executable *serialization* does work there, so this
module implements the cache one level up: each (function, input-shapes,
static-args) signature is lowered+compiled once, serialized with
jax.experimental.serialize_executable, and written to disk; later processes
deserialize in ~1 ms instead of recompiling.

Scope: single-device jits with hashable static kwargs (the engine's hot
solves). Anything that fails to serialize (multi-device, donation, exotic
primitives) silently falls back to the plain jit path.

Usage:
    @persistent_jit(static_argnames=("max_iterations", "chunk"))
    def solve(x, *, max_iterations=10, chunk=64): ...
"""

from __future__ import annotations

import functools
import hashlib
import inspect
import logging
import os
import pickle
import threading

import numpy as np

log = logging.getLogger(__name__)

_DISABLE = bool(os.environ.get("SCT_DISABLE_JIT_CACHE"))

_PKG_NAME = "scanner_colmap_tpu"
_DEP_GRAPH = None
_MOD_FP: dict = {}


def _pkg_root() -> str:
    return os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _module_path(mod: str):
    """Filesystem path of a package module name, or None if external."""
    if not mod.startswith(_PKG_NAME):
        return None
    rel = mod[len(_PKG_NAME):].lstrip(".").replace(".", os.sep)
    root = _pkg_root()
    for cand in (os.path.join(root, rel + ".py"),
                 os.path.join(root, rel, "__init__.py"),
                 os.path.join(root, "__init__.py") if not rel else None):
        if cand and os.path.exists(cand):
            return cand
    return None


def _dep_graph() -> dict:
    """module name -> set of directly imported PACKAGE module names, from a
    one-time ast pass over every .py (catches function-local imports too)."""
    global _DEP_GRAPH
    if _DEP_GRAPH is not None:
        return _DEP_GRAPH
    import ast

    root = _pkg_root()
    graph: dict = {}
    for dirpath, dirnames, filenames in sorted(os.walk(root)):
        dirnames.sort()
        for fn in sorted(filenames):
            if not fn.endswith(".py"):
                continue
            path = os.path.join(dirpath, fn)
            rel = os.path.relpath(path, root)[:-3].replace(os.sep, ".")
            mod = (_PKG_NAME if rel == "__init__"
                   else f"{_PKG_NAME}.{rel[:-9]}" if rel.endswith(".__init__")
                   else f"{_PKG_NAME}.{rel}")
            deps = set()
            try:
                tree = ast.parse(open(path, "rb").read())
            except SyntaxError:
                # unparsable file: ITS edges are unknown — degrade any
                # closure that reaches it to the whole-package hash (the
                # "*" marker), but keep the rest of the graph usable and
                # cached (returning a partial graph here made modules
                # missing from it hash only their own file — a stale-
                # executable hazard)
                graph[mod] = {"*"}
                continue
            for node in ast.walk(tree):
                if isinstance(node, ast.Import):
                    for a in node.names:
                        if a.name.startswith(_PKG_NAME):
                            deps.add(a.name)
                elif isinstance(node, ast.ImportFrom) and node.module:
                    if node.module.startswith(_PKG_NAME):
                        deps.add(node.module)
                        for a in node.names:
                            deps.add(f"{node.module}.{a.name}")
            graph[mod] = deps
        # don't descend into hidden/cache dirs
        dirnames[:] = [d for d in dirnames if not d.startswith((".", "__"))]
    _DEP_GRAPH = graph
    return graph


def _module_fingerprint(mod: str) -> str:
    """Content hash of a module's TRANSITIVE package-import closure.

    Replaces the whole-package fingerprint: a wrapped function can only call
    code reachable through its module's imports (incl. function-local ones,
    which the ast pass sees), so hashing that closure is sound while editing
    an unrelated module no longer invalidates every cached executable (a
    full remote recompile costs minutes per entry point)."""
    fp = _MOD_FP.get(mod)
    if fp is not None:
        return fp
    graph = _dep_graph()
    seen, stack = set(), [mod]
    while stack:
        m = stack.pop()
        # resolve `from pkg.mod import name` entries to real modules
        while m and _module_path(m) is None and "." in m:
            m = m.rsplit(".", 1)[0]
        if not m or m in seen or _module_path(m) is None:
            continue
        seen.add(m)
        deps = graph.get(m, {"*"})  # missing from the graph = unknown edges
        if "*" in deps:
            seen = None  # degraded closure: hash the whole package
            break
        stack.extend(deps)
    h = hashlib.sha256()
    if seen is None:
        seen = set(graph)
    for m in sorted(seen):
        path = _module_path(m)
        if path:
            with open(path, "rb") as f:
                h.update(m.encode())
                h.update(f.read())
    fp = h.hexdigest()[:16]
    _MOD_FP[mod] = fp
    return fp


def default_cache_dir() -> str:
    d = os.environ.get("SCT_JIT_CACHE")
    if d:
        return d
    root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    return os.path.join(root, ".jit_cache")


def _leaf_sig(x):
    if isinstance(x, (bool, int, float, complex)):
        # static scalars are part of the compiled program: dropping the VALUE
        # made max_iterations=25 and =50 collide on one executable
        return (type(x).__name__, x)
    shape = getattr(x, "shape", None)
    dtype = getattr(x, "dtype", None)
    if shape is None:
        return ("obj", repr(x))
    return (tuple(shape), str(dtype),
            bool(getattr(x, "weak_type", False)))


class _PersistentJit:
    def __init__(self, fn, static_argnames=(), version: int = 0, salt=None,
                 fingerprint_modules=None):
        self._fn = fn
        self._static = tuple(static_argnames)
        self._jit = None  # built lazily (jax import deferred)
        self._mem = {}
        self._lock = threading.Lock()
        # fingerprint scope: by default the defining module's import
        # closure; a closure that only calls into specific op modules can
        # narrow it (e.g. a stage wrapper around ops.sift keys on ops.sift,
        # so edits elsewhere in the stage file don't invalidate a
        # minutes-long remote compile). The wrapper's own source is always
        # hashed via _salt.
        self._fp_modules = tuple(fingerprint_modules or (fn.__module__,))
        try:
            src = inspect.getsource(fn)
        except (OSError, TypeError):
            src = repr(fn)
        # salt: REQUIRED extra key material when fn is a closure — the source
        # hash cannot see captured values, so the caller must key them
        self._salt = hashlib.sha256(
            f"{fn.__module__}.{fn.__qualname__}|{version}|{src}|{salt!r}"
            .encode()).hexdigest()[:16]
        functools.update_wrapper(self, fn)

    def _get_jit(self):
        if self._jit is None:
            import jax

            self._jit = jax.jit(self._fn, static_argnames=self._static)
        return self._jit

    def _key(self, args, kwargs):
        import jax

        leaves, treedef = jax.tree.flatten((args, kwargs))
        sig = tuple(_leaf_sig(x) for x in leaves)
        fps = tuple(_module_fingerprint(m) for m in self._fp_modules)
        h = hashlib.sha256(
            repr((self._salt, fps, str(treedef), sig,
                  jax.__version__, jax.devices()[0].device_kind,
                  len(jax.devices()))).encode()).hexdigest()[:24]
        return h

    def __call__(self, *args, **kwargs):
        if _DISABLE:
            return self._get_jit()(*args, **kwargs)
        import jax

        # inside another trace (jit/vmap/shard_map), defer to plain jit —
        # AOT lowering requires concrete shapes and a top-level call site
        leaves = jax.tree.leaves((args, kwargs))
        if any(isinstance(x, jax.core.Tracer) for x in leaves):
            return self._get_jit()(*args, **kwargs)
        # CPU backends: plain jit. CPU AOT results embed machine features
        # (breaks across hosts) and multi-device test meshes change the
        # expected input sharding; the cache targets remote TPU backends
        # where compiles cost ~2 s per program.
        if jax.devices()[0].platform == "cpu":
            return self._get_jit()(*args, **kwargs)

        key = self._key(args, kwargs)
        exe = self._mem.get(key)
        if exe is not None:
            return exe(*args, **{k: v for k, v in kwargs.items()
                                 if k not in self._static})

        with self._lock:
            exe = self._mem.get(key)
            if exe is None:
                exe = self._load_or_compile(key, args, kwargs)
                self._mem[key] = exe
        return exe(*args, **{k: v for k, v in kwargs.items()
                             if k not in self._static})

    def call_small(self, *args, **kwargs):
        """Latency-adaptive dispatch: run on the in-process CPU backend.

        Remote/tunneled TPU backends cost ~30-80 ms of link latency per
        dispatch; solves far below the MXU crossover (small PnP/triangulation
        batches in the mapper's inner loop) finish in single-digit ms on the
        host. The caller decides 'small' — this just executes the SAME jitted
        function under the CPU backend, falling back to the default device
        when no CPU backend exists or anything fails.
        """
        import jax

        try:
            cpu = jax.local_devices(backend="cpu")[0]
        except Exception:
            return self(*args, **kwargs)
        if jax.devices()[0].platform == "cpu":
            return self(*args, **kwargs)
        try:
            with jax.default_device(cpu):
                return self._get_jit()(*args, **kwargs)
        except Exception as e:
            log.info("cpu dispatch failed (%s); using default device", e)
            return self(*args, **kwargs)

    def _load_or_compile(self, key, args, kwargs):
        from jax.experimental.serialize_executable import (
            deserialize_and_load, serialize)

        path = os.path.join(default_cache_dir(), f"{key}.xc")
        if os.path.exists(path):
            try:
                with open(path, "rb") as fh:
                    payload, in_tree, out_tree = pickle.load(fh)
                return deserialize_and_load(payload, in_tree, out_tree)
            except Exception as e:
                log.info("jit-cache load failed (%s); recompiling", e)

        jitted = self._get_jit()
        compiled = jitted.lower(*args, **kwargs).compile()
        try:
            payload, in_tree, out_tree = serialize(compiled)
            os.makedirs(default_cache_dir(), exist_ok=True)
            tmp = f"{path}.tmp.{os.getpid()}"
            with open(tmp, "wb") as fh:
                pickle.dump((payload, in_tree, out_tree), fh)
            os.replace(tmp, path)
        except Exception as e:
            log.info("jit-cache store failed (%s); caching in-memory only", e)
        return compiled


def persistent_jit(fn=None, *, static_argnames=(), version: int = 0,
                   salt=None, fingerprint_modules=None):
    """jax.jit with a disk-backed AOT executable cache (see module doc).

    When wrapping a CLOSURE, pass the captured values as `salt` — the cache
    key hashes the source text, which cannot distinguish closure instances.
    `fingerprint_modules` narrows the source-fingerprint scope to the
    modules the closure actually computes through (default: the defining
    module's transitive import closure).
    """
    if fn is None:
        return lambda f: _PersistentJit(f, static_argnames, version, salt,
                                        fingerprint_modules)
    return _PersistentJit(fn, static_argnames, version, salt,
                          fingerprint_modules)
