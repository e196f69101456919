"""Measure the Pallas Schur-accumulation kernel vs the XLA einsum-scan on
the real TPU (the VERDICT round-2 Pallas experiment; results go to
PERFORMANCE.md's Pallas section).

    PYTHONPATH=/root/repo python tools/exp_pallas_ba.py
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")
sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from scanner_colmap_tpu.ops import pallas_ba


def sync(r):
    return float(jnp.ravel(r)[0])       # D2H scalar — block_until_ready is
                                        # lazy on the remote backend


def timeit(name, f, *a, n=10, flops=None):
    sync(f(*a))
    t0 = time.time()
    r = None
    for _ in range(n):
        r = f(*a)
    sync(r)
    dt = (time.time() - t0) / n
    extra = f"  {flops / dt / 1e12:.1f} TFLOP/s" if flops else ""
    print(f"{name}: {dt * 1e3:.2f} ms{extra}", flush=True)
    return dt


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    for M, P in [(256, 8192), (128, 16384)]:
        MC = M * 8
        B = jnp.asarray(rng.normal(size=(P, MC, 3)), jnp.float32)
        V = rng.normal(size=(P, 3, 3)).astype(np.float32)
        Vinv = jnp.asarray(V + np.transpose(V, (0, 2, 1)))
        flops = 2.0 * P * 3 * MC * MC + 2.0 * P * MC * 9
        xla = jax.jit(lambda b, v: pallas_ba.schur_accumulate_xla(b, v))
        pal = jax.jit(lambda b, v: pallas_ba.schur_accumulate(b, v))
        print(f"-- M={M} (MC={MC}) P={P}", flush=True)
        t_x = timeit("  xla einsum-scan", xla, B, Vinv, flops=flops)
        t_p = timeit("  pallas fused  ", pal, B, Vinv, flops=flops)
        a = np.asarray(xla(B, Vinv))
        b = np.asarray(pal(B, Vinv))
        rel = np.abs(a - b).max() / np.abs(a).max()
        print(f"  rel diff {rel:.2e}  speedup {t_x / t_p:.2f}x", flush=True)


if __name__ == "__main__":
    main()
