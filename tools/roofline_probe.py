"""Rig roofline anchors: what bandwidth and MXU throughput can THIS
v5e-behind-axon actually achieve on dense work? (VERDICT r4 #2: per-op
"floor" claims must be hardware-relative, not variant-relative.)

Measures, chained x20 (the bench protocol):
  - elementwise streams at 33 / 132 / 528 MB  -> achieved GB/s (r+w)
    (separates any fixed per-op cost from the sustainable rate)
  - reduction (sum) over the same                 -> read-only GB/s
  - bf16 matmul 4096^3 and 8192x4096x4096        -> achieved TFLOP/s
  - f32 (HIGHEST) matmul 2048^3                   -> f32 TFLOP/s
Nominal v5e: 197 TFLOP/s bf16, 819 GB/s HBM.

Run: PYTHONPATH=/root/repo python tools/roofline_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp
import numpy as np

ITERS = 20


def chain(name, fn, bytes_moved=None, flops=None, *args):
    @jax.jit
    def run(*a):
        def body(carry, _):
            return fn(*a, carry), None

        return jax.lax.scan(body, jnp.float32(0), None, length=ITERS, unroll=ITERS)[0]

    float(np.asarray(run(*args)))
    t0 = time.perf_counter()
    float(np.asarray(run(*args)))
    dt = (time.perf_counter() - t0) / ITERS
    extra = ""
    if bytes_moved:
        extra += f"  {bytes_moved / dt / 1e9:7.1f} GB/s"
    if flops:
        extra += f"  {flops / dt / 1e12:7.2f} TFLOP/s"
    print(f"{name:44s} {dt * 1000:8.2f} ms/iter{extra}", flush=True)


rng = np.random.default_rng(0)

for mb, shape in [(33, (5376, 1536)), (132, (21504, 1536)), (528, (86016, 1536))]:
    x = jnp.asarray(rng.normal(size=shape), jnp.float32)
    nbytes = x.size * 4

    def elem(x, c):
        y = x * 1.0001 + c
        return y[0, 0] + y[-1, -1]

    def red(x, c):
        return jnp.sum(x * 1.0001 + c)

    chain(f"elementwise {mb} MB (r+w)", elem, 2 * nbytes, None, x)
    chain(f"reduce      {mb} MB (r)", red, nbytes, None, x)

a16 = jnp.asarray(rng.normal(size=(4096, 4096)), jnp.bfloat16)
b16 = jnp.asarray(rng.normal(size=(4096, 4096)), jnp.bfloat16)


def mm16(a, b, c):
    y = jax.lax.dot(a + c.astype(jnp.bfloat16), b, preferred_element_type=jnp.float32)
    return y[0, 0] + y[-1, -1]


chain("bf16 matmul 4096^3", mm16, None, 2 * 4096**3, a16, b16)

a16w = jnp.asarray(rng.normal(size=(8192, 4096)), jnp.bfloat16)


def mm16w(a, b, c):
    y = jax.lax.dot(a + c.astype(jnp.bfloat16), b, preferred_element_type=jnp.float32)
    return y[0, 0] + y[-1, -1]


chain("bf16 matmul 8192x4096x4096", mm16w, None, 2 * 8192 * 4096 * 4096, a16w, b16)

a32 = jnp.asarray(rng.normal(size=(2048, 2048)), jnp.float32)
b32 = jnp.asarray(rng.normal(size=(2048, 2048)), jnp.float32)


def mm32(a, b, c):
    y = jax.lax.dot(a + c, b, precision=jax.lax.Precision.HIGHEST)
    return y[0, 0] + y[-1, -1]


chain("f32 HIGHEST matmul 2048^3", mm32, None, 2 * 2048**3, a32, b32)
print("done", flush=True)
