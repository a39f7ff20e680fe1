"""Microbenchmark the exact matmul shapes/precisions and VPU ops the
fused rasterizer kernel is built from, ON-CHIP, to replace guesswork
about Mosaic's f32-matmul lowering cost with measurements.

Each case is a tiny Pallas kernel that repeats the op REPS times inside
the kernel body (data-dependent chain so Mosaic cannot CSE it), wrapped
in a chained fori_loop at the jit level (axon per-dispatch floor ~3 ms).
Prints ns/op and effective MAC/s.

Run: python -u tools/mxu_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from functools import partial

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

REPS = 256          # op repetitions inside one kernel call
ITERS = 20          # chained kernel calls per timing


def _matmul_kernel(prec, dims, a_ref, b_ref, o_ref):
    a = a_ref[...]
    b = b_ref[...]
    acc = jnp.zeros_like(o_ref)
    for _ in range(REPS):
        acc = acc + jax.lax.dot_general(
            a, b, dims, precision=prec, preferred_element_type=jnp.float32
        )
        # tiny data dependency so the loop cannot collapse
        a = a + acc[0, 0] * 1e-30
    o_ref[...] = acc


def time_matmul(name, M, K, N, prec, contract=None, macs=None):
    dims = contract or (((1,), (0,)), ((), ()))
    a = jnp.asarray(np.random.default_rng(0).normal(size=(M, K)), jnp.float32)
    bshape = (K, N) if dims == (((1,), (0,)), ((), ())) else None
    if bshape is None:
        # contract last-with-last: b is [N, K]
        bshape = (N, K)
    b = jnp.asarray(np.random.default_rng(1).normal(size=bshape), jnp.float32)

    f = pl.pallas_call(
        partial(_matmul_kernel, prec, dims),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )

    @jax.jit
    def run(a, b):
        def body(_, s):
            o = f(a + s * 1e-30, b)
            return jnp.float32(o[0, 0]) * 1e-30

        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0))

    try:
        t0 = time.perf_counter()
        float(np.asarray(run(a, b)))
        tc = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(np.asarray(run(a, b)))
        dt = (time.perf_counter() - t0) / ITERS
    except Exception as e:  # noqa: BLE001
        print(f"{name:44s} FAILED: {type(e).__name__}: {str(e)[:90]}")
        return
    per_op_ns = dt / REPS * 1e9
    real_macs = macs or (M * K * N)
    rate = real_macs / (per_op_ns * 1e-9) / 1e12
    print(
        f"{name:44s} {per_op_ns:9.0f} ns/op   {rate:8.2f} real-TMAC/s",
        flush=True,
    )


def _roll_kernel(shifts, n_rows, a_ref, o_ref):
    x = a_ref[...]
    for _ in range(REPS // 8):
        for s in shifts:
            m = pltpu.roll(x, s, 1)
            x = jnp.where(m > x, m, x)
        x = x + 1e-30
    o_ref[...] = x


def time_roll(name, rows, lanes, shifts):
    a = jnp.asarray(np.random.default_rng(0).normal(size=(rows, lanes)), jnp.float32)
    f = pl.pallas_call(
        partial(_roll_kernel, shifts, rows),
        out_shape=jax.ShapeDtypeStruct((rows, lanes), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )

    @jax.jit
    def run(a):
        def body(_, s):
            o = f(a + s * 1e-30)
            return jnp.float32(o[0, 0]) * 1e-30

        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0))

    try:
        t0 = time.perf_counter()
        float(np.asarray(run(a)))
        tc = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(np.asarray(run(a)))
        dt = (time.perf_counter() - t0) / ITERS
    except Exception as e:  # noqa: BLE001
        print(f"{name:44s} FAILED: {type(e).__name__}: {str(e)[:90]}")
        return
    n_stage = (REPS // 8) * len(shifts)
    per_stage_ns = dt / n_stage * 1e9
    print(f"{name:44s} {per_stage_ns:9.0f} ns/roll-stage ({rows}x{lanes})", flush=True)


def _subroll_kernel(shifts, a_ref, o_ref):
    x = a_ref[...]
    for _ in range(REPS // 8):
        for s in shifts:
            m = pltpu.roll(x, s, 0)
            x = jnp.where(m > x, m, x)
        x = x + 1e-30
    o_ref[...] = x


def time_roll_sub(name, rows, lanes, shifts):
    a = jnp.asarray(np.random.default_rng(0).normal(size=(rows, lanes)), jnp.float32)
    f = pl.pallas_call(
        partial(_subroll_kernel, shifts),
        out_shape=jax.ShapeDtypeStruct((rows, lanes), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )

    @jax.jit
    def run(a):
        def body(_, s):
            o = f(a + s * 1e-30)
            return jnp.float32(o[0, 0]) * 1e-30

        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0))

    try:
        t0 = time.perf_counter()
        float(np.asarray(run(a)))
        t0 = time.perf_counter()
        float(np.asarray(run(a)))
        dt = (time.perf_counter() - t0) / ITERS
    except Exception as e:  # noqa: BLE001
        print(f"{name:44s} FAILED: {type(e).__name__}: {str(e)[:90]}")
        return
    n_stage = (REPS // 8) * len(shifts)
    per_stage_ns = dt / n_stage * 1e9
    print(f"{name:44s} {per_stage_ns:9.0f} ns/roll-stage ({rows}x{lanes})", flush=True)


def main():
    D = jax.lax.Precision.DEFAULT
    H = jax.lax.Precision.HIGH
    X = jax.lax.Precision.HIGHEST
    LAST = (((1,), (1,)), ((), ()))  # contract last dim of both

    print("== compaction-shaped matmuls ==")
    # V1 banded: oh [128,128] @ vals_c^T -> [128, 16]
    time_matmul("banded oh@vals [128,128]@[128,16] HIGHEST", 128, 128, 16, X)
    time_matmul("banded oh@vals [128,128]@[128,16] DEFAULT", 128, 128, 16, D)
    # V3 full-K: oh [256,128] @ [128,16]
    time_matmul("fullK oh@vals [256,128]@[128,16] HIGHEST", 256, 128, 16, X)
    # V2 transposed: vals [16,128] @ ohT [128,256]
    time_matmul("valsT@ohT [16,128]@[128,256] HIGHEST", 16, 128, 256, X)
    time_matmul("valsT@ohT [16,128]@[128,256] HIGH", 16, 128, 256, H)
    time_matmul("valsT@ohT [16,128]@[128,256] DEFAULT", 16, 128, 256, D)
    # one-shot whole-kb compaction [16,4096]@[4096,256]
    time_matmul("valsT@ohT [16,4096]@[4096,256] HIGHEST", 16, 4096, 256, X)
    time_matmul("valsT@ohT [16,4096]@[4096,256] HIGH", 16, 4096, 256, H)

    print("== blend-shaped matmuls ==")
    time_matmul("power [256,8]@[8,256] HIGHEST", 256, 8, 256, X)
    time_matmul("power [256,8]@[8,256] DEFAULT", 256, 8, 256, D)
    time_matmul("cum triK [256,256]@[256,256] DEFAULT", 256, 256, 256, D)
    time_matmul("cum triK [256,256]@[256,256] HIGH", 256, 256, 256, H)
    time_matmul("cum triK [256,256]@[256,256] HIGHEST", 256, 256, 256, X)
    time_matmul("rgb w@colT [256,256]@[3,256]c HIGHEST", 256, 256, 3, X, contract=LAST)
    time_matmul("mask incl [32,128]@[128,128] DEFAULT", 32, 128, 128, D)
    time_matmul("inclT L@mfT [128,128]@[128,32] DEFAULT", 128, 128, 32, D)

    print("== big reference points ==")
    time_matmul("[512,512]@[512,512] DEFAULT", 512, 512, 512, D)
    time_matmul("[512,512]@[512,512] HIGH", 512, 512, 512, H)
    time_matmul("[512,512]@[512,512] HIGHEST", 512, 512, 512, X)

    print("== VPU roll stages (butterfly compaction) ==")
    time_roll("roll [18,4096] shifts 1..2048", 18, 4096, [1, 2, 4, 8, 16, 32, 64, 128, 256, 512, 1024, 2048])
    time_roll("roll [18,512] shifts 1..256", 18, 512, [1, 2, 4, 8, 16, 32, 64, 128, 256])
    time_roll("roll [8,4096] shifts 1..2048", 8, 4096, [1, 2, 4, 8, 16, 32, 64, 128, 256, 512, 1024, 2048])
    time_roll_sub("subroll [4096,8] shifts 1..2048", 4096, 8, [1, 2, 4, 8, 16, 32, 64, 128, 256, 512, 1024, 2048])
    time_roll_sub("subroll [4096,128] shifts 1..2048", 4096, 128, [1, 2, 4, 8, 16, 32, 64, 128, 256, 512, 1024, 2048])


if __name__ == "__main__":
    main()
