"""Microbenchmark the matmul shapes/precisions and VPU roll ops the
fused rasterizer kernels are built from, ON-CHIP.

Method: each case is ONE Pallas kernel containing a fori_loop whose
body does UNROLL data-dependent repetitions of the op. The same kernel
runs at two trip counts; the slope (t(N2)-t(N1))/((N2-N1)*UNROLL)
cancels dispatch/compile-cache floors (the axon tunnel has a ~3 ms
per-dispatch floor that would otherwise swamp sub-us ops).

Run: python -u tools/mxu_probe.py
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

UNROLL = 8
N1, N2 = 512, 2048


def _time_case(name, build_kernel, args, per_op_info):
    """build_kernel(n_iters) -> jitted fn(*args) -> scalar."""
    try:
        runs = {}
        for n in (N1, N2):
            f = build_kernel(n)
            float(np.asarray(f(*args)))  # compile + warm
            t0 = time.perf_counter()
            float(np.asarray(f(*args)))
            runs[n] = time.perf_counter() - t0
        per_op = (runs[N2] - runs[N1]) / ((N2 - N1) * UNROLL)
    except Exception as e:  # noqa: BLE001
        print(f"{name:46s} FAILED: {type(e).__name__}: {str(e)[:110]}", flush=True)
        return None
    extra = per_op_info(per_op) if per_op_info else ""
    print(f"{name:46s} {per_op * 1e9:9.0f} ns/op  {extra}", flush=True)
    return per_op


def matmul_case(name, M, K, N, prec, contract_last=False):
    dims = (((1,), (1,)), ((), ())) if contract_last else (((1,), (0,)), ((), ()))
    bshape = (N, K) if contract_last else (K, N)
    a = jnp.asarray(np.random.default_rng(0).normal(size=(M, K)) * 0.01, jnp.float32)
    b = jnp.asarray(np.random.default_rng(1).normal(size=bshape) * 0.01, jnp.float32)

    def kernel(n, a_ref, b_ref, o_ref):
        def body(_, carry):
            acc, aa = carry
            for _ in range(UNROLL):
                acc = jax.lax.dot_general(
                    aa, b_ref[...], dims, precision=prec,
                    preferred_element_type=jnp.float32,
                )
                aa = aa + acc[0, 0] * 1e-30
            return acc, aa

        acc0 = jnp.zeros((M, N), jnp.float32)
        acc, _ = jax.lax.fori_loop(0, n, body, (acc0, a_ref[...]))
        o_ref[...] = acc

    def build(n):
        f = pl.pallas_call(
            partial(kernel, n),
            out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        return jax.jit(lambda a, b: f(a, b)[0, 0])

    macs = M * K * N
    _time_case(
        name, build, (a, b),
        lambda t: f"{macs / t / 1e12:8.2f} real-TMAC/s",
    )


def roll_case(name, rows, lanes, axis, shifts):
    a = jnp.asarray(np.random.default_rng(0).normal(size=(rows, lanes)), jnp.float32)

    def kernel(n, a_ref, o_ref):
        def body(_, x):
            for s in shifts[: UNROLL]:
                m = pltpu.roll(x, s, axis)
                x = jnp.where(m > x, m, x * 0.999999)
            return x

        o_ref[...] = jax.lax.fori_loop(0, n, body, a_ref[...])

    def build(n):
        f = pl.pallas_call(
            partial(kernel, n),
            out_shape=jax.ShapeDtypeStruct((rows, lanes), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        return jax.jit(lambda a: f(a)[0, 0])

    _time_case(name, build, (a,), lambda t: f"(roll+select {rows}x{lanes})")


def main():
    D = jax.lax.Precision.DEFAULT
    H = jax.lax.Precision.HIGH
    X = jax.lax.Precision.HIGHEST

    print("== compaction-shaped matmuls ==", flush=True)
    matmul_case("banded oh@vals [128,128]@[128,16] HIGHEST", 128, 128, 16, X)
    matmul_case("banded oh@vals [128,128]@[128,16] DEFAULT", 128, 128, 16, D)
    matmul_case("valsT@ohT [16,128]@[128,256] HIGHEST", 16, 128, 256, X)
    matmul_case("valsT@ohT [16,4096]@[4096,256] HIGHEST", 16, 4096, 256, X)
    matmul_case("valsT@ohT [16,4096]@[4096,256] HIGH", 16, 4096, 256, H)

    print("== blend-shaped matmuls ==", flush=True)
    matmul_case("power [256,8]@[8,256] HIGHEST", 256, 8, 256, X)
    matmul_case("power [256,8]@[8,256] DEFAULT", 256, 8, 256, D)
    matmul_case("cum triK [256,256]@[256,256] DEFAULT", 256, 256, 256, D)
    matmul_case("cum triK [256,256]@[256,256] HIGH", 256, 256, 256, H)
    matmul_case("cum triK [256,256]@[256,256] HIGHEST", 256, 256, 256, X)
    matmul_case("rgb w@colT [256,256]x[3,256]c HIGHEST", 256, 256, 3, X, contract_last=True)
    matmul_case("rgb w@colT [256,256]x[3,256]c DEFAULT", 256, 256, 3, D, contract_last=True)

    print("== reference points ==", flush=True)
    matmul_case("[512,512]@[512,512] DEFAULT", 512, 512, 512, D)
    matmul_case("[512,512]@[512,512] HIGH", 512, 512, 512, H)
    matmul_case("[512,512]@[512,512] HIGHEST", 512, 512, 512, X)

    print("== VPU rolls ==", flush=True)
    roll_case("lane roll [19,4096]", 19, 4096, 1, [1, 2, 4, 8, 16, 32, 64, 128])
    roll_case("lane roll [19,4096] big-shift", 19, 4096, 1, [256, 512, 1024, 2048, 3072, 3584, 3840, 3968])
    roll_case("lane roll [8,4096]", 8, 4096, 1, [1, 2, 4, 8, 16, 32, 64, 128])
    roll_case("sublane roll [4096,8]", 4096, 8, 0, [1, 2, 4, 8, 16, 32, 64, 128])


if __name__ == "__main__":
    main()
