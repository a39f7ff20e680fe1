"""Benchmark harness: differentiable Gaussian-splat raster fwd+bwd at
Goliath scale (135k Gaussians, ~1024x667 image — the axe184 workload,
`/root/reference/configs/goliath_axe184.yml:108-127`).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: the reference repo publishes no numbers (BASELINE.md); the
denominator is an engineering estimate of the CUDA reference's training
throughput on a single modern GPU — ~100 fwd+bwd rasterizations/s at
1024x667 (~68 Mpix/s) for diff-gaussian-rasterization at this scale.
"""

import json
import os
import subprocess
import sys
import time


def _wait_for_tpu(max_tries=None, probe_timeout=120, sleep_s=None):
    """Wait out transient axon-tunnel outages before the main process
    initializes the backend (a failed/hung init inside this process is
    not recoverable, and the tunnel hangs rather than erroring). Probes
    in a short-lived subprocess so only ONE process ever touches the
    TPU at a time. Outages last multi-hour (CLAUDE.md), so the default
    budget is generous (~40 probes / ~2h); tune with
    D3GA_BENCH_WAIT_TRIES / D3GA_BENCH_WAIT_SLEEP, disable with
    D3GA_BENCH_WAIT=0."""
    if os.environ.get("D3GA_BENCH_WAIT", "1") == "0":
        return
    if max_tries is None:
        max_tries = int(os.environ.get("D3GA_BENCH_WAIT_TRIES", "40"))
    if sleep_s is None:
        sleep_s = int(os.environ.get("D3GA_BENCH_WAIT_SLEEP", "90"))
    code = (
        "import jax, numpy as np, jax.numpy as jnp;"
        "x = jnp.ones((8, 8)) @ jnp.ones((8, 8));"
        "assert float(np.asarray(x).ravel()[0]) == 8.0"
    )
    for i in range(max_tries):
        try:
            r = subprocess.run(
                [sys.executable, "-c", code], timeout=probe_timeout,
                stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
            )
            if r.returncode == 0:
                return
        except subprocess.TimeoutExpired:
            pass
        if i < max_tries - 1:
            print(
                f"bench: TPU tunnel unavailable (probe {i + 1}/{max_tries});"
                f" retrying in {sleep_s}s",
                file=sys.stderr,
            )
            time.sleep(sleep_s)


if __name__ == "__main__":
    # only the CLI waits; importing bench (e.g. for build_scene) must not
    # probe the TPU
    _wait_for_tpu()

import jax

from d3ga_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

import jax.numpy as jnp
import numpy as np

BASELINE_MPIX_S = 68.0  # estimated CUDA reference fwd+bwd throughput

H = int(os.environ.get("BENCH_H", "1024"))
W = int(os.environ.get("BENCH_W", "667"))
N_GAUSS = int(os.environ.get("BENCH_N", "135000"))
MAX_PER_TILE = int(os.environ.get("BENCH_K", "256"))


def build_scene(key):
    from d3ga_tpu.ops.quaternion import quat_normalize

    ks = jax.random.split(key, 6)
    # A human-ish scene: Gaussians in a 1.8m x 0.6m volume, 3.5m away.
    means = jnp.concatenate(
        [
            jax.random.normal(ks[0], (N_GAUSS, 1)) * 0.25,
            jax.random.normal(ks[1], (N_GAUSS, 1)) * 0.6,
            3.5 + jax.random.normal(ks[2], (N_GAUSS, 1)) * 0.15,
        ],
        axis=-1,
    )
    scales = jnp.exp(jax.random.uniform(ks[3], (N_GAUSS, 3), minval=-6.0, maxval=-4.6))
    rots = quat_normalize(jax.random.normal(ks[4], (N_GAUSS, 4)))
    opac = jax.random.uniform(ks[5], (N_GAUSS, 1), minval=0.3, maxval=0.95)
    colors = jax.random.uniform(jax.random.fold_in(key, 9), (N_GAUSS, 3))
    return means, scales, rots, opac, colors


def main():
    from d3ga_tpu.ops.covariance import covariance_from_scaling_rotation, strip_symmetric
    from d3ga_tpu.raster.camera import focal2fov, make_camera
    from d3ga_tpu.raster.tiles import rasterize_tiled

    camera = make_camera(
        np.eye(3), np.zeros(3), focal2fov(1100.0, W), focal2fov(1100.0, H), W, H
    )
    means, scales, rots, opac, colors = build_scene(jax.random.PRNGKey(0))
    cov6 = strip_symmetric(covariance_from_scaling_rotation(scales, rots))
    target = jax.random.uniform(jax.random.PRNGKey(1), (3, H, W))
    bg = jnp.zeros(3)

    use_pallas = os.environ.get("BENCH_PALLAS", "1") == "1"
    # batch>1 folds several frames into one rasterization (explicitly
    # batched sorts/binning + one blend over B*T tiles) — amortizes the
    # fixed per-op dispatch overhead. NOT the vmapped form (which the
    # remote compiler chokes on).
    batch = int(os.environ.get("BENCH_BATCH", "1"))

    if batch > 1:
        from d3ga_tpu.raster.camera import stack_cameras
        from d3ga_tpu.raster.tiles import rasterize_tiled_batch

        cams = stack_cameras([camera] * batch)

        def loss_fn(means, cov6, opac, colors):
            imgs, _ = rasterize_tiled_batch(
                means, cams, bg, cov3d=cov6, opacities=opac, colors=colors,
                max_per_tile=MAX_PER_TILE, use_pallas=use_pallas,
            )
            return jnp.mean(jnp.abs(imgs - target[None]))

        def tile(x):
            return jnp.broadcast_to(x[None], (batch,) + x.shape) + 0.0

        means, cov6, opac, colors = map(tile, (means, cov6, opac, colors))
    elif os.environ.get("BENCH_FUSED", "0") == "1":
        from d3ga_tpu.raster.tiles import rasterize_tiled_fused

        def loss_fn(means, cov6, opac, colors):
            img, _ = rasterize_tiled_fused(
                means, camera, bg, cov3d=cov6, opacities=opac, colors=colors,
                max_per_tile=MAX_PER_TILE,
            )
            return jnp.mean(jnp.abs(img - target))
    else:

        kb = int(os.environ.get("BENCH_KB", "4096"))
        sub_block = int(os.environ.get("BENCH_SUB_BLOCK", "4"))
        sub_cap = int(os.environ.get("BENCH_SUB_CAP", "1024"))
        super_factor = int(os.environ.get("BENCH_SF", "1"))
        coarse = os.environ.get("BENCH_COARSE", "dupsort_depth")
        dup = int(os.environ.get("BENCH_DUP", "3"))
        # follows the library default (depth_exact=True since round 5 —
        # CUDA-exact key semantics at ~0.9% throughput); set 0 to
        # measure the quantized-key variant
        depth_exact = os.environ.get("BENCH_DEPTH_EXACT", "1") == "1"

        def loss_fn(means, cov6, opac, colors):
            img, _ = rasterize_tiled(
                means, camera, bg, cov3d=cov6, opacities=opac, colors=colors,
                max_per_tile=MAX_PER_TILE, block_cap=kb, use_pallas=use_pallas,
                sub_block=sub_block, sub_cap=sub_cap, super_factor=super_factor,
                coarse=coarse, dup=dup, depth_exact=depth_exact,
            )
            return jnp.mean(jnp.abs(img - target))

    # Chained steps (params updated from grads, true data dependencies)
    # run inside ONE device dispatch via lax.scan: measures sustained
    # device throughput. (block_until_ready through the axon tunnel is
    # not reliably synchronous and per-dispatch RTT is tens of ms, so
    # host-side loops under-report badly; a production training loop
    # amortizes dispatch the same way.)
    #
    # unroll: this rig pays a ~3 ms floor PER LOOP ITERATION (the axon
    # tunnel round-trips loop control; tools/rig_probe.py E4), so the
    # scan body is unrolled to amortize it — exactly what a production
    # training loop on this transport would do.
    iters = 20
    unroll = int(os.environ.get("BENCH_UNROLL", "20"))

    def one_step(carry, _):
        means, cov6, opac, colors, _ = carry
        loss, g = jax.value_and_grad(loss_fn, argnums=(0, 1, 2, 3))(
            means, cov6, opac, colors
        )
        lr = 1e-9
        return (
            means - lr * g[0],
            cov6 - lr * g[1],
            opac - lr * g[2],
            colors - lr * g[3],
            loss,
        ), None

    @jax.jit
    def run(means, cov6, opac, colors):
        init = (means, cov6, opac, colors, jnp.float32(0))
        return jax.lax.scan(
            one_step, init, None, length=iters, unroll=unroll
        )[0][-1]

    if os.environ.get("BENCH_CHECK", "0") == "1":
        # one-off semantic check: report selection-cap overflow so cap
        # sweeps stay honest (drops are counted, never silent)
        import sys

        if batch > 1:
            _, aux = jax.jit(
                lambda m, c, o, col: rasterize_tiled_batch(
                    m, cams, bg, cov3d=c, opacities=o, colors=col,
                    max_per_tile=MAX_PER_TILE, use_pallas=use_pallas,
                )
            )(means, cov6, opac, colors)
        else:
            _, aux = jax.jit(
                lambda m, c, o, col: rasterize_tiled(
                    m, camera, bg, cov3d=c, opacities=o, colors=col,
                    max_per_tile=MAX_PER_TILE,
                    block_cap=int(os.environ.get("BENCH_KB", "4096")),
                    sub_block=int(os.environ.get("BENCH_SUB_BLOCK", "4")),
                    sub_cap=int(os.environ.get("BENCH_SUB_CAP", "1024")),
                    super_factor=int(os.environ.get("BENCH_SF", "1")),
                    coarse=os.environ.get("BENCH_COARSE", "dupsort_depth"),
                    dup=int(os.environ.get("BENCH_DUP", "3")),
                    use_pallas=use_pallas,
                )
            )(means, cov6, opac, colors)
        print(
            f"overflow={int(aux.overflow)} max_per_tile={int(aux.max_per_tile)}"
            f" n_contrib={int(aux.n_contrib)}",
            file=sys.stderr,
        )

    # warmup/compile
    float(np.asarray(run(means, cov6, opac, colors)))

    t0 = time.perf_counter()
    loss = run(means, cov6, opac, colors)
    float(np.asarray(loss))  # full sync
    dt = (time.perf_counter() - t0) / iters

    mpix_s = (batch * H * W) / dt / 1e6
    rec = {
        "metric": "raster_fwd_bwd_throughput",
        "value": round(mpix_s, 3),
        "unit": "Mpixels/s",
        "vs_baseline": round(mpix_s / BASELINE_MPIX_S, 4),
    }
    rec.update(roofline_fields(dt, batch))
    print(json.dumps(rec))


# ----- roofline accounting (VERDICT r4 #2) -----------------------------
# v5e nominal peaks and the RIG-ACHIEVED dense rates measured by
# tools/roofline_probe.py (chained protocol — what dense XLA ops
# actually sustain through this axon tunnel; see PERF_NOTES roofline
# section for the full table).
V5E_HBM_GBS = 819.0
V5E_BF16_TFLOPS = 197.0
RIG_DENSE_GBS = float(os.environ.get("RIG_DENSE_GBS", "50.0"))
RIG_BF16_TFLOPS = float(os.environ.get("RIG_BF16_TFLOPS", "0")) or None


def roofline_fields(dt, batch=1):
    """Implied utilization of the measured step: logical one-pass bytes
    and MXU FLOPs of the champion pipeline's dominant ops (derived from
    the config shapes), divided by the step wall time. Sort-pass and
    XLA-internal amplification are NOT included — these are LOWER
    bounds on traffic, making the utilization fractions upper bounds
    on how bandwidth-bound the step could possibly be."""
    n = N_GAUSS * batch
    ntx, nty = -(-W // 16), -(-H // 16)
    T = ntx * nty * batch
    K = MAX_PER_TILE
    dup2 = int(os.environ.get("BENCH_DUP", "3")) ** 2
    C = 3
    CR = 6 + C
    P = 256
    f32 = 4
    # one-pass logical bytes (read+write) per step, fwd+bwd
    b_project = 2 * n * (60 + 40) * f32 // 4  # params+intermediates, fwd+bwd
    b_sort_sel = 2 * (dup2 * n) * 2 * f32      # 2-operand key sort, 1 pass
    b_gather = 2 * (T * K) * CR * f32          # record gather fwd
    b_blend = 2 * (2 * T * CR * K * f32 + 2 * (C + 1) * T * P * f32)
    b_combine = 2 * (T * K) * (CR + 1) * f32 * 2  # bwd sort+combine, 1 pass each
    bytes_total = b_project + b_sort_sel + b_gather + b_blend + b_combine
    # MXU MACs: blend fwd ~ T*(2*P*8*K + 0.25*P*K^2 + (C+1)*P*K)*2(split),
    # bwd ~ 2.5x fwd (recompute + transposes)
    macs_fwd = T * (2 * P * 8 * K + 0.25 * P * K * K + (C + 1) * P * K) * 2
    flops = 2 * macs_fwd * 3.5
    gbs = bytes_total / dt / 1e9
    tflops = flops / dt / 1e12
    out = {
        "step_ms": round(dt * 1e3, 3),
        "logical_bytes_mb": round(bytes_total / 1e6, 1),
        "implied_gbs": round(gbs, 2),
        "implied_tflops": round(tflops, 2),
        "hbm_frac_nominal": round(gbs / V5E_HBM_GBS, 4),
        "hbm_frac_rig_dense": round(gbs / RIG_DENSE_GBS, 4),
        "mxu_frac_nominal": round(tflops / V5E_BF16_TFLOPS, 4),
    }
    return out


if __name__ == "__main__":
    main()
