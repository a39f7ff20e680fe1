"""Bisect which part of the fused kernel triggers the Mosaic
value-dynamic_slice error (run on TPU; each stage either compiles or
raises quickly)."""

import os
import sys
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from d3ga_tpu.raster.attic import pallas_fused as F
from tools.fused_probe import make_inputs

K, C, NB, NC = 256, 3, 2, 4
CHUNK = F.CHUNK
TB = F.TB
P = F.P


def run_variant(name, kernel):
    vals, rects = make_inputs(NB, NC, C)
    try:
        out = pl.pallas_call(
            partial(kernel, K, C, NC),
            grid=(NB,),
            in_specs=[
                pl.BlockSpec((1, NC, 16, CHUNK), lambda i: (i, 0, 0, 0)),
                pl.BlockSpec((1, NC, CHUNK), lambda i: (i, 0, 0)),
            ] + F._table_specs(K, NC),
            out_specs=pl.BlockSpec((1, TB, P, C + 1), lambda i: (i, 0, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((NB, TB, P, C + 1), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((K + CHUNK, 16), jnp.float32),
                pltpu.VMEM((2, NC, CHUNK), jnp.float32),
                pltpu.SMEM((NC,), jnp.float32),
            ],
        )(vals, rects, *F._tables(K, NC))
        np.asarray(out)
        print(f"{name}: OK", flush=True)
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:180]}", flush=True)


def v0_writes_only(K, C, NC, vals_ref, rects_ref, b, tK, tc, tr, out_ref,
                   rec_s, ps_s, off_s):
    def tile_body(t, _):
        out_ref[0, t] = jnp.full((P, C + 1), 1.0, jnp.float32)
        return 0

    jax.lax.fori_loop(0, TB, tile_body, 0)


def v1_mask_positions(K, C, NC, vals_ref, rects_ref, b, tK, tc, tr, out_ref,
                      rec_s, ps_s, off_s):
    tri_c = tc[...]
    tri_r = tr[...]
    rects = rects_ref[0]

    def tile_body(t, _):
        tx = t % F.BLOCK
        ty = t // F.BLOCK
        sel, pos0, row_off, counts = F._tile_mask_positions(
            rects, tx, ty, K, tri_c, tri_r
        )
        ps_s[0] = sel
        ps_s[1] = pos0
        off_s[...] = row_off[:, 0]
        out_ref[0, t] = jnp.full((P, C + 1), counts, jnp.float32)
        return 0

    jax.lax.fori_loop(0, TB, tile_body, 0)


def v2_compact(K, C, NC, vals_ref, rects_ref, b, tK, tc, tr, out_ref,
               rec_s, ps_s, off_s):
    tri_c = tc[...]
    tri_r = tr[...]
    iota_win = jax.lax.broadcasted_iota(jnp.float32, (CHUNK, CHUNK), 0)
    vals3 = vals_ref.at[0]
    rects = rects_ref[0]

    def tile_body(t, _):
        tx = t % F.BLOCK
        ty = t // F.BLOCK
        counts = F._compact(
            vals3, rects, tx, ty, K, NC, tri_c, tri_r, iota_win,
            rec_s, ps_s, off_s,
        )
        rec = rec_s[:K, :]
        out_ref[0, t] = jnp.broadcast_to(
            jnp.sum(rec, axis=0)[: C + 1][None, :], (P, C + 1)
        ) + counts
        return 0

    jax.lax.fori_loop(0, TB, tile_body, 0)


def v3_blend(K, C, NC, vals_ref, rects_ref, b, tK, tc, tr, out_ref,
             rec_s, ps_s, off_s):
    basis = b[...]
    triK = tK[...]
    tri_c = tc[...]
    tri_r = tr[...]
    iota_win = jax.lax.broadcasted_iota(jnp.float32, (CHUNK, CHUNK), 0)
    vals3 = vals_ref.at[0]
    rects = rects_ref[0]

    def tile_body(t, _):
        tx = t % F.BLOCK
        ty = t // F.BLOCK
        F._compact(
            vals3, rects, tx, ty, K, NC, tri_c, tri_r, iota_win,
            rec_s, ps_s, off_s,
        )
        rec = rec_s[:K, :]
        sx = (tx * F.TILE).astype(jnp.float32)
        sy = (ty * F.TILE).astype(jnp.float32)
        coeffs_t = F._coeffs_from_rec(rec, sx, sy)
        out = F._blend_forward(
            coeffs_t, rec[:, 5][None, :], rec[:, 6 : 6 + C], basis, triK, C
        )
        out_ref[0, t] = out
        return 0

    jax.lax.fori_loop(0, TB, tile_body, 0)


if __name__ == "__main__":
    run_variant("v0 writes-only", v0_writes_only)
    run_variant("v1 mask+positions", v1_mask_positions)
    run_variant("v2 compact", v2_compact)
    run_variant("v3 blend", v3_blend)
