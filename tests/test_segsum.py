"""Pallas segmented-sum backward combine (raster/pallas_segsum.py):
kernel unit tests vs jax.ops.segment_sum and gradient parity of the
REC_GRAD=segsum champion-path variant vs the XLA scatter-add.

Interpret mode on CPU (tests/conftest.py forces the CPU backend); the
Mosaic-compiled path is exercised by the on-chip A/B + PALLAS_PARITY
refresh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from d3ga_tpu.raster.pallas_segsum import (
    block_width,
    combine_from_slots,
    combine_sorted,
)
from d3ga_tpu.raster.tiles import rasterize_tiled

from test_raster import random_scene, simple_camera


def make_sorted_ids(rng, n, dup2, m, sentinel_frac=0.5):
    """Random ascending ids in [0, n) with each id used <= dup2 times,
    padded with >= n sentinels to length m."""
    counts = rng.integers(0, dup2 + 1, size=n)
    ids = np.repeat(np.arange(n), counts)
    if ids.size > int(m * (1 - sentinel_frac)):
        ids = ids[: int(m * (1 - sentinel_frac))]
    pad = m - ids.size
    ids = np.concatenate([ids, np.full(pad, n, np.int32)])
    return np.sort(ids).astype(np.int32)


class TestCombineSorted:
    @pytest.mark.parametrize(
        "n,dup2,m",
        [
            (500, 9, 3000),      # typical: one output block
            (600, 64, 4000),     # B=256 -> ids straddle block bounds
            (40, 4, 64),         # tiny scene, mostly sentinels
        ],
    )
    def test_matches_segment_sum(self, n, dup2, m):
        rng = np.random.default_rng(7)
        ids = make_sorted_ids(rng, n, dup2, m)
        g = rng.normal(size=(12, m)).astype(np.float32)
        out = combine_sorted(
            jnp.asarray(ids), jnp.asarray(g), n, dup2, interpret=True
        )
        ref = jax.ops.segment_sum(
            jnp.asarray(g).T, jnp.asarray(ids), num_segments=n + 1
        )[:n]
        # bf16 hi/lo split: lo's rounding leaves ~2^-17 relative error
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4
        )

    def test_full_runs_and_empty_ids(self):
        # every id either exactly dup2 times or absent; block boundary
        # id (B-1, B) straddle with dup2=64 -> B=256
        n, dup2 = 512, 64
        B = block_width(dup2)
        assert B == 256
        rng = np.random.default_rng(3)
        used = np.arange(0, n, 2)
        ids = np.sort(np.repeat(used, dup2)).astype(np.int32)
        m = ids.size + 37
        ids = np.concatenate([ids, np.full(37, n, np.int32)])
        g = rng.normal(size=(12, m)).astype(np.float32)
        out = combine_sorted(
            jnp.asarray(ids), jnp.asarray(g), n, dup2, interpret=True
        )
        ref = jax.ops.segment_sum(
            jnp.asarray(g).T, jnp.asarray(ids), num_segments=n + 1
        )[:n]
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4
        )
        assert np.all(np.asarray(out)[1::2] == 0.0)

    def test_combine_from_slots(self):
        rng = np.random.default_rng(11)
        T, CR, K, n, dup2 = 6, 12, 32, 150, 9
        drec = rng.normal(size=(T, CR, K)).astype(np.float32)
        idx = rng.integers(0, n + 1, size=(T, K)).astype(np.int32)
        # enforce the <= dup2 occurrences invariant
        flat = idx.reshape(-1)
        for gid, cnt in zip(*np.unique(flat, return_counts=True)):
            if gid < n and cnt > dup2:
                kill = np.where(flat == gid)[0][dup2:]
                flat[kill] = n
        idx = flat.reshape(T, K)
        out = combine_from_slots(
            jnp.asarray(drec), jnp.asarray(idx), n, dup2, interpret=True
        )
        g_rows = np.swapaxes(drec, 1, 2).reshape(T * K, CR)
        ref = np.zeros((n + 1, CR), np.float32)
        np.add.at(ref, flat, g_rows)
        ref[n] = 0.0
        np.testing.assert_allclose(
            np.asarray(out), ref, rtol=1e-4, atol=1e-4
        )


class TestSelextSlice:
    def test_slice_extraction_bitmatches_gather(self, monkeypatch):
        """D3GA_SELEXT=slice (per-tile dynamic K-slice segment
        extraction) must render bit-identically to the element-gather
        default, including over-cap tiles and the sentinel tail (the
        kk padding prevents dynamic_slice window shifting)."""
        import d3ga_tpu.raster.tiles as tiles

        cam = simple_camera(w=96, h=64)
        means, scales, rots, opac, colors = random_scene(
            jax.random.PRNGKey(21), n=500
        )

        def render():
            return rasterize_tiled(
                means, cam, jnp.array([0.3, 0.1, 0.2]), scales=scales,
                rotations=rots, opacities=opac, colors=colors,
                max_per_tile=32, coarse="dupsort_depth", dup=3,
                use_pallas=True, pallas_interpret=True,
            )

        monkeypatch.setattr(tiles, "SELEXT", "gather")
        ref, aux_r = render()
        monkeypatch.setattr(tiles, "SELEXT", "slice")
        img, aux_s = render()
        assert np.array_equal(np.asarray(img), np.asarray(ref))
        for f in aux_r._fields:
            assert int(getattr(aux_r, f)) == int(getattr(aux_s, f))


class TestSelextPallas:
    def test_extract_slices_exact(self):
        """extract_slices == per-start numpy windows (zero pad past m),
        including o=0 (aligned), lane-boundary and s=m edge starts."""
        from d3ga_tpu.raster.pallas_extract import extract_slices

        rng = np.random.default_rng(5)
        m, kk = 5000, 256
        stream = jnp.asarray(
            rng.integers(0, 1 << 30, size=(m,), dtype=np.int32)
        )
        starts_np = np.sort(
            np.concatenate(
                [
                    rng.integers(0, m + 1, size=30),
                    [0, 1, 127, 128, 129, m - 1, m],
                ]
            ).astype(np.int32)
        )
        out = extract_slices(
            stream, jnp.asarray(starts_np), kk, interpret=True
        )
        pad = np.concatenate(
            [np.asarray(stream), np.zeros((kk + 128,), np.int32)]
        )
        ref = np.stack([pad[s : s + kk] for s in starts_np])
        assert np.array_equal(np.asarray(out), ref)

    def test_pallas_extraction_bitmatches_gather(self, monkeypatch):
        """D3GA_SELEXT=pallas (single-program VMEM extraction kernel)
        must render bit-identically to the element-gather path at a
        128-multiple K (the kernel's lane-chunk requirement; other K
        fall back to the slice path)."""
        import d3ga_tpu.raster.tiles as tiles

        cam = simple_camera(w=96, h=64)
        means, scales, rots, opac, colors = random_scene(
            jax.random.PRNGKey(21), n=500
        )

        def render():
            return rasterize_tiled(
                means, cam, jnp.array([0.3, 0.1, 0.2]), scales=scales,
                rotations=rots, opacities=opac, colors=colors,
                max_per_tile=128, coarse="dupsort_depth", dup=3,
                use_pallas=True, pallas_interpret=True,
            )

        monkeypatch.setattr(tiles, "SELEXT", "gather")
        ref, aux_r = render()
        monkeypatch.setattr(tiles, "SELEXT", "pallas")
        img, aux_s = render()
        assert np.array_equal(np.asarray(img), np.asarray(ref))
        for f in aux_r._fields:
            assert int(getattr(aux_r, f)) == int(getattr(aux_s, f))


class TestSegsumChampionPath:
    @pytest.mark.parametrize("k,n,dup", [(32, 300, 2), (16, 600, 3)])
    def test_segsum_grads_match_scatter_add(self, monkeypatch, k, n, dup):
        """REC_GRAD=segsum must reproduce the XLA scatter-add gradients
        on the dupsort_depth champion path, including over-cap tiles
        (sentinel slots) and clamped spans. The forward image is the
        SAME pallas blend either way — bit-identical."""
        import d3ga_tpu.raster.tiles as tiles

        cam = simple_camera(w=80, h=56)
        means, scales, rots, opac, colors = random_scene(
            jax.random.PRNGKey(13), n=n
        )

        def loss(means, scales, rots, opac, colors):
            img, aux = rasterize_tiled(
                means, cam, jnp.array([0.1, 0.2, 0.3]),
                scales=scales, rotations=rots, opacities=opac,
                colors=colors, max_per_tile=k, coarse="dupsort_depth",
                dup=dup, use_pallas=True, pallas_interpret=True,
            )
            return jnp.sum(img**2), (img, aux)

        monkeypatch.setattr(tiles, "REC_GRAD", "add")
        (_, (ref_img, ref_aux)), ref_g = jax.value_and_grad(
            loss, argnums=(0, 1, 2, 3, 4), has_aux=True
        )(means, scales, rots, opac, colors)

        monkeypatch.setattr(tiles, "REC_GRAD", "segsum")
        (_, (img2, _aux2)), g2 = jax.value_and_grad(
            loss, argnums=(0, 1, 2, 3, 4), has_aux=True
        )(means, scales, rots, opac, colors)

        if k == 16:
            assert int(ref_aux.overflow) > 0
        assert np.array_equal(np.asarray(img2), np.asarray(ref_img))
        for a, b in zip(ref_g, g2):
            # segment sums accumulate via bf16 hi/lo matmuls; XLA's
            # scatter combine associates differently — allow the split's
            # ~2^-17 relative slop
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), rtol=1e-3, atol=1e-4
            )
