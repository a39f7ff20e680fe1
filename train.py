"""Training CLI: python train.py <config.yml>

TPU-native counterpart of `/root/reference/train.py`: loads a YAML
config, builds the dataset/batcher/avatar, and runs the jitted training
loop with the reference's loss assembly, checkpoint cadence, NaN guard,
and progress logging. `dataset_name: synthetic` trains the synthetic
drivable avatar end-to-end without capture data (used for smoke tests
and benchmarking); goliath/actorshq use the capture readers.
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from d3ga_tpu.utils.log import logger
from d3ga_tpu.utils.cache import enable_compile_cache

enable_compile_cache()


def load_config(path):
    """YAML + ${} interpolation (OmegaConf is not installed in this
    image; `d3ga_tpu.utils.config` implements the subset used)."""
    from d3ga_tpu.utils.config import load_yaml_config

    return load_yaml_config(path)


def check_loss(metrics, iteration):
    """NaN guard (`/root/reference/train.py:64-69`)."""
    total = float(metrics["total_loss"])
    if not np.isfinite(total):
        logger.error(f"iter={iteration}: {metrics}")
        raise ValueError("loss is NaN")


def _widen_raster_opts(model_config, train_config=None, clamp_overflow=None) -> bool:
    """One widening step of the raster selection caps after observed
    overflow. dup 4 -> 6 -> 8, then the uncapped-span "topk" funnel,
    then (the last remaining static cap, matching the uncapped CUDA
    reference `renderer.py:130-141`) the per-tile record budget
    max_per_tile 256 -> 384 -> 512 in 128-lane increments.

    clamp_overflow (the span-clamp part of the overflow counter,
    RasterAux.clamp_overflow) routes the escalation: 0 means the dup
    window drops nothing — the overflow is per-tile-cap drops, so dup
    widening is skipped and K escalates directly (no useless
    recompiles). None/negative = unknown, widen conservatively.
    Returns True if anything changed (caller must rebuild/recompile the
    step). Mutating the config dicts in place is safe: the jitted steps
    capture them only at trace time."""
    opts = model_config.setdefault("raster_opts", {})
    span_capped = opts.get("coarse", "topk").startswith("dupsort")
    if span_capped and (clamp_overflow is None or clamp_overflow != 0):
        dup = int(opts.get("dup", 2))
        if dup < 8:
            opts["dup"] = min(dup + 2, 8)
            return True
        opts.pop("dup", None)
        opts["coarse"] = "topk"
        return True
    if train_config is not None:
        k = int(train_config.get("max_per_tile", 256))
        if k < 512:
            # snap UP to a 128 multiple: K is the Pallas blend block's
            # lane dim and must be 128-divisible in compiled mode
            train_config["max_per_tile"] = min(-(-(k + 128) // 128) * 128, 512)
            return True
    return False


def build_synthetic(config, split="train", return_teacher=False):
    """Self-consistent synthetic task: a hidden 'teacher' avatar (same
    architecture, different seed) renders the ground-truth images and
    silhouettes for every (frame, camera); the trained 'student' must
    reproduce them — so the losses are actually minimizable and eval
    metrics are meaningful.

    Held-out protocol (mirrors the capture datasets' test-camera split,
    `actorshq_dataset.py:219-226`): with >1 camera, the LAST camera is
    excluded from training and `split="test"` iterates it
    deterministically over all frames. `return_teacher` additionally
    returns teacher_render(lbs, camera, frame_idx, camera_idx) ->
    (image, alpha, silhouette) so trajectories (CAM_360) can be scored
    against ground truth."""
    from d3ga_tpu.data.synthetic import build_synthetic_avatar, orbit_camera
    from d3ga_tpu.model.avatar import avatar_forward, init_avatar
    from d3ga_tpu.raster.tiles import rasterize_tiled

    tcfg = config.get("train", {})
    h = config.get("image_height", 128)
    w = config.get("image_width", 128)
    kwargs = dict(
        n_garments=config.get("n_garments", 2),
        n_gaussians=config.get("n_gaussians", 512),
        n_frames=config.get("n_frames", 16),
        n_cameras=config.get("n_cameras", 4),
        cage_res=config.get("cage_res", 2),
        config_overrides={
            "use_blur": tcfg.get("use_blur", False),
            "use_color_calib": tcfg.get("use_color_calib", True),
            "use_opt_smplx": tcfg.get("use_opt_smplx", False),
            "raster_backend": tcfg.get("raster_backend", "xla"),
            "raster_opts": tcfg.get("raster_opts", {}),
        },
    )
    model, skel, lbs_dim = build_synthetic_avatar(**kwargs)
    teacher_params = init_avatar(jax.random.PRNGKey(999), model)

    cameras = [
        orbit_camera(2 * np.pi * i / model.n_cameras, w, h)
        for i in range(model.n_cameras)
    ]

    max_per_tile = tcfg.get("max_per_tile", 128)

    @jax.jit
    def teacher_render(lbs, camera, frame_idx, camera_idx):
        batch = {
            "camera": camera, "lbs": lbs,
            "frame_idx": frame_idx, "camera_idx": camera_idx,
        }
        pkg = avatar_forward(teacher_params, model, batch, training=False)
        img, alpha, _ = rasterize_tiled(
            pkg["means3D"], camera, jnp.ones(3),
            cov3d=pkg["cov3D_precomp"], opacities=pkg["opacities"],
            colors=pkg["rgb"], max_per_tile=max_per_tile, return_alpha=True,
        )
        sil, _ = rasterize_tiled(
            pkg["means3D"], camera, jnp.zeros(3),
            cov3d=pkg["cov3D_precomp"], opacities=pkg["opacities"],
            colors=pkg["silhouette_rgb"], max_per_tile=max_per_tile,
        )
        return img, alpha, sil

    cache = {}
    # hold out the last camera from training (>=2 cameras)
    n_train_cams = model.n_cameras - 1 if model.n_cameras > 1 else 1

    def get_frame(fi, ci):
        if (fi, ci) not in cache:
            pose = jax.random.normal(jax.random.PRNGKey(fi), (lbs_dim,)) * 0.1
            img, alpha, sil = teacher_render(
                pose, cameras[ci], jnp.int32(fi), jnp.int32(ci)
            )
            cache[(fi, ci)] = {
                "camera": cameras[ci],
                "lbs": pose,
                "frame_idx": jnp.int32(fi),
                "camera_idx": jnp.int32(ci),
                "image": jnp.clip(img, 0, 1),
                "alpha": jnp.clip(alpha, 0, 1)[None],
                "silhouette": jnp.clip(sil, 0, 1),
            }
        return cache[(fi, ci)]

    def frame_iter(rng_seed=0):
        rng = np.random.default_rng(rng_seed)
        while True:
            yield get_frame(
                int(rng.integers(model.n_frames)), int(rng.integers(n_train_cams))
            )

    def test_iter():
        ci = model.n_cameras - 1  # the held-out camera
        fi = 0
        while True:
            yield get_frame(fi % model.n_frames, ci)
            fi += 1

    frames = test_iter() if split == "test" else frame_iter()
    if split != "test" and tcfg.get("use_opt_smplx", False):
        # per-frame optimizable pose corrections on the synthetic task:
        # init from the (deterministic) teacher poses so test.py's
        # optimized-pose mining + PCA path is exercisable end-to-end
        poses = np.stack(
            [
                np.asarray(jax.random.normal(jax.random.PRNGKey(fi), (lbs_dim,)))
                * 0.1
                for fi in range(model.n_frames)
            ]
        )
        frames = {
            "train": frames,
            "smplx_init": {
                "poses": poses,
                "rh": np.zeros((model.n_frames, 3), np.float32),
                "th": np.zeros((model.n_frames, 3), np.float32),
            },
        }
    if return_teacher:
        return model, frames, teacher_render
    return model, frames


def training(config):
    from d3ga_tpu.model.avatar import init_avatar
    from d3ga_tpu.train.checkpoint import restore_checkpoint, save_checkpoint
    from d3ga_tpu.train.losses import init_vgg19_features
    from d3ga_tpu.train.optim import lr_tree_from_config, make_optimizer
    from d3ga_tpu.train.step import LossWeights, make_train_step

    tcfg = config.get("train", {})
    run_dir = tcfg.get("run_dir", "experiments/run")
    os.makedirs(run_dir, exist_ok=True)
    os.makedirs(os.path.join(run_dir, "checkpoints"), exist_ok=True)
    os.makedirs(os.path.join(run_dir, "progress"), exist_ok=True)

    dataset_name = config.get("dataset_name", "synthetic")
    if dataset_name == "synthetic":
        model, frames = build_synthetic(config)
    else:
        model, frames = build_capture(config)

    init_kwargs = {}
    if isinstance(frames, dict) and "smplx_init" in frames:
        si = frames.pop("smplx_init")
        init_kwargs = dict(
            init_smplx_poses=si["poses"],
            init_smplx_rh=si["rh"],
            init_smplx_th=si["th"],
        )

    # background prefetch: overlap batch assembly + host->device copies
    # with device compute (torch DataLoader workers analog,
    # `/root/reference/train.py:161-170`). train.prefetch: 0 disables.
    prefetch_depth = int(tcfg.get("prefetch", 2))
    prefetchers = []
    if prefetch_depth > 0:
        from d3ga_tpu.data.prefetch import Prefetcher

        def _wrap(it):
            p = Prefetcher(it, depth=prefetch_depth)
            prefetchers.append(p)
            return p

        if isinstance(frames, dict):
            frames = dict(
                frames,
                train=_wrap(frames["train"]),
                **(
                    {"warmup": _wrap(frames["warmup"])}
                    if "warmup" in frames
                    else {}
                ),
            )
        else:
            frames = _wrap(frames)
    params = init_avatar(
        jax.random.PRNGKey(tcfg.get("seed", 17)), model, **init_kwargs
    )
    n_params = sum(x.size for x in jax.tree.leaves(params))
    logger.info(f"Total number of parameters {n_params}")

    # Fully-sharded training (train.sharded: {data: D, model: M}): runs
    # the shard_map step (Gaussian-sharded geometry, collective raster,
    # psum'd grads) over a ("data","model") device mesh. Checkpoints are
    # saved with UNPADDED per-Gaussian leaves, so eval and single-device
    # resume work unchanged; the optimizer state restarts on resume.
    sh_cfg = tcfg.get("sharded") or {}
    use_sharded = bool(sh_cfg)
    sharded_first_iter = 0
    if use_sharded:
        from d3ga_tpu.dist.mesh import make_mesh
        from d3ga_tpu.dist.step_shard import (
            make_sharded_train_step,
            pad_params_for_shards,
            unpad_params_for_shards,
        )

        data_n = int(sh_cfg.get("data", 1))
        model_n = int(
            sh_cfg.get("model", max(1, len(jax.devices()) // data_n))
        )
        mesh = make_mesh(data=data_n, model=model_n)
        batch_size = int(tcfg.get("batch_size", data_n))
        assert batch_size % data_n == 0, (batch_size, data_n)
        # restore BEFORE padding (checkpoints hold unpadded params)
        params, _, sharded_first_iter = restore_checkpoint(
            run_dir, params, None
        )
        params = pad_params_for_shards(params, model_n)
        geoms = {g.name: g.geometry for g in model.garments}
        logger.info(
            f"sharded training on mesh data={data_n} x model={model_n}, "
            f"batch_size={batch_size}"
        )

    lr_tree = lr_tree_from_config(params, tcfg)
    sched_cfg = tcfg.get("lr_scheduler", {})
    tx = make_optimizer(
        lr_tree,
        milestones=sched_cfg.get("milestones", [200_000, 350_000, 500_000]),
        gamma=sched_cfg.get("gamma", 0.33),
        grad_accum=int(tcfg.get("grad_accum", 1)),
    )
    # sharded mode initializes the optimizer on the PLACED params at the
    # first step (a full init here would be dead allocation)
    opt_state = None if use_sharded else tx.init(params)

    vgg_params = None
    if tcfg.get("enable_vgg_from", 0) > 0:
        vgg_params = init_vgg19_features(
            weights_path=tcfg.get("vgg_weights_path")
        )
        if vgg_params is None:
            logger.warning(
                "enable_vgg_from set but no vgg_weights_path: the VGG "
                "perceptual term is DISABLED (the random-weight proxy "
                "was validated and cut — tools/randvgg_validation.json; "
                "export real weights with tools/export_vgg19.py)"
            )

    lw = LossWeights(
        rgb_weight=tcfg.get("rgb_weight", 10.0),
        sil_weight=tcfg.get("sil_weight", 5.0),
        fme_weight=tcfg.get("fme_weight", 0.0025),
        vgg_weight=tcfg.get("vgg_weight", 0.05),
        blur_weight=tcfg.get("blur_weight", 1e-5),
        lambda_dssim=tcfg.get("lambda_dssim", 0.2),
        enable_vgg_from=tcfg.get("enable_vgg_from", 60_000),
    )
    step_cache = {}
    shard_fns = {}

    def get_step(sh_degree: int, image_hw=None):
        if use_sharded and image_hw is None:
            image_hw = shard_fns.get("hw")  # most recent batch's canvas
        key = (sh_degree, image_hw) if use_sharded else sh_degree
        if key not in step_cache:
            if use_sharded:
                step, shard_batch, shard_params = make_sharded_train_step(
                    model, tx, mesh, geoms, image_hw, batch_size,
                    max_per_tile=tcfg.get("max_per_tile", 256),
                    loss_weights=lw,
                    detach_silhouette=tuple(config.get("detach_silhouette", ())),
                    vgg_params=vgg_params,
                    sh_degree=sh_degree,
                )
                shard_fns.setdefault("batch", shard_batch)
                shard_fns.setdefault("params", shard_params)
                step_cache[key] = step
            else:
                step_cache[key] = make_train_step(
                    model,
                    tx,
                    max_per_tile=tcfg.get("max_per_tile", 256),
                    detach_silhouette=tuple(config.get("detach_silhouette", ())),
                    vgg_params=vgg_params,
                    loss_weights=lw,
                    sh_degree=sh_degree,
                )
        return step_cache[key]

    def flatten_samples(samples):
        """Per-frame sample dicts -> the sharded step's stacked batch."""
        cams = [s["camera"] for s in samples]
        flat = {
            "world_view": jnp.stack([c.world_view for c in cams]),
            "full_proj": jnp.stack([c.full_proj for c in cams]),
            "camera_center": jnp.stack([c.camera_center for c in cams]),
            "tanfovx": jnp.stack([jnp.asarray(c.tanfovx) for c in cams]),
            "tanfovy": jnp.stack([jnp.asarray(c.tanfovy) for c in cams]),
        }
        for k in ("frame_idx", "camera_idx", "image", "alpha", "silhouette",
                  "lbs", "smplx_poses", "boundary_fg", "cam_rt",
                  "pixel_valid", "face_kpt_canonical"):
            if k in samples[0]:
                flat[k] = jnp.stack([jnp.asarray(s[k]) for s in samples])
        return flat

    def host_params(p):
        """Checkpoint/render view: unpadded per-Gaussian leaves."""
        return unpad_params_for_shards(p, model) if use_sharded else p

    if use_sharded:
        first_iter = sharded_first_iter  # params restored pre-padding
    else:
        params, opt_state, first_iter = restore_checkpoint(
            run_dir, params, opt_state
        )
    iterations = tcfg.get("iterations", 400_000)
    ckpt_n = tcfg.get("checkpoint_n_steps", 20_000)
    log_n = tcfg.get("log_n_steps", 50)
    progress_n = tcfg.get("log_progress_n_steps", 5_000)

    from d3ga_tpu.train.evaluate import compute_heatmap
    from d3ga_tpu.train.reporting import MetricsLogger, dump_means3d, write_progress_grid
    from d3ga_tpu.train.step import render_frame

    mlog = MetricsLogger(
        run_dir, tb_dir=tcfg.get("tb_dir", os.path.join(run_dir, "tb"))
    )
    rng = jax.random.PRNGKey(tcfg.get("seed", 17))
    use_shs = tcfg.get("use_shs", False)
    max_sh_degree = tcfg.get("max_sh_degree", 3)

    # chain_steps > 1 runs N steps per device dispatch (lax.scan, fully
    # unrolled) — on dispatch-bound transports this amortizes the fixed
    # per-dispatch cost exactly like bench.py's chained scan. Chunks are
    # cut so log/progress/ckpt boundaries, SH-degree ramps, the warmup
    # switch and the final iteration always land on a chunk end; the rng
    # stream is identical to the unchained loop (split inside the scan),
    # results match up to XLA fusion-order rounding (~1e-7).
    chain_n = int(tcfg.get("chain_steps", os.environ.get("D3GA_CHAIN", "1")))
    if chain_n > 1:
        for name, n in (("log_n_steps", log_n), ("log_progress_n_steps", progress_n),
                        ("checkpoint_n_steps", ckpt_n)):
            if n % chain_n:
                logger.warning(
                    f"chain_steps={chain_n} does not divide {name}={n}: "
                    "boundary chunks get their own lengths, each a separate "
                    "multi-minute XLA compile — pick a divisor to avoid this"
                )
    chained_cache = {}

    def get_chained(deg: int, length: int):
        if (deg, length) not in chained_cache:
            from d3ga_tpu.train.step import make_chained_step

            chained_cache[(deg, length)] = make_chained_step(
                get_step(deg), length
            )
        return chained_cache[(deg, length)]

    def _rem(i0: int, n: int) -> int:
        # steps from i0 until (inclusive) the next multiple of n
        return n - ((i0 - 1) % n)

    # in-loop profiler capture: train.trace_at = iteration at which to
    # start a jax.profiler trace for train.trace_steps steps, written to
    # run_dir/traces (viewable in TensorBoard / xprof).
    trace_at = int(tcfg.get("trace_at", 0))
    trace_steps = int(tcfg.get("trace_steps", 5))
    trace_active = False

    t_last = time.time()
    iteration = first_iter + 1
    while iteration <= iterations:
        if trace_at and not trace_active and iteration >= trace_at:
            jax.profiler.start_trace(os.path.join(run_dir, "traces"))
            trace_active = True
            trace_end = iteration + trace_steps
        warmup_steps = (
            frames.get("warmup_steps", 0) if isinstance(frames, dict) else 0
        )
        L = 1
        if chain_n > 1:
            L = min(
                chain_n,
                _rem(iteration, log_n),
                _rem(iteration, progress_n),
                _rem(iteration, ckpt_n),
                iterations - iteration + 1,
            )
            if use_shs:
                L = min(L, 1000 - (iteration % 1000))
            if iteration <= warmup_steps:
                L = min(L, warmup_steps - iteration + 1)
        if isinstance(frames, dict):
            src = (
                frames["warmup"] if iteration <= warmup_steps else frames["train"]
            )
        else:
            src = frames
        # active SH degree ramps +1 per 1000 iters
        # (`models/trainer.py:180-184`)
        deg = min(iteration // 1000, max_sh_degree) if use_shs else 0

        def draw():
            """One optimizer step's batch: (step input, last raw sample,
            step fn). First sharded draw also places params/opt on the
            mesh (the step factory must exist first for shard_params)."""
            nonlocal params, opt_state
            if use_sharded:
                samples = [next(src) for _ in range(batch_size)]
                flat = flatten_samples(samples)
                # render canvas = the camera's static dims (equals the
                # padded image shape for capture frames)
                cam0 = samples[0]["camera"]
                shard_fns["hw"] = (cam0.height, cam0.width)
                step = get_step(deg, image_hw=shard_fns["hw"])
                if not shard_fns.get("placed"):
                    params = shard_fns["params"](params)
                    opt_state = tx.init(params)
                    shard_fns["placed"] = True
                return shard_fns["batch"](flat), samples[-1], step
            b = next(src)
            return b, b, get_step(deg)

        if L == 1:
            batch, last_sample, step = draw()
            rng, step_rng = jax.random.split(rng)
            params, opt_state, metrics = step(
                params, opt_state, batch, step_rng, jnp.int32(iteration)
            )
        else:
            drawn = [draw() for _ in range(L)]
            last_sample = drawn[-1][1]
            batches = jax.tree.map(
                lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]),
                *[d[0] for d in drawn],
            )
            iters_vec = jnp.arange(iteration, iteration + L, dtype=jnp.int32)
            params, opt_state, rng, metrics = get_chained(deg, L)(
                params, opt_state, batches, rng, iters_vec
            )
            metrics = {k: v[-1] for k, v in metrics.items()}
            step_rng = rng  # progress renders only need a fresh key
        iteration += L - 1

        if iteration % log_n == 0:
            metrics = {k: float(v) for k, v in metrics.items()}
            check_loss(metrics, iteration)
            dt = (time.time() - t_last) / log_n
            t_last = time.time()
            mlog.log(iteration, metrics)
            logger.info(
                f"iter {iteration} | {1.0/dt:.2f} it/s | "
                + " ".join(f"{k}={v:.5f}" for k, v in metrics.items())
            )
            # Automatic raster-cap widening: the dupsort selection clamps
            # tile spans at `dup` tiles and COUNTS the drops (tiles.py
            # `clamp_dropped` — "no silent caps"). The reference's CUDA
            # rasterizer is uncapped (`renderer.py:130-141`), so any
            # sustained VISIBLE overflow here widens dup (recompile)
            # until drops stop; past dup=8 it falls back to the
            # uncapped-span top_k funnel. Keyed on visible_overflow:
            # per-tile-cap drops behind an exhausted transmittance are
            # provably benign (tiles.visible_cap_drops) and must not
            # trigger recompiles. Checked at log cadence (metrics are
            # already on host); drops between checks are counted, never
            # silent.
            vo = metrics.get("raster_visible_overflow", -1)
            if vo < 0:  # path that doesn't compute it: be conservative
                vo = metrics.get("raster_overflow", 0)
            # Quantized-depth tie escape: the dupsort_depth fast path
            # breaks same-depth-quantum ties by index; the CUDA
            # reference orders by the full f32 bit pattern (SURVEY.md
            # §3.5). Any observed tie flips the selection to
            # depth_exact (one recompile) so blend order is exactly
            # depth-resolved from then on.
            opts = model.config.get("raster_opts", {})
            if (
                not use_sharded
                and metrics.get("raster_depth_ties", -1) > 0
                and opts.get("coarse") == "dupsort_depth"
                # lib default is now depth_exact=True (VERDICT r4 #9);
                # the escape only matters for configs that explicitly
                # opt into quantized keys
                and not opts.get("depth_exact", True)
            ):
                opts["depth_exact"] = True
                step_cache.clear()
                chained_cache.clear()
                logger.warning(
                    f"[ITER {iteration}] "
                    f"{metrics['raster_depth_ties']:.0f} quantized-depth "
                    "ties: enabling depth_exact selection (recompiling)"
                )
            if (
                not use_sharded
                and vo > 0
                and _widen_raster_opts(
                    model.config, tcfg,
                    clamp_overflow=metrics.get("raster_clamp_overflow", -1),
                )
            ):
                step_cache.clear()
                chained_cache.clear()
                logger.warning(
                    f"[ITER {iteration}] raster overflow "
                    f"{metrics['raster_overflow']:.0f}: widened raster_opts "
                    f"to {model.config.get('raster_opts')}, max_per_tile="
                    f"{tcfg.get('max_per_tile', 256)} (recompiling)"
                )

        if iteration % progress_n == 0:
            _, aux = render_frame(
                host_params(params), model, last_sample, step_rng,
                training=False,
                max_per_tile=tcfg.get("max_per_tile", 256),
            )
            write_progress_grid(
                run_dir, iteration,
                last_sample.get("frame_idx", 0),
                str(last_sample.get("camera_idx", 0)),
                aux["pred_image"], aux["gt_image"],
                pred_sil=aux.get("pred_silhouette"),
                gt_sil=aux.get("gt_silhouette"),
                heatmap=compute_heatmap(aux["gt_image"], aux["pred_image"]),
            )

        if iteration % ckpt_n == 0:
            save_checkpoint(
                run_dir, iteration, host_params(params),
                None if use_sharded else opt_state,
            )
            logger.info(f"[ITER {iteration}] checkpoint saved")

        if trace_active and iteration >= trace_end:
            jax.block_until_ready(jax.tree.leaves(params)[0])
            jax.profiler.stop_trace()
            trace_active = False
            trace_at = 0
            logger.info(f"[ITER {iteration}] profiler trace written")

        iteration += 1

    if trace_active:
        # trace window ran past the final iteration: close it so the
        # trace is flushed and a later training() call can start one
        jax.profiler.stop_trace()
        logger.info("profiler trace closed at loop end")
    for p in prefetchers:
        p.close()

    save_checkpoint(
        run_dir, iterations, host_params(params),
        None if use_sharded else opt_state, name="model",
    )
    return host_params(params)


def build_capture(config):
    """Goliath / ActorsHQ data path: dataset reader + batcher + avatar
    built from capture assets (requires the capture on disk)."""
    from d3ga_tpu.data.capture_builder import build_capture_training

    return build_capture_training(config)


if __name__ == "__main__":
    config = load_config(sys.argv[1])
    training(config)
