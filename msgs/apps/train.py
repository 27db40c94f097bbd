"""Training CLI — the L5/L6 driver (reference train.py:39-596 re-architected
around jitted steps and a host-side schedule).

Usage:
  python -m msgs.apps.train -s <scene> -m <out> [--ms_train --filter_small
      --insert_large --ms_train_max_scale 7 ...]

Structure per iteration (SURVEY.md §2.5):
  level/viewpoint sampling (75% finest, stack-per-epoch) → jitted
  train_step (render, loss, Adam, pixel-size/densify stats) → cadenced
  structural ops (densify_and_prune @lvl0 per interval, grow_large at coarse
  levels, opacity reset every 3k with post-reset stat blackout, insert-large
  episodes at the unlock schedule) → periodic eval/report and PLY/state
  saves. Capacity and entry_cap grow host-side (re-jit) on demand.
"""
from __future__ import annotations

import argparse
import json
import math
import os
import random
import sys
import time

import numpy as np


def build_parser():
    from msgs.apps.config import ModelParams, PipelineParams, add_group, \
        add_optim_group
    p = argparse.ArgumentParser("msgs train")
    add_group(p, ModelParams, "Model")
    add_group(p, PipelineParams, "Pipeline")
    add_optim_group(p)
    p.add_argument("-s", dest="source_path_short", type=str, default=None)
    p.add_argument("-m", dest="model_path_short", type=str, default=None)
    p.add_argument("-r", dest="resolution_short", type=int, default=None)
    p.add_argument("--ms_train", action="store_true")
    p.add_argument("--ms_train_max_scale", type=int, default=7)
    p.add_argument("--ms_test_scales", nargs="+", type=float, default=None,
                   help="override eval scales (e.g. 1 3 6 12 24 48 96 for "
                        "the interp-scale ablations, train_all.py:114)")
    p.add_argument("--filter_small", action="store_true")
    p.add_argument("--prune_small", action="store_true")
    p.add_argument("--preserve_large", action="store_true")
    p.add_argument("--multi_occ", action="store_true")
    p.add_argument("--multi_dc", action="store_true")
    p.add_argument("--grow_large", action="store_true")
    p.add_argument("--insert_large", action="store_true")
    p.add_argument("--fade_size", type=float, default=0.0)
    p.add_argument("--fade_ungated", action="store_true",
                   help="filter_small keys on current footprint alone "
                        "(semantics probe, see BASELINE.md)")
    p.add_argument("--ms_from_iter", type=int, default=1,
                   help="iteration from which MS sampling and occ/dc LRs "
                        "activate (reference train.py:62,153,197-198)")
    p.add_argument("--ms_fine_tail_from", type=int, default=0,
                   help="past this iteration sample only the finest level "
                        "(0 = never): recovers x1 fidelity after the "
                        "densify window without touching the coarse "
                        "aggregates (measured motivation: BASELINE.md r5 "
                        "ms28k trajectory)")
    p.add_argument("--test_iterations", nargs="+", type=int,
                   default=[7000, 30000])
    p.add_argument("--test_interval", type=int, default=5000)
    p.add_argument("--save_iterations", nargs="+", type=int,
                   default=[7000, 30000])
    p.add_argument("--checkpoint_iterations", nargs="+", type=int, default=[])
    p.add_argument("--start_checkpoint", type=str, default=None)
    p.add_argument("--capacity", type=int, default=0,
                   help="Gaussian capacity; 0 = auto (grows on demand)")
    p.add_argument("--entry_cap", type=int, default=1 << 20)
    p.add_argument("--fast_grads", action="store_true",
                   help="enable the bf16-packed gather-VJP sort "
                        "(grad_pack_bf16): ~2^-8-relative gradient noise, "
                        "tolerance-tested vs exact f32 "
                        "(tests/test_rasterize.py) and −1.9 ms at the 1080p "
                        "bench; the quality-suite control runs keep the "
                        "exact path for cross-round comparability")
    p.add_argument("--bwd_bf16", action="store_true",
                   help="run the backward compositor's moment/φ math as "
                        "bf16 MXU contractions; measured SLOWER than the "
                        "exact path at 1080p bench shapes (72.2 vs 60.1 ms, "
                        "r5) — opt-in A/B only")
    p.add_argument("--backend", type=str, default="pallas")
    p.add_argument("--quiet", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--detect_anomaly", action="store_true",
                   help="enable jax_debug_nans (reference --detect_anomaly)")
    p.add_argument("--no_tensorboard", action="store_true")
    p.add_argument("--ip", type=str, default="127.0.0.1",
                   help="network GUI host (SIBR remote viewer)")
    p.add_argument("--port", type=int, default=6009)
    p.add_argument("--disable_gui", action="store_true")
    p.add_argument("--profile_steps", type=str, default=None,
                   help="START:END iteration range to capture a jax.profiler "
                        "trace into <model_path>/profile/")
    p.add_argument("--mesh", nargs=2, type=int, default=None,
                   metavar=("GAUSS", "TILE"),
                   help="train sharded over a GAUSS x TILE device mesh "
                        "(params/Adam gauss-sharded, image row stripes over "
                        "both axes, bounded all-to-all splat exchange; "
                        "msgs/dist/shard.py). Structural ops gather -> "
                        "mutate -> reshard at their cold cadence.")
    p.add_argument("--packet_cap", type=int, default=0,
                   help="per-(source,stripe) splat packet rows for the "
                        "sharded exchange; 0 = auto, grows on overflow")
    p.add_argument("--multihost", action="store_true",
                   help="initialize jax.distributed (DCN) before touching "
                        "devices; config via JAX_COORDINATOR_ADDRESS / "
                        "JAX_NUM_PROCESSES / JAX_PROCESS_ID or Cloud-TPU "
                        "autodetection (msgs/dist/multihost.py)")
    return p


def next_pow2(x: int) -> int:
    return 1 << max(int(x) - 1, 1).bit_length()


def training(args):
    import faulthandler
    import signal
    faulthandler.register(signal.SIGUSR1)   # kill -USR1 <pid> → stack dump

    from msgs.dist.multihost import maybe_initialize
    is_main = maybe_initialize(args.multihost)   # before any device use
    import jax
    import jax.numpy as jnp

    from msgs.apps.config import extract_optim, save_cfg
    from msgs.data.dataset import load_scene
    from msgs.eval.metrics import psnr
    from msgs.kernels.rasterize import RasterSettings
    from msgs.model.gaussians import (GaussianConfig, create_from_points,
                                      one_up_sh_degree)
    from msgs.ms.schedule import MsSchedule, loss_weight
    from msgs.train import loop as L
    from msgs.train import checkpoint as CK
    from msgs.train.checkpoint import (load_train_state, save_ply_snapshot,
                                       save_train_state)

    if args.source_path_short:
        args.source_path = args.source_path_short
    if args.model_path_short:
        args.model_path = args.model_path_short
    if args.resolution_short is not None:
        args.resolution = args.resolution_short
    op = extract_optim(args)
    if not is_main:
        # Secondary hosts compute but never write logs/TB/GUI.
        args.no_tensorboard = True
        args.disable_gui = True
        args.quiet = True
    random.seed(args.seed)
    np.random.seed(args.seed)
    if args.detect_anomaly:
        jax.config.update("jax_debug_nans", True)

    os.makedirs(args.model_path, exist_ok=True)
    save_cfg(args.model_path, args)
    log_path = os.path.join(args.model_path, "train_log.jsonl")
    log_f = open(log_path, "a")

    tb = None
    if not args.no_tensorboard:
        try:
            from tensorboardX import SummaryWriter
            tb = SummaryWriter(args.model_path)
        except Exception:
            print("tensorboardX unavailable; logging to JSONL only")

    gui = None
    if not args.disable_gui:
        try:
            from msgs.apps import network_gui
            network_gui.init(args.ip, args.port)
            gui = network_gui
        except Exception as e:
            print(f"network GUI disabled: {e}")

    print(f"Loading scene {args.source_path}")
    scene = load_scene(args.source_path, images_dir=args.images,
                       eval_split=args.eval, resolution=args.resolution,
                       white_background=args.white_background)
    extent = scene.cameras_extent
    print(f"  {len(scene.train_views)} train / {len(scene.test_views)} test "
          f"views, {len(scene.points)} points, extent {extent:.2f}")

    sched = MsSchedule(max_reso_pow=args.ms_train_max_scale
                       if args.ms_train else 0,
                       ms_train=args.ms_train,
                       insert_large=args.insert_large,
                       ms_from_iter=args.ms_from_iter,
                       fine_tail_from=args.ms_fine_tail_from,
                       rng=random.Random(args.seed))
    filter_large = args.grow_large or args.insert_large

    n0 = len(scene.points)
    capacity = args.capacity or max(next_pow2(n0 * 4), 1 << 16)
    if n0 > capacity:
        # Explicit small capacity: subsample the init cloud to fit.
        keep = np.random.default_rng(args.seed).choice(
            n0, capacity // 2, replace=False)
        scene.points = scene.points[keep]
        scene.colors = scene.colors[keep]
        n0 = len(scene.points)
        print(f"  subsampled init cloud to {n0} (capacity {capacity})")
    cfg = GaussianConfig(sh_degree=args.sh_degree,
                         reso_lvls=sched.reso_lvls,
                         multi_occ=args.multi_occ, multi_dc=args.multi_dc,
                         capacity=capacity)
    settings = RasterSettings(filter_small=args.filter_small,
                              filter_large=filter_large,
                              fade_ungated=args.fade_ungated,
                              entry_cap=args.entry_cap,
                              backend=args.backend,
                              image_grads_only=True,
                              grad_pack_bf16=args.fast_grads,
                              bwd_bf16=args.bwd_bf16)

    st = create_from_points(cfg, scene.points, scene.colors)
    state = L.init_train_state(st)
    first_iter = 0
    if args.start_checkpoint:
        state = load_train_state(args.start_checkpoint, state)
        first_iter = int(state.iteration)
        # Capacity may have grown before the checkpoint was written.
        actual_cap = int(state.gaussians.xyz.shape[0])
        if actual_cap != cfg.capacity:
            cfg = cfg._replace(capacity=actual_cap)
        print(f"Resumed from {args.start_checkpoint} at {first_iter} "
              f"(capacity {actual_cap})")

    # --- sharded training over a 2-D device mesh (--mesh G T) ---
    # Hot path: the sharded train step (dist/shard.py). Cold paths
    # (structural ops, eval, saves) gather the state to host, run the
    # single-device code unchanged, and reshard — faithful at their
    # every-100-iters cadence (BASELINE config 5).
    mesh = None
    packet_cap = args.packet_cap
    if args.mesh:
        from msgs.dist import shard as S
        from msgs.dist.mesh import GAUSS_AXIS, TILE_AXIS, make_mesh
        from jax.sharding import NamedSharding, PartitionSpec as MP
        n_gauss, n_tile = args.mesh
        ndev = len(jax.devices())
        assert n_gauss * n_tile <= ndev, \
            f"--mesh {n_gauss}x{n_tile} needs {n_gauss * n_tile} devices, " \
            f"have {ndev}"
        assert cfg.capacity % n_gauss == 0, \
            f"capacity {cfg.capacity} not divisible by gauss axis {n_gauss}"
        mesh = make_mesh(n_gauss=n_gauss, n_tile=n_tile,
                         devices=jax.devices()[:n_gauss * n_tile])
        gt_shard = NamedSharding(mesh, MP((GAUSS_AXIS, TILE_AXIS)))
        state = S.shard_train_state(state, mesh, cfg.capacity)
        print(f"mesh: {dict(mesh.shape)} over {n_gauss * n_tile} devices")

        sharded_steps = {}

        def get_sharded_step(lvl, height, width):
            key = (lvl, height, width, settings, cfg.capacity, packet_cap)
            if key not in sharded_steps:
                sharded_steps[key] = S.build_sharded_train_step(
                    mesh, cfg, op, settings, height, width,
                    spatial_lr_scale=spatial_lr, reso_lvl=lvl,
                    loss_mult=loss_weight(lvl) if args.ms_train else 1.0,
                    lambda_dssim=op.lambda_dssim, fade_size=args.fade_size,
                    packet_cap=packet_cap)
            return sharded_steps[key]

    def unshard(s):
        if mesh is None:
            return s
        from msgs.dist import shard as S
        return S.fetch_train_state(s)

    def reshard(s):
        if mesh is None:
            return s
        from msgs.dist import shard as S
        return S.shard_train_state(s, mesh, cfg.capacity)

    key = jax.random.PRNGKey(args.seed)
    bg = jnp.ones((3,)) if args.white_background else jnp.zeros((3,))

    # Device-resident GT cache. The reference keeps every camera's GT on GPU
    # (cameras.py:39); we do the same per sampled (view, scale) — re-shipping
    # 3 MB/step over the accelerator link (or worse, a tunnel) costs more
    # than the render itself. Coarse-scale images are tiny, so the cache is
    # ≈ n_views × H×W×12 B total.
    gt_cache = {}

    def gt_on_device(view, scale):
        k = (view.uid, scale)
        if k not in gt_cache:
            if mesh is not None:
                from msgs.dist import shard as S
                img = jnp.asarray(view.image(scale))
                n_stripes = args.mesh[0] * args.mesh[1]
                img = S.pad_gt(img, S.padded_height(img.shape[0], n_stripes))
                gt_cache[k] = jax.device_put(img, gt_shard)
            else:
                gt_cache[k] = jax.device_put(view.image(scale))
        return gt_cache[k]

    viewpoint_stack = []
    cur_lvl = 0
    last_reset = None
    ema_loss = 0.0
    spatial_lr = float(extent)
    t_start = time.time()
    pending_overflow = []   # the window's overflow scalars (async check)
    pending_exch_overflow = []  # packet-exchange overflow (mesh mode)

    def grow_capacity(state, new_cap):
        print(f"[capacity] growing {cfg.capacity} -> {new_cap}")
        return CK.grow_capacity(state, new_cap)

    def gui_render(cam, scale_mod):
        out = L.eval_render(state, cam, cfg=cfg, settings=settings, bg=bg)
        return out.image

    profile_range = None
    if args.profile_steps:
        a, b = args.profile_steps.split(":")
        profile_range = (int(a), int(b))

    for iteration in range(first_iter + 1, op.iterations + 1):
        # jax.profiler trace window (reference's iter timing, upgraded).
        if profile_range and iteration == profile_range[0]:
            jax.profiler.start_trace(
                os.path.join(args.model_path, "profile"))
        if profile_range and iteration == profile_range[1]:
            jax.block_until_ready(state.gaussians.xyz)
            jax.profiler.stop_trace()
            print(f"[profile] trace written to {args.model_path}/profile")
        # Live-view pump (train.py:127-141).
        if gui is not None and (gui.conn is not None or iteration % 50 == 1):
            try:
                gui.serve_step(gui_render, args.source_path, True)
            except Exception:
                pass

        # SH warmup every 1000 iters (train.py:147-149).
        if iteration % 1000 == 0:
            state = state._replace(gaussians=one_up_sh_degree(
                state.gaussians, cfg.sh_degree))

        # Viewpoint sampling: stack per level-epoch (train.py:151-194).
        if not viewpoint_stack:
            cur_lvl = sched.sample_level(iteration)
            viewpoint_stack = list(scene.train_views)
        view = viewpoint_stack.pop(random.randint(0, len(viewpoint_stack) - 1))
        sched.count_iteration(cur_lvl)
        scale = sched.scales[cur_lvl]
        cam = view.camera(scale)
        gt = gt_on_device(view, scale)

        do_px = iteration >= 250 and (last_reset is None
                                      or iteration - last_reset > 250)
        do_ds = iteration < op.densify_until_iter
        # preserve_large: base_mask accumulates coarsest-level visibility
        # once densification is over (reference train.py:239-241).
        do_bm = (args.preserve_large and iteration > op.densify_until_iter
                 and cur_lvl == sched.reso_lvls - 1)

        ms_lr = (iteration >= args.ms_from_iter
                 and (args.multi_occ or args.multi_dc))
        if mesh is not None:
            step_fn = get_sharded_step(cur_lvl, cam.height, cam.width)
            state, metrics = step_fn(state, cam, gt, do_px, do_ds, do_bm,
                                     ms_lr)
            pending_overflow.append(metrics["overflow"])
            pending_exch_overflow.append(metrics["exch_overflow"])
        else:
            state, metrics = L.train_step(
                state, cam, gt,
                cfg=cfg, op=op, settings=settings, reso_lvl=cur_lvl,
                spatial_lr_scale=spatial_lr, lambda_dssim=op.lambda_dssim,
                loss_mult=loss_weight(cur_lvl) if args.ms_train else 1.0,
                fade_size=args.fade_size,
                do_px_update=do_px, do_densify_stats=do_ds,
                do_base_mask=do_bm, ms_lr_active=ms_lr)
            pending_overflow.append(metrics["overflow"])

        # Eval / save BEFORE structural ops — the reference runs
        # training_report and scene.save ahead of densify/opacity-reset
        # (train.py:230-236 vs 247-264), so snapshots never capture a
        # just-reset model.
        eval_due = iteration in args.test_iterations or (
            args.test_interval > 0 and iteration % args.test_interval == 0)
        densify_due = (
            iteration < op.densify_until_iter
            and ((iteration > op.densify_from_iter
                  and sched.reso_iterations[cur_lvl]
                  % op.densification_interval == 0)
                 or iteration % op.opacity_reset_interval == 0
                 or (args.white_background
                     and iteration == op.densify_from_iter)))
        insert_due = (args.insert_large
                      and sched.insert_target_for(iteration) is not None)
        host_ops_due = (eval_due or densify_due or insert_due
                        or iteration in args.save_iterations
                        or iteration in args.checkpoint_iterations)
        if mesh is not None and host_ops_due:
            state = unshard(state)   # cold path: gather → mutate → reshard

        # Eval (training_report analog, train.py:446-551).
        if eval_due:
            report = evaluate_scales(state, scene, sched, cfg, settings,
                                     args, bg, iteration)
            log_f.write(json.dumps({"it": iteration, "eval": report}) + "\n")
            log_f.flush()
            if tb is not None:
                for key, m in report.items():
                    tb.add_scalar(f"eval/{key}/psnr", m["psnr"], iteration)
                    tb.add_scalar(f"eval/{key}/l1", m["l1"], iteration)
                    tb.add_scalar(f"eval/{key}/render_ms", m["render_ms"],
                                  iteration)

        if iteration in args.save_iterations:
            out_dir = os.path.join(args.model_path,
                                   f"point_cloud/iteration_{iteration}")
            os.makedirs(out_dir, exist_ok=True)
            save_ply_snapshot(os.path.join(out_dir, "point_cloud.ply"),
                              state.gaussians)
            print(f"[save] {out_dir}")

        if iteration in args.checkpoint_iterations:
            save_train_state(os.path.join(
                args.model_path, f"chkpnt{iteration}.npz"), state)

        # Densification cadence (train.py:247-264).
        if iteration < op.densify_until_iter:
            if (iteration > op.densify_from_iter
                    and sched.reso_iterations[cur_lvl]
                    % op.densification_interval == 0):
                if cur_lvl == 0:
                    size_thr = 20.0 if iteration > op.opacity_reset_interval \
                        else 0.0
                    key, sub = jax.random.split(key)
                    state = L.densify_step(
                        state, sub, op=op, scene_extent=float(extent),
                        max_screen_size=size_thr)
                elif args.grow_large:
                    state = L.grow_step(state, cur_lvl, op=op)
            if (iteration % op.opacity_reset_interval == 0
                    or (args.white_background
                        and iteration == op.densify_from_iter)):
                last_reset = iteration
                state = L.reset_opacity_step(state)

        # Insert-large episode (train.py:269-387).
        target = sched.insert_target_for(iteration) if args.insert_large \
            else None
        if target is not None:
            state = run_insert_episode(
                state, scene, sched, target, cfg, settings, extent, args)

        if mesh is not None and host_ops_due:
            state = reshard(state)

        # Host-side housekeeping every 10 iters. This includes the entry-cap
        # overflow check: reading any device scalar blocks on the in-flight
        # step (a full link round-trip), so a per-iteration check would
        # serialize dispatch and let the device idle between steps. Safety
        # doesn't need per-step checks — an overflowing train_step discards
        # its own updates *inside* the jit, so the only cost of late
        # detection is ≤10 skipped steps, never training on a truncated
        # render.
        if iteration % 10 == 0 or iteration == op.iterations:
            ovf = int(jnp.max(jnp.stack(pending_overflow))) \
                if pending_overflow else 0   # one readback, not ten
            pending_overflow.clear()
            if ovf > 0:
                new_cap = next_pow2(settings.entry_cap + ovf)
                print(f"[entry_cap] overflow {ovf}; "
                      f"growing {settings.entry_cap} -> {new_cap}")
                settings = settings._replace(entry_cap=new_cap)
            if pending_exch_overflow:
                eovf = int(jnp.max(jnp.stack(pending_exch_overflow)))
                pending_exch_overflow.clear()
                if eovf > 0:
                    # Double from the builder's effective default (the
                    # builder cache key includes packet_cap, so the next
                    # step re-jits with the new bound).
                    n_g, n_t = args.mesh
                    auto = S.auto_packet_cap(cfg.capacity, n_g, n_t)
                    packet_cap = 2 * (packet_cap or auto)
                    print(f"[packet_cap] exchange overflow {eovf}; "
                          f"growing to {packet_cap}")
            loss = float(metrics["loss"])
            ema_loss = 0.4 * loss + 0.6 * ema_loss
            n_live = int(metrics["num_live"])
            # Grow Gaussian capacity when >90% full.
            if n_live > 0.9 * cfg.capacity:
                new_cap = cfg.capacity * 2
                if mesh is not None:
                    state = unshard(state)
                state = grow_capacity(state, new_cap)
                cfg = cfg._replace(capacity=new_cap)
                if mesh is not None:
                    state = reshard(state)
                    sharded_steps.clear()   # keyed on stale capacity
            if iteration % 100 == 0:
                elapsed = time.time() - t_start
                print(f"it {iteration:6d} lvl {cur_lvl} loss {ema_loss:.5f} "
                      f"live {n_live} entries {int(metrics['num_entries'])} "
                      f"({elapsed:.0f}s)")
                log_f.write(json.dumps(
                    {"it": iteration, "loss": loss, "lvl": cur_lvl,
                     "live": n_live, "t": elapsed}) + "\n")
                log_f.flush()
                if tb is not None:
                    if np.isfinite(loss):
                        tb.add_scalar("train_loss_patches/total_loss",
                                      loss, iteration)
                    tb.add_scalar("train/l1", float(metrics["l1"]), iteration)
                    tb.add_scalar("total_points", n_live, iteration)
                    tb.add_scalar("train/entries",
                                  int(metrics["num_entries"]), iteration)
            if tb is not None and iteration % 1000 == 0:
                st_g = state.gaussians
                live_np = np.asarray(st_g.live)
                tb.add_histogram(
                    "scene/opacity_histogram",
                    np.asarray(st_g.act_opacity())[live_np], iteration)
                px_live = np.asarray(st_g.max_pixel_sizes)[live_np]
                if (px_live >= 0).any():
                    tb.add_histogram("scene/max_pixel_sizes",
                                     px_live[px_live >= 0], iteration)


    log_f.close()
    return state


def run_insert_episode(state, scene, sched, target_lvl, cfg, settings,
                       extent, args):
    """Insert-large orchestration (train.py:269-387): render all train cams
    at level 0 for visibility, at the target level for per-Gaussian min
    pixel size over views; select sub-pixel level-0 Gaussians; voxel-insert;
    re-render target level once to initialize the new rows' stats."""
    import jax
    import jax.numpy as jnp

    from msgs.model import gaussians as G
    from msgs.train import loop as L

    C = cfg.capacity
    print(f"[insert_large] episode at lvl {target_lvl}")
    visible_l0 = jnp.zeros((C,), bool)
    min_px = jnp.full((C,), jnp.inf)

    # Measurement renders run unfiltered: sub-pixel Gaussians must report
    # their footprint to be selectable (filter_small would hide exactly the
    # rows this episode exists to aggregate).
    msettings = settings._replace(filter_small=False, filter_large=False)
    for view in scene.train_views:
        cam0 = view.camera(sched.scales[0])
        out0 = L.eval_render(state, cam0, cfg=cfg, settings=msettings,
                             reso_lvl=0)
        visible_l0 = visible_l0 | out0.visible
        camt = view.camera(sched.scales[target_lvl])
        outt = L.eval_render(state, camt, cfg=cfg, settings=msettings,
                             reso_lvl=target_lvl)
        # A view contributes its pixel size only where the *same view's*
        # level-0 render saw the Gaussian (reference insert episode:
        # pixel_sizes>0 AND base_vis_filter_list[i], train.py:288-314) —
        # a row invisible at level 0 in this view must not feed the
        # selection statistic from it.
        px = jnp.where((outt.pixel_sizes > 0) & out0.visible,
                       outt.pixel_sizes, jnp.inf)
        min_px = jnp.minimum(min_px, px)

    st = state.gaussians
    sel = (visible_l0 & (min_px < 1.0) & jnp.isfinite(min_px)
           & (st.target_reso_lvl == 0) & st.live)
    cur_min = jnp.where(jnp.isfinite(min_px), min_px, 0.0)
    voxel_reso = 0.02 * (target_lvl / 4.0)
    state, n_ins = L.insert_large_step(
        state, sel, cur_min, target_lvl,
        scene_extent=float(extent), voxel_reso=float(voxel_reso))
    print(f"[insert_large] inserted {int(n_ins)} aggregates at lvl "
          f"{target_lvl} (from {int(sel.sum())} selected)")

    # One pass at the target level to initialize new rows' pixel stats
    # (train.py:336-345).
    st = state.gaussians
    for view in scene.train_views:
        camt = view.camera(sched.scales[target_lvl])
        outt = L.eval_render(state, camt, cfg=cfg, settings=settings,
                             reso_lvl=target_lvl)
        st = G.update_pixel_sizes(st, outt.pixel_sizes, target_lvl,
                                  cfg.reso_lvls)
    return state._replace(gaussians=st)


def evaluate_scales(state, scene, sched, cfg, settings, args, bg, iteration):
    """Per-scale eval over the test set + 5 fixed train views
    (training_report, train.py:446-551)."""
    import jax.numpy as jnp

    from msgs.eval.metrics import l1_loss, psnr, ssim
    from msgs.train import loop as L

    final = iteration >= getattr(args, "iterations", 10 ** 9)
    lpips = None
    if final:
        # LPIPS at the final iteration only, like the reference
        # (train.py:456-461) — gated on exported weights being present.
        try:
            from msgs.eval.lpips_jax import lpips_fn
            lpips = lpips_fn()
        except Exception:
            lpips = None
    # Eval scales may differ from train scales (ms_test_scales, train.py:52-56);
    # the appearance-bucket level for an arbitrary scale is its log2 round.
    eval_scales = getattr(args, "ms_test_scales", None) or sched.scales
    report = {}
    configs = [("test", scene.test_views),
               ("train", scene.train_views[:5])]
    for split, views in configs:
        if not views:
            continue
        for scale in eval_scales:
            lvl = min(max(int(round(math.log2(max(scale, 1)))), 0),
                      sched.reso_lvls - 1)
            l1s, psnrs, ssims, lpipss, times = [], [], [], [], []
            # Untimed warm-up so compile doesn't pollute render_ms.
            L.eval_render(state, views[0].camera(scale), cfg=cfg,
                          settings=settings, reso_lvl=lvl,
                          bg=bg).image.block_until_ready()
            for view in views:
                cam = view.camera(scale)
                t0 = time.time()
                out = L.eval_render(state, cam, cfg=cfg, settings=settings,
                                    reso_lvl=lvl, bg=bg)
                img = jnp.clip(out.image, 0, 1)
                img.block_until_ready()
                times.append(time.time() - t0)
                gt = jnp.asarray(view.image(scale))
                l1s.append(float(l1_loss(img, gt)))
                psnrs.append(float(psnr(img, gt)))
                if final:
                    # SSIM (+LPIPS when weights exist) at the final iteration
                    # only, like the reference (train.py:456-461).
                    ssims.append(float(ssim(img, gt)))
                    if lpips is not None:
                        lpipss.append(float(lpips(img, gt)))
            # Median render time: the axon tunnel occasionally stalls a
            # single dispatch for seconds (r2's 1.4 s "outliers" at ×4/×16
            # were one stalled view each, absent at the next eval) — the
            # median is the device number; the mean is kept for comparison
            # with the reference protocol (train.py:488-541).
            entry = {
                "l1": float(np.mean(l1s)), "psnr": float(np.mean(psnrs)),
                "render_ms": float(np.median(times) * 1000),
                "render_ms_mean": float(np.mean(times) * 1000)}
            if ssims:
                entry["ssim"] = float(np.mean(ssims))
            if lpipss:
                entry["lpips"] = float(np.mean(lpipss))
            report[f"{split}_s{scale}"] = entry
            print(f"[eval {iteration}] {split} x{scale}: "
                  f"psnr {np.mean(psnrs):.2f} l1 {np.mean(l1s):.4f} "
                  + (f"ssim {np.mean(ssims):.4f} " if ssims else "")
                  + f"{np.mean(times)*1000:.1f}ms")
    return report


def main(argv=None):
    args = build_parser().parse_args(argv)
    training(args)


if __name__ == "__main__":
    main()
