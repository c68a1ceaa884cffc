"""Command-line front-end.

Counterpart of ``/root/reference/src/cli.rs``: same default recipe (teapot,
camera looking from (0,2,10) at (0,1.5,0), f/4.8 focused at 10 m, 2048x1536,
64-px tiles, 100 spp), BVH statistics printed at startup, and a progress bar
driven by the finished-tile callback. Improvements over the reference: real
argument parsing (the reference hardcodes everything) and the image is
actually written to disk (the reference never saves it, ``cli.rs:44-46``).
"""

from __future__ import annotations

import argparse
import sys
import time

DEFAULT_OBJ = "/root/reference/data/teapot.obj"


def _positive_int(text: str) -> int:
    v = int(text)
    if v < 1:
        raise argparse.ArgumentTypeError(f"must be >= 1, got {v}")
    return v


def _progress_bar(finished: int, total: int, width: int = 40) -> str:
    filled = int(width * finished / total) if total else width
    return "[" + "#" * filled + "-" * (width - filled) + f"] {finished}/{total}"


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="minipath-tpu",
        description="TPU-native tiled path tracer (minipath capabilities).",
    )
    p.add_argument("--obj", default=None, help="OBJ file to render (default: reference teapot, falling back to a procedural sphere)")
    p.add_argument("--scene", choices=["obj", "sphere-mesh", "atrium"], default="obj", help="scene source")
    p.add_argument("--width", type=int, default=2048)
    p.add_argument("--height", type=int, default=1536)
    p.add_argument("--spp", type=int, default=100, help="samples per pixel")
    p.add_argument("--tile-size", type=int, default=64)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--output", "-o", default="render.png", help="output PNG path")
    p.add_argument("--camera-from", type=float, nargs=3, default=(0.0, 2.0, 10.0), metavar=("X", "Y", "Z"))
    p.add_argument("--camera-to", type=float, nargs=3, default=(0.0, 1.5, 0.0), metavar=("X", "Y", "Z"))
    p.add_argument("--f-number", type=float, default=4.8)
    p.add_argument("--focus", type=float, default=10.0, help="focus distance (meters); default focuses at --camera-to distance")
    p.add_argument("--no-stats", action="store_true", help="skip BVH statistics printout")
    p.add_argument("--quiet", "-q", action="store_true")
    p.add_argument(
        "--integrator",
        choices=["normal", "pt"],
        default="normal",
        help="'normal' = reference-parity |d.n| shading; 'pt' = path tracing "
        "with a sky environment (OBJ scenes get a default gray material)",
    )
    p.add_argument("--bounces", type=int, default=6, help="path-tracer bounce budget")
    p.add_argument("--devices", type=int, default=1, help="shard the render across N devices (jax.sharding.Mesh); 0 = all available")
    p.add_argument("--no-compaction", action="store_true", help="path tracer: disable wavefront stream compaction (megakernel mode)")
    p.add_argument("--nee", action="store_true", help="path tracer: next-event estimation (explicit light sampling with MIS; needs emissive materials, e.g. --scene atrium)")
    p.add_argument("--nee-depth", type=_positive_int, default=None, metavar="K", help="path tracer: light-sample only the first K path vertices (K >= 1; unbiased at any K; deeper emitter hits keep full BSDF weight). Requires --nee and an emissive scene. The efficiency optimum is light-topology dependent (tools/sweep_pt17.py / sweep_pt19.py); default = every vertex")
    p.add_argument("--no-shadow-rr", action="store_true", help="path tracer: disable shadow-ray Russian roulette (trade NEE speed back for slightly lower variance)")
    p.add_argument("--rr-start", type=_positive_int, default=3, metavar="B", help="path tracer: first bounce at which path Russian roulette may kill (unbiased at any setting; lower = faster, noisier — efficiency sweep in tools/sweep_rr2.py)")
    p.add_argument("--rr-floor", type=float, default=0.05, metavar="P", help="path tracer: roulette survival-probability floor (unbiased; raising it makes roulette gentler — more rays, less noise; 1.0 disables it)")
    p.add_argument("--tail-cut", type=float, default=None, metavar="F", help="path tracer: retire the whole wavefront once fewer than F of its paths are live (BIASED — drops the tail's remaining contribution; off by default)")
    p.add_argument("--iid", action="store_true", help="path tracer: reference-style iid sampling instead of per-pixel stratification (for A/B noise comparisons)")
    p.add_argument("--sobol", action="store_true", help="path tracer: Owen-scrambled Sobol sample dimensions instead of jittered strata (unbiased low-discrepancy sampling; measured MSE gain in QUALITY.json)")
    p.add_argument("--denoise", action="store_true", help="path tracer: edge-avoiding a-trous filter guided by first-hit normals/depth (biased post-process; the saved PNG only)")
    p.add_argument("--aov", metavar="PREFIX", default=None, help="path tracer: also write first-hit AOVs <PREFIX>_normal.png and <PREFIX>_depth.png")
    p.add_argument("--adaptive", action="store_true", help="EXPERIMENTAL: adaptive sampling — a 2-spp pilot allocates the --spp budget toward noisy packets (unbiased; single-device). Measured at-or-below uniform on every scene tried (QUALITY.json); prefer the default stratified/--sobol samplers")
    p.add_argument("--clamp", type=float, default=None, metavar="L", help="path tracer: cap each sample's radiance at L before averaging (firefly suppression; biased)")
    return p


def load_scene(args):
    from minipath_tpu.scene.triangle_bvh import TriangleBvh

    if args.scene == "atrium":
        from minipath_tpu.scene.procedural import make_atrium

        mesh = make_atrium()
        if getattr(args, "integrator", "parity") == "pt":
            # Path-traced atrium gets the benchmark material set (emissive
            # ceiling panels, metal/glass props) so --nee has lights.
            from minipath_tpu.scene.procedural import atrium_materials

            mats, dicts = atrium_materials(mesh)
            return TriangleBvh.build(mesh, materials=mats, use_native=True), dicts
        return TriangleBvh.build(mesh, use_native=True), None
    if args.scene == "sphere-mesh":
        from minipath_tpu.scene.procedural import make_uv_sphere

        return TriangleBvh.build(make_uv_sphere(1.0, rings=32, segments=64)), None

    import os

    path = args.obj or (DEFAULT_OBJ if os.path.exists(DEFAULT_OBJ) else None)
    if path is None:
        from minipath_tpu.scene.procedural import make_uv_sphere

        print("no OBJ available; rendering procedural sphere", file=sys.stderr)
        return TriangleBvh.build(make_uv_sphere(1.0, rings=32, segments=64)), None
    return TriangleBvh.with_obj(path), None


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    from minipath_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    from minipath_tpu import Camera, RenderSettings, Scene, render
    from minipath_tpu.utils.image import save_png

    bvh, material_dicts = load_scene(args)
    if not args.no_stats:
        bvh.print_statistics()

    camera = (
        Camera()
        .look_at(tuple(args.camera_from), tuple(args.camera_to))
        .f_number(args.f_number)
        .focus_distance(args.focus)
    )
    settings = RenderSettings(
        tile_size=args.tile_size,
        sample_count=args.spp,
        resolution=(args.width, args.height),
    )

    mesh = None
    if args.devices != 1:
        import jax

        from minipath_tpu.parallel.mesh import make_device_mesh

        n = args.devices or len(jax.devices())
        if n > 1:
            mesh = make_device_mesh(n)

    if args.integrator == "pt":
        return _render_pt(args, bvh, camera, mesh, material_dicts)

    def on_tile(_tile, snapshot):
        if not args.quiet:
            print("\r" + _progress_bar(snapshot.finished, snapshot.total), end="", file=sys.stderr)

    t0 = time.time()
    progress = render(Scene(bvh), camera, settings, finished_tile_callback=on_tile, seed=args.seed, mesh=mesh)
    try:
        progress.wait()
    except KeyboardInterrupt:
        progress.abort()
        progress.wait()
        print("\naborted", file=sys.stderr)
    if not args.quiet:
        print(file=sys.stderr)

    # Report work actually done: the machinery rounds spp up to a whole
    # number of equal compiled passes (progress.spp_effective).
    spp = progress.spp_effective
    rays = args.width * args.height * spp
    elapsed = progress.elapsed()
    print(
        f"rendered {args.width}x{args.height} @ {spp} spp in {elapsed:.2f}s "
        f"({rays / elapsed / 1e6:.1f} Mrays/s)",
        file=sys.stderr,
    )
    save_png(args.output, progress.image())
    print(f"saved {args.output}", file=sys.stderr)
    return 0


def _render_pt(args, bvh, camera, mesh=None, material_dicts=None) -> int:
    """Path-traced whole-frame render (sky environment, gamma 2.2)."""
    import numpy as np
    import jax

    from minipath_tpu.render.wavefront import (
        make_pt_shadow_tracer,
        make_pt_tracer,
        make_xla_shadow_tracer,
        make_xla_tracer,
        render_frame_pt,
    )
    from minipath_tpu.scene.materials import (
        Environment,
        build_light_table,
        lambertian,
        material_table,
    )
    from minipath_tpu.utils.image import color_to_image, save_png

    table = material_table(
        material_dicts
        if material_dicts is not None
        else [lambertian((0.73, 0.73, 0.73))]
    )
    shadow_tracer = None
    if jax.default_backend() == "cpu":
        tracer, tracer_state = make_xla_tracer(
            bvh.arrays, stack_size=bvh.recommended_stack_size, packet_size=256
        )
        if args.nee:
            shadow_tracer, _ = make_xla_shadow_tracer(
                bvh.arrays, stack_size=bvh.recommended_stack_size, packet_size=256
            )
    else:
        # Lean PT kernel at any scene size: bvh.pt_scene auto-selects the
        # f32, quantized, or HBM-streamed layout, and make_pt_tracer /
        # make_pt_shadow_tracer dispatch to the matching kernel — one
        # full-featured path like the reference's single traversal
        # (ray_bvh_intersection.rs:26-96).
        tracer, tracer_state = make_pt_tracer(
            bvh.pt_scene,
            stack_size=bvh.recommended_stack_size,
            packet_size=2048,
        )
        if args.nee:
            shadow_tracer, _ = make_pt_shadow_tracer(
                bvh.pt_scene,
                stack_size=bvh.recommended_stack_size,
                packet_size=2048,
            )
    lights = None
    if args.nee and shadow_tracer is not None:
        arrays = bvh.host_arrays
        lights = build_light_table(arrays.tri_packets, arrays.tri_material, table)
        if lights is None:
            print(
                "--nee: scene has no emissive triangles; "
                "continuing without light sampling",
                file=sys.stderr,
            )
            shadow_tracer = None
    # The depth cap is only meaningful when NEE is actually running
    # (render_frame_pt rejects nee_max_depth without lights).
    nee_depth = (
        args.nee_depth if args.nee and shadow_tracer is not None else None
    )
    if args.nee_depth is not None and nee_depth is None:
        print(
            "--nee-depth has no effect: requires --nee and an emissive "
            "scene; rendering without light sampling",
            file=sys.stderr,
        )
    if args.sobol and args.iid:
        print("--sobol and --iid are mutually exclusive", file=sys.stderr)
        return 2
    t0 = time.time()
    if mesh is not None:
        if args.adaptive:
            print(
                "--adaptive is single-device only; rendering uniform spp "
                "across the mesh", file=sys.stderr,
            )
        if args.denoise:
            print(
                "--denoise on the sharded renderer uses the fixed-sigma "
                "filter (no variance buffer)", file=sys.stderr,
            )
        from minipath_tpu.render.wavefront import make_pt_renderer_sharded

        renderer = make_pt_renderer_sharded(
            mesh,
            tracer,
            width=args.width,
            height=args.height,
            samples_per_packet=min(8, args.spp),
            bounces=args.bounces,
            compaction=not args.no_compaction,
            lights=lights,
            shadow_tracer=shadow_tracer,
            shadow_rr=not args.no_shadow_rr,
            nee_max_depth=nee_depth,
            rr_start=args.rr_start,
            rr_floor=args.rr_floor,
            min_live_frac=args.tail_cut,
            stratify=not args.iid,
            sobol=args.sobol,
        )
        img = renderer(
            tracer_state,
            table,
            camera.build_sampler((args.width, args.height)),
            jax.random.key(args.seed),
            args.spp,
            env=Environment.sky(),
        )
    elif args.adaptive:
        if args.sobol:
            print(
                "--sobol with --adaptive is not supported; rendering with "
                "jittered strata", file=sys.stderr,
            )
        if args.denoise:
            print(
                "--denoise with --adaptive uses the fixed-sigma filter "
                "(no variance buffer)", file=sys.stderr,
            )
        from minipath_tpu.render.adaptive import render_frame_pt_adaptive

        img = render_frame_pt_adaptive(
            tracer,
            tracer_state,
            table,
            camera.build_sampler((args.width, args.height)),
            jax.random.key(args.seed),
            width=args.width,
            height=args.height,
            spp=args.spp,
            bounces=args.bounces,
            env=Environment.sky(),
            compaction=not args.no_compaction,
            lights=lights,
            shadow_tracer=shadow_tracer,
            shadow_rr=not args.no_shadow_rr,
            nee_max_depth=nee_depth,
            rr_start=args.rr_start,
            stratify=not args.iid,
        )
    else:
        img = render_frame_pt(
            tracer,
            tracer_state,
            table,
            camera.build_sampler((args.width, args.height)),
            jax.random.key(args.seed),
            width=args.width,
            height=args.height,
            spp=args.spp,
            bounces=args.bounces,
            env=Environment.sky(),
            samples_per_packet=min(8, args.spp),
            compaction=not args.no_compaction,
            lights=lights,
            shadow_tracer=shadow_tracer,
            shadow_rr=not args.no_shadow_rr,
            nee_max_depth=nee_depth,
            rr_start=args.rr_start,
            rr_floor=args.rr_floor,
            min_live_frac=args.tail_cut,
            stratify=not args.iid,
            sobol=args.sobol,
            return_variance=args.denoise and args.spp >= 2,
            clamp=args.clamp,
        )
    var_img = None
    if isinstance(img, tuple):
        img, var_img = img
    a = np.array(img, copy=True)
    elapsed = time.time() - t0
    rays = args.width * args.height * args.spp  # camera rays (bounces extra)
    print(
        f"path traced {args.width}x{args.height} @ {args.spp} spp, "
        f"{args.bounces} bounces in {elapsed:.2f}s "
        f"({rays / elapsed / 1e6:.1f} Mpaths/s)",
        file=sys.stderr,
    )
    if args.denoise or args.aov:
        import jax.numpy as jnp

        from minipath_tpu.render.denoise import atrous_denoise, render_aux

        n_img, z_img = render_aux(
            tracer, tracer_state,
            camera.build_sampler((args.width, args.height)),
            jax.random.key(args.seed + 1),
            width=args.width, height=args.height,
        )
        if args.denoise:
            a[..., :3] = np.asarray(
                atrous_denoise(
                    jnp.asarray(a[..., :3]), n_img, z_img,
                    None if var_img is None else jnp.asarray(var_img),
                )
            )
            kind = "variance-guided" if var_img is not None else "edge-avoiding"
            print(f"denoised ({kind} a-trous)", file=sys.stderr)
        if args.aov:
            n_np = np.asarray(n_img)
            hit = np.any(n_np != 0.0, axis=-1)
            n_vis = np.where(hit[..., None], n_np * 0.5 + 0.5, 0.0)
            save_png(
                f"{args.aov}_normal.png",
                color_to_image(np.concatenate(
                    [n_vis, hit[..., None].astype(np.float64)], -1
                )),
            )
            z_np = np.asarray(z_img)
            z_hit = z_np[hit] if hit.any() else np.array([0.0, 1.0])
            lo, hi = float(z_hit.min()), float(z_hit.max())
            # Near = bright, far = dark, normalized over the hit range.
            z_vis = np.where(
                hit, 1.0 - (z_np - lo) / max(hi - lo, 1e-6), 0.0
            ).clip(0.0, 1.0)
            z_rgba = np.repeat(z_vis[..., None], 3, axis=-1)
            save_png(
                f"{args.aov}_depth.png",
                color_to_image(np.concatenate(
                    [z_rgba, np.ones_like(z_vis)[..., None]], -1
                )),
            )
            print(f"saved {args.aov}_normal.png, {args.aov}_depth.png",
                  file=sys.stderr)
    a[..., :3] = np.clip(a[..., :3], 0.0, 1.0) ** (1 / 2.2)  # display gamma
    save_png(args.output, color_to_image(a))
    print(f"saved {args.output}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
