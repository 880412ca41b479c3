"""``python -m tpucdc <verb>`` — the four pipeline verbs (SURVEY.md C25, §3).

Verbs:
  train       — R-D training loop with checkpointing (BASELINE.json:9 per-λ).
  compress    — image file → .tpucdc bitstream.
  decompress  — .tpucdc bitstream → PNG.
  eval        — dataset eval: R-D rows / latency / sweeps → JSONL.

Config: ``--preset tiny|flagship`` plus ``--set a.b.c=value`` dot-overrides
(SURVEY.md §5.6). ``--profile DIR`` wraps device work in jax.profiler traces.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import pathlib
import sys

import numpy as np


def _build_config(args):
    from tpucdc import presets
    from tpucdc.config import apply_overrides
    cfg = {"tiny": presets.tiny, "flagship": presets.flagship}[args.preset]()
    overrides = dict(kv.split("=", 1) for kv in (args.set or []))
    if overrides:
        cfg = apply_overrides(cfg, overrides)
    return cfg.validated()


def _load_runtime(args):
    import jax
    from tpucdc.model import init_model
    from tpucdc.pipelines.codec_runtime import CodecRuntime
    from tpucdc.pipelines.train import TrainState, create_state
    from tpucdc.utils.checkpoint import CheckpointManager

    cfg = _build_config(args)
    model, params = init_model(cfg.model, jax.random.key(0),
                               image_size=cfg.train.crop_size)
    if args.checkpoint:
        mngr = CheckpointManager(args.checkpoint)
        _, abstract = create_state(cfg, jax.random.key(0))
        state = mngr.restore(abstract)
        params = state.ema_params          # decode from EMA weights
    # --cdf-tables sidecar: load if present (decode never depends on float
    # table-rebuild reproducibility — ADVICE r1), else build and save there.
    tables_path = getattr(args, "cdf_tables", None)
    tables = None
    if tables_path and pathlib.Path(tables_path).exists():
        tables = CodecRuntime.load_cdf_tables(tables_path)
    runtime = CodecRuntime(cfg, model, params, cdf_tables=tables)
    if tables_path and tables is None:
        runtime.save_cdf_tables(tables_path)
    return cfg, runtime


def cmd_train(args):
    import jax
    from tpucdc.data import kodak, train_crop_iterator
    from tpucdc.pipelines import train as train_lib
    from tpucdc.runtime import make_mesh
    from tpucdc.runtime.debug import maybe_init_distributed
    from tpucdc.utils import CheckpointManager, MetricLogger, profile_trace

    maybe_init_distributed()       # no-op single-host (SURVEY.md §5.8)
    cfg = _build_config(args)
    workdir = pathlib.Path(args.workdir or cfg.workdir)
    tag = f"lambda{cfg.train.rd_lambda:g}"
    logger = MetricLogger(workdir / tag / "logs")
    ckpt = CheckpointManager(workdir / tag / "ckpt")

    ds = kodak()
    data = train_crop_iterator(ds.images, cfg.train.batch_size,
                               cfg.train.crop_size, seed=cfg.train.seed, as_uint8=True)
    mesh = make_mesh()
    with profile_trace(args.profile):
        train_lib.fit(cfg, data, mesh=mesh, writer=logger,
                      checkpointer=lambda step, st: ckpt.save(step, st),
                      num_steps=args.steps)
    logger.close()


def _is_dir_output(inputs, output) -> bool:
    """Directory-output (batch) mode: several inputs, a trailing slash, or
    an existing directory — so ``decompress blobs/*.tpucdc outs/`` works
    even when the glob matches exactly one file."""
    return (len(inputs) > 1 or str(output).endswith(os.sep)
            or pathlib.Path(output).is_dir())


def _batch_outputs(inputs, output, suffix):
    """Per-input paths inside the ``output`` directory. Same-stem inputs
    from different directories are disambiguated (stem, stem_2, stem_3…)
    instead of silently overwriting each other."""
    outdir = pathlib.Path(output)
    outdir.mkdir(parents=True, exist_ok=True)
    paths, used = [], {}
    for p in inputs:
        stem = pathlib.Path(p).stem
        used[stem] = used.get(stem, 0) + 1
        name = stem if used[stem] == 1 else f"{stem}_{used[stem]}"
        paths.append(outdir / (name + suffix))
    return paths


def cmd_compress(args):
    from PIL import Image
    _, runtime = _load_runtime(args)
    imgs = [np.asarray(Image.open(p).convert("RGB")) for p in args.input]
    batch = _is_dir_output(args.input, args.output)
    if args.target_bpp is not None and args.quality is not None:
        raise SystemExit("--target-bpp and --quality are exclusive")
    if args.optimize_gamma not in (False, True, "spatial"):
        raise SystemExit("--optimize-gamma takes no value or 'spatial'")
    # Echo the dial used in every per-file row: an explicit --quality
    # (including fractional values, which change the bitstream version) is
    # recorded just like the rate-control path's chosen quality (ADVICE r4).
    qualities = [args.quality] * len(imgs)
    if not batch:
        paths = [pathlib.Path(args.output)]
    else:
        paths = _batch_outputs(args.input, args.output, ".tpucdc")
    if args.target_bpp is not None:
        # Rate control: per-image continuous-quality bisection (VR model).
        blobs = []
        for i, im in enumerate(imgs):
            blob, q, _ = runtime.compress_to_bpp(
                im, args.target_bpp, optimize_gamma=args.optimize_gamma)
            blobs.append(blob)
            qualities[i] = q
    elif not batch:
        blobs = [runtime.compress(imgs[0], optimize_gamma=args.optimize_gamma,
                                  quality=args.quality)]
    else:
        # Batch: the software-pipelined encoder (host rANS ‖ device
        # analysis). optimize_gamma is per-image serial by construction.
        if args.optimize_gamma:
            blobs = [runtime.compress(im, optimize_gamma=args.optimize_gamma,
                                      quality=args.quality) for im in imgs]
        else:
            blobs = runtime.compress_many(imgs, quality=args.quality)
    for path, img, blob, q in zip(paths, imgs, blobs, qualities):
        path.write_bytes(blob)
        bpp = len(blob) * 8 / (img.shape[0] * img.shape[1])
        row = {"bytes": len(blob), "bpp": bpp}
        if batch:
            row["file"] = str(path)
        if q is not None:
            row["quality"] = q
        if args.optimize_gamma:
            from tpucdc.entropy import read_bitstream
            hdr = read_bitstream(blob)[0]
            row["gamma"] = hdr.gamma_or_none
            if hdr.gamma_grid is not None:
                row["gamma_grid"] = list(hdr.gamma_grid.shape)
        print(json.dumps(row))


def cmd_decompress(args):
    import jax
    from PIL import Image
    from tpucdc.utils import profile_trace
    _, runtime = _load_runtime(args)
    blobs = [pathlib.Path(p).read_bytes() for p in args.input]
    dir_out = _is_dir_output(args.input, args.output)
    with profile_trace(args.profile):
        if dir_out:
            paths = _batch_outputs(args.input, args.output, ".png")
        else:
            paths = [pathlib.Path(args.output)]
        if args.tiled:
            # Tiled decode has no pipelined batch variant — serial per
            # image, preserving the bounded-HBM property --tiled asks for.
            outs = [runtime.decompress_tiled(b, rng=jax.random.key(args.seed),
                                             steps=args.steps) for b in blobs]
        elif len(blobs) == 1:
            outs = [runtime.decompress(blobs[0],
                                       rng=jax.random.key(args.seed),
                                       steps=args.steps)]
        else:
            # Batch: FIFO-pipelined decode (host rANS ‖ device scan).
            outs = runtime.decompress_many(blobs,
                                           rng=jax.random.key(args.seed),
                                           steps=args.steps)
    for path, out in zip(paths, outs):
        Image.fromarray(out).save(path)
        row = {"shape": list(out.shape)}
        if dir_out:
            row["file"] = str(path)
        print(json.dumps(row))


def cmd_eval(args):
    from tpucdc import presets
    from tpucdc.data import eval_dataset
    from tpucdc.eval.harness import (EvalOptions, evaluate_dataset,
                                     step_guidance_sweep, time_decode)
    from tpucdc.utils import MetricLogger

    cfg, runtime = _load_runtime(args)
    ds = eval_dataset(args.dataset)
    logger = MetricLogger(args.workdir or cfg.workdir)
    mesh = None
    if args.mesh:
        from tpucdc.runtime import make_mesh
        mesh = make_mesh()
    opts = EvalOptions(steps=args.steps or cfg.sample.steps,
                       tiled=args.tiled, mesh=mesh,
                       compute_lpips=not args.no_lpips)

    if args.sweep == "perceptual":
        # BASELINE.json:11 — LPIPS/FID over step-count × guidance grid.
        rows = step_guidance_sweep(runtime, ds, presets.STEP_GRID,
                                   presets.GUIDANCE_GRID, opts,
                                   on_row=logger.write_row)
        for r in rows:
            logger.write_row(r)
        print(json.dumps(rows, default=float))
    elif args.sweep == "latency":
        # BASELINE.json:2/:8 — decode latency + steps/sec on one image.
        blob = runtime.compress(ds.images[0])
        t = time_decode(runtime, blob, steps=opts.steps)
        logger.write_row(t)
        print(json.dumps(t, default=float))
    else:
        res = evaluate_dataset(runtime, ds, opts, on_row=logger.write_row)
        logger.write_row({"aggregate": res["aggregate"]})
        print(json.dumps(res["aggregate"], default=float))
    logger.close()


def cmd_rd_sweep(args):
    """BASELINE.json:9 — R-D curve over the λ grid. Each λ needs its own
    trained checkpoint under <workdir>/lambda{λ}/ckpt (cmd_train layout)."""
    import jax
    from tpucdc import presets
    from tpucdc.data import eval_dataset
    from tpucdc.eval.harness import EvalOptions, rd_sweep
    from tpucdc.model import init_model
    from tpucdc.pipelines.codec_runtime import CodecRuntime
    from tpucdc.pipelines.train import create_state
    from tpucdc.utils import CheckpointManager, MetricLogger

    cfg = _build_config(args)
    logger = MetricLogger(args.workdir or cfg.workdir)
    workdir = pathlib.Path(args.workdir or cfg.workdir)

    def make_runtime(lam: float) -> CodecRuntime:
        c = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, rd_lambda=lam))
        model, params = init_model(c.model, jax.random.key(0),
                                   image_size=c.train.crop_size)
        ckpt_dir = workdir / f"lambda{lam:g}" / "ckpt"
        if ckpt_dir.exists():
            mngr = CheckpointManager(ckpt_dir)
            _, abstract = create_state(c, jax.random.key(0))
            params = mngr.restore(abstract).ema_params
        return CodecRuntime(c, model, params)

    ds = eval_dataset(args.dataset)
    opts = EvalOptions(steps=args.steps or cfg.sample.steps,
                       compute_lpips=not args.no_lpips)
    lambdas = ([float(x) for x in args.lambdas.split(",")]
               if args.lambdas else presets.RD_LAMBDA_GRID)
    points = rd_sweep(make_runtime, lambdas, ds, opts,
                      on_row=logger.write_row)
    for p in points:
        logger.write_row(p)
    print(json.dumps(points, default=float))
    logger.close()


def main(argv=None):
    p = argparse.ArgumentParser(prog="tpucdc")
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(sp):
        sp.add_argument("--preset", default="flagship",
                        choices=["tiny", "flagship"])
        sp.add_argument("--set", action="append", metavar="KEY=VAL")
        sp.add_argument("--checkpoint", default=None)
        sp.add_argument("--workdir", default=None)
        sp.add_argument("--profile", default=None, metavar="TRACE_DIR")
        sp.add_argument("--seed", type=int, default=0)
        sp.add_argument("--cdf-tables", default=None, metavar="NPZ",
                        help="coder-table sidecar: loaded if it exists, "
                             "else written after the build")

    sp = sub.add_parser("train", help="R-D training")
    common(sp)
    sp.add_argument("--steps", type=int, default=None)
    sp.set_defaults(fn=cmd_train)

    sp = sub.add_parser("compress")
    sp.add_argument("--optimize-gamma", nargs="?", const=True, default=False,
                    metavar="spatial",
                    help="encode-time per-image serving-dial search: decode "
                         "at gamma in {0,.25,.5,.75,1}, score PSNR against "
                         "the input, store the winner in the v3 header. "
                         "'--optimize-gamma spatial' additionally fits a "
                         "per-tile gamma grid in closed form and keeps it "
                         "(v5 header) when it beats the scalar pick")
    sp.add_argument("--quality", type=float, default=None,
                    help="continuous VR quality in [0, num_qualities-1]; "
                         "fractional values interpolate the trained gain "
                         "ladder (v4 header)")
    sp.add_argument("--target-bpp", type=float, default=None,
                    help="rate control: bisect the continuous quality dial "
                         "to hit this bits-per-pixel (VR model; exclusive "
                         "with --quality)")
    common(sp)
    sp.add_argument("input", nargs="+",
                    help="image file(s); with several, OUTPUT is a directory "
                         "and encoding pipelines host coding ‖ device analysis")
    sp.add_argument("output")
    sp.set_defaults(fn=cmd_compress)

    sp = sub.add_parser("decompress")
    common(sp)
    sp.add_argument("input", nargs="+",
                    help="bitstream file(s); with several, OUTPUT is a "
                         "directory and decoding is FIFO-pipelined")
    sp.add_argument("output")
    sp.add_argument("--steps", type=int, default=None)
    sp.add_argument("--tiled", action="store_true")
    sp.set_defaults(fn=cmd_decompress)

    sp = sub.add_parser("eval")
    common(sp)
    sp.add_argument("--dataset", default="kodak",
                    choices=["kodak", "clic2020", "tecnick"])
    sp.add_argument("--steps", type=int, default=None)
    sp.add_argument("--tiled", action="store_true")
    sp.add_argument("--no-lpips", action="store_true")
    sp.add_argument("--mesh", action="store_true",
                    help="shard tiled decode over all local devices")
    sp.add_argument("--sweep", default=None,
                    choices=["perceptual", "latency"])
    sp.set_defaults(fn=cmd_eval)

    sp = sub.add_parser("rd-sweep", help="R-D curve over the λ grid")
    common(sp)
    sp.add_argument("--dataset", default="kodak",
                    choices=["kodak", "clic2020", "tecnick"])
    sp.add_argument("--steps", type=int, default=None)
    sp.add_argument("--no-lpips", action="store_true")
    sp.add_argument("--lambdas", default=None,
                    help="comma-separated λ values (default: preset grid)")
    sp.set_defaults(fn=cmd_rd_sweep)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
