"""Losses + pjit train step & loop (SURVEY.md C17, C18; §3.1 call stack).

The hot loop is one jit-compiled step over the ``(data, model)`` mesh: batch
sharded on ``data``, params replicated; DP gradients reduce via the psum XLA
inserts from the output sharding (SURVEY.md §2.3, §5.8 — no hand-written
collectives). AdamW + warmup-cosine + grad clip + EMA; the factorized prior's
quantiles train on a separate aux Adam (split via optax.multi_transform).
"""

from __future__ import annotations

import os
import time
from typing import Any, Callable, Iterator, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from tpucdc.config import Config
from tpucdc.model import CDCModel, init_model
from tpucdc.ops import make_schedule
from tpucdc.runtime import make_mesh


class TrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    ema_params: Any
    opt_state: Any


def make_optimizer(cfg: Config):
    tc = cfg.train
    lr = optax.warmup_cosine_decay_schedule(
        0.0, tc.lr, tc.warmup_steps, max(tc.steps, tc.warmup_steps + 1),
        end_value=tc.lr * 0.05)
    main = optax.chain(
        optax.clip_by_global_norm(tc.grad_clip),
        optax.adamw(lr, weight_decay=tc.weight_decay),
    )
    aux = optax.adam(tc.aux_lr)

    def label_fn(params):
        def label(path, _):
            return "aux" if any(
                getattr(k, "key", None) == "quantiles" for k in path) else "main"
        return jax.tree_util.tree_map_with_path(label, params)

    return optax.multi_transform({"main": main, "aux": aux}, label_fn)


def loss_fn(model: CDCModel, params, batch, rng, tables, rd_lambda: float,
            train: bool = True, distortion: str = "eps",
            x0_weight: float = 1.0, rd_lambdas: tuple = (),
            diff_weight: float = 1.0,
            lpips_weight: float = 0.0, lpips_fn=None):
    """loss = bpp + λ·distortion + aux (SURVEY.md C17; BASELINE.json:9).

    distortion: "eps" (ε-prediction MSE), "x0" (one-step x₀ MSE) or "both".
    rd_lambdas: variable-rate training — per-sample λ looked up by the
    model's sampled gain index (requires codec.num_qualities == len(grid)).
    With codec.synthesis, λ weights MSE(x̄, x) and the diffusion terms get
    the fixed ``diff_weight`` instead (see inline comment).
    """
    out = model.apply(params, batch, rng, tables, train=train)
    axes = tuple(range(1, batch.ndim))
    mse_eps_s = jnp.mean(jnp.square(out["eps"] - out["eps_hat"]), axis=axes)
    # Clip the one-step x₀ estimate to the image range before the MSE, as the
    # sampler itself does (sampling/ddim.py clip_x0): the raw estimate scales
    # like (√(1-ᾱ)/√ᾱ)·ε-error and explodes at high t (observed ~1e3 spikes
    # in the r2 probe), which would let a few high-noise samples dominate the
    # distortion gradient.
    x0_pred = jnp.clip(out["x0_pred"], -1.0, 1.0)
    mse_x0_s = jnp.mean(jnp.square(out["x0"] - x0_pred), axis=axes)
    if distortion == "eps":
        dist_s = mse_eps_s
    elif distortion == "x0":
        dist_s = mse_x0_s
    elif distortion == "both":
        dist_s = mse_eps_s + x0_weight * mse_x0_s
    else:
        raise ValueError(f"unknown distortion {distortion!r}")
    mse_gs_s = None
    diff_s = None
    if out.get("x_bar") is not None:
        # Deterministic-synthesis distortion (codec.synthesis): the R-D
        # tradeoff rides on λ·MSE(x̄, x) ALONE — g_a/g_s/entropy models train
        # as a classical mean-scale-hyperprior codec. The diffusion ε/x₀
        # terms train the refiner at the FIXED diff_weight: λ-scaling them
        # would let λ·mse_eps (irreducible ≫ mse_gs) swamp the rate term at
        # high λ and decouple λ from the actual rate point.
        mse_gs_s = jnp.mean(jnp.square(out["x_bar"] - batch), axis=axes)
        diff_s = dist_s
        dist_s = mse_gs_s
    if rd_lambdas and out["quality"] is not None:
        lam = jnp.asarray(rd_lambdas, jnp.float32)[out["quality"]]
        weighted = jnp.mean(lam * dist_s)
    else:
        weighted = rd_lambda * jnp.mean(dist_s)
    if diff_s is not None:
        weighted = weighted + diff_weight * jnp.mean(diff_s)
    lp = None
    if lpips_weight > 0.0 and lpips_fn is not None:
        # Perceptual term on the REFINER output (clipped one-step x₀
        # estimate), not on x̄: perception-distortion split (r3). g_s stays
        # MSE-optimal under λ (the R-D anchor); the diffusion refiner gets
        # the perceptual objective — an MSE-only refiner regresses to the
        # same conditional mean g_s already computes and can never beat it
        # perceptually (the r2 finding: LPIPS flat, PSNR down). Clipping
        # keeps the metric in its calibrated [-1,1] range (ADVICE r2).
        lp = lpips_fn(x0_pred, batch)
        weighted = weighted + lpips_weight * lp
    rate = out["bpp_y"] + out["bpp_z"]
    aux = model.apply(params, method=CDCModel.aux_loss)
    loss = rate + weighted + aux
    metrics = {"loss": loss, "bpp": rate, "bpp_y": out["bpp_y"],
               "bpp_z": out["bpp_z"], "mse_eps": jnp.mean(mse_eps_s),
               "mse_x0": jnp.mean(mse_x0_s), "aux": aux}
    if mse_gs_s is not None:
        metrics["mse_gs"] = jnp.mean(mse_gs_s)
    if lp is not None:
        metrics["lpips_term"] = lp
    return loss, metrics


def make_train_step(model: CDCModel, cfg: Config, mesh, tables,
                    state_shardings=None
                    ) -> Callable[..., tuple[TrainState, dict]]:
    """Build the jit-compiled DP(+TP) train step for the given mesh.

    The step takes λ as a TRACED scalar (4th arg), not a baked constant:
    every new HLO costs 5-15 min over the axon remote-compile tunnel
    (CLAUDE.md), so the whole BASELINE.json:9 λ-grid sweep must share one
    compiled executable.

    ``state_shardings``: optional per-leaf NamedSharding tree for the
    TrainState (parallel/tp_rules.py — params/EMA/optimizer moments sharded
    by output channel over the ``model`` axis). None = fully replicated."""
    opt = make_optimizer(cfg)
    ema_decay = cfg.train.ema_decay
    distortion = cfg.train.distortion

    rd_lambdas = cfg.train.rd_lambdas
    diff_weight = cfg.train.diff_weight
    lpips_weight = cfg.train.lpips_weight
    lpips_fn = None
    if lpips_weight > 0.0:
        from tpucdc.eval.lpips import PerceptualMetric
        metric = PerceptualMetric()              # weights-gated (env .npz)
        lpips_fn = metric.distance
        # Loud kind label so a sweep row trained against the random-conv
        # proxy can't be mistaken for real-LPIPS-trained (VERDICT r2 weak 7).
        print(f"[train] lpips term active: kind={metric.kind} "
              f"weight={lpips_weight}", flush=True)

    def step_fn(state: TrainState, batch, rng, rd_lambda):
        if batch.dtype == jnp.uint8:
            # uint8 batches convert ON DEVICE (see train_crop_iterator
            # as_uint8): 4× less relay transfer per step.
            batch = batch.astype(jnp.float32) * (1.0 / 127.5) - 1.0
        grads, metrics = jax.grad(
            lambda p: loss_fn(model, p, batch, rng, tables, rd_lambda,
                              distortion=distortion, rd_lambdas=rd_lambdas,
                              diff_weight=diff_weight,
                              lpips_weight=lpips_weight, lpips_fn=lpips_fn),
            has_aux=True)(state.params)
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        # EMA with warmup: early on the effective decay ramps from 0 so the
        # average doesn't carry the random init for tens of thousands of
        # steps (decay 0.9999 alone keeps ~30 % init weight at step 12k).
        step_f = state.step.astype(jnp.float32)
        decay = jnp.minimum(ema_decay, (1.0 + step_f) / (10.0 + step_f))
        ema = jax.tree_util.tree_map(
            lambda e, p: e * decay + p * (1 - decay),
            state.ema_params, params)
        metrics["grad_norm"] = optax.global_norm(grads)
        return TrainState(state.step + 1, params, ema, opt_state), metrics

    replicated = NamedSharding(mesh, P())
    batch_sharded = NamedSharding(mesh, P("data", None, None, None))
    state_sh = replicated if state_shardings is None else state_shardings
    k = cfg.train.steps_per_dispatch
    if k <= 1:
        return jax.jit(
            step_fn,
            in_shardings=(state_sh, batch_sharded, replicated, replicated),
            out_shardings=(state_sh, replicated),
            donate_argnums=(0,),
        )

    # Multi-step dispatch (r3): lax.scan over K optimizer steps inside ONE
    # jit call. On this box the single step is relay-dispatch-bound (~77 ms
    # RPC around ~2 ms of medium-model compute — PERF.md r3), so amortizing
    # the dispatch across K steps multiplies training throughput. K batches
    # ship as one [K,B,H,W,C] uint8 transfer; per-step rngs as a [K] key
    # array; metrics reported from the LAST step of the chunk.
    def multi_fn(state: TrainState, batches, rngs, rd_lambda):
        def body(st, inp):
            b, r = inp
            return step_fn(st, b, r, rd_lambda)
        state, ms = jax.lax.scan(body, state, (batches, rngs))
        metrics = jax.tree_util.tree_map(lambda a: a[-1], ms)
        return state, metrics

    chunk_sharded = NamedSharding(mesh, P(None, "data", None, None, None))
    return jax.jit(
        multi_fn,
        in_shardings=(state_sh, chunk_sharded, replicated, replicated),
        out_shardings=(state_sh, replicated),
        donate_argnums=(0,),
    )


def create_state(cfg: Config, rng, mesh=None) -> tuple[CDCModel, TrainState]:
    cfg = cfg.validated()
    model, params = init_model(cfg.model, rng, image_size=cfg.train.crop_size)
    opt = make_optimizer(cfg)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        ema_params=jax.tree_util.tree_map(jnp.copy, params),
        opt_state=opt.init(params),
    )
    if mesh is not None:
        if cfg.train.param_sharding == "tensor":
            from tpucdc.parallel.tp_rules import apply_tp
            state = apply_tp(state, mesh)
        else:
            sharding = NamedSharding(mesh, P())
            state = jax.tree_util.tree_map(
                lambda x: jax.device_put(x, sharding), state)
    return model, state


def schedule_tables(cfg: Config):
    sched = make_schedule(cfg.model.schedule.kind, cfg.model.schedule.num_steps)
    return {"sqrt_ab": sched.sqrt_alpha_bars,
            "sqrt_1mab": sched.sqrt_one_minus_alpha_bars}


def fit(cfg: Config, data_iter: Iterator, mesh=None,
        writer=None, checkpointer=None, start_state: Optional[TrainState] = None,
        num_steps: Optional[int] = None):
    """Training loop (SURVEY.md §3.1). Thin host loop around the jit step.

    data_iter yields [B,H,W,3] arrays in [-1,1]. Returns the final state.
    """
    cfg = cfg.validated()
    if mesh is None:
        mesh = make_mesh()
    tables = schedule_tables(cfg)
    model, state = create_state(cfg, jax.random.key(cfg.train.seed), mesh)
    if start_state is not None:
        state = start_state
    state_shardings = None
    if cfg.train.param_sharding == "tensor":
        from tpucdc.parallel.tp_rules import tree_shardings
        state_shardings = tree_shardings(state, mesh)
    train_step = make_train_step(model, cfg, mesh, tables, state_shardings)

    root_key = jax.random.key(cfg.train.seed + 1)
    total = num_steps if num_steps is not None else cfg.train.steps
    k = max(cfg.train.steps_per_dispatch, 1)
    if total % k:
        # The K-step dispatch program is compiled for exactly K optimizer
        # steps (a smaller final chunk would be a new 5-15 min HLO on the
        # axon tunnel), so a non-divisible total would silently overshoot by
        # up to K-1 steps and shift the cosine-decay endpoint (ADVICE r3).
        raise ValueError(
            f"num_steps={total} is not a multiple of steps_per_dispatch={k}; "
            f"pick a divisible total (overshoot would run {k - total % k} "
            f"extra steps past the schedule end)")
    batch_sharding = NamedSharding(
        mesh, P("data", None, None, None) if k == 1
        else P(None, "data", None, None, None))
    rd_lambda = jnp.asarray(cfg.train.rd_lambda, jnp.float32)
    t_last, s_last = time.time(), int(state.step)
    import numpy as _np
    prefetch = None
    if k > 1:
        # Chunk-prefetch thread (r3): with K-step dispatch the Python
        # crop+stack loop is the measured bottleneck on this single-core
        # host (PERF.md r3 — training halves under any CPU contention).
        # One producer thread assembles the next [K,B,H,W,C] chunk while
        # the device runs the current scan. Data ORDER is unchanged
        # (single producer, FIFO queue), so trajectories stay identical.
        import queue as _queue
        import threading as _threading
        q: "_queue.Queue" = _queue.Queue(maxsize=2)
        stop = _threading.Event()

        def _producer():
            # Any data-iterator failure (StopIteration from a finite iter,
            # IO errors, …) is shipped to the consumer as a sentinel and
            # re-raised there — without this the exception died in the
            # thread and fit() blocked forever on q.get() (ADVICE r3).
            try:
                while not stop.is_set():
                    chunk = _np.stack([next(data_iter) for _ in range(k)])
                    while not stop.is_set():
                        try:
                            q.put(chunk, timeout=0.5)
                            break
                        except _queue.Full:
                            continue
            except BaseException as e:  # noqa: BLE001 — relayed, not dropped
                while not stop.is_set():
                    try:
                        q.put(e, timeout=0.5)
                        break
                    except _queue.Full:
                        continue

        prefetch = (_threading.Thread(target=_producer, daemon=True), stop, q)
        prefetch[0].start()
    try:
        done = 0
        while done < total:
            step = int(state.step)
            if (cfg.train.fault_inject_step >= 0
                    and step <= cfg.train.fault_inject_step < step + k):
                # Debug hook exercising preemption-safe resume (§5.3).
                os._exit(42)
            if k == 1:
                batch = jax.device_put(next(data_iter), batch_sharding)
                rng = jax.random.fold_in(root_key, step)
            else:
                item = prefetch[2].get()
                if isinstance(item, BaseException):
                    raise item       # producer-thread failure (ADVICE r3)
                batch = jax.device_put(item, batch_sharding)
                rng = jax.vmap(lambda s: jax.random.fold_in(root_key, s))(
                    jnp.arange(step, step + k))
            state, metrics = train_step(state, batch, rng, rd_lambda)
            done += k
            next_step = step + k
            if writer is not None and (next_step % cfg.train.log_every) < k:
                m = {kk: float(v) for kk, v in metrics.items()}
                now = time.time()
                m["steps_per_sec"] = (next_step - s_last) / max(
                    now - t_last, 1e-9)
                t_last, s_last = now, next_step
                writer(next_step, m)
            if (checkpointer is not None
                    and (next_step % cfg.train.checkpoint_every) < k):
                checkpointer(next_step, state)
    finally:
        if prefetch is not None:
            prefetch[1].set()
    return model, state
