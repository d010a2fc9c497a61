"""The trainer: dataset generation, fused jitted train step, eval, ckpt, log.

One trainer for all four problems (replacing the four copy-pasted
``train_FEONet.py`` epoch loops, reference :374-483). TPU-first structure:

  * featurize -> forward -> residual loss -> grad -> optimizer update is ONE
    jit program; the CNN input grid, A@M product, and scatter plans are
    trace-time constants (the reference rebuilds them per step,
    train_FEONet.py:264,280-283).
  * full-batch by default (reference BATCH_SIZE = NUM_DATA = 1000); the batch
    axis is sharded over the device mesh when >1 device is visible.
  * eval cadence/checkpointing mirror the reference's per-100-epoch pattern.
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..models import build_model
from ..parallel import (
    data_mesh,
    data_model_mesh,
    replicate,
    shard_batch,
    shard_ops,
    shard_params,
)
from ..problems.base import Problem
from .metrics import component_errors, trajectory_rel_l2
from .optimizers import build_optimizer, build_schedule

Array = jax.Array


@dataclasses.dataclass
class TrainConfig:
    model: str = "UNetWithHead"
    optimizer: str = "adam"
    lr: float = 1e-3
    lr_schedule: str = "constant"  # 'constant' | 'cosine' | 'exponential'
    lr_final_fraction: float = 0.01
    # global-norm gradient clipping (0 = off, the reference behavior);
    # stabilizes full-batch residual training against loss spikes
    grad_clip: float = 0.0
    # 'bfloat16' stores Adam moments in bf16 with stochastic rounding —
    # the opt-in lever for the optimizer-bandwidth-bound BSR-47k step
    # (docs/performance.md §BSR). Default f32 = exact reference Adam (C21).
    moment_dtype: str = "float32"
    epochs: int = 2000
    batch_size: int | None = None  # None = full batch (reference default)
    # >1: run K full-batch train steps per device dispatch (one jitted
    # lax.scan block). The small-ng steps are ~2-3 ms of device time but the
    # per-step dispatch RPC over a tunneled TPU costs 5-12 ms — scan blocks
    # amortize one dispatch over K steps, so the chip runs at its compute
    # rate instead of the host's round-trip latency. Identical math (the
    # per-step RNG folds in the step index; schedules/EMA/nan-guard all key
    # off state.step inside the block). Full-batch, non-lbfgs runs only;
    # eval_every (and resample_every, if set) must be multiples of it.
    scan_steps: int = 0
    num_train: int = 1000
    num_val: int = 1000
    seed: int = 0
    eval_every: int = 100
    ckpt_dir: str | None = None
    # checkpoint cadence in epochs (None = every eval). Large models over a
    # tunneled TPU pay minutes per device_get+write — decouple from eval.
    ckpt_every: int | None = None
    log_path: str | None = None
    data_parallel: bool = True
    # Tensor (model) parallelism: devices on the 'model' axis of a 2-D
    # ('data', 'model') mesh. The coefficient head (the Dense producing ng
    # outputs — ~150M params at the 50k-DoF stretch) is column-sharded and
    # dense residual operators row-sharded; see parallel/mesh.py. 1 = off.
    model_axis: int = 1
    model_kwargs: dict = dataclasses.field(default_factory=dict)
    # NaN/Inf guard: skip the update when the loss is non-finite (the
    # reference's batch-skip guards, FEONet_steady_Navier-Stokes/
    # train_FEONet.py:434-469); abort after `nan_limit` consecutive skips.
    nan_guard: bool = True
    nan_limit: int = 50
    profile_dir: str | None = None  # jax.profiler trace of a 10-step window
    # Residual training is label-free; reference solutions are only consumed
    # by validation metrics. False skips the (expensive, e.g. Newton-per-
    # sample) ground truth for the TRAIN split — val metrics are unaffected.
    truth_for_train: bool = True
    # Label-free root selection for the NONLINEAR problems: the residual
    # objective is satisfied by EVERY root of the system (run 58: residual
    # 1.3e-6 with coeff error 0.77 — the network picks wrong branches), so
    # bias the objective toward the minimal-correction root by penalizing
    # the raw network output norm. Meaningful with stokes_shift, where the
    # raw output IS the distance from the Stokes solution and the stable
    # branch is the one continuously connected to it. Still label-free.
    correction_penalty: float = 0.0
    # 'residual'  — label-free Galerkin residual (the reference's method).
    # 'supervised'— MSE against the framework's solver ground truth (the
    #               labels the reference's create_data.py computes but only
    #               uses for validation). At the ~50k-DoF stretch scale the
    #               f32 residual objective cannot converge the velocity
    #               (error <= cond(A) * achievable relative residual, with
    #               cond ~ 2.3e4 at nx=72 and the f32 floor ~1e-4) — the
    #               supervised objective sidesteps the conditioning entirely.
    # 'hybrid'    — supervised + residual_weight * residual.
    loss_mode: str = "residual"
    residual_weight: float = 1.0  # residual term weight in 'hybrid'
    # Which physics term 'hybrid' adds to the supervised anchor:
    # 'galerkin'   — the raw nonlinear Galerkin residual (every root of the
    #                system is a minimizer; can destabilize the anchor —
    #                runs/r2c/ns450_hysplit6k diverged finitely at rw=1e-3).
    # 'linearized' — the residual linearized about the LABEL,
    #                ||dr∘J(u*)(pred-u*)||² (steady_ns only): convex with
    #                u* its unique minimizer, so it reweights the supervised
    #                metric by the PDE's own J-norm without root ambiguity
    #                (residual/losses.py:ns_linearized_residual). Exclusive
    #                of resample_every (it needs labels).
    hybrid_kind: str = "galerkin"
    # Exponential moving average of the params (Polyak averaging). 0 = off.
    # Evaluation/checkpoints use the EMA params when enabled — full-batch
    # residual training oscillates around the minimum at constant lr, and
    # the iterate average sits measurably closer to it than the last iterate.
    ema_decay: float = 0.0
    # Residual cascade: after the main run, train a FRESH same-architecture
    # network for this many epochs on the f64-recomputed DEFECT of the
    # frozen stage-1 predictions (Problem.defect_batch64) — label-free
    # boosting; the combined prediction is unmap(pred0 + e). 0 = off.
    cascade_epochs: int = 0
    # Stage-2 (cascade) objective. 'residual' = label-free defect residual
    # (default, r3 behavior). 'supervised' = MSE against the EXACT defect
    # solution (Problem.defect_truth64 — for timedep_stokes the labels cost
    # T back-solves on the already-factorized system, no extra data
    # generation), optionally p-weighted via ProblemConfig.p_weight: the
    # label-free equation metric drives ABSOLUTE errors uniformly, leaving
    # the small-norm pressure component's RELATIVE error floored ~0.017
    # (r3 td_cascade7/8) — the supervised metric can weight it directly.
    cascade_loss_mode: str = "residual"
    # Label-free infinite-data regime: redraw the ENTIRE training batch every
    # N epochs (fresh forcing/IC samples + host-f64 loads). The residual
    # objective needs no labels, so the effective training set is unbounded —
    # this removes the fixed-set generalization gap that a reference-style
    # precomputed dataset has (its FEniCS loads are baked offline). Residual
    # loss mode only. 0 = off.
    resample_every: int = 0
    # Size of each redrawn batch (0 = the train-split size). In split hybrid
    # the fresh batch only feeds the residual term, so it can be smaller
    # than the labeled set to bound the extra forward/backward cost.
    resample_size: int = 0
    # Convection continuation for the NS residual objectives: gamma ramps
    # linearly 0 -> 1 over this many epochs (then stays 1), scaling the
    # quadratic convection term — the training-objective analog of the
    # ground-truth solver's convection-strength homotopy
    # (linalg/newton.py:newton_solve_continuation). Early training sees the
    # well-conditioned (preconditionable) Stokes system; the target morphs
    # into the true NS residual as gamma -> 1. 0 = off (gamma = 1 always).
    conv_ramp_epochs: int = 0
    # Loss-explosion abort: trip when the eval-window loss exceeds
    # divergence_factor * its running minimum (catches FINITE blow-ups the
    # isfinite nan_guard cannot — e.g. the split-hybrid 6e24 divergence,
    # runs/r2c/ns450_hysplit6k). On trip: restore the best-tracked state
    # (see track_best) and stop, recording {'diverged': epoch} in history.
    # The reference's analog is its NaN/Inf batch-skip guard
    # (FEONet_steady_Navier-Stokes/train_FEONet.py:434-469), which a finite
    # explosion also passes. 0 = off.
    divergence_factor: float = 1e4
    # Track the best-validation state (EMA-aware) across evals; fit() leaves
    # the trainer AT the best state when the final eval is worse, and
    # save_checkpoint writes a 'best' checkpoint alongside the step ones.
    # Rank by the val traj_rel_l2 / coeff rel-L2 when a val set is present,
    # else by train loss. Prevents a whole run's best mid-run result being lost to a
    # late spike (three round-2 ledger rows lost theirs).
    track_best: bool = True


@dataclasses.dataclass
class Dataset:
    """A split: sampled problem instances + (optional) reference solutions."""

    batch: dict[str, Array]
    truth: Array | None = None

    @property
    def n(self) -> int:
        return next(iter(self.batch.values())).shape[0]

    def take(self, idx: np.ndarray) -> dict[str, Array]:
        return {k: v[idx] for k, v in self.batch.items()}


class TrainState(struct.PyTreeNode):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: Array
    ema_params: Any = None


class Trainer:
    def __init__(self, problem: Problem, config: TrainConfig):
        self.problem = problem
        self.config = config
        c = config
        pc = problem.config

        kwargs = dict(c.model_kwargs)
        if pc.name.startswith("timedep") and c.model in (
            "UNet2D", "UNetTemporal", "UNet1D", "RNN", "LinearStep",
            "LinearStepRNN",
        ):
            kwargs.setdefault("seq_len", pc.seq_len)
        self.model = build_model(c.model, d_out=problem.d_out, **kwargs)

        schedule = build_schedule(
            c.lr, c.lr_schedule, c.epochs, c.lr_final_fraction
        )
        self.tx = build_optimizer(
            c.optimizer, schedule, grad_clip=c.grad_clip,
            moment_dtype=c.moment_dtype,
        )
        self.is_lbfgs = c.optimizer.lower() == "lbfgs"
        if c.hybrid_kind not in ("galerkin", "linearized"):
            raise ValueError(f"hybrid_kind must be 'galerkin' or "
                             f"'linearized', got {c.hybrid_kind!r}")
        if problem.config.stokes_shift and c.cascade_epochs > 0:
            # the stage-2 trainer would shift the defect net's output by the
            # batch rhs a second time
            raise ValueError("stokes_shift and cascade_epochs are exclusive")

        # --- init params from a 2-sample probe batch ---
        key = jax.random.PRNGKey(c.seed)
        probe = problem.sample_batch(key, 2)
        x = problem.model_input(probe, c.model)
        variables = self.model.init(key, x, train=False)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        self.has_bn = "batch_stats" in variables
        self.use_ema = c.ema_decay > 0.0
        self.state = TrainState(
            params=params,
            batch_stats=batch_stats,
            opt_state=self.tx.init(params),
            step=jnp.asarray(0),
            # independent copies — the train step donates the state, and an
            # alias of `params` would donate the same buffer twice
            ema_params=(jax.tree.map(jnp.array, params)
                        if self.use_ema else None),
        )
        self.n_params = int(
            sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
        )

        # --- device mesh ---
        # model_axis > 1: 2-D ('data', 'model') mesh — coefficient head
        # column-sharded, dense operators row-sharded (tensor parallel for
        # the large-ng stretch configs). Otherwise: 1-D data mesh when >1
        # device is visible (params/operators replicated).
        self.mesh = None
        if c.model_axis > 1:
            self.mesh = data_model_mesh(c.model_axis)
            self.state = self._place_state(self.state, init_opt=True)
        elif c.data_parallel and len(jax.devices()) > 1:
            self.mesh = data_mesh()
            self.state = replicate(self.state, self.mesh)

        # Operators are threaded through the jitted step as ARGUMENTS, not
        # closure constants (closure capture bakes them into the HLO as
        # literals — >100 MB of program text at the 50k-DoF BSR scale, which
        # breaks remote compilation and bloats the executable). Snapshot once;
        # problems mutate operators (set_precond) only before training.
        self.ops = problem.device_ops
        problem._ops_consumed = True
        if self.mesh is not None:
            if c.model_axis > 1:
                self.ops = shard_ops(self.ops, self.mesh)
            else:
                self.ops = replicate(self.ops, self.mesh)

        # lbfgs opt_state aliases the params buffers — donation would hand
        # the same buffer to XLA twice, so only donate for the others.
        donate = () if self.is_lbfgs else (0,)
        self._train_step = jax.jit(self._train_step_impl, donate_argnums=donate)
        self._train_scan = jax.jit(self._train_scan_impl, donate_argnums=donate,
                                   static_argnums=(4,))
        self._eval_forward = jax.jit(self._eval_forward_impl)
        if c.scan_steps > 1:
            if self.is_lbfgs:
                raise ValueError("scan_steps is incompatible with lbfgs "
                                 "(stateful linesearch)")
            if c.eval_every % c.scan_steps:
                raise ValueError(
                    f"eval_every ({c.eval_every}) must be a multiple of "
                    f"scan_steps ({c.scan_steps})")
            if c.resample_every > 0 and c.resample_every % c.scan_steps:
                raise ValueError(
                    f"resample_every ({c.resample_every}) must be a "
                    f"multiple of scan_steps ({c.scan_steps})")

        self.history: list[dict] = []
        # best-validation snapshot (track_best): {'metric', 'epoch', 'params',
        # 'batch_stats', 'ema_params'} — device copies, shardings preserved
        self.best: dict | None = None

    def _place_state(self, state: TrainState, init_opt: bool = False) -> TrainState:
        """Place a TrainState for the tensor-parallel mesh: params with the
        column-shard layout, optimizer state re-initialized under jit so its
        moment pytrees inherit the param shardings via SPMD propagation
        (init_opt=False keeps an already-placed opt_state, e.g. the full-TP-
        resume restore that load_checkpoint places leaf-by-leaf)."""
        params = shard_params(state.params, self.mesh, self.problem.d_out)
        opt_state = (
            jax.jit(self.tx.init)(params) if init_opt else state.opt_state
        )
        batch_stats, step = replicate((state.batch_stats, state.step), self.mesh)
        ema = (
            shard_params(state.ema_params, self.mesh, self.problem.d_out)
            if state.ema_params is not None else None
        )
        return TrainState(
            params=params, batch_stats=batch_stats,
            opt_state=opt_state, step=step, ema_params=ema,
        )

    # ------------------------------------------------------------------
    # datasets (reference seeds: train=5, validate=10)
    # ------------------------------------------------------------------

    def make_datasets(self, with_truth: bool = True) -> tuple[Dataset, Dataset]:
        c = self.config
        if not with_truth:
            train_b = self.problem.sample_batch(jax.random.PRNGKey(5), c.num_train)
            val_b = self.problem.sample_batch(jax.random.PRNGKey(10), c.num_val)
            return Dataset(train_b, None), Dataset(val_b, None)
        # sample_converged resamples NS draws whose Newton fails,
        # matching the reference data generator's retry loop.
        if c.truth_for_train:
            train_b, train_t = self.problem.sample_converged(
                jax.random.PRNGKey(5), c.num_train
            )
        else:
            train_b = self.problem.sample_batch(jax.random.PRNGKey(5), c.num_train)
            train_t = None
        val_b, val_t = self.problem.sample_converged(
            jax.random.PRNGKey(10), c.num_val
        )
        return Dataset(train_b, train_t), Dataset(val_b, val_t)

    # ------------------------------------------------------------------
    # jitted step
    # ------------------------------------------------------------------

    def _apply(self, params, batch_stats, x, train: bool, rng=None):
        variables = {"params": params}
        if self.has_bn:
            variables["batch_stats"] = batch_stats
        kwargs = {}
        if rng is not None:
            kwargs["rngs"] = {"dropout": rng}
        if train and self.has_bn:
            out, upd = self.model.apply(
                variables, x, train=True, mutable=["batch_stats"], **kwargs
            )
            return out, upd["batch_stats"]
        out = self.model.apply(variables, x, train=train, **kwargs)
        return out, batch_stats

    def _loss_value(self, params, batch_stats, batch, rng, ops, res_batch=None):
        mode = self.config.loss_mode
        x = self.problem.model_input(batch, self.config.model)
        out, new_bs = self._apply(params, batch_stats, x, train=True, rng=rng)
        raw = out
        out = self.problem.shift_output(out, batch)
        pen = 0.0
        if self.config.correction_penalty > 0.0:
            pen = self.config.correction_penalty * jnp.mean(
                jnp.sum(jnp.square(raw), axis=-1)
            )
        if mode == "residual":
            return self.problem.loss(out, batch, ops) + pen, new_bs
        # supervised/hybrid: compare in SOLUTION coordinates (after unmap)
        pred = self.problem.unmap(out, ops)
        err2 = jnp.square(pred - batch["truth"])
        pw = self.problem.config.p_weight
        if pw != 1.0:
            # per-component weighting of the supervised metric (p block
            # scaled by p_weight) — targets the relative-pressure floor the
            # unweighted MSE leaves (TrainConfig.cascade_loss_mode docs)
            n2 = self.problem.n2
            w = np.ones(err2.shape[-1], dtype=np.float32)
            w[2 * n2:] = pw
            err2 = err2 * jnp.asarray(w, dtype=err2.dtype)
        sup = jnp.mean(err2)
        if mode == "supervised":
            return sup + pen, new_bs
        if mode == "hybrid":
            if self.config.hybrid_kind == "linearized":
                res = self.problem.linearized_loss(pred, batch["truth"], ops)
            elif res_batch is not None:
                # split hybrid: the residual term is evaluated on a FRESH
                # unlabeled batch (resample_every) — the supervised anchor
                # pins the stable branch on the fixed labeled set while the
                # label-free Galerkin residual regularizes on unseen loads
                # (infinite-data regime without fresh solves).
                rx = self.problem.model_input(res_batch, self.config.model)
                rout, new_bs = self._apply(params, new_bs, rx, train=True,
                                           rng=rng)
                rout = self.problem.shift_output(rout, res_batch)
                res = self.problem.loss(rout, res_batch, ops)
            else:
                res = self.problem.loss(out, batch, ops)
            return sup + self.config.residual_weight * res + pen, new_bs
        raise ValueError(f"unknown loss_mode {mode!r}")

    def _train_step_impl(self, state: TrainState, batch, rng, ops,
                         res_batch=None):
        ramp = self.config.conv_ramp_epochs
        if ramp and self.problem.config.name in ("steady_ns", "timedep_ns"):
            # convection-continuation gamma, computed inside the jit from
            # the step counter (no per-epoch host transfer / retrace)
            gamma = jnp.minimum(1.0, (state.step + 1.0) / ramp)
            ops = {**ops, "conv_gamma": gamma}

        def loss_fn(p):
            return self._loss_value(p, state.batch_stats, batch, rng, ops,
                                    res_batch)

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        if self.is_lbfgs:
            updates, new_opt = self.tx.update(
                grads,
                state.opt_state,
                state.params,
                value=loss,
                grad=grads,
                value_fn=lambda p: loss_fn(p)[0],
            )
        else:
            updates, new_opt = self.tx.update(grads, state.opt_state, state.params)
        import optax

        new_params = optax.apply_updates(state.params, updates)
        new_ema = state.ema_params
        if self.use_ema:
            d = self.config.ema_decay
            # bias-correct the warmup by capping decay at step/(step+1)
            d = jnp.minimum(d, (state.step + 1.0) / (state.step + 2.0))
            new_ema = jax.tree.map(
                lambda e, p: d * e + (1.0 - d) * p, state.ema_params, new_params
            )
        new_state = TrainState(
            params=new_params,
            batch_stats=new_bs,
            opt_state=new_opt,
            step=state.step + 1,
            ema_params=new_ema,
        )
        if self.config.nan_guard:
            ok = jnp.isfinite(loss)
            new_state = jax.tree.map(
                lambda new, old: jnp.where(ok, new, old), new_state, state
            )
        return new_state, loss

    def _train_scan_impl(self, state: TrainState, batch, rng, ops,
                         n_steps: int, res_batch=None):
        """K full-batch train steps in ONE jitted program (lax.scan over
        _train_step_impl). Same math as K per-epoch dispatches: the per-step
        RNG is fold_in(rng, i), and the LR schedule / EMA warmup / conv-ramp
        / nan-guard all read state.step, which increments inside the block.
        One device dispatch per block instead of per step — the TPU-native
        answer to ms-scale steps behind a high-latency host link (the
        reference's per-step host loop has no analog of this,
        FEONet_Stokes_square/train_FEONet.py:261-301)."""

        def body(st, i):
            st, loss = self._train_step_impl(
                st, batch, jax.random.fold_in(rng, i), ops, res_batch
            )
            return st, loss

        state, losses = jax.lax.scan(body, state, jnp.arange(n_steps))
        return state, losses[-1]

    def _eval_forward_impl(self, state: TrainState, batch, ops):
        x = self.problem.model_input(batch, self.config.model)
        params = state.ema_params if self.use_ema else state.params
        out, _ = self._apply(params, state.batch_stats, x, train=False)
        out = self.problem.shift_output(out, batch)
        return self.problem.unmap(out, ops)

    # ------------------------------------------------------------------
    # evaluation
    # ------------------------------------------------------------------

    def evaluate(self, ds: Dataset) -> dict[str, float]:
        pred = self._eval_forward(self.state, ds.batch, self.ops)
        out: dict[str, float] = {}
        if ds.truth is None:
            return out
        truth = ds.truth
        if self.problem.config.name.startswith("timedep"):
            # truth includes u0 at t=0; predictions start at t=1
            ref = truth[:, 1 : pred.shape[1] + 1].astype(pred.dtype)
            out["traj_rel_l2"] = float(trajectory_rel_l2(pred, ref))
            errs = component_errors(
                pred.reshape(-1, pred.shape[-1]),
                ref.reshape(-1, ref.shape[-1]),
                self.problem.n2,
            )
        else:
            errs = component_errors(pred, truth.astype(pred.dtype), self.problem.n2)
        out.update({k: float(v) for k, v in errs.items()})
        return out

    # ------------------------------------------------------------------
    # best-state tracking (track_best)
    # ------------------------------------------------------------------

    @staticmethod
    def _best_metric(rec: dict) -> float:
        """Ranking metric for best-state tracking: the validation rel-L2
        when present (coeff for steady, trajectory for timedep), else the
        train loss."""
        for k in ("traj_rel_l2", "coeff"):
            if k in rec:
                return rec[k]
        return rec["loss"]

    def _maybe_snapshot_best(self, rec: dict, epoch: int) -> None:
        m = self._best_metric(rec)
        if not np.isfinite(m):
            return
        if self.best is None or m < self.best["metric"]:
            s = self.state
            self.best = {
                "metric": float(m),
                "epoch": epoch,
                "params": jax.tree.map(jnp.array, s.params),
                "batch_stats": jax.tree.map(jnp.array, s.batch_stats),
                "ema_params": (jax.tree.map(jnp.array, s.ema_params)
                               if s.ema_params is not None else None),
            }

    def restore_best(self) -> bool:
        """Swap the best-tracked params (and batch_stats/EMA) back into the
        live state. Optimizer state is left as-is — restore is for
        eval/checkpoint/deployment, not for continuing the same run."""
        if self.best is None:
            return False
        self.state = self.state.replace(
            params=jax.tree.map(jnp.array, self.best["params"]),
            batch_stats=jax.tree.map(jnp.array, self.best["batch_stats"]),
            ema_params=(jax.tree.map(jnp.array, self.best["ema_params"])
                        if self.best["ema_params"] is not None else
                        self.state.ema_params),
        )
        return True

    # ------------------------------------------------------------------
    # training loop
    # ------------------------------------------------------------------

    def fit(
        self,
        train_ds: Dataset,
        val_ds: Dataset | None = None,
        epochs: int | None = None,
        verbose: bool = True,
    ) -> list[dict]:
        c = self.config
        epochs = epochs if epochs is not None else c.epochs
        if c.loss_mode != "residual":
            if train_ds.truth is None:
                raise ValueError(
                    f"loss_mode={c.loss_mode!r} needs ground truth for the "
                    "train split (truth_for_train=True)"
                )
            truth = np.asarray(train_ds.truth)
            if self.problem.config.name.startswith("timedep"):
                truth = truth[:, 1 : self.problem.config.seq_len + 1]
            train_ds = Dataset(
                {**train_ds.batch,
                 "truth": jnp.asarray(truth, dtype=self.problem.config.dtype)},
                train_ds.truth,
            )
        n = train_ds.n
        # 'residual': fresh batches replace the whole (label-free) batch.
        # 'hybrid': fresh UNLABELED batches feed only the residual term
        #           (split hybrid) — supervised anchor stays fixed.
        split_hybrid = c.resample_every > 0 and c.loss_mode == "hybrid"
        if split_hybrid and c.hybrid_kind == "linearized":
            raise ValueError("hybrid_kind='linearized' needs labels; it is "
                             "exclusive of resample_every")
        if c.resample_every > 0 and c.loss_mode == "supervised":
            raise ValueError(
                "resample_every needs a label-free residual term "
                "(supervised truth would require fresh solves)"
            )
        resample_key = jax.random.PRNGKey(c.seed + 12345)
        bs = c.batch_size if c.batch_size and c.batch_size < n else None
        if split_hybrid and bs is not None:
            raise ValueError("split hybrid (resample_every + hybrid) is "
                             "full-batch only")
        n_res = c.resample_size or n
        res_batch = None
        if split_hybrid:
            resample_key, sub = jax.random.split(resample_key)
            res_batch = self.problem.sample_batch(sub, n_res)
            if self.mesh is not None:
                res_batch = shard_batch(res_batch, self.mesh)
        if bs is None:
            # full batch (reference default): shard once, reuse every epoch
            batch = train_ds.batch
            if self.mesh is not None:
                batch = shard_batch(batch, self.mesh)
            minibatches = None
        else:
            # static minibatch partition (shapes constant -> one jit program);
            # order reshuffled every epoch on the host
            n_batches = n // bs
            minibatches, perm_rng = None, np.random.default_rng(c.seed)
        rng = jax.random.PRNGKey(c.seed + 1)
        window_t0 = time.time()
        log_f = open(c.log_path, "a") if c.log_path else None
        nan_streak = 0
        loss_min = np.inf  # running min of the eval-window loss (divergence guard)
        last_metric = np.inf
        tracing = False
        # scan blocks: K steps per dispatch (see TrainConfig.scan_steps).
        # Incompatible cadences are rejected in __init__; the profiler wants
        # per-step dispatch boundaries, so it falls back to per-step mode.
        scan = (c.scan_steps if (c.scan_steps > 1 and bs is None
                                 and not c.profile_dir) else 0)
        try:
            epoch = 0  # completed epochs
            while epoch < epochs:
                if c.profile_dir and not tracing and epoch == 1:
                    jax.profiler.start_trace(c.profile_dir)
                    tracing = True
                if (c.resample_every > 0 and bs is None
                        and epoch % c.resample_every == 0
                        and epoch > 0):
                    resample_key, sub = jax.random.split(resample_key)
                    fresh = self.problem.sample_batch(
                        sub, n_res if split_hybrid else n)
                    if self.mesh is not None:
                        fresh = shard_batch(fresh, self.mesh)
                    if split_hybrid:
                        res_batch = fresh
                    else:
                        batch = fresh
                rng, step_rng = jax.random.split(rng)
                if scan:
                    # block up to the next eval/resample/end boundary (the
                    # cadence multiples validated in __init__ keep the set
                    # of distinct block lengths — and thus compiles — tiny)
                    nb = min(epochs,
                             (epoch // c.eval_every + 1) * c.eval_every)
                    if c.resample_every > 0:
                        nb = min(nb, (epoch // c.resample_every + 1)
                                 * c.resample_every)
                    k = min(scan, nb - epoch)
                    self.state, loss = self._train_scan(
                        self.state, batch, step_rng, self.ops, k, res_batch
                    )
                    epoch += k
                elif bs is None:
                    epoch += 1
                    self.state, loss = self._train_step(
                        self.state, batch, step_rng, self.ops, res_batch
                    )
                else:
                    epoch += 1
                    idx = perm_rng.permutation(n)[: n_batches * bs].reshape(
                        n_batches, bs
                    )
                    for bi in range(n_batches):
                        mb = train_ds.take(idx[bi])
                        if self.mesh is not None:
                            mb = shard_batch(mb, self.mesh)
                        rng, step_rng = jax.random.split(rng)
                        self.state, loss = self._train_step(
                            self.state, mb, step_rng, self.ops
                        )
                if tracing and epoch >= 12:
                    jax.block_until_ready(loss)
                    jax.profiler.stop_trace()
                    tracing = False
                if c.nan_guard and epoch % c.eval_every == 0:
                    if not np.isfinite(float(loss)):
                        nan_streak += 1
                        if nan_streak >= c.nan_limit:
                            raise FloatingPointError(
                                f"loss non-finite for {nan_streak} consecutive "
                                f"eval windows at epoch {epoch}"
                            )
                    else:
                        nan_streak = 0
                if epoch % c.eval_every == 0 or epoch == epochs:
                    loss_v = float(loss)
                    rec = {
                        "epoch": epoch,
                        "loss": loss_v,
                        "time_per_epoch": (time.time() - window_t0) / c.eval_every,
                    }
                    if val_ds is not None:
                        rec.update(self.evaluate(val_ds))
                    if c.track_best:
                        self._maybe_snapshot_best(rec, epoch)
                        last_metric = self._best_metric(rec)
                    self.history.append(rec)
                    if log_f:
                        log_f.write(json.dumps(rec) + "\n")
                        log_f.flush()
                    if verbose:
                        print(
                            f"epoch {epoch}: loss={loss_v:.4e} "
                            + " ".join(
                                f"{k}={v:.4e}" for k, v in rec.items()
                                if k not in ("epoch", "loss")
                            )
                        )
                    ck = c.ckpt_every or c.eval_every
                    if c.ckpt_dir and (epoch % ck == 0 or epoch == epochs):
                        self.save_checkpoint(c.ckpt_dir)
                    window_t0 = time.time()
                    # loss-explosion abort: a FINITE blow-up passes the
                    # isfinite nan_guard; stop the run instead of burning
                    # the remaining budget (runs/r2c/ns450_hysplit6k hit
                    # 6e24 before epoch 4000 and trained on for 26k more)
                    if np.isfinite(loss_v):
                        loss_min = min(loss_min, loss_v)
                        if (c.divergence_factor > 0
                                and np.isfinite(loss_min)
                                and loss_v > c.divergence_factor
                                * max(loss_min, 1e-30)):
                            restored = self.restore_best()
                            rec_d = {
                                "diverged": epoch,
                                "loss": loss_v,
                                "loss_min": loss_min,
                                "restored_best": restored,
                                **({"best_epoch": self.best["epoch"],
                                    "best_metric": self.best["metric"]}
                                   if restored else {}),
                            }
                            self.history.append(rec_d)
                            if log_f:
                                log_f.write(json.dumps(rec_d) + "\n")
                                log_f.flush()
                            if verbose:
                                print(
                                    f"DIVERGED at epoch {epoch}: loss "
                                    f"{loss_v:.3e} > {c.divergence_factor:g}x "
                                    f"running min {loss_min:.3e}"
                                    + (f"; restored best state from epoch "
                                       f"{self.best['epoch']}" if restored
                                       else "")
                                )
                            if c.ckpt_dir and restored:
                                self.save_checkpoint(c.ckpt_dir, tag="best")
                            last_metric = -np.inf  # already restored
                            break
        finally:
            if tracing:
                jax.profiler.stop_trace()
            if log_f:
                log_f.close()
        # leave the trainer AT its best-tracked state when the run ended
        # worse than its best eval (spikes/overfit no longer lose results)
        if (c.track_best and self.best is not None
                and self.best["metric"] < last_metric):
            self.restore_best()
            rec_b = {
                "restored_best": True,
                "best_epoch": self.best["epoch"],
                "best_metric": self.best["metric"],
            }
            self.history.append(rec_b)
            if c.log_path:
                with open(c.log_path, "a") as f:
                    f.write(json.dumps(rec_b) + "\n")
            if verbose:
                print(f"restored best state (epoch {self.best['epoch']}, "
                      f"metric {self.best['metric']:.4e})")
            if c.ckpt_dir:
                self.save_checkpoint(c.ckpt_dir, tag="best")
        if c.cascade_epochs > 0:
            self.cascade(train_ds, val_ds, c.cascade_epochs, verbose=verbose)
        return self.history

    # ------------------------------------------------------------------
    # residual cascade (stage-2 defect training)
    # ------------------------------------------------------------------

    def _raw_forward(self, batch) -> Array:
        """Stage-1 outputs in TRAINING coordinates (before unmap), using the
        EMA params when enabled."""
        x = self.problem.model_input(batch, self.config.model)
        params = (
            self.state.ema_params if self.use_ema else self.state.params
        )
        out, _ = self._apply(params, self.state.batch_stats, x, train=False)
        return self.problem.shift_output(out, batch)

    def cascade(
        self,
        train_ds: Dataset,
        val_ds: Dataset | None,
        epochs: int,
        verbose: bool = True,
    ) -> dict[str, float]:
        """Train a fresh network on the f64 defect of this trainer's frozen
        predictions (label-free boosting) and append the COMBINED validation
        metrics to ``self.history``. The stage-2 trainer is kept as
        ``self.stage2`` (e.g. for checkpointing)."""
        import dataclasses as _dc

        p = self.problem
        sup2 = self.config.cascade_loss_mode == "supervised"

        def make_stage2_ds(batch) -> Dataset:
            pred0 = self._raw_forward(batch)
            d = p.defect_batch64(batch, pred0)
            # supervised stage 2: exact defect labels (host f64 back-solves
            # on the already-factorized system — see defect_truth64)
            return Dataset(d, p.defect_truth64(d) if sup2 else None)

        train2 = make_stage2_ds(train_ds.batch)
        chunked = bool(self.config.resample_every)
        tc2 = _dc.replace(
            self.config, epochs=epochs, cascade_epochs=0,
            seed=self.config.seed + 1,
            loss_mode="supervised" if sup2 else "residual",
            # resampling is stage-1-only: a resampled batch is a FRESH draw
            # of the original problem, not a defect batch — training stage 2
            # on it silently replaces the correction objective with the
            # original one (observed as cascade-combined rel-L2 ~1.0 while
            # the stage-2 loss itself descends).
            resample_every=0,
            # chunked resampling calls fit() once per chunk: per-chunk losses
            # come from DIFFERENT defect draws, so best-tracking would
            # silently restore_best() across incomparable chunks (params/
            # opt-state mismatch) and the divergence guard's loss_min reset
            # every chunk is meaningless — disable both for stage 2.
            track_best=not chunked and self.config.track_best,
            divergence_factor=0.0 if chunked
            else self.config.divergence_factor,
            ckpt_dir=None,
            log_path=(self.config.log_path + ".cascade"
                      if self.config.log_path else None),
        )
        self.stage2 = Trainer(p, tc2)
        if "bpx_ubc" in self.stage2.ops:
            # the BC lift belongs to stage 1; the correction is lift-free
            self.stage2.ops = {
                **self.stage2.ops,
                "bpx_ubc": jnp.zeros_like(self.stage2.ops["bpx_ubc"]),
            }
        if verbose:
            print(f"cascade: stage-2 defect training ({epochs} epochs)")
        every = self.config.resample_every
        if every and every > 0:
            # Resampled defect training — the stage-2 analog of stage-1's
            # label-free resampling, done OUTSIDE the jitted loop because a
            # defect batch is a host-f64 transform of frozen stage-1
            # predictions (defect_batch64), not a sample_batch draw. A FIXED
            # 1k-sample defect set overfits badly (r3 td_cascade: train
            # residual halved while combined val rel-L2 went 0.005 -> 0.156);
            # fresh defects every `resample_every` epochs give stage 2 the
            # same infinite-data regime that made stage 1 generalize.
            done = 0
            while done < epochs:
                chunk = min(every, epochs - done)
                # per-chunk seed offset: fit() derives its step RNG from
                # config.seed, so without this every chunk would replay the
                # identical per-step randomness
                self.stage2.config = _dc.replace(tc2, seed=tc2.seed + done)
                self.stage2.fit(train2, None, epochs=chunk, verbose=False)
                done += chunk
                if done < epochs:
                    key = jax.random.PRNGKey(self.config.seed + 7000 + done)
                    fresh = p.sample_batch(key, train_ds.n)
                    train2 = make_stage2_ds(fresh)
                if verbose and done % max(every * 10, 1) < every:
                    # history may end with a guard/restore record (no 'loss')
                    last = next((h["loss"] for h in
                                 reversed(self.stage2.history)
                                 if "loss" in h), float("nan"))
                    print(f"cascade: {done}/{epochs} epochs "
                          f"(loss {last:.4e})", flush=True)
        else:
            self.stage2.fit(train2, None, verbose=verbose)

        rec: dict[str, float] = {"cascade": 1.0}
        if val_ds is not None and val_ds.truth is not None:
            pred0_val = self._raw_forward(val_ds.batch)
            val2_batch = p.defect_batch64(val_ds.batch, pred0_val)
            e_val = self.stage2._raw_forward(val2_batch)
            combined = p.unmap(pred0_val + e_val, self.ops)
            truth = val_ds.truth
            if p.config.name.startswith("timedep"):
                ref = truth[:, 1 : combined.shape[1] + 1].astype(combined.dtype)
                rec["traj_rel_l2"] = float(trajectory_rel_l2(combined, ref))
                errs = component_errors(
                    combined.reshape(-1, combined.shape[-1]),
                    np.asarray(ref).reshape(-1, ref.shape[-1]),
                    p.n2,
                )
            else:
                errs = component_errors(
                    combined, truth.astype(combined.dtype), p.n2
                )
            rec.update({k: float(v) for k, v in errs.items()})
            if verbose:
                print("cascade combined: "
                      + " ".join(f"{k}={v:.4e}" for k, v in rec.items()
                                 if k != "cascade"))
        self.history.append(rec)
        return rec

    @staticmethod
    def latest_checkpoint(ckpt_dir: str) -> str | None:
        """Most recent step_* checkpoint for resume."""
        if not os.path.isdir(ckpt_dir):
            return None
        steps = [
            (int(d.split("_")[1]), d)
            for d in os.listdir(ckpt_dir)
            if d.startswith("step_") and d.split("_")[1].isdigit()
        ]
        if not steps:
            return None
        return os.path.join(ckpt_dir, max(steps)[1])

    # ------------------------------------------------------------------
    # checkpointing (orbax)
    # ------------------------------------------------------------------

    def save_checkpoint(self, ckpt_dir: str, tag: str | None = None) -> str:
        import orbax.checkpoint as ocp
        from flax import serialization

        name = tag if tag is not None else f"step_{int(self.state.step)}"
        path = os.path.abspath(os.path.join(ckpt_dir, name))
        tree = {
            "params": jax.device_get(self.state.params),
            "batch_stats": jax.device_get(self.state.batch_stats),
            "step": int(self.state.step),
            # optimizer state as a plain state-dict (optax NamedTuples are
            # not orbax-stable across versions; flax serialization is)
            "opt_state": serialization.to_state_dict(
                jax.device_get(self.state.opt_state)
            ),
        }
        if self.state.ema_params is not None:
            tree["ema_params"] = jax.device_get(self.state.ema_params)
        with ocp.PyTreeCheckpointer() as ckptr:
            ckptr.save(path, tree, force=True)
        return path

    def load_checkpoint(self, path: str, params_only: bool = True) -> None:
        """Restore params (and batch_stats) — also the warm-start mechanism
        (the reference warm-starts steady NS from the Stokes UNet checkpoint,
        FEONet_steady_Navier-Stokes/train_FEONet.py:209-215).

        ``params_only=False`` additionally restores the optimizer state and
        EMA params (full resume). Under tensor parallelism the restored
        moments are re-placed with the column-shard layout taken from the
        compiled ``tx.init`` output shardings (no transient double
        allocation)."""
        import orbax.checkpoint as ocp
        from flax import serialization

        if path.endswith(".npz"):
            # slim params-only snapshot (tools/slim_ckpt.py export) — the
            # only checkpoint form small enough to commit, hence the only
            # one that survives a VM loss. Layout: 'params//<path>' keys.
            restored = self._load_params_npz(path)
        else:
            with ocp.PyTreeCheckpointer() as ckptr:
                restored = ckptr.restore(os.path.abspath(path))
        state = self.state
        restore_opt = not params_only and "opt_state" in restored
        if restore_opt:
            # host-side pytree with the live opt_state's structure
            opt_state = serialization.from_state_dict(
                state.opt_state, restored["opt_state"]
            )
            # restored leaves stay host-side (uncommitted): the jitted train
            # step places them via SPMD propagation from the param shardings
            # — committing them here (device_put) would pin device 0 and
            # conflict with the TP column-shard layout
        else:
            opt_state = state.opt_state
        ema = state.ema_params
        if self.use_ema:
            # copy to avoid aliasing the (donated) params buffers
            ema = jax.tree.map(
                jnp.array, restored.get("ema_params", restored["params"])
            )
        self.state = TrainState(
            params=restored["params"],
            batch_stats=restored.get("batch_stats", state.batch_stats),
            opt_state=opt_state,
            step=jnp.asarray(restored.get("step", 0)),
            ema_params=ema,
        )
        if self.mesh is not None:
            if self.config.model_axis > 1:
                self.state = self._place_state(
                    self.state, init_opt=not restore_opt
                )
            else:
                self.state = replicate(self.state, self.mesh)

    @staticmethod
    def _load_params_npz(path: str) -> dict:
        """Read a tools/slim_ckpt.py npz into {'params': tree[,
        'batch_stats': tree], 'step': int} ('//'-separated key paths)."""
        import numpy as np

        z = np.load(path, allow_pickle=False)
        groups: dict = {"params": {}, "batch_stats": {}}
        step = 0
        for key in z.files:
            head, _, rest = key.partition("//")
            if head == "step":
                step = int(z[key])
                continue
            if head not in groups:
                continue
            node = groups[head]
            parts = rest.split("//")
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = z[key]
        out = {"params": groups["params"], "step": step}
        if groups["batch_stats"]:
            out["batch_stats"] = groups["batch_stats"]
        return out
