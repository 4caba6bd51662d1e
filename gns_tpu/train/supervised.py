"""Supervised fine-tuning against Newton-Raphson oracle labels.

The reference trains unsupervised on the physics residual only
(GNS/main.py:198) and uses Newton-Raphson purely for evaluation
(GNS/evaluate.py:25-40). This module closes that loop: the built-in NR
solvers (eval.newton_raphson float64 / eval.nr_batched accelerator-batched)
are fast enough to label whole training sets, so the model can be trained
directly toward the oracle's solution:

    loss = sup + w_physics * physics_total
    sup  = mean_buses[(v - v*)^2 + (theta_c - theta_c*)^2]

where * are the NR labels and theta_c is per-grid mean-centered angle (the
GNS angle reference is unidentified — the physics is invariant under a
global shift — so raw-angle supervision would fight an unobservable
degree of freedom). The physics term keeps the iterates on the power-flow
manifold between labeled points; w_physics=0 gives pure supervision.

Training grids must be NR-feasible (generate with feasible_only=True) so
every grid has a defined label.
"""

from __future__ import annotations

import time
from typing import Callable, List, NamedTuple, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
import optax

from gns_tpu.models.gns import gns_forward_batch
from gns_tpu.train.trainer import (
    TrainState,
    init_train_state,
    make_optimizer,
    stack_epoch,
)
from gns_tpu.utils.config import GNSConfig
from gns_tpu.utils.prepare import GridBatch, extract_shared_topology


class NRLabels(NamedTuple):
    """Oracle solutions aligned with a GridBatch, padded to its bus dim."""

    v: jnp.ndarray  # (S, N) p.u.
    theta: jnp.ndarray  # (S, N) radians


def nr_labels(cases: List[dict], n_pad: Optional[int] = None,
              backend: str = "scipy") -> NRLabels:
    """Solve every case and stack (v, theta_rad), zero-padded to n_pad.

    Raises if any case fails to converge — label sets must be generated
    with feasible_only=True.
    """
    from gns_tpu.eval.harness import run_nr_oracle

    res = run_nr_oracle(cases, backend=backend)
    if not np.asarray(res["converged"]).all():
        bad = int((~np.asarray(res["converged"])).sum())
        raise ValueError(
            f"{bad}/{len(cases)} label grids did not converge; generate "
            "training cases with feasible_only=True"
        )
    v = np.asarray(res["v"], np.float32)
    th = np.deg2rad(np.asarray(res["theta_deg"], np.float32))
    if n_pad is not None and v.shape[1] < n_pad:
        pad = ((0, 0), (0, n_pad - v.shape[1]))
        v = np.pad(v, pad)
        th = np.pad(th, pad)
    return NRLabels(jnp.asarray(v), jnp.asarray(th))


def _centered(theta, mask, n_real):
    mean = jnp.sum(theta * mask, axis=1, keepdims=True) / n_real[:, None]
    return (theta - mean) * mask


def make_supervised_epoch_step(
    cfg: GNSConfig,
    w_physics: float,
    optimizer: Optional[optax.GradientTransformation] = None,
    method: str = "auto",
    topo=None,
) -> Callable:
    """Device-side epoch over (stacked GridBatch, stacked NRLabels).

    fn(TrainState, (batches, labels)) -> (TrainState,
       {"sup": (n_batches,), "physics": (n_batches,)})
    """
    optimizer = optimizer or make_optimizer(cfg)

    def loss_fn(params, batch: GridBatch, labels: NRLabels):
        out = gns_forward_batch(params, cfg, batch, method=method, topo=topo)
        mask = batch.bus_mask
        n_real = batch.n_bus.astype(jnp.float32)
        v_err = jnp.sum((out.v - labels.v) ** 2 * mask, axis=1) / n_real
        th_err = jnp.sum(
            (_centered(out.theta, mask, n_real)
             - _centered(labels.theta, mask, n_real)) ** 2 * mask,
            axis=1,
        ) / n_real
        sup = jnp.mean(v_err + th_err)
        physics = jnp.mean(out.total_loss)
        return sup + w_physics * physics, (sup, physics)

    def one_step(state: TrainState, xs):
        batch, labels = xs
        (_, (sup, physics)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, batch, labels)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            TrainState(params, opt_state, state.step + 1),
            {"sup": sup, "physics": physics},
        )

    def epoch_fn(state: TrainState, xs):
        return jax.lax.scan(one_step, state, xs)

    return jax.jit(epoch_fn, donate_argnums=(0,))


def stack_labels(labels: NRLabels, batch_size: int) -> NRLabels:
    """Reshape (S, N) labels into (S//bs, bs, N), mirroring stack_epoch."""
    n_batches = labels.v.shape[0] // batch_size
    s = n_batches * batch_size
    return NRLabels(
        labels.v[:s].reshape((n_batches, batch_size) + labels.v.shape[1:]),
        labels.theta[:s].reshape(
            (n_batches, batch_size) + labels.theta.shape[1:]
        ),
    )


def train_supervised(
    cfg: GNSConfig,
    data: GridBatch,
    labels: NRLabels,
    w_physics: float = 0.1,
    key=None,
    method: str = "auto",
    log_fn: Optional[Callable] = None,
    state: Optional[TrainState] = None,
) -> Tuple[TrainState, list]:
    """Supervised training run; early stop on the supervised metric.

    Mirrors trainer.train's epoch/early-stop/divergence semantics (the
    reference's driver shape, GNS/main.py:274-309) with the supervised
    loss as the monitored quantity. Returns (best_state, history).
    """
    key = key if key is not None else jax.random.key(cfg.seed)
    if state is None:
        state = init_train_state(key, cfg)

    bs = min(cfg.batch_size, data.batch_size)
    topo = extract_shared_topology(data)
    epoch_step = make_supervised_epoch_step(
        cfg, w_physics, method=method, topo=topo
    )
    xs = (stack_epoch(data, bs), stack_labels(labels, bs))

    best_metric = float("inf")
    best_state = jax.device_get(state)  # epoch_step donates its input
    bad = 0
    history = []
    for epoch in range(cfg.epochs):
        t0 = time.perf_counter()
        state, metrics = epoch_step(state, xs)
        sup = float(jnp.mean(metrics["sup"]))
        physics = float(jnp.mean(metrics["physics"]))
        dt = time.perf_counter() - t0
        diverged = sup != sup or sup == float("inf")
        history.append({
            "epoch": epoch, "sup": sup, "physics": physics, "sec": dt,
            "diverged": diverged,
        })
        if log_fn:
            log_fn(history[-1])
        if diverged:
            break
        if sup >= best_metric:
            bad += 1
            if bad > cfg.early_stop_patience:
                break
        else:
            best_metric = sup
            best_state = jax.device_get(state)
            bad = 0
    return best_state, history


def train_supervised_multi(
    cfg: GNSConfig,
    datasets,
    label_sets,
    w_physics: float = 0.1,
    key=None,
    method: str = "auto",
    log_fn: Optional[Callable] = None,
    state: Optional[TrainState] = None,
) -> Tuple[TrainState, list]:
    """Supervised fine-tuning of ONE model over several cases at once.

    The supervised analog of trainer.train_multi: each case keeps its own
    (GridBatch, NRLabels) bucket with its own shape/shared topology (no
    padding to the largest case), one device-side scan per bucket per
    epoch, shared parameters throughout. Early stop / best-checkpoint
    track the mean of the per-case supervised metrics. Used to produce the
    "multi-sup" generalist — the multi-paper generalist was already the
    most accurate case30 model (ROADMAP #7) and supervised fine-tuning
    lifted every specialist, so the combination is the accuracy flagship.
    """
    key = key if key is not None else jax.random.key(cfg.seed)
    if state is None:
        state = init_train_state(key, cfg)

    steps, xss = [], []
    for data, labels in zip(datasets, label_sets):
        bs = min(cfg.batch_size, data.batch_size)
        steps.append(
            make_supervised_epoch_step(
                cfg, w_physics, method=method,
                topo=extract_shared_topology(data),
            )
        )
        xss.append((stack_epoch(data, bs), stack_labels(labels, bs)))

    best_metric = float("inf")
    best_state = jax.device_get(state)  # steps donate their input state
    bad = 0
    history = []
    for epoch in range(cfg.epochs):
        t0 = time.perf_counter()
        sups, physs = [], []
        for step, xs in zip(steps, xss):
            state, metrics = step(state, xs)
            sups.append(float(jnp.mean(metrics["sup"])))
            physs.append(float(jnp.mean(metrics["physics"])))
        sup = sum(sups) / len(sups)
        dt = time.perf_counter() - t0
        diverged = sup != sup or sup == float("inf")
        history.append({
            "epoch": epoch, "sup": sup, "group_sups": sups,
            "physics": sum(physs) / len(physs), "sec": dt,
            "diverged": diverged,
        })
        if log_fn:
            log_fn(history[-1])
        if diverged:
            break
        if sup >= best_metric:
            bad += 1
            if bad > cfg.early_stop_patience:
                break
        else:
            best_metric = sup
            best_state = jax.device_get(state)
            bad = 0
    return best_state, history
