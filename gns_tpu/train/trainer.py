"""Training driver: one jitted, vmapped, (optionally) sharded update step.

The reference trains with a triple epoch->batch->sample loop that runs 128
sequential forwards per batch and one backward through all of them
(reference: GNS/main.py:274-291). Here the whole batch is a single compiled
program: `vmap` over grids, mean loss, `jax.grad`, optax update — dispatched
once per batch. Optimizers, early stopping and best-checkpoint semantics
match the reference driver (main.py:235-309).
"""

from __future__ import annotations

import time
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from gns_tpu.models.gns import gns_forward_batch, init_gns_params
from gns_tpu.utils.config import GNSConfig
from gns_tpu.utils.prepare import GridBatch, extract_shared_topology


class TrainState(NamedTuple):
    params: dict
    opt_state: tuple
    step: jnp.ndarray


def make_optimizer(cfg: GNSConfig) -> optax.GradientTransformation:
    # reference: GNS/main.py:238-243 — Adam lr 1e-3 / Adagrad lr 1e-2;
    # optional linear warmup (the scheduler the reference sketches but
    # leaves commented at main.py:245-247).
    lr = cfg.lr
    if cfg.warmup_steps > 0:
        lr = optax.linear_schedule(0.0, cfg.lr, cfg.warmup_steps)
    if cfg.optimizer == "adagrad":
        opt = optax.adagrad(lr)
    elif cfg.optimizer == "adam":
        opt = optax.adam(lr)
    else:
        raise ValueError(f"unknown optimizer {cfg.optimizer!r}")
    if cfg.grad_clip > 0:
        opt = optax.chain(optax.clip_by_global_norm(cfg.grad_clip), opt)
    return opt


def init_train_state(key, cfg: GNSConfig, optimizer=None) -> TrainState:
    params = init_gns_params(key, cfg)
    optimizer = optimizer or make_optimizer(cfg)
    return TrainState(params, optimizer.init(params), jnp.zeros((), jnp.int32))


def make_train_step(
    cfg: GNSConfig,
    optimizer: Optional[optax.GradientTransformation] = None,
    method: str = "auto",
    donate: bool = True,
    topo=None,
    dense: bool = False,
) -> Callable:
    """Build the jitted update step: (TrainState, GridBatch) -> (TrainState, metrics).

    metrics = {loss, last_loss}: mean discounted training loss and mean
    undiscounted final-step residual (the reference's early-stop signal,
    main.py:283-285).

    dense: the batches are unpadded (GridBatch.is_dense()) — skip every
    mask multiply and the masks' HBM reads (exact; auto-set by train()).
    """
    optimizer = optimizer or make_optimizer(cfg)

    def loss_fn(params, batch: GridBatch):
        out = gns_forward_batch(
            params, cfg, batch, method=method, topo=topo, dense=dense
        )
        return jnp.mean(out.total_loss), jnp.mean(out.last_loss)

    def step_fn(state: TrainState, batch: GridBatch):
        (loss, last_loss), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch
        )
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            TrainState(params, opt_state, state.step + 1),
            {"loss": loss, "last_loss": last_loss},
        )

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def make_epoch_step(
    cfg: GNSConfig,
    optimizer: Optional[optax.GradientTransformation] = None,
    method: str = "auto",
    donate: bool = True,
    topo=None,
    dense: bool = False,
    precision=None,
) -> Callable:
    """Device-side epoch: one dispatch runs a lax.scan of update steps over
    a stacked batch axis.

    fn(TrainState, GridBatch with leading (n_batches, batch, ...) axes)
      -> (TrainState, {loss (n_batches,), last_loss (n_batches,)})

    Eliminates per-batch host dispatch latency — on this environment's
    remote TPU a dispatch costs ~0.5 ms, comparable to the whole device-side
    step, so scanning an epoch per call roughly doubles throughput.

    precision: matmul precision override for the f32 path. None keeps the
    parity default (HIGHEST when compute_dtype is float32 — bit parity
    needs the 6-pass lowering). jax.lax.Precision.HIGH (3 passes) is
    measured 1.29x faster end-to-end on the f32 path
    (tools/exp_f32_precision.py, round 3) at ~1-ulp cost — the fast
    non-parity f32 option.
    """
    optimizer = optimizer or make_optimizer(cfg)

    def loss_fn(params, batch: GridBatch):
        out = gns_forward_batch(
            params, cfg, batch, method=method, precision=precision,
            topo=topo, dense=dense,
        )
        return jnp.mean(out.total_loss), jnp.mean(out.last_loss)

    def one_step(state: TrainState, batch: GridBatch):
        (loss, last_loss), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch
        )
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            TrainState(params, opt_state, state.step + 1),
            {"loss": loss, "last_loss": last_loss},
        )

    def epoch_fn(state: TrainState, batches: GridBatch):
        return jax.lax.scan(one_step, state, batches)

    return jax.jit(epoch_fn, donate_argnums=(0,) if donate else ())


def stack_epoch(data: GridBatch, batch_size: int) -> GridBatch:
    """Reshape a GridBatch (S, ...) into (S//bs, bs, ...) for make_epoch_step.
    Trailing remainder grids are dropped (reference drops them too via its
    range step, GNS/main.py:276)."""
    n_batches = data.batch_size // batch_size
    s = n_batches * batch_size
    return GridBatch(
        *(
            a[:s].reshape((n_batches, batch_size) + a.shape[1:])
            for a in data
        )
    )


def make_eval_step(cfg: GNSConfig, method: str = "auto", topo=None,
                   dense: bool = False) -> Callable:
    """Jitted inference: (params, GridBatch) -> batched GNSOutput."""

    def fn(params, batch: GridBatch):
        return gns_forward_batch(
            params, cfg, batch, method=method, topo=topo, dense=dense
        )

    return jax.jit(fn)


def train(
    cfg: GNSConfig,
    data: GridBatch,
    key=None,
    method: str = "auto",
    log_fn: Optional[Callable] = None,
    checkpoint_fn: Optional[Callable] = None,
    state: Optional[TrainState] = None,
):
    """Full training run with reference semantics.

    Epochs over `data` in batch_size chunks; early stop after
    `early_stop_patience`+1 consecutive non-improving epochs
    (reference: GNS/main.py:296-304); `checkpoint_fn(state, epoch, loss)`
    called whenever the best loss improves (main.py:306-309).
    Returns (best_state, history).
    """
    key = key if key is not None else jax.random.key(cfg.seed)
    if state is None:
        state = init_train_state(key, cfg)

    n = data.batch_size
    bs = min(cfg.batch_size, n)
    # One dispatch per epoch: scan the update step over the batch axis
    # device-side (per-batch dispatch would dominate on the remote TPU).
    # Augmented single-case datasets share one topology: exploit it so every
    # edge aggregation is one whole-batch MXU contraction.
    topo = extract_shared_topology(data)
    epoch_step = make_epoch_step(
        cfg, method=method, topo=topo, dense=data.is_dense()
    )
    stacked = stack_epoch(data, bs)

    best_loss = float("inf")
    # Snapshot to host BEFORE the first step: epoch_step donates its input
    # state, so after one call these device buffers are deleted — a run
    # that diverges in epoch 0 must still return a usable state.
    best_state = jax.device_get(state)
    increase_counter = 0
    history = []
    for epoch in range(cfg.epochs):
        t0 = time.perf_counter()
        state, metrics = epoch_step(state, stacked)
        epoch_final_loss = float(jnp.mean(metrics["last_loss"]))
        dt = time.perf_counter() - t0
        # Failure detection: a NaN/Inf loss means the run diverged; the
        # state is poisoned, so stop and hand back the last good
        # checkpoint instead of looping to the epoch budget. (The
        # reference would silently keep training through NaNs.)
        diverged = (
            epoch_final_loss != epoch_final_loss
            or epoch_final_loss == float("inf")
        )
        # 'diverged' is on every row so the CSV logger (whose columns are
        # fixed by the first row) records it.
        history.append(
            {"epoch": epoch, "final_loss": epoch_final_loss, "sec": dt,
             "diverged": diverged}
        )
        if log_fn:
            log_fn(history[-1])
        if diverged:
            break

        # reference main.py:296-304: stop after >patience non-improving epochs
        if epoch_final_loss >= best_loss:
            increase_counter += 1
            if increase_counter > cfg.early_stop_patience:
                break
        else:
            best_loss = epoch_final_loss
            # Snapshot to host: the jitted step donates its input state, so
            # keeping a live reference to device buffers would see them
            # deleted on the next step.
            best_state = jax.device_get(state)
            increase_counter = 0
            if checkpoint_fn:
                checkpoint_fn(best_state, epoch, best_loss)
    return best_state, history


def train_multi(
    cfg: GNSConfig,
    datasets,
    key=None,
    method: str = "auto",
    log_fn: Optional[Callable] = None,
    checkpoint_fn: Optional[Callable] = None,
    state: Optional[TrainState] = None,
):
    """Train ONE model over several datasets (e.g. one GridBatch per
    MATPOWER case) with a shared parameter state.

    Each dataset keeps its own (smaller) bucket shape and shared topology,
    so every group runs the whole-batch MXU fast path and nothing is padded
    to the largest case — unlike a single mixed mega-bucket, where case9
    grids pay case300's shapes and the per-grid general path. One epoch =
    one device-side scan per group; the model is identical across groups
    (same K/latent/hidden — graph size is data, not architecture).

    Early stop / best-checkpoint track the mean of the groups' epoch
    losses. Returns (best_state, history); history rows carry per-group
    losses under "group_losses".
    """
    key = key if key is not None else jax.random.key(cfg.seed)
    if state is None:
        state = init_train_state(key, cfg)

    steps, stackeds = [], []
    for data in datasets:
        bs = min(cfg.batch_size, data.batch_size)
        steps.append(
            make_epoch_step(
                cfg, method=method, topo=extract_shared_topology(data),
                dense=data.is_dense(),
            )
        )
        stackeds.append(stack_epoch(data, bs))

    best_loss = float("inf")
    # Pre-loop host snapshot: the jitted steps donate their input state
    # (see train()).
    best_state = jax.device_get(state)
    increase_counter = 0
    history = []
    for epoch in range(cfg.epochs):
        t0 = time.perf_counter()
        group_losses = []
        for step, stacked in zip(steps, stackeds):
            state, metrics = step(state, stacked)
            group_losses.append(float(jnp.mean(metrics["last_loss"])))
        epoch_final_loss = sum(group_losses) / len(group_losses)
        dt = time.perf_counter() - t0
        diverged = (
            epoch_final_loss != epoch_final_loss
            or epoch_final_loss == float("inf")
        )
        row = {
            "epoch": epoch, "final_loss": epoch_final_loss, "sec": dt,
            "group_losses": group_losses, "diverged": diverged,
        }
        history.append(row)
        if log_fn:
            log_fn(row)
        if diverged:
            break

        if epoch_final_loss >= best_loss:
            increase_counter += 1
            if increase_counter > cfg.early_stop_patience:
                break
        else:
            best_loss = epoch_final_loss
            best_state = jax.device_get(state)
            increase_counter = 0
            if checkpoint_fn:
                checkpoint_fn(best_state, epoch, best_loss)
    return best_state, history
